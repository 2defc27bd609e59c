package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Geospatial bucketed operators on integer microdegree coordinates —
 * the spatial analog of the LSH-bucketed similarity substrate: candidate
 * generation is a grid-cell EQUI-join (one hash shuffle on the cell
 * key), never an all-pairs product, and the exact filter runs on integer
 * squared distances. Public precedent: every production spatial join
 * (S2, H3, geohash, PostGIS ST_DWithin over a grid index) has this
 * two-phase bucket-then-refine shape.
 *
 * Honest scope: coordinates are PLANAR equirectangular microdegrees
 * (lat, lon as exact BIGINTs; distances are squared microdegrees), so
 * the math is engine-exact and oracle-replayable. Real geodesy would
 * refine with haversine — a transcendental the cross-engine gate keeps
 * out; at the ~1° radii used here the planar metric is the standard
 * bucketing approximation, and longitude wraparound at the antimeridian
 * IS handled exactly (cells wrap mod 360°, and the pair distance uses
 * `min(|Δlon|, 360° − |Δlon|)`). Latitude convergence (1° lon shrinking
 * toward the poles) is NOT modeled — documented planar contract.
 */
object Geo {

  final val LonSpanMicro: Long = 360000000L

  /** All pairs of distinct points within `radiusMicro` (planar, with
    * longitude wraparound): grid cells of side = radius, the left side
    * exploded to its 3×3 cell neighborhood (9 rows — a constant fan-out
    * in the scan stage), an equi-join on the wrapped cell key, then the
    * exact integer filter. Any pair within the radius differs by at
    * most one cell per axis, and the right side sits in exactly ONE
    * cell, so each qualifying pair is emitted exactly once — no dedup
    * pass. Output: (id_a < id_b, d2_micro).
    *
    * Scale: the shuffle is one hash partition by cell; per-cell cost is
    * |cell_a|·|cell_b| over the 9 neighbors — bounded by local point
    * density, never by the corpus. Skewed hot cells behave like any
    * skewed join key (salt or AQE).
    */
  def withinRadiusPairs(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusMicro: Long): DataFrame = {
    require(radiusMicro > 0 && LonSpanMicro % radiusMicro == 0,
      s"radiusMicro must divide $LonSpanMicro for exact wraparound, " +
        s"got $radiusMicro")
    val nx = LonSpanMicro / radiusMicro
    def cellY(c: Column): Column =
      floor(c.cast("double") / lit(radiusMicro.toDouble)).cast("long")
    // wrapped x-cell: floor(lon/r) lives in [-nx/2, nx/2); shift into
    // [0, nx) so the neighbor arithmetic can wrap with one positive mod
    def cellX(c: Column): Column =
      (cellY(c) + lit(nx)) % lit(nx)

    val base = points.select(col(idCol).cast("long").as("id"),
      col(latCol).cast("long").as("lat"), col(lonCol).cast("long").as("lon"))
    val a = base.select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"),
        explode(sequence(lit(-1), lit(1))).as("dx"),
        cellY(col("lat")).as("cy0"), cellX(col("lon")).as("cx0"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        explode(sequence(lit(-1), lit(1))).as("dy"),
        ((col("cx0") + col("dx") + lit(nx)) % lit(nx)).as("cx"),
        col("cy0"), col("dx"))
      .select(col("id_a"), col("lat_a"), col("lon_a"), col("cx"),
        (col("cy0") + col("dy")).as("cy"))
    val b = base.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), cellX(col("lon")).as("cx"),
      cellY(col("lat")).as("cy"))
    val dl = abs(col("lon_a") - col("lon_b"))
    val dlon = least(dl, lit(LonSpanMicro) - dl)
    val dlat = col("lat_a") - col("lat_b")
    a.join(b, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2_micro", dlat * dlat + dlon * dlon)
      .filter(col("d2_micro") <= lit(radiusMicro * radiusMicro))
      .select("id_a", "id_b", "d2_micro")
  }

  /** k nearest neighbors within `radiusMicro` per point: the symmetric
    * closure of [[withinRadiusPairs]] ranked per point by (distance,
    * neighbor id). The rank window is per-point over the radius-bounded
    * candidate set — local density, not data size. Points with no
    * neighbor in radius are absent (a radius-bounded kNN, the honest
    * contract of any bucketed ANN). */
  def knnWithinRadius(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusMicro: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = withinRadiusPairs(points, idCol, latCol, lonCol, radiusMicro)
    val sym = pairs.select(col("id_a").as("id"),
        col("id_b").as("neighbor"), col("d2_micro"))
      .unionAll(pairs.select(col("id_b").as("id"),
        col("id_a").as("neighbor"), col("d2_micro")))
    sym.withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(col("d2_micro"), col("neighbor")))
        .cast("long"))
      .filter(col("rank") <= k)
  }

  /** Assign points to axis-aligned rectangular geofences (the broadcast
    * small-dimension form of point-in-polygon): fences must carry
    * `(fence_id, lat_lo, lat_hi, lon_lo, lon_hi)` half-open micro
    * bounds. The fence table is broadcast, so the "join" is a constant
    * per-row predicate chain in the scan stage — no shuffle at any
    * scale. Points in no fence drop; overlapping fences multi-assign. */
  def assignFences(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, fences: DataFrame): DataFrame =
    points.join(broadcast(fences),
      col(latCol) >= col("lat_lo") && col(latCol) < col("lat_hi") &&
      col(lonCol) >= col("lon_lo") && col(lonCol) < col("lon_hi"))
}
