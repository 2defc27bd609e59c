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
    require(radiusMicro > 0 && LonSpanMicro % radiusMicro == 0 &&
      LonSpanMicro / radiusMicro >= 3,
      s"radiusMicro must divide $LonSpanMicro with at least 3 lon " +
        s"cells (nx<3 makes the 3 wrapped dx neighbors collide mod nx " +
        s"and emit pairs more than once), got $radiusMicro")
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

  /** Spatial hotspot detection — Getis-Ord Gi* (Getis & Ord 1992) on
    * the planar microdegree grid: for every OCCUPIED cell, the z-score
    * of its 3×3 neighborhood point count (center included — the "*"
    * variant) against the global per-cell mean/variance over the full
    * N = (360°/cell)·(180°/cell) grid (empty cells are zeros in the
    * moments by construction: they contribute nothing to Σx and Σx²).
    * |gi| > 2.576 (the 99% normal bound) marks a hotspot/coldspot.
    *
    * Determinism: the only non-integers are one fixed IEEE chain over
    * exact BIGINT moments (count sums, squares, the N literal) — and
    * sqrt is CORRECTLY ROUNDED by IEEE 754, so unlike exp/log it is
    * safe in the cross-engine gate. Longitude neighbors wrap; latitude
    * rows clip at the poles, so the neighborhood weight W is 6 or 9 —
    * computed arithmetically, not by probing.
    *
    * Scale shape: one groupBy to cells (combine-enabled), a constant
    * 9× cell-key explode joined against the occupied-cell table, one
    * broadcast of the 1-row global moments. Cost is occupied cells,
    * never the grid or the corpus. */
  def hotspotGiStar(points: DataFrame, latCol: String, lonCol: String,
      cellMicro: Long): DataFrame = {
    require(cellMicro > 0 && LonSpanMicro % cellMicro == 0,
      s"cellMicro must divide the lon span, got $cellMicro")
    val nx = LonSpanMicro / cellMicro
    // latitude rows from the TRUE floor span of lat in [-90e6, 90e6):
    // -(ny/2)..ny/2-1 is only right when 180e6/cellMicro is even (e.g.
    // cellMicro=4e6 gives ny=45 but cy actually spans [-23,22]); the
    // floor form is exact for every divisor, partial polar cells
    // included, so neighborhoods never silently drop polar cells.
    val cyMin = Math.floorDiv(-90000000L, cellMicro)
    val cyMax = Math.floorDiv(90000000L - 1L, cellMicro)
    val nCells = nx * (cyMax - cyMin + 1)
    def cellY(c: Column): Column =
      floor(c.cast("double") / lit(cellMicro.toDouble)).cast("long")
    def cellX(c: Column): Column = (cellY(c) + lit(nx)) % lit(nx)
    val cells = points.select(cellX(col(lonCol)).as("cx"),
        cellY(col(latCol)).as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("x"))
    val m = cells.agg(sum("x").as("t"), sum(col("x") * col("x"))
      .as("sumsq"))
    val nbrKeys = cells
      .select(col("cx").as("cx0"), col("cy").as("cy0"),
        explode(sequence(lit(-1), lit(1))).as("dx"))
      .select(col("cx0"), col("cy0"),
        explode(sequence(lit(-1), lit(1))).as("dy"), col("dx"))
      .select(col("cx0"), col("cy0"),
        ((col("cx0") + col("dx") + lit(nx)) % lit(nx)).as("cx"),
        (col("cy0") + col("dy")).as("cy"))
      .filter(col("cy") >= cyMin && col("cy") <= cyMax)
    val nsum = nbrKeys.join(cells, Seq("cx", "cy"))
      .groupBy(col("cx0").as("cx"), col("cy0").as("cy"))
      .agg(sum("x").as("nsum"))
    // valid-neighbor weight: 3 lon columns x (3 - clipped lat rows)
    val w = (lit(3L) * (lit(3L) -
      when(col("cy") === cyMin, 1L).otherwise(0L) -
      when(col("cy") === cyMax, 1L).otherwise(0L))).cast("double")
    val mean = col("t").cast("double") / lit(nCells.toDouble)
    val s2 = col("sumsq").cast("double") / lit(nCells.toDouble) -
      mean * mean
    val gi = (col("nsum").cast("double") - mean * w) /
      (sqrt(s2) * sqrt((lit(nCells.toDouble) * w - w * w) /
        lit((nCells - 1).toDouble)))
    cells.join(nsum, Seq("cx", "cy"))
      .crossJoin(broadcast(m))
      .select(col("cx"), col("cy"), col("x"), col("nsum"),
        (lit(3L) * (lit(3L) -
          when(col("cy") === cyMin, 1L).otherwise(0L) -
          when(col("cy") === cyMax, 1L).otherwise(0L))).as("w"),
        when(col("sumsq") * lit(nCells) === col("t") * col("t"),
          lit(null).cast("long"))
          .otherwise(floor(lit(1e6) * gi).cast("long")).as("gi_micro"))
      .withColumn("hotspot",
        when(col("gi_micro") > 2576000L, 1L)
          .when(col("gi_micro") < -2576000L, -1L).otherwise(0L))
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
