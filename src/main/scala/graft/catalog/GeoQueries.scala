package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Shared._
import graft.ops.Geo

/** Geospatial family (graft.ops.Geo): grid-bucketed radius self-join,
  * radius-bounded kNN, and broadcast geofence assignment, all on exact
  * integer microdegrees. The fixture has no coordinates, so each point
  * gets a DETERMINISTIC synthetic position from the md5 of its key —
  * the same replayable-hash convention every sampling/sketch oracle in
  * the catalog uses — making the whole spatial pipeline (cells, wrap,
  * distances, ranks) hash-checkable in DuckDB. */
private[graft] object GeoQueries {

  /** Synthetic microdegree coordinates from the customer key (salted
    * md5 prefixes, 48 bits — uniform over the full lat/lon range). */
  private def coordSql: String =
    s"""pts AS MATERIALIZED (SELECT c_custkey AS id,
      CAST(concat('0x', substr(md5('lat|' || CAST(c_custkey AS VARCHAR)),
        1, 12)) AS BIGINT) % 180000000 - 90000000 AS lat,
      CAST(concat('0x', substr(md5('lon|' || CAST(c_custkey AS VARCHAR)),
        1, 12)) AS BIGINT) % 360000000 - 180000000 AS lon
    FROM customer)"""

  private def points(s: SparkSession, d: String): DataFrame = {
    def h(salt: String) = graft.plans.GraftExpressions.md5_prefix(
      concat(lit(salt), col("c_custkey").cast("string")), 12)
    t(s, d, "customer").select(col("c_custkey").as("id"),
      (h("lat|") % lit(180000000L) - lit(90000000L)).as("lat"),
      (h("lon|") % lit(360000000L) - lit(180000000L)).as("lon"))
  }

  /** DuckDB replay of [[Geo.withinRadiusPairs]] at radius 2e6 micro
    * (2°): 180 wrapped x-cells, 3×3 neighborhood explode on the left,
    * equi-join on the wrapped cell, exact integer distance filter. */
  private def pairsSql: String =
    s"""cells AS (SELECT id, lat, lon,
        CAST(floor(CAST(lat AS DOUBLE) / 2000000.0) AS BIGINT) AS cy,
        (CAST(floor(CAST(lon AS DOUBLE) / 2000000.0) AS BIGINT) + 180)
          % 180 AS cx
      FROM pts),
    lhs AS (SELECT id AS id_a, lat AS lat_a, lon AS lon_a,
        (cx + dx + 180) % 180 AS cx, cy + dy AS cy
      FROM cells, UNNEST(range(-1, 2)) AS ux(dx),
        UNNEST(range(-1, 2)) AS uy(dy)),
    pairs AS (SELECT id_a, b.id AS id_b,
        (lat_a - b.lat) * (lat_a - b.lat) +
        least(abs(lon_a - b.lon), 360000000 - abs(lon_a - b.lon)) *
        least(abs(lon_a - b.lon), 360000000 - abs(lon_a - b.lon))
          AS d2_micro
      FROM lhs JOIN cells b ON lhs.cx = b.cx AND lhs.cy = b.cy
      WHERE id_a < b.id),
    sel AS (SELECT * FROM pairs WHERE d2_micro <= 4000000000000)"""

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Radius self-join: every customer pair within 2 planar degrees.
    // Candidates come from ONE cell-key equi-join (3×3 neighborhood,
    // constant 9× scan-stage fan-out), so cost is local density ×
    // corpus, never corpus² — the spatial analog of the LSH-bucketed
    // dedup substrate, with exact antimeridian wraparound.
    ("q_geo_pairs",
      (s: SparkSession, d: String) =>
        Geo.withinRadiusPairs(points(s, d), "id", "lat", "lon", 2000000L),
      Some(s"""WITH $coordSql, $pairsSql
        SELECT id_a, id_b, d2_micro FROM sel""")),

    // Radius-bounded kNN: 3 nearest within 2°, per point — the
    // symmetric closure of the pair join ranked by (distance, id); the
    // rank window is over each point's radius-bounded candidates.
    ("q_geo_knn",
      (s: SparkSession, d: String) =>
        Geo.knnWithinRadius(points(s, d), "id", "lat", "lon",
          2000000L, k = 3),
      Some(s"""WITH $coordSql, $pairsSql,
        sym AS (SELECT id_a AS id, id_b AS neighbor, d2_micro FROM sel
          UNION ALL
          SELECT id_b, id_a, d2_micro FROM sel),
        rk AS (SELECT id, neighbor, d2_micro,
            row_number() OVER (PARTITION BY id
              ORDER BY d2_micro, neighbor) AS rank
          FROM sym)
        SELECT id, neighbor, d2_micro, CAST(rank AS BIGINT) AS rank
        FROM rk WHERE rank <= 3""")),

    // Getis-Ord Gi* hotspot audit (Geo.hotspotGiStar) on the 1-degree
    // grid: per occupied cell, the z-score of its wrapped 3x3
    // neighborhood count against the full-grid moments (N = 64800 is a
    // literal; empty cells are exact zeros in the moments). sqrt is
    // IEEE-correctly-rounded, so the one fixed double chain is
    // cross-engine safe where exp/log would not be. Cost: occupied
    // cells only — one groupBy, one 9x cell-key join, one broadcast
    // moment row.
    ("q_geo_hotspot",
      (s: SparkSession, d: String) =>
        graft.ops.Geo.hotspotGiStar(points(s, d), "lat", "lon", 1000000L),
      Some(s"""WITH $coordSql,
        cells AS (SELECT
            (CAST(floor(CAST(lon AS DOUBLE) / 1000000.0) AS BIGINT)
              + 360) % 360 AS cx,
            CAST(floor(CAST(lat AS DOUBLE) / 1000000.0) AS BIGINT) AS cy,
            CAST(count(*) AS BIGINT) AS x
          FROM pts GROUP BY 1, 2),
        m AS (SELECT CAST(sum(x) AS BIGINT) AS t,
            CAST(sum(x * x) AS BIGINT) AS sumsq FROM cells),
        nk AS (SELECT cx AS cx0, cy AS cy0,
            (cx + dx + 360) % 360 AS cx, cy + dy AS cy
          FROM cells, UNNEST(range(-1, 2)) AS ux(dx),
            UNNEST(range(-1, 2)) AS uy(dy)
          WHERE cy + dy >= -90 AND cy + dy <= 89),
        ns AS (SELECT nk.cx0 AS cx, nk.cy0 AS cy,
            CAST(sum(c.x) AS BIGINT) AS nsum
          FROM nk JOIN cells c ON c.cx = nk.cx AND c.cy = nk.cy
          GROUP BY 1, 2),
        j AS (SELECT cells.cx, cells.cy, cells.x, ns.nsum, t, sumsq,
            CAST(3 * (3 - (CASE WHEN cells.cy = -90 THEN 1 ELSE 0 END)
              - (CASE WHEN cells.cy = 89 THEN 1 ELSE 0 END)) AS BIGINT)
              AS w
          FROM cells JOIN ns ON ns.cx = cells.cx AND ns.cy = cells.cy,
            m),
        gi AS (SELECT cx, cy, x, nsum, w,
            CASE WHEN sumsq * 64800 = t * t THEN NULL
              ELSE CAST(floor(1e6 *
                (CAST(nsum AS DOUBLE) - CAST(t AS DOUBLE) / 64800.0
                  * CAST(w AS DOUBLE)) /
                (sqrt(CAST(sumsq AS DOUBLE) / 64800.0
                    - (CAST(t AS DOUBLE) / 64800.0)
                      * (CAST(t AS DOUBLE) / 64800.0))
                  * sqrt((64800.0 * CAST(w AS DOUBLE)
                      - CAST(w AS DOUBLE) * CAST(w AS DOUBLE))
                    / 64799.0))) AS BIGINT) END AS gi_micro
          FROM j)
        SELECT cx, cy, x, nsum, w, gi_micro,
          CASE WHEN gi_micro > 2576000 THEN CAST(1 AS BIGINT)
            WHEN gi_micro < -2576000 THEN CAST(-1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS hotspot
        FROM gi""")),

    // Broadcast geofence rollup: five literal rectangles; the fence
    // table broadcasts, so containment is a scan-stage predicate chain
    // (no shuffle at any scale) and only the per-fence aggregate moves.
    ("q_geo_fence",
      (s: SparkSession, d: String) => {
        val fences = s.createDataFrame(Seq(
          ("arctic", 66000000L, 90000000L, -180000000L, 180000000L),
          ("tropics", -23000000L, 23000000L, -180000000L, 180000000L),
          ("atlantic_mid", -20000000L, 40000000L, -60000000L, 0L),
          ("pacific_ne", 20000000L, 60000000L, -180000000L, -120000000L),
          ("indian_box", -40000000L, 10000000L, 50000000L, 100000000L)))
          .toDF("fence_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
        val pts = points(s, d)
          .join(t(s, d, "customer").select(col("c_custkey").as("id"),
            cents(col("c_acctbal")).as("bal")), Seq("id"))
        Geo.assignFences(pts, "id", "lat", "lon", fences)
          .groupBy("fence_id")
          .agg(count(lit(1)).as("n_points"), sum("bal").as("bal_cents"),
            min("id").as("min_id"), max("id").as("max_id"))
      },
      Some(s"""WITH $coordSql,
        f(fence_id, lat_lo, lat_hi, lon_lo, lon_hi) AS (VALUES
          ('arctic', 66000000, 90000000, -180000000, 180000000),
          ('tropics', -23000000, 23000000, -180000000, 180000000),
          ('atlantic_mid', -20000000, 40000000, -60000000, 0),
          ('pacific_ne', 20000000, 60000000, -180000000, -120000000),
          ('indian_box', -40000000, 10000000, 50000000, 100000000)),
        pb AS (SELECT p.id, p.lat, p.lon,
            ${centsSql("c.c_acctbal")} AS bal
          FROM pts p JOIN customer c ON c.c_custkey = p.id)
        SELECT fence_id, CAST(count(*) AS BIGINT) AS n_points,
          CAST(sum(bal) AS BIGINT) AS bal_cents,
          min(id) AS min_id, max(id) AS max_id
        FROM pb JOIN f ON pb.lat >= f.lat_lo AND pb.lat < f.lat_hi
          AND pb.lon >= f.lon_lo AND pb.lon < f.lon_hi
        GROUP BY 1""")))
}
