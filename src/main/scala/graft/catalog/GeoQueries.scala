package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** DuckDB replay of the q_geo_dbscan cluster labeling WITHOUT a
    * recursive transitive closure. The old `WITH RECURSIVE reach`
    * oracle materialized every (node, reachable-root) pair —
    * O(Σ|component|²) rows, which at sf1 (where nearly all 64800 grid
    * cells are dense and one component spans the globe) is ~4·10⁹ rows
    * and blows the 1800 s gate budget. This replay instead mirrors the
    * engine's own fixed-point structure: R unrolled rounds of
    * (min-label propagation over edges) + (pointer jump L := L[L]),
    * every round a MATERIALIZED CTE over at most |dense| ≤ 64800 rows
    * (the grid is 360×180 regardless of scale factor, so the per-round
    * cost is bounded by the GRID, not the data). Reach at least
    * doubles per round (the jump composes label chains), so R = 24
    * covers any component: 2²⁴ ≫ 64800, and the worst-case dense-cell
    * graph is a 64800-cell serpentine. Correctness is guarded, not
    * assumed: one extra propagation round after lab_R must be a fixed
    * point or the final WHERE empties the result — a LOUD row-count
    * mismatch instead of a silently split component (the
    * q_emb_mutual_knn sf1 lesson). At a propagation fixed point the
    * label is constant on every component and the component minimum
    * labels itself, so converged ⇒ exact min-id components — the same
    * contract as Dedup.componentsStar. */
  private def dbscanOracleSql: String = {
    val rounds = 24
    val roundCtes = (1 to rounds).map { i =>
      val prev = s"lab${i - 1}"
      // Both CTEs of every round are consumed twice (the propagation
      // reads prev as l and n; the jump reads p as p and j) — DuckDB
      // inlines plain CTEs into EACH consumer, so without MATERIALIZED
      // the plan doubles per round: 2^24 subtrees. The heavy-oracle
      // lint (OracleLintSpec) enforces this shape.
      s"""p$i AS MATERIALIZED (SELECT l.id,
          least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
        FROM $prev l
        LEFT JOIN edges e ON e.a = l.id
        LEFT JOIN $prev n ON n.id = e.b
        GROUP BY l.id, l.lbl),
      lab$i AS MATERIALIZED (SELECT p.id, j.lbl
        FROM p$i p JOIN p$i j ON j.id = p.lbl)"""
    }.mkString(",\n        ")
    s"""WITH $coordSql,
      cells AS (SELECT
          (CAST(floor(CAST(lon AS DOUBLE) / 1000000.0) AS BIGINT)
            + 360) % 360 AS cx,
          CAST(floor(CAST(lat AS DOUBLE) / 1000000.0) AS BIGINT) AS cy,
          CAST(count(*) AS BIGINT) AS x
        FROM pts GROUP BY 1, 2),
      dense AS MATERIALIZED (SELECT (cy + 90) * 360 + cx AS key,
          cx, cy, x
        FROM cells WHERE x >= 2),
      nb AS (SELECT d.key AS a,
          (cy + dy + 90) * 360 + (cx + dx + 360) % 360 AS b
        FROM dense d, UNNEST(range(-1, 2)) AS ux(dx),
          UNNEST(range(-1, 2)) AS uy(dy)
        WHERE NOT (dx = 0 AND dy = 0)),
      edges AS MATERIALIZED (SELECT a, b FROM nb
        WHERE b IN (SELECT key FROM dense)),
      lab0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl
        FROM edges),
      $roundCtes,
      chk AS (SELECT l.id,
          least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
        FROM lab$rounds l
        LEFT JOIN edges e ON e.a = l.id
        LEFT JOIN lab$rounds n ON n.id = e.b
        GROUP BY l.id, l.lbl),
      bad AS (SELECT count(*) AS n FROM chk c
        JOIN lab$rounds f ON f.id = c.id AND f.lbl <> c.lbl),
      lab AS MATERIALIZED (SELECT d.cx, d.cy, d.x,
          coalesce(f.lbl, d.key) AS cluster_id
        FROM dense d LEFT JOIN lab$rounds f ON f.id = d.key),
      cl AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
            AS cluster_cells,
          CAST(sum(x) AS BIGINT) AS cluster_points
        FROM lab GROUP BY 1)
      SELECT cx, cy, x, cluster_id, cluster_cells, cluster_points
      FROM lab JOIN cl USING (cluster_id)
      WHERE (SELECT n FROM bad) = 0"""
  }

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

    // Quadrat test for complete spatial randomness (the classic CSR
    // chi-square over a coarse grid — Diggle's spatial-stats workhorse,
    // and the global sibling of the per-cell Gi* audit): with K = 648
    // ten-degree cells, chi2 = sum over ALL cells of (o - N/K)^2/(N/K)
    // collapses to the EXACT integer rational (K*sum(o^2) - N^2)/N —
    // empty cells need no rows, the whole test is one occupied-cell
    // aggregate. Threshold: chi2(0.05, df=647) ~ 706.8 (Wilson-
    // Hilferty), as a micro literal.
    ("q_geo_quadrat",
      (s: SparkSession, d: String) => {
        def cellY(c: org.apache.spark.sql.Column) =
          floor(c.cast("double") / lit(10000000.0)).cast("long")
        val cells = points(s, d)
          .select(((cellY(col("lon")) + lit(36L)) % lit(36L)).as("cx"),
            cellY(col("lat")).as("cy"))
          .groupBy("cx", "cy").agg(count(lit(1)).as("o"))
        cells.agg(sum("o").as("n_points"),
            count(lit(1)).as("n_occupied"),
            sum(col("o") * col("o")).as("sum_sq"))
          .select(col("n_points"), lit(648L).as("n_cells"),
            col("n_occupied"), col("sum_sq"),
            floor(lit(1e6) *
              (lit(648L) * col("sum_sq") -
                col("n_points") * col("n_points")).cast("double") /
              col("n_points").cast("double")).cast("long")
              .as("chi2_micro"))
          .withColumn("csr_rejected",
            when(col("chi2_micro") > 706800000L, 1L).otherwise(0L))
      },
      Some(s"""WITH $coordSql,
        cells AS (SELECT
            (CAST(floor(CAST(lon AS DOUBLE) / 10000000.0) AS BIGINT)
              + 36) % 36 AS cx,
            CAST(floor(CAST(lat AS DOUBLE) / 10000000.0) AS BIGINT)
              AS cy,
            CAST(count(*) AS BIGINT) AS o
          FROM pts GROUP BY 1, 2),
        a AS (SELECT CAST(sum(o) AS BIGINT) AS n_points,
            CAST(count(*) AS BIGINT) AS n_occupied,
            CAST(sum(o * o) AS BIGINT) AS sum_sq
          FROM cells)
        SELECT n_points, CAST(648 AS BIGINT) AS n_cells, n_occupied,
          sum_sq,
          CAST(floor(1e6 * CAST(648 * sum_sq - n_points * n_points
            AS DOUBLE) / CAST(n_points AS DOUBLE)) AS BIGINT)
            AS chi2_micro,
          CASE WHEN CAST(floor(1e6 * CAST(648 * sum_sq
              - n_points * n_points AS DOUBLE) /
              CAST(n_points AS DOUBLE)) AS BIGINT) > 706800000
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS csr_rejected
        FROM a""")),

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

    // Grid-DBSCAN (density clustering the scalable way — GriT/grid-
    // based DBSCAN family): cells with >= 2 points are dense; dense
    // cells that are 8-adjacent (lon wraps) merge into clusters via
    // the SAME min-label components machinery the dedup suite uses
    // (Dedup.components — the oracle is the true transitive closure,
    // WITH RECURSIVE). Sub-dense cells are noise. Cost: one cell
    // groupBy + a constant 8x neighbor join over DENSE CELLS only —
    // point count never enters a pairwise join, which is what makes
    // this DBSCAN shape viable at 100 TB where point-level epsilon
    // joins are not.
    ("q_geo_dbscan",
      (s: SparkSession, d: String) => {
        def cellY(c: org.apache.spark.sql.Column) =
          floor(c.cast("double") / lit(1000000.0)).cast("long")
        def cellX(c: org.apache.spark.sql.Column) =
          (cellY(c) + lit(360L)) % lit(360L)
        val cells = points(s, d)
          .select(cellX(col("lon")).as("cx"), cellY(col("lat")).as("cy"))
          .groupBy("cx", "cy").agg(count(lit(1)).as("x"))
        // lazy cut (r13): dense feeds the neighbor explode, the edge
        // semi-join and the labeling — one points aggregate instead of 3
        val dense = cells.filter(col("x") >= 2)
          .withColumn("key", (col("cy") + lit(90L)) * lit(360L) +
            col("cx"))
          .localCheckpoint(false)
        val nbr = dense
          .select(col("key").as("a"), col("cx"), col("cy"),
            explode(sequence(lit(-1), lit(1))).as("dx"))
          .select(col("a"), col("cx"), col("cy"), col("dx"),
            explode(sequence(lit(-1), lit(1))).as("dy"))
          .filter(!(col("dx") === 0 && col("dy") === 0))
          .select(col("a"),
            ((col("cy") + col("dy") + lit(90L)) * lit(360L) +
              (col("cx") + col("dx") + lit(360L)) % lit(360L)).as("b"))
        val edges = nbr.join(dense.select(col("key").as("b")), Seq("b"))
        // componentsStar, not components: a dense-cell corridor can have
        // graph diameter > label-propagation's maxIter (spatial adjacency
        // chains, unlike near-dup cliques), and the oracle is the TRUE
        // transitive closure — star contraction converges in O(log^2 n)
        // rounds regardless of diameter.
        val comp = graft.ops.Dedup.componentsStar(edges, "a", "b")
        val lab = dense
          .join(comp.select(col("doc_id").as("key"),
            col("component_id")), Seq("key"), "left")
          .select(col("cx"), col("cy"), col("x"),
            coalesce(col("component_id"), col("key")).as("cluster_id"))
          // lazy cut: lab feeds the cluster rollup AND the final join
          .localCheckpoint(false)
        val cl = lab.groupBy("cluster_id")
          .agg(count(lit(1)).as("cluster_cells"),
            sum("x").as("cluster_points"))
        lab.join(cl, Seq("cluster_id"))
          .select("cx", "cy", "x", "cluster_id", "cluster_cells",
            "cluster_points")
      },
      Some(dbscanOracleSql)),

    // Exact point-in-polygon census by integer ray casting: two
    // literal polygons (one convex pentagon, one CONCAVE chevron — the
    // case rectangles cannot express), each edge a VALUES row; a point
    // is inside iff its +x ray crosses an odd number of edges. The
    // crossing test is the half-open [y1, y2) rule with the division
    // CROSS-MULTIPLIED away (sign-corrected by the edge direction), so
    // every comparison is exact BIGINT — no floats anywhere. The edge
    // table broadcasts: per point the test is a constant k-edge
    // predicate fan-out in the scan stage, the polygon analog of the
    // rectangle geofence.
    ("q_geo_polygon",
      (s: SparkSession, d: String) => {
        val edges = s.createDataFrame(Seq(
          // pentagon (convex), micro-degree (x=lon, y=lat), closed ring
          ("pentagon", -60000000L, -40000000L, 0L, -60000000L),
          ("pentagon", 0L, -60000000L, 60000000L, -40000000L),
          ("pentagon", 60000000L, -40000000L, 40000000L, 30000000L),
          ("pentagon", 40000000L, 30000000L, -40000000L, 30000000L),
          ("pentagon", -40000000L, 30000000L, -60000000L, -40000000L),
          // chevron (concave): notch cut into the top edge
          ("chevron", -80000000L, 40000000L, 0L, 80000000L),
          ("chevron", 0L, 80000000L, 80000000L, 40000000L),
          ("chevron", 80000000L, 40000000L, 80000000L, 60000000L),
          ("chevron", 80000000L, 60000000L, 0L, 89000000L),
          ("chevron", 0L, 89000000L, -80000000L, 60000000L),
          ("chevron", -80000000L, 60000000L, -80000000L, 40000000L)))
          .toDF("polygon_id", "x1", "y1", "x2", "y2")
        val pts = points(s, d)
          .join(t(s, d, "customer").select(col("c_custkey").as("id"),
            cents(col("c_acctbal")).as("bal")), Seq("id"))
        val lhs = (col("lon") - col("x1")) * (col("y2") - col("y1")) -
          (col("lat") - col("y1")) * (col("x2") - col("x1"))
        val crossing = ((col("y1") > col("lat")) =!=
          (col("y2") > col("lat"))) &&
          when(col("y2") > col("y1"), lhs < 0).otherwise(lhs > 0)
        pts.crossJoin(broadcast(edges))
          .groupBy("polygon_id", "id", "bal")
          .agg(sum(when(crossing, 1L).otherwise(0L)).as("crossings"))
          .filter(col("crossings") % 2 === 1)
          .groupBy("polygon_id")
          .agg(count(lit(1)).as("n_inside"),
            sum("bal").as("bal_cents_inside"),
            min("id").as("min_id"), max("id").as("max_id"))
      },
      Some(s"""WITH $coordSql,
        eg(polygon_id, x1, y1, x2, y2) AS (VALUES
          ('pentagon', -60000000, -40000000, 0, -60000000),
          ('pentagon', 0, -60000000, 60000000, -40000000),
          ('pentagon', 60000000, -40000000, 40000000, 30000000),
          ('pentagon', 40000000, 30000000, -40000000, 30000000),
          ('pentagon', -40000000, 30000000, -60000000, -40000000),
          ('chevron', -80000000, 40000000, 0, 80000000),
          ('chevron', 0, 80000000, 80000000, 40000000),
          ('chevron', 80000000, 40000000, 80000000, 60000000),
          ('chevron', 80000000, 60000000, 0, 89000000),
          ('chevron', 0, 89000000, -80000000, 60000000),
          ('chevron', -80000000, 60000000, -80000000, 40000000)),
        pb AS (SELECT p.id, p.lat, p.lon, ${centsSql("c.c_acctbal")}
              AS bal
          FROM pts p JOIN customer c ON c.c_custkey = p.id),
        cr AS (SELECT polygon_id, id, bal,
            CAST(sum(CASE WHEN ((y1 > lat) <> (y2 > lat)) AND
              (CASE WHEN y2 > y1
                THEN (lon - x1) * (y2 - y1) - (lat - y1) * (x2 - x1) < 0
                ELSE (lon - x1) * (y2 - y1) - (lat - y1) * (x2 - x1) > 0
              END) THEN 1 ELSE 0 END) AS BIGINT) AS crossings
          FROM pb CROSS JOIN eg GROUP BY 1, 2, 3)
        SELECT polygon_id, CAST(count(*) AS BIGINT) AS n_inside,
          CAST(sum(bal) AS BIGINT) AS bal_cents_inside,
          min(id) AS min_id, max(id) AS max_id
        FROM cr WHERE crossings % 2 = 1 GROUP BY 1""")),

    // Trajectory statistics per device: events become pings (coords
    // keyed off the event id — same replayable-hash convention as the
    // point fixture), ordered per user by (ts, event_id); path length
    // = sum of floor(sqrt(segment d2)) — sqrt is correctly rounded and
    // floor makes each segment an exact BIGINT, so the per-user SUM is
    // order-free (no IEEE fold needed, unlike a raw double path).
    // Straightness = displacement/path exposes ping-ponging devices
    // (bot/spoof detection). One per-user lag window (bounded), one
    // aggregate.
    ("q_geo_trajectory",
      (s: SparkSession, d: String) => {
        def h(salt: String) = graft.plans.GraftExpressions.md5_prefix(
          concat(lit(salt), col("event_id").cast("string")), 12)
        val pings = t(s, d, "events").select(
          col("user_id").as("device_id"), col("ts"), col("event_id"),
          (h("plat|") % lit(180000000L) - lit(90000000L)).as("lat"),
          (h("plon|") % lit(360000000L) - lit(180000000L)).as("lon"))
        val w = Window.partitionBy("device_id")
          .orderBy(col("ts"), col("event_id"))
        val seg = pings
          .withColumn("plat", lag("lat", 1).over(w))
          .withColumn("plon", lag("lon", 1).over(w))
          .withColumn("step", when(col("plat").isNotNull,
            floor(sqrt(((col("lat") - col("plat")) *
              (col("lat") - col("plat")) +
              (col("lon") - col("plon")) * (col("lon") - col("plon")))
              .cast("double"))).cast("long")).otherwise(0L))
          .withColumn("rk", row_number().over(w))
        val ends = seg.groupBy("device_id")
          .agg(count(lit(1)).as("n_pings"), sum("step").as("path_micro"),
            min(struct(col("rk"), col("lat"), col("lon"))).as("first"),
            max(struct(col("rk"), col("lat"), col("lon"))).as("last"))
        ends.select(col("device_id"), col("n_pings"), col("path_micro"),
            floor(sqrt(((col("last.lat") - col("first.lat")) *
              (col("last.lat") - col("first.lat")) +
              (col("last.lon") - col("first.lon")) *
              (col("last.lon") - col("first.lon"))).cast("double")))
              .cast("long").as("disp_micro"))
          .withColumn("straightness_ppm",
            expr("disp_micro * 1000000L div greatest(path_micro, 1L)"))
      },
      Some("""WITH p AS (SELECT user_id AS device_id, ts, event_id,
            CAST(concat('0x', substr(md5('plat|' ||
              CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)
              % 180000000 - 90000000 AS lat,
            CAST(concat('0x', substr(md5('plon|' ||
              CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)
              % 360000000 - 180000000 AS lon
          FROM events),
        seg AS (SELECT device_id, lat, lon,
            lag(lat) OVER wd AS plat, lag(lon) OVER wd AS plon,
            row_number() OVER wd AS rk
          FROM p WINDOW wd AS (PARTITION BY device_id
            ORDER BY ts, event_id)),
        st AS (SELECT device_id,
            CASE WHEN plat IS NOT NULL THEN CAST(floor(sqrt(CAST(
              (lat - plat) * (lat - plat) + (lon - plon) * (lon - plon)
              AS DOUBLE))) AS BIGINT) ELSE 0 END AS step,
            rk, lat, lon
          FROM seg),
        e AS (SELECT device_id, CAST(count(*) AS BIGINT) AS n_pings,
            CAST(sum(step) AS BIGINT) AS path_micro,
            min_by(lat, rk) AS flat, min_by(lon, rk) AS flon,
            max_by(lat, rk) AS llat, max_by(lon, rk) AS llon
          FROM st GROUP BY 1)
        SELECT device_id, n_pings, path_micro,
          CAST(floor(sqrt(CAST((llat - flat) * (llat - flat)
            + (llon - flon) * (llon - flon) AS DOUBLE))) AS BIGINT)
            AS disp_micro,
          CAST(floor(sqrt(CAST((llat - flat) * (llat - flat)
            + (llon - flon) * (llon - flon) AS DOUBLE))) AS BIGINT)
            * 1000000 // greatest(path_micro, 1) AS straightness_ppm
        FROM e""")),

    // Movement-bearing octant histogram — the direction profile of the
    // trajectory family (a bot/spoof signal: organic movement spreads
    // over octants, replayed or gridded movement doesn't), computed
    // WITHOUT trigonometry: the octant of each segment is a pure
    // integer function of (sign(dlat), sign(dlon), |dlat| vs |dlon|) —
    // 0 = E, counting counter-clockwise. Uniformity is the same exact
    // chi-square rational as q_geo_quadrat over K = 8 bins:
    // (8·Σo² − N²)/N, df = 7 (critical 14.067 as a micro literal).
    ("q_geo_bearing",
      (s: SparkSession, d: String) => {
        def h(salt: String) = graft.plans.GraftExpressions.md5_prefix(
          concat(lit(salt), col("event_id").cast("string")), 12)
        val pings = t(s, d, "events").select(
          col("user_id").as("device_id"), col("ts"), col("event_id"),
          (h("plat|") % lit(180000000L) - lit(90000000L)).as("lat"),
          (h("plon|") % lit(360000000L) - lit(180000000L)).as("lon"))
        val w = Window.partitionBy("device_id")
          .orderBy(col("ts"), col("event_id"))
        val seg = pings
          .withColumn("dlat", col("lat") - lag("lat", 1).over(w))
          .withColumn("dlon", col("lon") - lag("lon", 1).over(w))
          .filter(col("dlat").isNotNull &&
            !(col("dlat") === 0 && col("dlon") === 0))
        val oct = when(abs(col("dlon")) >= abs(col("dlat")),
            when(col("dlon") >= 0,
              when(col("dlat") >= 0, 0L).otherwise(7L))
            .otherwise(when(col("dlat") >= 0, 3L).otherwise(4L)))
          .otherwise(
            when(col("dlat") >= 0,
              when(col("dlon") >= 0, 1L).otherwise(2L))
            .otherwise(when(col("dlon") >= 0, 6L).otherwise(5L)))
        val hist = seg.select(oct.as("octant"))
          .groupBy("octant").agg(count(lit(1)).as("o"))
        val m = hist.agg(sum("o").as("n_segments"),
          sum(col("o") * col("o")).as("sum_sq"))
        hist.crossJoin(broadcast(m))
          .select(col("octant"), col("o"), col("n_segments"),
            floor(lit(1e6) *
              (lit(8L) * col("sum_sq") -
                col("n_segments") * col("n_segments")).cast("double") /
              col("n_segments").cast("double")).cast("long")
              .as("chi2_micro"))
          .withColumn("uniform_rejected",
            when(col("chi2_micro") > 14067000L, 1L).otherwise(0L))
      },
      Some("""WITH p AS (SELECT user_id AS device_id, ts, event_id,
            CAST(concat('0x', substr(md5('plat|' ||
              CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)
              % 180000000 - 90000000 AS lat,
            CAST(concat('0x', substr(md5('plon|' ||
              CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)
              % 360000000 - 180000000 AS lon
          FROM events),
        seg AS (SELECT lat - lag(lat) OVER wd AS dlat,
            lon - lag(lon) OVER wd AS dlon
          FROM p WINDOW wd AS (PARTITION BY device_id
            ORDER BY ts, event_id)),
        sg AS (SELECT * FROM seg WHERE dlat IS NOT NULL
          AND NOT (dlat = 0 AND dlon = 0)),
        oc AS (SELECT CASE WHEN abs(dlon) >= abs(dlat) THEN
              CASE WHEN dlon >= 0 THEN
                CASE WHEN dlat >= 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(7 AS BIGINT) END
              ELSE CASE WHEN dlat >= 0 THEN CAST(3 AS BIGINT)
                ELSE CAST(4 AS BIGINT) END END
            ELSE CASE WHEN dlat >= 0 THEN
                CASE WHEN dlon >= 0 THEN CAST(1 AS BIGINT)
                  ELSE CAST(2 AS BIGINT) END
              ELSE CASE WHEN dlon >= 0 THEN CAST(6 AS BIGINT)
                ELSE CAST(5 AS BIGINT) END END END AS octant
          FROM sg),
        hist AS (SELECT octant, CAST(count(*) AS BIGINT) AS o
          FROM oc GROUP BY 1),
        m AS (SELECT CAST(sum(o) AS BIGINT) AS n_segments,
            CAST(sum(o * o) AS BIGINT) AS sum_sq FROM hist)
        SELECT octant, o, n_segments,
          CAST(floor(1e6 * CAST(8 * sum_sq - n_segments * n_segments
            AS DOUBLE) / CAST(n_segments AS DOUBLE)) AS BIGINT)
            AS chi2_micro,
          CASE WHEN CAST(floor(1e6 * CAST(8 * sum_sq
              - n_segments * n_segments AS DOUBLE) /
              CAST(n_segments AS DOUBLE)) AS BIGINT) > 14067000
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS uniform_rejected
        FROM hist, m""")),

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
