package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.incr.Incremental
import graft.meta.ColumnSpec
import graft.ops.{Dedup, Graph, Multimodal, Recon, Sampling, Similarity, TextOps}
import graft.pipeline.StageTransform
import graft.write.MergeWriter
import graft.catalog.Shared._
import graft.catalog.DslQueries._
import graft.catalog.PipelineQueries._
import graft.catalog.RelationalQueries._
import graft.catalog.TextQueries._
import graft.catalog.DedupQueries._

/** embedding similarity / ANN / compression queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object SimQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Deterministic spherical k-means over the embedding corpus — the
    // cluster-then-curate entry point (per-cluster sampling, SemDeDup).
    // 2 Lloyd rounds from the k smallest-id seeds; the oracle replays the
    // exact integer math of every round. k=8 PINNED DELIBERATELY: k is a
    // USER model parameter here (how many clusters the curator wants),
    // not a scale knob — cost is n·k·iters, linear in n at any pinned k.
    // (SemDeDup-style pair work is the place k must scale; see
    // q_emb_semdedup's derived k.)
    ("q_emb_kmeans",
      (s: SparkSession, d: String) => Similarity.kmeans(
        t(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 2),
      Some(s"""${kmeansCtes(k = 8, iters = 2)}
        SELECT vec_id, cid AS cluster FROM asg""")),

    // Rocchio nearest-centroid classification (Similarity.rocchioConfusion)
    // — one integer centroid per label over the md5 train split, held-out
    // vectors assigned by the IvfAssign codegen expression (max 6dp-floored
    // cosine, min-label tiebreak; no join, one reference-object table).
    // The embedding-side sibling of q_ml_naive_bayes: together they pin
    // the two cheapest supervised corpus labelers. The oracle replays
    // training (Lloyd-mean floor(sum/n) per dim) AND scoring.
    ("q_emb_rocchio",
      (s: SparkSession, d: String) => Similarity.rocchioConfusion(
        t(s, d, "embeddings"), "vec_id", "embedding", "label"),
      Some(s"""WITH q AS MATERIALIZED (SELECT vec_id,
            CAST(label AS BIGINT) AS label, $quantSql AS v,
            (CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 5 = 0) AS is_test
          FROM embeddings),
        comp AS (SELECT label, pos,
            CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS m
          FROM (SELECT label, unnest(v) AS x,
              generate_subscripts(v, 1) AS pos
            FROM q WHERE NOT is_test)
          GROUP BY 1, 2),
        c AS (SELECT label AS clab, list(m ORDER BY pos) AS cv
          FROM comp GROUP BY 1),
        sc AS (SELECT q.vec_id, q.label, c.clab,
            ${cosineSql("q.v", "c.cv")} AS cos
          FROM q CROSS JOIN c WHERE q.is_test),
        pr AS (SELECT vec_id, label, clab, row_number()
            OVER (PARTITION BY vec_id ORDER BY cos DESC, clab ASC) AS rn
          FROM sc)
        SELECT label, clab AS label_pred, CAST(count(*) AS BIGINT)
          AS n_vecs
        FROM pr WHERE rn = 1 GROUP BY 1, 2""")),

    // Simplified-silhouette audit of the same k-means model (score against
    // CENTROIDS, O(n·k) — the only silhouette shape that exists at corpus
    // scale): per cluster, cohesion (own-centroid cosine mass) vs
    // separation (best other-centroid mass) and the count of vectors
    // sitting on the wrong side of a boundary. Exact micro-cosines; the
    // oracle replays training AND audit bit-for-bit.
    ("q_emb_silhouette",
      (s: SparkSession, d: String) => Similarity.silhouetteAudit(
        t(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 2),
      Some(s"""${kmeansCtes(k = 8, iters = 2)},
        sims AS (SELECT a.vec_id, a.cid, c.cid AS ccid,
            ${simMicroSql("a.v", "c.cv")} AS sim
          FROM asg a CROSS JOIN c2 c),
        per AS (SELECT vec_id, cid,
            max(CASE WHEN ccid = cid THEN sim END) AS own,
            max(CASE WHEN ccid <> cid THEN sim END) AS oth
          FROM sims GROUP BY 1, 2)
        SELECT cid AS cluster, count(*) AS n_vecs,
          CAST(sum(own) AS BIGINT) AS own_sum,
          CAST(sum(oth) AS BIGINT) AS other_sum,
          CAST(sum(CASE WHEN oth > own THEN 1 ELSE 0 END) AS BIGINT)
            AS n_misassigned
        FROM per GROUP BY 1""")),

    // SemDeDup: within each k-means cluster, drop every vector with a
    // smaller-id near-duplicate (cosine >= 0.35); pairwise work is bounded
    // by cluster size, never corpus size. k DERIVED from count(*) via
    // Similarity.kFor (round 12): pinned k=8 made within-cluster pair
    // work quadratic (39.5x per decade measured at sf10); k ∝ n holds it
    // linear (1.85x measured), and the oracle replays the ceil-div
    // derivation itself (kmeansCtesDyn's kctx).
    ("q_emb_semdedup",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.semanticDedup(e, "vec_id", "embedding",
          k = Similarity.kFor(tCount(s, d, "embeddings")), iters = 1,
          threshold = 0.35)
      },
      Some(s"""${kmeansCtesDyn(iters = 1)},
        pairs AS (SELECT b.vec_id AS id2
          FROM asg a JOIN asg b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE ${cosineSql("a.v", "b.v")} >= 0.35)
        SELECT vec_id, cid AS cluster FROM asg
        WHERE vec_id NOT IN (SELECT id2 FROM pairs)""")),

    // the mega-cluster guard: clusters over `maxCluster` rows skip pairwise
    // dedup entirely (all kept) — bounded worst stage at the cost of recall.
    // At this fixture (sizes 53..71, cap 60) three clusters still dedup and
    // five are capped, so the oracle discriminates both code paths.
    // k=8/cap=60 PINNED DELIBERATELY (oracle-exactness pin): this row
    // exists to discriminate the cap guard at gate scale, which needs
    // cluster sizes that straddle the cap; the scale-safe derived-k
    // configuration is gated by q_emb_semdedup above.
    ("q_emb_semdedup_capped",
      (s: SparkSession, d: String) => Similarity.semanticDedup(
        t(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 1,
        threshold = 0.35, maxCluster = 60),
      Some(s"""${kmeansCtes(k = 8, iters = 1)},
        small AS MATERIALIZED (SELECT cid FROM asg
          GROUP BY cid HAVING count(*) <= 60),
        pairs AS (SELECT b.vec_id AS id2
          FROM asg a JOIN asg b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE a.cid IN (SELECT cid FROM small)
            AND ${cosineSql("a.v", "b.v")} >= 0.35)
        SELECT vec_id, cid AS cluster FROM asg
        WHERE vec_id NOT IN (SELECT id2 FROM pairs)""")),

    ("q_sim_topk",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.cosineTopK(e, "vec_id", "embedding",
            e.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""WITH q AS (SELECT vec_id, $quantSql AS v
          FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            ${cosineSql("q.v", "c.v")} AS cosine
          FROM q JOIN c ON c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, cosine, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 5""")),

    // Tiered retrieval: score EVERY candidate with the cheap 8-dim JL
    // projection (integer dot, scan-stage), rank-limit to the top-64
    // shortlist per probe, then rerank only the shortlist with the exact
    // 64-dim dot — the two-tier pattern that makes exact scoring
    // affordable at corpus scale (the expensive dot touches 64 rows per
    // probe, not the corpus). Both tiers are integer-exact, so the oracle
    // replays shortlist AND rerank bit-for-bit — including which
    // neighbors the prefilter admits.
    // MMR diversified selection (Similarity.mmrSelect): 3 picks per probe
    // from a 16-candidate shortlist at lambda = 7/10 — relevance traded
    // against redundancy so the picks SPAN the neighborhood instead of
    // restating the nearest result. Integer micro-cosines + rational
    // lambda make every round's argmax exact; the oracle unrolls the
    // greedy trace round by round (s1/s2/s3 CTEs) and must match the
    // whole (sim, penalty, score, pick) tuple.
    ("q_sim_mmr", {
      ((s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.mmrSelect(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 4), "vec_id", "embedding",
          shortlist = 16, k = 3)
      }): Q
      },
      Some(s"""WITH q0 AS (SELECT vec_id, $quantSql AS v FROM embeddings),
          p AS (SELECT vec_id AS query_id, v AS qv FROM q0
            WHERE vec_id < 4),
          scored0 AS (SELECT p.query_id, c.vec_id AS cand_id, c.v AS cv,
              ${simMicroSql("c.v", "p.qv")} AS sim
            FROM q0 c JOIN p ON c.vec_id <> p.query_id),
          cand AS (SELECT query_id, cand_id, cv, sim FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, cand_id) AS rk FROM scored0)
            WHERE rk <= 16),
          pr AS (SELECT x.query_id, x.cand_id AS a, y.cand_id AS b,
              ${simMicroSql("x.cv", "y.cv")} AS psim
            FROM cand x JOIN cand y ON x.query_id = y.query_id
              AND x.cand_id <> y.cand_id),
          s1 AS (SELECT query_id, cand_id, sim,
              CAST(0 AS BIGINT) AS penalty, 7 * sim AS score, 1 AS pick
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, cand_id) AS rk FROM cand)
            WHERE rk = 1),
          pen2 AS (SELECT pr.query_id, pr.a AS cand_id,
              max(pr.psim) AS penalty
            FROM pr JOIN s1 ON pr.query_id = s1.query_id
              AND pr.b = s1.cand_id
            GROUP BY 1, 2),
          sc2 AS (SELECT c.query_id, c.cand_id, c.sim,
              coalesce(p2.penalty, CAST(0 AS BIGINT)) AS penalty,
              7 * c.sim - 3 * coalesce(p2.penalty, CAST(0 AS BIGINT))
                AS score
            FROM cand c LEFT JOIN pen2 p2
              ON c.query_id = p2.query_id AND c.cand_id = p2.cand_id
            WHERE NOT EXISTS (SELECT 1 FROM s1
              WHERE s1.query_id = c.query_id AND s1.cand_id = c.cand_id)),
          s2 AS (SELECT query_id, cand_id, sim, penalty, score, 2 AS pick
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, cand_id) AS rk FROM sc2)
            WHERE rk = 1),
          sel2 AS (SELECT query_id, cand_id FROM s1
            UNION ALL SELECT query_id, cand_id FROM s2),
          pen3 AS (SELECT pr.query_id, pr.a AS cand_id,
              max(pr.psim) AS penalty
            FROM pr JOIN sel2 ON pr.query_id = sel2.query_id
              AND pr.b = sel2.cand_id
            GROUP BY 1, 2),
          sc3 AS (SELECT c.query_id, c.cand_id, c.sim,
              coalesce(p3.penalty, CAST(0 AS BIGINT)) AS penalty,
              7 * c.sim - 3 * coalesce(p3.penalty, CAST(0 AS BIGINT))
                AS score
            FROM cand c LEFT JOIN pen3 p3
              ON c.query_id = p3.query_id AND c.cand_id = p3.cand_id
            WHERE NOT EXISTS (SELECT 1 FROM sel2
              WHERE sel2.query_id = c.query_id
                AND sel2.cand_id = c.cand_id)),
          s3 AS (SELECT query_id, cand_id, sim, penalty, score, 3 AS pick
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, cand_id) AS rk FROM sc3)
            WHERE rk = 1)
        SELECT query_id, cand_id, sim, penalty, score, pick FROM s1
        UNION ALL SELECT query_id, cand_id, sim, penalty, score, pick
          FROM s2
        UNION ALL SELECT query_id, cand_id, sim, penalty, score, pick
          FROM s3""")),

    ("q_sim_tiered",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), Similarity.quantize(col("embedding"))
            .as("q"))
        val proj = array(jlProjTerms(col("q")): _*)
        // lazy cut (r13): corpus feeds the probe guard count, the probe
        // broadcast AND the shortlist scan — one quantize+JL pass, not 3
        // (the guard count is the materializing action)
        val corpus = e.select(col("vec_id"), col("q"), proj.as("p"))
          .localCheckpoint(false)
        val probes = corpus.filter(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"), col("q").as("qq"),
            col("p").as("qp"))
        // PROBE-SIDE CONTRACT, enforced: the shortlist tier scans
        // corpus x probes, so the probe set must be broadcast-sized
        // ("few queries, exact answer"). A large probe set belongs on the
        // IVF-PQ path (q_sim_ivfpq) — fail fast instead of running a slow
        // quadratic plan. limit(1025) bounds the guard's own scan.
        val nProbes = probes.limit(1025).count()
        require(nProbes <= 1024,
          s"tiered retrieval probe set exceeds 1024 rows; the " +
          "corpus x probes shortlist tier is for broadcast-sized probe " +
          "sets — route large probe sets through IVF-PQ")
        val w1 = Window.partitionBy("query_id")
          .orderBy(col("pscore").desc, col("vec_id").asc)
        val w2 = Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("vec_id").asc)
        corpus.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("pscore", Similarity.qdot(col("p"), col("qp")))
          .withColumn("prnk", row_number().over(w1))
          .filter(col("prnk") <= 64)
          .withColumn("dot", Similarity.qdot(col("q"), col("qq")))
          .withColumn("rnk", row_number().over(w2).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("dot"), col("rnk"))
      },
      Some(s"""WITH q0 AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        s AS $jlSignsSql,
        ex AS (SELECT vec_id, i, v[i] AS x
          FROM q0, UNNEST(range(1, ${JlDims + 1})) AS u(i)),
        pr AS (SELECT vec_id, j, CAST(sum(sgn * x) AS BIGINT) AS pj
          FROM ex JOIN s USING (i) GROUP BY 1, 2),
        pv AS (SELECT vec_id, list(pj ORDER BY j) AS p FROM pr GROUP BY 1),
        t1 AS (SELECT pq.vec_id AS query_id, pc.vec_id AS neighbor_id,
            CAST(${dotSql("pc.p", "pq.p")} AS BIGINT) AS pscore
          FROM pv pq JOIN pv pc ON pc.vec_id <> pq.vec_id
          WHERE pq.vec_id < 4),
        short AS (SELECT query_id, neighbor_id FROM
            (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY pscore DESC, neighbor_id ASC) AS prnk FROM t1)
          WHERE prnk <= 64),
        t2 AS (SELECT query_id, neighbor_id,
            CAST(${dotSql("cq.v", "cc.v")} AS BIGINT) AS dot
          FROM short JOIN q0 cq ON cq.vec_id = query_id
                     JOIN q0 cc ON cc.vec_id = neighbor_id)
        SELECT query_id, neighbor_id, dot, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY dot DESC, neighbor_id ASC) AS rnk FROM t2)
        WHERE rnk <= 5""")),

    // Hard-negative mining (Similarity.hardNegatives): nearest different-
    // label corpus vectors per probe — the contrastive-training negative
    // sampler. Probe broadcast + WindowGroupLimit top-k, ranked on the
    // exact quantized cosine.
    ("q_sim_hard_negatives",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.hardNegatives(e, "vec_id", "embedding", "label",
            e.filter(col("vec_id") < 8), "vec_id", "embedding", "label",
            k = 5)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""WITH q AS (SELECT vec_id, label, $quantSql AS v
          FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, label, $quantSql AS v FROM embeddings),
        scored AS (SELECT q.vec_id AS query_id, q.label AS query_label,
            c.vec_id AS neighbor_id, c.label AS neighbor_label,
            ${cosineSql("q.v", "c.v")} AS cosine
          FROM q JOIN c ON c.label <> q.label)
        SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
          rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 5""")),

    // ANN via random-hyperplane LSH. Approximate vs brute force, but fully
    // DETERMINISTIC: hyperplane weights are md5-derived
    // (plans/Expressions.scala LshBucket.planeWeight — first 4 md5 bytes as
    // uint32, /2^31 - 1), bucket accumulation is an ascending-dim left fold,
    // and the rerank is the quantized cosine — so DuckDB replays the whole
    // pipeline exactly: weights from md5, ordered fold via
    // list(x ORDER BY d) + list_reduce, same bucket equi-join, same rerank.
    // Index-quality evaluation: recall@5 of the LSH ANN against the exact
    // brute-force top-5 per probe — the measurement loop that tunes
    // (tables, planes) before an index ships. Left join exact->ann on
    // k-bounded sides; the recall ratio is one floor-quantized division
    // from exact integer hit counts.
    ("q_sim_recall",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val probes = e.filter(col("vec_id") < 8)
        val exact = Similarity.cosineTopK(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val ann = Similarity.annLsh(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 5, tables = 4, planes = 10,
          dims = 64).select(col("query_id"), col("neighbor_id"))
        exact.join(ann.withColumn("hit", lit(1L)),
            Seq("query_id", "neighbor_id"), "left_outer")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("query_id"), col("n_exact"), col("n_hit"),
            (floor(col("n_hit").cast("double") * 1e6 /
              col("n_exact").cast("double")) / 1e6).as("recall"))
      },
      Some(s"""WITH ${lshBucketsCtes(tables = 4, planes = 10)},
        q AS (SELECT vec_id, $quantSql AS v FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        ex AS (SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", "c.v")} DESC, c.vec_id ASC) AS rnk
          FROM q JOIN c ON c.vec_id <> q.vec_id) WHERE rnk <= 5),
        cand AS (
          SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
          FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.b = cb.b
          WHERE qb.vec_id < 8 AND cb.vec_id <> qb.vec_id),
        ann AS (SELECT query_id, neighbor_id FROM (
          SELECT sc.query_id, sc.neighbor_id,
            row_number() OVER (PARTITION BY sc.query_id
              ORDER BY sc.cosine DESC, sc.neighbor_id ASC) AS rnk FROM (
            SELECT cand.query_id, cand.neighbor_id,
              ${cosineSql("q.v", "c.v")} AS cosine
            FROM cand JOIN q ON q.vec_id = cand.query_id
                      JOIN c ON c.vec_id = cand.neighbor_id) sc)
          WHERE rnk <= 5)
        SELECT ex.query_id, count(*) AS n_exact,
          CAST(sum(CASE WHEN ann.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_hit,
          floor(CAST(sum(CASE WHEN ann.neighbor_id IS NULL THEN 0 ELSE 1
              END) AS DOUBLE) * 1e6 / CAST(count(*) AS DOUBLE)) / 1e6
            AS recall
        FROM ex LEFT JOIN ann ON ex.query_id = ann.query_id
          AND ex.neighbor_id = ann.neighbor_id
        GROUP BY 1""")),

    // nDCG@5 of the LSH ANN ranking vs the exact ranking — the
    // position-aware retrieval-quality metric recall@k can't see (putting
    // the true #1 at position 5 and at position 1 are the same recall,
    // very different nDCG). Graded relevance rel = 6 − exact_rank; the
    // 1/log2(i+1) position discounts are micro-quantized LITERALS
    // injected into both engines (the BM25 constant convention — no
    // transcendentals at eval time), so DCG is an exact BIGINT sum; the
    // ideal DCG at 5 full-relevance grades is the constant 10271920.
    // Same bucket substrate and rerank as q_sim_recall — one broadcast
    // probe join, corpus never re-shuffled.
    ("q_sim_ndcg",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val probes = e.filter(col("vec_id") < 8)
        val exact = Similarity.cosineTopK(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"),
            (lit(6L) - col("rank")).as("rel"))
        val ann = Similarity.annLsh(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 5, tables = 8, planes = 6,
          dims = 64)
          .select(col("query_id"), col("neighbor_id"),
            col("rank").as("pos"))
        val wExpr = ndcgDiscountsMicro.zipWithIndex
          .foldLeft(lit(0L)) { case (alt, (w, i)) =>
            when(col("pos") === i + 1, lit(w)).otherwise(alt)
          }
        // group from the EXACT side: every probe always has its 5 ideal
        // rows, so a probe whose ANN list misses entirely still emits
        // (ndcg 0) instead of vanishing; ANN items outside the ideal set
        // carry rel 0 and cannot contribute — the two join directions sum
        // identically, only the row universe differs
        exact.join(ann, Seq("query_id", "neighbor_id"), "left_outer")
          .groupBy("query_id")
          .agg(sum(when(col("pos").isNotNull, col("rel") * wExpr)
            .otherwise(lit(0L))).as("dcg_micro"))
          .select(col("query_id"), col("dcg_micro"),
            floor(col("dcg_micro").cast("double") * 1e6 /
              lit(ndcgIdealMicro).cast("double")).cast("long")
              .as("ndcg_ppm"))
      },
      Some(s"""WITH ${lshBucketsCtes(tables = 8, planes = 6)},
        q AS (SELECT vec_id, $quantSql AS v FROM embeddings
          WHERE vec_id < 8),
        c AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        ex AS (SELECT query_id, neighbor_id, 6 - rnk AS rel FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", "c.v")} DESC, c.vec_id ASC)
              AS rnk
          FROM q JOIN c ON c.vec_id <> q.vec_id) WHERE rnk <= 5),
        cand AS (
          SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
          FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.b = cb.b
          WHERE qb.vec_id < 8 AND cb.vec_id <> qb.vec_id),
        ann AS (SELECT query_id, neighbor_id, rnk AS pos FROM (
          SELECT sc.query_id, sc.neighbor_id,
            row_number() OVER (PARTITION BY sc.query_id
              ORDER BY sc.cosine DESC, sc.neighbor_id ASC) AS rnk FROM (
            SELECT cand.query_id, cand.neighbor_id,
              ${cosineSql("q.v", "c.v")} AS cosine
            FROM cand JOIN q ON q.vec_id = cand.query_id
                      JOIN c ON c.vec_id = cand.neighbor_id) sc)
          WHERE rnk <= 5)
        SELECT ex.query_id,
          CAST(sum(CASE WHEN ann.pos IS NULL THEN 0
              ELSE ex.rel * ${ndcgDiscountCaseSql("ann.pos")} END)
            AS BIGINT) AS dcg_micro,
          CAST(floor(CAST(sum(CASE WHEN ann.pos IS NULL THEN 0
              ELSE ex.rel * ${ndcgDiscountCaseSql("ann.pos")} END)
              AS DOUBLE) * 1e6
            / $ndcgIdealMicro.0) AS BIGINT) AS ndcg_ppm
        FROM ex LEFT JOIN ann ON ex.query_id = ann.query_id
          AND ex.neighbor_id = ann.neighbor_id
        GROUP BY 1""")),

    // Pairwise-distance distribution audit — the embedding-collapse /
    // anisotropy check (a healthy space shows a wide distance spread; a
    // collapsed encoder pins all mass in one octave): exact integer
    // squared L2 over DETERMINISTIC LINEAR pair sampling — every vector
    // pairs with its 4 successors in the md5-rank order (4n pairs, an
    // unbiased-by-construction shuffle of pairs; never a quadratic
    // within-bucket self-join), rank from the two-pass range scan.
    // Distances land in power-of-two octave buckets (the quantileBounds
    // rule) — constant-size output at any corpus.
    ("q_emb_dist_hist",
      (s: SparkSession, d: String) => {
        val q = t(s, d, "embeddings")
          .select(col("vec_id"), Similarity.quantize(col("embedding"))
            .as("v"))
          .withColumn("h", md5(col("vec_id").cast("string")))
        val ranked = graft.ops.Prefix.runningOffsetsOrdered(
          q.withColumn("__one", lit(1L)), Seq("h", "vec_id"), "__one")
          .select(col("offset").as("rk"), col("v"))
        val probe = ranked.select(
          explode(array((1 to 4).map(lit(_)): _*)).as("delta"),
          col("rk").as("rk_hi"), col("v").as("v2"))
          .select((col("rk_hi") - col("delta")).as("rk"), col("v2"))
        val d2 = Similarity.qdot(col("v"), col("v")) -
          lit(2L) * Similarity.qdot(col("v"), col("v2")) +
          Similarity.qdot(col("v2"), col("v2"))
        ranked.join(probe, Seq("rk"))
          .select((length(bin(d2 + lit(1L))) - 1).cast("long").as("octave"))
          .groupBy("octave").agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""WITH q AS (SELECT vec_id, $quantSql AS v,
            md5(CAST(vec_id AS VARCHAR)) AS h
          FROM embeddings),
        rk AS (SELECT v, row_number() OVER (ORDER BY h, vec_id) - 1
            AS rk FROM q),
        pr AS (SELECT a.v AS v, b.v AS v2
          FROM rk a JOIN rk b
            ON b.rk BETWEEN a.rk + 1 AND a.rk + 4),
        d2 AS (SELECT CAST(${dotSql("v", "v")}
            - 2 * ${dotSql("v", "v2")}
            + ${dotSql("v2", "v2")} AS BIGINT) AS d2 FROM pr)
        SELECT CAST(length(bin(d2 + 1)) - 1 AS BIGINT) AS octave,
          CAST(count(*) AS BIGINT) AS n_pairs
        FROM d2 GROUP BY 1""")),

    // SQ8 scalar-quantization recall audit (Similarity.sq8Recall): codes
    // = floor(q*127/amax_dim) signed bytes, inner-product top-10 on codes
    // vs on exact vectors, recall per probe. The 64-row scale table and
    // the double-floor chain (never integer div — negative components)
    // replay exactly; one corpus pass scores both rankings side by side.
    ("q_emb_sq8",
      (s: SparkSession, d: String) => Similarity.sq8Recall(
        t(s, d, "embeddings"), "vec_id", "embedding",
        col("vec_id") % 50 === 0, k = 10),
      Some(s"""WITH q AS MATERIALIZED (
          SELECT vec_id, $quantSql AS v FROM embeddings),
        ex AS MATERIALIZED (SELECT vec_id, unnest(v) AS x,
          generate_subscripts(v, 1) AS pos FROM q),
        sc AS MATERIALIZED (SELECT pos, greatest(max(abs(x)), 1) AS amax
          FROM ex GROUP BY 1),
        cd AS MATERIALIZED (SELECT vec_id, ex.pos, x,
            CAST(floor(CAST(x * 127 AS DOUBLE) / CAST(amax AS DOUBLE))
              AS BIGINT) AS c8
          FROM ex JOIN sc ON sc.pos = ex.pos),
        pairs AS MATERIALIZED (SELECT p.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            CAST(sum(p.x * c.x) AS BIGINT) AS dot_exact,
            CAST(sum(p.c8 * c.c8) AS BIGINT) AS dot8
          FROM cd p JOIN cd c ON p.pos = c.pos AND c.vec_id <> p.vec_id
          WHERE p.vec_id % 50 = 0
          GROUP BY 1, 2),
        r AS (SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY dot_exact DESC, neighbor_id ASC) AS re,
            row_number() OVER (PARTITION BY query_id
              ORDER BY dot8 DESC, neighbor_id ASC) AS r8
          FROM pairs)
        SELECT query_id, count(*) AS n_exact,
          CAST(sum(CASE WHEN r8 <= 10 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_hit,
          floor(CAST(sum(CASE WHEN r8 <= 10 THEN 1 ELSE 0 END) AS DOUBLE)
            * 1e6 / CAST(count(*) AS DOUBLE)) / 1e6 AS recall
        FROM r WHERE re <= 10 GROUP BY 1""")),

    // Matryoshka prefix-dimension recall (Kusupati et al. 2022, MRL):
    // recall@10 of the top-10 by the FIRST d dims (d = 8/16/32) against
    // the full-64-dim truth — the audit that decides how far an MRL
    // embedding column can be truncated before retrieval degrades (a 4x
    // dim cut is a 4x index-size/IO cut at 100 TB). Quantize-then-slice
    // == slice-then-quantize (elementwise), so both engines rank the
    // same integer grids; ties break on neighbor id as everywhere.
    // Shape: 4 broadcast-probe corpus scans (truth + 3 prefixes), per-
    // query WindowGroupLimit top-10s, one hit-join — corpus is never
    // shuffled pairwise.
    ("q_emb_matryoshka",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val probes = e.filter(col("vec_id") < 8)
        val exact = Similarity.cosineTopK(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val byDim = Seq(8, 16, 32).map { dm =>
          val et = e.select(col("vec_id"),
            slice(col("embedding"), 1, dm).as("emb"))
          val pt = probes.select(col("vec_id"),
            slice(col("embedding"), 1, dm).as("emb"))
          Similarity.cosineTopK(et, "vec_id", "emb", pt, "vec_id", "emb",
              k = 10)
            .select(lit(dm.toLong).as("dims"), col("query_id"),
              col("neighbor_id"))
        }.reduce(_ union _)
        byDim.join(exact.withColumn("hit", lit(1L)),
            Seq("query_id", "neighbor_id"), "left_outer")
          .groupBy("dims", "query_id")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("dims"), col("query_id"), col("n_hit"),
            (floor(col("n_hit").cast("double") * 1e6 / lit(10.0)) / 1e6)
              .as("recall"))
      },
      Some {
        def qs(dm: Int): String =
          s"list_transform(embedding[1:$dm], x -> " +
            "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        val arms = Seq(8, 16, 32).map { dm =>
          s"""SELECT CAST($dm AS BIGINT) AS dims, query_id, neighbor_id
            FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY ${cosineSql(s"q.v$dm", s"c.v$dm")} DESC,
                  c.vec_id ASC) AS rnk
            FROM q JOIN c ON c.vec_id <> q.vec_id) WHERE rnk <= 10"""
        }.mkString("\n          UNION ALL ")
        s"""WITH c AS MATERIALIZED (SELECT vec_id, $quantSql AS v64,
            ${qs(8)} AS v8, ${qs(16)} AS v16, ${qs(32)} AS v32
          FROM embeddings),
        q AS (SELECT * FROM c WHERE vec_id < 8),
        ex AS (SELECT query_id, neighbor_id
          FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v64", "c.v64")} DESC,
                c.vec_id ASC) AS rnk
          FROM q JOIN c ON c.vec_id <> q.vec_id) WHERE rnk <= 10),
        tr AS ($arms)
        SELECT tr.dims, tr.query_id,
          CAST(sum(CASE WHEN ex.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_hit,
          floor(CAST(sum(CASE WHEN ex.neighbor_id IS NULL THEN 0 ELSE 1
            END) AS DOUBLE) * 1e6 / 10.0) / 1e6 AS recall
        FROM tr LEFT JOIN ex ON ex.query_id = tr.query_id
          AND ex.neighbor_id = tr.neighbor_id
        GROUP BY 1, 2"""
      }),

    // Margin-criterion bitext mining (Similarity.bitextMarginMine):
    // cos(x,y) scored relative to both sides' top-4 neighborhood averages
    // — the hub-vector correction LASER/CCMatrix mining uses. Best-margin
    // candidate per probe across the opposite-label corpus.
    ("q_emb_bitext_margin",
      (s: SparkSession, d: String) => Similarity.bitextMarginMine(
        t(s, d, "embeddings"), "vec_id", "embedding", "label",
        col("vec_id") % 50 === 0, kNeigh = 4),
      Some(s"""WITH q AS MATERIALIZED (
          SELECT vec_id, label, $quantSql AS v FROM embeddings),
        pr AS (SELECT vec_id AS query_id, label AS qlab, v AS qv
          FROM q WHERE vec_id % 50 = 0),
        scored AS MATERIALIZED (SELECT query_id, q.vec_id AS cand_id,
            ${simMicroSql("qv", "q.v")} AS cos_micro
          FROM pr JOIN q ON q.label <> pr.qlab),
        ranked AS MATERIALIZED (SELECT *,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos_micro DESC, cand_id ASC) AS rq,
            row_number() OVER (PARTITION BY cand_id
              ORDER BY cos_micro DESC, query_id ASC) AS rc
          FROM scored),
        aq AS (SELECT query_id, CAST(floor(CAST(sum(cos_micro) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avg_q_micro
          FROM ranked WHERE rq <= 4 GROUP BY 1),
        ac AS (SELECT cand_id, CAST(floor(CAST(sum(cos_micro) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avg_c_micro
          FROM ranked WHERE rc <= 4 GROUP BY 1),
        mg AS (SELECT s.query_id, s.cand_id, s.cos_micro, aq.avg_q_micro,
            ac.avg_c_micro,
            CAST(floor(CAST(s.cos_micro AS DOUBLE) * 2e6 /
              CAST(greatest(aq.avg_q_micro + ac.avg_c_micro, 1) AS DOUBLE))
              AS BIGINT) AS margin_ppm
          FROM scored s JOIN aq USING (query_id) JOIN ac USING (cand_id))
        SELECT query_id, cand_id, cos_micro, avg_q_micro, avg_c_micro,
          margin_ppm
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY margin_ppm DESC, cand_id ASC) AS best FROM mg)
        WHERE best = 1""")),

    ("q_sim_ann_lsh",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.annLsh(e, "vec_id", "embedding",
            e.filter(col("vec_id") < 8), "vec_id", "embedding",
            k = 5, tables = 4, planes = 10, dims = 64)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""WITH ${lshBucketsCtes(tables = 4, planes = 10)},
        q AS (SELECT vec_id, $quantSql AS v FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS (
          SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
          FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.b = cb.b
          WHERE qb.vec_id < 8 AND cb.vec_id <> qb.vec_id),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
            ${cosineSql("q.v", "c.v")} AS cosine
          FROM cand JOIN q ON q.vec_id = cand.query_id
                    JOIN c ON c.vec_id = cand.neighbor_id)
        SELECT query_id, neighbor_id, cosine, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 5""")),

    // IVF-Flat ANN: md5-picked deterministic centroids, map-side list
    // assignment, probes search nprobe lists (Similarity.annIvf). The
    // oracle replays centroid pick, assignment (same quantized cosine +
    // tie-break) and the rerank exactly.
    ("q_sim_ann_ivf",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.annIvf(e, "vec_id", "embedding",
            e.filter(col("vec_id") < 8), "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 4)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""WITH c AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        cents AS (SELECT vec_id AS cid, v AS cv FROM c
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        asg AS (SELECT vec_id, v, cid FROM (
          SELECT c.vec_id, c.v, cents.cid,
            row_number() OVER (PARTITION BY c.vec_id
              ORDER BY ${cosineSql("c.v", "cents.cv")} DESC, cents.cid ASC)
              AS arnk
          FROM c CROSS JOIN cents) WHERE arnk = 1),
        pc AS (SELECT query_id, qv, cid FROM (
          SELECT q.vec_id AS query_id, q.v AS qv, cents.cid,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", "cents.cv")} DESC, cents.cid ASC)
              AS prnk
          FROM c q CROSS JOIN cents WHERE q.vec_id < 8) WHERE prnk <= 4),
        scored AS (SELECT pc.query_id, asg.vec_id AS neighbor_id,
            ${cosineSql("pc.qv", "asg.v")} AS cosine
          FROM pc JOIN asg ON asg.cid = pc.cid
            AND asg.vec_id <> pc.query_id)
        SELECT query_id, neighbor_id, cosine, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 5""")),

    // Reciprocal-rank fusion of the exact brute-force top-10 and the
    // IVF top-10 (Similarity.rrfFuse): the retrieval-ensemble step.
    // Both term divisions and their sum are fixed-order IEEE ops, so the
    // oracle fuses its own two ranking CTEs bit-identically.
    ("q_sim_rrf",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val probes = e.filter(col("vec_id") < 8)
        val exact = Similarity.cosineTopK(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 10)
        val ivf = Similarity.annIvf(e, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4)
        Similarity.rrfFuse(exact, ivf, k = 5)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""WITH c AS MATERIALIZED (SELECT vec_id, $quantSql AS v
          FROM embeddings),
        q AS (SELECT vec_id, v FROM c WHERE vec_id < 8),
        ex AS (SELECT query_id, neighbor_id, rnk FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", "c.v")} DESC, c.vec_id ASC) AS rnk
          FROM q JOIN c ON c.vec_id <> q.vec_id) WHERE rnk <= 10),
        cents AS (SELECT vec_id AS cid, v AS cv FROM c
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        asg AS (SELECT vec_id, v, cid FROM (
          SELECT c.vec_id, c.v, cents.cid,
            row_number() OVER (PARTITION BY c.vec_id
              ORDER BY ${cosineSql("c.v", "cents.cv")} DESC, cents.cid ASC)
              AS arnk
          FROM c CROSS JOIN cents) WHERE arnk = 1),
        pc AS (SELECT query_id, qv, cid FROM (
          SELECT q.vec_id AS query_id, q.v AS qv, cents.cid,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", "cents.cv")} DESC, cents.cid ASC)
              AS prnk
          FROM q CROSS JOIN cents) WHERE prnk <= 4),
        iv AS (SELECT query_id, neighbor_id, rnk FROM (
          SELECT sc.query_id, sc.neighbor_id,
            row_number() OVER (PARTITION BY sc.query_id
              ORDER BY sc.cosine DESC, sc.neighbor_id ASC) AS rnk FROM (
            SELECT pc.query_id, asg.vec_id AS neighbor_id,
              ${cosineSql("pc.qv", "asg.v")} AS cosine
            FROM pc JOIN asg ON asg.cid = pc.cid
              AND asg.vec_id <> pc.query_id) sc) WHERE rnk <= 10),
        fused AS (SELECT query_id, neighbor_id,
            coalesce(CAST(1 AS DOUBLE) / (60 + ex.rnk), 0) +
            coalesce(CAST(1 AS DOUBLE) / (60 + iv.rnk), 0) AS rrf
          FROM ex FULL OUTER JOIN iv USING (query_id, neighbor_id))
        SELECT query_id, neighbor_id, rrf, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY rrf DESC, neighbor_id ASC) AS rnk FROM fused)
        WHERE rnk <= 5""")),

    // IVF-PQ (the FAISS IVFxx,PQyy composition): coarse md5-sampled IVF
    // lists + PQ codes of the per-list RESIDUALS; probes search nprobe
    // lists with one ADC table per probed list. The oracle replays coarse
    // assignment, residuals, PQ training, encoding and ADC — all integer
    // math after the floor-quantized coarse cosine.
    ("q_sim_ivfpq",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.ivfPqTopK(e, "vec_id", "embedding",
            e.filter(col("vec_id") < 8), "vec_id", "embedding",
            k = 5, nlist = 8, nprobe = 3, m = 8, ksub = 8, iters = 1,
            dims = 64)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""WITH cq AS MATERIALIZED (
          SELECT vec_id, $quantSql AS v FROM embeddings),
        cents AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM cq
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        asg AS MATERIALIZED (SELECT vec_id, v, cid FROM (
          SELECT cq.vec_id, cq.v, cents.cid,
            row_number() OVER (PARTITION BY cq.vec_id
              ORDER BY ${cosineSql("cq.v", "cents.cv")} DESC, cents.cid ASC)
              AS arnk
          FROM cq CROSS JOIN cents) WHERE arnk = 1),
        r AS MATERIALIZED (SELECT a.vec_id,
            list_transform(range(1, 65), j -> a.v[j] - ct.cv[j]) AS rv, a.cid
          FROM asg a JOIN cents ct ON ct.cid = a.cid),
        ${pqTrainCtes(m = 8, ksub = 8, iters = 1, subDim = 8,
        src = "r", vec = "rv")},
        p AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM cq
          WHERE vec_id < 8),
        pc AS MATERIALIZED (SELECT query_id, qv, cid FROM (
          SELECT p.query_id, p.qv, cents.cid,
            row_number() OVER (PARTITION BY p.query_id
              ORDER BY ${cosineSql("p.qv", "cents.cv")} DESC, cents.cid ASC)
              AS prnk
          FROM p CROSS JOIN cents) WHERE prnk <= 3),
        pr AS MATERIALIZED (SELECT pc.query_id, pc.cid,
            list_transform(range(1, 65), j -> pc.qv[j] - ct.cv[j]) AS rv
          FROM pc JOIN cents ct ON ct.cid = pc.cid),
        scored AS MATERIALIZED (
          SELECT pr.query_id, e.vec_id AS neighbor_id,
            CAST(sum(${pqL2Sql("list_slice(pr.rv, e.s * 8 + 1, (e.s + 1) * 8)",
        "cb.cv", 8)}) AS BIGINT) AS adc_dist
          FROM pr JOIN r rr ON rr.cid = pr.cid
               JOIN enc e ON e.vec_id = rr.vec_id
               JOIN c1 cb ON cb.s = e.s AND cb.ord = e.code
          WHERE e.vec_id <> pr.query_id
          GROUP BY pr.query_id, e.vec_id)
        SELECT query_id, neighbor_id, adc_dist, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 5""")),

    // Product-quantization ANN (Jégou et al. 2011): Lloyd-trained per-
    // subspace codebooks, m-byte codes, ADC table scoring. The oracle
    // replays TRAINING (every round's exact-integer assignment + update),
    // the encoding, and the ADC sums bit-for-bit — all integer math.
    ("q_sim_pq_topk",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.pqTopK(e, "vec_id", "embedding",
            e.filter(col("vec_id") < 8), "vec_id", "embedding",
            k = 5, m = 8, ksub = 16, iters = 2, dims = 64)
          .withColumn("rnk", col("rank").cast("bigint")).drop("rank")
      },
      Some(s"""${pqCtes(m = 8, ksub = 16, iters = 2, subDim = 8)},
        p AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv FROM q
          WHERE vec_id < 8),
        scored AS MATERIALIZED (
          SELECT p.query_id, e.vec_id AS neighbor_id,
            CAST(sum(${pqL2Sql("list_slice(p.qv, e.s * 8 + 1, (e.s + 1) * 8)",
        "c.cv", 8)}) AS BIGINT) AS adc_dist
          FROM p CROSS JOIN enc e JOIN c2 c ON c.s = e.s AND c.ord = e.code
          WHERE e.vec_id <> p.query_id
          GROUP BY p.query_id, e.vec_id)
        SELECT query_id, neighbor_id, adc_dist, rnk FROM
          (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk FROM scored)
        WHERE rnk <= 5""")))

  /** Exact integer squared-L2 between two BIGINT lists of length `n`. */
  private[graft] def pqL2Sql(a: String, b: String, n: Int): String =
    s"list_sum(list_transform(range(1, ${n + 1}), " +
      s"j -> (($a)[j] - ($b)[j]) * (($a)[j] - ($b)[j])))"

  /** WITH-chain replaying Similarity.pqTopK's codebook training: seeds are
    * the sub-slices of the `ksub` smallest-id vectors (ordinal = seed rank),
    * each round assigns every (vector, subspace) to its min-squared-L2
    * codeword (ties to the smaller ordinal) and recenters codewords with the
    * exact-integer floor(sum/count) mean (empty codewords keep their
    * previous value). Ends in `enc(vec_id, s, code)` — the post-training
    * encoding — with the final codebooks in `c$iters(s, ord, cv)`.
    * MATERIALIZED throughout: each c_i is referenced by a_{i+1} AND
    * c_{i+1}'s fallback join (the kmeansCtes inlining lesson). */
  private[graft] def pqCtes(m: Int, ksub: Int, iters: Int, subDim: Int): String =
    s"""WITH q AS MATERIALIZED (
          SELECT vec_id, $quantSql AS v FROM embeddings),
        ${pqTrainCtes(m, ksub, iters, subDim, src = "q", vec = "v")}"""

  /** The training/encode WITH-chain over an existing `$src(vec_id, $vec)`
    * CTE (no leading WITH) — shared by plain PQ (src = quantized corpus)
    * and IVF-PQ (src = per-list residuals). */
  private[graft] def pqTrainCtes(m: Int, ksub: Int, iters: Int, subDim: Int,
      src: String, vec: String): String = {
    def sliceOf(v: String, s: String): String =
      s"list_slice($v, $s * $subDim + 1, ($s + 1) * $subDim)"
    def assignCte(name: String, books: String): String =
      s"""$name AS MATERIALIZED (SELECT vec_id, s, ord FROM (
          SELECT $src.vec_id, c.s, c.ord,
            row_number() OVER (PARTITION BY $src.vec_id, c.s
              ORDER BY ${pqL2Sql(sliceOf(s"$src.$vec", "c.s"), "c.cv", subDim)}
                ASC, c.ord ASC) AS r
          FROM $src CROSS JOIN $books c) WHERE r = 1)"""
    val sb = new StringBuilder(
      s"""sd AS MATERIALIZED (SELECT vec_id, $vec,
            row_number() OVER (ORDER BY vec_id) - 1 AS ord
          FROM (SELECT vec_id, $vec FROM $src ORDER BY vec_id LIMIT $ksub)),
        c0 AS MATERIALIZED (SELECT gs.s, sd.ord,
            ${sliceOf(s"sd.$vec", "gs.s")} AS cv
          FROM sd CROSS JOIN range(0, $m) gs(s))""")
    for (i <- 1 to iters) {
      val prev = s"c${i - 1}"
      sb ++= s""",
        ${assignCte(s"a$i", prev)},
        m$i AS MATERIALIZED (SELECT s, ord, list(mm ORDER BY pos) AS cv FROM (
          SELECT s, ord, pos,
            CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS mm
          FROM (SELECT a.s, a.ord,
                  unnest(${sliceOf(s"$src.$vec", "a.s")}) AS x,
                  generate_subscripts(${sliceOf(s"$src.$vec", "a.s")}, 1) AS pos
                FROM a$i a JOIN $src USING (vec_id))
          GROUP BY s, ord, pos) GROUP BY s, ord),
        c$i AS MATERIALIZED (SELECT p.s, p.ord, coalesce(u.cv, p.cv) AS cv
          FROM $prev p LEFT JOIN m$i u ON u.s = p.s AND u.ord = p.ord)"""
    }
    sb ++= s""",
        ${assignCte("enc", s"c$iters").replace("vec_id, s, ord FROM",
      "vec_id, s, ord AS code FROM")}"""
    sb.toString
  }

  // ========================================================== multimodal

  /** Replays [[graft.ops.Multimodal.imageAHash]] over
    * [[graft.ops.Multimodal.syntheticPngFamily]](id, 32, 24) images from
    * first principles: the decoded pixel at 8x8-grid cell (x, y) is the
    * generated pixel at (sx, sy) = (x*32//8, y*24//8) (PNG is lossless and
    * the resample mapping is the same integer division), luma is the exact
    * integer rec601 weighting, and the bit rule is the strict majority
    * `l*64 > total`. The sign bit rides through HUGEINT and wraps to the
    * signed BIGINT Spark produces. */
  /** Replays [[graft.ops.Multimodal.imageTileHash]] (2x2 tiles, 4x4 grid)
    * over the synthetic 32x24 PNG family from first principles — same
    * pixel generator as [[mmAhashSigSql]], sampled at
    * sx = tx*16 + cx*4, sy = ty*12 + cy*3. Ends in `acc`
    * (doc_id, tile, thash). */
  private[graft] def mmTileSigSql: String =
    """WITH g4 AS (SELECT unnest(range(0, 4)) AS i),
      t2 AS (SELECT unnest(range(0, 2)) AS i),
      cell AS (SELECT d.doc_id, ty.i * 2 + tx.i AS tile,
          cy.i * 4 + cx.i AS bit,
          tx.i * 16 + cx.i * 4 AS sx, ty.i * 12 + cy.i * 3 AS sy
        FROM documents d CROSS JOIN t2 tx CROSS JOIN t2 ty
             CROSS JOIN g4 cx CROSS JOIN g4 cy),
      lum AS (SELECT doc_id, tile, bit,
          (((sx * 255 // 31 + (doc_id // 10 % 7) * 36) % 256) * 299 +
           ((sy * 255 // 23 + (doc_id // 10 % 11) * 23) % 256) * 587 +
           (CASE WHEN sy = doc_id % 24
                 THEN 255 - ((sx + sy + doc_id // 10) % 8) * 32
                 ELSE ((sx + sy + doc_id // 10) % 8) * 32 END) * 114)
            // 1000 AS l
        FROM cell),
      tot AS (SELECT doc_id, tile, sum(l) AS t FROM lum GROUP BY 1, 2),
      acc AS (SELECT lum.doc_id, lum.tile,
          CAST(sum(CASE WHEN lum.l * 16 > tot.t THEN 1::BIGINT << lum.bit
                   ELSE 0 END) AS BIGINT) AS thash
        FROM lum JOIN tot USING (doc_id, tile) GROUP BY 1, 2)"""

  /** Replays [[graft.ops.Multimodal.imagePHash]] from first principles:
    * same synthetic-pixel luma as [[mmAhashSigSql]], then the exact
    * integer 2D DCT-II with [[graft.ops.Multimodal.DctBasis]] interpolated
    * as literals (the cosine table never recomputes cross-engine), the
    * 32nd-smallest-of-63 AC median as a pure order statistic, and the
    * HUGEINT sign fold for bit 63. */
  private[graft] def mmPhashSigSql: String = {
    val basis = graft.ops.Multimodal.DctBasis
    val rows = (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${basis(u)(x)})").mkString(", ")
    s"""WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
      dct(u, x, c) AS (SELECT * FROM (VALUES $rows) AS t(u, x, c)),
      cell AS (SELECT d.doc_id, cx.i AS x, cy.i AS y,
          cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
        FROM documents d CROSS JOIN g8 cx CROSS JOIN g8 cy),
      lum AS (SELECT doc_id, x, y,
          (((sx * 255 // 31 + (doc_id // 10 % 7) * 36) % 256) * 299 +
           ((sy * 255 // 23 + (doc_id // 10 % 11) * 23) % 256) * 587 +
           (CASE WHEN sy = doc_id % 24
                 THEN 255 - ((sx + sy + doc_id // 10) % 8) * 32
                 ELSE ((sx + sy + doc_id // 10) % 8) * 32 END) * 114)
            // 1000 AS l
        FROM cell),
      f AS (SELECT lum.doc_id, cu.u AS u, cv.u AS v,
          CAST(sum(cu.c * cv.c * lum.l) AS BIGINT) AS fv
        FROM lum JOIN dct cu ON cu.x = lum.x JOIN dct cv ON cv.x = lum.y
        GROUP BY 1, 2, 3),
      ac AS (SELECT doc_id, u * 8 + v AS bit, fv FROM f
        WHERE NOT (u = 0 AND v = 0)),
      med AS (SELECT doc_id, fv AS med FROM (
          SELECT doc_id, fv,
            row_number() OVER (PARTITION BY doc_id ORDER BY fv) AS rn
          FROM ac) WHERE rn = 32),
      pacc AS (SELECT ac.doc_id,
          sum(CASE WHEN ac.fv > med.med THEN 1::HUGEINT << ac.bit
                   ELSE 0::HUGEINT END) AS h
        FROM ac JOIN med USING (doc_id) GROUP BY 1),
      psig AS (SELECT doc_id AS media_id,
          CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                    ELSE h END AS BIGINT) AS phash
        FROM pacc)"""
  }

  private[graft] def mmAhashSigSql: String =
    """WITH g8 AS (SELECT unnest(range(0, 8)) AS i),
      cell AS (SELECT d.doc_id, cy.i * 8 + cx.i AS bit,
          cx.i * 32 // 8 AS sx, cy.i * 24 // 8 AS sy
        FROM documents d CROSS JOIN g8 cx CROSS JOIN g8 cy),
      lum AS (SELECT doc_id, bit,
          (((sx * 255 // 31 + (doc_id // 10 % 7) * 36) % 256) * 299 +
           ((sy * 255 // 23 + (doc_id // 10 % 11) * 23) % 256) * 587 +
           (CASE WHEN sy = doc_id % 24
                 THEN 255 - ((sx + sy + doc_id // 10) % 8) * 32
                 ELSE ((sx + sy + doc_id // 10) % 8) * 32 END) * 114)
            // 1000 AS l
        FROM cell),
      tot AS (SELECT doc_id, sum(l) AS t FROM lum GROUP BY 1),
      acc AS (SELECT lum.doc_id,
          sum(CASE WHEN lum.l * 64 > tot.t THEN 1::HUGEINT << lum.bit
                   ELSE 0::HUGEINT END) AS h
        FROM lum JOIN tot USING (doc_id) GROUP BY 1),
      sig AS (SELECT doc_id AS media_id,
          CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                    ELSE h END AS BIGINT) AS ahash
        FROM acc)"""

  /** Replays [[graft.ops.Multimodal.audioEnergyHash]] over
    * [[graft.ops.Multimodal.syntheticWavFamily]] clips from first
    * principles: WAV PCM is lossless, so the decoded sample i is the
    * generated triangle value at phase-shifted index `i + fam % 97`
    * (zeroed inside the id's 64-sample cut); frame f = i // 32 over the
    * fixed 2080-sample clip, energy = exact |sample| sum, bit rule
    * strict `e(f) > e(f+1)`. Sign bit through HUGEINT, as in
    * [[mmAhashSigSql]]. */
  private[graft] def mmAudioSigSql: String =
    """WITH r2080 AS (SELECT unnest(range(0, 2080)) AS i),
      p AS (SELECT doc_id, 6000 + (doc_id // 10 % 50) * 50 AS amp,
          32 + (doc_id // 10 % 5) * 16 AS per, doc_id // 10 % 97 AS phase,
          (doc_id % 61) * 32 AS cut0
        FROM documents),
      smp AS (SELECT p.doc_id, r.i,
          CASE WHEN r.i >= cut0 AND r.i < cut0 + 64 THEN 0
               ELSE (CASE WHEN (r.i + phase) % per < per // 2
                          THEN (r.i + phase) % per
                          ELSE per - (r.i + phase) % per END) * 2 * amp // per
                    * (CASE WHEN ((r.i + phase) // per) % 2 = 0
                            THEN 1 ELSE -1 END)
          END AS s
        FROM p CROSS JOIN r2080 r),
      frm AS (SELECT doc_id, i // 32 AS f, sum(abs(s)) AS e
        FROM smp GROUP BY 1, 2),
      eacc AS (SELECT a.doc_id,
          sum(CASE WHEN a.e > b.e THEN 1::HUGEINT << a.f
                   ELSE 0::HUGEINT END) AS h
        FROM frm a JOIN frm b ON a.doc_id = b.doc_id AND b.f = a.f + 1
        WHERE a.f < 64 GROUP BY 1),
      asig AS (SELECT doc_id AS media_id,
          CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                    ELSE h END AS BIGINT) AS ehash
        FROM eacc)"""

  /** Replays [[graft.ops.Multimodal.audioSpectralHash]] from first
    * principles: the [[mmAudioSigSql]] sample formula, the fixed-point
    * DFT basis interpolated as literals, per-frame 4-bin powers, dominant
    * bin by (power DESC, k ASC), 2-bit symbols packed through HUGEINT. */
  private[graft] def mmSpectralSigSql: String = {
    val cosT = graft.ops.Multimodal.DftCos
    val sinT = graft.ops.Multimodal.DftSin
    val rows = (for (k <- 0 until 4; t <- 0 until 32)
      yield s"($k, $t, ${cosT(k)(t)}, ${sinT(k)(t)})").mkString(", ")
    s"""WITH r2080 AS (SELECT unnest(range(0, 2080)) AS i),
      p AS (SELECT doc_id, 6000 + (doc_id // 10 % 50) * 50 AS amp,
          32 + (doc_id // 10 % 5) * 16 AS per, doc_id // 10 % 97 AS phase,
          (doc_id % 61) * 32 AS cut0
        FROM documents),
      smp AS (SELECT p.doc_id, r.i,
          CASE WHEN r.i >= cut0 AND r.i < cut0 + 64 THEN 0
               ELSE (CASE WHEN (r.i + phase) % per < per // 2
                          THEN (r.i + phase) % per
                          ELSE per - (r.i + phase) % per END) * 2 * amp // per
                    * (CASE WHEN ((r.i + phase) // per) % 2 = 0
                            THEN 1 ELSE -1 END)
          END AS s
        FROM p CROSS JOIN r2080 r),
      basis(k, t, cb, sb) AS (SELECT * FROM (VALUES $rows)
        AS b(k, t, cb, sb)),
      fr AS (SELECT doc_id, i // 32 AS f, i % 32 AS t, s AS x FROM smp
        WHERE i < 1024),
      pw AS (SELECT fr.doc_id, fr.f, b.k,
          CAST(sum(x * cb) AS BIGINT) AS re,
          CAST(sum(x * sb) AS BIGINT) AS im
        FROM fr JOIN basis b ON b.t = fr.t GROUP BY 1, 2, 3),
      dom AS (SELECT doc_id, f, k AS sym FROM (
          SELECT doc_id, f, k, row_number() OVER (PARTITION BY doc_id, f
            ORDER BY re * re + im * im DESC, k ASC) AS rn
          FROM pw) WHERE rn = 1),
      sacc AS (SELECT doc_id,
          sum(CAST(sym AS HUGEINT) << (2 * f)) AS h
        FROM dom GROUP BY 1),
      ssig AS (SELECT doc_id AS media_id,
          CAST(CASE WHEN h >= 1::HUGEINT << 63 THEN h - (1::HUGEINT << 64)
                    ELSE h END AS BIGINT) AS shash
        FROM sacc)"""
  }

  /** nDCG position discounts floor(1e6 / log2(i+1)) for i = 1..5 — values
    * precomputed once and injected as round-tripping literals into BOTH
    * engines (the q_text_bm25 constant convention: no transcendental is
    * ever evaluated at query time, so there is nothing to diverge). */
  private[graft] def ndcgDiscountsMicro: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L)

  /** Ideal DCG@5 in micro units: grades 5..1 at positions 1..5. */
  private[graft] def ndcgIdealMicro: Long =
    ndcgDiscountsMicro.zip(Seq(5L, 4L, 3L, 2L, 1L))
      .map { case (w, g) => w * g }.sum

  private[graft] def ndcgDiscountCaseSql(pos: String): String =
    ndcgDiscountsMicro.zipWithIndex.map { case (w, i) =>
      s"WHEN $pos = ${i + 1} THEN $w"
    }.mkString("CASE ", " ", " ELSE 0 END")

}
