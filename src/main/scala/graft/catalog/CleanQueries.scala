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
import graft.catalog.SimQueries._
import graft.catalog.MmQueries._
import graft.catalog.SourceQueries._
import graft.catalog.SamplingQueries._
import graft.catalog.GraphQueries._
import graft.catalog.FeatureQueries._

/** end-to-end cleaning-pipeline queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object CleanQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // The full curation chain as ONE declarative plan: exact dedup ->
    // benchmark decontamination -> mixture sampling -> token counting ->
    // global sequence-packing offsets. Every stage is an operator verified
    // on its own elsewhere in the catalog; this query pins their
    // COMPOSITION (the thing a real corpus build runs nightly). Catalyst
    // sees one tree: the dedup window, the broadcast anti-join, the
    // mixture filter and the token count all pipeline without
    // materialization; only the prefix-sum pass adds its two scans.
    // Dataset card: the one-row corpus summary a release ships with —
    // volume (docs/tokens/chars), diversity (languages, sources), and the
    // exact-duplicate rate from canonical fingerprints. ONE combine-
    // enabled aggregate over a scan-stage projection.
    ("q_curate_card",
      (s: SparkSession, d: String) => t(s, d, "documents")
        .select(TextOps.tokenCount(col("text")).cast("long").as("tk"),
          col("n_chars"), col("lang"), col("source"),
          TextOps.fingerprintMd5(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tk")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          count_distinct(col("lang")).as("n_langs"),
          count_distinct(col("source")).as("n_sources"),
          count_distinct(col("fp")).as("n_unique"))
        .select(col("n_docs"), col("total_tokens"), col("total_chars"),
          col("n_langs"), col("n_sources"),
          (col("n_docs") - col("n_unique")).as("n_exact_dups"),
          (floor(col("total_tokens").cast("double") * 1e6 /
            col("n_docs").cast("double")) / 1e6).as("mean_tokens")),
      Some(s"""WITH m AS (SELECT
            CAST(len(${tokensSql()}) AS BIGINT) AS tk, n_chars, lang,
            source,
            md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
              AS fp
          FROM documents)
        SELECT count(*) AS n_docs,
          CAST(sum(tk) AS BIGINT) AS total_tokens,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          count(DISTINCT lang) AS n_langs,
          count(DISTINCT source) AS n_sources,
          count(*) - count(DISTINCT fp) AS n_exact_dups,
          floor(CAST(sum(tk) AS DOUBLE) * 1e6 /
            CAST(count(*) AS DOUBLE)) / 1e6 AS mean_tokens
        FROM m""")),

    ("q_curate_pack",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 20 =!= 0)
        val bench = docs.filter(col("doc_id") % 20 === 0)
        val canon = Dedup.exactDedup(corpus, "doc_id", "text")
        val contaminated = Dedup.contaminationPairs(canon, "doc_id", "text",
            bench, "doc_id", "text", n = 8, minShared = 2)
          .select(col("doc_id")).distinct()
        val decont = canon.join(contaminated, Seq("doc_id"), "left_anti")
        val mixed = Sampling.mixtureSample(decont, "doc_id", "source",
          Map("src0" -> 0.9, "src1" -> 0.5), defaultRate = 0.1)
        val tc = mixed.select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.ops.Prefix.runningOffsets(tc, "doc_id", "n_tokens")
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("offset").as("tok_offset"),
            floor(col("offset") / 512.0).cast("long").as("seq_start"))
      },
      Some(s"""WITH canon AS (SELECT min(doc_id) AS doc_id FROM documents
            WHERE doc_id % 20 <> 0
            GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
              'g')))),
        ${shingleSqlFor(8, "WHERE doc_id IN (SELECT doc_id FROM canon)",
          "cdocs", "csh")},
        ${shingleSqlFor(8, "WHERE doc_id % 20 = 0", "bdocs", "bsh")},
        contaminated AS (SELECT DISTINCT doc_id FROM (
          SELECT c.doc_id FROM csh c JOIN bsh b ON c.sg = b.sg
          GROUP BY c.doc_id, b.doc_id HAVING count(*) >= 2)),
        mixed AS (SELECT doc_id, source, text FROM documents
          WHERE doc_id IN (SELECT doc_id FROM canon)
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)
            AND ${hashScoreSql("doc_id")} <
              CASE WHEN source = 'src1' THEN 0.5
                   WHEN source = 'src0' THEN 0.9 ELSE 0.1 END),
        tc AS (SELECT doc_id, source,
            CAST(len(${tokensSql()}) AS BIGINT) AS n_tokens FROM mixed),
        o AS (SELECT doc_id, source, n_tokens,
            COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
          FROM tc)
        SELECT doc_id, source, n_tokens, CAST(off AS BIGINT) AS tok_offset,
          CAST(floor(off / 512.0) AS BIGINT) AS seq_start
        FROM o""")),

    ("q_clean_pipeline",
      (s: SparkSession, d: String) => {
        val scored = TextOps.withQuality(t(s, d, "documents"), "text")
          .withColumn("lang_pred", TextOps.langId(col("text")))
        val filtered = scored.filter(col("lang_pred") === "en" &&
          col("n_tokens").between(10, 5000) &&
          col("stop_ratio") >= 0.05 && col("punct_ratio") <= 0.30)
        val deduped = Dedup.exactDedup(filtered, "doc_id", "text")
        Sampling.hashSample(deduped, "doc_id", fraction = 0.5)
          .select("doc_id", "lang_pred", "n_tokens")
      },
      Some {
        val langCounts = TextOps.LangMarkers.filter(_._2.nonEmpty).map {
          case (lang, words) =>
            val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
            s"len(list_filter(${tokensSql()}, t -> list_contains($list, t)))" +
              s" AS c_$lang"
        }
        val langs = TextOps.LangMarkers.filter(_._2.nonEmpty).map(_._1)
        val langCase = langs.zipWithIndex.map { case (lang, i) =>
          val earlier = langs.take(i).map(l => s"c_$lang > c_$l")
          val later = langs.drop(i + 1).map(l => s"c_$lang >= c_$l")
          s"WHEN ${(earlier ++ later :+ s"c_$lang > 0").mkString(" AND ")} " +
            s"THEN '$lang'"
        }
        s"""WITH m AS (SELECT doc_id, text,
            CAST(len(${tokensSql()}) AS BIGINT) AS n_tokens,
            CAST(len(list_filter(${tokensSql()},
              t -> list_contains($stopListSql, t))) AS BIGINT) AS n_stop,
            CAST(length(text) AS BIGINT) AS n_chars,
            CAST(length(text) - length(regexp_replace(text,
              '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
            ${langCounts.mkString(",\n            ")}
          FROM documents),
          scored AS (SELECT doc_id, text, n_tokens,
            floor((CAST(n_punct AS DOUBLE) /
                   CAST(greatest(n_chars, 1) AS DOUBLE)) * 1e6) / 1e6
              AS punct_ratio,
            floor((CAST(n_stop AS DOUBLE) /
                   CAST(greatest(n_tokens, 1) AS DOUBLE)) * 1e6) / 1e6
              AS stop_ratio,
            CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                 ${langCase.mkString("\n                 ")}
                 ELSE 'und' END AS lang_pred
          FROM m),
          filtered AS (SELECT * FROM scored WHERE lang_pred = 'en'
            AND n_tokens BETWEEN 10 AND 5000
            AND stop_ratio >= 0.05 AND punct_ratio <= 0.30),
          canon AS (SELECT min(doc_id) AS id FROM filtered
            GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+',
              ' ', 'g'))))
          SELECT doc_id, lang_pred, n_tokens
          FROM filtered JOIN canon ON doc_id = canon.id
          WHERE ${hashScoreSql("doc_id")} < 0.5"""
      }),

    // Guarded nightly curation — the round-9 gates composed into ONE
    // declarative plan (the safety-ordered corpus build): blocklist gate
    // (broadcast wordlist, cheap — runs first), exact dedup (md5
    // canonical survivor), per-domain cap (grouped prefix scan), then a
    // per-source census of what survives. Catalyst fuses the gate into
    // the scan; the only shuffles are the per-doc hit rollup, the dedup
    // window key, the cap's range scan and the final census.
    ("q_curate_guarded",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").filter(col("text").isNotNull)
        val gate = TextOps.blocklistAudit(docs, "doc_id", "text",
          BlocklistFixture, maxHitsPerMTokens = 200000L)
          .filter(col("blocked") === 0L).select("doc_id")
        val kept = docs.join(gate, Seq("doc_id"), "left_semi")
        val ded = Dedup.exactDedup(kept, "doc_id", "text")
        val capped = Sampling.tokenBudgetSample(
          ded.withColumn("__one", lit(1L)), "doc_id", "source", "__one",
          Map.empty, defaultBudget = 12L)
        capped.groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
      },
      Some(s"""WITH base AS (SELECT doc_id, source, text,
            ${tokensSql()} AS tk
          FROM documents WHERE text IS NOT NULL),
        bl(term, category) AS (VALUES $blocklistValuesSql),
        h AS (SELECT doc_id, count(*) AS hits
          FROM base, UNNEST(tk) AS u(term)
          JOIN bl ON u.term = bl.term GROUP BY 1),
        kept AS (SELECT b.doc_id, b.source, b.text, b.tk
          FROM base b LEFT JOIN h USING (doc_id)
          WHERE NOT (coalesce(h.hits, 0) * 1000000 > 200000 * len(b.tk))),
        ded AS (SELECT doc_id, source, tk FROM (
            SELECT k.*, row_number() OVER (PARTITION BY md5(text)
              ORDER BY doc_id) AS rn FROM kept k) WHERE rn = 1),
        cap AS (SELECT source, tk FROM (
            SELECT d.*, coalesce(sum(1) OVER (PARTITION BY source
              ORDER BY ${hashScoreSql("doc_id")}, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
          FROM ded d) WHERE off < 12)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(len(tk)) AS BIGINT) AS n_tokens
        FROM cap GROUP BY 1""")))

}
