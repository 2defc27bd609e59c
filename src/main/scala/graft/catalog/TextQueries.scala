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

/** text-curation and tokenization queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object TextQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Corpus-bigram-LM surprisal per document (TextOps.surprisalScore) —
    // the perplexity-style quality gate, in exact whole-bit integer
    // arithmetic so the oracle replays it with length(bin(x)) instead of
    // engine-variant logarithms. Hashed 60-bit bigram keys on the shuffle.
    ("q_text_surprisal",
      (s: SparkSession, d: String) => TextOps.surprisalScore(
        t(s, d, "documents"), "doc_id", "text"),
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        bi AS MATERIALIZED (SELECT doc_id,
            CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 15))
              AS BIGINT) AS hb,
            CAST(concat('0x', substr(md5(ts[i]), 1, 15)) AS BIGINT) AS h1
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        bc AS (SELECT hb, count(*) AS n_bi FROM bi GROUP BY 1),
        uni AS (SELECT CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
              AS h1, count(*) AS n_first
          FROM docs, UNNEST(ts) AS u(t) GROUP BY 1),
        v AS (SELECT count(*) AS vs FROM uni),
        j AS (SELECT doc_id,
            length(bin(n_first + vs)) - length(bin(n_bi + 1)) AS bits
          FROM bi JOIN bc USING (hb) JOIN uni USING (h1), v)
        SELECT doc_id, count(*) AS n_bigrams,
          CAST(sum(bits) AS BIGINT) AS sum_bits,
          floor(CAST(sum(bits) AS DOUBLE) * 1e6 /
            CAST(count(*) AS DOUBLE)) / 1e6 AS mean_bits
        FROM j GROUP BY 1""")),

    // Flesch-style readability: words per sentence + vowel-group syllable
    // proxy per word, composed into the classic reading-ease score. Pure
    // per-row codegen'd expressions (regexp_count + the native tokenizer),
    // zero shuffles; the score is ONE fixed left-associative IEEE chain of
    // exact-integer inputs, floor-quantized to milli-points — identical in
    // any engine. Null texts drop (a readability score for no text is
    // noise, and engines disagree on greatest(NULL, x)).
    ("q_text_readability",
      (s: SparkSession, d: String) => {
        val doc = t(s, d, "documents").filter(col("text").isNotNull)
        val w = greatest(TextOps.tokenCount(col("text")).cast("long"),
          lit(1L))
        val sent = greatest(
          regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
        val syl = regexp_count(lower(col("text")), lit("[aeiouy]+"))
          .cast("long")
        doc.select(col("doc_id"), w.as("n_words"), sent.as("n_sentences"),
          syl.as("n_syllables"),
          floor(lit(206835.0) -
            lit(1015.0) * w.cast("double") / sent.cast("double") -
            lit(84600.0) * syl.cast("double") / w.cast("double"))
            .cast("long").as("flesch_milli"))
      },
      Some(s"""WITH m AS (SELECT doc_id,
          greatest(CAST(len(${tokensSql()}) AS BIGINT), 1) AS n_words,
          greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
            1) AS n_sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
            AS n_syllables
        FROM documents WHERE text IS NOT NULL)
        SELECT doc_id, n_words, n_sentences, n_syllables,
          CAST(floor(206835.0 -
            1015.0 * CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) -
            84600.0 * CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
            AS BIGINT) AS flesch_milli
        FROM m""")),

    ("q_text_tokens",
      (s: SparkSession, d: String) => t(s, d, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        TextOps.bpeishTokenCount(col("text")).cast("bigint").as("n_bpe"),
        TextOps.stopwordCount(col("text"), TextOps.EnglishStopwords)
          .cast("bigint").as("n_stop")),
      Some(s"""SELECT doc_id,
        CAST(len(${tokensSql()}) AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))
          AS BIGINT) AS n_bpe,
        CAST(len(list_filter(${tokensSql()},
          t -> list_contains($stopListSql, t))) AS BIGINT) AS n_stop
        FROM documents""")),

    // Gopher/C4-style within-document repetition gate: duplicate trigram
    // ratio per doc (short texts fall back to one whole-text gram, null
    // text to one null gram — count_distinct ignores nulls in both engines)
    ("q_text_dupngrams",
      (s: SparkSession, d: String) => TextOps.dupNgramRatio(
        t(s, d, "documents"), "doc_id", "text", n = 3),
      Some(s"""WITH toks AS (
          SELECT doc_id, ${tokensSql()} AS tk, text FROM documents),
        g AS (SELECT doc_id,
          CASE WHEN text IS NULL THEN [CAST(NULL AS VARCHAR)]
               WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
                 i -> array_to_string(tk[i:i+2], ' '))
               ELSE [array_to_string(tk, ' ')] END AS grams
          FROM toks)
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_ngrams,
          CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
          1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) /
                CAST(len(grams) AS DOUBLE) AS dup_ratio
        FROM g""")),

    // Gopher repetition gates (Rae et al. 2021 §A1.1): duplicate-line
    // fractions + top/duplicate n-gram character fractions. The fixture has
    // no newlines, so "lines" are deterministic 8-token tiles; real corpora
    // pass split-on-newline. The oracle replays the gram stats within-row
    // (list ops) — semantically identical to the engine's distributed
    // two-level aggregate, tractable only because oracle inputs are small.
    ("q_text_gopher",
      (s: SparkSession, d: String) => {
        val linesOf = (text: org.apache.spark.sql.Column) => {
          val tk = TextOps.tokens(text)
          when(text.isNull || coalesce(size(tk), lit(0)) === 0,
            array(lit("")))
            .otherwise(transform(
              sequence(lit(0),
                ceil(size(tk).cast("double") / 8.0).cast("int") - 1),
              i => array_join(slice(tk, i * 8 + 1, lit(8)), " ")))
        }
        TextOps.gopherRepetition(scanFloor(t(s, d, "documents")),
          "doc_id", "text",
          linesOf, topN = 2, dupN = 3)
      },
      Some {
        def gramsFor(n: Int): String =
          s"""CASE WHEN text IS NULL THEN [CAST(NULL AS VARCHAR)]
              WHEN len(tk) >= $n THEN list_transform(range(1, len(tk) - ${n - 2}),
                i -> array_to_string(tk[i:i+${n - 1}], ' '))
              ELSE [array_to_string(tk, ' ')] END"""
        val cnt = "len(list_filter(grams, x -> x = g))"
        val top = "COALESCE(list_max(list_transform(list_distinct(grams), " +
          s"g -> $cnt * COALESCE(length(g), 0))), 0)"
        val dup = "COALESCE(list_sum(list_transform(list_distinct(grams), " +
          s"g -> CASE WHEN $cnt > 1 THEN $cnt * COALESCE(length(g), 0) " +
          "ELSE 0 END)), 0)"
        val tot = "list_sum(list_transform(grams, g -> COALESCE(length(g), 0)))"
        def statsFor(n: Int, cte: String): String =
          s"""$cte AS (SELECT doc_id, $top AS top_c, $dup AS dup_c, $tot AS tot_c
              FROM (SELECT doc_id, ${gramsFor(n)} AS grams FROM base))"""
        s"""WITH base AS MATERIALIZED (SELECT doc_id, ${tokensSql()} AS tk, text
              FROM documents),
          ln AS (SELECT doc_id,
              CASE WHEN text IS NULL OR len(tk) = 0 THEN ['']
                   ELSE list_transform(range(0, CAST(ceil(len(tk) / 8.0) AS INT)),
                     i -> array_to_string(tk[i*8+1:i*8+8], ' ')) END AS lines
            FROM base),
          lm AS (SELECT doc_id,
              CAST(len(lines) AS BIGINT) AS n_lines,
              len(lines) - len(list_distinct(lines)) AS n_dup,
              list_sum(list_transform(lines, x -> length(x))) AS lc,
              list_sum(list_transform(list_distinct(lines), x -> length(x)))
                AS dc
            FROM ln),
          ${statsFor(2, "g2")},
          ${statsFor(3, "g3")}
          SELECT lm.doc_id, lm.n_lines,
            floor(1e6 * CAST(n_dup AS DOUBLE) / CAST(n_lines AS DOUBLE)) / 1e6
              AS dup_line_frac,
            floor(1e6 * CAST(lc - dc AS DOUBLE) /
              CAST(greatest(lc, 1) AS DOUBLE)) / 1e6 AS dup_line_char_frac,
            floor(1e6 * CAST(COALESCE(g2.top_c, 0) AS DOUBLE) /
              CAST(greatest(g2.tot_c, 1) AS DOUBLE)) / 1e6
              AS top2gram_char_frac,
            floor(1e6 * CAST(COALESCE(g3.dup_c, 0) AS DOUBLE) /
              CAST(greatest(g3.tot_c, 1) AS DOUBLE)) / 1e6
              AS dup3gram_char_frac
          FROM lm JOIN g2 USING (doc_id) JOIN g3 USING (doc_id)"""
      }),

    // ExactSubstr-style duplicated spans (Lee et al. 2022): positions whose
    // 5-gram repeats anywhere in the corpus, merged into maximal runs,
    // reported at >= 8 tokens. Marking + island windows only — no pair join.
    ("q_text_exact_spans",
      (s: SparkSession, d: String) => TextOps.duplicatedSpans(
        t(s, d, "documents"), "doc_id", "text", n = 5, minSpan = 8),
      Some(s"""WITH dp AS MATERIALIZED (SELECT doc_id, ${tokensSql()} AS tk
            FROM documents),
        pos AS MATERIALIZED (SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos,
            array_to_string(tk[u.i:u.i+4], ' ') AS g
          FROM dp, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        hot AS MATERIALIZED (SELECT g FROM pos
          GROUP BY g HAVING count(*) >= 2),
        d AS (SELECT p.doc_id, p.pos FROM pos p JOIN hot USING (g)),
        isl AS (SELECT doc_id, pos,
            pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM d)
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
          CAST(count(*) + 4 AS BIGINT) AS span_len
        FROM isl GROUP BY doc_id, grp
        HAVING count(*) + 4 >= 8""")),

    // ...and APPLIED: the detected spans cut from every document (the
    // ExactSubstr dedup step itself). Equi-joins + one reassembly shuffle.
    ("q_text_exact_scrub",
      (s: SparkSession, d: String) => TextOps.cutDuplicatedSpans(
        t(s, d, "documents"), "doc_id", "text", n = 5, minSpan = 8),
      Some(s"""WITH dp AS MATERIALIZED (SELECT doc_id, ${tokensSql()} AS tk
            FROM documents),
        pos AS MATERIALIZED (SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos,
            array_to_string(tk[u.i:u.i+4], ' ') AS g
          FROM dp, UNNEST(range(1, len(tk) - 3)) AS u(i)),
        hot AS MATERIALIZED (SELECT g FROM pos
          GROUP BY g HAVING count(*) >= 2),
        dd AS (SELECT p.doc_id, p.pos FROM pos p JOIN hot USING (g)),
        isl AS (SELECT doc_id, pos,
            pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM dd),
        spans AS MATERIALIZED (SELECT doc_id, min(pos) AS span_start,
            count(*) + 4 AS span_len
          FROM isl GROUP BY doc_id, grp HAVING count(*) + 4 >= 8),
        cov AS MATERIALIZED (SELECT doc_id, u.i AS idx
          FROM spans, UNNEST(range(span_start, span_start + span_len)) u(i)),
        toks AS MATERIALIZED (SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS idx,
            tk[u.i] AS tok
          FROM dp, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        kept AS (SELECT doc_id,
            string_agg(tok, ' ' ORDER BY idx) AS clean_text,
            count(*) AS n_kept
          FROM (SELECT t.* FROM toks t ANTI JOIN cov c
                ON c.doc_id = t.doc_id AND c.idx = t.idx)
          GROUP BY doc_id)
        SELECT dp.doc_id, coalesce(k.clean_text, '') AS clean_text,
          CAST(len(tk) AS BIGINT) AS n_tokens,
          CAST(len(tk) - coalesce(k.n_kept, 0) AS BIGINT) AS n_cut
        FROM dp LEFT JOIN kept k ON k.doc_id = dp.doc_id""")),

    // Deflate compression-ratio quality gate. DuckDB has no deflate, but
    // CPython's zlib IS an independent implementation of the same codec
    // (verified byte-size-identical to java.util.zip.Deflater level 6 on
    // this corpus), so the oracle joins a committed Python-generated
    // golden (tools/make_golden.py -> golden/text_compression.parquet,
    // keyed by md5(text) because texts differ per scale) and replays
    // raw_len/ratio natively — a true cross-implementation oracle for
    // the one codec SQL cannot express. Regenerate the golden whenever
    // the driver regenerates testdata.
    ("q_text_compression",
      (s: SparkSession, d: String) => {
        import s.implicits._
        TextOps.compressionScore(
          t(s, d, "documents").select(col("doc_id"), col("text"))
            .as[(Long, String)]).toDF()
      },
      Some("""WITH raw AS (SELECT doc_id, text,
            CAST(octet_length(encode(text)) AS BIGINT) AS raw_len
          FROM documents)
        SELECT r.doc_id, r.raw_len, g.comp_len,
          CASE WHEN r.raw_len = 0 THEN CAST(1000000 AS BIGINT)
            ELSE CAST(g.comp_len * 1000000 // r.raw_len AS BIGINT)
          END AS ratio_micro
        FROM raw r
        JOIN read_parquet('/root/repo/golden/text_compression.parquet') g
          ON md5(r.text) = g.text_md5""")),

    ("q_text_quality",
      (s: SparkSession, d: String) =>
        TextOps.withQuality(t(s, d, "documents"), "text")
          .select("doc_id", "n_chars", "n_tokens", "n_stopwords",
            "punct_ratio", "stop_ratio", "quality_score"),
      Some(s"""WITH m AS (SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(${tokensSql()}) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(${tokensSql()},
            t -> list_contains($stopListSql, t))) AS BIGINT) AS n_stopwords,
          CAST(length(text) -
            length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT)
            AS n_punct
        FROM documents)
        SELECT doc_id, n_chars, n_tokens, n_stopwords,
          floor((CAST(n_punct AS DOUBLE) /
                 CAST(greatest(n_chars, 1) AS DOUBLE)) * 1e6) / 1e6
            AS punct_ratio,
          floor((CAST(n_stopwords AS DOUBLE) /
                 CAST(greatest(n_tokens, 1) AS DOUBLE)) * 1e6) / 1e6
            AS stop_ratio,
          floor((0.4 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)
               + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) /
                              CAST(greatest(n_chars, 1) AS DOUBLE))
               + 0.3 * least((CAST(n_stopwords AS DOUBLE) /
                              CAST(greatest(n_tokens, 1) AS DOUBLE)) * 5, 1.0))
               * 1e6) / 1e6 AS quality_score
        FROM m""")),

    // C4 sentence-level cleaning (Raffel 2020 §2.2): terminal-punctuation
    // rule encoded in the extraction regex (RE2-safe — DuckDB replays the
    // identical pattern), word-count + phrase-blacklist per sentence,
    // min-surviving-sentences per document. One scan-stage projection +
    // predicate — no shuffle
    // The fixture documents carry no punctuation, so the catalog derives
    // deterministic pseudo-sentences (the same 8-token tiles the gopher
    // entry uses for lines) in place of the default terminal-punct
    // extractor; that rule itself is spec-pinned (OpsSpec) on punctuated
    // text. 'slow' plays the blacklist phrase against the fixture vocab
    ("q_text_c4_clean",
      (s: SparkSession, d: String) => {
        val tilesOf = (text: org.apache.spark.sql.Column) => {
          val tk = TextOps.tokens(text)
          when(text.isNull || coalesce(size(tk), lit(0)) === 0,
            array(lit("")))
            .otherwise(transform(
              sequence(lit(0),
                ceil(size(tk).cast("double") / 8.0).cast("int") - 1),
              i => array_join(slice(tk, i * 8 + 1, lit(8)), " ")))
        }
        TextOps.c4SentenceClean(t(s, d, "documents"), "doc_id", "text",
          minWords = 8, minSentences = 2,
          blacklist = Seq("slow", "lorem ipsum"), sentencesOf = tilesOf)
      },
      Some(s"""WITH base AS (SELECT doc_id, ${tokensSql()} AS tk, text
            FROM documents),
        ln AS (SELECT doc_id,
            CASE WHEN text IS NULL OR len(tk) = 0 THEN ['']
                 ELSE list_transform(range(0, CAST(ceil(len(tk) / 8.0) AS INT)),
                   i -> array_to_string(tk[i*8+1:i*8+8], ' ')) END AS sents
          FROM base),
        k AS (SELECT doc_id,
            CAST(len(sents) AS BIGINT) AS n_sentences,
            list_filter(sents, x ->
              len(list_filter(regexp_split_to_array(lower(x), '[^a-z0-9]+'),
                  t -> len(t) > 0)) >= 8
              AND NOT contains(lower(x), 'slow')
              AND NOT contains(lower(x), 'lorem ipsum')) AS kept
          FROM ln)
        SELECT doc_id, n_sentences, CAST(len(kept) AS BIGINT) AS n_kept,
          array_to_string(list_transform(kept, x -> trim(x)), ' ')
            AS clean_text
        FROM k WHERE len(kept) >= 2""")),

    ("q_text_langid",
      (s: SparkSession, d: String) => t(s, d, "documents").select(
        col("doc_id"), TextOps.langId(col("text")).as("lang_pred")),
      Some(langIdOracleSql)),

    // Language-ID confusion matrix — the EVALUATION of q_text_langid's
    // heuristic against the declared labels (a classifier you haven't
    // scored against truth is a guess): per (declared, predicted) cell
    // count plus the within-declared-language rate in ppm. The diagonal
    // is per-language recall; off-diagonal mass says WHICH languages the
    // stopword markers confuse (the actionable fix list). Two
    // combine-enabled aggregates over one scored scan; cells bounded by
    // the 6x6 language domain.
    ("q_text_lang_confusion",
      (s: SparkSession, d: String) => {
        val p = t(s, d, "documents").select(col("lang"),
          TextOps.langId(col("text")).as("pred"))
        val cell = p.groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        val per = p.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        cell.join(per, Seq("lang"))
          .select(col("lang"), col("pred"), col("n"), col("n_lang"),
            floor(col("n").cast("double") * lit(1e6) /
              col("n_lang").cast("double")).cast("long").as("cell_ppm"))
      },
      Some(s"""WITH pred AS ($langIdOracleSql),
        j AS (SELECT d.lang, p.lang_pred AS pred
          FROM documents d JOIN pred p USING (doc_id)),
        cell AS (SELECT lang, pred, count(*) AS n FROM j GROUP BY 1, 2),
        per AS (SELECT lang, count(*) AS n_lang FROM j GROUP BY 1)
        SELECT lang, pred, n, n_lang,
          CAST(floor(CAST(n AS DOUBLE) * 1e6 /
            CAST(n_lang AS DOUBLE)) AS BIGINT) AS cell_ppm
        FROM cell JOIN per USING (lang)""")),

    // Unicode NFC normalization (plans.UnicodeNormalize — native codegen'd
    // expression, no UDF): "é" arrives precomposed (U+00E9) and decomposed
    // (e + U+0301); without NFC the two spellings hash apart and split one
    // document's dedup class. Two variants per customer collapse to ONE
    // normalized key; the oracle replays with DuckDB's nfc_normalize.
    ("q_text_unicode",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
        val variants = c.select(col("c_custkey"),
          explode(array(concat(col("c_name"), lit("e\u0301")),
            concat(col("c_name"), lit("\u00e9")))).as("raw"))
        variants.select(col("c_custkey"), col("raw"),
            graft.plans.GraftExpressions.unicode_normalize(col("raw"))
              .as("norm"))
          .groupBy("c_custkey")
          .agg(count_distinct(col("raw")).as("n_distinct_raw"),
            count_distinct(col("norm")).as("n_distinct_nfc"),
            min(md5(col("norm").cast("binary"))).as("nfc_md5"),
            max(length(col("raw")) - length(col("norm"))).as("len_delta"))
      },
      Some(s"""SELECT c_custkey, CAST(2 AS BIGINT) AS n_distinct_raw,
          CAST(1 AS BIGINT) AS n_distinct_nfc,
          md5(nfc_normalize(c_name || 'e' || chr(769))) AS nfc_md5,
          CAST(1 AS INT) AS len_delta
        FROM customer""")),

    // Accent-insensitive dedup keys: NFD then strip combining marks
    // (\p{Mn}) then lowercase — the cross-lingual fold that merges
    // "Café" / "Café" / "cafe" into one key. Three spellings per
    // customer (plain, precomposed accent, decomposed accent) fold to
    // exactly two keys (the accented pair merges; the plain one differs
    // by its missing base letter). \p{Mn} means the same Unicode property
    // in Java regex and RE2, so the oracle replays the fold directly.
    ("q_text_accent_fold",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
        val variants = c.select(col("c_custkey"), explode(array(
            col("c_name"),
            concat(col("c_name"), lit("\u00e9")),
            concat(col("c_name"), lit("e\u0301")))).as("raw"))
        val folded = lower(regexp_replace(
          graft.plans.GraftExpressions.unicode_normalize(col("raw"), "NFD"),
          "\\p{Mn}", ""))
        variants.select(col("c_custkey"), folded.as("k"))
          .groupBy("c_custkey")
          .agg(count(lit(1)).as("n_raw"),
            count_distinct(col("k")).as("n_folded"),
            min(col("k")).as("k_min"))
          .select(col("c_custkey"), col("n_raw"), col("n_folded"),
            md5(col("k_min").cast("binary")).as("fold_md5"))
      },
      Some("""SELECT c_custkey, CAST(3 AS BIGINT) AS n_raw,
          CAST(2 AS BIGINT) AS n_folded,
          md5(lower(c_name)) AS fold_md5
        FROM customer""")),

    // URL canonicalization (TextOps.canonicalUrl) — the crawl pipeline's
    // first dedup key. Two deterministic variants of the same logical URL
    // per customer (one messy: uppercase scheme/host, www., default port,
    // trailing slash, utm_ tracking param, unsorted params, fragment; one
    // clean) must collapse to ONE canonical string per customer. The
    // oracle states the expected canonical in closed form — any wrong
    // normalization step breaks the group-by and the hash.
    ("q_text_url_canon",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").select(
          col("c_custkey").cast("string").as("ck"),
          col("c_nationkey").cast("string").as("nk"),
          lower(col("c_mktsegment")).as("seg"))
        val messy = concat(lit("HTTPS://WWW.shop"), col("nk"),
          lit(".com:443/item/"), col("ck"),
          lit("/?utm_source=mail&ref="), col("seg"), lit("&a=1#top"))
        val clean = concat(lit("https://shop"), col("nk"),
          lit(".com/item/"), col("ck"), lit("?a=1&ref="), col("seg"))
        c.select(explode(array(messy, clean)).as("url"))
          .select(col("url"),
            TextOps.canonicalUrl(col("url")).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_variants"),
            count_distinct(col("url")).as("n_distinct_inputs"))
      },
      Some("""SELECT concat('https://shop', c_nationkey, '.com/item/',
          c_custkey, '?a=1&ref=', lower(c_mktsegment)) AS canonical_url,
          CAST(2 AS BIGINT) AS n_variants,
          CAST(2 AS BIGINT) AS n_distinct_inputs
        FROM customer""")),

    ("q_text_fingerprint",
      (s: SparkSession, d: String) => t(s, d, "documents").select(
        col("doc_id"),
        TextOps.fingerprintMd5(col("text")).as("fp_md5"),
        TextOps.fingerprintRolling(col("text")).as("fp_roll")),
      Some("""WITH n AS (SELECT doc_id,
          trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        FROM documents)
        SELECT doc_id, md5(norm) AS fp_md5,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(norm) + 1),
                i -> CAST(unicode(norm[i]) AS BIGINT))),
            (acc, c) -> (acc * 31 + c) % 1000000000000000) AS fp_roll
        FROM n""")),

    // PII scrubbing audit: deterministic synthetic PII is appended to each
    // document (derived from its own columns — the fixture text itself has
    // none), then counted and redacted. Patterns are RE2-safe, so the same
    // pattern TEXT drives Spark's Java regex and DuckDB's RE2 identically.
    ("q_text_pii",
      (s: SparkSession, d: String) => {
        val aug = concat(col("text"), lit(" contact "), col("source"),
          lit("@example.com or 555-123-4567 at 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7"))
        t(s, d, "documents").select(
          col("doc_id") +:
            graft.ops.TextOps.piiColumns(aug).map { case (n, c) => c.as(n) }: _*)
      },
      Some {
        val (e, p, i) = (TextOps.EmailPattern, TextOps.PhonePattern,
          TextOps.Ipv4Pattern)
        s"""WITH aug AS (SELECT doc_id,
            text || ' contact ' || source ||
              '@example.com or 555-123-4567 at 10.0.' ||
              CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
          FROM documents),
        st AS (SELECT doc_id, t,
            regexp_replace(t, '$e', '[EMAIL]', 'g') AS t1 FROM aug),
        st2 AS (SELECT *, regexp_replace(t1, '$p', '[PHONE]', 'g') AS t2
          FROM st)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '$e')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(t1, '$p')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(t2, '$i')) AS BIGINT) AS n_ips,
          regexp_replace(t2, '$i', '[IP]', 'g') AS redacted
        FROM st2"""
      }),

    // Benchmark decontamination: every 20th document plays the eval set;
    // the rest are the training corpus. Long (8-gram) overlap — the
    // GPT-3/PaLM-style contamination gate (Dedup.contaminationPairs).
    ("q_text_decontam",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        Dedup.contaminationPairs(
          docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
          n = 8, minShared = 2)
      },
      Some(s"""WITH ${shingleSqlFor(8, "WHERE doc_id % 20 <> 0", "cdocs", "csh")},
        ${shingleSqlFor(8, "WHERE doc_id % 20 = 0", "bdocs", "bsh")},
        sizes AS (SELECT doc_id AS bench_id, count(*) AS bench_ngrams
          FROM bsh GROUP BY 1),
        shared AS (SELECT c.doc_id, b.doc_id AS bench_id,
            count(*) AS shared_ngrams
          FROM csh c JOIN bsh b ON c.sg = b.sg
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT s.doc_id, s.bench_id, s.shared_ngrams, z.bench_ngrams,
          CAST(s.shared_ngrams AS DOUBLE) / CAST(z.bench_ngrams AS DOUBLE)
            AS containment
        FROM shared s JOIN sizes z USING (bench_id)""")),

    // Bloom-filter decontamination: the same benchmark split as
    // q_text_decontam, but membership goes through a 2^20-bit Bloom filter
    // (one fixed-size aggregate row broadcast to the corpus scan) instead
    // of a gram join — the O(MB)-state 100 TB form. Bit positions are the
    // md5 minhash family, so the oracle rebuilds the EXACT filter (false
    // positives included) and flags the identical documents
    ("q_text_bloom_decontam",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        Dedup.bloomContamination(
          docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
          n = 8, mBits = 1 << 20, k = 4)
      },
      Some(s"""WITH ${shingleSqlFor(8, "WHERE doc_id % 20 <> 0", "cdocs", "csh")},
        ${shingleSqlFor(8, "WHERE doc_id % 20 = 0", "bdocs", "bsh")},
        ks AS (SELECT unnest(range(0, 4)) AS i),
        bpos AS (SELECT DISTINCT
            (CAST(concat('0x', substr(md5(sg), 1, 8)) AS BIGINT)
             + ks.i * CAST(concat('0x', substr(md5(sg), 9, 8)) AS BIGINT))
              % 1048576 AS pos
          FROM bsh CROSS JOIN ks),
        cpos AS (SELECT doc_id, sg,
            (CAST(concat('0x', substr(md5(sg), 1, 8)) AS BIGINT)
             + ks.i * CAST(concat('0x', substr(md5(sg), 9, 8)) AS BIGINT))
              % 1048576 AS pos
          FROM csh CROSS JOIN ks),
        hit AS (SELECT doc_id, sg FROM cpos JOIN bpos USING (pos)
          GROUP BY 1, 2 HAVING count(*) = 4)
        SELECT doc_id, count(*) AS n_hits FROM hit GROUP BY 1""")),

    // KMV distinct-count sketch vs exact distinct, per language — the
    // deterministic alternative to HLL: the estimate is a pure function of
    // the k smallest md5 hashes, so the oracle replays it bit-for-bit
    // (plans/Expressions.scala KmvDistinct; O(k) state, map-side combined).
    // KMV sketch SET ALGEBRA — the step past q_text_kmv's single-set
    // cardinality: per-source-PAIR vocabulary overlap (intersection size
    // and Jaccard) estimated from the per-source bottom-64 sketches
    // alone, audited against the exact pairwise join. The theta trick
    // (Beyer et al. SIGMOD'07 / theta sketches): merge two sketches,
    // theta = the union's kth-smallest hash, count common hashes below
    // theta — an unbiased Jaccard estimate with O(k) state where the
    // exact answer needs a vocabulary-sized shuffle join per pair. When
    // the merged sketch is NOT full the formula degrades to the exact
    // answer by construction (theta = max, everything counted). At
    // 100 TB the sketch table is #sources rows of 64 longs; the exact
    // columns here are the audit, not the production path.
    ("q_text_sketch_overlap",
      (s: SparkSession, d: String) => {
        val E = graft.plans.GraftExpressions
        val toks = t(s, d, "documents")
          .select(col("source"),
            explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .select(col("source"), E.md5_prefix60(col("w")).as("h"))
          .distinct()
        val sk = toks.groupBy("source")
          .agg(E.bottomk_distinct(col("h"), 64).as("sk"))
        val exact = toks.join(
            toks.select(col("source").as("s2"), col("h")), Seq("h"))
          .filter(col("source") < col("s2"))
          .groupBy(col("source").as("s1"), col("s2"))
          .agg(count(lit(1)).as("exact_inter"))
        val pairs = sk.select(col("source").as("s1"), col("sk").as("a"))
          .join(sk.select(col("source").as("s2"), col("sk").as("b")),
            col("s1") < col("s2"))
          .withColumn("m64",
            slice(array_sort(array_distinct(concat(col("a"), col("b")))),
              1, 64))
          .withColumn("kk", size(col("m64")).cast("long"))
          .withColumn("theta", element_at(col("m64"), col("kk").cast("int")))
          .withColumn("common",
            size(filter(array_intersect(col("a"), col("b")),
              x => x <= col("theta"))).cast("long"))
          .withColumn("union_est",
            when(col("kk") < 64, col("kk").cast("double"))
              .otherwise(lit(63.0) * lit(1152921504606846976.0) /
                col("theta").cast("double")))
          .select(col("s1"), col("s2"), col("kk"),
            floor(lit(1000.0) * col("common").cast("double") /
              col("kk").cast("double")).cast("long").as("jac_milli"),
            floor((col("common").cast("double") /
              col("kk").cast("double")) * col("union_est"))
              .cast("long").as("inter_est"))
        pairs.join(exact, Seq("s1", "s2"))
          .select("s1", "s2", "kk", "jac_milli", "inter_est",
            "exact_inter")
      },
      Some(s"""WITH toks AS MATERIALIZED (SELECT DISTINCT source,
            CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
          FROM documents, UNNEST(${tokensSql()}) AS u(t)),
        sk AS (SELECT source, list(h ORDER BY h) AS sk FROM (
            SELECT source, h, row_number() OVER (PARTITION BY source
              ORDER BY h) AS rn FROM toks)
          WHERE rn <= 64 GROUP BY 1),
        exact AS (SELECT a.source AS s1, b.source AS s2,
            count(*) AS exact_inter
          FROM toks a JOIN toks b ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2),
        p0 AS (SELECT x.source AS s1, y.source AS s2, x.sk AS a, y.sk AS b
          FROM sk x JOIN sk y ON x.source < y.source),
        p1 AS (SELECT s1, s2, a, b,
            list_sort(list_distinct(list_concat(a, b)))[1:64] AS m64
          FROM p0),
        p2 AS (SELECT s1, s2, a, b, m64,
            CAST(len(m64) AS BIGINT) AS kk,
            list_extract(m64, len(m64)) AS theta
          FROM p1),
        p3 AS (SELECT s1, s2, kk, theta,
            CAST(len(list_filter(list_intersect(a, b),
              x -> x <= theta)) AS BIGINT) AS common,
            CASE WHEN kk < 64 THEN CAST(kk AS DOUBLE)
                 ELSE 63.0 * 1152921504606846976.0 /
                   CAST(theta AS DOUBLE) END AS union_est
          FROM p2)
        SELECT s1, s2, kk,
          CAST(floor(1000.0 * CAST(common AS DOUBLE) /
            CAST(kk AS DOUBLE)) AS BIGINT) AS jac_milli,
          CAST(floor((CAST(common AS DOUBLE) / CAST(kk AS DOUBLE)) *
            union_est) AS BIGINT) AS inter_est,
          exact_inter
        FROM p3 JOIN exact USING (s1, s2)""")),

    ("q_text_kmv",
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents").select(col("lang"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
        toks
          .withColumn("h", graft.plans.GraftExpressions.md5_prefix60(col("w")))
          .groupBy("lang").agg(
            graft.plans.GraftExpressions.kmv_distinct(col("h"), 16)
              .as("est_distinct"),
            count_distinct(col("w")).as("exact_distinct"))
      },
      Some(s"""WITH toks AS (SELECT lang, t
          FROM documents, UNNEST(${tokensSql()}) AS u(t)),
        h AS (SELECT DISTINCT lang,
            CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
          FROM toks),
        r AS (SELECT lang, h,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
            count(*) OVER (PARTITION BY lang) AS cnt FROM h),
        kth AS (SELECT lang, max(CASE WHEN rn <= 16 THEN h END) AS h_k,
            any_value(cnt) AS cnt FROM r GROUP BY 1),
        ex AS (SELECT lang, count(DISTINCT t) AS exact_distinct
          FROM toks GROUP BY 1)
        SELECT kth.lang,
          CASE WHEN kth.cnt < 16 THEN CAST(kth.cnt AS DOUBLE)
               ELSE 15.0 * 1152921504606846976.0 / CAST(h_k AS DOUBLE)
          END AS est_distinct,
          ex.exact_distinct
        FROM kth JOIN ex ON kth.lang IS NOT DISTINCT FROM ex.lang""")),

    // Count-Min frequency sketch (the counterpart of q_text_kmv's distinct
    // sketch): one fixed 4x512-counter aggregate over every token occurrence,
    // then the top-20 exact heavy hitters with their sketch point-estimates.
    // At 100 TB the sketch replaces the full-vocabulary shuffle: state is
    // 16 KB per partition, counter-wise summed map-side. The oracle replays
    // the buckets exactly (md5-derived hashes, addition commutes).
    ("q_text_cms",
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents").select(
          explode(graft.ops.TextOps.tokens(col("text"))).as("word"))
        val sketch = graft.ops.TextOps.cmsSketch(toks, "word",
          depth = 4, width = 512)
        val top = toks.groupBy("word").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("word").asc).limit(20)
        top.crossJoin(broadcast(sketch))
          .select(col("word"), col("n_exact"),
            graft.ops.TextOps.cmsEstimate(col("sketch"), col("word"),
              depth = 4, width = 512).as("cms_est"))
      },
      Some(s"""WITH toks AS MATERIALIZED (SELECT t AS word
            FROM documents, UNNEST(${tokensSql()}) AS u(t)),
          cnt AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n_exact
            FROM toks GROUP BY word),
          hb AS MATERIALIZED (SELECT word, n_exact, r.t,
              CAST(concat('0x',
                substr(md5(CAST(r.t AS VARCHAR) || ':' || word), 1, 15))
                AS BIGINT) % 512 AS b
            FROM cnt, UNNEST(range(0, 4)) AS r(t)),
          bsum AS MATERIALIZED (SELECT t, b, SUM(n_exact) AS s
            FROM hb GROUP BY t, b),
          est AS (SELECT hb.word, CAST(min(bsum.s) AS BIGINT) AS cms_est
            FROM hb JOIN bsum USING (t, b) GROUP BY hb.word)
        SELECT c.word, c.n_exact, e.cms_est
        FROM cnt c JOIN est e USING (word)
        ORDER BY c.n_exact DESC, c.word ASC LIMIT 20""")),

    // Exact per-language length percentiles (discrete: the element at
    // ceil(p*n), no interpolation — interpolated quantiles are IEEE
    // op-order-sensitive across engines, the rank selection is not). Both
    // windows and the self-join share one partitioning on lang.
    // Cross-source quantile normalization — score harmonization before
    // mixing heterogeneous sources: a "length-quality 60" from a source
    // of short posts means something different than from a books crawl,
    // so each source's score is remapped to the GLOBAL bucket at the same
    // CDF position (mapped = min global bucket whose cumulative fraction
    // >= the source's). The comparison is done in EXACT cross-multiplied
    // BIGINT (g_cum·src_total >= s_cum·global_total) — no float CDFs.
    // Scores quantized to 101 buckets, so every window partition and the
    // broadcast global table are domain-bounded; the per-source CDF is a
    // 101-row window, the mapping a broadcast range join + min aggregate.
    ("q_text_quantile_norm",
      (s: SparkSession, d: String) => {
        val b = t(s, d, "documents").select(col("source"),
          least(floor(col("n_chars") / 50), lit(100L)).as("bucket"))
        val wc = Window.partitionBy("source").orderBy(col("bucket").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wt = Window.partitionBy("source")
        val sb = b.groupBy("source", "bucket")
          .agg(count(lit(1)).as("n"))
          .withColumn("s_cum", sum("n").over(wc))
          .withColumn("s_tot", sum("n").over(wt))
        val wg = Window.orderBy(col("g_bucket").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val gb = b.groupBy(col("bucket").as("g_bucket"))
          .agg(count(lit(1)).as("gn"))
          .withColumn("g_cum", sum("gn").over(wg))
        val gt = b.agg(count(lit(1)).as("g_tot"))
        sb.crossJoin(broadcast(gt))
          .join(broadcast(gb),
            col("g_cum") * col("s_tot") >= col("s_cum") * col("g_tot"))
          .groupBy("source", "bucket")
          .agg(any_value(col("n")).as("n"),
            any_value(col("s_cum")).as("s_cum"),
            min("g_bucket").as("mapped_bucket"))
      },
      Some("""WITH b AS (SELECT source,
            least(CAST(floor(n_chars / 50) AS BIGINT), 100) AS bucket
          FROM documents),
        sb AS (SELECT source, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        sc AS (SELECT source, bucket, n,
            CAST(sum(n) OVER (PARTITION BY source ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s_cum,
            CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS s_tot
          FROM sb),
        gb AS (SELECT bucket AS g_bucket, count(*) AS gn
          FROM b GROUP BY 1),
        gc AS (SELECT g_bucket,
            CAST(sum(gn) OVER (ORDER BY g_bucket ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS g_cum
          FROM gb),
        gt AS (SELECT count(*) AS g_tot FROM b)
        SELECT source, bucket, any_value(n) AS n,
          any_value(s_cum) AS s_cum,
          CAST(min(g_bucket) AS BIGINT) AS mapped_bucket
        FROM sc, gt JOIN gc ON g_cum * s_tot >= s_cum * g_tot
        GROUP BY 1, 2""")),

    ("q_text_lenpct",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        val ranked = t(s, d, "documents").select(
            col("lang"), col("n_chars"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
        // one pass: a filtered-then-join formulation would reference the
        // ranked subtree twice and Spark evaluates each reference
        def hit(p: Double) = col("rn") === ceil(col("cnt") * lit(p))
        ranked.filter(hit(0.5) || hit(0.9))
          .groupBy("lang").agg(
            min(when(hit(0.5), col("n_chars"))).as("p50_chars"),
            min(when(hit(0.9), col("n_chars"))).as("p90_chars"))
      },
      Some("""WITH ranked AS (SELECT lang, n_chars,
          row_number() OVER (PARTITION BY lang
            ORDER BY n_chars, doc_id) AS rn,
          count(*) OVER (PARTITION BY lang) AS cnt FROM documents)
        SELECT a.lang, a.n_chars AS p50_chars, b.n_chars AS p90_chars
        FROM ranked a JOIN ranked b ON a.lang = b.lang
        WHERE a.rn = CAST(ceil(a.cnt * 0.5) AS BIGINT)
          AND b.rn = CAST(ceil(b.cnt * 0.9) AS BIGINT)""")),

    // Corpus vocabulary statistics: top-50 words by occurrence with document
    // frequency — the token-distribution audit a tokenizer-training or
    // quality pipeline runs first. High-cardinality groupBy with map-side
    // partial aggregation; fully deterministic order (count desc, word asc).
    ("q_text_vocab",
      (s: SparkSession, d: String) => t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("word").asc)
        .limit(50),
      Some(s"""WITH toks AS (SELECT doc_id, t
          FROM documents, UNNEST(${tokensSql()}) AS u(t))
        SELECT t AS word, count(*) AS n_occurrences,
          count(DISTINCT doc_id) AS n_docs
        FROM toks GROUP BY 1
        ORDER BY n_occurrences DESC, word ASC LIMIT 50""")),

    // Zipf-slope corpus diagnostic: regress whole-bit log2(freq) on
    // whole-bit log2(rank) over the vocabulary — a healthy natural-text
    // corpus slopes near -1; word-soup or boilerplate-heavy corpora
    // flatten. All moments are exact BIGINTs (bit-lengths, not floating
    // logs — cross-engine bit-stable); the ONLY window ranks the
    // VOCABULARY table (sublinear in the corpus — the same domain-bounded
    // class as the quantile cell tables), and the result is one row.
    // Heaps'-law vocabulary-growth curve (Heaps 1978): distinct-type
    // count and type-token ratio at fixed doc-order checkpoints. The
    // distributed trick: the cumulative vocabulary at checkpoint c is
    // NOT a running distinct (a corpus-order scan) — it is the count of
    // tokens whose FIRST-occurrence doc (one min-aggregate per type) is
    // below c, so the whole curve is one groupBy + a constant 6-row
    // broadcast fan-out. No logs (banned cross-engine): the curve points
    // and the declining ttr_ppm ARE the Heaps readout; fit beta offline.
    ("q_text_heaps",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val cps = Seq(50L, 200L, 800L, 3200L, 12800L, 51200L)
        val cpDf = cps.toDF("c")
        val dp = t(s, d, "documents").select(col("doc_id"),
          graft.ops.TextOps.tokens(col("text")).as("ts"))
        val firstDoc = dp.select(col("doc_id"), explode(col("ts")).as("w"))
          .groupBy("w").agg(min("doc_id").as("first_doc"))
        val vocab = firstDoc
          .join(broadcast(cpDf), col("first_doc") < col("c"))
          .groupBy("c").agg(count(lit(1)).as("vocab"))
        val toks = dp
          .select(col("doc_id"), size(col("ts")).cast("long").as("nt"))
          .join(broadcast(cpDf), col("doc_id") < col("c"))
          .groupBy("c").agg(count(lit(1)).as("n_docs"),
            sum("nt").as("n_tokens"))
        toks.join(vocab, Seq("c"))
          .select(col("c"), col("n_docs"), col("n_tokens"), col("vocab"),
            when(col("n_tokens") === 0L, lit(null).cast("long"))
              .otherwise(floor(lit(1e6) * col("vocab").cast("double") /
                col("n_tokens").cast("double")).cast("long"))
              .as("ttr_ppm"))
      },
      Some(s"""WITH cp AS (SELECT CAST(u.c AS BIGINT) AS c
          FROM UNNEST([50, 200, 800, 3200, 12800, 51200]) u(c)),
        dp AS (SELECT doc_id, ${tokensSql()} AS tk FROM documents),
        tok AS (SELECT doc_id, tk[u.i] AS w
          FROM dp, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        fd AS (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY 1),
        voc AS (SELECT c, CAST(count(*) AS BIGINT) AS vocab
          FROM fd JOIN cp ON fd.first_doc < cp.c GROUP BY 1),
        tks AS (SELECT c, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(len(tk)) AS BIGINT) AS n_tokens
          FROM dp JOIN cp ON dp.doc_id < cp.c GROUP BY 1)
        SELECT tks.c, n_docs, n_tokens, vocab,
          CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST(floor(1e6 * CAST(vocab AS DOUBLE) /
              CAST(n_tokens AS DOUBLE)) AS BIGINT) END AS ttr_ppm
        FROM tks JOIN voc ON voc.c = tks.c""")),

    ("q_text_zipf",
      (s: SparkSession, d: String) => {
        val f = t(s, d, "documents")
          .select(explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("freq"))
        val ranked = f.withColumn("rank", row_number().over(
          Window.orderBy(col("freq").desc, col("term").asc)).cast("long"))
        val b = ranked.select(
          graft.plans.GraftExpressions.bit_length_long(col("rank")).as("x"),
          graft.plans.GraftExpressions.bit_length_long(col("freq")).as("y"))
        b.agg(count(lit(1)).as("n_terms"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("slope_bits",
            floor(lit(1e6) *
              (col("n_terms") * col("sxy") - col("sx") * col("sy"))
                .cast("double") /
              (col("n_terms") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) / lit(1e6))
      },
      Some(s"""WITH terms AS (SELECT t AS term
            FROM documents, UNNEST(${tokensSql()}) AS u(t)),
          f AS (SELECT term, count(*) AS freq FROM terms GROUP BY 1),
          r AS (SELECT freq, row_number() OVER (
              ORDER BY freq DESC, term ASC) AS rank FROM f),
          b AS (SELECT CAST(length(bin(rank)) AS BIGINT) AS x,
              CAST(length(bin(freq)) AS BIGINT) AS y FROM r),
          m AS (SELECT count(*) AS n_terms,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(x * y) AS BIGINT) AS sxy FROM b)
        SELECT n_terms, sx, sy, sxx, sxy,
          floor(1e6 * CAST(n_terms * sxy - sx * sy AS DOUBLE) /
            CAST(n_terms * sxx - sx * sx AS DOUBLE)) / 1e6 AS slope_bits
        FROM m""")),

    // LM-coverage quality gate: the fraction of a document's bigrams that
    // are corpus-frequent — the integer-stable stand-in for perplexity
    // scoring (log-prob sums are not cross-engine bit-stable; a coverage
    // ratio of exact counts is). Frequent-bigram set broadcast; per-doc
    // work is one combine-enabled aggregate.
    ("q_text_bigram_coverage",
      (s: SparkSession, d: String) => {
        val docBi = t(s, d, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
          .select(col("doc_id"), explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))).as("bigram"))
          .filter(col("bigram").isNotNull)
        val frequent = docBi.groupBy("bigram")
          .agg(count(lit(1)).as("n")).filter(col("n") >= 20)
          .select(col("bigram"), lit(1L).as("known"))
        docBi.join(broadcast(frequent), Seq("bigram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(coalesce(col("known"), lit(0L))).as("n_known"))
          .withColumn("coverage",
            floor(col("n_known").cast("double") /
              col("n_bigrams").cast("double") * 1e6) / 1e6)
      },
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        bi AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bigram
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        freq AS (SELECT bigram, CAST(1 AS BIGINT) AS known FROM
          (SELECT bigram, count(*) AS n FROM bi GROUP BY 1) WHERE n >= 20)
        SELECT doc_id, count(*) AS n_bigrams,
          CAST(sum(coalesce(known, 0)) AS BIGINT) AS n_known,
          floor(CAST(sum(coalesce(known, 0)) AS DOUBLE) /
            CAST(count(*) AS DOUBLE) * 1e6) / 1e6 AS coverage
        FROM bi LEFT JOIN freq USING (bigram) GROUP BY 1""")),

    // Document chunking (RAG / pretraining window prep): overlapping
    // 64-token windows at stride 48, all from codegen'd sequence/slice
    // expressions — the explode fan-out is ceil(n_tokens/stride) rows per
    // doc, bounded and predictable; chunks emit as md5 so row width stays
    // constant regardless of window size
    ("q_text_chunks",
      (s: SparkSession, d: String) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            floor((size(col("ts")) - 1) / 48.0).cast("long"))).as("k"),
          col("ts"))
        .select(col("doc_id"), col("k").as("chunk_id"),
          slice(col("ts"), (col("k") * 48 + 1).cast("int"), lit(64))
            .as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_chunk_tokens"),
          md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5")),
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        ch AS (SELECT doc_id, k,
            ts[CAST(48 * k + 1 AS BIGINT):CAST(least(48 * k + 64, len(ts))
              AS BIGINT)] AS chunk
          FROM docs, UNNEST(range(0,
            CAST(floor((len(ts) - 1) / 48.0) AS BIGINT) + 1)) AS u(k)
          WHERE len(ts) > 0)
        SELECT doc_id, k AS chunk_id,
          CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
          md5(array_to_string(chunk, ' ')) AS chunk_md5
        FROM ch""")),

    // TF-IDF top terms per document, with an INTEGER-quantized idf
    // (floor(1000*N/df) — transcendental log idf is not cross-engine
    // bit-stable; the integer variant ranks identically for retrieval):
    // two combine-enabled aggregates + a broadcast df join + a rank window
    // BM25 per-doc top terms — tf-idf's production successor: tf saturates
    // (k1) and document length normalizes (b), so a term-stuffed or merely
    // long document stops winning. The idf is in whole bits
    // (bits(N+1) - bits(df) — exact integers, the surprisal discipline);
    // the saturation rational is a FIXED-ORDER IEEE chain whose constants
    // (k1, k1+1, 1-b) are computed once in Scala and injected into the
    // oracle as round-tripping literals, so both engines run the same ops
    // on the same doubles. Same shuffle shape as tfidf: two combine-enabled
    // aggregates + a broadcast df join + per-doc WindowGroupLimit.
    ("q_text_bm25",
      ((s: SparkSession, d: String) => {
        val k1 = Bm25K1; val b = Bm25B
        val k1p1 = Bm25K1p1; val oneMb = Bm25OneMb
        val docs = t(s, d, "documents")
        val toks = docs.select(col("doc_id"),
          TextOps.tokens(col("text")).as("ts"))
        // lazy cut (r13): the tokenized corpus feeds the term explode
        // (read by tf AND df) and the length stats — tokenize once,
        // explode off the cache
        val withLen = toks.select(col("doc_id"), col("ts"),
          size(col("ts")).cast("long").as("len"))
          .localCheckpoint(false)
        val terms = withLen.select(col("doc_id"), col("len"),
          explode(col("ts")).as("term"))
        val tf = terms.groupBy("doc_id", "term", "len")
          .agg(count(lit(1)).as("tf"))
        val df_ = terms.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val stats = withLen.agg(sum(col("len")).as("sl"),
          count(lit(1)).as("nd"))
        val avg = col("sl").cast("double") / col("nd")
        val idfBits = graft.plans.GraftExpressions.bit_length_long(
          col("nd") + 1) -
          graft.plans.GraftExpressions.bit_length_long(col("df"))
        val denom = lit(k1) * (lit(oneMb) +
          lit(b) * (col("len").cast("double") / avg)) + col("tf")
        val score = floor(idfBits.cast("double") * (col("tf") * lit(k1p1)) /
          denom * lit(1e6)) / 1e6
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)
        tf.join(broadcast(df_), Seq("term")).crossJoin(broadcast(stats))
          .withColumn("idf_bits", idfBits)
          .withColumn("score", score)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("idf_bits"),
            col("score"), col("rnk"))
      }): Q,
      Some(s"""WITH toks AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        wl AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS len FROM toks),
        terms AS (SELECT doc_id, len, t AS term
          FROM wl, UNNEST(ts) AS u(t)),
        tf AS (SELECT doc_id, term, len, count(*) AS tf
          FROM terms GROUP BY 1, 2, 3),
        idf AS (SELECT term, count(DISTINCT doc_id) AS df
          FROM terms GROUP BY 1),
        st AS (SELECT CAST(sum(len) AS BIGINT) AS sl, count(*) AS nd
          FROM wl),
        sc AS (SELECT tf.doc_id, tf.term, tf.tf,
            CAST(length(bin(nd + 1)) - length(bin(df)) AS BIGINT)
              AS idf_bits,
            floor(CAST(length(bin(nd + 1)) - length(bin(df)) AS DOUBLE)
              * (tf * $Bm25K1p1)
              / ($Bm25K1 * ($Bm25OneMb +
                  $Bm25B * (len / (CAST(sl AS DOUBLE) / nd))) + tf)
              * 1e6) / 1e6 AS score
          FROM tf JOIN idf USING (term) CROSS JOIN st)
        SELECT doc_id, term, tf, idf_bits, score, rnk FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term ASC) AS rnk
          FROM sc) WHERE rnk <= 5""")),

    // BPE merge training (Bpe.train), oracle-checked: 3 learned merges
    // with the deterministic (total DESC, a, b) argmax. The only corpus
    // pass is the word count; every round runs on the vocabulary, so the
    // iteration cost is corpus-size-independent. The oracle unrolls the
    // rounds and replays the greedy merge as a list fold — the hash-match
    // pins pair counting, tie-breaks, and merge application end to end.
    ("q_text_bpe_train",
      (s: SparkSession, d: String) => {
        import s.implicits._
        // minPairCount = 1: the oracle unrolls exactly 3 rounds, so the
        // engine must not early-stop on a sparse corpus (this corpus has
        // thousands of shared words; the no-pairs-at-all case cannot
        // occur with a non-empty tokenized fixture)
        graft.ops.Bpe.train(t(s, d, "documents"), "text", numMerges = 3,
            minPairCount = 1L)
          .zipWithIndex
          .map { case ((a, b), i) => ((i + 1).toLong, a, b) }
          .toDF("round", "a", "b")
      },
      Some(bpeOracleSql(3))),

    // BPE ENCODING under the learned vocabulary (Bpe.tokenCount): train 3
    // merges, then count each document's subword tokens — the budget
    // currency of every token-count / packing / mixture step downstream.
    // The corpus pass applies merges via a per-partition word cache
    // (Zipf: a few thousand distinct words cover nearly all tokens), so
    // the scan does hash lookups, not re-encodes; the oracle replays the
    // train chain word-identically and joins symbol counts back onto the
    // token stream with multiplicity.
    ("q_text_bpe_encode",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val merges = graft.ops.Bpe.train(docs, "text", numMerges = 3,
          minPairCount = 1L)
        graft.ops.Bpe.tokenCount(docs, "doc_id", "text", merges)
      },
      Some(bpeEncodeOracleSql(3))),

    // Tokenizer fertility by language: BPE tokens per whitespace word —
    // the number that prices a multilingual corpus in MODEL tokens
    // rather than words (fertility >> 1 for scripts the merge table
    // under-serves; the standard input to per-language token budgeting,
    // cf. q_sample_tokenbudget). Same trained merge table and encode
    // pass as q_text_bpe_encode, aggregated to the language dimension —
    // one extra combine-enabled groupBy, nothing corpus-sized beyond
    // the encode itself.
    ("q_text_fertility",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val merges = graft.ops.Bpe.train(docs, "text", numMerges = 3,
          minPairCount = 1L)
        val per = graft.ops.Bpe.tokenCount(docs, "doc_id", "text", merges)
        docs.select(col("doc_id"), col("lang"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_words"))
          .join(per, Seq("doc_id"), "left")
          .groupBy("lang")
          .agg(sum("n_words").as("n_words"),
            sum(coalesce(col("n_bpe_tokens"), lit(0L)))
              .as("n_bpe_tokens"))
          .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
            floor(col("n_bpe_tokens").cast("double") * lit(1e3) /
              greatest(col("n_words"), lit(1L)).cast("double"))
              .cast("long").as("fertility_milli"))
      },
      Some(bpeFertilityOracleSql(3))),

    // Query-time BM25 retrieval — the step q_text_bm25 (weights) and
    // q_text_index (postings) build toward: a fixed 3-term query prunes
    // the term stream BEFORE tf aggregation (the filter rides the explode
    // in the scan stage; df/length stats still come from the full corpus,
    // as BM25 requires), per-(doc,term) micro-scores stay BIGINT so the
    // per-doc sum is exact, and the global top-10 is a TakeOrdered — no
    // corpus window anywhere.
    // First-occurrence 3-gram novelty (TextOps.noveltyProfile): each doc's
    // marginal-content price under id-ordered ingestion — boilerplate
    // scores ~0, fresh text ~1. The per-document complement of the pair
    // -finding dedup families. One explode + min-per-gram (map-side
    // combined) + a fan-out-1 posting join — linear in postings.
    ("q_text_novelty",
      (s: SparkSession, d: String) => TextOps.noveltyProfile(
        t(s, d, "documents"), "doc_id", "text", n = 3),
      Some(s"""WITH ${shingleSql(3)},
          fst AS (SELECT sg, min(doc_id) AS first_doc FROM sh GROUP BY 1),
          j AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
            FROM sh JOIN fst USING (sg) GROUP BY 1)
          SELECT doc_id, n_grams, n_novel,
            CAST(floor(1e6 * CAST(n_novel AS DOUBLE) /
              CAST(n_grams AS DOUBLE)) AS BIGINT) AS novelty_micro
          FROM j""")),

    ("q_text_search", {
      ((s: SparkSession, d: String) => {
        val k1 = Bm25K1; val b = Bm25B
        val k1p1 = Bm25K1p1; val oneMb = Bm25OneMb
        val qterms = Seq("spark", "merge", "window")
        val docs = t(s, d, "documents")
        val toks = docs.select(col("doc_id"),
          TextOps.tokens(col("text")).as("ts"))
        // lazy cut (r13): the tokenized corpus feeds the term explode
        // (read by tf AND df) and the length stats — tokenize once,
        // explode off the cache
        val withLen = toks.select(col("doc_id"), col("ts"),
          size(col("ts")).cast("long").as("len"))
          .localCheckpoint(false)
        val terms = withLen.select(col("doc_id"), col("len"),
          explode(col("ts")).as("term"))
        val tf = terms.filter(col("term").isin(qterms: _*))
          .groupBy("doc_id", "term", "len").agg(count(lit(1)).as("tf"))
        // df of a query term depends only on docs containing it — filter
        // BEFORE the distinct so the df shuffle carries 3 terms' postings,
        // not the whole vocabulary stream
        val df_ = terms.filter(col("term").isin(qterms: _*))
          .select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val stats = withLen.agg(sum(col("len")).as("sl"),
          count(lit(1)).as("nd"))
        val avg = col("sl").cast("double") / col("nd")
        val idfBits = graft.plans.GraftExpressions.bit_length_long(
          col("nd") + 1) -
          graft.plans.GraftExpressions.bit_length_long(col("df"))
        val denom = lit(k1) * (lit(oneMb) +
          lit(b) * (col("len").cast("double") / avg)) + col("tf")
        val scoreMicro = floor(idfBits.cast("double") *
          (col("tf") * lit(k1p1)) / denom * lit(1e6)).cast("long")
        tf.join(broadcast(df_), Seq("term")).crossJoin(broadcast(stats))
          .withColumn("score_micro", scoreMicro)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"),
            sum("score_micro").as("total_micro"))
          .orderBy(col("total_micro").desc, col("doc_id").asc)
          .limit(10)
      }): Q
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        wl AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS len FROM toks),
        terms AS (SELECT doc_id, len, t AS term
          FROM wl, UNNEST(ts) AS u(t)),
        tf AS (SELECT doc_id, term, len, count(*) AS tf FROM terms
          WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2, 3),
        idf AS (SELECT term, count(DISTINCT doc_id) AS df
          FROM terms GROUP BY 1),
        st AS (SELECT CAST(sum(len) AS BIGINT) AS sl, count(*) AS nd
          FROM wl),
        sc AS (SELECT tf.doc_id,
            CAST(floor(CAST(length(bin(nd + 1)) - length(bin(df))
                AS DOUBLE) * (tf * $Bm25K1p1)
              / ($Bm25K1 * ($Bm25OneMb +
                  $Bm25B * (len / (CAST(sl AS DOUBLE) / nd))) + tf)
              * 1e6) AS BIGINT) AS score_micro
          FROM tf JOIN idf USING (term) CROSS JOIN st)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
          CAST(sum(score_micro) AS BIGINT) AS total_micro
        FROM sc GROUP BY doc_id
        ORDER BY total_micro DESC, doc_id ASC LIMIT 10""")),

    // Retrieval-quality eval, self-retrieval protocol over PHRASES:
    // every 100th doc is a probe whose query is its own 3-gram shingle
    // set; the eval asks at which rank idf-weighted phrase retrieval
    // returns the SOURCE doc. Rank 1 is health; a near-dup outranking
    // its source on tie-break is exactly the interference this metric
    // exists to surface. (Bag-of-WORDS self-retrieval was measured
    // first and is structurally uninformative on this corpus — iid
    // vocabulary means any 5 tokens hit thousands of docs at identical
    // tf, burying the source mid-pack; phrases discriminate.) NO
    // corpus-sized sort anywhere: rank = 1 + count(docs strictly
    // ahead), one conditional aggregate per probe against broadcast
    // source scores; the shingle stream is pre-filtered to the probes'
    // bounded query vocabulary before any shuffle.
    ("q_text_retrieval_eval",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        // lazy cuts (r13): sh feeds the probe projection and the postings
        // join (the shingling flatMap re-ran ~5x uncut); pterms feeds the
        // vocab distinct and the scoring broadcast; scored feeds the
        // source-score anchor and the final rank join
        val sh = Dedup.shingleTable(docs, "doc_id", "text", n = 3)
          .localCheckpoint(false)
        val pterms = sh.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("probe_id"), col("shingle"))
          .localCheckpoint(false)
        val vocab = pterms.select("shingle").distinct()
        val postings = sh.join(broadcast(vocab), Seq("shingle"))
          .localCheckpoint(false)
        val df_ = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
        val nDocs = docs.count()
        val scored = postings.join(broadcast(df_), Seq("shingle"))
          .withColumn("w",
            floor(lit(1000.0) * lit(nDocs) / col("df").cast("double"))
              .cast("long"))
          .join(broadcast(pterms), Seq("shingle"))
          .groupBy("probe_id", "doc_id").agg(sum("w").as("score"))
          .localCheckpoint(false)
        val src = scored.filter(col("doc_id") === col("probe_id"))
          .select(col("probe_id"), col("score").as("s_src"))
        scored.join(broadcast(src), Seq("probe_id"))
          .groupBy("probe_id")
          .agg(count(lit(1)).as("n_candidates"),
            (sum(when(col("score") > col("s_src") ||
              (col("score") === col("s_src") &&
                col("doc_id") < col("probe_id")), 1L)
              .otherwise(0L)) + 1).as("rank"))
          .select(col("probe_id"), col("n_candidates"), col("rank"),
            expr("1000000L div rank").as("rr_micro"))
      },
      Some(s"""WITH ${shingleSql(3)},
        pterms AS (SELECT doc_id AS probe_id, sg FROM sh
          WHERE doc_id % 100 = 0),
        vocab AS (SELECT DISTINCT sg FROM pterms),
        postings AS (SELECT doc_id, sg FROM sh
          WHERE sg IN (SELECT sg FROM vocab)),
        idf AS (SELECT sg, count(*) AS df FROM postings GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        sc AS (SELECT probe_id, postings.doc_id,
            CAST(sum(CAST(floor(1000.0 * n.n / df) AS BIGINT))
              AS BIGINT) AS score
          FROM postings JOIN idf USING (sg) JOIN pterms USING (sg)
          CROSS JOIN n GROUP BY 1, 2),
        src AS (SELECT probe_id, score AS s_src FROM sc
          WHERE doc_id = probe_id)
        SELECT sc.probe_id, count(*) AS n_candidates,
          CAST(sum(CASE WHEN score > s_src OR (score = s_src AND
              doc_id < sc.probe_id) THEN 1 ELSE 0 END) + 1 AS BIGINT)
            AS rank,
          1000000 // CAST(sum(CASE WHEN score > s_src OR (score = s_src
              AND doc_id < sc.probe_id) THEN 1 ELSE 0 END) + 1 AS BIGINT)
            AS rr_micro
        FROM sc JOIN src ON sc.probe_id = src.probe_id
        GROUP BY 1""")),

    ("q_text_tfidf",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val nDocs = docs.count()
        // lazy cut (r13): tokenize once; tf and df explode off the cache
        val tokArr = docs.select(col("doc_id"),
          TextOps.tokens(col("text")).as("ts")).localCheckpoint(false)
        val toks = tokArr.select(col("doc_id"),
          explode(col("ts")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df_ = toks.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)
        tf.join(broadcast(df_), Seq("term"))
          .withColumn("score", col("tf") *
            floor(lit(1000.0) * lit(nDocs) / col("df").cast("double"))
              .cast("long"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("score"),
            col("rnk"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, t AS term
            FROM documents, UNNEST(${tokensSql()}) AS u(t)),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        idf AS (SELECT term, count(DISTINCT doc_id) AS df FROM
          (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        sc AS (SELECT tf.doc_id, tf.term, tf.tf,
            tf.tf * CAST(floor(1000.0 * n.n / df) AS BIGINT) AS score
          FROM tf JOIN idf USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, score, rnk FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term ASC) AS rnk
          FROM sc) WHERE rnk <= 5""")),

    // Hashing-trick featurization (Weinberger et al. 2009): token ->
    // md5-hashed dimension in a fixed 256-wide space, the hash's next bit
    // as the ± sign (the collision-debiasing trick), weight = signed
    // occurrence count. The vocabulary-free vectorizer a classifier-based
    // quality filter runs at corpus scale — no vocab build, no driver
    // state, ONE explode + ONE combine-enabled aggregate, output bounded
    // by docs × 256. Deterministic via the catalog's md5 convention, so
    // the oracle replays every collision.
    ("q_text_hashfeat",
      (s: SparkSession, d: String) => {
        t(s, d, "documents").filter(col("doc_id") % 20 === 0)
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .withColumn("h",
            graft.plans.GraftExpressions.md5_prefix60(col("term")))
          .select(col("doc_id"), pmod(col("h"), lit(256L)).as("dim"),
            when(pmod(expr("h DIV 256"), lit(2L)) === 0, 1L)
              .otherwise(-1L).as("sgn"))
          .groupBy("doc_id", "dim").agg(sum("sgn").as("weight"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, t AS term
            FROM documents, UNNEST(${tokensSql()}) AS u(t)
            WHERE doc_id % 20 = 0),
        h AS (SELECT doc_id,
            CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) AS h
          FROM toks)
        SELECT doc_id, h % 256 AS dim,
          CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS weight
        FROM h GROUP BY 1, 2""")),

    // Inverted-index construction (the search/RAG-retrieval build step):
    // rare terms (bounded df) -> their sorted document posting lists.
    // One explode + one combine-enabled groupBy; common terms are gated out
    // by df AFTER aggregation, so the posting-list cell stays bounded the
    // same way jaccardPairs bounds hot shingles.
    ("q_text_index", {
      // df gate RELATIVE to corpus size (<= 80% of docs) so the query does
      // the same work at every SF — an absolute cap goes empty as N grows
      ((s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val maxDf = math.floor(docs.count() * 0.8).toLong
        docs.select(col("doc_id"),
            explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
          .groupBy("term")
          .agg(count(lit(1)).as("df"),
            array_join(transform(array_sort(collect_list(col("doc_id"))),
              _.cast("string")), ",").as("postings"))
          .filter(col("df").between(2, maxDf))
      }): Q
      },
      Some(s"""WITH toks AS (SELECT DISTINCT doc_id, t
          FROM documents, UNNEST(${tokensSql()}) AS u(t))
        SELECT t AS term, count(*) AS df,
          string_agg(doc_id, ',' ORDER BY doc_id) AS postings
        FROM toks GROUP BY 1 HAVING count(*) BETWEEN 2 AND
          floor((SELECT count(*) FROM documents) * 0.8)""")),

    // Bigram language-model counts: conditional probability per bigram,
    // floor-quantized from exact integer counts (the n-gram-LM statistics
    // step; also the base table for perplexity-style quality scoring)
    // Collocation mining by pointwise mutual information, in the same
    // transcendental-free whole-bit form as q_text_surprisal:
    // pmi_bits = bits(n_ab·N) − bits(n_a·n_b) (integer bit lengths — the
    // native codegen'd expression vs DuckDB's bin()), so the association
    // ranking is exact cross-engine. Marginals derive from the DISTINCT
    // bigram table, not the raw stream — one corpus-sized combine-enabled
    // groupBy, then vocabulary-sized joins; N rides as a 1-row broadcast.
    // RAKE keyphrase extraction (TextOps.rakeKeyphrases): stopword-
    // delimited candidate runs, word score deg·1e6 div freq, top phrase
    // per document. Oracle replays tokenization, the gaps-and-islands
    // run grouping, and the integer scoring.
    ("q_text_keyphrase",
      (s: SparkSession, d: String) => TextOps.rakeKeyphrases(
        t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
            unnest(string_split(regexp_replace(lower(text), '[^a-z]+',
              ' ', 'g'), ' ')) AS word,
            generate_subscripts(string_split(regexp_replace(lower(text),
              '[^a-z]+', ' ', 'g'), ' '), 1) AS pos
          FROM documents),
        ns AS (SELECT doc_id, pos, word FROM toks WHERE word <> ''
          AND word NOT IN ('the', 'a', 'an', 'of', 'and', 'to', 'in',
            'is', 'it', 'that')),
        ph AS (SELECT doc_id, pos, word,
            pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
              AS grp
          FROM ns),
        pl AS (SELECT doc_id, grp, count(*) AS plen FROM ph GROUP BY 1, 2),
        occ AS (SELECT ph.doc_id, ph.grp, ph.pos, ph.word, pl.plen
          FROM ph JOIN pl USING (doc_id, grp)),
        ws AS (SELECT doc_id, word,
            CAST(sum(plen) * 1000000 // count(*) AS BIGINT) AS wscore
          FROM occ GROUP BY 1, 2),
        sc AS (SELECT occ.doc_id, occ.grp,
            string_agg(occ.word, ' ' ORDER BY occ.pos) AS phrase,
            CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(ws.wscore) AS BIGINT) AS score_micro
          FROM occ JOIN ws ON ws.doc_id = occ.doc_id
            AND ws.word = occ.word
          GROUP BY 1, 2)
        SELECT doc_id, phrase, n_words, score_micro FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score_micro DESC, phrase ASC) AS b FROM sc)
        WHERE b = 1""")),

    ("q_text_pmi",
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents").select(
          TextOps.tokens(col("text")).as("ts"))
        val bi = toks.select(explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))).as("bigram"))
          .filter(col("bigram").isNotNull)
        // lazy cut (r13): bc feeds na, nb, the total anchor and the final
        // join — one bigram explode+count pass instead of four
        val bc = bi.groupBy("bigram").agg(count(lit(1)).as("n_ab"))
          .withColumn("w1", substring_index(col("bigram"), " ", 1))
          .withColumn("w2", substring_index(col("bigram"), " ", -1))
          .localCheckpoint(false)
        val na = bc.groupBy("w1").agg(sum("n_ab").as("n_a"))
        val nb = bc.groupBy("w2").agg(sum("n_ab").as("n_b"))
        val tot = bc.agg(sum("n_ab").as("nn"))
        val bl = graft.plans.GraftExpressions.bit_length_long _
        bc.join(na, "w1").join(nb, "w2").crossJoin(broadcast(tot))
          .filter(col("n_ab") >= 15)
          .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
            (bl(col("n_ab") * col("nn")) - bl(col("n_a") * col("n_b")))
              .cast("long").as("pmi_bits"))
      },
      Some(s"""WITH docs AS (SELECT ${tokensSql()} AS ts FROM documents),
        bi AS (SELECT ts[i] || ' ' || ts[i + 1] AS bigram,
            ts[i] AS w1, ts[i + 1] AS w2
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        bc AS (SELECT bigram, w1, w2, count(*) AS n_ab FROM bi
          GROUP BY 1, 2, 3),
        na AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n_a FROM bc
          GROUP BY 1),
        nb AS (SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n_b FROM bc
          GROUP BY 1),
        tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS nn FROM bc)
        SELECT bigram, n_ab, n_a, n_b,
          CAST(length(bin(n_ab * nn)) - length(bin(n_a * n_b)) AS BIGINT)
            AS pmi_bits
        FROM bc JOIN na USING (w1) JOIN nb USING (w2), tot
        WHERE n_ab >= 15""")),

    // Vocabulary-richness profile per source: type-token ratio and the
    // hapax-legomenon share (words seen exactly once in that source) —
    // the lexical-diversity fingerprint that separates template/boiler-
    // plate feeds (low TTR, few hapax) from organic text, next to
    // q_text_source_divergence's "which vocabulary" signal. One
    // exploded-token aggregate to the (source x word) table, one
    // source-level rollup.
    ("q_text_hapax",
      (s: SparkSession, d: String) => {
        val sw = t(s, d, "documents").select(col("source"),
            explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("n_sw"))
        sw.groupBy("source")
          .agg(sum("n_sw").as("n_tokens"),
            count(lit(1)).as("vocab_size"),
            sum(when(col("n_sw") === 1, 1L).otherwise(0L)).as("n_hapax"))
          .select(col("source"), col("n_tokens"), col("vocab_size"),
            col("n_hapax"),
            floor(col("vocab_size").cast("double") * lit(1e3) /
              col("n_tokens").cast("double")).cast("long")
              .as("ttr_milli"),
            floor(col("n_hapax").cast("double") * lit(1e3) /
              col("vocab_size").cast("double")).cast("long")
              .as("hapax_milli"))
      },
      Some(s"""WITH sw AS (SELECT source, t AS w, count(*) AS n_sw
          FROM (SELECT source, ${tokensSql()} AS ts FROM documents),
            UNNEST(ts) AS u(t)
          GROUP BY 1, 2),
        a AS (SELECT source, CAST(sum(n_sw) AS BIGINT) AS n_tokens,
            count(*) AS vocab_size,
            CAST(sum(CASE WHEN n_sw = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_hapax
          FROM sw GROUP BY 1)
        SELECT source, n_tokens, vocab_size, n_hapax,
          CAST(floor(CAST(vocab_size AS DOUBLE) * 1e3
            / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS ttr_milli,
          CAST(floor(CAST(n_hapax AS DOUBLE) * 1e3
            / CAST(vocab_size AS DOUBLE)) AS BIGINT) AS hapax_milli
        FROM a""")),

    // Bigram language-model scoring with backoff, whole-bit form: the LM
    // trains on the even-doc_id half (bigram + unigram counts) and
    // scores EVERY document — bits(w2|w1) = bitlen(n_w1) - bitlen(n_w1w2)
    // when the bigram was seen, else backoff to the unigram tail
    // bitlen(N) - bitlen(n_w2 + 1) plus a 4-bit penalty. The
    // train/score split is what makes this the real LM-quality gate
    // (scoring a corpus against ITS OWN counts can never see an unseen
    // bigram); held-out docs exercise the backoff path. All BIGINT —
    // counts, bit lengths, per-doc sums; one exploded-bigram scan
    // joined against the two vocabulary-bounded count tables.
    ("q_text_lm_score",
      (s: SparkSession, d: String) => {
        val bl = graft.plans.GraftExpressions.bit_length_long _
        val docs = t(s, d, "documents")
        def bigrams(df: DataFrame) = df.select(col("doc_id"),
            TextOps.tokens(col("text")).as("ts"))
          .select(col("doc_id"), explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull,
              struct(a.as("w1"), b.as("w2"))))).as("s"))
          .filter(col("s").isNotNull)
          .select(col("doc_id"), col("s.w1").as("w1"),
            col("s.w2").as("w2"))
        val ref = docs.filter(col("doc_id") % 2 === 0)
        val bc = bigrams(ref).groupBy("w1", "w2")
          .agg(count(lit(1)).as("n12"))
        // lazy cut (r13): uc feeds the total anchor and both unigram join
        // arms — one train tokenize+count pass instead of three
        val uc = ref.select(explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n1"))
          .localCheckpoint(false)
        val nTot = uc.agg(sum("n1").as("nn"))
        val scoredRows = bigrams(docs)
          .join(bc, Seq("w1", "w2"), "left")
          .join(uc.select(col("w").as("w1"), col("n1").as("n_a")),
            Seq("w1"), "left")
          .join(uc.select(col("w").as("w2"), col("n1").as("n_b")),
            Seq("w2"), "left")
          .crossJoin(broadcast(nTot))
          .select(col("doc_id"),
            when(coalesce(col("n12"), lit(0L)) > 0,
              bl(col("n_a")) - bl(col("n12")))
              .otherwise(bl(col("nn")) -
                bl(coalesce(col("n_b"), lit(0L)) + 1) + 4)
              .cast("long").as("bits"))
        val per = scoredRows.groupBy("doc_id")
          .agg(sum("bits").as("bits_total"),
            count(lit(1)).as("n_bigrams"))
        docs.select("doc_id").join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("bits_total"), lit(0L)).as("bits_total"))
          .withColumn("bits_per_bigram_milli",
            expr("bits_total * 1000L div greatest(n_bigrams, 1L)"))
      },
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        bi AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        refbi AS (SELECT w1, w2, count(*) AS n12 FROM bi
          WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        refuni AS (SELECT t AS w, count(*) AS n1
          FROM docs, UNNEST(ts) AS u(t) WHERE doc_id % 2 = 0 GROUP BY 1),
        tot AS (SELECT CAST(sum(n1) AS BIGINT) AS nn FROM refuni),
        rows_ AS (SELECT bi.doc_id,
            CASE WHEN COALESCE(n12, 0) > 0
              THEN CAST(length(bin(a.n1)) - length(bin(n12)) AS BIGINT)
              ELSE CAST(length(bin(nn)) -
                length(bin(COALESCE(b.n1, 0) + 1)) + 4 AS BIGINT)
            END AS bits
          FROM bi
          LEFT JOIN refbi ON bi.w1 = refbi.w1 AND bi.w2 = refbi.w2
          LEFT JOIN refuni a ON bi.w1 = a.w
          LEFT JOIN refuni b ON bi.w2 = b.w, tot),
        per AS (SELECT doc_id, CAST(sum(bits) AS BIGINT) AS bits_total,
            count(*) AS n_bigrams FROM rows_ GROUP BY 1)
        SELECT d.doc_id,
          COALESCE(per.n_bigrams, 0) AS n_bigrams,
          COALESCE(per.bits_total, 0) AS bits_total,
          COALESCE(per.bits_total, 0) * 1000
            // greatest(COALESCE(per.n_bigrams, 0), 1)
            AS bits_per_bigram_milli
        FROM documents d LEFT JOIN per USING (doc_id)""")),

    // Per-source vocabulary divergence, whole-bit form (the
    // transcendental-free discipline of q_text_pmi / q_profile_mi): for
    // every (source, word) cell, pointwise information in whole bits =
    // bitlen(n_sw·N) - bitlen(n_s·n_w); a source's divergence is its
    // token-weighted bit total, normalized per kilotoken. The corpus
    // audit that flags WHICH ingest feed drifted off-vocabulary — all
    // BIGINT (counts, bit lengths, floor division), one exploded-token
    // aggregate plus three vocabulary/source-bounded joins.
    ("q_text_source_divergence",
      (s: SparkSession, d: String) => {
        val bl = graft.plans.GraftExpressions.bit_length_long _
        val tok = t(s, d, "documents").select(col("source"),
          explode(TextOps.tokens(col("text"))).as("w"))
        val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("n_sw"))
        val wt = sw.groupBy("w").agg(sum("n_sw").as("n_w"))
        val st = sw.groupBy("source").agg(sum("n_sw").as("n_s"))
        val tot = sw.agg(sum("n_sw").as("nn"))
        sw.join(wt, "w").join(broadcast(st), "source")
          .crossJoin(broadcast(tot))
          .select(col("source"), col("n_s"), col("n_sw"),
            ((bl(col("n_sw") * col("nn")) -
              bl(col("n_s") * col("n_w"))).cast("long") * col("n_sw"))
              .as("wbits"))
          .groupBy("source")
          .agg(first(col("n_s")).as("n_tokens"),
            sum("wbits").as("bits_total"))
          .select(col("source"), col("n_tokens"), col("bits_total"),
            // double floor, not integer div: bits_total may be negative
            // and trunc-vs-floor semantics would diverge across engines
            floor(col("bits_total").cast("double") * lit(1e3) /
              col("n_tokens").cast("double")).cast("long")
              .as("bits_per_kilotoken"))
      },
      Some(s"""WITH tok AS (SELECT source, t AS w
          FROM (SELECT source, ${tokensSql()} AS ts FROM documents),
            UNNEST(ts) AS u(t)),
        sw AS (SELECT source, w, count(*) AS n_sw FROM tok GROUP BY 1, 2),
        wt AS (SELECT w, CAST(sum(n_sw) AS BIGINT) AS n_w
          FROM sw GROUP BY 1),
        st AS (SELECT source, CAST(sum(n_sw) AS BIGINT) AS n_s
          FROM sw GROUP BY 1),
        tot AS (SELECT CAST(sum(n_sw) AS BIGINT) AS nn FROM sw),
        cells AS (SELECT sw.source, n_s,
            CAST(length(bin(n_sw * nn)) - length(bin(n_s * n_w))
              AS BIGINT) * n_sw AS wbits
          FROM sw JOIN wt USING (w) JOIN st USING (source), tot)
        SELECT source, any_value(n_s) AS n_tokens,
          CAST(sum(wbits) AS BIGINT) AS bits_total,
          CAST(floor(CAST(CAST(sum(wbits) AS BIGINT) AS DOUBLE) * 1e3
            / CAST(any_value(n_s) AS DOUBLE)) AS BIGINT)
            AS bits_per_kilotoken
        FROM cells GROUP BY 1""")),

    // Skip-gram (center, context) pair extraction, window = 2, both
    // directions — the training-pair generator for word/embedding models
    // (word2vec's data layer) as a corpus operator. Pure scan-stage
    // array work: per document, zip the token array against its k-shifted
    // tails (k = 1, 2) and their mirrors, explode, and let ONE
    // combine-enabled groupBy count pairs — only distinct pairs reach
    // the shuffle, so the 4x-per-token fan-out never leaves the map side.
    ("q_text_skipgram",
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents").select(
          TextOps.tokens(col("text")).as("ts"))
        def sh(k: Int) =
          slice(col("ts"), lit(k + 1), size(col("ts")))
        def fwd(k: Int) = zip_with(col("ts"), sh(k),
          (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))
        def rev(k: Int) = zip_with(col("ts"), sh(k),
          (a, b) => when(b.isNotNull, concat_ws(" ", b, a)))
        toks.select(explode(concat(fwd(1), fwd(2), rev(1), rev(2)))
            .as("pair"))
          .filter(col("pair").isNotNull)
          .groupBy("pair").agg(count(lit(1)).as("n"))
          .filter(col("n") >= 25)
          .select(substring_index(col("pair"), " ", 1).as("center"),
            substring_index(col("pair"), " ", -1).as("context"),
            col("n"))
      },
      Some(s"""WITH docs AS (SELECT ${tokensSql()} AS ts FROM documents),
        f AS (SELECT ts[i] AS c, ts[i + k] AS x
          FROM docs,
            UNNEST(range(1, len(ts) + 1)) AS u(i),
            UNNEST([1, 2]) AS o(k)
          WHERE i + k <= len(ts)),
        b AS (SELECT c, x FROM f UNION ALL SELECT x, c FROM f)
        SELECT c AS center, x AS context, count(*) AS n
        FROM b GROUP BY 1, 2 HAVING count(*) >= 25""")),

    ("q_text_bigrams",
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents").select(
          TextOps.tokens(col("text")).as("ts"))
        // zip with the tail; the final (last, null) pair maps to null and
        // is filtered — the HOF lambda runs interpreted, acceptable here
        // because the exploded bigrams hit a combine-enabled groupBy
        // immediately (only distinct bigrams reach the shuffle)
        val bi = toks.select(explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))).as("bigram"))
          .filter(col("bigram").isNotNull)
          .groupBy("bigram").agg(count(lit(1)).as("n"))
        val uni = toks.select(explode(col("ts")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n_first"))
        bi.withColumn("w1", substring_index(col("bigram"), " ", 1))
          .join(uni, col("w1") === col("w"))
          .filter(col("n") >= 20)
          .select(col("bigram"), col("n"),
            (floor(col("n").cast("double") / col("n_first").cast("double")
              * 1e6) / 1e6).as("p_cond"))
      },
      Some(s"""WITH docs AS (SELECT ${tokensSql()} AS ts FROM documents),
        bi AS (SELECT ts[i] || ' ' || ts[i + 1] AS bigram, ts[i] AS w1
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        bc AS (SELECT bigram, w1, count(*) AS n FROM bi GROUP BY 1, 2),
        uni AS (SELECT t AS w, count(*) AS n_first
          FROM docs, UNNEST(ts) AS u(t) GROUP BY 1)
        SELECT bigram, n,
          floor(CAST(n AS DOUBLE) / CAST(n_first AS DOUBLE) * 1e6) / 1e6
            AS p_cond
        FROM bc JOIN uni ON w1 = uni.w WHERE n >= 20""")),

    // C4/RefinedWeb-style boilerplate removal: 4-token tiles shared by >= 2
    // document-positions are cut corpus-wide, docs reassembled in order
    // (TextOps.removeRepeatedSpans).
    ("q_text_spandedup",
      (s: SparkSession, d: String) => TextOps.removeRepeatedSpans(
        t(s, d, "documents"), "doc_id", "text", n = 4, minDf = 2),
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql("coalesce(text,'')")}
            AS toks FROM documents),
        tiles AS (SELECT doc_id, CAST(i AS INTEGER) AS idx,
            array_to_string(toks[i:i+3], ' ') AS tile
          FROM docs, UNNEST(CASE WHEN len(toks) = 0 THEN [CAST(1 AS BIGINT)]
            ELSE range(1, len(toks) + 1, 4) END) AS u(i)),
        hot AS (SELECT tile FROM tiles GROUP BY 1 HAVING count(*) >= 2),
        kept AS (SELECT * FROM tiles
          WHERE tile NOT IN (SELECT tile FROM hot)),
        totals AS (SELECT doc_id, count(*) AS n_tiles FROM tiles GROUP BY 1),
        ka AS (SELECT doc_id, count(*) AS n_kept,
            string_agg(tile, ' ' ORDER BY idx) AS clean_text
          FROM kept GROUP BY 1)
        SELECT t.doc_id, coalesce(ka.clean_text, '') AS clean_text,
          t.n_tiles, t.n_tiles - coalesce(ka.n_kept, 0) AS n_removed
        FROM totals t LEFT JOIN ka USING (doc_id)""")),

    // Winnowing fingerprint selection (Schleimer et al. SIGMOD'03): the
    // guaranteed-density local fingerprint set — min 4-gram hash per
    // 4-window, rightmost on ties. One doc-bounded window pass; the
    // per-doc distinct reuses its partitioning (PlanShapeSpec pins the
    // single exchange). Oracle replays windows as a pos-range join.
    ("q_text_winnow",
      (s: SparkSession, d: String) => TextOps.winnow(
        t(s, d, "documents"), "doc_id", "text", k = 4, w = 4),
      Some(s"""WITH ${winnowCtes()}
        SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, h FROM sel""")),

    // Per-source boilerplate removal (RefinedWeb's repeated-span gate
    // scoped to the document's source/domain): an 8-token tile in >=
    // max(2, 25% of the source's docs) distinct docs OF THAT SOURCE is
    // cut everywhere in the source. TextOps.boilerplateClean.
    ("q_text_boilerplate",
      (s: SparkSession, d: String) => TextOps.boilerplateClean(
        t(s, d, "documents"), "doc_id", "source", "text",
        n = 8, minFrac = 0.25, minDf = 2),
      Some(s"""WITH base AS (SELECT doc_id, source,
            ${tokensSql("coalesce(text, '')")} AS tk FROM documents),
        tl AS MATERIALIZED (SELECT doc_id, source, CAST(i AS INT) AS idx,
            CASE WHEN len(tk) = 0 THEN ''
                 ELSE array_to_string(tk[i*8+1:i*8+8], ' ') END AS tile
          FROM base, UNNEST(range(0,
            greatest(CAST(ceil(len(tk) / 8.0) AS BIGINT), 1))) AS u(i)),
        nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        bo AS (SELECT source, tile FROM (
            SELECT source, tile, count(DISTINCT doc_id) AS df
            FROM tl GROUP BY 1, 2) f JOIN nd USING (source)
          WHERE df >= greatest(2, CAST(ceil(0.25 * n_docs) AS BIGINT))),
        mk AS (SELECT tl.doc_id, any_value(tl.source) AS source,
            count(*) AS n_tiles,
            count(bo.tile) AS n_removed,
            coalesce(string_agg(CASE WHEN bo.tile IS NULL THEN tl.tile END,
              ' ' ORDER BY tl.idx), '') AS clean_text
          FROM tl LEFT JOIN bo ON tl.source = bo.source AND tl.tile = bo.tile
          GROUP BY 1)
        SELECT doc_id, source, clean_text, n_tiles, n_removed FROM mk""")),

    // EXACT heavy hitters without the full-vocabulary shuffle: one
    // Misra-Gries pass (bounded k-entry state, map-side combined) yields a
    // guaranteed candidate superset; a broadcast-semi-join second pass
    // re-counts only candidates and filters on the exact integer support
    // threshold. k=799 < the bigram vocabulary (~920), so the summary runs
    // under real decrement pressure — and the final answer is still
    // bit-equal to the naive GROUP BY HAVING the oracle runs, because the
    // MG error bound N/(k+1) < N/support. See TextOps.heavyHitters.
    ("q_text_heavyhitters",
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents").select(
          TextOps.tokens(col("text")).as("ts"))
        val bg = toks.select(explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))).as("bigram"))
          .filter(col("bigram").isNotNull)
        TextOps.heavyHitters(bg, "bigram", k = 799, support = 800)
      },
      Some(s"""WITH docs AS (SELECT ${tokensSql()} AS ts FROM documents),
        bg AS (SELECT ts[i] || ' ' || ts[i + 1] AS bigram
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        tot AS (SELECT count(*) AS n FROM bg)
        SELECT bigram, CAST(count(*) AS BIGINT) AS n_exact
        FROM bg, tot GROUP BY bigram, tot.n
        HAVING count(*) * 800 > tot.n""")),

    // Per-group exact heavy hitters (per-language hot bigrams): the MG
    // summary and support test scoped per lang — pass-1 state <= k entries
    // per (lang, partition), candidates re-counted through a (lang, item)
    // equi-join. k=699 < each lang's bigram vocabulary, so every group's
    // summary runs under decrement pressure; answers still exactly equal
    // the per-group GROUP BY HAVING.
    ("q_text_heavyhitters_by",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").select(col("lang"),
          TextOps.tokens(col("text")).as("ts"))
        val bg = docs.select(col("lang"), explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))).as("bigram"))
          .filter(col("bigram").isNotNull)
        TextOps.heavyHittersBy(bg, "lang", "bigram", k = 699, support = 700)
      },
      Some(s"""WITH docs AS (SELECT lang, ${tokensSql()} AS ts
            FROM documents),
        bg AS (SELECT lang, ts[i] || ' ' || ts[i + 1] AS bigram
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        tot AS (SELECT lang, count(*) AS n FROM bg GROUP BY 1)
        SELECT bg.lang, bigram, CAST(count(*) AS BIGINT) AS n_exact
        FROM bg JOIN tot ON bg.lang = tot.lang
        GROUP BY bg.lang, bigram, tot.n
        HAVING count(*) * 700 > tot.n""")),

    // Model-based quality filtering (CCNet / GPT-3 curation): linear
    // classifier over hashed bag-of-words features as a pure scan-stage
    // fold — no shuffle, no UDF, margin in exact BIGINT (md5-derived
    // stand-in weights; production broadcasts a trained vector keyed by
    // the same 60-bit hash). See TextOps.classifierColumns.
    ("q_text_classifier",
      (s: SparkSession, d: String) => {
        val cols = TextOps.classifierColumns(col("text"))
        t(s, d, "documents").select(
          col("doc_id") +:
          cols.map { case (n, c) =>
            (if (n == "keep") c.cast("long") else c).as(n) }: _*)
      },
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        m AS (SELECT doc_id,
            CAST(coalesce(list_sum(list_transform(ts,
              t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
                % 2001 - 1000)), 0) AS BIGINT) AS margin,
            CAST(len(ts) AS BIGINT) AS n_toks
          FROM docs)
        SELECT doc_id, margin, n_toks,
          CAST(CASE WHEN margin > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM m""")),

    // Content-defined chunking (LBFS/FastCDC on tokens): boundaries where
    // the 4-gram hash ≡ 0 mod 16, so chunk hashes survive insertions —
    // the incremental / offset-invariant dedup property fixed-stride tiles
    // lack. One scan-stage projection+explode builds the chunk table; the
    // cross-doc df groupBy+join shares the chunk_hash partitioning. Oracle
    // replays the full list pipeline (cuts, bounds, reassembly, md5).
    ("q_text_cdc",
      (s: SparkSession, d: String) => {
        val ch = TextOps.cdcChunks(t(s, d, "documents"), "doc_id", "text",
          w = 4, divisor = 16)
        val dfc = ch.groupBy("chunk_hash")
          .agg(countDistinct(col("doc_id")).as("df"))
        ch.join(dfc, Seq("chunk_hash"))
          .select(col("doc_id"), col("chunk_idx"), col("n_toks_chunk"),
            col("chunk_hash"), col("df"))
      },
      Some(s"""WITH ${cdcChiCtes()},
        dfc AS (SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT)
            AS df FROM chi GROUP BY 1)
        SELECT doc_id, chunk_idx, n_toks_chunk, chunk_hash, df
        FROM chi JOIN dfc USING (chunk_hash)""")),

    // Chunk-level storage dedup (the dedup-filesystem accounting view of
    // cdcChunks): every chunk CONTENT is stored once, owned by its
    // globally-first occurrence (min (doc_id, chunk_idx) — a total order,
    // deterministic under ties); per document, how many of its tokens it
    // actually stores vs references. One chunk_hash groupBy (combinable
    // min-struct) + one join back — no windows over the corpus stream.
    ("q_text_chunk_dedup",
      (s: SparkSession, d: String) => {
        // lazy cut (r13): the CDC chunk table feeds the owner argmin AND
        // the ownership join — one chunking flatMap pass instead of two
        val ch = TextOps.cdcChunks(t(s, d, "documents"), "doc_id", "text",
            w = 4, divisor = 16)
          .select("doc_id", "chunk_idx", "n_toks_chunk", "chunk_hash")
          .localCheckpoint(false)
        val owner = ch.groupBy("chunk_hash")
          .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("own"))
          .select(col("chunk_hash"), col("own.doc_id").as("o_doc"),
            col("own.chunk_idx").as("o_idx"))
        ch.join(owner, Seq("chunk_hash"))
          .withColumn("stored_toks",
            when(col("doc_id") === col("o_doc") &&
              col("chunk_idx") === col("o_idx"), col("n_toks_chunk"))
              .otherwise(0L))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum("n_toks_chunk").as("n_toks"),
            sum("stored_toks").as("n_toks_stored"))
          .withColumn("stored_frac",
            floor(lit(1e6) * col("n_toks_stored").cast("double") /
              col("n_toks").cast("double")) / lit(1e6))
      },
      Some(s"""WITH ${cdcChiCtes()},
        o1 AS (SELECT chunk_hash, min(doc_id) AS o_doc
          FROM chi GROUP BY 1),
        own AS (SELECT chi.chunk_hash, o_doc, min(chunk_idx) AS o_idx
          FROM chi JOIN o1 ON chi.chunk_hash = o1.chunk_hash
            AND chi.doc_id = o1.o_doc
          GROUP BY 1, 2)
        SELECT chi.doc_id, count(*) AS n_chunks,
          CAST(sum(n_toks_chunk) AS BIGINT) AS n_toks,
          CAST(sum(CASE WHEN chi.doc_id = o_doc AND chunk_idx = o_idx
            THEN n_toks_chunk ELSE 0 END) AS BIGINT) AS n_toks_stored,
          floor(1e6 * CAST(sum(CASE WHEN chi.doc_id = o_doc
              AND chunk_idx = o_idx THEN n_toks_chunk ELSE 0 END)
              AS DOUBLE) /
            CAST(sum(n_toks_chunk) AS DOUBLE)) / 1e6 AS stored_frac
        FROM chi JOIN own USING (chunk_hash) GROUP BY 1""")),

    // Categorized blocklist gate (TextOps.blocklistAudit) — the wordlist
    // filter every web-corpus build runs (C4's banned-word page drop,
    // category-tagged production lists). The list rides a BROADCAST join
    // against the scan-stage token explode (never an or-chain expression:
    // right for 10 terms, unviable for 10^6), hits aggregate per
    // (doc, category) then per doc — both combine-enabled, doc-bounded
    // fan-out; blocked = exact integer cross-multiplication of the
    // hits-per-million-tokens threshold. Dominant category deterministic
    // via min(-hits, category). Oracle replays the join + both rollups
    // (window form for the arg-min) over the same VALUES list.
    // Kneser-Ney smoothed bigram LM (Kneser & Ney 1995; the Chen-Goodman
    // 1999 standard), EXACT-RATIONAL form: with discount D = 3/4 every
    // probability is an integer ratio after scaling counts by 4 —
    //   P_KN(w2|w1) = [max(4·c12−3, 0)·Nbb + 3·N1(w1•)·N1(•w2)]
    //                 / (4·c(w1)·Nbb)
    // where N1 are the continuation-type counts and Nbb the distinct
    // bigram types. Unlike q_text_lm_score's whole-bit backoff, the KN
    // score is fine-grained ppm; same train/score discipline (train on
    // even doc_ids, score everything, so held-out docs exercise the
    // continuation backoff and the unseen-context floor). All count
    // tables are vocabulary-bounded; one exploded-bigram scan. The
    // 1e6·num product stays under 2^53 at catalog scales — stage
    // through DECIMAL past ~1e9 bigram types (the CUPED rule).
    ("q_text_kneser_ney",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        def bigrams(df: DataFrame) = df.select(col("doc_id"),
            TextOps.tokens(col("text")).as("ts"))
          .select(col("doc_id"), explode(zip_with(col("ts"),
            slice(col("ts"), lit(2), size(col("ts"))),
            (a, b) => when(b.isNotNull,
              struct(a.as("w1"), b.as("w2"))))).as("s"))
          .filter(col("s").isNotNull)
          .select(col("doc_id"), col("s.w1").as("w1"),
            col("s.w2").as("w2"))
        // lazy cut (r13): bc feeds ctx, cont, the nbb anchor and the
        // scoring join — one train bigram pass instead of four
        val bc = bigrams(docs.filter(col("doc_id") % 2 === 0))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
          .localCheckpoint(false)
        val ctx = bc.groupBy("w1")
          .agg(sum("n12").as("c1"), count(lit(1)).as("n1fw"))
        val cont = bc.groupBy("w2").agg(count(lit(1)).as("n1bw"))
        val nbb = bc.agg(count(lit(1)).as("nbb"))
        val scored = bigrams(docs)
          .join(bc, Seq("w1", "w2"), "left")
          .join(ctx, Seq("w1"), "left")
          .join(cont, Seq("w2"), "left")
          .crossJoin(broadcast(nbb))
          .select(col("doc_id"),
            when(col("c1").isNotNull, floor(lit(1e6) *
              (greatest(lit(4L) * coalesce(col("n12"), lit(0L)) -
                  lit(3L), lit(0L)) * col("nbb") +
                lit(3L) * col("n1fw") * coalesce(col("n1bw"), lit(0L)))
                .cast("double") /
              expr("cast(nullif(4 * c1 * nbb, 0) as double)")))
              .otherwise(floor(lit(1e6) *
                coalesce(col("n1bw"), lit(0L)).cast("double") /
                expr("cast(nullif(nbb, 0) as double)")))
              .cast("long").as("p_ppm"),
            when(coalesce(col("n12"), lit(0L)) > 0, 1L).otherwise(0L)
              .as("seen"),
            when(col("c1").isNull, 1L).otherwise(0L).as("no_ctx"))
        val per = scored.groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("seen").as("n_seen"),
            sum("no_ctx").as("n_unseen_ctx"), sum("p_ppm").as("sum_p_ppm"))
        docs.select("doc_id").join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("n_seen"), lit(0L)).as("n_seen"),
            coalesce(col("n_unseen_ctx"), lit(0L)).as("n_unseen_ctx"),
            coalesce(col("sum_p_ppm"), lit(0L)).as("sum_p_ppm"))
          .withColumn("avg_p_ppm",
            expr("sum_p_ppm div greatest(n_bigrams, 1L)"))
      },
      Some(s"""WITH docs AS (SELECT doc_id, ${tokensSql()} AS ts
            FROM documents),
        bi AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          FROM docs, UNNEST(range(1, len(ts))) AS u(i)),
        bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bi
          WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS c1,
            CAST(count(*) AS BIGINT) AS n1fw FROM bc GROUP BY 1),
        cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1bw
          FROM bc GROUP BY 1),
        nbb AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM bc),
        sc AS (SELECT bi.doc_id,
            CASE WHEN ctx.c1 IS NOT NULL
              THEN CAST(floor(1e6 * CAST(
                greatest(4 * COALESCE(bc.n12, 0) - 3, 0) * nbb +
                  3 * ctx.n1fw * COALESCE(cont.n1bw, 0) AS DOUBLE) /
                CAST(nullif(4 * ctx.c1 * nbb, 0) AS DOUBLE)) AS BIGINT)
              ELSE CAST(floor(1e6 * CAST(COALESCE(cont.n1bw, 0)
                AS DOUBLE) / CAST(nullif(nbb, 0) AS DOUBLE)) AS BIGINT)
            END AS p_ppm,
            CASE WHEN COALESCE(bc.n12, 0) > 0 THEN 1 ELSE 0 END AS seen,
            CASE WHEN ctx.c1 IS NULL THEN 1 ELSE 0 END AS no_ctx
          FROM bi
          LEFT JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
          LEFT JOIN ctx ON bi.w1 = ctx.w1
          LEFT JOIN cont ON bi.w2 = cont.w2, nbb),
        per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
            CAST(sum(seen) AS BIGINT) AS n_seen,
            CAST(sum(no_ctx) AS BIGINT) AS n_unseen_ctx,
            CAST(sum(p_ppm) AS BIGINT) AS sum_p_ppm
          FROM sc GROUP BY 1)
        SELECT d.doc_id,
          COALESCE(per.n_bigrams, 0) AS n_bigrams,
          COALESCE(per.n_seen, 0) AS n_seen,
          COALESCE(per.n_unseen_ctx, 0) AS n_unseen_ctx,
          COALESCE(per.sum_p_ppm, 0) AS sum_p_ppm,
          COALESCE(per.sum_p_ppm, 0)
            // greatest(COALESCE(per.n_bigrams, 0), 1) AS avg_p_ppm
        FROM documents d LEFT JOIN per USING (doc_id)""")),

    ("q_text_blocklist",
      (s: SparkSession, d: String) => TextOps.blocklistAudit(
        t(s, d, "documents").filter(col("text").isNotNull),
        "doc_id", "text", BlocklistFixture, maxHitsPerMTokens = 200000L),
      Some(s"""WITH base AS (SELECT doc_id, ${tokensSql()} AS tk
            FROM documents WHERE text IS NOT NULL),
          bl(term, category) AS (VALUES ${blocklistValuesSql}),
          h AS (SELECT doc_id, category, count(*) AS hits
            FROM base, UNNEST(tk) AS u(term)
            JOIN bl ON u.term = bl.term
            GROUP BY 1, 2),
          p1 AS (SELECT doc_id, category, hits,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY hits DESC, category) AS rn,
              sum(hits) OVER (PARTITION BY doc_id) AS n_hits,
              count(*) OVER (PARTITION BY doc_id) AS n_categories
            FROM h),
          p AS (SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
              CAST(n_categories AS BIGINT) AS n_categories,
              category AS top_category
            FROM p1 WHERE rn = 1)
          SELECT b.doc_id, CAST(len(b.tk) AS BIGINT) AS n_tokens,
            coalesce(p.n_hits, 0) AS n_hits,
            coalesce(p.n_categories, 0) AS n_categories,
            coalesce(p.top_category, '') AS top_category,
            CAST(coalesce(p.n_hits, 0) * 1000000 >
              200000 * len(b.tk) AS BIGINT) AS blocked
          FROM base b LEFT JOIN p USING (doc_id)""")))

  /** Fixture blocklist over the synthetic documents' vocabulary —
    * categorized like a production wordlist; terms chosen so some docs
    * cross the 20%-of-tokens (median) threshold and most don't. NB: def, not val —
    * referenced from the earlier-initializing `entries` (see the
    * object-init-order note on [[Shared.quantSql]]). */
  private[graft] def BlocklistFixture: Seq[(String, String)] = Seq(
    "spark" -> "brand", "hash" -> "crypto", "merge" -> "ops",
    "scan" -> "ops", "window" -> "ui", "batch" -> "ops")

  private[graft] def blocklistValuesSql: String =
    BlocklistFixture.map { case (tm, c) => s"('$tm', '$c')" }.mkString(", ")


  // =============================================================== dedup

  /** Shared SQL: distinct (doc_id, shingle) posting list, n-word shingles.
    * `where` filters the source rows; CTE names are parameterized so two
    * posting lists (corpus + benchmark) can coexist in one oracle. */
  // MATERIALIZED: the shingle set is referenced by several downstream CTEs
  // (signatures, sizes, intersections) — an inlining planner re-tokenizes
  // the whole corpus per reference, which is the multi-GB / tens-of-seconds
  // pattern that starved the round-3 oracle runner (see kmeansCtes note).
  private[graft] def shingleSqlFor(n: Int, where: String, docsCte: String,
      shCte: String): String = {
    val joinExpr = (0 until n).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""$docsCte AS MATERIALIZED (SELECT doc_id, ${tokensSql()} AS toks
        FROM documents $where),
      $shCte AS MATERIALIZED (SELECT DISTINCT doc_id, sg FROM $docsCte, UNNEST(
        CASE WHEN len(toks) >= $n
             THEN list_transform(range(1, len(toks) - ${n - 2}),
                    i -> $joinExpr)
             ELSE [array_to_string(toks, ' ')] END) AS u(sg))"""
  }

  private[graft] def shingleSql(n: Int): String = shingleSqlFor(n, "", "docs", "sh")

  /** CDC chunk-hash CTEs (w=4, divisor=16 — must match the catalog's
    * cdcChunks calls), ending in `${p}ch` (doc_id, chunk_hash with
    * multiplicity). Prefix-parameterized so corpus and increment chunkings
    * coexist in one oracle. */
  private[graft] def cdcHashCtes(where: String, p: String): String =
    s"""${p}docs AS (SELECT doc_id, ${tokensSql()} AS tk
          FROM documents $where),
      ${p}c AS (SELECT doc_id, tk, len(tk) AS n,
          CASE WHEN len(tk) >= 4 THEN list_filter(range(4, len(tk) + 1),
            i -> (CAST(concat('0x', substr(md5(
              array_to_string(tk[i-3:i], ' ')), 1, 15)) AS BIGINT)
              % 16) = 0)
          ELSE [] END AS cuts
        FROM ${p}docs),
      ${p}b AS (SELECT doc_id, tk, list_concat(list_concat(
          [CAST(0 AS BIGINT)], cuts), [CAST(n AS BIGINT)]) AS bounds
        FROM ${p}c),
      ${p}ch AS (SELECT doc_id,
          md5(array_to_string(tk[bounds[j]+1:bounds[j+1]], ' '))
            AS chunk_hash
        FROM ${p}b, UNNEST(range(1, len(bounds))) AS u(j)
        WHERE bounds[j+1] > bounds[j])"""

  /** CDC chunk CTEs ending in `chi` (doc_id, chunk_idx, n_toks_chunk,
    * chunk_hash) — the full replay of [[graft.ops.TextOps.cdcChunks]]
    * (w=4, divisor=16 — must match the catalog's calls), shared by
    * q_text_cdc and q_text_chunk_dedup. */
  private[graft] def cdcChiCtes(): String =
    s"""docs AS (SELECT doc_id, ${tokensSql()} AS tk
            FROM documents),
        c AS (SELECT doc_id, tk, len(tk) AS n,
            CASE WHEN len(tk) >= 4 THEN list_filter(range(4, len(tk) + 1),
              i -> (CAST(concat('0x', substr(md5(
                array_to_string(tk[i-3:i], ' ')), 1, 15)) AS BIGINT)
                % 16) = 0)
            ELSE [] END AS cuts
          FROM docs),
        b AS (SELECT doc_id, tk, list_concat(list_concat(
            [CAST(0 AS BIGINT)], cuts), [CAST(n AS BIGINT)]) AS bounds
          FROM c),
        ch AS (SELECT doc_id, j,
            array_to_string(tk[bounds[j]+1:bounds[j+1]], ' ') AS chunk,
            bounds[j+1] - bounds[j] AS n_toks_chunk
          FROM b, UNNEST(range(1, len(bounds))) AS u(j)
          WHERE bounds[j+1] > bounds[j]),
        chi AS (SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY j) - 1 AS INT) AS chunk_idx,
            CAST(n_toks_chunk AS BIGINT) AS n_toks_chunk,
            md5(chunk) AS chunk_hash
          FROM ch)"""

}
