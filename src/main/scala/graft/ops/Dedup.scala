package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/**
 * Deduplication operators for training-data pipelines: exact, n-gram
 * Jaccard, MinHash+LSH, and SimHash.
 *
 * Scale design (the point of each variant):
 *  - exact:   one hash-shuffle on a 16-byte fingerprint — the cheap first pass.
 *  - jaccard: candidate generation ONLY through rare shingles (document
 *    frequency <= maxDf) — prefix-filtering; the all-pairs shingle join is
 *    quadratic in hot shingles and would melt at 100 TB, while near-dup pairs
 *    by construction share *rare* shingles. True Jaccard is then verified on
 *    the full shingle sets of surviving candidates only.
 *  - minhash: fixed-size signatures (k mins) via ONE md5 per (doc,shingle)
 *    and k linear derivations (a + i*b mod p) — banding turns near-dup search
 *    into an equi-join on band keys, each band a plain shuffle. No pairwise
 *    scan anywhere.
 *  - simhash: 60-bit signature by bitwise majority; near-dup = small hamming
 *    distance, found by banding the bits (pigeonhole: hamming <= 3 over 4
 *    bands => at least one band equal) — again an equi-join, no O(n^2).
 *
 * Hashes are md5-derived so every signature is engine-reproducible (the
 * DuckDB oracles replay them bit-for-bit).
 */
object Dedup {

  /** Word n-gram shingles of the normalized text, as an array column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  /** (id, shingle) exploded + distinct — the posting list.
    *
    * Typed `flatMap`, not the `shingles` Column: the higher-order-function
    * chain (`sequence`/`transform`/`slice`/`array_join`) is interpreted —
    * no codegen, a tree-walk per array element — and shingling is the hot
    * inner loop of every dedup family (6s of the old 8s q_dedup_jaccard at
    * sf0.1 was this one select). Compiled `sliding(n)` over the token array
    * is ~20x cheaper per row and stays fully distributed. Semantics are
    * identical to `shingles` (same tokenizer regex, short-text and null
    * fallbacks); the id keeps its native type via a dynamic Row encoder. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int,
      keepDuplicates: Boolean = false): DataFrame = {
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      StructField("doc_id", idField.dataType, idField.nullable),
      StructField("shingle", StringType)))
    val rows = Similarity.spread(df
      .select(col(idCol).as("doc_id"), col(textCol).cast("string").as("text")))
      .flatMap { r =>
        val id = r.get(0)
        if (r.isNullAt(1)) Iterator.single(Row(id, null))
        else {
          val toks = graft.plans.TokenizeAlnum.tokensOf(r.getString(1))
          if (toks.length >= n) {
            val grams = toks.sliding(n).map(_.mkString(" "))
            // per-doc local dedup (one row per doc): with doc ids unique —
            // the operator contract, as for every keyed op here — the
            // (doc_id, shingle) stream is already globally distinct, so no
            // distinct() shuffle is spent on it. Downstream shuffles
            // (document frequency, per-doc set collection) repartition as
            // they need.
            (if (keepDuplicates) grams else grams.toSet.iterator)
              .map((s: String) => Row(id, s))
          } else Iterator.single(Row(id, toks.mkString(" ")))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    rows
  }

  /** [[shingleTable]] for SEVERAL gram sizes in ONE corpus pass: emits
    * (doc_id, n, shingle) with each document tokenized once and slid once
    * per n — for consumers needing multiple gram orders (the Gopher
    * repetition gates score 2-grams and 3-grams together; two separate
    * shingleTable passes would re-scan and re-tokenize the corpus). Per-n
    * semantics are identical to `shingleTable(n)` (same short-text and
    * null fallbacks). Duplicates are always kept — multi-n consumers are
    * counting, not set-building. */
  def shingleTableMulti(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty, "shingleTableMulti needs at least one gram size")
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      StructField("doc_id", idField.dataType, idField.nullable),
      StructField("n", org.apache.spark.sql.types.IntegerType, false),
      StructField("shingle", StringType)))
    Similarity.spread(df.select(col(idCol).as("doc_id"),
        col(textCol).cast("string").as("text")))
      .flatMap { r =>
        val id = r.get(0)
        if (r.isNullAt(1)) ns.iterator.map(n => Row(id, n, null))
        else {
          val toks = graft.plans.TokenizeAlnum.tokensOf(r.getString(1))
          ns.iterator.flatMap { n =>
            if (toks.length >= n)
              toks.sliding(n).map(g => Row(id, n, g.mkString(" ")))
            else Iterator.single(Row(id, n, toks.mkString(" ")))
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** POSITIONAL shingles: (doc_id, pos, shingle) with `pos` the 0-based
    * token offset of each n-gram — the input to span-level duplicate
    * detection, where WHERE a gram sits matters as much as what it is.
    * Documents shorter than `n` emit nothing (no n-token span exists in
    * them; whole-short-doc duplication belongs to exact dedup). */
  def shingleTablePos(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val idField = df.schema(df.schema.fieldIndex(idCol))
    val outSchema = StructType(Seq(
      StructField("doc_id", idField.dataType, idField.nullable),
      StructField("pos", org.apache.spark.sql.types.IntegerType, false),
      StructField("shingle", StringType)))
    df.select(col(idCol).as("doc_id"), col(textCol).cast("string").as("text"))
      .flatMap { r =>
        val id = r.get(0)
        if (r.isNullAt(1)) Iterator.empty
        else {
          val toks = graft.plans.TokenizeAlnum.tokensOf(r.getString(1))
          if (toks.length < n) Iterator.empty
          else toks.sliding(n).zipWithIndex
            .map { case (g, i) => Row(id, i, g.mkString(" ")) }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** 60-bit md5-derived shingle hash (15 hex chars — sign-safe in a BIGINT,
    * DuckDB-replayable). Shingle SETS are carried as arrays of these, not of
    * strings: an n-gram string averages tens of bytes while the hash is 8,
    * so a pathological 1M-shingle document costs ~8 MB, not ~50+ MB, in one
    * row cell — and `array_intersect` compares primitives. Cross-set
    * equality is exact up to md5 collisions (~2^-60 per pair). */
  private def shingleHash(c: Column): Column =
    graft.plans.GraftExpressions.md5_prefix60(c)

  /** Per-doc shingle set (hashed) + true set size, one shuffle on doc_id.
    * `maxShingles > 0` keeps only the doc's `maxShingles` SMALLEST hashes —
    * a bottom-k minwise sketch, so jaccard on two capped sets is the
    * standard unbiased estimate rather than exact; docs under the cap are
    * unaffected. The cap is a bounded-state aggregate
    * ([[graft.plans.BottomKDistinct]] — O(k) buffer, map-side combinable),
    * NOT a row_number window: the window formulation sorts a pathological
    * document's whole shingle stream in one task, the sketch never holds
    * more than k longs per doc anywhere. Input rows are distinct per doc
    * (shingleTable's contract), so bottom-k-distinct == bottom-k. */
  private def docShingleSets(sh: DataFrame, maxShingles: Int): DataFrame =
    docShingleSetsHashed(
      sh.select(col("doc_id"), shingleHash(col("shingle")).as("h")),
      maxShingles)

  /** [[docShingleSets]] over an already-hashed (doc_id, h) table. */
  private def docShingleSetsHashed(hashed: DataFrame,
      maxShingles: Int): DataFrame = {
    if (maxShingles <= 0)
      hashed.groupBy("doc_id")
        .agg(collect_list("h").as("sh_set"), count("*").as("n_sh"))
    else
      hashed.groupBy("doc_id")
        .agg(graft.plans.GraftExpressions.bottomk_distinct(col("h"),
          maxShingles).as("sh_set"))
        .withColumn("n_sh", size(col("sh_set")).cast("long"))
  }

  /** Spark evaluates each PLAN REFERENCE to a subtree independently — a
    * posting list or signature table feeding both sides of a self-join (or a
    * band union) would be recomputed once per reference. Materialize it once;
    * the in-session analog of writing the (corpus-fraction-sized)
    * intermediate to parquet, which is what a 100 TB pipeline does between
    * its tokenize and join stages.
    *
    * LIFETIME CONTRACT: the cached handle lives until the session caches are
    * cleared — the returned plan is lazy, so the callee cannot unpersist it
    * before the caller has consumed it. Batch drivers (`Bench`, `Verify`)
    * run `spark.catalog.clearCache()` between queries, which releases every
    * handle from the previous query; a long-running interactive session
    * calling pair-generation repeatedly must do the same (or unpersist via
    * `spark.sharedState.cacheManager`) or the MEMORY_AND_DISK blocks
    * accumulate for the session's lifetime. */
  private[graft] def materialized(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: md5-of-normalized-text fingerprint -> canonical
    * (min) id + group size. One shuffle on the fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextOps.fingerprintMd5(col(textCol)).as("fingerprint"),
        col(idCol).as("doc_id"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("canonical_id"), count("*").as("n_docs"))

  /** Keep one row per distinct content (the min-id row). ONE pass: a
    * row_number window on the fingerprint — one scan + one shuffle, where
    * the groupBy-then-semi-join formulation scans the corpus twice and
    * shuffles twice. At 100 TB the input scan dominates; halving it matters
    * more than the window's in-partition sort. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.fingerprintMd5(col(textCol)))
      .orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------ n-gram Jaccard

  /**
   * Near-duplicate pairs by true n-gram Jaccard >= `threshold`.
   * Candidates come only from shingles with document frequency <= `maxDf`
   * (rare-shingle prefix filter); the true intersection is then counted over
   * full shingle sets for candidates only. Output:
   * (doc1, doc2, intersection, n1, n2, jaccard).
   */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxDf: Int = 20, maxShingles: Int = 0): DataFrame = {
    // Hash shingles to 60-bit longs BEFORE materializing: every downstream
    // stage (set collection, document frequency, candidate self-join) then
    // shuffles 8-byte keys instead of ~10·n-char gram strings, and the
    // posting list is tokenized exactly once. Candidate equality is on the
    // hash — exact up to md5 collisions, the same convention the set
    // intersection below already uses.
    val sh = materialized(shingleTable(df, idCol, textCol, n)
      .select(col("doc_id"), shingleHash(col("shingle")).as("h")))

    // One shuffle on doc_id: the (hashed, optionally capped) shingle set AND
    // its size per doc. Carrying the set as an array keeps the
    // true-intersection step per-pair local work (`array_intersect` is
    // codegen'd) instead of the posting-list x posting-list re-join, which
    // at corpus scale shuffles |candidates| x avg_shingles rows through two
    // more exchanges.
    val docSets = docShingleSetsHashed(sh, maxShingles)

    // document frequency via groupBy + equi-join, NOT count-over-window:
    // the window buffers EVERY posting of one shingle in a single task, so
    // a boilerplate gram with 10^8 postings at corpus scale is one spilling
    // straggler. The aggregate combines map-side (hot grams collapse to one
    // row per partition before the exchange) and AQE's skew-join splits a
    // hot gram's join side; the extra join stage is the price of a bounded
    // worst task.
    val gramDf = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf) // prune hot shingles
      .select("h")
    // lazy cut (r13): both candidate self-join arms read the pruned
    // posting list — run the df-prune join once via the checkpoint cache
    val rareSh = sh.join(gramDf, Seq("h")).localCheckpoint(false)

    val candidates = rareSh.as("a").join(rareSh.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()

    candidates
      .join(docSets.as("z1"), col("doc1") === col("z1.doc_id"))
      .join(docSets.as("z2"), col("doc2") === col("z2.doc_id"))
      .select(col("doc1"), col("doc2"),
        size(array_intersect(col("z1.sh_set"), col("z2.sh_set")))
          .cast("long").as("intersection"),
        col("z1.n_sh").as("n1"), col("z2.n_sh").as("n2"))
      .withColumn("jaccard", col("intersection").cast("double") /
        (col("n1") + col("n2") - col("intersection")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * EXACT threshold-Jaccard self-join via prefix filtering (the
   * AllPairs/PPJoin bound — Bayardo WWW'07, Xiao WWW'08). Unlike
   * [[jaccardPairs]], whose rare-shingle cap (`maxDf`) can miss a pair
   * whose every shared shingle is frequent, the prefix filter is LOSSLESS:
   * order every document's shingle set by ascending global document
   * frequency and keep only the first `m - ceil(t*m) + 1` shingles — any
   * pair with Jaccard >= t provably shares at least one PREFIX shingle, so
   * an equi-join on prefix shingles generates a complete candidate set.
   * Output: (doc1, doc2, intersection, n1, n2, jaccard), the true pairs.
   *
   * Scale shape: the candidate join touches only prefix postings — each
   * document contributes its ~(1-t)·m RAREST shingles, so the join's key
   * distribution is anti-correlated with shingle hotness by construction
   * (a boilerplate gram that appears in 10^7 documents sits at the very
   * END of every ordering and never enters a prefix unless the threshold
   * is so low that near-everything pairs anyway). A size filter
   * (t·max <= min, necessary since J <= min/max) prunes cross-length
   * candidates before the verify join. Document frequency and the per-doc
   * ordering are both single groupBy shuffles (map-side combinable / keyed
   * by doc_id, state bounded by document length); verification is
   * per-candidate local `array_intersect` over the two hashed sets.
   */
  def ppjoinPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val sh = materialized(shingleTable(df, idCol, textCol, n)
      .select(col("doc_id"), shingleHash(col("shingle")).as("h")))

    // Global df — the prefix ordering key. Ties broken on the hash so the
    // ordering is total and identical across documents (the losslessness
    // proof needs one global order, not just any per-doc order).
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))

    // One doc_id shuffle: the full set ordered rarest-first. array_sort on
    // (df, h) structs sorts lexicographically — exactly the global order.
    val ordered = sh.join(dfreq, Seq("h"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("h"))))
        .as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), x => x("h")).as("hs"),
        size(col("ord")).as("m"))

    // Prefix length m - ceil(t*m) + 1. The 1e-9 nudge makes ceil of an
    // exactly-integer t*m that double rounding pushed ABOVE the integer
    // err toward a LONGER prefix (more candidates) — never a shorter one,
    // which would break the completeness guarantee.
    val pref = ordered.select(col("doc_id"), col("m"),
      explode(slice(col("hs"), lit(1),
        (col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)) + 1)
          .cast("int"))).as("h"))

    // Candidates: prefix-token equi-join + the length filter. The epsilon
    // keeps a borderline m2 == t*m1 pair IN (over-generation is corrected
    // by the exact verify; under-generation would be a wrong answer).
    val candidates = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.m"), col("b.m")).cast("double") >=
            (lit(threshold) - lit(1e-9)) * greatest(col("a.m"), col("b.m")))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()

    val docSets = docShingleSetsHashed(sh, 0)
    candidates
      .join(docSets.as("z1"), col("doc1") === col("z1.doc_id"))
      .join(docSets.as("z2"), col("doc2") === col("z2.doc_id"))
      .select(col("doc1"), col("doc2"),
        size(array_intersect(col("z1.sh_set"), col("z2.sh_set")))
          .cast("long").as("intersection"),
        col("z1.n_sh").as("n1"), col("z2.n_sh").as("n2"))
      .withColumn("jaccard", col("intersection").cast("double") /
        (col("n1") + col("n2") - col("intersection")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  // ----------------------------------------------------- decontamination

  /**
   * Benchmark decontamination — the GPT-3/PaLM-style n-gram overlap gate: a
   * corpus document is contaminated when it shares at least `minShared`
   * distinct word n-grams with a benchmark (eval-set) document. Output:
   * (doc_id, bench_id, shared_ngrams, bench_ngrams, containment) with
   * containment = shared / |benchmark doc's n-grams| — the fraction of the
   * eval document present verbatim in the training document.
   *
   * Scale shape: candidates come from an equi-join on the 60-bit shingle
   * hash with the BENCHMARK side broadcast — eval suites are ~1e4..1e6 docs
   * against a ~1e9-doc corpus, so the corpus is scanned once, shuffles only
   * its matching (doc, bench) pairs into one count aggregation, and never
   * materializes a posting-list self-join. Decontamination n-grams are long
   * (n ~ 8-13) precisely so each one is individually rare: no hot-key cap
   * is needed because a 13-gram shared by millions of documents is itself
   * the contamination being hunted.
   */
  def contaminationPairs(corpus: DataFrame, corpusId: String,
      corpusText: String, bench: DataFrame, benchId: String,
      benchText: String, n: Int = 8, minShared: Int = 2): DataFrame = {
    val c = shingleTable(corpus, corpusId, corpusText, n)
      .select(col("doc_id"), shingleHash(col("shingle")).as("h"))
    val b = shingleTable(bench, benchId, benchText, n)
      .select(col("doc_id").as("bench_id"), shingleHash(col("shingle")).as("h"))
    val bSizes = b.groupBy("bench_id").agg(count(lit(1)).as("bench_ngrams"))
    c.join(broadcast(b), Seq("h"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .join(broadcast(bSizes), Seq("bench_id"))
      .select(col("doc_id"), col("bench_id"), col("shared_ngrams"),
        col("bench_ngrams"),
        (col("shared_ngrams").cast("double") /
          col("bench_ngrams").cast("double")).as("containment"))
  }

  /**
   * Bloom-filter decontamination — the O(MB)-state form of
   * [[contaminationPairs]] for when the benchmark's gram set is too large
   * to broadcast as rows but a membership BIT ARRAY still fits everywhere:
   * the benchmark n-grams fold into one `mBits`-bit Bloom filter
   * ([[graft.plans.BloomBitsAgg]] — map-side OR'd partials, ONE fixed-size
   * row leaves each partition), and the corpus gram stream probes it
   * inside the scan's codegen ([[graft.plans.BloomContains]]). Returns
   * (doc_id, n_hits): documents with any gram (possibly) present in the
   * benchmark, with the count of hit grams.
   *
   * The filter's false positives are DETERMINISTIC — positions are the
   * md5-derived minhash hash family `(a + i*b) mod mBits` — so an external
   * engine replays the identical flag set, false positives included; there
   * are never false negatives (every true overlap is flagged). Size the
   * filter by `mBits >> k * |benchmark grams|`; at the default 2^20 bits /
   * k=4 a 10^4-gram benchmark has a ~1e-7 per-gram false-positive rate.
   */
  def bloomContamination(corpus: DataFrame, corpusId: String,
      corpusText: String, bench: DataFrame, benchId: String,
      benchText: String, n: Int = 8, mBits: Int = 1 << 20,
      k: Int = 4): DataFrame = {
    val bits = shingleTable(bench, benchId, benchText, n)
      .filter(col("shingle").isNotNull)
      .agg(graft.plans.GraftExpressions
        .bloom_bits(col("shingle"), mBits, k).as("bits"))
    shingleTable(corpus, corpusId, corpusText, n)
      .crossJoin(broadcast(bits))
      .filter(graft.plans.GraftExpressions
        .bloom_contains(col("bits"), col("shingle"), mBits, k))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  // ------------------------------------------------------------- MinHash

  /** First/second 8 hex chars of md5 as non-negative longs — the (a, b) seeds
    * for the k derived hash functions h_i = (a + i*b) mod p. */
  private def md5Seeds(c: Column): (Column, Column) = {
    val h = md5(c.cast("binary"))
    (conv(substring(h, 1, 8), 16, 10).cast("long"),
      conv(substring(h, 9, 8), 16, 10).cast("long"))
  }

  val MinhashPrime = 2147483647L // 2^31 - 1; a + i*b < 2^37 — overflow-free

  /** MinHash signature: one row per doc with `sig_0..sig_{k-1}` columns.
    * Map-side partial min aggregation; a single shuffle on doc_id. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    signaturesFromShingles(shingleTable(df, idCol, textCol, n), k)

  private[graft] def signaturesFromShingles(sh: DataFrame, k: Int): DataFrame = {
    val (a, b) = md5Seeds(col("shingle"))
    val aggs = (0 until k).map(i =>
      min((a + lit(i.toLong) * b) % MinhashPrime).as(s"sig_$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys: md5 over each band's `r` signature values. Output
    * (doc_id, band, band_key). One explode over an array of band structs —
    * a per-band union would scan the signature table `bands` times. */
  def minhashBands(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      val key = md5(concat_ws(",",
        (0 until r).map(i => col(s"sig_${b * r + i}").cast("string")): _*)
        .cast("binary"))
      struct(lit(b).as("band"), key.as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs from a signature table: same band key in any band
    * (equi-join per band — no pairwise scan). `sigs` is materialized first:
    * the band union references it `bands` times and the self-join doubles
    * that. */
  private def candidatesFromSignatures(sigs: DataFrame, k: Int,
      bands: Int): DataFrame = {
    val bk = minhashBands(materialized(sigs), k, bands)
    bk.as("x").join(bk.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
  }

  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 4): DataFrame =
    candidatesFromSignatures(minhashSignatures(df, idCol, textCol, n, k),
      k, bands)

  /** MinHash LSH end-to-end: candidates verified by true Jaccard. The
    * posting list is computed ONCE and shared by the signature, size, and
    * intersection stages. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 4,
      threshold: Double = 0.8, maxShingles: Int = 0): DataFrame = {
    val sh = materialized(shingleTable(df, idCol, textCol, n))
    // hashed set + size in one shuffle; true intersection is then per-pair
    // local `array_intersect` (see jaccardPairs for why not a posting-list
    // re-join)
    val docSets = docShingleSets(sh, maxShingles)
    val cand = candidatesFromSignatures(signaturesFromShingles(sh, k),
      k, bands)
    cand
      .join(docSets.as("z1"), col("doc1") === col("z1.doc_id"))
      .join(docSets.as("z2"), col("doc2") === col("z2.doc_id"))
      .select(col("doc1"), col("doc2"),
        size(array_intersect(col("z1.sh_set"), col("z2.sh_set")))
          .cast("long").as("intersection"),
        col("z1.n_sh").as("n1"), col("z2.n_sh").as("n2"))
      .select(col("doc1"), col("doc2"),
        (col("intersection").cast("double") /
          (col("n1") + col("n2") - col("intersection")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Fuzzy (edit-distance) near-dup pairs: MinHash-LSH candidate generation
   * reranked by `levenshtein` on the NORMALIZED text, truncated to
   * `prefixLen` chars — the small-perturbation dedup pass that set-based
   * Jaccard misses scores for (transposed words, in-place edits score low
   * on shingle overlap but tiny on edit distance) and that quadratic
   * all-pairs edit distance cannot afford. Only candidate pairs (banded,
   * bounded buckets) ever pay the O(prefixLen^2) DP — the standard
   * fuzzy-matching shape: block, then verify.
   *
   * Determinism: levenshtein is an integer (identical in every engine);
   * normalization and the char-based truncation replay exactly. The
   * truncation also BOUNDS the verify cost per pair (64 KB of DP at the
   * default 256), which is what makes the rerank safe to run at corpus
   * scale — full-document edit distance on a pathological 1 MB doc pair
   * would be a 10^12-cell DP.
   *
   * Output: (doc1, doc2, dist), doc1 < doc2, dist <= maxDist.
   */
  def fuzzyNearDups(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 4,
      maxDist: Int = 20, prefixLen: Int = 256): DataFrame = {
    require(maxDist >= 0 && prefixLen >= 1,
      s"fuzzyNearDups needs maxDist >= 0 and prefixLen >= 1, got ($maxDist, $prefixLen)")
    val cand = minhashCandidates(df, idCol, textCol, n, k, bands)
    val norm = df.select(col(idCol).as("doc_id"),
      substring(graft.ops.TextOps.normalize(col(textCol)), 1, prefixLen)
        .as("nt"))
    cand
      .join(norm.as("p1"), col("doc1") === col("p1.doc_id"))
      .join(norm.as("p2"), col("doc2") === col("p2.doc_id"))
      .select(col("doc1"), col("doc2"),
        levenshtein(col("p1.nt"), col("p2.nt")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** The per-document DEDUP INDEX a continuously-ingested corpus persists:
    * (doc_id, sh_set, n_sh, sig_0..sig_{k-1}) — hashed shingle set + true
    * size + MinHash signature, one row per document. Write it to the lake
    * alongside the corpus; each increment builds the same index over its
    * own documents ([[incrementalNearDups]] consumes both), then appends
    * its rows. Shingles are hashed to 60-bit longs (8 bytes each, see
    * [[shingleHash]]), so index size is ~8·|shingles| + 8k bytes per doc. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, maxShingles: Int = 0): DataFrame = {
    val sh = materialized(shingleTable(df, idCol, textCol, n))
    docShingleSets(sh, maxShingles)
      .join(signaturesFromShingles(sh, k), "doc_id")
  }

  /** INCREMENTAL near-dup detection: pairs touching the new batch only —
    * new-vs-corpus plus new-vs-new — against a persisted [[minhashIndex]].
    * The invariant that keeps continuous ingestion tractable: corpus-vs-
    * corpus pairs were emitted when those documents were themselves new, so
    * a daily increment costs O(increment x band collisions), never a
    * corpus-wide re-pairing — the full 100 TB corpus is touched only
    * through an equi-join on band keys (and the corpus index is scanned,
    * not re-shingled). Returns (doc1 < doc2, jaccard >= threshold), the
    * same contract as [[minhashNearDups]]; in fact it equals
    * `minhashNearDups(corpus ∪ new)` filtered to pairs with a new side
    * (asserted in the spec, replayed by the oracle). Both indexes must
    * share (n, k, maxShingles) and have globally unique ids. */
  def incrementalNearDups(corpusIndex: DataFrame, newIndex: DataFrame,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val newIdx = materialized(newIndex)
    val bn = materialized(minhashBands(newIdx, k, bands))
    val bo = minhashBands(corpusIndex, k, bands)
    // ids are disjoint across the two indexes, so new-vs-corpus needs no
    // inequality; new-vs-new orders inside the join as usual
    val newOld = bn.as("x").join(bo.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc1"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc2"))
    val newNew = bn.as("x").join(bn.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
    val cand = newOld.union(newNew).distinct()
    val sets = corpusIndex.select("doc_id", "sh_set", "n_sh")
      .union(newIdx.select("doc_id", "sh_set", "n_sh"))
    cand
      .join(sets.as("z1"), col("doc1") === col("z1.doc_id"))
      .join(sets.as("z2"), col("doc2") === col("z2.doc_id"))
      .select(col("doc1"), col("doc2"),
        size(array_intersect(col("z1.sh_set"), col("z2.sh_set")))
          .cast("long").as("intersection"),
        col("z1.n_sh").as("n1"), col("z2.n_sh").as("n2"))
      .select(col("doc1"), col("doc2"),
        (col("intersection").cast("double") /
          (col("n1") + col("n2") - col("intersection")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------------- SimHash

  val SimhashBits = 60 // 15 md5 hex chars — sign-safe in a BIGINT everywhere

  /** Per-token 60-bit hash (15 hex chars of md5, native expression). */
  private def tokenHash60(c: Column): Column =
    graft.plans.GraftExpressions.md5_prefix60(c)

  /** 60-bit SimHash per document: bit j set iff the majority of the doc's
    * distinct tokens have bit j set (strictly more 1s than 0s). One explode +
    * ONE object-buffer aggregate (graft.plans.SimhashAgg: int[60] of +-1
    * counters, map-side combined) — the composed 60 x `sum(when(...))` form
    * carried 60 long columns through the shuffle and generated a 60-aggregate
    * codegen class. Bit-identical output. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
    toks.groupBy("doc_id")
      .agg(graft.plans.GraftExpressions
        .simhash_agg(tokenHash60(col("tok")), SimhashBits).as("simhash"))
  }

  /**
   * Near-dup pairs by hamming distance <= `maxHamming`, via Manku-style
   * multi-table permuted blocks (Manku/Jain/Das Sarma, WWW'07 §3): the 60
   * bits split into `blocks` roughly-equal blocks; a pair within hamming h
   * differs in at most h blocks, so at least `blocks - h` blocks are intact
   * — every table keys on one (blocks - maxHamming)-subset of blocks, and
   * C(blocks, blocks - maxHamming) tables give EXACT recall by pigeonhole.
   *
   * Scale rationale (why not 4 bands of 15 bits): candidate volume from
   * random collisions is ~tables * n^2 * 2^-keyWidth. 15-bit keys melt at
   * 10^9 docs (n^2 * 2^-13 pairs); the default here (blocks=6, maxHamming=3)
   * keys on 30 bits across 20 tables — 2^-30 per-table collision odds, a
   * ~10^4x smaller candidate set for a 5x table cost. All key material is
   * shift/mask arithmetic on the signature — one explode, fully codegen'd.
   *
   * `maxBucket > 0` additionally caps any (table, key) bucket — the exact
   * analog of `jaccardPairs`' maxDf hot-shingle prune. An over-full bucket
   * is a giant cluster of (near-)identical documents, which exact dedup
   * already collapses more cheaply; dropping it bounds the self-join's
   * worst key at the cost of exactness (leave 0 for oracle-exact output).
   */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blocks: Int = 6, maxBucket: Int = 0): DataFrame =
    hammingNearDups(simhash(df, idCol, textCol), SimhashBits,
      maxHamming, blocks, maxBucket)

  /** The Manku blocked search over an ARBITRARY signature table
    * (doc_id, simhash) of `bits` significant bits (bits = 64 allowed: block
    * extraction masks after the arithmetic shift, so a set sign bit is
    * handled like any other) — shared by text SimHash and perceptual image
    * hashes ([[Multimodal.imageAHash]]). Same exact-recall pigeonhole
    * guarantee and bucket-cap semantics as [[simhashNearDups]]. */
  def hammingNearDups(sigs: DataFrame, bits: Int,
      maxHamming: Int, blocks: Int, maxBucket: Int): DataFrame = {
    require(blocks > maxHamming && blocks <= bits && bits <= 64,
      s"need maxHamming < blocks <= bits <= 64, got ($maxHamming, $blocks, $bits)")
    // one row per doc; referenced by both join sides
    val sh = materialized(sigs)
    // block i covers [off_i, off_i + w_i): widths differ by at most 1
    val base = bits / blocks
    val widths = (0 until blocks).map(i => base + (if (i < bits % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val blockVal = (i: Int) => shiftright(col("simhash"), offsets(i))
      .bitwiseAND((1L << widths(i)) - 1)
    // one table per (blocks - maxHamming)-subset; key = packed block values
    val tables = (0 until blocks).combinations(blocks - maxHamming).toSeq
    val tableStructs = tables.zipWithIndex.map { case (sel, ti) =>
      val key = sel.foldLeft(lit(0L)) { (acc, i) =>
        shiftleft(acc, widths(i)).bitwiseOR(blockVal(i))
      }
      struct(lit(ti).as("tbl"), key.as("key"))
    }
    val keyed = sh.select(col("doc_id"), col("simhash"),
        explode(array(tableStructs: _*)).as("tk"))
      .select(col("doc_id"), col("simhash"),
        col("tk.tbl").as("tbl"), col("tk.key").as("key"))
    // Bucket cap via groupBy + equi-join, not count-over-window: the guard
    // exists precisely because some buckets are pathologically hot, and a
    // window would buffer exactly those buckets in single tasks. The count
    // aggregate combines map-side; the join shuffles on the same (tbl, key)
    // the self-join below uses.
    val pruned = if (maxBucket <= 0) keyed else {
      val small = keyed.groupBy("tbl", "key").agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= maxBucket).select("tbl", "key")
      keyed.join(small, Seq("tbl", "key"))
    }
    pruned.as("x").join(pruned.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      // hamming-filter BEFORE distinct: a true pair reaches distinct from up
      // to `tables` tables, a false candidate is dropped without the shuffle
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------- components / canonicalization

  /**
   * Connected components over an undirected near-dup pair table:
   * (doc_id, component_id) where component_id = the MIN doc id reachable
   * through any chain of pairs. This is the step between pair generation and
   * canonical-document selection — near-duplicate is not transitive, so
   * keep-one-per-pair double-drops documents that chain (A~B, B~C drops B
   * and C even though A~C may not hold); the standard policy is one
   * representative per component.
   *
   * Min-label propagation: each round, every vertex takes the min of its own
   * label and its neighbors' — one equi-join (shuffle on the edge source) +
   * one groupBy per round, no driver-side graph. Rounds = graph diameter,
   * and near-dup components are overwhelmingly small cliques (diameter 1-2),
   * so 2-3 rounds converge; `maxIter` bounds adversarial chains (a path of
   * length > maxIter would need that many rounds — at that point switch to
   * the large-star/small-star formulation, which converges in O(log d)).
   *
   * Each round is CHECKPOINTED, not merely persisted: next_i's logical plan
   * contains labels_i twice (once in the messages join, once in the union),
   * so without truncation the plan DOUBLES per round — and with a full LSH
   * pipeline at the leaves, driver-side analysis/canonicalization cost went
   * exponential (10 s PER ROUND on 256 cached pairs) while the actual data
   * work was milliseconds. `localCheckpoint` cuts the plan at the
   * materialized RDD; on a cluster with a checkpoint dir configured,
   * `checkpoint` additionally survives executor loss. Only docs appearing
   * in `pairs` are emitted (singletons are their own component trivially).
   */
  def components(pairs: DataFrame, aCol: String = "doc1",
      bCol: String = "doc2", maxIter: Int = 20): DataFrame = {
    // Evaluate `pairs` ONCE before the undirected expansion: the union
    // references the plan twice, and Spark evaluates each reference
    // independently — with an LSH pair-generation pipeline upstream, that
    // re-runs shingling + banding + the candidate self-join a second time
    // for the swapped direction. Checkpoint the (tiny) pair table first;
    // the swap is then a projection over the materialized RDD.
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint()
    val edges =
      p.union(p.select(col("b").as("a"), col("a").as("b")))
        .distinct().localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var i = 0
    def round(): Unit = {
      val msgs = edges.join(labels, col("a") === col("id"))
        .select(col("b").as("id"), col("comp"), lit(false).as("own"))
      // fold the previous label into the SAME aggregation (min over own
      // rows) — convergence is then a filter on the checkpointed result,
      // not another join+shuffle per round
      val next = msgs
        .union(labels.select(col("id"), col("comp"), lit(true).as("own")))
        .groupBy("id").agg(min("comp").as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
        .localCheckpoint()
      changed = next.filter(col("comp") < col("prev")).count()
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    while (changed > 0 && i < maxIter) round()
    // A changed label in round maxIter is not yet evidence of
    // non-convergence — the fixed point is only OBSERVABLE one round later
    // (a diameter-exactly-maxIter graph converges on its last allowed round
    // and must not raise). One confirmation round settles it either way.
    if (changed > 0) round()
    // LOUD on non-convergence, never silently-split components: a label
    // still moving after maxIter+1 rounds means the graph has a chain
    // longer than maxIter (the q_emb_mutual_knn sf1 lesson — k-NN graphs
    // chain, and a split component is a WRONG answer that hashes
    // plausibly). boruvkaForest set the precedent: throw and name the
    // escalation.
    if (changed > 0) throw new IllegalStateException(
      s"components: $changed labels still moving after $maxIter rounds " +
        "(+1 confirmation round) — " +
        "graph diameter exceeds maxIter; use componentsStar (O(log^2 n) " +
        "rounds on any diameter) or raise maxIter")
    labels.select(col("id").as("doc_id"), col("comp").as("component_id"))
  }

  /**
   * Connected components by alternating large-star / small-star rounds
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14) — the escalation [[components]]' scaladoc names for long
   * chains: label propagation needs diameter rounds (a 10^4-link chain is
   * 10^4 shuffles), star contraction converges in O(log^2 n) rounds on any
   * graph (log-ish in practice).
   *
   * Per round: LARGE-STAR links every neighbor ABOVE a node to the minimum
   * of its neighborhood (incl. itself); SMALL-STAR re-points a node and its
   * below-neighbors at that minimum. Both preserve connectivity; the fixed
   * point is one star per component rooted at its minimum id. Each phase is
   * one shuffle (a window min on the grouping key + an explode — no join at
   * all, vs label propagation's join-per-round); rounds are checkpointed for
   * the same plan-truncation reason as [[components]]. Convergence = the
   * (count, xor-of-hashes) edge-set signature repeating.
   *
   * Same output contract as [[components]]: (doc_id, component_id = min
   * reachable id) for every doc appearing in `pairs`. Prefer [[components]]
   * for near-dup cliques (diameter 1-2: fewer, cheaper rounds); prefer this
   * for graphs that may chain.
   */
  def componentsStar(pairs: DataFrame, aCol: String = "doc1",
      bCol: String = "doc2", maxIter: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var edges = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")) // canonical (hi, lo)
      .distinct().localCheckpoint()
    var sig: (Long, Long) = (-1L, -1L)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // LARGE-STAR over both directions: m = min(N(u) ∪ {u}); (v, m) ∀ v > u
      val bidir = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val wU = Window.partitionBy("u")
      val large = bidir
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u >= m
        .filter(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR on (hi, lo) edges: m = min(N); point u and each below-
      // neighbor at m
      val small = large
        .withColumn("m", min(col("v")).over(wU))
        .select(explode(array(
          struct(col("u").as("u"), col("m").as("v")),
          struct(col("v").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // xor-fold, not sum: order-independent AND overflow-free under ANSI
      val row = small.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      val next = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      converged = next == sig
      sig = next
      edges = small
      i += 1
    }
    edges.select(col("u").as("doc_id"), col("v").as("component_id"))
      .union(edges.select(col("v"), col("v")).distinct())
  }

  /** Component-canonical dedup over near-dup pairs: keep the min-id document
    * of every component (plus all unpaired documents). */
  def componentDedup(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "doc1", bCol: String = "doc2"): DataFrame = {
    val comps = components(pairs, aCol, bCol)
    val drop = comps.filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /**
   * Quality-aware canonicalization: like [[componentDedup]], but instead of
   * keeping each near-dup cluster's smallest id, keep its BEST member — the
   * row maximizing `scoreCol` (ties broken toward the smallest id, so the
   * result is deterministic). This is the curation policy real pipelines
   * want: when a near-dup cluster mixes a full article with its truncated
   * scrape, keep the longest / highest-quality copy, not an arbitrary one.
   *
   * Distributed shape: the keeper per component is ONE map-side-combinable
   * aggregate — `max(struct(score, -id))` is an arg-max whose lexicographic
   * struct ordering encodes the tie-break, so there is no per-component
   * window and no row_number sort; state is one struct per component per
   * partition. Only ids that appear in some pair enter the join (the
   * overwhelming majority of a 100 TB corpus is untouched and flows through
   * the anti-join probe side untouched).
   */
  def componentDedupBy(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame, aCol: String = "doc1", bCol: String = "doc2")
      : DataFrame = {
    val comps = components(pairs, aCol, bCol)
    val scored = comps.join(
      df.select(col(idCol).as("doc_id"), col(scoreCol).as("_score")),
      Seq("doc_id"))
    val keepers = scored.groupBy("component_id")
      .agg(max(struct(col("_score"), (-col("doc_id")).as("neg_id"))).as("m"))
      .select(col("component_id"), (-col("m.neg_id")).as("keeper_id"))
    val drop = scored.join(keepers, Seq("component_id"))
      .filter(col("doc_id") =!= col("keeper_id"))
      .select(col("doc_id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }
}
