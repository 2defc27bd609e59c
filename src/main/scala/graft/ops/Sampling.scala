package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines.
 *
 * `df.sample()` draws from a per-partition RNG: results change with
 * partitioning, task retries, and Spark versions — unacceptable when a
 * sample defines a training set that must be reproducible (and auditable)
 * months later. Both operators here decide membership from a HASH OF THE
 * ROW'S ID, so the same row makes the same decision on any cluster, at any
 * parallelism, in any engine (the DuckDB oracles replay them exactly).
 *
 * Scale: `hashSample` is a stateless per-row filter — fully pushed into the
 * scan stage, no shuffle, no driver coordination. `stratifiedSample` is one
 * shuffle on the stratum key; its per-stratum top-`quota` uses the same
 * md5 order everywhere, so it is also retry-stable. A count-based quota
 * does concentrate each stratum on one reducer — quotas are for capping
 * dominant strata (languages, sources), which is exactly the case where a
 * stratum fits a reducer after capping.
 */
object Sampling {

  /** Uniform-in-[0,1) deterministic score for an id: first 8 md5 hex chars
    * scaled by 2^-32 (native digest-prefix expression; same value as
    * `conv(substr(md5(x),1,8),16,10)` — the oracle replays that form). */
  def hashScore(id: Column): Column =
    graft.plans.GraftExpressions.md5_prefix(id.cast("string"), 8)
      .cast("double") / lit(4294967296.0)

  /** Keep rows whose hash score < `fraction` — a reproducible Bernoulli
    * sample stratified by nothing but the id space. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.filter(hashScore(col(idCol)) < fraction)
  }

  /** Data mixing: a per-key Bernoulli rate (the mixture-weights knob of
    * corpus assembly — upsample curated sources, downsample crawl). Same
    * scale shape as [[hashSample]]: the rate lookup folds to a CASE chain
    * over the (small) key set, so membership is still a stateless scan-stage
    * filter — no shuffle, reproducible on any cluster. Keys absent from
    * `rateByKey` take `defaultRate`. */
  def mixtureSample(df: DataFrame, idCol: String, keyCol: String,
      rateByKey: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((rateByKey.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val rate = rateByKey.foldLeft(lit(defaultRate)) { case (alt, (k, r)) =>
      when(col(keyCol) === k, lit(r)).otherwise(alt)
    }
    df.filter(hashScore(col(idCol)) < rate)
  }

  /** Keep at most `quota` rows per stratum, chosen in hash-score order (with
    * the id as a total tie-break) — caps dominant strata deterministically. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashScore(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= quota)
      .drop("__graft_rank")
  }

  /** TOKEN-budgeted mixture: walk each group (source/domain/language) in
    * deterministic hash order and keep documents while the group's running
    * token total is below its budget — the "N billion tokens of web, M of
    * code" knob of corpus assembly, where [[mixtureSample]]'s per-row rates
    * can only target an EXPECTED token share. A document is kept iff the
    * tokens before it fit the budget (`offset < budget`), so the crossing
    * document is included and every group with a positive budget and any
    * data contributes at least one document. Keys absent from
    * `budgetByKey` take `defaultBudget` (0 = drop).
    *
    * Scale shape: the running totals come from [[Prefix.runningOffsetsBy]]
    * — a grouped two-pass range scan — NOT `Window.partitionBy(group)`,
    * which would drag each group through one task exactly when one domain
    * holds 90% of the corpus. Deterministic like everything here: hash
    * order is a pure function of ids, so the sample is partitioning-,
    * retry- and engine-stable (the oracle replays it). */
  def tokenBudgetSample(df: DataFrame, idCol: String, keyCol: String,
      tokensCol: String, budgetByKey: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame = {
    require((budgetByKey.values ++ Seq(defaultBudget)).forall(_ >= 0),
      "budgets must be non-negative")
    val scored = df.withColumn("__h", hashScore(col(idCol)))
    val withOff = graft.ops.Prefix.runningOffsetsBy(
      scored, keyCol, Seq("__h", idCol), tokensCol)
    val budget = budgetByKey.foldLeft(lit(defaultBudget)) {
      case (alt, (k, b)) => when(col(keyCol) === k, lit(b)).otherwise(alt)
    }
    withOff.filter(col("offset") < budget)
      .drop("__h", "offset")
  }

  /** Curriculum binning: assign every row a global quantile bin
    * (0..bins-1) under the total order given by `orderCols` (which must be
    * unique as a tuple — end with the id). Bin = floor(rank * bins / n)
    * with `rank` the 0-based global ordinal — equal-width bins with the
    * remainder spread over the FIRST bins, deterministic (no ntile
    * remainder ambiguity, no RNG).
    *
    * Scale shape: the global ordinal comes from
    * [[Prefix.runningOffsetsOrdered]] with weight 1 — the two-pass
    * range-partitioned scan — NOT `Window.orderBy` (which drags the corpus
    * through ONE reducer). One extra count() job fixes `n`. This is the
    * "sort by difficulty, then schedule" step of curriculum training-data
    * ordering. */
  def curriculumBins(df: DataFrame, orderCols: Seq[String], bins: Int,
      binCol: String = "bin"): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val n = math.max(df.count(), 1L)
    graft.ops.Prefix.runningOffsetsOrdered(
        df.withColumn("__one", lit(1L)), orderCols, "__one")
      .withColumn(binCol,
        floor((col("offset") * bins).cast("double") / n.toDouble).cast("long"))
      .drop("__one", "offset")
  }

  /** DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169):
    * pick the `topK` documents whose hashed-unigram profile looks most like
    * a target subset relative to the whole corpus. Per token, the feature is
    * a `buckets`-way md5 hash; per bucket, an add-one-smoothed frequency
    * ratio between target and corpus; per document, the score is the sum of
    * its tokens' bucket ratios (with multiplicity).
    *
    * Divergence from the paper, deliberately: the paper scores with
    * log-likelihood ratios and samples with Gumbel noise; engines disagree
    * on `ln` ULPs and any RNG breaks replayability, so the score here is the
    * LINEAR ratio floor-quantized to 6 dp per bucket (a monotone surrogate
    * on the same sufficient statistics) and selection is exact top-k with
    * the id as tie-break — bit-identical on any engine, cluster or retry.
    *
    * Scale shape: one pass over the exploded token stream computes BOTH
    * histograms (`count(*)` and a filtered count, map-side combined into at
    * most `buckets` rows); the bucket->weight table is broadcast, so scoring
    * is a map-side join + one doc_id-keyed aggregate; selection is a
    * distributed TakeOrdered, never a global sort. The corpus is tokenized
    * twice (once per job) — at scale that is cheaper than materializing a
    * corpus-sized token table to save a re-scan. Documents with zero tokens
    * score nothing and are dropped (they cannot carry signal either way). */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, topK: Int = 100): DataFrame = {
    require(buckets > 0 && topK > 0, "buckets and topK must be positive")
    val toks = df.select(col(idCol).as("doc_id"), isTarget.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("bk",
        pmod(graft.plans.GraftExpressions.md5_prefix(col("tok"), 4),
          lit(buckets)))
    val weights = broadcast(toks.groupBy("bk").agg(
        count(lit(1)).as("s_n"),
        count(when(col("__t"), lit(1))).as("t_n"))
      .select(col("bk"),
        floor(lit(1e6) * (col("t_n") + 1).cast("double") /
          (col("s_n") + 1).cast("double")).cast("long").as("w")))
    toks.join(weights, Seq("bk"))
      .groupBy("doc_id").agg(sum(col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /**
   * Priority sampling (Duffield, Lund, Thorup — JACM 54(6), 2007): a
   * weight-aware fixed-size-`k` sample per group with an UNBIASED subset-sum
   * estimator. Each row draws priority q = w / u with u uniform in (0,1];
   * the k highest-priority rows are kept, and each keeps the adjusted
   * weight est_w = max(w, tau) where tau is the (k+1)-th priority of its
   * group — E[Σ est_w over sample] equals the group's true Σ w, with
   * near-optimal variance among all k-sample schemes. The workhorse for
   * "keep 10k docs per language but let token-count steer who survives"
   * while keeping downstream token-mass statistics unbiased.
   *
   * Determinism: u = (md5_prefix60(id) + 1) / 2^60 — the same hash-as-RNG
   * convention as [[hashScore]], so the sample is reproducible on any
   * cluster and replayable by the oracle. q and est_w are each TWO
   * correctly-rounded IEEE ops (one multiply by the exact power 2^60, one
   * divide), bit-identical across engines; est_w is additionally
   * floor-quantized to 6 dp for the output.
   *
   * Scale shape: priorities are scan-stage expressions; the per-group
   * top-(k+1) is a rank-limited window that Spark rewrites to
   * WindowGroupLimit — bounded O(k) state per map partition BEFORE the
   * shuffle, so a dominant group never sorts corpus-sized input (same
   * machinery `q_window_topk` pins). tau rides the same ranked output
   * (row k+1) via a per-group max — no second pass over the data.
   *
   * Output: (grp, id, w, rnk, est_w) — the k sampled rows per group.
   */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"prioritySample needs k > 0, got $k")
    val pow60 = 1152921504606846976.0 // 2^60, exact in a double
    val u = (graft.plans.GraftExpressions
      .md5_prefix60(col("id").cast("string")) + 1).cast("double")
    val ranked = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(weightCol).cast("long").as("w"))
      .withColumn("q", col("w").cast("double") * lit(pow60) / u)
      .withColumn("rnk", row_number().over(Window.partitionBy("grp")
        .orderBy(col("q").desc, col("id").asc)))
      .filter(col("rnk") <= k + 1)
    // tau = the (k+1)-th priority, 0 when the group has <= k rows (then
    // every row is sampled and est_w = w — the estimator is exact)
    val tau = ranked.groupBy("grp")
      .agg(max(when(col("rnk") === k + 1, col("q"))).as("tau"))
    ranked.filter(col("rnk") <= k)
      .join(broadcast(tau), Seq("grp"), "left_outer")
      .select(col("grp"), col("id"), col("w"), col("rnk").cast("long").as("rnk"),
        (floor(greatest(col("w").cast("double"), coalesce(col("tau"), lit(0.0)))
          * 1e6) / 1e6).as("est_w"))
  }

  /** Deterministic shard id for a row: hash of the id mod `shards`. The
    * assignment is a pure scan-stage expression — the same row lands in the
    * same shard on any cluster, at any parallelism, on any retry — which is
    * what makes shard manifests auditable and incremental appends safe
    * (re-running assignment over old rows cannot move them). */
  def shardOf(id: Column, shards: Int): Column =
    pmod(graft.plans.GraftExpressions.md5_prefix60(id.cast("string")),
      lit(shards.toLong))

  /** Water-filling quota allocation across groups: given a total row
    * `budget`, find the largest integer cap `c` such that
    * `sum_g min(n_g, c) <= budget`, and allocate each group
    * `min(n_g, c)` rows. This is the standard fair-mixing answer to
    * "N documents total, no source may dominate": small sources keep
    * everything, large sources are clipped to one common ceiling.
    *
    * Shape: one combine-enabled count per group, then a prefix scan over
    * the GROUP TABLE sorted by ascending count — with groups sorted, the
    * cap lies in the count-gap after some prefix i, where
    * `prefix(i) + (k-i) * c <= budget` gives `c = (budget - prefix(i))
    * / (k - i)` — so the search is one window pass over k rows. The
    * window is partitioned only by the literal group column's table,
    * whose cardinality (sources, languages) is bounded by contract —
    * the corpus itself is touched once, by the count.
    *
    * Output: (group, n_rows, alloc, cap) — `cap` repeated for audit.
    * All-integer; floor division both engines. */
  def waterfillAlloc(df: DataFrame, keyCol: String, budget: Long)
      : DataFrame = {
    require(budget >= 0, s"waterfillAlloc needs budget >= 0, got $budget")
    val counts = df.groupBy(col(keyCol).as("grp"))
      .agg(count(lit(1)).as("n_rows"))
    // ascending-count order; ties broken by group name for determinism
    val w = Window.orderBy(col("n_rows").asc, col("grp").asc)
    val k = counts.agg(count(lit(1)).as("k"))
    val pref = counts
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("prefix",
        coalesce(sum("n_rows").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(k))
    // cand(i): the cap if exactly groups 1..i-1 keep everything and the
    // k-i+1 largest are clipped — prefix(i) + (k-i+1)*cand <= budget.
    // The binding row is the SMALLEST i whose cand falls below its own
    // group's count (groups before it genuinely fit under the line);
    // no such row means the budget covers the whole corpus — no cap.
    val cand = pref.withColumn("cand",
      expr(s"(${budget}L - prefix) div (k - idx + 1)"))
    val cap = cand.filter(col("cand") < col("n_rows"))
      .agg(min_by(col("cand"), col("idx")).as("cap"))
    counts.crossJoin(broadcast(cap))
      .select(col("grp"), col("n_rows"),
        least(col("n_rows"), coalesce(col("cap"), col("n_rows")))
          .as("alloc"),
        col("cap"))
  }

  /** Training-shard manifest: assign every row a [[shardOf]] shard and
    * report per-shard document count and weight mass (chars, tokens, bytes —
    * whatever `weightCol` carries). The last step of corpus assembly —
    * "write N shards, prove they're balanced" — as one combine-enabled
    * aggregate: hash sharding balances to ~1/sqrt(n_docs_per_shard)
    * relative deviation by construction, and the manifest is the evidence
    * (feed it to the writer's partitionBy or a repartition(shards, col)).
    * Output: (shard, n_docs, w_sum). */
  def shardManifest(df: DataFrame, idCol: String, weightCol: String,
      shards: Int): DataFrame = {
    require(shards > 0, s"shardManifest needs shards > 0, got $shards")
    df.select(shardOf(col(idCol), shards).as("shard"),
        col(weightCol).cast("long").as("w"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("w_sum"))
  }
}
