package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * In-engine model training over aggregates — the "train the curation
 * model where the data lives" surface of a training-data pipeline
 * (quality classifiers, propensity scores, split rules). Everything here
 * is distributed the same way: each optimization round is ONE
 * combine-enabled aggregation over the feature table producing O(k)
 * driver-side model state (k = number of features, never data-sized) —
 * the exact pattern [[Similarity]] uses for Lloyd rounds. No per-row
 * mutable state, no driver loop over rows, no UDFs.
 *
 * Determinism contract (the catalog's cross-engine identity rules):
 * features and labels are exact integers; the per-round probability is a
 * PIECEWISE-LINEAR sigmoid in exact ppm (clamp(z/4 + 1/2) — the logistic
 * function's tangent at 0, the classic hard-sigmoid surrogate), so
 * gradients are integer sums; the only IEEE ops are the per-round step
 * `floor(grad / n * lr)` and final presentation divisions, each a fixed
 * two-op chain DuckDB replays bit-for-bit. No exp/log anywhere — a real
 * logistic loss would put libm-vs-JDK transcendentals in the gate.
 *
 * Beyond the reference (its pipeline computes no models); public
 * precedent: hard-sigmoid surrogates are standard in quantized training
 * (Courbariaux et al. 2016), and batch GD as "aggregate per round" is
 * the textbook bulk-synchronous formulation every parameter-server paper
 * starts from.
 */
object ML {

  /** Result of [[logisticGd]]: the per-round weight history (index 0 =
    * the all-zero init; last = final weights, in MICRO units with the
    * bias at position 0) plus the scored feature table. */
  final case class LogisticFit(history: Seq[Array[Long]], scored: DataFrame)

  /** Hard-sigmoid probability in exact ppm for a micro-unit logit:
    * clamp(z/4 + 500000, 0, 1e6). floor(z/4.0) on the double-cast z is
    * exact floorDiv for |z| < 2^53 (division by 4 is lossless in binary
    * FP) and is the form DuckDB replays verbatim. */
  def hardSigmoidPpm(zMicro: Column): Column =
    least(greatest(
      floor(zMicro.cast("double") / lit(4.0)).cast("long") + lit(500000L),
      lit(0L)), lit(1000000L))

  /** Micro-unit logit for a fixed weight vector (bias at index 0). */
  def logitMicro(xCols: Seq[String], wMicro: Array[Long]): Column = {
    require(wMicro.length == xCols.size + 1,
      s"need ${xCols.size + 1} weights (bias first), got ${wMicro.length}")
    xCols.zipWithIndex.map { case (c, j) =>
      col(c).cast("long") * lit(wMicro(j + 1))
    }.foldLeft(lit(wMicro(0)).cast("long"): Column)(_ + _)
  }

  /** Score a feature table with a FIXED weight vector: adds `p_ppm`.
    * The inference half of [[logisticGd]] — apply a trained model to a
    * held-out or production table (weights are literals, so scoring is
    * a pure scan-stage expression, no shuffle). */
  def scoreHardSigmoid(df: DataFrame, xCols: Seq[String],
      wMicro: Array[Long]): DataFrame =
    df.withColumn("p_ppm", hardSigmoidPpm(logitMicro(xCols, wMicro)))

  /**
   * Batch gradient descent for L2-less logistic regression with the
   * hard-sigmoid surrogate: `rounds` bulk-synchronous passes, each ONE
   * map-side-combined aggregate emitting k+1 BIGINT gradient moments
   * (bias first), then a driver-side step `w -= floor(grad/n * lr)` in
   * micro units. The feature table is scanned `rounds + 1` times (cache
   * it if it does not itself fold into a scan); shuffled state per round
   * is ONE row of k+1 numbers.
   *
   * Magnitude contract: |x_j| ≤ ~2^20 and n ≤ ~2^40 keep every gradient
   * sum `Σ (p_ppm − y·1e6)·x_j` inside a BIGINT (|r| ≤ 1e6); past that,
   * stage the products through DECIMAL like the catalog's CUPED moments.
   *
   * @param features one row per example; `xCols` integer-typed feature
   *                 columns, `yCol` a 0/1 integer label
   * @param lr       learning rate applied as `floor(grad/n * lr)` — a
   *                 double LITERAL so both engines parse the same value
   */
  def logisticGd(features: DataFrame, xCols: Seq[String], yCol: String,
      rounds: Int = 3, lr: Double = 0.01): LogisticFit = {
    require(xCols.nonEmpty && rounds >= 1, "need features and >= 1 round")
    val k = xCols.size
    val n = features.count()
    require(n > 0, "logisticGd needs a non-empty feature table")

    def zMicro(w: Array[Long]): Column = logitMicro(xCols, w)

    val history = Iterator.iterate(Array.fill(k + 1)(0L)) { w =>
      val r = hardSigmoidPpm(zMicro(w)) -
        col(yCol).cast("long") * lit(1000000L)
      val grads = features.agg(
        sum(r).as("g0"),
        xCols.zipWithIndex.map { case (c, j) =>
          sum(r * col(c).cast("long")).as(s"g${j + 1}") }: _*).head()
      Array.tabulate(k + 1) { j =>
        // the one IEEE chain per weight: (g / n) * lr, then floor — the
        // same two ops, same order, the oracle runs
        w(j) - math.floor(grads.getLong(j).toDouble / n * lr).toLong
      }
    }.take(rounds + 1).toSeq

    val wf = history.last
    LogisticFit(history, features.withColumn("p_ppm",
      hardSigmoidPpm(zMicro(wf))))
  }

  /**
   * Best single-feature threshold split (a depth-1 decision tree /
   * "1R" rule) by GINI gain — chosen over entropy because Gini is a
   * RATIONAL function of the counts: the node impurity in count units,
   * `G(n, pos) = (n² − pos² − neg²)/n`, is one exact integer numerator
   * and one division, so the gain is a fixed three-term IEEE chain both
   * engines evaluate identically (the floor-log2 entropy stand-in is
   * integer-exact too, but its whole-bit granularity collapses most
   * splits to the same gain — useless for an argmax). Counts must stay
   * below ~3·10⁹ so the squares fit a BIGINT; stage through DECIMAL
   * past that (the CUPED rule).
   *
   * Features must be SMALL-DOMAIN integer bins (the split candidates):
   * per feature the candidate thresholds are its observed bins except
   * the last, cumulated by a window over that bin domain — never a
   * data-sized window. Returns one row per feature with its best
   * threshold (`bin <= thr` goes left), child counts, and the gain in
   * ppm of a row; `is_best` marks the argmax feature (gain desc, then
   * feature asc, then thr asc).
   */
  def bestStump(df: DataFrame, features: Seq[String], yCol: String)
      : DataFrame = {
    require(features.nonEmpty, "bestStump needs at least one feature")
    // weighted Gini impurity in count units: n·(1 − (pos² + neg²)/n²)
    def gini(nc: Column, pos: Column): Column =
      (nc * nc - pos * pos - (nc - pos) * (nc - pos)).cast("double") /
        nc.cast("double")

    val melted = df.select(col(yCol).cast("long").as("y"),
        explode(array(features.map(f =>
          struct(lit(f).as("feature"), col(f).cast("long").as("bin"))): _*))
          .as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bin").as("bin"),
        col("y"))
    val cells = melted.groupBy("feature", "bin")
      .agg(count(lit(1)).as("c"), sum("y").as("pos"))
    val w = Window.partitionBy("feature").orderBy("bin")
    val tot = Window.partitionBy("feature")
    val splits = cells
      .withColumn("n_left", sum("c").over(w))
      .withColumn("pos_left", sum("pos").over(w))
      .withColumn("n", sum("c").over(tot))
      .withColumn("pos_tot", sum("pos").over(tot))
      .withColumn("rk", row_number().over(w))
      .withColumn("nb", count(lit(1)).over(tot))
      .filter(col("rk") < col("nb")) // last bin: right child empty
      .withColumn("gain_num",
        gini(col("n"), col("pos_tot")) -
        gini(col("n_left"), col("pos_left")) -
        gini(col("n") - col("n_left"), col("pos_tot") - col("pos_left")))
    val best = Window.partitionBy("feature")
      .orderBy(col("gain_num").desc, col("bin"))
    val overall = Window.orderBy(col("gain_num").desc, col("feature"),
      col("bin"))
    splits
      .withColumn("pick", row_number().over(best))
      .filter(col("pick") === 1)
      .withColumn("is_best", when(row_number().over(overall) === 1, 1L)
        .otherwise(0L))
      .select(col("feature"), col("bin").as("thr"), col("n"),
        col("n_left"), col("pos_left"),
        floor(lit(1e6) * col("gain_num") / col("n").cast("double"))
          .cast("long").as("gain_ppm"),
        col("is_best"))
  }

  /**
   * Exact ROC AUC by the Mann–Whitney U identity with MIDRANKS for ties
   * (AUC = P(s_pos > s_neg) + P(s_pos = s_neg)/2): group rows by score
   * (one combine-enabled aggregate over the corpus), take one global
   * cumulative over the AGGREGATE (score-domain-bounded — never a
   * corpus-row window), and fold
   *
   *   2·Σ_pos midrank = Σ_s npos(s)·(2·below(s) + cnt(s) + 1)
   *   2U              = that − n_pos·(n_pos + 1)
   *   auc_ppm         = floor(1e6 · 2U / (2·n_pos·n_neg))
   *
   * — integer end to end until the single final floor division, so the
   * value replays bit-identically in any engine. NULL when one class is
   * empty. Output: 1 row (n_pos, n_neg, two_u, auc_ppm).
   */
  def aucPpm(scored: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = scored.groupBy(col(scoreCol).as("sc"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("npos"))
    val below = coalesce(sum(col("cnt")).over(
      Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    byScore.withColumn("below", below)
      .agg(
        sum(col("npos") * (lit(2L) * col("below") + col("cnt") + lit(1L)))
          .as("tspr"),
        sum("npos").as("n_pos"),
        sum(col("cnt") - col("npos")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        (col("tspr") - col("n_pos") * (col("n_pos") + 1L)).as("two_u"))
      .withColumn("auc_ppm",
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("long"))
          .otherwise(floor(lit(1e6) * col("two_u").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double"))).cast("long")))
  }

  /** Result of [[fsEm]]: fitted params (ppm) and the per-pattern match
    * posterior (ppm) under them. */
  final case class FsEmFit(pPpm: Long, mPpm: Array[Long], uPpm: Array[Long],
      posterior: Map[(Long, Long, Long), Long])

  /**
   * Fellegi–Sunter record-linkage parameter estimation (Fellegi & Sunter
   * 1969; EM formulation Winkler 1988) over 3 binary agreement fields,
   * in quantized ppm arithmetic so an external engine replays every
   * round bit-identically (the [[logisticGd]] contract, EM-shaped):
   *
   *   E: w_γ = x_γ·1e6 DIV (x_γ + y_γ), where x_γ folds p through
   *      (g_j ? m_j : 1e6−m_j) with a DIV 1e6 after EACH factor (fixed
   *      quantization points), y_γ the same with (1e6−p) and u_j;
   *   M: p' = (Σ n·w) DIV (Σ n);  m_j' = floor(1e6·Σ(n·w·g_j)/Σ(n·w));
   *      u_j' the same over the (1e6−w) mass — the two divisions are
   *      single IEEE double chains (operands < 2^53, floor'd), and every
   *      new param clamps to [1000, 999000] (degenerate 0/1e6 params
   *      would zero the E-step products permanently).
   *
   * Simultaneous update from one E-step table per round. Driver-side on
   * COLLECTED pattern counts (≤ 8 rows — the corpus-scale work is the
   * one groupBy that produced them), exactly like the GD weight steps.
   */
  def fsEm(patterns: Seq[(Long, Long, Long, Long)], rounds: Int)
      : FsEmFit = {
    require(rounds >= 1 && patterns.nonEmpty, "fsEm needs rounds + data")
    var p = 100000L
    val m = Array(900000L, 900000L, 900000L)
    val u = Array(100000L, 100000L, 100000L)
    def estep(g: Seq[Long]): Long = {
      var x = p
      var y = 1000000L - p
      for (j <- 0 until 3) {
        x = x * (if (g(j) == 1L) m(j) else 1000000L - m(j)) / 1000000L
        y = y * (if (g(j) == 1L) u(j) else 1000000L - u(j)) / 1000000L
      }
      if (x + y == 0L) 0L else x * 1000000L / (x + y)
    }
    def clamp(v: Long): Long = math.min(999000L, math.max(1000L, v))
    for (_ <- 1 to rounds) {
      val ws = patterns.map { case (g1, g2, g3, n) =>
        (Seq(g1, g2, g3), n, estep(Seq(g1, g2, g3)))
      }
      val nTot = ws.map(_._2).sum
      val s = ws.map { case (_, n, w) => n * w }.sum
      val t = ws.map { case (_, n, w) => n * (1000000L - w) }.sum
      p = clamp(s / nTot)
      for (j <- 0 until 3) {
        val bj = ws.collect { case (g, n, w) if g(j) == 1L => n * w }.sum
        val cj = ws.collect { case (g, n, w) if g(j) == 1L =>
          n * (1000000L - w) }.sum
        m(j) = clamp(math.floor(1e6 * bj.toDouble / s.toDouble).toLong)
        u(j) = clamp(math.floor(1e6 * cj.toDouble / t.toDouble).toLong)
      }
    }
    FsEmFit(p, m.clone(), u.clone(),
      patterns.map { case (g1, g2, g3, _) =>
        ((g1, g2, g3), estep(Seq(g1, g2, g3))) }.toMap)
  }

  /**
   * Multinomial naive Bayes text classifier, trained AND scored
   * in-engine (the workhorse of fastText-era corpus labeling: language
   * ID, quality tiers, topic routing). Returns the held-out confusion
   * matrix (label, label_pred, n_docs).
   *
   * Split: deterministic md5 hash of the id — doc `i` is held out iff
   * `md5(i) % testMod == 0`, the same portable split every q_sample_*
   * query uses, so train/test membership is identical across engines.
   *
   * Model, in the catalog's whole-bit surprisal discipline (NO
   * transcendentals — `ln` is 1-ulp engine-dependent, bit lengths are
   * exact): with V = |vocab| and add-one smoothing, the per-occurrence
   * cost of term t under label L is
   *   w(L,t) = bits(tot_L + V) − bits(cnt_{L,t} + 1)   ≈ −log2 p(t|L)
   * (bits(x) = floor(log2 x)+1, one intrinsic), the unseen-term cost is
   * `bits(tot_L + V) − 1`, and the prior cost is
   * `bits(n_train) − bits(n_L)`. Vocabulary is df >= minDf over TRAIN
   * docs — the standard rare-term prune that keeps the model
   * broadcast-sized (Heaps-law tail cut); out-of-vocab test tokens are
   * ignored, as with any fixed-vocabulary classifier.
   *
   * Scale shape: training is two combine-enabled aggregates over the
   * token stream ((label, term) counts and df counts). Scoring never
   * fans the token stream out by |labels|: seen (term -> label) weights
   * arrive by ONE broadcast join of the model onto test tokens, and each
   * doc's score decomposes as
   *   score(d, L) = prior_L + w_unseen_L * n_d + Σ_seen (w − w_unseen_L)
   * so the label grid materializes only at per-DOC granularity (docs ×
   * |labels| rows), not per token. All-integer throughout; argmin with
   * the (score, label) struct-min tiebreak.
   */
  def naiveBayesConfusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, testMod: Int = 5, minDf: Long = 5): DataFrame = {
    require(testMod >= 2 && minDf >= 1, "naiveBayes needs testMod>=2, minDf>=1")
    import graft.plans.GraftExpressions.bit_length_long
    // the tokenized corpus feeds five consumers (vocab df, train counts,
    // priors, train size, the test grid) — materialize the tokenize pass
    // once instead of re-running it per plan reference (r12)
    val base = docs.select(col(idCol).cast("long").as("id"),
        col(labelCol).as("label"),
        TextOps.tokens(col(textCol)).as("ts"))
      .withColumn("is_test",
        conv(substring(md5(col("id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") % testMod === 0)
      .localCheckpoint()
    val toks = base.select(col("id"), col("label"), col("is_test"),
      explode(col("ts")).as("term"))
    val trainToks = toks.filter(!col("is_test"))
    val vocab = trainToks.select("term", "id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("term")
    val cnt = trainToks.join(vocab, Seq("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("cnt"))
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val tot = cnt.groupBy("label").agg(sum("cnt").as("tot"))
    val w = cnt.join(tot, Seq("label")).crossJoin(broadcast(vSize))
      .select(col("label").as("cand"), col("term"),
        (bit_length_long(col("tot") + col("v")) -
          bit_length_long(col("cnt") + lit(1L))).as("w"))
    val nTrain = base.filter(!col("is_test")).agg(count(lit(1)).as("n_train"))
    val pri = base.filter(!col("is_test"))
      .groupBy("label").agg(count(lit(1)).as("n_lab"))
      .join(tot, Seq("label"), "left")
      .crossJoin(broadcast(vSize)).crossJoin(broadcast(nTrain))
      .select(col("label").as("cand"),
        (bit_length_long(col("n_train")) - bit_length_long(col("n_lab")))
          .as("prior_bits"),
        (bit_length_long(coalesce(col("tot"), lit(0L)) + col("v")) -
          lit(1L)).as("w_unseen"))
    val tt = toks.filter(col("is_test")).join(vocab, Seq("term"), "left_semi")
    val nd = tt.groupBy("id").agg(count(lit(1)).as("n_d"))
    val adj = tt.join(broadcast(w), Seq("term"))
      .join(broadcast(pri), Seq("cand"))
      .groupBy("id", "cand")
      .agg(sum(col("w") - col("w_unseen")).as("adj"))
    val grid = base.filter(col("is_test")).select("id", "label")
      .crossJoin(broadcast(pri))
      .join(nd, Seq("id"), "left")
      .join(adj, Seq("id", "cand"), "left")
      .select(col("id"), col("label"), col("cand"),
        (col("prior_bits") + col("w_unseen") * coalesce(col("n_d"), lit(0L))
          + coalesce(col("adj"), lit(0L))).as("score"))
    grid.groupBy("id", "label")
      .agg(min(struct(col("score"), col("cand"))).as("b"))
      .groupBy(col("label"), col("b.cand").as("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
