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
}
