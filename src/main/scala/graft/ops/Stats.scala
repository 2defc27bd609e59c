package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-profiling operators — the ANALYZE/statistics surface of the engine:
 * per-column summary statistics and equi-width value histograms, the inputs
 * a query planner's CBO, a data-quality monitor, or a pipeline drift check
 * consumes.
 *
 * Reference analog: the ingestion system's per-table row-count bookkeeping
 * (`transform_light.py`'s count logging) generalized to the per-column
 * statistics a lakehouse table format keeps in its metadata.
 */
object Stats {

  /**
   * ANALYZE-style column profile: one row per requested column with
   * `(col_name, n_rows, n_null, n_distinct, min_val, max_val)`. ONE
   * aggregation pass over the table; min/max are rendered as strings so
   * heterogeneous column types share the output schema.
   *
   * Scale note: the exact `count_distinct` over k columns plans as a Spark
   * Expand (each input row shuffled k times, tagged per distinct-aggregate).
   * That is the canonical exact plan; for very wide profiles over 100 TB
   * swap in the KMV sketch ([[graft.plans.KmvDistinct]]) — one pass, O(k)
   * state per column, no Expand — at the price of an estimate.
   *
   * The distinct aggregates and the min/max aggregates run as two separate
   * (cross-joined single-row) passes on purpose: string-typed min/max has
   * an immutable agg buffer, and fusing it into the Expand aggregate
   * downgrades the WHOLE operator to SortAggregate — sorting k x n expanded
   * rows. Split, the distinct path stays a HashAggregate and the min/max
   * pass is a global aggregate with no grouping key (no sort at all); the
   * second column-pruned scan is linear and cheaper than the avoided
   * n log n sort at any scale.
   */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val ndAggs: Seq[Column] =
      cols.map(c => count_distinct(col(c)).as(s"_nd_$c"))
    val basicAggs: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(basicAggs.head, basicAggs.tail: _*)
      .crossJoin(df.agg(ndAggs.head, ndAggs.tail: _*))
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /**
   * The 100 TB profile: same shape as [[profileColumns]] but distinct
   * counts come from the KMV sketch ([[graft.plans.KmvDistinct]]) — ONE
   * global aggregation pass over the table, no Expand (nothing is
   * replicated k times into the shuffle), no second scan, O(k) state per
   * column. `n_distinct` becomes an estimate (exact below the sketch size);
   * everything else stays exact. Deterministic: the sketch is a pure
   * function of md5-derived hashes, so the oracle replays it bit-for-bit —
   * the hash is [[graft.plans.Md5Prefix60]] (= `conv(substr(md5(x),1,15),
   * 16,10)` without the hex render / substring / base-16 re-parse per row).
   *
   * For pipelines that don't need engine-external replay,
   * [[profileColumnsSketch]] swaps the md5 for `xxhash64` — same sketch,
   * ~an order of magnitude cheaper per row.
   */
  def profileColumnsApprox(df: DataFrame, cols: Seq[String],
      sketchK: Int = 256): DataFrame =
    kmvProfile(df, cols, sketchK, c =>
      graft.plans.GraftExpressions.md5_prefix60(col(c).cast("string")))

  /**
   * Production variant of [[profileColumnsApprox]]: the sketch hash is
   * Spark's codegen'd `xxhash64` (shifted into the same [0, 2^60) space) —
   * no cryptographic digest per row. Identical plan shape and estimate
   * error; NOT replayable by an external engine (xxhash64's seed/layout is
   * Spark-specific), so correctness is pinned by spec against the exact
   * profile instead of the DuckDB oracle.
   */
  def profileColumnsSketch(df: DataFrame, cols: Seq[String],
      sketchK: Int = 256): DataFrame =
    kmvProfile(df, cols, sketchK, c =>
      shiftrightunsigned(xxhash64(col(c).cast("string")), 4))

  private def kmvProfile(df: DataFrame, cols: Seq[String], sketchK: Int,
      hash60: String => Column): DataFrame = {
    require(cols.nonEmpty, "profileColumnsApprox needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        graft.plans.GraftExpressions.kmv_distinct(hash60(c), sketchK)
          .as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct_est"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /**
   * EXACT grouped discrete quantiles — `percentile_disc` semantics: for
   * each group and each `q`, the smallest value whose cumulative count
   * reaches `ceil(q * n)`. Output (group…, q, value, rank, n_rows).
   *
   * Scale shape — the reason this is NOT a row_number window over the data:
   * exact order statistics need a per-group ordering, but they only need it
   * over the DISTINCT-VALUE CELL TABLE, not the corpus. One groupBy
   * (group, value) with map-side combine collapses 100 TB to
   * |group x distinct value| cells; the cumulative-sum window then runs
   * over that bounded table (same cells-table pattern as
   * [[countAnomalies]]). The quantile row is selected exactly by
   * `cum - cnt < rank <= cum` — integer arithmetic end to end, so any
   * engine replays it bit-for-bit (`ceil(q*n)` is one IEEE multiply of the
   * same literal on both sides). Values with unbounded cardinality (raw
   * doubles at 100 TB) belong to [[histogram]] or a sketch instead — the
   * cell table is only as bounded as the value domain.
   */
  def quantilesDisc(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles $qs must lie in (0, 1]")
    val gcols = groupCols.map(col)
    val cells = df.filter(col(valueCol).isNotNull)
      .groupBy(gcols :+ col(valueCol).as("v"): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("v").asc)
    val totals = cells.groupBy(gcols: _*).agg(sum("cnt").as("n_rows"))
    val cum = cells.withColumn("cum", sum("cnt").over(w))
      .join(broadcast(totals), groupCols)
    cum.select(gcols ++ Seq(col("v"), col("cnt"), col("cum"), col("n_rows"),
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .withColumn("rank", ceil(col("q") * col("n_rows")).cast("long"))
      .withColumn("rank", greatest(col("rank"), lit(1L)))
      .filter(col("cum") - col("cnt") < col("rank") &&
        col("rank") <= col("cum"))
      .select(gcols ++ Seq(col("q"), col("v").as("value"), col("rank"),
        col("n_rows")): _*)
  }

  /**
   * Per-group winsorization: clamp an integer-quantized measure to its
   * group's [lo, hi] discrete quantiles and report the clamped aggregate —
   * the outlier-robust feature-scaling step of a tabular/feature pipeline
   * (a corrupt 1e12 sensor reading must not drag a 100 TB mean).
   *
   * Bounds are the exact type-III quantiles of [[quantilesDisc]] (so the
   * oracle replays them bit-for-bit); they come back as ONE row per group
   * and broadcast-join onto the fact scan, so the clamp itself is pure
   * scan-stage work followed by one combine-enabled aggregate — two passes
   * over the facts total, no fact-side window anywhere. `valueCol` must
   * already be integer-quantized (cents, not raw doubles): the winsorized
   * sum is then an exact BIGINT, order-independent across partitions.
   *
   * Output: groupCols + (n_rows, n_lo, n_hi, lo_v, hi_v, sum_w) where
   * n_lo/n_hi count clamped rows and sum_w is the clamped BIGINT sum.
   */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo > 0 && hi <= 1 && lo < hi, s"need 0 < lo < hi <= 1: $lo, $hi")
    val gcols = groupCols.map(col)
    val facts = df.filter(col(valueCol).isNotNull)
    val bounds = quantilesDisc(facts, groupCols, valueCol, Seq(lo, hi))
      .groupBy(gcols: _*)
      .agg(min(when(col("q") === lo, col("value"))).as("lo_v"),
        min(when(col("q") === hi, col("value"))).as("hi_v"))
    val v = col(valueCol)
    facts.join(broadcast(bounds), groupCols)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(v < col("lo_v"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(v > col("hi_v"), 1L).otherwise(0L)).as("n_hi"),
        min(col("lo_v")).as("lo_v"), min(col("hi_v")).as("hi_v"),
        sum(least(greatest(v, col("lo_v")), col("hi_v"))).as("sum_w"))
  }

  /**
   * Robust outlier profile via the median absolute deviation: a row is an
   * outlier when |v - median| > k · MAD — unlike the mean/std gate
   * ([[countAnomalies]]), the thresholds themselves cannot be dragged by
   * the outliers being hunted (a corrupt 1e12 reading shifts a mean but
   * not a median). Both the median and the MAD are exact type-III
   * discrete quantiles ([[quantilesDisc]]) of the integer-quantized
   * measure, each returning ONE row per group broadcast onto the fact
   * scan — three fact passes total, all windows bounded by the value
   * domain (the cell tables), never the corpus.
   *
   * Output: groupCols + (n_rows, med, mad, n_out).
   */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 3): DataFrame = {
    val gcols = groupCols.map(col)
    // lazy cuts (r13): facts feeds the median walk and the deviation
    // join; dev feeds the MAD walk and the final outlier aggregate —
    // compute each once via the checkpoint cache
    val facts = df.filter(col(valueCol).isNotNull).localCheckpoint(false)
    val med = quantilesDisc(facts, groupCols, valueCol, Seq(0.5))
      .groupBy(gcols: _*).agg(min("value").as("med"))
    val dev = facts.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol) - col("med")))
      .localCheckpoint(false)
    val mad = quantilesDisc(dev, groupCols, "dev", Seq(0.5))
      .groupBy(gcols: _*).agg(min("value").as("mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        min("med").as("med"), min("mad").as("mad"),
        sum(when(col("dev") > lit(k.toLong) * col("mad"), 1L)
          .otherwise(0L)).as("n_out"))
  }

  /**
   * Equi-depth (quantile) binning of an integer-quantized measure — the
   * feature-discretization step of a tabular-training pipeline (and the
   * histogram whose buckets carry equal mass rather than equal width).
   *
   * Boundaries are the exact type-III discrete quantiles of
   * [[quantilesDisc]] at i/bins; a value equal to a boundary falls in the
   * LOWER bin (assignment is `count of boundaries < v` — deterministic
   * under ties, bit-identical in the oracle). The at-most-(bins-1)
   * boundary values come back to the driver and compile into a codegen'd
   * comparison chain, so assignment is pure scan-stage work; the output
   * profile is one combine-enabled aggregate.
   *
   * Scale note: the boundary computation windows over the DISTINCT-VALUE
   * cell table, so its state is bounded by the measure's value domain,
   * not the corpus — quantize accordingly (whole dollars, not cents, for
   * a 100 TB price profile). Heavily-duplicated domains collapse in the
   * map-side combine of the cell aggregate.
   *
   * Output: (bin, n_rows, min_v, max_v), bins numbered 0..bins-1; empty
   * bins (possible when one value carries more than 1/bins of the mass)
   * are simply absent.
   */
  def equiDepthBins(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 2, s"equiDepthBins needs bins >= 2, got $bins")
    val v = df.select(value.cast("long").as("v")).filter(col("v").isNotNull)
    val qs = (1 until bins).map(_.toDouble / bins)
    val bounds = quantilesDisc(v, Nil, "v", qs)
      .select(col("value")).distinct()
      .collect().map(_.getLong(0)).sorted
    val bin = bounds.map(b => when(col("v") > lit(b), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0)).cast("long")
    v.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /**
   * Z-score anomaly gate over count cells, in EXACT integer arithmetic:
   * counts rows per (group, cell), then flags cells whose count deviates
   * from their group's mean by more than `k` population standard
   * deviations. The test `(x - mean)^2 > k^2 * var` is evaluated as
   * `(x*n - sum)^2 > k^2 * (n*sumsq - sum^2)` — both sides exact BIGINTs
   * (multiply through by n^2), so there is NO floating-point anywhere and
   * any engine agrees bit-for-bit. Strict inequality: a group with zero
   * variance flags nothing, and a single-cell group never flags itself.
   *
   * Shape: one count shuffle on (group, cell); the per-group moments
   * aggregate over the already-tiny cell table and broadcast back.
   *
   * Domain bound: the int64 products are exact while
   * |cell_count x n_cells - s1| < 3e9 (its square < 2^63); for groups
   * beyond that, cast the moment columns to DecimalType(38,0) before the
   * comparison — same algebra, 128-bit exactness.
   */
  /**
   * Differentially-private histogram release (the geometric mechanism of
   * Ghosh–Roughgarden–Sundararajan 2009 with α = 1/2, plus the two
   * steps every production DP release pairs it with):
   *
   *  1. CONTRIBUTION BOUNDING — each user's distinct cells are ranked by a
   *     deterministic per-user hash order and capped at `cap`, so one user
   *     can change at most `cap` cell counts by 1 each (L0 sensitivity =
   *     cap, L∞ = 1). Without this step a histogram over user events has
   *     unbounded sensitivity and NO ε holds.
   *  2. NOISE — each cell's count gets two-sided-geometric (discrete
   *     Laplace) noise: G1 − G2 with Gi ~ Geometric(1/2), realized as the
   *     trailing-ones count of a cell-keyed hash (P(k ones) = 2^-(k+1),
   *     exactly geometric). At α = 1/2 a one-unit count change shifts the
   *     noise distribution by ln 2 of privacy loss, so the release is
   *     (cap · ln 2)-DP per user over the whole histogram (parallel
   *     composition across cells, sequential across one user's ≤ cap
   *     cells). Tighter ε ⇒ lower cap.
   *  3. PARTITION SELECTION — only cells whose NOISY count clears
   *     `threshold` are released (the stability-based suppression that
   *     keeps rare cells — e.g. one-user cells — out of the release).
   *
   * DETERMINISM CAVEAT (deliberate): the noise is keyed by md5(cell), which
   * makes the release replayable by the DuckDB oracle and stable across
   * re-runs — the testing twin of the real mechanism. A PRODUCTION release
   * swaps `seed` for a secret one-time value; the distribution (and thus
   * the utility/ε analysis) is identical, the replayability disappears.
   *
   * Scale shape: distinct (user, cell) is one shuffle; the per-user cap is
   * a user-partitioned rank (fan-out bounded by a user's distinct cells);
   * cell counts are ONE combine-enabled aggregate; noise + suppression are
   * scan-stage expressions on the (small) cell table. No corpus-sized
   * window, nothing driver-side.
   *
   * Output: (cell, released) — surviving cells with their noisy counts.
   * True counts are never emitted.
   */
  def dpHistogram(df: DataFrame, userCol: String, cellCols: Seq[String],
      cap: Int, threshold: Long, seed: String = "dp"): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1 (it is the L0 sensitivity)")
    require(threshold >= 0, s"threshold=$threshold must be >= 0")
    val w = org.apache.spark.sql.expressions.Window
    val cell = concat_ws("|", cellCols.map(c => col(c).cast("string")): _*)
    val contrib = df
      .select(col(userCol).cast("string").as("u"), cell.as("cell"))
      .distinct()
    val ranked = contrib
      .withColumn("rk", row_number().over(w.partitionBy("u")
        .orderBy(md5(concat_ws("|", col("u"), col("cell"))), col("cell"))))
      .filter(col("rk") <= cap)
    val counts = ranked.groupBy("cell").agg(count(lit(1)).as("n"))
    counts
      .withColumn("released",
        greatest(lit(0L), col("n") + dpGeo(s"${seed}1|", col("cell")) -
          dpGeo(s"${seed}2|", col("cell"))))
      .filter(col("released") >= threshold)
      .select(col("cell"), col("released"))
  }

  /** Geometric(1/2) draw = trailing-ones count of 40 key-derived hash
    * bits: ~x & (x+1) isolates the lowest zero bit as 2^k, bin-length
    * recovers k — whole-bit integer ops only, so DuckDB replays
    * bit-for-bit. Shared by [[dpHistogram]] and [[dpMeans]]. */
  private def dpGeo(prefix: String, key: Column): Column = {
    val x = conv(substring(md5(concat(lit(prefix), key)), 1, 10), 16, 10)
      .cast("long")
    least(length(bin(bitwise_not(x).bitwiseAND(x + lit(1L)))) - lit(1),
      lit(40)).cast("long")
  }

  /**
   * Differentially-private per-group MEAN release — the bounded-sum
   * mechanism that completes [[dpHistogram]]'s count release: each
   * user's values are first CLIPPED to [0, clip] (the sensitivity bound
   * — without it a sum release has no ε), each user contributes at most
   * ONE row per group (their clipped per-group total, itself re-clipped:
   * L0 = 1 group here, L∞ = clip), then both the noisy SUM (noise scaled
   * by clip: value sensitivity) and the noisy COUNT (unit noise) are
   * released and the mean is their ratio, floor-quantized. Same
   * two-sided Geometric(1/2) noise and replayable-seed caveat as
   * [[dpHistogram]]; groups below `threshold` noisy users are
   * suppressed.
   *
   * Shape: one (user, group) aggregate + one group aggregate, noise
   * scan-stage on the (small) group table.
   */
  def dpMeans(df: DataFrame, userCol: String, groupCol: String,
      valueCol: Column, clip: Long, threshold: Long,
      seed: String = "dpm"): DataFrame = {
    require(clip >= 1, s"clip=$clip must be >= 1 (the L∞ sensitivity)")
    require(threshold >= 0, s"threshold=$threshold must be >= 0")
    val perUser = df
      .select(col(userCol).cast("string").as("u"),
        col(groupCol).cast("string").as("g"),
        greatest(lit(0L), least(valueCol.cast("long"), lit(clip)))
          .as("v"))
      .groupBy("u", "g")
      .agg(least(sum(col("v")), lit(clip)).as("uv"))
    val g = perUser.groupBy("g")
      .agg(sum(col("uv")).as("s"), count(lit(1)).as("n"))
    val noisyN = greatest(lit(0L),
      col("n") + dpGeo(s"${seed}n1|", col("g")) -
        dpGeo(s"${seed}n2|", col("g")))
    val noisyS = greatest(lit(0L),
      col("s") + lit(clip) * (dpGeo(s"${seed}s1|", col("g")) -
        dpGeo(s"${seed}s2|", col("g"))))
    g.select(col("g"), noisyN.as("released_n"), noisyS.as("released_sum"))
      .filter(col("released_n") >= threshold)
      // nullif: at threshold 0 a fully-suppressed-to-zero group would
      // otherwise divide 0/0 (Spark NaN->cast vs DuckDB error — the
      // q_agg_cuped asymmetric-failure lesson)
      .withColumn("mean_milli",
        floor(col("released_sum").cast("double") * 1e3 /
          nullif(col("released_n"), lit(0L)).cast("double")).cast("long"))
  }

  def countAnomalies(df: DataFrame, groupCols: Seq[String], cellCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val gcols = groupCols.map(col)
    val cells = df.groupBy(gcols :+ cellCol.as("cell"): _*)
      .agg(count(lit(1)).as("n_rows"))
    val moments = cells.groupBy(gcols: _*).agg(
      count(lit(1)).as("n_cells"),
      sum(col("n_rows")).as("s1"),
      sum(col("n_rows") * col("n_rows")).as("s2"))
    val dev = col("n_rows") * col("n_cells") - col("s1")
    cells.join(broadcast(moments), groupCols)
      .filter(dev * dev >
        lit(k.toLong * k) * (col("n_cells") * col("s2") - col("s1") * col("s1")))
      .select(gcols ++ Seq(col("cell"), col("n_rows"), col("n_cells"),
        col("s1"), col("s2")): _*)
  }

  /**
   * Equi-width histogram of a numeric column: `buckets` bins over the
   * observed [min, max], rows `(bucket, lo, hi, n)`. Two passes — a bounds
   * aggregate (one tiny driver row), then one bucketing groupBy whose key
   * count is `buckets`, so the shuffle is bounded regardless of table size.
   * The max value lands in the last bucket (`least`-capped), NULLs are
   * excluded, and a constant column collapses to bucket 0.
   *
   * Cross-engine determinism: the bucket expression is evaluated in one
   * fixed order — `floor((x - mn) / span * buckets)` — and bounds are
   * floor-quantized to 6 dp, so any IEEE-754 engine computing the same
   * expression tree reproduces the rows bit-for-bit.
   */
  def histogram(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    val r = df.agg(min(col(valueCol)).cast("double"),
      max(col(valueCol)).cast("double")).head()
    require(!r.isNullAt(0), s"histogram: $valueCol has no non-null values")
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val span = mx - mn
    val bucket = (if (span == 0d) lit(0.0)
      else least(floor((col(valueCol).cast("double") - mn) / span * buckets),
        lit(buckets - 1.0))).cast("long")
    def q6(c: Column): Column = floor(c * 1e6) / 1e6
    df.filter(col(valueCol).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        q6(lit(mn) + col("bucket") * span / buckets).as("lo"),
        q6(lit(mn) + (col("bucket") + 1) * span / buckets).as("hi"),
        col("n"))
  }

  /**
   * Categorical drift between two samples as per-category chi-square
   * contributions — the distribution-shift monitor a corpus pipeline runs
   * between snapshots / batches ("did today's crawl change the language
   * mix?"). For category i with observed counts o_i (current) and r_i
   * (reference), Laplace-smoothed (+1 per category, totals + L):
   *
   *   e_i     = r'_i * curT' / refT'          (expected under reference)
   *   chi2_i  = (o'_i - e_i)^2 / e_i
   *           = (o'_i*refT' - r'_i*curT')^2 / (r'_i * curT' * refT')
   *
   * The smoothing makes every category well-defined even when it appears
   * in only one sample (new language shows up = large, finite
   * contribution). All terms are exact BIGINTs; the single division runs
   * in doubles (one correctly-rounded IEEE op) and is floor-quantized to
   * 6 dp — bit-identical in any engine. Compare Σ chi2_i to the usual
   * critical values, or alert on the top contributors directly.
   * Exactness bound: the squared numerator is a BIGINT product, exact while
   * count * total < 2^31.5 per side (~3e9 rows with ~100 categories);
   * beyond that pre-aggregate counts to coarser units or promote the
   * products to decimal(38,0) — the formula is unchanged.
   *
   * Distributed shape: one combine-enabled groupBy per sample, a tiny
   * (L-row) union-aggregate, and a broadcast of the two totals — no
   * corpus-sized shuffle beyond the counting pass.
   *
   * Output: (category, n_cur, n_ref, chi2) — one row per category of
   * either sample, chi2 quantized to 6 dp.
   */
  def chiSquareDrift(cur: DataFrame, ref: DataFrame,
      catCol: String): DataFrame = {
    val o = cur.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_cur"))
    val r = ref.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_ref"))
    val cells = o.join(r, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val totals = broadcast(cells.agg(
      (sum(col("n_cur")) + count(lit(1))).as("curT"),
      (sum(col("n_ref")) + count(lit(1))).as("refT")))
    cells.crossJoin(totals)
      .select(col("category"), col("n_cur"), col("n_ref"),
        (floor(
          (((col("n_cur") + 1) * col("refT") - (col("n_ref") + 1) * col("curT"))
            * ((col("n_cur") + 1) * col("refT") - (col("n_ref") + 1) * col("curT")))
            .cast("double") /
          ((col("n_ref") + 1) * col("curT") * col("refT")).cast("double")
          * 1e6) / 1e6).as("chi2"))
  }

  /**
   * Quantile BOUNDS from power-of-two buckets — the 100 TB quantile path.
   * [[quantilesDisc]] is exact but windows over the distinct-value cell
   * table (fine for domain-bounded measures, wrong for high-cardinality
   * ones); this sketch buckets every non-negative value by its bit length
   * (`bits(v+1)` — at most 64 buckets per group, one combine-enabled
   * aggregate, and the cumulative window touches <= 64 rows per group), so
   * its state is CONSTANT regardless of corpus or domain size. The price
   * is resolution: each quantile comes back as the [lo, hi] range of its
   * bucket (a factor-of-two bound, like an HDR-histogram with one bucket
   * per octave), plus the exact in-bucket count and ceil-rank — exactly
   * the information a partition planner or skew detector needs.
   *
   * All integer arithmetic; ranks use the same ceil(q*n) type-III
   * convention as [[quantilesDisc]], so the bucket reported here always
   * CONTAINS the exact discrete quantile.
   *
   * Output: (group..., q, rank, n_rows, bucket, lo, hi, n_in_bucket).
   */
  def quantileBounds(df: DataFrame, groupCols: Seq[String], value: Column,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles $qs must lie in (0, 1]")
    val gcols = groupCols.map(col)
    val v = df.select(gcols :+ value.cast("long").as("v"): _*)
      .filter(col("v").isNotNull && col("v") >= 0)
    val cells = v.groupBy(gcols :+
        graft.plans.GraftExpressions.bit_length_long(col("v") + 1)
          .as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("bucket").asc)
    val totals = cells.groupBy(gcols: _*).agg(sum("cnt").as("n_rows"))
    val cum = cells.withColumn("cum", sum("cnt").over(w))
      .join(broadcast(totals), groupCols)
    cum.select(gcols ++ Seq(col("bucket"), col("cnt"), col("cum"),
        col("n_rows"), explode(array(qs.map(lit): _*)).as("q")): _*)
      .withColumn("rank",
        greatest(ceil(col("q") * col("n_rows")).cast("long"), lit(1L)))
      .filter(col("cum") - col("cnt") < col("rank") &&
        col("rank") <= col("cum"))
      .select(gcols ++ Seq(col("q"), col("rank"), col("n_rows"),
        col("bucket"),
        (expr("shiftleft(1L, cast(bucket as int) - 1)") - 1).as("lo"),
        (expr("shiftleft(1L, cast(bucket as int))") - 2).as("hi"),
        col("cnt").as("n_in_bucket")): _*)
  }

  /**
   * Chi-square drift TREND: [[chiSquareDrift]]'s two-sample statistic
   * computed between every pair of SUCCESSIVE time cells in one plan — the
   * continuous monitoring face (a dashboard of "how much did yesterday's
   * event mix shift from the day before") rather than the one-shot
   * cur-vs-ref compare.
   *
   * Per cell pair, the category universe is the union of categories seen
   * in either cell (two equi-joins + union-distinct — never an OR-join,
   * which would plan a nested loop); Laplace smoothing adds one
   * pseudo-count per category exactly as in [[chiSquareDrift]]. Each
   * category contribution is floor-quantized to integer MICRO-units and
   * summed as BIGINTs — order-independent, so the per-cell total replays
   * exactly (a double sum would depend on reduction order). The squared
   * numerator is computed in DOUBLE (cast once, then multiply) because
   * num² overflows BIGINT for daily-scale cells; the cast-multiply-divide
   * chain is the same correctly-rounded IEEE sequence in both engines.
   *
   * The lag window runs over the DISTINCT-CELL table (calendar-bounded
   * state); corpus-sized work is one combine-enabled (cell, category)
   * count.
   *
   * Output: (cell, n_cats, chi2_micros, chi2) — one row per cell that has
   * a predecessor.
   */
  def driftTrend(df: DataFrame, cellCol: Column, catCol: String): DataFrame = {
    val wc = df.groupBy(cellCol.as("cell"), col(catCol).as("category"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("cell")
    val paired = wc.select("cell").distinct()
      .withColumn("prev", lag(col("cell"), 1).over(w))
      .filter(col("prev").isNotNull)
    val catsCur = paired.join(wc.select(col("cell"), col("category")), Seq("cell"))
      .select(col("cell"), col("prev"), col("category"))
    val catsPrev = paired.join(
        wc.select(col("cell").as("prev"), col("category")), Seq("prev"))
      .select(col("cell"), col("prev"), col("category"))
    val cats = catsCur.union(catsPrev).distinct()
    val full = cats
      .join(wc.select(col("cell"), col("category"), col("n").as("nc0")),
        Seq("cell", "category"), "left_outer")
      .join(wc.select(col("cell").as("prev"), col("category"),
        col("n").as("nr0")), Seq("prev", "category"), "left_outer")
      .select(col("cell"), col("category"),
        coalesce(col("nc0"), lit(0L)).as("nc"),
        coalesce(col("nr0"), lit(0L)).as("nr"))
    val tot = full.groupBy("cell").agg(
      (sum(col("nc")) + count(lit(1))).as("curT"),
      (sum(col("nr")) + count(lit(1))).as("refT"))
    val num = ((col("nc") + 1) * col("refT") -
      (col("nr") + 1) * col("curT")).cast("double")
    val contrib = full.join(tot, Seq("cell"))
      .select(col("cell"),
        floor(num * num /
          ((col("nr") + 1) * col("curT") * col("refT")).cast("double")
          * 1e6).cast("long").as("chi2_micros"))
    contrib.groupBy("cell")
      .agg(count(lit(1)).as("n_cats"), sum(col("chi2_micros")).as("chi2_micros"))
      .select(col("cell"), col("n_cats"), col("chi2_micros"),
        (col("chi2_micros").cast("double") / 1e6).as("chi2"))
  }

  /**
   * Per-group Pearson correlation between two INTEGER-QUANTIZED measures —
   * the column-relationship profile (feature redundancy / leakage scan) a
   * pipeline runs before training on tabular features.
   *
   * Callers pass x and y already quantized to integer units (cents, whole
   * dollars — the catalog's money discipline), so all five moment sums are
   * exact BIGINTs accumulated in ONE combine-enabled aggregate: n, Σx, Σy,
   * Σxy, Σx², Σy². The correlation itself needs cross-products of those
   * sums (n·Σxy can exceed 2^63), so the final formula runs in
   * decimal(38,0) — exact, mirrored by HUGEINT in the oracle — and only
   * then converts: corr = num / sqrt(dx) / sqrt(dy), three IEEE ops on
   * correctly-rounded conversions, floor-quantized to 6 dp. Groups with
   * zero variance in either measure yield NULL.
   *
   * Overflow headroom: BIGINT moment sums hold to |x|,|y| ≤ ~1e7 units at
   * ~1e9 rows/group; beyond that (the 100 TB full-table profile), quantize
   * coarser or promote the x·y products to decimal(38,0) BEFORE summing —
   * the aggregate stays map-side combinable either way.
   */
  def pearson(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    val g = df.select(groupCols.map(col) :+ x.cast("long").as("x")
      :+ y.cast("long").as("y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val dx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val dy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    g.select(groupCols.map(col) ++ Seq(col("n"), col("sx"), col("sy"),
      col("sxy"), col("sxx"), col("syy"),
      when(dx > 0 && dy > 0,
        floor(num.cast("double") / sqrt(dx.cast("double")) /
          sqrt(dy.cast("double")) * 1e6) / 1e6).as("corr")): _*)
  }

  /**
   * Deterministic HyperLogLog (Flajolet et al. 2007) distinct-count
   * summary — the CONSTANT-state companion to the KMV sketch: 2^p
   * registers regardless of cardinality, each the max leading-zero rank
   * seen in its hash bucket, merged by max (map-side combinable; the
   * groupBy(bucket) state is m rows total).
   *
   * Engine-replayable by construction, unlike Spark's builtin
   * `approx_count_distinct` (HLL++ with implementation-defined hashing):
   *   - hash = first 60 bits of md5 (the catalog's cross-engine hash);
   *     top p bits bucket, the remaining 60-p bits feed the rank
   *     rho = (60-p+1) - bit_length(remainder)  (remainder 0 -> max rank)
   *   - the harmonic denominator Σ 2^-M_j is accumulated as an EXACT
   *     BIGINT in units of 2^-(60-p+1) — every term a power of two, so
   *     the sum is order-independent (no float accumulation anywhere)
   *   - the raw estimate alpha·m²/Σ is ONE double constant (computed
   *     once, interpolated identically into the oracle) divided by the
   *     exact integer — a single IEEE op, bit-identical across engines.
   *
   * Output (one row): v_empty (untouched registers), s_units (the exact
   * integer denominator), hll_raw (floored raw estimate). The raw
   * estimate is the sketch-defined quantity; the small-range
   * linear-counting correction (m·ln(m/V)) is a PRESENTATION choice left
   * to callers — ln is libm-dependent and would break cross-engine
   * replay. Relative error ~1.04/sqrt(m) in the calibrated range
   * (n >~ 2.5m).
   */
  def hllSummary(df: DataFrame, valueCol: String, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"hllSummary needs 4 <= p <= 16, got $p")
    val m = 1 << p
    val remBits = 60 - p
    val rhoMax = remBits + 1
    val h = conv(substring(md5(col(valueCol).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val bucket = shiftright(h, remBits)
    val rem = h.bitwiseAND(lit((1L << remBits) - 1))
    val rho = lit(rhoMax.toLong) -
      graft.plans.GraftExpressions.bit_length_long(rem)
    val regs = df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
    val unit = expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rhoMax - rho AS INT))")
    val alphaC = 0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble *
      math.pow(2.0, rhoMax)
    regs.agg(count(lit(1)).as("n_filled"), sum(unit).as("s_filled"))
      .select(
        (lit(m.toLong) - col("n_filled")).as("v_empty"),
        (col("s_filled") +
          (lit(m.toLong) - col("n_filled")) * lit(1L << rhoMax))
          .as("s_units"))
      .select(col("v_empty"), col("s_units"),
        floor(lit(alphaC) / col("s_units").cast("double")).cast("long")
          .as("hll_raw"))
  }

  /**
   * Functional-dependency violation audit (the Metanome-class profiling
   * check): for each declared FD `det -> dep`, how many determinant
   * groups exist, how many carry MORE than one dependent value (the FD
   * violations), and the worst group's dependent cardinality. The check
   * an ingest runs before trusting a column as a lookup key or a
   * denormalization as consistent.
   *
   * One combine-enabled two-level aggregate per FD ((det..., dep) count,
   * then det rollup) — no window, no join; FDs are checked independently
   * and unioned, so the whole audit is a handful of scans that AQE can
   * overlap. Exact counts (BIGINT); `null` dependent values count as a
   * distinct value (a null amid reals IS an inconsistency).
   */
  def fdViolations(df: DataFrame,
      fds: Seq[(Seq[String], String)]): DataFrame = {
    require(fds.nonEmpty, "fdViolations needs at least one declared FD")
    fds.map { case (det, dep) =>
      val g = df
        .select((det.map(col) :+
          coalesce(col(dep).cast("string"), lit("<NULL>")).as("__dep")): _*)
        .groupBy((det.map(col) :+ col("__dep")): _*)
        .agg(count(lit(1)).as("__n"))
        .groupBy(det.map(col): _*)
        .agg(count(lit(1)).as("card"), sum("__n").as("rows"))
      g.agg(count(lit(1)).as("n_groups"),
          sum(when(col("card") > 1, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when(col("card") > 1, col("rows")).otherwise(0L))
            .as("n_violating_rows"),
          max(col("card")).as("max_dep_cardinality"))
        .select(lit(det.mkString(",") + "->" + dep).as("fd"),
          col("n_groups"), col("n_violating_groups"),
          col("n_violating_rows"), col("max_dep_cardinality"))
    }.reduce(_ unionByName _)
  }

  /** Referential-integrity audit: for each declared (child, fkCol, parent,
    * pkCol, name) edge, counts the child rows and distinct keys whose
    * foreign key has no parent row. Shape per edge: one combine-enabled
    * key-count aggregate (corpus → |distinct keys| rows), then a LEFT ANTI
    * join against the parent's key column — broadcast when the parent is
    * dimension-sized, shuffled otherwise (AQE decides); both linear and
    * skew-free at 100 TB because the anti-join's left side is already one
    * row per key. Null FKs are reported separately instead of being
    * silently dropped the way SQL `NOT IN` would. This is the pre-merge
    * key-sanity gate the reference's stage loads assume implicitly when
    * they inject source-side joins (load_with_query.py:129-150). */
  def riAudit(rels: Seq[(DataFrame, String, DataFrame, String, String)])
      : DataFrame = {
    require(rels.nonEmpty, "riAudit needs at least one declared relationship")
    rels.map { case (child, fk, parent, pk, name) =>
      val ck = child.groupBy(col(fk).as("k")).agg(count(lit(1)).as("n"))
      val nulls = ck.filter(col("k").isNull)
        .agg(coalesce(sum("n"), lit(0L)).as("n_null_rows"))
      val keyed = ck.filter(col("k").isNotNull)
      val tot = keyed.agg(coalesce(sum("n"), lit(0L)).as("n_nonnull"),
        count(lit(1)).as("n_keys"))
      val orph = keyed
        .join(parent.select(col(pk).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_keys"),
          coalesce(sum("n"), lit(0L)).as("n_orphan_rows"))
      // three 1-row aggregates — the crossJoins are literal-sized anchors
      tot.crossJoin(nulls).crossJoin(orph).select(
        lit(name).as("relationship"),
        (col("n_nonnull") + col("n_null_rows")).as("n_rows"),
        col("n_null_rows"), col("n_keys"), col("n_orphan_keys"),
        col("n_orphan_rows"))
    }.reduce(_ unionByName _)
  }

  /** The exact double constant [[hllSummary]] divides by, for oracle
    * interpolation (Double.toString round-trips, so both engines parse
    * the identical bits). */
  /**
   * Pairwise mutual information between categorical column pairs, in the
   * catalog's integer floor-log2 units (the [[q_profile_entropy]]
   * discipline: `bl(c) = floor(log2 c)` via bit length — deterministic
   * across engines, no transcendental):
   *
   *   s_bits = Σ_xy c_xy · (bl(c_xy) + bl(N) − bl(c_x) − bl(c_y))
   *   mi_microbits = floor(1e6 · s_bits / N)
   *
   * The dependence screen a feature-selection / leakage audit runs over
   * column pairs before training on tabular data: ~0 for independent
   * pairs, strongly positive when one column predicts another (a leaked
   * label, a denormalized copy). Floor-log2 makes it a proxy — exact
   * enough to rank pairs, bit-identical everywhere.
   *
   * Input is the exploded (pair, x, y) stream; the only corpus-sized op
   * is the combine-enabled cell count. Marginals re-aggregate the CELL
   * table (bounded by distinct value combos, not rows) and join back on
   * it. No window, no driver state.
   */
  def mutualInfoBits(pairs: DataFrame, pairCol: String, xCol: String,
      yCol: String): DataFrame = {
    def bl(c: Column): Column =
      graft.plans.GraftExpressions.bit_length_long(c) - lit(1L)
    val cells = pairs.groupBy(col(pairCol).as("pair"),
        col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val mx = cells.groupBy("pair", "x").agg(sum("c").as("cx"))
    val my = cells.groupBy("pair", "y").agg(sum("c").as("cy"))
    val n = cells.groupBy("pair").agg(sum("c").as("n"))
    cells.join(mx, Seq("pair", "x")).join(my, Seq("pair", "y"))
      .join(n, "pair")
      .groupBy("pair")
      .agg(count(lit(1)).as("n_cells"), max("n").as("n"),
        sum(col("c") * (bl(col("c")) + bl(col("n")) - bl(col("cx")) -
          bl(col("cy")))).as("s_bits"))
      .withColumn("mi_microbits",
        floor(lit(1e6) * col("s_bits").cast("double") /
          col("n").cast("double")).cast("long"))
  }

  /**
   * Isotonic (monotone non-decreasing) calibration of a binned score
   * against a binary label, via the minimax characterization of isotonic
   * regression (Robertson-Wright-Dykstra):
   *
   *   fit(i) = max_{j <= i} min_{k >= i} (S[j..k] / N[j..k])
   *
   * — identical to the PAVA solution, but expressible as two bounded
   * joins instead of a sequential pool loop. The step a quality-classifier
   * pipeline runs between raw model score and threshold choice: the fit
   * is the unique monotone curve with minimal L2 error, so thresholding
   * it keeps the score's ranking while exposing honest per-bin rates.
   *
   * Scale shape: the ONLY corpus-sized pass is the per-bin count/sum
   * aggregate (combine-enabled). Everything after runs on the B-row bin
   * table — a B² triangle self-join for cumulative sums, a B³-tuple
   * minimax (two grouped aggregates) — all broadcast-sized for the
   * bounded B this op is for (`require`d <= 64; a score calibrator wants
   * 10-30 bins). No window anywhere, no driver state.
   *
   * Determinism: S and N are exact BIGINTs; a segment average is ONE IEEE
   * division of exact integers, so min/max over segment averages are
   * bit-identical across engines; presentation is micro-floored.
   */
  def isotonicFit(df: DataFrame, binCol: String, labelCol: String,
      maxBins: Int = 64): DataFrame = {
    val bins = df.groupBy(col(binCol).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("s"))
    val nb = bins.count()
    require(nb <= maxBins,
      s"isotonicFit: $nb bins exceeds maxBins=$maxBins — the minimax is " +
      "B^3 in the bin count; coarsen the binning (or raise maxBins " +
      "deliberately)")
    // cumulative sums without a window: B^2 triangle self-join
    val cum = bins.as("a")
      .join(bins.as("b"), col("b.bin") <= col("a.bin"))
      .groupBy(col("a.bin").as("bin"))
      .agg(sum("b.n").as("cn"), sum("b.s").as("cs"))
    // segment [j..k] averages: pair each k with every j <= k; the j-1
    // prefix is cum(j-1), folded in as a left join on the predecessor row
    val segs = cum.as("k")
      .join(cum.select(col("bin").as("j"), col("cn").as("cnp"),
        col("cs").as("csp")).as("p"), col("p.j") < col("k.bin"), "inner")
      .select(col("p.j").as("j"), col("k.bin").as("k"),
        ((col("k.cs") - col("csp")).cast("double") /
         (col("k.cn") - col("cnp")).cast("double")).as("avg"))
      .union(cum.select(lit(null).cast("long").as("j"),
        col("bin").as("k"),
        (col("cs").cast("double") / col("cn").cast("double")).as("avg")))
    // null j marks "segment starts at the first bin" (no predecessor);
    // normalize to the starting bin id: j = predecessor + 1, or min bin
    val minBin = bins.agg(min("bin").as("mb"))
    val seg2 = segs.crossJoin(broadcast(minBin))
      .select(coalesce(col("j") + 1, col("mb")).as("j"), col("k"),
        col("avg"))
    val idx = bins.select(col("bin").as("i"))
    val inner = idx.join(seg2, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("avg").as("mn"))
    val fit = inner.groupBy("i").agg(max("mn").as("fit"))
    bins.join(fit, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("s"),
        floor(lit(1e6) * col("s").cast("double") / col("n").cast("double"))
          .cast("long").as("rate_micro"),
        floor(lit(1e6) * col("fit")).cast("long").as("fit_micro"))
  }

  def hllAlphaConst(p: Int): String = {
    val m = 1 << p
    (0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble *
      math.pow(2.0, 60 - p + 1)).toString
  }
}
