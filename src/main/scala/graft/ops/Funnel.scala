package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel analysis over an event stream: for each user, greedily
 * match the stage sequence (stage k+1 must occur strictly after the event
 * that matched stage k) and report how many users reach each stage.
 *
 * Execution shape: ONE shuffle on the user key; each group folds its
 * (ts, tie)-ordered events with `functions.aggregate` — a codegen'd scalar
 * fold, no UDF. Events are pre-filtered to the stage types (non-stage
 * events can never advance the fold, so results are identical and the
 * shuffled volume drops to the funnel-relevant slice). Per-group state is
 * the user's relevant-event array; `maxEvents > 0` bounds it via
 * [[graft.plans.EarliestK]] — an O(k)-state map-side-combinable bottom-k
 * heap, so one pathological bot entity can never hold a task's memory
 * (events beyond the cap are invisible to the fold; users under it are
 * exact). The greedy fold is equivalent to the chained first-match
 * formulation (first stage-1 event, then the first stage-2 event after
 * it, ...), which is what the DuckDB oracle replays.
 */
object Funnel {

  /** The (ts, tie)-sorted relevant-event array per user: exact sorted
    * collect when uncapped, bounded earliest-k heap when capped. */
  private def sortedEvents(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      maxEvents: Int): DataFrame = {
    val relevant = df.filter(col(typeCol).isin(stages: _*))
    val ev = struct(col(tsCol), col(tieCol), col(typeCol).as("t"))
    val evs =
      if (maxEvents <= 0) array_sort(collect_list(ev))
      else graft.plans.GraftExpressions.earliest_k(ev, maxEvents)
    relevant.groupBy(col(userCol)).agg(evs.as("evs"))
  }

  /** Per-user funnel depth: `(userCol, stage_reached)` with stage_reached
    * in [0, stages.length]. `tieCol` must totally order equal timestamps —
    * determinism of the fold (and of any engine replaying it) needs a
    * total event order. `maxEvents > 0` caps each user's fold to their
    * earliest `maxEvents` stage-typed events with bounded state. Users
    * with NO stage-typed events are omitted (implicitly stage 0) — the
    * drop-off reports only count stage >= 1, so they are unaffected. */
  def stageReached(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      maxEvents: Int = 0): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageArr = array(stages.map(lit): _*)
    sortedEvents(df, userCol, tsCol, tieCol, typeCol, stages, maxEvents)
      .select(col(userCol),
        aggregate(col("evs"), lit(0), (acc, e) =>
          when(acc < stages.length &&
            e.getField("t") === element_at(stageArr, acc + 1), acc + 1)
            .otherwise(acc)).as("stage_reached"))
  }

  /** Funnel report: one row per stage `(stage, stage_name, n_users)` where
    * n_users counts users whose greedy match reached AT LEAST that stage —
    * the monotone drop-off curve. Stages nobody reaches still appear (with
    * n_users = 0) so the report schema is stable. */
  def funnelCounts(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      maxEvents: Int = 0): DataFrame = {
    val stageArr = array(stages.map(lit): _*)
    val reached = stageReached(df, userCol, tsCol, tieCol, typeCol, stages,
      maxEvents)
    val spark = df.sparkSession
    import spark.implicits._
    val all = stages.indices.map(i => i + 1).toDF("stage")
    val counts = reached.filter(col("stage_reached") >= 1)
      .select(explode(sequence(lit(1), col("stage_reached"))).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
    all.join(counts, Seq("stage"), "left_outer")
      .select(col("stage"),
        element_at(stageArr, col("stage")).as("stage_name"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /**
   * Time-windowed funnel: like [[stageReached]], but stage k+1 must occur
   * within `maxGapSeconds` of the event that matched stage k (the
   * "purchase within N hours of click" form — the industry-standard
   * funnel). Greedy first-match like the unbounded variant; the fold state
   * carries the matched event's timestamp, and the gap compares exact
   * MICROSECONDS on both engines (`unix_micros` here, `epoch_us` in the
   * oracle) so sub-second timestamps never straddle a rounding boundary.
   */
  def stageReachedWithin(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      maxGapSeconds: Long, maxEvents: Int = 0): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapSeconds > 0, s"maxGapSeconds=$maxGapSeconds must be > 0")
    val stageArr = array(stages.map(lit): _*)
    val gapUs = maxGapSeconds * 1000000L
    val init = struct(lit(0).as("stage"),
      lit(null).cast("long").as("mus"))
    sortedEvents(df, userCol, tsCol, tieCol, typeCol, stages, maxEvents)
      .select(col(userCol),
        aggregate(col("evs"), init, (acc, e) => {
          val st = acc.getField("stage")
          val eus = unix_micros(e.getField(tsCol))
          val hit = st < stages.length &&
            e.getField("t") === element_at(stageArr, st + 1) &&
            (st === 0 || eus - acc.getField("mus") <= gapUs)
          when(hit, struct((st + 1).as("stage"), eus.as("mus")))
            .otherwise(acc)
        }).getField("stage").as("stage_reached"))
  }

  /** Drop-off report for the time-windowed funnel — same shape as
    * [[funnelCounts]]. */
  def funnelCountsWithin(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String],
      maxGapSeconds: Long, maxEvents: Int = 0): DataFrame = {
    val stageArr = array(stages.map(lit): _*)
    val reached = stageReachedWithin(df, userCol, tsCol, tieCol, typeCol,
      stages, maxGapSeconds, maxEvents)
    val spark = df.sparkSession
    import spark.implicits._
    val all = stages.indices.map(i => i + 1).toDF("stage")
    val counts = reached.filter(col("stage_reached") >= 1)
      .select(explode(sequence(lit(1), col("stage_reached"))).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
    all.join(counts, Seq("stage"), "left_outer")
      .select(col("stage"),
        element_at(stageArr, col("stage")).as("stage_name"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /**
   * Cohort retention: users cohorted by their FIRST active day, then for
   * each (cohort_day, day_offset) the count of cohort members active that
   * day and the retention ratio. The canonical three-shuffle plan (first-day
   * aggregate, distinct active days, user-keyed join back); every group key
   * is day-granular, so output and shuffle widths are bounded by
   * users x active-days regardless of raw event volume. The ratio is
   * floor-quantized at 6 dp from exact integer counts — cross-engine
   * identical (counts < 2^53 make the single divide correctly rounded on
   * both sides).
   */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = df.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val sizes = first.groupBy("cohort_day").agg(count(lit(1)).as("n_cohort"))
    val active = df.select(col(userCol),
      to_date(col(tsCol)).as("active_day")).distinct()
    // after the distinct, (user, active_day) is unique and day_offset is a
    // function of it, so count(*) counts distinct users per cell
    active.join(first, Seq(userCol))
      .groupBy(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .withColumn("retention",
        floor(lit(1e6) * col("n_active") / col("n_cohort")) / 1e6)
  }
}
