package graft

import org.apache.spark.sql.SparkSession

/**
 * The library's front door: a SparkSession configured for the engine's
 * semantics and scale defaults, with the DSL + native functions registered
 * for SQL use.
 *
 * Semantics notes:
 *  - `ansi.enabled=false`: the reference ran non-ANSI Spark 3 — malformed
 *    casts/arithmetic yield null, not runtime errors. The engine's own
 *    expressions are ANSI-safe (`try_cast`/`try_to_timestamp` where input
 *    can be dirty), but user-supplied bare-SQL transformations (the DSL's
 *    `expr()` fallthrough) inherit this reference behavior.
 *  - UTC session timezone; Lima wall-clock is applied explicitly where the
 *    reference pins it (fn_transform_Datetime, tz shift S5) — never
 *    implicitly via the session zone.
 *  - shuffle partitions default to 2x cores locally; on a cluster, set it
 *    (or rely on AQE coalescing, which is enabled) to match executor count.
 */
object GraftSession {

  def builder(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder().appName(appName)
    master.foreach(b.master)
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors * 2)
    b.config("spark.sql.shuffle.partitions", parts.toString)
      // a long-lived engine session compiles well over the default 100
      // generated classes; a thrashing codegen cache means big classes
      // (wide aggregates, merge projections) recompile on every execution
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let AQE re-optimize (and coalesce) the materialization of
      // persisted plans: the default false pins a cached plan's output
      // partitioning, so persist-based pipelines (dedup shingle/signature
      // chains) materialized with un-coalesced shuffle.partitions-sized
      // shuffles (guide §2.2; measured −32% on q_dedup_bbit, flat
      // elsewhere). Scale-adaptive: AQE only coalesces below the
      // advisory partition size.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
  }

  /** Build the session and register the SQL surface (fn_transform_*,
    * graft_rolling_hash, graft_int_dot). */
  def create(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession = {
    val s = builder(appName, master, shufflePartitions).getOrCreate()
    functions.Registry.registerAll(s)
    plans.GraftExpressions.register(s)
    s
  }
}
