package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Catalog-wide regression gate for the bounded-global-window invariant.
  *
  * A `Window` with an empty partition spec executes as ONE task holding its
  * whole input (`WindowExec: No Partition Defined`) — fine over a frame that
  * an aggregation already collapsed to domain size (distinct days, langs,
  * 101 quantile buckets), fatal over anything corpus-sized at 100 TB. Until
  * now that invariant was an audit ("I checked every global-window site");
  * this spec makes it structural: for EVERY catalog query, every
  * unpartitioned logical Window must sit above a subtree in which each
  * root-to-leaf path crosses a cardinality-collapsing node (Aggregate /
  * Distinct / limit / literal relation / bounded Range). A future query
  * that opens a global window over a raw scan fails here by name before it
  * ever reaches a cluster.
  */
class WindowInvariantSpec extends SparkSpec {

  /** True iff every path from `p` to a leaf crosses a bounding node, so the
    * frame entering the single-task window is aggregate-sized, not
    * corpus-sized. Joins/unions/generates of bounded inputs stay bounded
    * (constant fan-out over domain-sized frames). */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit |
        _: LocalRelation | _: OneRowRelation | _: Range => true
    case l if l.children.isEmpty => false // a raw relation leaf
    case o => o.children.forall(bounded)
  }

  test("every unpartitioned window's input is aggregate-bounded") {
    val globalWindowQueries = scala.collection.mutable.SortedSet[String]()
    val violations = scala.collection.mutable.SortedSet[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan =
        try fn(spark, sf).queryExecution.optimizedPlan
        catch {
          case e: Throwable => fail(s"$name failed to build: $e")
        }
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          globalWindowQueries += name
          if (!bounded(w.child)) violations += name
        case _ => ()
      }
    }
    info(s"${globalWindowQueries.size} queries use a global window: " +
      globalWindowQueries.mkString(", "))
    assert(violations.isEmpty,
      s"corpus-sized GLOBAL window (single-task at scale) in: " +
        violations.mkString(", "))
    // Explicit SITE registry (r13): the bounded() proof above is
    // structural, but a silent newcomer should still be a conscious
    // decision — a new unpartitioned-window query must be reviewed for
    // its row bound and added here by name, and a removal must clean up
    // here too (the list doubles as the audit trail the r12 verdict
    // asked for: every WindowExec-No-Partition warning in the Verify log
    // maps to one of these domain-bounded frames).
    val registered = Set(
      "q_agg_fdr", "q_agg_groupseq", "q_agg_reach", "q_agg_skyline",
      "q_agg_stl", "q_agg_trend", "q_incr_backfill", "q_ml_auc",
      "q_ml_calibration", "q_ml_stump", "q_profile_drift_trend",
      "q_sample_neyman", "q_sample_waterfill", "q_seq_survival",
      "q_text_quantile_norm", "q_text_rr_release", "q_text_zipf")
    assert(globalWindowQueries.toSet == registered,
      "global-window site registry drifted — new: " +
        (globalWindowQueries.toSet -- registered).mkString(", ") +
        "; removed: " +
        (registered -- globalWindowQueries.toSet).mkString(", "))
  }
}
