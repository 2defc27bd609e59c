package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyed row-level reconciliation of two table versions — the migration /
 * backfill / replication validation primitive ("did the rewrite preserve
 * the data, and where exactly does it drift?"). The reference pipeline's
 * merge path trusts its own bookkeeping; a reconciliation diff is the
 * independent audit a 100 TB operator runs AFTER a backfill, engine swap,
 * or vendor migration, and its output is the (small) set of divergent
 * keys — never a copy of the data.
 */
object Recon {

  /**
   * Full-outer diff of `left` vs `right` on `keyCols`: one row per key
   * present in either side whose content differs —
   *
   *   - `status = "removed"` — key only in `left`
   *   - `status = "added"`   — key only in `right`
   *   - `status = "changed"` — key in both, at least one compare column
   *     differs (null-safe: null vs null matches, null vs value differs);
   *     `changed_cols` names the differing columns, comma-joined in
   *     `compareCols` order, for column-level drill-down
   *
   * Identical rows are NOT emitted: at scale the diff IS the output
   * contract (a healthy reconcile returns ~0 rows, not a table copy).
   *
   * Shape: one projection per side, a single full-outer equi-join on the
   * key (both sides shuffle-partitioned by the same key — co-located,
   * no second shuffle), the per-column compares evaluated inside the
   * join's project, and a selective filter. No driver state, no window,
   * linear in |left| + |right|.
   *
   * Contract: `keyCols` must identify rows uniquely on EACH side —
   * duplicate keys multiply through the join like any relational diff
   * (dedup first with [[graft.ops.Dedup]] if the source is append-only).
   */
  def diff(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "Recon.diff needs at least one key column")
    require(compareCols.nonEmpty,
      "Recon.diff needs at least one compare column")
    require(keyCols.intersect(compareCols).isEmpty,
      s"key and compare columns overlap: ${keyCols.intersect(compareCols)}")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(keyCols.map(col) ++ compareCols.map(c =>
        col(c).as(s"${tag}_$c")) :+ lit(1).as(s"${tag}_present"): _*)
    val j = side(left, "l").join(side(right, "r"), keyCols, "full_outer")
    val changed = compareCols.map { c =>
      when(col(s"l_$c") <=> col(s"r_$c"), lit(null).cast("string"))
        .otherwise(lit(c))
    }
    j.withColumn("status",
        when(col("r_present").isNull, lit("removed"))
          .when(col("l_present").isNull, lit("added"))
          .otherwise(lit("changed")))
      .withColumn("changed_cols",
        when(col("status") === "changed", concat_ws(",", changed: _*))
          .otherwise(lit("")))
      .filter(col("status") =!= "changed" || col("changed_cols") =!= "")
      .select(keyCols.map(col) :+ col("status") :+ col("changed_cols"): _*)
  }
}
