package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time ("as-of") join: for every left row, the payload of the
 * single right row with the same key whose timestamp is the latest at or
 * before the left row's timestamp (backward), or the earliest at or after
 * it (forward). The classic enrichment shape of event pipelines — "state as
 * of the moment the event happened" — which the reference system cannot
 * express (its joins are free-text source-side SQL,
 * load_with_query.py:310) and Spark has no built-in operator for.
 *
 * NOT implemented as a range join: a `l.ts >= r.ts` theta-join explodes to
 * every (left, earlier-right) pair per key before aggregating the max —
 * quadratic in per-key row count, a full cross product for a key with all
 * activity. Instead both sides are tagged and UNIONED, shuffled ONCE on the
 * key, sorted within partitions by (ts, side), and the payload is filled by
 * a last-non-null carry-forward window; left rows are then kept. Cost is
 * one shuffle + one sort — the same shape as any window aggregate — no
 * matter how many right rows precede each left row. At 100 TB this is the
 * difference between a merge-sortable plan and an O(n_l * n_r) blow-up on
 * hot keys. A pathologically hot single key degrades exactly like any
 * window (one task sorts it); time-bucketing the key bounds that if needed.
 *
 * Left-join semantics: left rows with no qualifying right row keep a null
 * payload. Right rows must be unique per (key, ts) — pre-aggregate
 * otherwise — or the choice among equal-timestamp right rows is
 * tie-ordered arbitrarily.
 */
object AsofJoin {

  /** Latest right payload with `rightTs <= leftTs` per key (strict: `<`). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      strict: Boolean = false): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, strict, forward = false)

  /** Earliest right payload with `rightTs >= leftTs` per key (strict: `>`). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      strict: Boolean = false): DataFrame =
    join(left, right, keys, leftTs, rightTs, payload, strict, forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      strict: Boolean, forward: Boolean): DataFrame = {
    val lcols = left.columns.toSeq
    require(payload.forall(p => !lcols.contains(p)),
      s"payload columns ${payload.mkString(",")} collide with left columns")

    // Tag order decides tie handling at equal timestamps: inclusive mode
    // sorts right rows BEFORE the left row (visible to the carry-forward),
    // strict mode AFTER it (invisible).
    val rightTag = if (strict) 2 else 0
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(lcols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        payload.map(p =>
          lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val r2 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(rightTag))
      .select(lcols.map(c =>
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__side")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)

    val ord =
      if (forward) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(l2.unionByName(r2)) { (df, p) =>
      df.withColumn(s"__c_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(lcols.map(col) ++ payload.map(p => col(s"__c_$p").as(p)): _*)
  }
}
