package graft.write

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed tables for co-located joins.
 *
 * A shuffle join on two 100 TB-scale tables pays a full re-partition of BOTH
 * sides every run. Writing each table bucketed (hash-partitioned into a
 * fixed bucket count) and sorted on the join key makes every subsequent
 * equi-join on that key shuffle-free: Spark's bucketing-aware scan feeds a
 * SortMergeJoin with NO Exchange on either side — the join cost becomes a
 * streaming merge of pre-sorted buckets. The write pays the shuffle once;
 * every downstream join (the fact-to-fact joins a stage zone serves daily)
 * rides for free. Both sides must share the bucket count and key.
 */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table at `path`,
    * registered as `table` in the session catalog (bucketing metadata lives
    * in the catalog; reading the bare path loses it). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located equi-join of two same-bucketed catalog tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** True when no shuffle (ShuffleExchange) feeds the join — the property
    * bucketing buys. For tests and plan assertions. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Range-clustered sorted layout — the data-skipping lever for scans the
    * way bucketing is for joins. `repartitionByRange` gives every output
    * file a DISJOINT range of the cluster key (sampled range boundaries, one
    * shuffle) and `sortWithinPartitions` orders rows inside each file, so
    * parquet's per-row-group min/max statistics turn any selective filter on
    * that key into file- and row-group-level skips: a point or range query
    * on a 100 TB table opens only the files whose range overlaps. Pays one
    * shuffle at write time; every selective downstream scan rides for free
    * (the scan-side analog of `writeBucketed`). */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
