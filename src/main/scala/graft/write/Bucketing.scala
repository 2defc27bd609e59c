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

  /** Z-order (Morton-curve) clustered layout for MULTI-column skipping.
    * Lexicographic range clustering skips perfectly on its leading column
    * and not at all on the others — every file spans the full range of the
    * second key. Interleaving the bits of all cluster keys into one Morton
    * value and range-clustering on THAT gives every file a compact
    * hyper-rectangle in key space, so parquet min/max stats prune scans
    * filtered on ANY clustered column (at mild per-column efficiency cost
    * vs a dedicated single-key sort).
    *
    * Each column is min-max scaled to a small integer grid first (one cheap
    * aggregate pass for the bounds — the rewrite already reads the full
    * table, so the extra scan is marginal and the mapping stays monotone);
    * the interleave itself is a fold of codegen'd shift/mask built-ins.
    * Numeric columns only. Grid width is min(16, 63/n) bits so the TOP
    * interleaved bit never reaches position 63: repartitionByRange orders
    * by the SIGNED long, and a sign-bit hit would split the keyspace at the
    * wrap, handing one file two disjoint hyper-rectangles. Null cells (and
    * all-null/empty bounds) clamp to grid 0 — a defined curve position, not
    * a null z for the whole row. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      files: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && cols.size <= 4, "1-4 numeric z-order columns")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val n = cols.size
    val bits = math.min(16, 63 / n)
    val maxGrid = (1L << bits) - 1
    val grid = cols.zipWithIndex.map { case (c, j) =>
      val (lo, hi) =
        if (bounds.isNullAt(2 * j) || bounds.isNullAt(2 * j + 1)) (0.0, 0.0)
        else (bounds.getDouble(2 * j), bounds.getDouble(2 * j + 1))
      val span = if (hi > lo) hi - lo else 1.0
      coalesce(
        floor((col(c).cast("double") - lit(lo)) / lit(span)
          * lit(maxGrid.toDouble)).cast("long"),
        lit(0L))
    }
    val z = (0 until bits).flatMap { i =>
      grid.zipWithIndex.map { case (g, j) =>
        shiftleft(shiftright(g, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
