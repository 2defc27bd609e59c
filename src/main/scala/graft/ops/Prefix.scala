package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Distributed prefix sum (exclusive running total in a global order) — the
 * primitive behind sequence packing, global offset assignment and row
 * numbering, which Spark only offers as a degenerate single-task window
 * (`Window.orderBy` with no partition: every row through ONE reducer).
 *
 * Classic two-pass scan instead: range-partition on the order key (so
 * partition i holds keys entirely below partition i+1), compute each
 * partition's local sum, prefix-sum THOSE on the driver (one long per
 * partition), and hand each partition its base offset for a second,
 * purely partition-local pass. Both passes run every partition in
 * parallel; the driver reduction is over `numPartitions` longs; nothing
 * serializes through one task; and the result is independent of the
 * partition count (prefix sums associate). The second pass is a
 * `mapPartitions` running accumulator — the genuinely per-partition
 * imperative case, chosen over a `Window.partitionBy(pid)` formulation
 * because the window would re-shuffle the (already range-placed) data on
 * the partition id.
 */
object Prefix {

  /** Adds `offset` = sum of `valueCol` over all rows with a smaller
    * `orderCol` (exclusive prefix sum). The order key must be unique and
    * `valueCol` non-null. Input columns are preserved. */
  def runningOffsets(df: DataFrame, orderCol: String, valueCol: String)
      : DataFrame = runningOffsetsOrdered(df, Seq(orderCol), valueCol)

  /** [[runningOffsets]] with a compound (lexicographic) global order — the
    * order columns together must form a unique total order. */
  def runningOffsetsOrdered(df: DataFrame, orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(orderCols.nonEmpty, "runningOffsetsOrdered needs order columns")
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // PIN the layout with an eager localCheckpoint: both passes must see
    // the SAME partitioning, and repartitionByRange picks its boundaries by
    // sampling — a recompute could re-place rows and silently mismatch the
    // per-partition bases collected below. (A persist() would pin too, but
    // leaks for the session lifetime since the caller never sees this frame
    // to unpersist it; checkpointed blocks are released by the
    // ContextCleaner when the plan is GC'd.)
    val ranged = df
      .withColumn("__v", coalesce(col(valueCol).cast("long"), lit(0L)))
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localSums = ranged.groupBy("__pid").agg(sum("__v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // driver prefix over per-partition sums: range partition i precedes
    // i+1; pids absent from the map are empty partitions (contribute 0)
    val pids = localSums.keys.toSeq.sorted
    val baseOf = pids.zip(pids.scanLeft(0L)((acc, p) => acc + localSums(p)))
      .toMap
    val inSchema = ranged.schema
    val vIdx = inSchema.fieldIndex("__v")
    val pIdx = inSchema.fieldIndex("__pid")
    val keepIdx = df.schema.fieldNames.map(inSchema.fieldIndex).toSeq
    val outSchema = df.schema.add("offset", LongType, nullable = false)
    ranged.mapPartitions { it =>
      var running = Long.MinValue // sentinel: base looked up at first row
      it.map { r =>
        if (running == Long.MinValue) running = baseOf(r.getInt(pIdx))
        val out = Row.fromSeq(keepIdx.map(r.get) :+ running)
        running += r.getLong(vIdx)
        out
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-GROUP exclusive prefix sum: `offset` = sum of `valueCol` over rows
    * of the same `groupCol` value that sort earlier on `orderCols`. The
    * same two-pass scan as [[runningOffsets]], range-partitioned on
    * (group, order...): a group's rows are contiguous across the range
    * layout, the driver prefix runs per (group, partition) — `numPartitions
    * x |groups|` longs, so the group column must be LOW-CARDINALITY (a
    * source/domain/language tag, not a document id; a per-key running total
    * over high-cardinality keys is a plain window, which Spark already
    * parallelizes by key). Unlike `Window.partitionBy(group)`, no single
    * task ever processes a whole group — the fix for exactly the hot-group
    * skew a domain-mixture pipeline hits (one `web` domain holding 90% of
    * the corpus). (`orderCols` must be unique WITHIN a group.) */
  def runningOffsetsBy(df: DataFrame, groupCol: String,
      orderCols: Seq[String], valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val rangeCols = (groupCol +: orderCols).map(col)
    // eager localCheckpoint, not persist — same reasons as runningOffsets
    val ranged = df
      .withColumn("__v", coalesce(col(valueCol).cast("long"), lit(0L)))
      .repartitionByRange(parts, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localSums = ranged.groupBy("__pid", groupCol)
      .agg(sum("__v").as("s")).collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2)).toMap
    // Enforce the low-cardinality contract instead of silently degrading:
    // the driver holds (#partitions x #groups) longs. A high-cardinality
    // group column (document id, user id) belongs on a plain
    // Window.partitionBy(group) — Spark already parallelizes that by key.
    val nGroups = localSums.keys.map(_._2).toSet.size
    require(nGroups <= 100000,
      s"runningOffsetsBy: $nGroups distinct '$groupCol' values exceed the " +
      "low-cardinality contract (<=100000); use a per-key window " +
      "(Window.partitionBy) for high-cardinality running totals")
    // driver prefix per group across the range-ordered partition ids
    val pids = localSums.keys.map(_._1).toSeq.distinct.sorted
    val groups = localSums.keys.map(_._2).toSeq.distinct
    val baseOf: Map[(Int, Any), Long] = groups.flatMap { g =>
      var acc = 0L
      pids.map { p =>
        val base = (p, g) -> acc
        acc += localSums.getOrElse((p, g), 0L)
        base
      }
    }.toMap
    val inSchema = ranged.schema
    val vIdx = inSchema.fieldIndex("__v")
    val pIdx = inSchema.fieldIndex("__pid")
    val gIdx = inSchema.fieldIndex(groupCol)
    val keepIdx = df.schema.fieldNames.map(inSchema.fieldIndex).toSeq
    val outSchema = df.schema.add("offset", LongType, nullable = false)
    ranged.mapPartitions { it =>
      val running = scala.collection.mutable.HashMap.empty[Any, Long]
      it.map { r =>
        val g = r.get(gIdx)
        val off = running.getOrElseUpdate(g, baseOf((r.getInt(pIdx), g)))
        val out = Row.fromSeq(keepIdx.map(r.get) :+ off)
        running(g) = off + r.getLong(vIdx)
        out
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
