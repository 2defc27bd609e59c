package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval containment join without an equi-key: points matched to every
 * interval that contains them. Spark plans a bare `lo <= t AND t <= hi`
 * theta-join as BroadcastNestedLoop (fine only while one side broadcasts)
 * or a cartesian product — at 100 TB, neither survives.
 *
 * The scalable shape is BUCKETIZATION: pick a bucket width, explode each
 * interval to the bucket ids it overlaps, map each point to its single
 * bucket, equi-join on the bucket id, then filter the exact containment
 * predicate. The theta-join becomes a hash join whose fan-out is
 * `interval_width / bucket + 1` rows per interval — bounded amplification
 * the planner can shuffle-partition like any join, instead of an n x m
 * scan. Matches are exact (the residual filter re-checks containment); a
 * point in a bucket two intervals overlap meets both, and each (interval,
 * point) pair meets at most once because a point has ONE bucket.
 *
 * Pick `bucket` near the median interval width: much smaller multiplies
 * interval replication; much larger piles unrelated points into the same
 * bucket (the join degenerates toward all-pairs within a bucket). Skewed
 * hot buckets (a flash-crowd hour) re-split under AQE like any hash join.
 */
object RangeJoin {

  /** Join `points` to every row of `intervals` with
    * `loCol <= tsCol <= hiCol`, all expressed on an integer axis (epoch
    * micros, ordinal days, ...). `bucket` is the bucketization width on
    * that axis. Output: all interval columns + all point columns. */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val iv = intervals.withColumn("__b",
      explode(sequence(floor(col(loCol) / bucket).cast("long"),
        floor(col(hiCol) / bucket).cast("long"))))
    val pt = points.withColumn("__b",
      floor(col(tsCol) / bucket).cast("long"))
    iv.join(pt, Seq("__b"))
      .filter(col(loCol) <= col(tsCol) && col(tsCol) <= col(hiCol))
      .drop("__b")
  }

  /** Overlap join of two interval sets (`[aLo,aHi]` meets `[bLo,bHi]`).
    * Two overlapping intervals share several buckets, so the equi-join
    * yields their pair once per shared bucket; each pair is kept only in
    * the FIRST bucket both cover — `__b == greatest(bucket(aLo),
    * bucket(bLo))`, a stateless filter. (A full-row `distinct()` would
    * also collapse genuinely duplicate input rows, changing multiplicity
    * vs the naive theta-join — and costs a dedup shuffle this avoids.)
    * The inputs' column names must be DISJOINT: the output carries all
    * columns of both sides, and the containment predicate must resolve
    * `aLo`/`bLo`/... unambiguously after the join. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    require(a.columns.intersect(b.columns).isEmpty,
      "intervalOverlap inputs must have disjoint column names, got shared: " +
        a.columns.intersect(b.columns).mkString(", "))
    def buckets(df: DataFrame, lo: String, hi: String, first: String) = df
      .withColumn(first, floor(col(lo) / bucket).cast("long"))
      .withColumn("__b", explode(sequence(col(first),
        floor(col(hi) / bucket).cast("long"))))
    buckets(a, aLo, aHi, "__fa").join(buckets(b, bLo, bHi, "__fb"), Seq("__b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__b") === greatest(col("__fa"), col("__fb")))
      .drop("__b", "__fa", "__fb")
  }
}
