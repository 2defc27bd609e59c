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
    * Same bucketization; the dedup is explicit here because two intervals
    * can share several buckets — `distinct` on the surviving pairs keeps
    * each match once. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    def buckets(df: DataFrame, lo: String, hi: String) = df.withColumn("__b",
      explode(sequence(floor(col(lo) / bucket).cast("long"),
        floor(col(hi) / bucket).cast("long"))))
    buckets(a, aLo, aHi).join(buckets(b, bLo, bHi), Seq("__b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .drop("__b")
      .distinct()
  }
}
