package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for shuffle joins.
 *
 * A hash-partitioned join sends every row of a key to ONE reducer; a hot key
 * (the classic default-value / null-surrogate pileup) turns that reducer into
 * the straggler that bounds the whole stage. AQE's skew-join splitting
 * (`spark.sql.adaptive.skewJoin.enabled`, on by default) repairs moderate
 * skew at runtime by splitting oversized partitions; explicit SALTING is the
 * deterministic form for extreme single-key skew, and the only option when
 * the skewed side feeds an aggregation that must also avoid the pileup.
 */
object Skew {

  private val SaltCol = "__graft_salt"

  /**
   * Salted equi-join: the skewed (left) side gets a deterministic salt in
   * `[0, nSalts)` — a hash of the whole row, so a hot key's rows spread
   * across `nSalts` reducers — and the other side is replicated once per
   * salt value so every (key, salt) bucket still finds its matches.
   *
   * Row-identical to `skewed.join(other, keys, joinType)` (inner/left_semi/
   * left); only the shuffle distribution changes. Cost: `other` is exploded
   * `nSalts` times — use when `other` is the small-but-not-broadcastable
   * side, and keep `nSalts` near the cluster's per-key parallelism target.
   */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(Seq("inner", "left", "left_outer", "left_semi").contains(joinType),
      s"salted join replicates the right side; '$joinType' would duplicate " +
        "right-side rows in the output")
    val l = skewed.withColumn(SaltCol,
      pmod(xxhash64(skewed.columns.map(col): _*), lit(nSalts.toLong)))
    val r = other.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
