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

  /** Join-key distribution audit — the measurement that decides between a
    * plain shuffle join, [[saltedJoin]], and AQE skew splitting. For each
    * (frame, keyCol, label) target: total rows, distinct keys, the hottest
    * key's row count, its corpus share in ppm, and `salt_factor` =
    * ceil(max/avg) — the nSalts that levels the hottest reducer to the
    * average. One combine-enabled count aggregate per target (corpus →
    * |keys| → 1 row). Counts are exact integers; the share and the ceil
    * run through single deterministic IEEE chains (identical in any
    * engine — the exact-integer ceil form would wrap BIGINT at the very
    * hot-key cardinalities the audit targets). Null keys count as one key — they
    * hash to one reducer like any other value, which is exactly why
    * null-heavy FKs are the most common real-world hot key. */
  def keyAudit(targets: Seq[(DataFrame, String, String)]): DataFrame = {
    require(targets.nonEmpty, "keyAudit needs at least one target")
    targets.map { case (df, k, label) =>
      df.groupBy(col(k)).agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
          max("c").as("max_rows"))
        .select(lit(label).as("key_name"), col("n_rows"), col("n_keys"),
          col("max_rows"),
          floor(col("max_rows").cast("double") * 1e6 /
            col("n_rows").cast("double")).cast("long").as("top1_share_ppm"),
          // ceil(max/avg) through ONE deterministic IEEE chain: the exact
          // integer form (max_rows*n_keys + n_rows - 1) wraps BIGINT at
          // precisely the hot-key cardinalities this audit targets
          ceil(col("max_rows").cast("double") * col("n_keys").cast("double")
            / col("n_rows").cast("double")).cast("long").as("salt_factor"))
    }.reduce(_ unionByName _)
  }
}
