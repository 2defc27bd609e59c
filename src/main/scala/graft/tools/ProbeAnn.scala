package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off scale evidence for the LSH-candidate family: run the
  * q_emb_mutual_knn pipeline (mutualKnnPairs -> componentsStar) at a
  * given fixture with CONFIGURABLE planes/bucketSample — the knobs a
  * production deployment scales with log2(corpus) — and print wall +
  * result count. The catalog pins planes=6 so its DuckDB oracle stays
  * replayable; at sf10 that fixed 64-bucket table makes LSH candidates
  * grow ~100x per decade (n^2/buckets) and the shuffle spill exceeds
  * this box's disk. This tool shows the OPERATOR is fine when the knob
  * scales: args = <sfDir> <planes> [bucketSample].
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    // second arg doubles as the scaled knob: planes for mode=mknn
    // (default), k for mode=semdedup (third arg selects)
    val knob = args(1).toInt
    val mode = if (args.length > 2) args(2) else "mknn"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val out = mode match {
      case "semdedup" =>
        // q_emb_semdedup's pipeline with k scaled to hold cluster size
        // (pairs-per-cluster) constant instead of the catalog's pinned 8
        graft.ops.Similarity.semanticDedup(emb, "vec_id", "embedding",
          k = knob, iters = 1, threshold = 0.35)
      case _ =>
        graft.ops.Dedup.componentsStar(
          graft.ops.Similarity.mutualKnnPairs(emb, "vec_id", "embedding",
            k = 2, tables = 8, planes = knob, dims = 64),
          "doc1", "doc2")
    }
    val n = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"dir":"$dir","mode":"$mode","knob":$knob,"rows":$n,"sec":$sec%.1f}""")
    spark.stop()
  }
}
