package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 probe: is the exact-scan stage of cosineTopK single-task because
  * the embeddings fixture is one sub-openCost parquet file? Prints the
  * scan/join partition counts and A/Bs the corpus-side spread. */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"scan partitions = ${e.rdd.getNumPartitions}, rows = ${e.count()}")
    def knn(rep: Boolean) = {
      val corpus = if (rep)
        e.repartition(spark.sparkContext.defaultParallelism) else e
      graft.ops.Similarity.cosineTopK(
        corpus, "vec_id", "embedding", e.filter(col("vec_id") < 2000),
        "vec_id", "embedding", k = 5)
    }
    def time(rep: Boolean): Double = {
      val t0 = System.nanoTime()
      knn(rep).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(false); time(true)
    for (_ <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      println(f"plain=${time(false)}%.2f repartitioned=${time(true)}%.2f")
    }
    spark.stop()
  }
}
