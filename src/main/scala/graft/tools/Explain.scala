package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the FORMATTED executed plan (post-AQE) and a
  * steady-state timing for any catalog query. Usage:
  *   sbt "runMain graft.tools.Explain <sfDir> <query> [query ...]"
  * Runs each query once to let AQE finalize, prints the final plan, then
  * times a second (warm) run with the same noop sink the bench uses. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
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
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // warm + finalize AQE
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"warm run: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
