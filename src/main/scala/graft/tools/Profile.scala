package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Throwaway step-profiler for slow bench queries (not part of the library). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          println(s"[job] start ${e.jobId} stages=${e.stageIds.mkString(",")} " +
            s"t=${System.nanoTime() / 1000000 % 1000000}")
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null && m.executorRunTime + m.executorDeserializeTime > 300)
            println(s"[task] stage=${e.stageId} run=${m.executorRunTime}ms " +
              s"deser=${m.executorDeserializeTime}ms " +
              s"cpu=${m.executorCpuTime / 1000000}ms gc=${m.jvmGCTime}ms")
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val dur = for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s
          println(s"[stage] ${si.stageId} tasks=${si.numTasks} " +
            s"dur=${dur.getOrElse(-1L)}ms name=${si.name.take(40)}")
        }
      })

    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache() // no cross-step reuse: CacheManager matches
      val t0 = System.nanoTime(); val r = f // canonicalized plans globally
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e = spark.read.parquet(s"$d/embeddings.parquet")
    def ann() = Similarity.annLsh(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, tables = 4, planes = 10, dims = 64).count()
    def annSmall() = Similarity.annLsh(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, tables = 2, planes = 4, dims = 8).count()
    time("ann warm")(ann())
    time("ann 2nd")(ann())
    time("ann small-literals")(annSmall())
    time("ann small 2nd")(annSmall())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("ann no-wscg")(ann())
    time("ann no-wscg 2nd")(ann())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("quantize corpus")(e.select(Similarity.quantize(col("embedding"))
      .as("q")).agg(count(lit(1))).collect())
    time("buckets corpus")(e.select((0 until 4).map(t =>
      Similarity.lshBucket(col("embedding"), t, 10, 64).as(s"b$t")): _*)
      .agg(count(lit(1))).collect())
    time("ann 3rd")(ann())

    // inline copy of annLsh's internals to time each stage
    def withBuckets(df: org.apache.spark.sql.DataFrame, id: String,
        vec: String, out: String) = {
      val buckets = (0 until 4).map(t =>
        struct(lit(t).as("t"),
          Similarity.lshBucket(col(vec), t, 10, 64).as("b")))
      df.select(col(id).as(out), Similarity.quantize(col(vec))
        .as(s"${out}_vec"), explode(array(buckets: _*)).as("bucket"))
    }
    val c = withBuckets(e, "vec_id", "embedding", "neighbor_id").as("c")
    val p = withBuckets(e.filter(col("vec_id") < 8), "vec_id", "embedding",
      "query_id").as("p")
    val cand = c.join(broadcast(p),
        col("c.bucket") === col("p.bucket") &&
          col("c.neighbor_id") =!= col("p.query_id"))
      .select(col("p.query_id"), col("c.neighbor_id"),
        col("p.query_id_vec"), col("c.neighbor_id_vec"))
    time("cand no distinct")(cand.count())
    time("cand distinct")(cand.distinct().count())
    val scored = cand.distinct().select(col("query_id"), col("neighbor_id"),
      (graft.plans.GraftExpressions.int_dot(col("query_id_vec"),
        col("neighbor_id_vec"))).as("dot"))
    time("scored")(scored.count())
    spark.stop()
  }
}
