package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

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
    val docs = spark.read.parquet(s"$d/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache() // no cross-step reuse: CacheManager matches
      val t0 = System.nanoTime(); val r = f // canonicalized plans globally
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    time("warm full")(Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.7, 10).count())
    time("shingleTable")(Dedup.shingleTable(docs, "doc_id", "text", 5).count())
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist sh")(sh.count())
    time("docSets")(sh.groupBy("doc_id")
      .agg(collect_list("shingle").as("s"), count("*").as("n")).count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
    val rare = sh.withColumn("df", count(lit(1)).over(w))
      .filter(col("df") >= 2 && col("df") <= 10).drop("df")
    time("rare window")(rare.count())
    time("self join + distinct")(rare.as("a").join(rare.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct().count())
    time("full again")(Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.7, 10).count())
    time("full 3rd")(Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.7, 10).count())
    spark.stop()
  }
}
