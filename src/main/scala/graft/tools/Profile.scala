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
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$d/documents.parquet")
    def pairs() =
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8).count()
    time("simhash_pairs warm")(pairs())
    time("simhash_pairs 2nd")(pairs())
    time("simhash agg only")(Dedup.simhash(docs, "doc_id", "text").count())
    time("simhash_pairs 3rd")(pairs())
    spark.stop()
  }
}
