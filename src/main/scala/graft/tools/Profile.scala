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
    def mh() = Dedup.minhashNearDups(docs, "doc_id", "text",
      n = 5, k = 12, bands = 4, threshold = 0.7)
    time("minhash warm")(mh().count())
    time("minhash 2nd")(mh().count())
    time("clusters warm")(Dedup.components(mh()).count())
    time("clusters 2nd")(Dedup.components(mh()).count())
    val pairsCached = mh()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("[profile] n pairs = " + pairsCached.count())

    // inline copy of components() with per-iteration timing
    import org.apache.spark.storage.StorageLevel
    val edges = pairsCached.select(col("doc1").as("a"), col("doc2").as("b"))
      .union(pairsCached.select(col("doc2").as("a"), col("doc1").as("b")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
    labels.persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < 20) {
      val t0 = System.nanoTime()
      val msgs = edges.join(labels, col("a") === col("id"))
        .select(col("b").as("id"), col("comp"))
      val next = msgs.union(labels.select(col("id"), col("comp")))
        .groupBy("id").agg(min("comp").as("comp"))
      next.persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .filter(col("n.comp") =!= col("l.comp")).count()
      labels.unpersist()
      labels = next
      i += 1
      println(f"[profile] iter $i changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
