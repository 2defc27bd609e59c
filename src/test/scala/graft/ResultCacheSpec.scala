package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.write.ResultCache

class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) = {
    val base = Files.createTempDirectory("graft_rc_spec")
    (base.resolve("src").toString, base.resolve("cache").toString)
  }

  test("hit serves stored bytes without touching the source data") {
    val (src, root) = freshDirs()
    (1L to 100L).map(i => (i, i % 7)).toDF("id", "g")
      .write.parquet(src)
    val q = spark.read.parquet(src).filter(col("id") > 10)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("id").as("s"))
    assert(!ResultCache.isCached(q, root))
    val first = ResultCache.cached(q, root)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ResultCache.isCached(q, root))
    // corrupt every source data file IN PLACE, preserving (size, mtime) so
    // the fingerprint is unchanged: a true cache hit never reads these
    // bytes, while any recompute path would now fail loudly
    Files.list(Paths.get(src)).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet")) {
        val mtime = Files.getLastModifiedTime(p)
        val len = Files.size(p).toInt
        Files.write(p, Array.fill[Byte](len)(0x5A))
        Files.setLastModifiedTime(p, mtime)
      }
    }
    val second = ResultCache.cached(q, root)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(second.toSeq == first.toSeq)
    assert(first.map(_._2).sum == 90L)
  }

  test("fingerprint is semantic: formulation-invariant, change-sensitive") {
    val (src, root) = freshDirs()
    (1L to 50L).map(i => (i, s"v$i")).toDF("a", "b").write.parquet(src)
    def rd = spark.read.parquet(src)
    // same semantics, different spellings -> same key
    val f1 = ResultCache.fingerprint(rd.filter(col("a") > 5).select("a", "b"))
    val f2 = ResultCache.fingerprint(rd.filter(expr("a > 5"))
      .select(col("a"), col("b")))
    assert(f1 == f2)
    // different predicate literal -> different key
    assert(ResultCache.fingerprint(rd.filter(col("a") > 6)
      .select("a", "b")) != f1)
    // rewritten input (same path, new bytes/mtime) -> different key
    val before = rd.filter(col("a") > 5).select("a", "b")
    ResultCache.cached(before, root)
    (1L to 50L).map(i => (i, s"w$i")).toDF("a", "b")
      .write.mode("overwrite").parquet(src)
    val after = spark.read.parquet(src).filter(col("a") > 5).select("a", "b")
    assert(ResultCache.fingerprint(after) != f1)
    assert(!ResultCache.isCached(after, root))
  }

  test("vacuum clears entries; repopulation works") {
    val (src, root) = freshDirs()
    (1L to 10L).toDF("x").write.parquet(src)
    val q = spark.read.parquet(src).agg(sum("x").as("s"))
    assert(ResultCache.cached(q, root).as[Long].head() == 55L)
    assert(ResultCache.isCached(q, root))
    ResultCache.vacuum(root)
    assert(!ResultCache.isCached(q, root))
    assert(ResultCache.cached(q, root).as[Long].head() == 55L)
  }
}
