package graft

import org.apache.spark.sql.functions._
import graft.incr.Incremental
import graft.ops.Skew
import graft.write.MergeWriter

/** Skew salting, compaction, epoch watermark conversions. */
class ScaleOpsSpec extends SparkSpec {

  test("salted join is row-identical to the plain join (inner + left)") {
    import spark.implicits._
    // heavy skew: key 1 dominates
    val left = ((1 to 500).map(i => (1L, s"a$i")) ++
      Seq((2L, "b"), (3L, "c"), (9L, "no-match"))).toDF("k", "v")
    val right = Seq((1L, "X"), (2L, "Y"), (4L, "unused")).toDF("k", "w")

    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
      val salted = Skew.saltedJoin(left, right, Seq("k"), nSalts = 7, jt)
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
        s"mismatch for $jt")
    }
    // salt actually spreads the hot key over multiple partitions
    val parts = Skew.saltedJoin(left, right, Seq("k"), 7)
      .withColumn("p", spark_partition_id())
      .filter($"k" === 1L).select("p").distinct().count()
    assert(parts > 1)
  }

  test("salted join rejects right/full joins (right side is replicated)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
  }

  test("compact rewrites many files into one with identical content (K7)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    df.repartition(12).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before > 1)
    val rows = MergeWriter.compact(spark, dir, target = 1)
    assert(rows == 1000L)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sorted
      .sameElements((1 to 1000).map(i => (i.toLong, s"r$i"))))
  }

  test("epoch watermark conversions round-trip to second precision (A4)") {
    import spark.implicits._
    val df = Seq("2024-03-01 10:20:30.456").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val row = df.select(
      Incremental.timestampToEpoch($"ts").as("e"),
      date_format(Incremental.epochToTimestamp(
        Incremental.timestampToEpoch($"ts")), "yyyy-MM-dd HH:mm:ss").as("rt"))
      .head()
    assert(row.getLong(0) == 1709288430L)
    assert(row.getString(1) == "2024-03-01 10:20:30")
  }
}

/** Scale-knob derivation rules measured by the sf10 probe
  * (BENCH_SF10.json followups). */
class ScaleKnobsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.ops.Similarity.{kFor, planesFor}

  test("planesFor holds expected bucket depth across decades") {
    // 2k vectors (sf0.1) -> 6 planes = the catalog's pinned value;
    // every 10x decade adds ~3.3 planes, so candidates stay linear
    assert(planesFor(2000) == 6)
    assert(planesFor(20000) == 10)
    assert(planesFor(200000) == 13)
    // bucket depth n / 2^planes stays within ~2x of the target
    for (n <- Seq(1000L, 10000L, 100000L, 10000000L, 1000000000L)) {
      val depth = n.toDouble / math.pow(2, planesFor(n))
      assert(depth <= 32.0 && depth > 8.0, s"n=$n depth=$depth")
    }
    // clamps: tiny corpora never go below 4, planet-scale stays <= 30
    assert(planesFor(10) == 4 && planesFor(Long.MaxValue / 2) == 30)
  }

  test("kFor keeps within-cluster pair work linear in n") {
    assert(kFor(2000) == 1)       // small corpus: one cluster is fine
    assert(kFor(200000) == 80)    // the measured sf10 counterfactual
    // pair work n * target / 2 per unit: ratio between decades ~ 10x
    def pairWork(n: Long) = n.toDouble / kFor(n) * n / 2
    val r = pairWork(2000000) / pairWork(200000)
    assert(r < 12.0, s"pair work grew $r x per decade")
  }
}
