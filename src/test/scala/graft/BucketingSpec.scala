package graft

import org.apache.spark.sql.functions._
import graft.write.Bucketing

/** Bucketed co-located joins + partition pruning: correctness AND the plan
  * properties that matter at scale. */
class BucketingSpec extends SparkSpec {

  test("IS_PARTITION write yields partition-pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toString + "/t"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // K3 partitioned overwrite (the IS_PARTITION column flag)
    graft.write.MergeWriter.writeSwap(orders, dir, Seq("o_orderstatus"))

    val pruned = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(o_orderstatus"),
      s"expected a partition filter in:\n$scan")
    // and the values survive the round trip
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed join produces no shuffle and matches the plain join") {
    val root = java.nio.file.Files.createTempDirectory("bucketing").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "li_b", s"$root/li", Seq("l_orderkey"), 8)
    Bucketing.writeBucketed(o, "o_b", s"$root/o", Seq("l_orderkey"), 8)

    // force the sort-merge path so the assertion is about bucketing, not a
    // broadcast that hides the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", Seq("l_orderkey"))
      assert(Bucketing.isShuffleFree(joined),
        s"expected no hash-partition exchange:\n${joined.queryExecution.executedPlan}")

      val plain = li.join(o, Seq("l_orderkey"))
      assert(!Bucketing.isShuffleFree(plain)) // sanity: unbucketed DOES shuffle

      assert(joined.count() == plain.count())
      val a = joined.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0)
      val b = plain.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0)
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("clustered write: disjoint per-file key ranges, content preserved") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString + "/t"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeClustered(orders, dir, Seq("o_orderkey"), files = 8)
    // every parquet file must cover a key range no other file overlaps —
    // that disjointness is exactly what lets min/max stats skip files
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"overlapping file ranges: $ranges")
      case _ =>
    }
    // content identical to the source
    assert(spark.read.parquet(dir).count() == orders.count())
    assert(spark.read.parquet(dir).agg(sum("o_orderkey")).head().getLong(0) ==
      orders.agg(sum("o_orderkey")).head().getLong(0))
  }

  test("z-order write: BOTH dimensions skip; lexicographic only the first") {
    import spark.implicits._
    // uniform 128x128 grid — the adversarial case for single-key clustering
    val grid = (for (x <- 0 until 128; y <- 0 until 128)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def avgSpan(dir: String, c: String): Double = {
      val spans = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString).agg(min(c), max(c)).head()
          (r.getLong(1) - r.getLong(0)).toDouble
        }
      spans.sum / spans.length
    }
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val ldir = java.nio.file.Files.createTempDirectory("lex").toString + "/t"
    Bucketing.writeZOrdered(grid, zdir, Seq("x", "y"), files = 16)
    Bucketing.writeClustered(grid, ldir, Seq("x", "y"), files = 16)
    // 16 z-files = compact 32x32-ish blocks: each file spans ~1/4 of each
    // axis; lexicographic files span the FULL y axis
    assert(avgSpan(zdir, "x") < 64.0 && avgSpan(zdir, "y") < 64.0,
      s"z spans: x=${avgSpan(zdir, "x")} y=${avgSpan(zdir, "y")}")
    assert(avgSpan(ldir, "y") > 100.0) // no skipping on the second key
    // content preserved
    assert(spark.read.parquet(zdir).as[(Long, Long)].collect().toSet ===
      grid.as[(Long, Long)].collect().toSet)
  }

  test("z-order with 4 columns: no sign-bit wrap, every axis skips") {
    import spark.implicits._
    // 8^4 lattice; with a 16-bit grid the 4th column's top bit would land
    // at position 63, so max-grid rows sort NEGATIVE and one range file
    // gets both corners of the hypercube — the 15-bit cap keeps the curve
    // unsigned-monotone and every file a compact rectangle on every axis
    val grid = (for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8;
                     d <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong, d.toLong)).toDF("a", "b", "c", "d")
    val dir = java.nio.file.Files.createTempDirectory("z4").toString + "/t"
    Bucketing.writeZOrdered(grid, dir, Seq("a", "b", "c", "d"), files = 16)
    for (cname <- Seq("a", "b", "c", "d")) {
      val spans = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(cname), max(cname)).head()
          r.getLong(1) - r.getLong(0)
        }
      // a wrapped file spans the whole 0..7 axis; compact blocks span <= 4
      assert(spans.max <= 4, s"$cname spans: ${spans.toSeq}")
    }
    assert(spark.read.parquet(dir).as[(Long, Long, Long, Long)]
      .collect().toSet === grid.as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("z-order survives empty input and all-null columns") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("znull").toString
    // empty frame: bounds row is all null — must not NPE
    Bucketing.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("x", "y"), s"$root/empty",
      Seq("x", "y"), files = 4)
    assert(spark.read.parquet(s"$root/empty").count() == 0)
    // one clustered column entirely null: rows keep a defined curve position
    val mixed = Seq((1L, None: Option[Long]), (2L, None), (3L, None))
      .toDF("x", "y")
    Bucketing.writeZOrdered(mixed, s"$root/nullcol", Seq("x", "y"), files = 2)
    assert(spark.read.parquet(s"$root/nullcol")
      .as[(Long, Option[Long])].collect().toSet ===
      Set((1L, None), (2L, None), (3L, None)))
  }
}
