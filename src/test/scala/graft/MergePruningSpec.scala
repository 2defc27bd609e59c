package graft

import org.apache.spark.sql.functions._

/** Plan-shape audit for the pruned merge path: the target scan must carry
  * the touched-partition predicate as PartitionFilters (directory-level
  * skip), not a post-scan Filter over all partitions. */
class MergePruningSpec extends SparkSpec {
  import spark.implicits._

  test("property: skewed batch sequence never rewrites untouched partitions") {
    // VERDICT r4 #7: many single-partition batches, 2/3 hammering one hot
    // partition, alternating the plain pruned merge and the pruned
    // txn-window route; after EVERY merge the untouched partitions' files
    // must be byte-identical, and the final table must equal a driver-side
    // fold of the batch sequence. Partition column is `processperiod` (the
    // window route's contract column); keys never move partitions
    // (partitionStable's caller contract).
    import graft.meta.LoadMode
    import graft.write.MergeWriter
    val nParts = 6
    val path = java.nio.file.Files.createTempDirectory("skew").toString + "/t"
    def partFiles(p: Int): Map[String, Seq[Byte]] = {
      val dir = new java.io.File(s"$path/processperiod=$p")
      if (!dir.exists()) Map.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val expectRows = scala.collection.mutable.Map[Long, (Long, String, Int)](
      (1 to 120).map(i => i.toLong -> ((i.toLong, s"v$i", i % nParts))): _*)
    val t0 = expectRows.values.toSeq.toDF("id", "v", "processperiod")
    MergeWriter.write(spark, t0, path, LoadMode.FullOverwrite,
      partitionCols = Seq("processperiod"), retrySleepMs = _ => 0L)
    val rng = new scala.util.Random(42)
    for (round <- 1 to 12) {
      val hot = if (rng.nextInt(3) < 2) 0 else 1 + rng.nextInt(nParts - 1)
      val before = (0 until nParts).filterNot(_ == hot)
        .map(p => p -> partFiles(p)).toMap
      // one updated key already LIVING in `hot` + one new key landing there
      val residents = expectRows.values.filter(_._3 == hot).map(_._1).toSeq
        .sorted
      val upId = residents(rng.nextInt(residents.size))
      val upRow = (upId, s"r$round", hot)
      val newRow = (1000L + round, s"n$round", hot)
      val batch = Seq(upRow, newRow).toDF("id", "v", "processperiod")
      if (round % 4 == 0)
        // cutoff above every live period: the deleted window is empty, so
        // the route reduces to an upsert but still exercises the pruned
        // window path (touched dirs = batch partitions + emptied periods)
        MergeWriter.write(spark, batch, path,
          LoadMode.TransactionalWindowMerge(0), ids = Seq("id"),
          partitionCols = Seq("processperiod"), cutoffPeriod = nParts + 1,
          retrySleepMs = _ => 0L, partitionStable = true)
      else
        MergeWriter.write(spark, batch, path, LoadMode.IncrementalMerge,
          ids = Seq("id"), partitionCols = Seq("processperiod"),
          retrySleepMs = _ => 0L, partitionStable = true)
      expectRows(upRow._1) = upRow
      expectRows(newRow._1) = newRow
      for ((p, files) <- before)
        assert(partFiles(p) == files,
          s"round $round rewrote untouched partition processperiod=$p")
    }
    val got = spark.read.parquet(path).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(got == expectRows.values.map(r => (r._1, r._2)).toSet)
  }

  test("pruned-merge target scan partition-prunes at the directory level") {
    val path = java.nio.file.Files.createTempDirectory("plan").toString + "/t"
    (1 to 1000).map(i => (i, s"v$i", i % 10)).toDF("id", "v", "p")
      .write.partitionBy("p").parquet(path)
    // the OR-of-equalities shape prunedMergeWrite builds
    val pred = (col("p") === lit(3)) || (col("p") === lit(7))
    val scan = spark.read.parquet(path).filter(pred)
    val plan = scan.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("p")), s"no PartitionFilters in:\n$plan")
    // only the two touched directories are ever opened
    val dirs = scan.select(input_file_name()).distinct().as[String].collect()
      .map(f => f.split("/p=")(1).split("/")(0)).distinct.sorted
    assert(dirs.toSeq == Seq("3", "7"))
  }
}
