package graft

import org.apache.spark.sql.functions._

/** Plan-shape audit for the pruned merge path: the target scan must carry
  * the touched-partition predicate as PartitionFilters (directory-level
  * skip), not a post-scan Filter over all partitions. */
class MergePruningSpec extends SparkSpec {
  import spark.implicits._

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
