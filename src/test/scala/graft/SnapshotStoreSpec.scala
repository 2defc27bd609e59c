package graft

import org.apache.spark.sql.functions._
import graft.write.SnapshotStore

/** Snapshot commit protocol: atomic pointer flip, reader isolation,
  * optimistic writer serialization, vacuum retention. */
class SnapshotStoreSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString + "/t"

  test("commit then read round-trips; versions are monotone") {
    import spark.implicits._
    val root = tmp()
    assert(SnapshotStore.currentVersion(root).isEmpty)
    val v0 = SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    val v1 = SnapshotStore.commit(Seq((1L, "a2")).toDF("id", "v"), root)
    assert(v0 == 0 && v1 == 1)
    assert(SnapshotStore.currentVersion(root).contains(1L))
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toSet === Set((1L, "a2")))
    // time travel to the first version
    assert(SnapshotStore.readVersion(spark, root, 0).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("a reader keeps its snapshot while later versions commit") {
    import spark.implicits._
    val root = tmp()
    SnapshotStore.commit(Seq((1L, "old")).toDF("id", "v"), root)
    val reader = SnapshotStore.read(spark, root) // resolves version 0 NOW
    SnapshotStore.commit(Seq((1L, "new")).toDF("id", "v"), root)
    // the reader's plan still reads the immutable v0 directory
    assert(reader.as[(Long, String)].collect().toSet === Set((1L, "old")))
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toSet === Set((1L, "new")))
  }

  test("concurrent committers serialize; every commit survives as a version") {
    import spark.implicits._
    val root = tmp()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            SnapshotStore.commit(Seq((i.toLong, s"w$i")).toDF("id", "v"), root)
        })
      }
      val versions = futures.map(_.get()).sorted
      // 8 distinct versions, no claim collision lost data
      assert(versions == (0L to 7L), s"got $versions")
      // every writer's frame is intact under its committed version
      for ((v, i) <- versions.zipWithIndex.sortBy(_._1)) {
        val rows = SnapshotStore.readVersion(spark, root, v)
          .as[(Long, String)].collect()
        assert(rows.length == 1 && rows.head._2.startsWith("w"), s"v$v: ${rows.toSeq}")
      }
      assert(SnapshotStore.currentVersion(root).contains(7L))
    } finally pool.shutdown()
  }

  test("commitMerge: concurrent read-modify-commits never lose an update") {
    import spark.implicits._
    val root = tmp()
    // 6 concurrent appenders; each merges {its row} ∪ current snapshot.
    // A lost update (two writers planning from the same head, both
    // publishing) would drop a row from the final table.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val futures = (0 until 6).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = SnapshotStore.commitMerge(spark, root,
            { cur =>
              val mine = Seq((i.toLong, s"w$i")).toDF("id", "v")
              cur.map(_.union(mine)).getOrElse(mine)
            })
        })
      }
      val versions = futures.map(_.get()).sorted
      assert(versions == (0L to 5L), s"got $versions")
    } finally pool.shutdown()
    val rows = SnapshotStore.read(spark, root)
      .as[(Long, String)].collect().toSet
    assert(rows === (0 until 6).map(i => (i.toLong, s"w$i")).toSet)
  }

  test("a crashed commit (claimed, never flipped) is adopted, not blocking") {
    import spark.implicits._
    val root = tmp()
    SnapshotStore.commit(Seq((1L, "base")).toDF("id", "v"), root)
    // simulate a committer that died between rename-claim and pointer flip:
    // a COMPLETE _v000001 (full-table state, as any version is) exists but
    // the pointer still says 0
    Seq((1L, "base"), (2L, "crashed")).toDF("id", "v")
      .write.parquet(s"$root/.staging-crash")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$root/.staging-crash"),
      java.nio.file.Paths.get(s"$root/_v000001"))
    assert(SnapshotStore.currentVersion(root).contains(0L))
    // readers still see version 0 (the crash published no read point) ...
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toSet === Set((1L, "base")))
    // ... but the next merge BUILDS ON the complete crashed version (its
    // data is never half-written — rename is the publication) and its
    // commit flips the pointer past it
    val v = SnapshotStore.commitMerge(spark, root,
      cur => cur.get.union(Seq((3L, "after")).toDF("id", "v")))
    assert(v == 2L)
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toSet ===
      Set((1L, "base"), (2L, "crashed"), (3L, "after")))
  }

  test("vacuum removes superseded versions, keeps retention window") {
    import spark.implicits._
    val root = tmp()
    for (i <- 0 until 5)
      SnapshotStore.commit(Seq((i.toLong, "x")).toDF("id", "v"), root)
    val removed = SnapshotStore.vacuum(root, keep = 2)
    assert(removed == 3)
    // latest two still readable
    assert(SnapshotStore.read(spark, root).count() == 1)
    assert(SnapshotStore.readVersion(spark, root, 3).count() == 1)
    // vacuumed version gone
    assertThrows[Exception](
      SnapshotStore.readVersion(spark, root, 0).collect())
  }

  test("partitioned snapshot prunes on the partition column") {
    import spark.implicits._
    val root = tmp()
    SnapshotStore.commit(
      Seq((1L, "F", 10.0), (2L, "O", 20.0)).toDF("id", "status", "x"),
      root, partitionCols = Seq("status"))
    val pruned = SnapshotStore.read(spark, root)
      .filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() == 1)
  }

  test("changesBetween classifies insert/update/delete; null-safe; evolves") {
    import spark.implicits._
    val root = tmp()
    SnapshotStore.commit(Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String])
    ).toDF("id", "v"), root)
    SnapshotStore.commit(Seq(
      (2L, Some("B")),          // update: payload changed
      (3L, None: Option[String]), // unchanged all-NULL payload -> dropped
      (4L, None: Option[String])  // insert with NULL payload
    ).toDF("id", "v"), root)
    val got = SnapshotStore.changesBetween(spark, root, 0L, 1L, Seq("id"))
      .as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> (("delete", Some("a"))), // old image on delete
      2L -> (("update", Some("B"))), // new image on update
      4L -> (("insert", None))))
    // a version diffed against itself is empty
    assert(SnapshotStore.changesBetween(spark, root, 1L, 1L, Seq("id"))
      .isEmpty)
    // schema evolution: a column added in v2 is ignored, not a phantom
    // change on every row
    SnapshotStore.commit(Seq((2L, Some("B"), 9), (4L, None: Option[String], 9))
      .toDF("id", "v", "extra"), root)
    assert(SnapshotStore.changesBetween(spark, root, 1L, 2L, Seq("id"))
      .as[(Long, String, Option[String])].collect().toSeq ==
      Seq((3L, "delete", None)))
  }

  test("applying the change feed to the old version rebuilds the new one") {
    import spark.implicits._
    val root = tmp()
    val rnd = new scala.util.Random(11)
    def table(n: Int) = (1 to n).map(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(5), rnd.nextBoolean()))
      .groupBy(_._1).map(_._2.head).toSeq.toDF("id", "x", "flag")
    SnapshotStore.commit(table(30), root)
    SnapshotStore.commit(table(35), root)
    val changes = SnapshotStore.changesBetween(spark, root, 0L, 1L, Seq("id"))
    // consumer replay: delete the deletes, upsert the inserts/updates
    val rebuilt = SnapshotStore.readVersion(spark, root, 0L)
      .join(changes.filter($"change_op".isin("delete", "update"))
        .select("id"), Seq("id"), "left_anti")
      .unionByName(changes.filter($"change_op" =!= "delete")
        .drop("change_op"))
    val want = SnapshotStore.readVersion(spark, root, 1L)
    assert(rebuilt.exceptAll(want).isEmpty && want.exceptAll(rebuilt).isEmpty)
  }

  test("tags: immutable refs that pin versions through vacuum") {
    import spark.implicits._
    val root = tmp()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "v"), root)
    SnapshotStore.commit(Seq((1L, "b")).toDF("id", "v"), root)
    SnapshotStore.commit(Seq((1L, "c")).toDF("id", "v"), root)
    SnapshotStore.tag(root, "train-v3", 0L)
    assert(SnapshotStore.tags(root) == Map("train-v3" -> 0L))
    assert(SnapshotStore.readTag(spark, root, "train-v3")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // a tag never moves
    intercept[IllegalStateException](SnapshotStore.tag(root, "train-v3", 1L))
    // vacuum keeps the tagged version, drops the untagged superseded one
    assert(SnapshotStore.vacuum(root, keep = 1) == 1) // only v1 removed
    assert(SnapshotStore.readTag(spark, root, "train-v3")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    intercept[Exception](SnapshotStore.readVersion(spark, root, 1L).collect())
    // untagging releases the pin
    assert(SnapshotStore.untag(root, "train-v3"))
    assert(SnapshotStore.vacuum(root, keep = 1) == 1) // now v0 goes
    intercept[IllegalArgumentException](
      SnapshotStore.readTag(spark, root, "train-v3"))
  }

  test("applyChanges replicates a table through its CDC feed") {
    import spark.implicits._
    val src = tmp(); val replica = tmp()
    val rnd = new scala.util.Random(23)
    def table(n: Int) = (1 to n).map(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(5)))
      .groupBy(_._1).map(_._2.head).toSeq.toDF("id", "x")
    SnapshotStore.commit(table(30), src)
    SnapshotStore.commit(table(35), src)
    // replica bootstraps from the upstream v0 image, then consumes the feed
    SnapshotStore.commit(SnapshotStore.readVersion(spark, src, 0L), replica)
    val feed = SnapshotStore.changesBetween(spark, src, 0L, 1L, Seq("id"))
    SnapshotStore.applyChanges(spark, replica, feed, Seq("id"))
    val got = SnapshotStore.read(spark, replica)
    val want = SnapshotStore.readVersion(spark, src, 1L)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // an empty feed still commits (replication checkpoint), content stable
    val v = SnapshotStore.applyChanges(spark, replica,
      feed.filter(lit(false)), Seq("id"))
    assert(v == 2L)
    assert(SnapshotStore.read(spark, replica).exceptAll(want).isEmpty)
  }
}
