package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts over a streamed raw drop match the batch equivalent") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val batch = graft.sources.EventLog.events(spark, sf)
    batch.write.mode("overwrite").parquet(dir)

    val streamed = StreamingIngest.incrementalStream(spark, dir,
      batch.schema, "ts", "10 minutes")
    val agg = StreamingIngest.windowedCounts(streamed, "ts", "1 hour", "1 hour")
    val got = StreamingIngest.runToMemory(agg, "win_counts",
        OutputMode.Complete())
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val want = StreamingIngest.windowedCounts(batch, "ts", "1 hour", "1 hour")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming heavy-hitter candidates: bounded state, exact below k") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val agg = StreamingIngest.heavyHitterCandidates(mem.toDF().toDF("w"),
      "w", k = 32)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("hh_cand").start()
    // 3 micro-batches, 8 distinct values < k: with no decrement pressure
    // the MG merge is pure addition, so the final summary IS the exact
    // count map regardless of how the stream was batched
    mem.addData(Seq.fill(5)("a") ++ Seq.fill(2)("b"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(3)("a") ++ (1 to 6).map(i => s"x$i"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(4)("b"): _*)
    q.processAllAvailable()
    q.stop()
    val row = spark.table("hh_cand").collect().head
    val cand = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map("a" -> 8L, "b" -> 6L) ++
      (1 to 6).map(i => s"x$i" -> 1L).toMap
    assert(cand == expected)
    assert(row.getLong(1) == 20L)
  }

  test("stream-stream interval join agrees with the batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    val lmem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rmem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = StreamingIngest.intervalJoin(
      lmem.toDF().toDF("k", "lts", "x"),
      rmem.toDF().toDF("k", "rts", "tag"),
      key = "k", leftTs = "lts", rightTs = "rts",
      before = "10 minutes", after = "5 minutes", delay = "30 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin").start()
    try {
      // batch 1: in-window and out-of-window partners
      lmem.addData((1L, ts(100), 1.0), (2L, ts(200), 2.0))
      rmem.addData((1L, ts(95), "in"), (1L, ts(80), "too_old"),
        (2L, ts(204), "in2"))
      q.processAllAvailable()
      // batch 2: an out-of-order right row joins a still-buffered left row.
      // It must land INSIDE the eviction horizon: after batch 1 the right
      // watermark is 204-30m = 174, so the left@100 row (horizon 105) is
      // already evicted — only left@200 can still gain partners. That
      // eviction is the bounded-state guarantee, not data loss.
      rmem.addData((2L, ts(198), "late_in"), (3L, ts(100), "wrong_key"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin").select("k", "x", "tag")
      .as[(Long, Double, String)].collect().toSet
    // the batch join over the same data, same predicate
    val lb = Seq((1L, ts(100), 1.0), (2L, ts(200), 2.0)).toDF("k", "lts", "x")
    val rb = Seq((1L, ts(95), "in"), (1L, ts(80), "too_old"),
      (2L, ts(204), "in2"), (2L, ts(198), "late_in"),
      (3L, ts(100), "wrong_key")).toDF("k", "rts", "tag")
    val want = lb.as("l").join(rb.as("r"),
        col("l.k") === col("r.k") &&
          col("r.rts") >= col("l.lts") - expr("INTERVAL 10 minutes") &&
          col("r.rts") <= col("l.lts") + expr("INTERVAL 5 minutes"))
      .select(col("l.k"), col("x"), col("tag"))
      .as[(Long, Double, String)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, 1.0, "in"), (2L, 2.0, "late_in"),
      (2L, 2.0, "in2")))
  }

  test("streaming dedup keeps one row per key within the watermark horizon") {
    val dir = Files.createTempDirectory("graft_sdedup").toString
    // duplicate every user_id: base rows + clones with different event_ids
    val base = graft.sources.EventLog.events(spark, sf)
      .limit(300)
    base.union(base.withColumn("event_id", col("event_id") + 1000000L))
      .write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream.schema(base.schema).parquet(dir)
    val deduped = StreamingIngest.streamingDedup(streamed,
      Seq("user_id"), "ts", "10 minutes")
    val got = StreamingIngest.runToMemory(deduped, "sdedup",
      OutputMode.Append())
    val nUsers = base.select("user_id").distinct().count()
    assert(got.count() == nUsers)
    assert(got.select("user_id").distinct().count() == nUsers)
  }

  test("merge sink: micro-batches upsert into a partitioned stage table") {
    val src = Files.createTempDirectory("graft_msrc").toString
    val stage = Files.createTempDirectory("graft_mstage").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_mckpt").toString
    import spark.implicits._
    // batch 1: initial rows across two partitions
    Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "p")
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("id LONG, v STRING, p INT").parquet(src)
    val q = StreamingIngest.mergeSink(stream, stage, Seq("id"), ckpt,
      partitionCols = Seq("p"), partitionStable = true)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(stage).count() == 2)
      // batch 2: update id=2, insert id=3 — an upsert, not an append
      Seq((2L, "B", 20), (3L, "c", 20)).toDF("id", "v", "p")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(stage).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("annDedupSink drops near-dups vs corpus and batch, index stays canonical") {
    val src = Files.createTempDirectory("graft_asrc").toString
    val out = Files.createTempDirectory("graft_aout").toString + "/out"
    val idx = Files.createTempDirectory("graft_aidx").toString + "/idx"
    val ckpt = Files.createTempDirectory("graft_ackpt").toString
    val A = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val B = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val C = Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
    // batch 1: two distinct vectors
    Seq((1L, A), (2L, B)).toDF("vec_id", "embedding")
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(src)
    val q = StreamingIngest.annDedupSink(stream, "vec_id", "embedding",
      out, idx, ckpt, threshold = 0.99, tables = 4, planes = 4, dims = 8)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("vec_id")
        .as[Long].collect().toSet == Set(1L, 2L))
      // batch 2: 3 duplicates corpus A; 5 duplicates batch-mate 4 (C)
      Seq((3L, A), (4L, C), (5L, C)).toDF("vec_id", "embedding")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(out).select("vec_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
    // index holds exactly the canonical survivors, one row per LSH table
    val idxIds = spark.read.parquet(idx).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    assert(idxIds == Map(1L -> 4L, 2L -> 4L, 4L -> 4L))
  }

  test("contamination gate flags streamed docs against a static benchmark") {
    val dir = Files.createTempDirectory("graft_sgate").toString
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta suffix"),
      (2L, "alpha beta unrelated gamma delta elsewhere"),
      (3L, "completely different content here")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val gated = StreamingIngest.contaminationGate(streamed, "text",
      bench, "doc_id", "text", n = 4, minShared = 2)
    val got = StreamingIngest.runToMemory(gated, "sgate", OutputMode.Append())
      .select("doc_id", "n_matched", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // bench has 3 distinct 4-grams; doc 1 contains all 3 contiguously,
    // doc 2 shares none contiguously (gap breaks every 4-gram), doc 3 none
    assert(got(1L) == ((3L, true)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false)))
    // the identical function on the batch frame agrees with the stream
    val batchGot = StreamingIngest.contaminationGate(docs, "text",
      bench, "doc_id", "text", n = 4, minShared = 2)
      .select("doc_id", "n_matched", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(batchGot == got)
  }

  test("bloom contamination gate: parity with the exact gate and batch bloom") {
    val dir = Files.createTempDirectory("graft_bgate").toString
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta suffix"),
      (2L, "alpha beta unrelated gamma delta elsewhere"),
      (3L, "completely different content here"),
      (4L, "one two three four and then five six seven"),
      (5L, null.asInstanceOf[String]),
      (6L, "tiny")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    // at 2^20 bits / k=4 over ~7 benchmark grams the FP probability is
    // ~1e-20 — the bloom gate must agree with the exact gate bit-for-bit
    val exact = StreamingIngest.contaminationGate(docs, "text",
      bench, "doc_id", "text", n = 4, minShared = 2)
      .select("doc_id", "n_matched", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val bloomBatch = StreamingIngest.contaminationGateBloom(docs, "text",
      bench, "doc_id", "text", n = 4, minShared = 2)
      .select("doc_id", "n_matched", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(bloomBatch == exact)
    // the same plan runs as a STREAM (stateless, append mode) and agrees
    val streamed = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val gated = StreamingIngest.contaminationGateBloom(streamed, "text",
      bench, "doc_id", "text", n = 4, minShared = 2)
    val got = StreamingIngest.runToMemory(gated, "bgate", OutputMode.Append())
      .select("doc_id", "n_matched", "contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == exact)
    // and the per-doc hit counts agree with the BATCH bloom decontaminator
    // (same BloomBitsAgg bits, different plan shape)
    val nHits = graft.ops.Dedup.bloomContamination(docs, "doc_id", "text",
        bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (id, (m, _)) =>
      assert(nHits.getOrElse(id, 0L) == m, s"doc $id: bloom batch disagrees")
    }
  }

  test("anomaly gate flags a spiking window against baseline moments") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // baseline per-cell counts for key "a": eight 5s, one 4, one 6 ->
    // n=10, s1=50, s2=252; 3 sigma = 3*sqrt(0.2) ~ 1.34 around mean 5
    val baseline = ((1 to 8).flatMap(c => Seq.fill(5)(("a", c))) ++
      Seq.fill(4)(("a", 9)) ++ Seq.fill(6)(("a", 10))).toDF("key", "cell")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val gated = StreamingIngest.anomalyGate(
      mem.toDF().toDF("ts", "key"), "ts", Seq("key"),
      windowDur = "5 minutes", watermark = "0 seconds",
      baseline, col("cell"), k = 3)
    // window 10:00 has 6 events (within 3 sigma), window 10:05 spikes to 9
    mem.addData((1 to 6).map(i => (ts(0), "a")) ++
      (1 to 9).map(i => (ts(5), "a")))
    // a later event only advances the watermark past both windows
    mem.addData(Seq((ts(20), "a")))
    val got = StreamingIngest.runToMemory(gated, "agate", OutputMode.Append())
      .as[(String, java.sql.Timestamp, Long)].collect().toSeq
    assert(got == Seq(("a", ts(5), 9L)),
      s"expected only the 9-event window flagged, got $got")
  }

  test("snapshot merge sink: versions commit per batch, readers isolated") {
    import graft.write.SnapshotStore
    val src = Files.createTempDirectory("graft_snapsrc").toString
    val root = Files.createTempDirectory("graft_snapstage").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_snapckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema("id LONG, v STRING").parquet(src)
    val q = StreamingIngest.snapshotMergeSink(stream, root, Seq("id"), ckpt)
    try {
      q.processAllAvailable()
      val v0 = SnapshotStore.currentVersion(root)
      assert(v0.contains(0L))
      // a reader resolves version 0 and keeps it across the next commit
      val reader = SnapshotStore.read(spark, root)
      Seq((2L, "B"), (3L, "c")).toDF("id", "v")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(SnapshotStore.currentVersion(root).contains(1L))
      assert(reader.select("id", "v").as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b")))
    } finally q.stop()
    assert(SnapshotStore.read(spark, root).select("id", "v")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("partial merge sink: change-image nulls keep table values") {
    import graft.write.SnapshotStore
    val src = Files.createTempDirectory("graft_pmsrc").toString
    val root = Files.createTempDirectory("graft_pmstage").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_pmckpt").toString
    Seq((1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)))
      .toDF("id", "v", "n").write.mode("append").parquet(src)
    val stream = spark.readStream.schema("id LONG, v STRING, n LONG")
      .parquet(src)
    val q = StreamingIngest.partialMergeSink(stream, root, Seq("id"), ckpt)
    try {
      q.processAllAvailable()
      // sparse change images: patch one column, null means keep
      Seq((1L, None: Option[String], Some(11L)), // n patched, v kept
        (2L, Some("B"), None: Option[Long]), // v patched, n kept
        (3L, Some("c"), None: Option[Long])) // sparse insert
        .toDF("id", "v", "n").write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotStore.read(spark, root).select("id", "v", "n")
      .as[(Long, Option[String], Option[Long])].collect().toSet ===
      Set((1L, Some("a"), Some(11L)), (2L, Some("B"), Some(20L)),
        (3L, Some("c"), None)))
  }

  test("scd2 sink: micro-batches build version history") {
    val src = Files.createTempDirectory("graft_s2src").toString
    val stage = Files.createTempDirectory("graft_s2stage").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_s2ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema("id LONG, v STRING").parquet(src)
    val q = StreamingIngest.scd2Sink(stream, stage, Seq("id"), ckpt)
    try {
      q.processAllAvailable()
      Seq((2L, "B"), (3L, "c")).toDF("id", "v")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(stage)
      .select("id", "v", "valid_to", "is_current")
      .as[(Long, String, Option[String], Boolean)].collect().toSet
    assert(rows === Set(
      (1L, "a", None, true),                  // untouched from batch 0
      (2L, "b", Some("batch-000001"), false), // closed by batch 1
      (2L, "B", None, true),
      (3L, "c", None, true)))
  }

  test("scd2 sink: empty first micro-batch does not poison the table") {
    val src = Files.createTempDirectory("graft_s2esrc").toString
    val stage = Files.createTempDirectory("graft_s2estage").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_s2eckpt").toString
    // batch 0 filters to zero rows: nothing must be bootstrapped (a
    // _SUCCESS-only table would break every later batch's schema read)
    Seq((-1L, "drop")).toDF("id", "v").write.mode("append").parquet(src)
    val stream = spark.readStream.schema("id LONG, v STRING").parquet(src)
      .filter(col("id") >= 0)
    val q = StreamingIngest.scd2Sink(stream, stage, Seq("id"), ckpt)
    try {
      q.processAllAvailable()
      assert(!graft.write.MergeWriter.tableExists(stage))
      Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(src)
      q.processAllAvailable()
      Seq((1L, "b")).toDF("id", "v").write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(stage)
      .select("id", "v", "is_current")
      .as[(Long, String, Boolean)].collect().toSet
    assert(rows === Set((1L, "a", false), (1L, "b", true)))
  }

  test("scd2 sink: closed partitions are immutable across micro-batches") {
    val src = Files.createTempDirectory("graft_s2immsrc").toString
    val stage = Files.createTempDirectory("graft_s2immstage").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_s2immckpt").toString
    def fileNames(dir: String): Set[String] = {
      val d = new java.io.File(dir)
      if (!d.isDirectory) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getName).toSet
    }
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema("id LONG, v STRING").parquet(src)
    val q = StreamingIngest.scd2Sink(stream, stage, Seq("id"), ckpt)
    try {
      q.processAllAvailable()
      Seq((1L, "A")).toDF("id", "v").write.mode("append").parquet(src)
      q.processAllAvailable()
      // batch 1 closed (1,"a") into its own valid_to partition
      val closed1 = s"$stage/scd_part=batch-000001"
      val snapshot = fileNames(closed1)
      assert(snapshot.nonEmpty, "expected a closed partition after batch 1")
      Seq((2L, "B")).toDF("id", "v").write.mode("append").parquet(src)
      q.processAllAvailable()
      // batch 2 closed (2,"b") elsewhere; batch 1's closed files UNTOUCHED
      // (same physical files — the whole-table rewrite would have replaced
      // them with freshly named parts)
      assert(fileNames(closed1) === snapshot)
      assert(fileNames(s"$stage/scd_part=batch-000002").nonEmpty)
    } finally q.stop()
    val rows = spark.read.parquet(stage)
      .select("id", "v", "valid_to", "is_current")
      .as[(Long, String, Option[String], Boolean)].collect().toSet
    assert(rows === Set(
      (1L, "a", Some("batch-000001"), false),
      (1L, "A", None, true),
      (2L, "b", Some("batch-000002"), false),
      (2L, "B", None, true)))
  }

  test("event-time session windows: streamed sessions equal the batch sessions") {
    val dir = Files.createTempDirectory("graft_sess").toString
    val batch = graft.sources.EventLog.events(spark, sf)
    batch.write.mode("overwrite").parquet(dir)
    val streamed = StreamingIngest.incrementalStream(spark, dir,
      batch.schema, "ts", "10 minutes")
    val got = StreamingIngest.runToMemory(
      StreamingIngest.sessionWindowStats(streamed), "sess_stream",
      OutputMode.Complete())
    val want = StreamingIngest.sessionWindowStats(batch)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // sessions are per-user disjoint and ordered
    val rows = want.select("user_id", "session_start", "session_end")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    for ((_, ss) <- rows.groupBy(_._1)) {
      val sorted = ss.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.getTime <= b._2.getTime)
        case _ =>
      }
    }
  }

  test("streaming decayed engagement: shift fold across batches, late data folds in") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{Event, DecayOut}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hours: Long) = new java.sql.Timestamp(hours * 3600000L)
    val mem = MemoryStream[Event]
    val q = StreamingIngest.decayedEngagement(mem.toDS(), halfLifeHours = 1L)
      .writeStream.outputMode("update").format("memory")
      .queryName("decay_stream").start()
    try {
      // hour 0: 4.0; hour 1: 2.0 -> acc = (4e6 >> 1) + 2e6 = 4e6 at week 1
      mem.addData(Event(1, ts(0), 1, "a", 4.0), Event(2, ts(1), 1, "a", 2.0))
      q.processAllAvailable()
      // LATE event at hour 0 (state is at week 1): += 1e6 >> 1
      // and a second user starts fresh
      mem.addData(Event(3, ts(0), 1, "a", 1.0), Event(4, ts(5), 2, "a", 0.5))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("decay_stream").as[DecayOut].collect()
    val byUpdate = rows.map(o => (o.user_id, o.n_events) -> o).toMap
    assert(byUpdate((1L, 2L)).engagement_micros == 4000000L)
    assert(byUpdate((1L, 2L)).week == 1L)
    assert(byUpdate((1L, 3L)).engagement_micros == 4500000L)
    assert(byUpdate((1L, 3L)).week == 1L) // late data does not rewind the week
    assert(byUpdate((2L, 1L)).engagement_micros == 500000L)
    assert(byUpdate((2L, 1L)).week == 5L)
  }

  test("streaming last-touch attribution matches a reference fold in order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{Event, AttributionOut}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic pseudo-random in-order stream over 5 users
    val types = Array("view", "click", "purchase", "error", "signup")
    val evs = (1L to 120L).map { i =>
      Event(i, new java.sql.Timestamp(i * 1000L), i % 5,
        types(((i % 7) * 2 % 5).toInt), i * 0.37)
    }
    // reference: the batch window semantics, folded directly
    val lastTouch = scala.collection.mutable.Map[Long, String]()
    val expected = evs.flatMap { e =>
      val out = e.event_type match {
        case "purchase" => Some(AttributionOut(e.event_id, e.user_id,
          lastTouch.getOrElse(e.user_id, "organic"),
          math.floor(e.value * 100).toLong))
        case _ => None
      }
      if (e.event_type == "click" || e.event_type == "view")
        lastTouch(e.user_id) = e.event_type
      out
    }.toSet
    assert(expected.exists(_.touch == "organic") &&
      expected.exists(_.touch != "organic")) // both branches exercised
    val mem = MemoryStream[Event]
    val q = StreamingIngest.lastTouchAttribution(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_stream").start()
    try {
      // split into three micro-batches to cross state boundaries
      evs.grouped(40).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("attr_stream").as[AttributionOut].collect().toSet
    assert(got == expected)
  }

  test("streaming debounce matches the batch lag-window on in-order data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{Event, DebounceOut}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val types = Array("view", "click")
    // monotone but irregular timeline: mostly 700ms steps with a 4s jump
    // every 13th event, so per-key gaps land on both sides of the 5s bar
    val evs = (1L to 80L).map { i =>
      Event(i, new java.sql.Timestamp(i * 700L + (i / 13L) * 4000L),
        i % 3, types((i % 2).toInt), 1.0)
    }
    // MICROSECOND-precision pair: batch gap = 4_999_100 us < 5 s, so the
    // second event must drop even though the millisecond gap reads 5000
    // (the getTime truncation bug class); appended at the tail in order
    val t1 = new java.sql.Timestamp(200000L); t1.setNanos(900000) // +900 us
    val t2 = new java.sql.Timestamp(205000L)
    val evs2 = evs ++ Seq(Event(900L, t1, 99L, "view", 1.0),
      Event(901L, t2, 99L, "view", 1.0))
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val lastSeen = scala.collection.mutable.Map[(Long, String), Long]()
    val expected = evs2.map { e =>
      val key = (e.user_id, e.event_type)
      val kept = lastSeen.get(key).forall(t => us(e.ts) - t >= 5000000L)
      lastSeen(key) = us(e.ts)
      DebounceOut(e.event_id, e.user_id, e.event_type, kept)
    }.toSet
    assert(expected.exists(_.kept) && expected.exists(!_.kept))
    assert(!expected.find(_.event_id == 901L).get.kept) // the micros case
    val mem = MemoryStream[Event]
    val q = StreamingIngest.debounce(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("debounce_stream").start()
    try {
      evs2.grouped(30).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("debounce_stream").as[DebounceOut].collect().toSet
    assert(got == expected)
  }

  test("streaming geofence transitions: enter/exit/switch, O(1) state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{GeoPing, FenceTransition}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fences = Seq(
      ("a", 0L, 10L, 0L, 10L),
      ("b", 20L, 30L, 20L, 30L),
      // overlaps a: first containing fence must win
      ("shadow", 0L, 10L, 5L, 15L))
    def ping(id: Long, dev: Long, t: Long, lat: Long, lon: Long) =
      GeoPing(id, dev, new java.sql.Timestamp(t), lat, lon)
    val pings = Seq(
      ping(1, 1, 1000, 50, 50),  // outside: first sighting, no row
      ping(2, 1, 2000, 5, 5),    // enter a
      ping(3, 1, 3000, 6, 6),    // still a: no row
      ping(4, 1, 4000, 5, 12),   // only shadow contains -> switch
      ping(5, 1, 5000, 25, 25),  // switch to b
      ping(6, 1, 6000, 50, 50),  // exit
      ping(7, 2, 1000, 5, 5),    // device 2: first sighting INSIDE -> enter
      ping(8, 2, 2000, 5, 7))    // a and shadow both contain -> a wins, no row
    val expected = Set(
      FenceTransition(1L, 2L, null, "a", "enter"),
      FenceTransition(1L, 4L, "a", "shadow", "switch"),
      FenceTransition(1L, 5L, "shadow", "b", "switch"),
      FenceTransition(1L, 6L, "b", null, "exit"),
      FenceTransition(2L, 7L, null, "a", "enter"))
    val mem = MemoryStream[GeoPing]
    val q = StreamingIngest.geofenceTransitions(mem.toDS(), fences)
      .writeStream.outputMode("append").format("memory")
      .queryName("geofence_stream").start()
    try {
      // split mid-journey so the fence state crosses a micro-batch
      pings.grouped(4).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("geofence_stream").as[FenceTransition]
      .collect().toSet
    assert(got == expected)
  }

  test("streaming trajectory: exact path accumulation across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{GeoPing, TrajUpdate}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ping(id: Long, dev: Long, t: Long, lat: Long, lon: Long) =
      GeoPing(id, dev, new java.sql.Timestamp(t), lat, lon)
    // 3-4-5 triangles -> exact integer steps; device 2 is a single ping
    val pings = Seq(
      ping(1, 1, 1000, 0, 0),
      ping(2, 1, 2000, 3000, 4000),      // step 5000
      ping(3, 1, 3000, 3000, 4002),      // step 2
      ping(4, 1, 4000, 3300, 3602),      // step 500 (300/-400)
      ping(5, 2, 1000, 7, 7))
    val mem = MemoryStream[GeoPing]
    val q = StreamingIngest.trajectoryStream(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("traj_stream").start()
    try {
      // device 1's journey spans two micro-batches: state must carry
      pings.grouped(3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("traj_stream").as[TrajUpdate].collect()
      .map(u => u.ping_id -> u).toMap
    assert(got(1L) == TrajUpdate(1L, 1L, 1L, 0L, 0L))
    assert(got(2L) == TrajUpdate(1L, 2L, 2L, 5000L, 5000L))
    assert(got(3L) == TrajUpdate(1L, 3L, 3L, 2L, 5002L))
    assert(got(4L) == TrajUpdate(1L, 4L, 4L, 500L, 5502L))
    assert(got(5L) == TrajUpdate(2L, 5L, 1L, 0L, 0L))
  }

  test("streaming KMV sketch drains to the batch kmv_distinct estimate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    // two keys, enough distinct values to exceed k on one and not the other
    val rows = (1 to 120).map(i => ("big", h60(s"w${i % 40}"))) ++
      (1 to 30).map(i => ("small", h60(s"v${i % 5}")))
    val mem = MemoryStream[(String, Long)]
    val q = StreamingIngest.kmvSketchStream(mem.toDS(), k = 16)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_stream").start()
    try {
      rows.grouped(50).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // last update per key = the drained estimate
    val got = spark.table("kmv_stream").as[(String, Double)].collect()
      .zipWithIndex.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2)._1._2).toMap
    val batch = rows.toDF("k", "h")
      .groupBy("k")
      .agg(graft.plans.GraftExpressions.kmv_distinct(col("h"), 16)
        .as("est"))
      .as[(String, Double)].collect().toMap
    assert(got == batch)
    assert(batch("small") == 5.0) // under-k keys report exact counts
  }

  test("streaming Misra-Gries drains to the reference fold; bound holds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.MgOut
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // skewed stream: 'hot' dominates, mid-frequency items, a noise tail
    // wide enough to trigger the decrement-all path repeatedly
    val items = (1 to 60).map(_ => "hot") ++
      (1 to 25).flatMap(i => Seq(s"mid${i % 3}")) ++
      (1 to 55).map(i => s"noise$i")
    val rows = items.map(("t", _))
    // independent single-pass MG fold (no Spark, no shared code)
    def refMg(xs: Seq[String], k: Int): Map[String, Long] = {
      val buf = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      xs.foreach { x =>
        if (buf.contains(x)) buf(x) += 1
        else if (buf.size < k) buf(x) = 1
        else buf.keys.toList.foreach { kk =>
          buf(kk) -= 1; if (buf(kk) == 0) buf.remove(kk)
        }
      }
      buf.toMap
    }
    val mem = MemoryStream[(String, String)]
    val q = StreamingIngest.heavyHitterStream(mem.toDS(), k = 4)
      .writeStream.outputMode("update").format("memory")
      .queryName("mg_stream").start()
    try {
      rows.grouped(35).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val all = spark.table("mg_stream").as[MgOut].collect()
    val lastN = all.map(_.n).max
    val got = all.filter(_.n == lastN).map(o => o.item -> o.lb).toMap
    val ref = refMg(items, k = 4)
    assert(got == ref)
    assert(lastN == items.size.toLong)
    // MG guarantees: the dominant item is present, with lb within
    // n/(k+1) of its true count
    assert(got.contains("hot"))
    assert(got("hot") >= 60L - items.size / 5)
    assert(got("hot") <= 60L)
  }

  test("streaming quantile bound drains to the batch bucket operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.QBoundOut
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two keys with different magnitudes; a negative value must be ignored
    val rows = (1 to 90).map(i => ("a", (i * i * 7L) % 5000)) ++
      (1 to 40).map(i => ("b", i * 100000L)) ++
      Seq(("b", -5L), ("c", -1L), ("c", -9L)) // 'c' is all-negative
    val mem = MemoryStream[(String, Long)]
    val qy = StreamingIngest.quantileBoundStream(mem.toDS(), q = 0.5)
      .writeStream.outputMode("update").format("memory")
      .queryName("qbound_stream").start()
    try {
      rows.grouped(40).foreach { b =>
        mem.addData(b: _*); qy.processAllAvailable()
      }
    } finally qy.stop()
    val got = spark.table("qbound_stream").as[QBoundOut].collect()
      .zipWithIndex.groupBy(_._1.key).view
      .mapValues(_.maxBy(x => (x._1.n, x._2))._1).toMap
    val batch = graft.ops.Stats.quantileBounds(
        rows.toDF("k", "v"), Seq("k"), col("v"), Seq(0.5))
      .select("k", "n_rows", "bucket", "lo", "hi")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (k <- Seq("a", "b")) {
      val (_, n, bkt, lo, hi) = batch(k)
      assert(got(k).n == n && got(k).bucket.toLong == bkt &&
        got(k).lo == lo && got(k).hi == hi, s"key $k: ${got(k)} vs ${batch(k)}")
    }
    // a key with no non-negative value yet emits NOTHING (batch parity:
    // quantileBounds has no such group either)
    assert(!got.contains("c") && !batch.contains("c"))
  }

  test("streaming asof: monotone state frontier across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{AsofTick, AsofOut}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(t: Long) = new java.sql.Timestamp(t)
    val mem = MemoryStream[AsofTick]
    val q = StreamingIngest.asofEnrich(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_stream").start()
    try {
      // batch 1: left before any state -> None; left after right -> 1.0
      mem.addData(AsofTick(1, ts(10), 0, 0, 1.0),
        AsofTick(1, ts(5), 1, 100, 0), AsofTick(1, ts(15), 1, 101, 0))
      q.processAllAvailable()
      // batch 2: state advances to 2.0
      mem.addData(AsofTick(1, ts(20), 0, 0, 2.0),
        AsofTick(1, ts(25), 1, 102, 0))
      q.processAllAvailable()
      // batch 3: STALE right (ts 12 < frontier 20) is ignored
      mem.addData(AsofTick(1, ts(12), 0, 0, 9.9),
        AsofTick(1, ts(30), 1, 103, 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_stream").as[AsofOut].collect()
      .map(o => o.id -> o.payload).toMap
    assert(got === Map(100L -> None, 101L -> Some(1.0),
      102L -> Some(2.0), 103L -> Some(2.0)))
  }

  test("streaming asof in one ordered batch equals the batch AsofJoin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.AsofTick
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = graft.sources.EventLog.events(spark, sf).limit(2000)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p"))
    val want = graft.ops.AsofJoin
      .backward(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("p"))
      .select("event_id", "p").as[(Long, Option[Double])]
      .collect().toMap
    val ticks = StreamingIngest.asofLeft(clicks, "user_id", "ts", "event_id")
      .unionByName(StreamingIngest.asofRight(purchases, "user_id", "ts", "p"))
      .as[AsofTick].collect()
    val mem = MemoryStream[AsofTick]
    val q = StreamingIngest.asofEnrich(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_batch_eq").start()
    try { mem.addData(ticks.toSeq); q.processAllAvailable() } finally q.stop()
    val got = spark.table("asof_batch_eq")
      .select("id", "payload").as[(Long, Option[Double])].collect().toMap
    assert(got === want)
  }

  test("c4 sentence cleaning is a stateless streaming gate (batch parity)") {
    // pure projection + predicate, so it must run unchanged on a stream in
    // append mode with no watermark/state — the shape a live ingest filter
    // needs
    val dir = Files.createTempDirectory("graft_c4").toString
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(300)
    batch.write.mode("overwrite").parquet(dir)
    val tilesOf = (text: org.apache.spark.sql.Column) => {
      val tk = graft.ops.TextOps.tokens(text)
      when(text.isNull || coalesce(size(tk), lit(0)) === 0, array(lit("")))
        .otherwise(transform(
          sequence(lit(0), ceil(size(tk).cast("double") / 8.0).cast("int") - 1),
          i => array_join(slice(tk, i * 8 + 1, lit(8)), " ")))
    }
    def clean(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextOps.c4SentenceClean(df, "doc_id", "text",
        minWords = 8, minSentences = 2,
        blacklist = Seq("slow"), sentencesOf = tilesOf)
    val streamed = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(dir)
    val got = StreamingIngest.runToMemory(clean(streamed), "c4_stream",
      OutputMode.Append())
    val want = clean(spark.read.parquet(dir))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("sessionization state machine emits on timeout") {
    val dir = Files.createTempDirectory("graft_sess").toString
    graft.sources.EventLog.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(200)
      .write.mode("overwrite").parquet(dir)
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE")
      .parquet(dir).as[StreamingIngest.Event]
    val sessions = StreamingIngest.sessionize(events, gapMs = 100L)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try {
      // NB: processAllAvailable() never settles for a timeout-driven stateful
      // query (the timeouts keep scheduling batches) — drive it by wall clock
      // instead: first batch consumes the input, later batches fire timeouts.
      // generous: suites run in parallel against one shared session, and a
      // loaded scheduler can starve the timeout-firing micro-batches well
      // past the nominal gap (observed flake at 20 s under full-suite load)
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("sessions").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
    } finally q.stop()
    // every user whose gap elapsed emitted exactly one closed session
    assert(spark.table("sessions").count() > 0)
  }

  test("streaming CUSUM alarms match the reference fold across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.{Event, CusumAlarm}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two keys; key "m" drifts up after event 60, key "k" stays level with
    // one negative excursion — the fixture must fire BOTH alarm sides
    def value(key: String, i: Long): Double =
      if (key == "m") { if (i <= 60) 100.0 + (i % 7) else 160.0 + (i % 7) }
      else { if (i >= 55 && i <= 70) 40.0 + (i % 5) else 100.0 + (i % 5) }
    val evs = for (i <- 1L to 120L; k <- Seq("m", "k")) yield
      Event(i * 2 + (if (k == "m") 0 else 1),
        new java.sql.Timestamp(i * 1000L), i % 5, k, value(k, i))
    val (warm, slack, h) = (20L, 5000000L, 100000000L)
    // reference fold — plain Scala replay of the documented recurrence
    val expected = scala.collection.mutable.Set[CusumAlarm]()
    for (key <- Seq("m", "k")) {
      var (n, sum, mean, sp, sn) = (0L, 0L, 0L, 0L, 0L)
      evs.filter(_.event_type == key)
        .sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val x = math.floor(e.value * 1e6).toLong
          if (n < warm) { n += 1; sum += x; if (n == warm) mean = sum / warm }
          else {
            sp = math.max(0L, sp + (x - mean - slack))
            sn = math.max(0L, sn + (mean - x - slack))
            if (sp > h) {
              expected += CusumAlarm(key, e.event_id, "up", sp, mean); sp = 0L
            }
            if (sn > h) {
              expected += CusumAlarm(key, e.event_id, "down", sn, mean)
              sn = 0L
            }
          }
        }
    }
    assert(expected.exists(_.side == "up") &&
      expected.exists(_.side == "down"), "fixture must fire both sides")
    val mem = MemoryStream[Event]
    val q = StreamingIngest.cusumAlarms(mem.toDS(), warm, slack, h)
      .writeStream.outputMode("append").format("memory")
      .queryName("cusum_stream").start()
    try {
      evs.grouped(37).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("cusum_stream").as[CusumAlarm].collect().toSet
    assert(got == expected.toSet)
  }
}
