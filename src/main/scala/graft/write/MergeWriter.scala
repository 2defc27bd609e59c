package graft.write

import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import graft.meta.LoadMode

/**
 * Native merge writer over Parquet — re-expresses the reference's Delta Lake
 * `MERGE ... whenMatchedUpdateAll().whenNotMatchedInsertAll()` sink family
 * (reference: aje-stage-dms-load.py:470-518, condition generator :359-364;
 * Salesforce variant transform_light.py:388-417). Delta jars are not in this
 * build, and "update all / insert all" semantics reduce exactly to:
 *
 *   result = target ANTI JOIN batch (on keys)  UNION  batch
 *
 * which is cheaper than the full-outer-join formulation: the anti join is
 * broadcastable when the batch (a daily increment) is small relative to the
 * stage table — the common case at 100 TB — and the batch side needs no
 * shuffle at all. Schema evolution (Delta autoMerge,
 * aje-stage-dms-load.py:44) is the union of both schemas with nulls filled.
 *
 * Scale notes: with `partitionCols` set and the layout provably key-stable
 * (see `write`'s gating contract), merge modes route through
 * `prunedMergeWrite` — the native analog of Delta's file pruning
 * (aje-stage-dms-load.py:482-495): only the partitions the batch touches
 * (plus, for the transactional-window mode, the deleted window) are read,
 * merged and swapped; every other partition directory is never opened, so
 * per-merge cost is O(|touched partitions|), not O(|table|). Unpartitioned
 * targets still rewrite fully (there is nothing to prune by).
 */
object MergeWriter {

  /** Signals the reference's NoDataToMigrateException
    * (aje-stage-dms-load.py:79-86,512-518). */
  final class NoDataToMigrateException
      extends Exception("no data detected to migrate")

  final case class MergeStats(mode: String, rowsWritten: Long)

  def tableExists(path: String): Boolean = {
    val dir = Paths.get(path)
    Files.isDirectory(dir) && {
      val s = Files.list(dir)
      try s.anyMatch(p => p.toString.endsWith(".parquet") ||
        p.getFileName.toString == "_SUCCESS")
      finally s.close()
    }
  }

  def readTarget(spark: SparkSession, path: String): Option[DataFrame] =
    if (tableExists(path)) Some(spark.read.parquet(path)) else None

  /** Align `df` to the union schema: missing columns become typed nulls
    * (Delta schema autoMerge equivalent). */
  private def alignTo(df: DataFrame, unionSchema: Seq[(String, String)]): DataFrame = {
    val present = df.columns.toSet
    df.select(unionSchema.map { case (name, ddl) =>
      if (present.contains(name)) col(name) else lit(null).cast(ddl).as(name)
    }: _*)
  }

  private def unionSchemaOf(a: DataFrame, b: DataFrame): Seq[(String, String)] = {
    val fromA = a.schema.fields.map(f => f.name -> f.dataType.sql)
    val extraB = b.schema.fields.filterNot(f => a.columns.contains(f.name))
      .map(f => f.name -> f.dataType.sql)
    (fromA ++ extraB).toSeq
  }

  /** K4 — upsert: batch rows replace key-matched target rows, new keys
    * append. Batch is key-deduplicated first to satisfy the single-match rule
    * (aje-stage-dms-load.py:483-485); with `recency` given the latest batch
    * row wins deterministically (the reference's bare dropDuplicates keeps an
    * arbitrary one). */
  def upsert(target: DataFrame, batch: DataFrame, ids: Seq[String],
      recency: Seq[String] = Nil): DataFrame = {
    require(ids.nonEmpty, "merge requires at least one id column")
    val cleanBatch =
      if (recency.nonEmpty)
        graft.pipeline.StageTransform.dedupLatest(batch, ids, recency, ids)
      else batch.dropDuplicates(ids)
    val schema = unionSchemaOf(target, cleanBatch)
    val t = alignTo(target, schema)
    val b = alignTo(cleanBatch, schema)
    // Keys present in the batch vanish from the target (anti join), then the
    // batch is appended — whenMatchedUpdateAll + whenNotMatchedInsertAll.
    // The using-column join moves join columns to the FRONT of its output;
    // re-select schema order or the positional union misaligns columns
    // whenever an id is not already leftmost.
    t.join(b.select(ids.map(col): _*).dropDuplicates(ids), ids, "left_anti")
      .select(schema.map { case (n, _) => col(n) }: _*)
      .union(b)
  }

  /**
   * PARTIAL-update upsert — the merge variant where a batch NULL means
   * "keep the target's value" instead of "overwrite with NULL" (Delta's
   * `whenMatchedUpdate(set = coalesce(src.c, tgt.c))` pattern; what CDC
   * feeds with sparse column images and enrichment pipelines that patch
   * one column need — [[upsert]]'s update-ALL would erase every column
   * the batch didn't carry).
   *
   * Shape: ONE full-outer join on the ids (the scd2Merge discipline —
   * never an anti-join + re-join per column); per data column the output
   * is target-only → old value, batch-only → batch value, matched →
   * coalesce(batch, old). Batch keys are deterministically deduplicated
   * first (recency order, else max over data columns — same rule as
   * [[upsert]]), so a replayed batch merges to the identical table:
   * matched coalesce is idempotent because the second pass coalesces the
   * already-patched values with an equal batch image.
   *
   * Null-KEYED rows never match a full-outer using-join: both sides'
   * null-key rows pass through as inserts/keeps — same keep-don't-delete
   * stance as [[upsert]], documented rather than silent. Schema evolves
   * like [[upsert]] (new batch columns join the output, nulls backfill).
   */
  def upsertPartial(target: DataFrame, batch: DataFrame, ids: Seq[String],
      recency: Seq[String] = Nil): DataFrame = {
    require(ids.nonEmpty, "merge requires at least one id column")
    val cleanBatch =
      if (recency.nonEmpty)
        graft.pipeline.StageTransform.dedupLatest(batch, ids, recency, ids)
      else batch.dropDuplicates(ids)
    val schema = unionSchemaOf(target, cleanBatch)
    val t = alignTo(target, schema)
    val b = alignTo(cleanBatch, schema)
    val dataCols = schema.map(_._1).filterNot(ids.contains)
    val bren = b.select(
      ids.map(col) ++ dataCols.map(c => col(c).as(s"__b_$c")) :+
        lit(1).as("__b"): _*)
    t.withColumn("__t", lit(1))
      .join(bren, ids, "full_outer")
      .select(schema.map { case (n, _) =>
        if (ids.contains(n)) col(n)
        else when(col("__t").isNull, col(s"__b_$n"))
          .when(col("__b").isNull, col(n))
          .otherwise(coalesce(col(s"__b_$n"), col(n))).as(n)
      }: _*)
  }

  /** SCD-2 history merge (beyond the reference's SCD-0/1 upsert): versioned
    * rows carry (valid_from, valid_to, is_current). For each batch key, a
    * differing current row is CLOSED (valid_to = `versionTs`, not current)
    * and the batch row inserted as the new current version; identical rows
    * are untouched; unseen keys insert as new current rows. History rows
    * pass through untouched. ONE full-outer join on the ids produces every
    * outcome: each joined row explodes to its closed and/or opened and/or
    * kept versions (0-2 output rows via an array + explode, all computed in
    * the same projection) — a single join shuffle per batch, and the
    * (key-deduplicated) batch is scanned once, where a left-join +
    * anti-join formulation re-computes the batch dedup per reference.
    * History is carried by union.
    * `versionTs` is an explicit caller-provided version label (a date
    * string), not wall clock — runs replay deterministically.
    *
    * Batch key-dedup is DETERMINISTIC (unlike the reference's bare
    * dropDuplicates): with `recency` given, the latest batch row per key
    * wins; without it, the max over all data columns wins. Either way a
    * checkpoint-replayed batch picks the SAME row as the first run — a
    * replay merges rows the table already carries and is a no-op, which is
    * what [[graft.streaming.StreamingIngest.scd2Sink]]'s at-least-once
    * convergence claim rests on.
    *
    * Schema evolves like [[upsert]]: new batch columns join the output
    * (nulls in pre-existing rows) instead of being dropped, and null-keyed
    * rows on either side are kept/inserted, never silently deleted.
    *
    * Returns the merged frame; write it with [[writeSwap]] (or via a
    * partition-pruned route when the table is partitioned on a stable
    * column, exactly as [[write]] does for SCD-1). */
  def scd2Merge(target: DataFrame, batch: DataFrame, ids: Seq[String],
      versionTs: String, recency: Seq[String] = Nil): DataFrame = {
    require(ids.nonEmpty, "merge requires at least one id column")
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    require(scdCols.forall(target.columns.contains),
      s"SCD-2 target needs ${scdCols.mkString(", ")} columns")
    // Schema evolution, like [[upsert]]: batch columns ABSENT from the
    // target join the output schema (existing history/current rows read
    // them as typed nulls), and batch rows missing target data columns get
    // typed nulls — a CDC source adding a column must never lose data
    // silently. A genuinely new column differs (null <=> value is false)
    // on every key that carries it, so affected rows version as expected.
    val targetData = target.columns.filterNot(scdCols.contains).toSeq
    val bData = {
      val d = dedupDeterministic(batch, ids, recency)
      d.drop(scdCols.filter(d.columns.contains): _*)
    }
    val dataSchema = unionSchemaOf(target.select(targetData.map(col): _*), bData)
    val dataCols = dataSchema.map(_._1)
    val compareCols = dataCols.filterNot(ids.contains)
    val b = alignTo(bData, dataSchema)
    val extras = dataCols.filterNot(target.columns.contains)
    val fullSchema = target.schema.fields.toSeq
      .map(f => f.name -> f.dataType.sql) ++
      dataSchema.filter { case (n, _) => extras.contains(n) }
    val evolved = alignTo(target, fullSchema)
    val cur = evolved.filter(col("is_current"))
    val hist = evolved.filter(!col("is_current"))

    // Side presence via constant markers, NOT key nullability: a null-keyed
    // current or batch row never equi-joins, but it still owns its output
    // (kept / inserted) — testing `ids.head IS NOT NULL` would silently
    // delete null-keyed current rows and drop null-keyed batch rows.
    val hasC = col("c.__graft_present").isNotNull
    val hasB = col("b.__graft_present").isNotNull
    // change detection must not ORDER on unorderable types: a map-typed
    // column compares through its sorted entry array (canonical — map
    // iteration order is unspecified, entry SETS are what equality means)
    val typeOf = evolved.schema.fields.map(f => f.name -> f.dataType).toMap
    def comparable(side: String, c: String): Column = typeOf(c) match {
      case _: org.apache.spark.sql.types.MapType =>
        sort_array(map_entries(col(s"$side.$c")))
      case _ => col(s"$side.$c")
    }
    val differs = compareCols.map(c =>
        not(comparable("c", c) <=> comparable("b", c))).reduceOption(_ || _)
      .getOrElse(lit(false))
    val order = evolved.columns.toSeq
    // the three possible versions of a joined key, as same-shaped structs
    def mk(data: String => Column, vf: Column, vt: Column, ic: Column) = {
      val byName = (dataCols.map(c => c -> data(c)) ++ Seq(
        "valid_from" -> vf, "valid_to" -> vt, "is_current" -> ic)).toMap
      struct(order.map(c => byName(c).as(c)): _*)
    }
    val changed = hasC && hasB && differs
    val closedS = when(changed,
      mk(c => col(s"c.$c"), col("c.valid_from"), lit(versionTs), lit(false)))
    val keptS = when(hasC && !changed,
      mk(c => col(s"c.$c"), col("c.valid_from"), col("c.valid_to"),
        col("c.is_current")))
    val newS = when(hasB && (!hasC || differs),
      mk(c => col(s"b.$c"), lit(versionTs), lit(null).cast("string"),
        lit(true)))
    val merged = cur.withColumn("__graft_present", lit(1)).as("c")
      .join(b.withColumn("__graft_present", lit(1)).as("b"),
        ids.map(k => col(s"c.$k") === col(s"b.$k")).reduce(_ && _),
        "full_outer")
      .select(explode(filter(array(closedS, keptS, newS),
        r => r.isNotNull)).as("r"))
      .select(order.map(c => col(s"r.$c").as(c)): _*)
    hist.select(order.map(col): _*).union(merged)
  }

  /** Deterministic key-dedup shared by [[scd2Merge]] and the scd2Sink
    * bootstrap: latest-by-`recency` per key, falling back to the max over
    * all non-id columns — never an arbitrary survivor, so replayed batches
    * pick the same row. */
  private[graft] def dedupDeterministic(batch: DataFrame, ids: Seq[String],
      recency: Seq[String]): DataFrame = {
    // maps are not orderable in Spark: a map-typed payload column must not
    // break the dedup (it just can't contribute to the tie-break)
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val order =
      if (recency.nonEmpty) recency
      else batch.schema.fields
        .filterNot(f => ids.contains(f.name))
        .filterNot(f => hasMap(f.dataType))
        .map(_.name).toSeq
    // exactly ONE dedup shuffle either way: the window already leaves one
    // row per key when there is an ordering; only a pure-key batch (where
    // duplicates are identical rows) falls back to dropDuplicates
    if (order.nonEmpty)
      graft.pipeline.StageTransform.dedupLatest(batch, ids, order, ids)
    else batch.dropDuplicates(ids)
  }

  /** Bootstrap an SCD-2 table from a plain batch: every row current as of
    * `versionTs`. */
  def scd2Bootstrap(batch: DataFrame, versionTs: String): DataFrame =
    batch.withColumn("valid_from", lit(versionTs))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

  /** K5 — transactional window: delete `processperiod >= cutoff` from the
    * target, then merge (aje-stage-dms-load.py:488-495). `cutoffPeriod` is
    * yyyyMM as Int. Delete keeps null periods, matching Delta's
    * `delete(col >= x)` null semantics. */
  def transactionalWindowMerge(target: DataFrame, batch: DataFrame,
      ids: Seq[String], cutoffPeriod: Int,
      periodCol: String = "processperiod"): DataFrame = {
    val kept = target.filter(
      col(periodCol).cast("int") < cutoffPeriod || col(periodCol).isNull)
    upsert(kept, batch, ids)
  }

  /** Atomic-ish local swap write: write to `<path>.__tmp`, then replace
    * `path`. (On a real cluster this is a cloud-storage rename / Delta
    * transaction; the shape — never read and overwrite the same files in one
    * job — is the part that matters.)
    *
    * Concurrent-reader design note (what a cloud deployment changes, and
    * nothing else): the delete-then-move window below means a reader that
    * lists `path` mid-swap sees a missing or half-populated directory, and
    * a long-running reader can have files deleted under its footer cache.
    * The production fix is a COMMIT PROTOCOL, not a smarter rename — any of:
    *  - a table format (Delta/Iceberg/Hudi): writers commit a new snapshot
    *    (manifest of immutable files) and readers pin the snapshot they
    *    started with — swap becomes a metadata pointer flip, old files are
    *    vacuumed after a retention window;
    *  - a manifest file: write data files under unique names, then
    *    atomically replace ONE small `_manifest.json` listing the live
    *    files; readers list via the manifest, never the directory;
    *  - versioned directories: write `path/v=N+1/`, flip a `_latest`
    *    pointer, garbage-collect old versions asynchronously.
    * All three keep this writer's invariant (never read and rewrite the
    * same files in one job) and its pruned-merge contract unchanged —
    * [[prunedMergeWrite]]'s per-partition swap maps 1:1 onto a per-partition
    * snapshot commit. The local-FS rename here is the harness-appropriate
    * stand-in for that pointer flip; [[SnapshotStore]] implements the
    * versioned-directory variant in full (atomic pointer flip, reader
    * isolation, optimistic writer claims, vacuum) for tables that need
    * concurrent readers. */
  def writeSwap(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Long = {
    val tmp = path + ".__tmp"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)
    val rows = parquetRowCount(tmp)
    deleteRecursive(Paths.get(path))
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    rows
  }

  /** Row count from parquet FOOTERS only — no data pass over the freshly
    * written files (each footer carries the exact record count). Driver-side
    * listing is fine here: this writer is explicitly the local-FS analog; a
    * cloud deployment would sum the commit protocol's task metrics instead. */
  private def parquetRowCount(dir: String): Long = {
    val conf = new Configuration()
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map { p =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf))
        try r.getRecordCount finally r.close()
      }.sum
    finally s.close()
  }

  /** Partition-pruned merge-and-swap (Delta file-pruning analog,
    * aje-stage-dms-load.py:482-495). Touched set = the batch's distinct
    * partition values plus any partitions matching `alsoTouched` (the
    * transactional-window delete range). Only those partitions are read —
    * the scan's PartitionFilters skip every other directory — merged via
    * `merge`, written partitioned to a tmp dir, and swapped in per
    * partition directory. Touched partitions that end up EMPTY after the
    * merge (a fully deleted window period) are removed.
    *
    * Contract (the standard pruned-merge one): a row's partition values must
    * be stable under update — a key may not move between partitions, or its
    * stale copy in the old partition would survive unpruned. The reference's
    * stage tables satisfy this (partition = processperiod derived from the
    * row's own transaction date). Schema evolution applies to rewritten
    * partitions only; readers needing evolved columns across old partitions
    * should read with `mergeSchema`. */
  def prunedMergeWrite(spark: SparkSession, batch: DataFrame, path: String,
      partitionCols: Seq[String], alsoTouched: Option[Column],
      merge: (DataFrame, DataFrame) => DataFrame): Long = {
    val pc = partitionCols.map(col)
    val target = spark.read.parquet(path)
    val batchVals = batch.select(pc: _*).distinct().collect()
    // Existing partition VALUES come from the DIRECTORY STRUCTURE (one
    // listing, O(partitions)), not from a `select(partCols).distinct()`
    // data scan — that enumerates one row per TABLE row, which at 100 TB
    // is a full-table pass just to learn ~10^3 partition values. The
    // parsed strings are cast to the target's partition types and every
    // predicate below evaluates over that tiny local frame; keeping the
    // on-disk relative path alongside the typed values is also how touched
    // directories are later located for deletion — matching parsed leaf
    // dirs, never re-rendering values (Timestamp.toString and friends do
    // not round-trip Spark's write-side partition-path formatting).
    val dirCol = "__graft_dir"
    val diskDirs = leafPartitionDirs(Paths.get(path), partitionCols.length)
    val diskDf: Option[DataFrame] =
      if (diskDirs.isEmpty) None
      else {
        val parsed = diskDirs.map { rel =>
          rel.toString +: rel.toString.split("/").map { seg =>
            val raw = ExternalCatalogUtils
              .unescapePathName(seg.substring(seg.indexOf('=') + 1))
            if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
            else raw
          }.toSeq
        }
        val strSchema = org.apache.spark.sql.types.StructType(
          (dirCol +: partitionCols).map(c => org.apache.spark.sql.types
            .StructField(c, org.apache.spark.sql.types.StringType, true)))
        val typeOf = target.schema.fields.map(f => f.name -> f.dataType).toMap
        Some(spark.createDataFrame(
            java.util.Arrays.asList(parsed.map(Row(_: _*)): _*), strSchema)
          .select(col(dirCol) +:
            partitionCols.map(c => col(c).cast(typeOf(c)).as(c)): _*))
      }
    val extraVals = (alsoTouched, diskDf) match {
      case (Some(p), Some(df)) => df.filter(p).select(pc: _*).collect()
      case _ => Array.empty[Row]
    }
    val touched = (batchVals ++ extraVals).map(_.toSeq).distinct.toSeq
    if (touched.isEmpty) return 0L

    // OR of per-partition equality conjunctions — the shape Spark's
    // partition pruning folds into PartitionFilters (directory-level skip)
    val pred = touched.map(vals =>
      partitionCols.zip(vals).map { case (c, v) =>
        if (v == null) col(c).isNull else col(c) === lit(v)
      }.reduce(_ && _)).reduce(_ || _)

    val merged = merge(target.filter(pred), batch)
    val tmp = path + ".__tmp"
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .parquet(tmp)
    val rows = parquetRowCount(tmp)

    // Swap per partition directory: replace every partition the tmp write
    // produced, and delete touched partitions the merge emptied. Deletions
    // target the actual on-disk directories whose parsed values satisfy the
    // touched predicate — the same evaluation the scan pruned by.
    val tmpRoot = Paths.get(tmp)
    val written = leafPartitionDirs(tmpRoot, partitionCols.length)
    val pathRoot = Paths.get(path)
    diskDf.foreach(_.filter(pred).select(dirCol).collect()
      .foreach(r => deleteRecursive(pathRoot.resolve(r.getString(0)))))
    written.foreach { rel =>
      val dest = pathRoot.resolve(rel)
      deleteRecursive(dest) // same partition under a differently rendered name
      Files.createDirectories(dest.getParent)
      Files.move(tmpRoot.resolve(rel), dest, StandardCopyOption.ATOMIC_MOVE)
    }
    deleteRecursive(tmpRoot)
    rows
  }

  /** Relative paths of the depth-`n` partition directories under `root`. */
  private def leafPartitionDirs(root: JPath, n: Int): Seq[JPath] = {
    val s = Files.walk(root, n)
    try s.iterator().asScala
      .filter(p => root.relativize(p).getNameCount == n && Files.isDirectory(p)
        && p.getFileName.toString.contains("="))
      .map(root.relativize).toSeq
    finally s.close()
  }

  /** K7 — table maintenance. The reference's `vacuum(100)` + symlink manifest
    * (aje-stage-dms-load.py:520-522) are Delta bookkeeping with no parquet
    * analog; the part that matters at scale is SMALL-FILE COMPACTION: a
    * merge-heavy table accretes one file set per batch and scan task counts
    * balloon. Rewrites the table into `target` files. With `partitionCols`
    * the directory layout is PRESERVED (clustered on the partition columns
    * so each directory compacts to ~one file) — omitting them on a
    * partitioned table would silently flatten it and every downstream
    * partition-pruned scan and pruned merge would stop pruning. */
  def compact(spark: SparkSession, path: String, target: Int = 1,
      partitionCols: Seq[String] = Nil): Long = {
    val df = spark.read.parquet(path)
    if (partitionCols.isEmpty) writeSwap(df.repartition(target), path)
    else writeSwap(
      df.repartition(target, partitionCols.map(col): _*),
      path, partitionCols)
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  /** I5 — retry combinator: 3 attempts, backoff attempt*60s in the reference
    * (aje-stage-dms-load.py:467-503); delay injectable for tests. */
  def withRetry[T](maxTries: Int = 3, sleepMs: Int => Long = _ * 60000L)(
      body: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(body)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxTries) throw e
          Thread.sleep(sleepMs(attempt))
      }
    }
    out.get
  }

  /** Full load-mode-routed write (reference flow aje-stage-dms-load.py:470-518
    * + transform_light.py:388-417). Throws NoDataToMigrateException after
    * bootstrapping an empty table, as the reference does (K6).
    *
    * Pruned-route gating: the pruned merge is only taken when a key provably
    * cannot move between partitions — otherwise a moved key's stale copy in
    * its old (unread) partition would survive, where the reference's Delta
    * MERGE matches on ids across the whole table. Provably safe cases,
    * auto-detected: every partition column is part of the merge ids (a moved
    * "key" is then by definition a different key), or the
    * transactional-window mode partitioned exactly on `processperiod` (the
    * reference's contract: the period is derived from the row's own immutable
    * transaction date, aje-stage-dms-load.py:488-495). Any other layout needs
    * the caller to assert the stability contract via `partitionStable = true`;
    * without it the merge falls back to the full `writeSwap`. */
  def write(spark: SparkSession, batch: DataFrame, path: String, mode: LoadMode,
      ids: Seq[String] = Nil, partitionCols: Seq[String] = Nil,
      cutoffPeriod: Int = 0, retrySleepMs: Int => Long = _ * 60000L,
      partitionStable: Boolean = false): MergeStats = {
    // K6 — empty bootstrap signals OUTSIDE the retry loop (the reference
    // raises from the non-retried branch, aje-stage-dms-load.py:512-518;
    // inside a retry it would "succeed" second time around against the
    // just-bootstrapped empty table).
    if (readTarget(spark, path).isEmpty && batch.isEmpty) {
      writeSwap(batch, path, partitionCols)
      throw new NoDataToMigrateException
    }
    withRetry(3, retrySleepMs) {
      val existing = readTarget(spark, path)
      def stableFor(mergeIds: Seq[String]): Boolean =
        partitionStable || partitionCols.forall(mergeIds.contains)
      def pruned(mergeIds: Seq[String]): Boolean =
        partitionCols.nonEmpty && existing.isDefined && stableFor(mergeIds)
      (existing, mode) match {
        case (Some(_), LoadMode.IncrementalMerge) if pruned(ids) =>
          MergeStats("merge-pruned", prunedMergeWrite(spark, batch, path,
            partitionCols, None, upsert(_, _, ids)))
        case (Some(t), LoadMode.IncrementalMerge) =>
          MergeStats("merge", writeSwap(upsert(t, batch, ids), path, partitionCols))
        case (Some(_), LoadMode.TransactionalWindowMerge(_))
            if partitionCols.contains("processperiod")
              && (stableFor(ids) || partitionCols == Seq("processperiod")) =>
          // deleted window = extra touched partitions (periods the batch has
          // no replacement rows for must still be emptied)
          MergeStats("window-merge-pruned", prunedMergeWrite(spark, batch, path,
            partitionCols, Some(col("processperiod").cast("int") >= cutoffPeriod),
            transactionalWindowMerge(_, _, ids, cutoffPeriod)))
        case (Some(t), LoadMode.TransactionalWindowMerge(_)) =>
          MergeStats("window-merge", writeSwap(
            transactionalWindowMerge(t, batch, ids, cutoffPeriod), path, partitionCols))
        case (Some(_), LoadMode.Upsert(key)) if pruned(Seq(key)) =>
          MergeStats("upsert-pruned", prunedMergeWrite(spark, batch, path,
            partitionCols, None, upsert(_, _, Seq(key))))
        case (Some(t), LoadMode.Upsert(key)) =>
          MergeStats("upsert", writeSwap(upsert(t, batch, Seq(key)), path, partitionCols))
        case _ => // FullOverwrite, Snapshot, or first write of any mode
          MergeStats("overwrite", writeSwap(batch, path, partitionCols))
      }
    }
  }
}
