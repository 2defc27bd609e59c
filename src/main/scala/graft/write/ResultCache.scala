package graft.write

import java.nio.file.{Files, Path => JPath, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.DataFrame

/**
 * Content-addressed result cache for DataFrame plans — the cross-RUN reuse
 * a nightly corpus build needs (re-running an unchanged curation stage over
 * unchanged inputs should cost a directory listing, not a cluster pass;
 * within one session Spark's own `persist` covers reuse, across sessions
 * nothing does).
 *
 * The cache key is a fingerprint of WHAT the plan computes over WHICH
 * bytes:
 *
 *  - the CANONICALIZED analyzed logical plan (Catalyst's own semantic
 *    normal form: expression ids are renumbered, cosmetic aliases dropped —
 *    so two textually different but semantically identical pipelines share
 *    an entry, and any semantic change misses);
 *  - every input file with its size + modification time (the parquet-level
 *    snapshot identity; an appended partition, a rewritten file, or a
 *    different input path all change the key).
 *
 * A hit never consults the data; a miss computes ONCE, publishes via the
 * write-then-atomic-rename protocol shared with [[SnapshotStore]] (a
 * crashed writer leaves only an unreferenced staging directory, never a
 * half-cache another run could hit), and subsequent calls read the
 * parquet. Entries are immutable from birth; [[vacuum]] is the explicit
 * destructor.
 *
 * Scale shape: fingerprinting is METADATA-ONLY (plan string + file
 * listing, no data pass, no driver collect of rows); a miss adds exactly
 * one parquet write of the result — the materialization a multi-stage
 * pipeline would do anyway at a stage boundary.
 */
object ResultCache {

  /** Semantic fingerprint of a DataFrame: md5 over the canonicalized plan
    * and the sorted (path, size, mtime) input-file listing. Pure metadata —
    * safe to call on every run of a scheduled pipeline. */
  def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.analyzed.canonicalized.toString
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val files = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hconf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val md = MessageDigest.getInstance("MD5")
    md.update(plan.getBytes("UTF-8"))
    files.foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def entryDir(root: JPath, fp: String): JPath = root.resolve(s"fp=$fp")

  /** True if `df`'s current fingerprint has a published cache entry. */
  def isCached(df: DataFrame, cacheRoot: String): Boolean =
    Files.exists(entryDir(Paths.get(cacheRoot), fingerprint(df)))

  /**
   * Serve `df` through the cache: on a fingerprint hit, read the stored
   * parquet (no recompute); on a miss, compute once, publish atomically,
   * then read back. The returned frame is always the parquet-backed copy,
   * so downstream re-scans never re-run the source plan either way.
   */
  def cached(df: DataFrame, cacheRoot: String): DataFrame = {
    val spark = df.sparkSession
    val root = Paths.get(cacheRoot)
    Files.createDirectories(root)
    val dir = entryDir(root, fingerprint(df))
    if (!Files.exists(dir)) {
      val staging = root.resolve(s"_staging_${java.util.UUID.randomUUID()}")
      df.write.parquet(staging.toString)
      try Files.move(staging, dir) // atomic publish; loser's rename fails
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException if Files.exists(dir) =>
          // concurrent writer published the same fingerprint first — its
          // entry is complete by the rename invariant; drop ours
          org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
      }
    }
    spark.read.parquet(dir.toString)
  }

  /** Drop every cache entry (and any orphaned staging directory). */
  def vacuum(cacheRoot: String): Unit = {
    val root = Paths.get(cacheRoot)
    if (Files.exists(root)) {
      Files.list(root).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("fp=") || n.startsWith("_staging_"))
          org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
      }
    }
  }
}
