package graft.write

import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Snapshot-committed tables: the commit protocol [[MergeWriter.writeSwap]]'s
 * scaladoc design note describes, implemented (versioned-directory variant).
 *
 * [[MergeWriter.writeSwap]]'s delete-then-move swap has a window where a
 * concurrent reader sees a missing or half-populated directory, and a
 * long-running reader can have files deleted under its footer cache. Here a
 * writer never touches live data:
 *
 *  - each commit writes a FRESH immutable directory `root/_v<N>/` (data
 *    files are never modified or reused across versions);
 *  - the commit point is ONE atomic rename of the tiny `root/_latest`
 *    pointer file (write `_latest.__tmp`, `ATOMIC_MOVE` over `_latest`) —
 *    a reader resolving the pointer either sees version N or version N+1,
 *    never a mixture, with no reader-writer coordination;
 *  - concurrent writers are serialized OPTIMISTICALLY: claiming a version is
 *    `Files.createDirectory(_v<N+1>)`, which is atomic on POSIX — the loser
 *    gets `FileAlreadyExistsException`, retries against the new head (the
 *    same claim-by-atomic-create Delta/Iceberg do on their log files);
 *  - superseded snapshots stay on disk until [[vacuum]] — an in-flight
 *    reader of version N keeps working while N+1..N+k commit; vacuum with a
 *    retention of `keep` versions is the explicit, delayed destructor
 *    (Delta's VACUUM semantics).
 *
 * On cloud object stores, `_latest` maps to a conditional PUT (If-Match) or
 * a pointer object; `_v<N>` claims map to If-None-Match creates. The
 * directory layout and reader protocol are unchanged — which is the point:
 * the harness-local implementation and a production one share every
 * invariant, only the two atomic primitives are swapped.
 */
object SnapshotStore {

  private def versionDir(root: JPath, v: Long) = root.resolve(f"_v$v%06d")
  private def pointer(root: JPath) = root.resolve("_latest")
  private val flipLock = new Object

  /** Latest committed version, None before the first commit. Reads the
    * pointer file only — O(1), no directory listing. */
  def currentVersion(root: String): Option[Long] = {
    val p = pointer(Paths.get(root))
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Commit `df` as the next version of the table at `root`; returns the
    * committed version number. A lost version claim moves to the NEXT
    * version immediately (never waits on the winner, never touches the
    * winner's directory). A writer that claims a version and crashes before
    * the pointer flip leaves an orphaned `_v<N>` directory: readers never
    * see it (the pointer never pointed at it) and later writers skip past
    * it — the same garbage a failed cloud commit leaves for maintenance. */
  def commit(df: DataFrame, root: String,
      partitionCols: Seq[String] = Nil, maxRaceRetries: Int = 1000): Long = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    var tryV = currentVersion(root).getOrElse(-1L) + 1L
    var attempt = 0
    while (attempt <= maxRaceRetries) {
      val dir = versionDir(rootP, tryV)
      val claimed =
        try { Files.createDirectory(dir); true } // atomic claim
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (claimed) {
        // this directory is exclusively ours: write, then flip the pointer.
        // Append, NOT Overwrite: overwrite deletes + recreates the claimed
        // dir, and in that gap another writer's createDirectory would
        // succeed — two owners of one version. Appending into the empty
        // claimed dir keeps the claim held for the whole write.
        val writer = df.write.mode(SaveMode.Append)
        (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
         else writer).parquet(dir.toString)
        // per-version tmp name: concurrent committers must not share one
        // staging file, or the first mover deletes the second's out from
        // under it mid-flip. The flip itself is FORWARD-ONLY under a JVM
        // lock: a slow low-version committer must not move the pointer
        // backwards over a newer commit (readers would time-travel). On an
        // object store both properties collapse into one conditional PUT
        // (If-Match on the pointer's current value).
        val tmp = rootP.resolve(s"_latest.__tmp$tryV")
        Files.writeString(tmp, tryV.toString)
        flipLock.synchronized {
          if (currentVersion(root).forall(_ < tryV))
            Files.move(tmp, pointer(rootP), StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          else Files.delete(tmp) // superseded: our version stays readable
        }
        return tryV
      }
      attempt += 1
      tryV = math.max(currentVersion(root).getOrElse(-1L), tryV) + 1L
    }
    throw new IllegalStateException(
      s"snapshot claim raced $maxRaceRetries times at $root")
  }

  /** The CURRENT snapshot as a DataFrame. The returned plan reads the
    * version that was latest at call time; later commits do not change it
    * (snapshot isolation for the reader's lifetime, provided vacuum
    * retention outlives the read). */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root")))

  /** Time travel: read a specific committed version. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(versionDir(Paths.get(root), version).toString)

  /** Delete superseded snapshot directories, keeping the latest `keep`
    * versions. Returns the number of versions removed. Run this with a
    * retention that outlives the longest reader (the same contract as
    * Delta's VACUUM: the pointer flip retires a version logically; vacuum
    * is the physical delete, deliberately decoupled). */
  def vacuum(root: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the current version")
    val rootP = Paths.get(root)
    val latest = currentVersion(root).getOrElse(return 0)
    val victims = (0L to latest - keep)
      .map(versionDir(rootP, _)).filter(Files.isDirectory(_))
    victims.foreach(deleteRecursive)
    victims.size
  }

  private def deleteRecursive(p: JPath): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
