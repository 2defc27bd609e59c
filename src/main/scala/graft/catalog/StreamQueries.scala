package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.streaming.StreamingIngest
import graft.catalog.Shared._

/**
 * Oracle-checked Structured-Streaming rows — the streaming surface run END
 * TO END (readStream → transform → parquet file sink) under
 * `Trigger.AvailableNow` over the fixture's events directory, then compared
 * against the DuckDB BATCH equivalent. The reference is cron-batch only;
 * its incremental semantics (watermark-bounded extraction,
 * load_with_query.py:178-195 + UpdateLoadStartValue-ORACLE.py:155-173) are
 * the batch analog these rows must agree with.
 *
 * Determinism contract: AvailableNow drains the fixed fixture, then runs
 * the no-data flush batch, so append-mode output is exactly the
 * watermark-finalized prefix — windows/sessions whose end <= final
 * watermark (max event time − delay). The oracle replays that finalization
 * rule explicitly (its `wm` CTE). Boundary note: Spark tracks the watermark
 * in epoch MILLIS while the oracle subtracts from the micros-precision max
 * ts; the two can only disagree on a window whose end equals the watermark
 * to the microsecond, which no whole-hour/gap-offset boundary in this
 * fixture can hit.
 */
private[graft] object StreamQueries {

  // NB: the ts encoding here must track the FIXTURE (the readStream schema
  // cannot be inferred) — eventsStream reads it off a batch scan of the
  // same dir, so a regenerated fixture (nanos-as-long, NTZ, string) still
  // streams; incrementalStream normalizes whatever arrives to TimestampType
  // via EventLog.normalizeTs before the watermark.

  /** The raw-zone drop-directory stream (S4 shape): schema-pinned parquet
    * source + event-time watermark (I1's DELAY_INCREMENTAL_INI analog).
    * The file source requires a DIRECTORY; the small-sf fixtures ship
    * events as a single file, so stage it into a temp drop dir via
    * symlink (zero copy) — exactly the raw-zone arrival shape anyway. */
  private def eventsStream(s: SparkSession, d: String,
      delay: String): DataFrame = {
    val src = new java.io.File(s"$d/events.parquet")
    val path =
      if (src.isDirectory) src.getAbsolutePath
      else {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_stream_drop")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events-00000.parquet"), src.toPath.toAbsolutePath)
        dir.toString
      }
    val schema: StructType = s.read.parquet(path).schema
    StreamingIngest.incrementalStream(s, path, schema, "ts", delay)
  }

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val TsFmtSql = "%Y-%m-%d %H:%M:%S.%f"

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // The P3 incremental window (`col BETWEEN start AND end`, the
    // inclusive predicate Incremental.windowPredicateSql renders)
    // applied ON THE STREAM: rows flow through the watermark and filter
    // untouched (no aggregate → append passes every row), so the landed
    // set must equal the batch window extraction exactly — the
    // "streaming face" of the reference's scheduled incremental load
    // (load_with_query.py:178-195).
    ("q_stream_incremental",
      (s: SparkSession, d: String) => {
        val out = eventsStream(s, d, delay = "1 hour")
          .filter(col("ts").between(
            lit("2024-01-10 00:00:00").cast("timestamp"),
            lit("2024-01-12 00:00:00").cast("timestamp")))
          .select(col("event_id"),
            date_format(col("ts"), TsFmt).as("ts_s"),
            col("user_id"), col("event_type"), col("value"))
        StreamingIngest.runAvailableNowToParquet(out)
      },
      Some(s"""SELECT event_id, strftime(ts, '$TsFmtSql') AS ts_s,
          user_id, event_type, value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
          AND TIMESTAMP '2024-01-12 00:00:00'""")),

    // Tumbling-window counts + cents sums through the streaming aggregate:
    // append mode emits exactly the windows the final watermark closed.
    // value is floored to integer cents BEFORE the aggregate (the money
    // discipline: a raw double sum is partial-order-dependent and could
    // differ between engines in the last ulp).
    ("q_stream_window_counts",
      (s: SparkSession, d: String) => {
        val ev = eventsStream(s, d, delay = "1 hour")
          .withColumn("value", floor(col("value") * 100).cast("long"))
        val agg = StreamingIngest
          .windowedCounts(ev, "ts", "1 hour", "1 hour")
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm")
              .as("window_start"),
            date_format(col("window.end"), "yyyy-MM-dd HH:mm")
              .as("window_end"),
            col("event_type"), col("n"), col("total").as("total_cents"))
        StreamingIngest.runAvailableNowToParquet(agg)
      },
      Some("""WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w
            FROM events),
          g AS (SELECT date_trunc('hour', ts) AS ws, event_type,
              count(*) AS n,
              CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                AS total_cents
            FROM events GROUP BY 1, 2)
        SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
          strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M') AS window_end,
          event_type, n, total_cents
        FROM g, wm WHERE ws + INTERVAL 1 HOUR <= wm.w""")),

    // EVENT-TIME sessionization (native session_window, 30-minute gap):
    // sessions merge while the next event lands strictly inside
    // last_ts + gap, close otherwise; session end = last event + gap;
    // append emits sessions the watermark finalized. The oracle is the
    // classic gaps-and-islands replay (lag → break flags → running
    // session id → per-session aggregate) plus the same watermark cut.
    ("q_stream_sessionize",
      (s: SparkSession, d: String) => {
        val sess = StreamingIngest.sessionWindowStats(
          eventsStream(s, d, delay = "1 hour"), "ts",
          gap = "30 minutes", delay = "1 hour")
          .select(
            date_format(col("session_start"), TsFmt).as("session_start"),
            date_format(col("session_end"), TsFmt).as("session_end"),
            col("user_id"), col("n_events"), col("total_cents"))
        StreamingIngest.runAvailableNowToParquet(sess)
      },
      Some(s"""WITH o AS (SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sgrp AS (SELECT user_id, ts, value,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
        agg AS (SELECT user_id, min(ts) AS session_start,
            max(ts) + INTERVAL 30 MINUTE AS session_end,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
              AS total_cents
          FROM sgrp GROUP BY user_id, sid),
        wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
        SELECT strftime(session_start, '$TsFmtSql') AS session_start,
          strftime(session_end, '$TsFmtSql') AS session_end,
          user_id, n_events, total_cents
        FROM agg, wm WHERE session_end <= wm.w""")))
}
