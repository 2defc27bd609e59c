package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-adaptive event-log reader.
 *
 * Upstream producers re-encode timestamp columns over time: the same logical
 * event table may arrive as parquet TIMESTAMP(NANOS) (which Spark can only
 * surface as a raw long under `spark.sql.legacy.parquet.nanosAsLong`),
 * TIMESTAMP(MICROS) with or without a UTC annotation (TimestampType vs
 * TIMESTAMP_NTZ), or even an ISO-8601 string. A reader that hard-assumes one
 * encoding breaks the entire downstream catalog on the next fixture
 * regeneration — so this one inspects the RESOLVED schema and normalizes,
 * instead of assuming.
 *
 * All branches produce the identical TimestampType value for the same
 * instant (sessions here run in UTC, so NTZ wall-clock == UTC instant):
 *  - LongType          → nanos-as-long → `timestamp_micros(ts div 1000)`
 *  - TimestampNTZType  → cast to TimestampType (UTC session: same instant)
 *  - TimestampType     → already normalized
 *  - StringType        → `to_timestamp`
 *
 * This is a pure column expression — no data pass, no driver-side work — so
 * the normalization is free at any scale and composes with pushdown (the
 * rewrite sits above the scan; filters on other columns still reach parquet).
 */
object EventLog {

  /** Normalize a timestamp-ish column to TimestampType based on its resolved
    * type. Throws with a clear message on a type we can't interpret, rather
    * than letting a nonsense expression fail analysis later. */
  def normalizeTs(df: DataFrame, name: String): DataFrame = {
    val c: Column = df.schema(name).dataType match {
      case LongType         => expr(s"timestamp_micros($name div 1000)")
      case TimestampNTZType => col(name).cast(TimestampType)
      case TimestampType    => col(name)
      case StringType       => to_timestamp(col(name))
      case other => throw new IllegalArgumentException(
        s"EventLog: cannot normalize column '$name' of type ${other.sql} to a timestamp")
    }
    df.withColumn(name, c)
  }

  /** Read `$dir/events.parquet` with `ts` normalized to TimestampType,
    * tolerant of every historical encoding of the fixture. Enables
    * nanosAsLong on the session so a TIMESTAMP(NANOS) generation still
    * loads (it surfaces as LongType and takes the first branch). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/events.parquet"), "ts")
  }
}
