package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.incr.Incremental
import graft.meta.{ColumnSpec, LoadMode}
import graft.pipeline.StageTransform
import graft.sources.{JdbcSource, RawZone}
import graft.write.MergeWriter

/**
 * LIVE JDBC integration (S1/S3 executed, not just unit-tested): embedded
 * Derby stands in for the reference's Oracle/MSSQL/MySQL endpoints
 * (load_with_query.py:152-168 push-down; :281-329 range split) — the
 * generated incremental SQL (P3 window predicate, P5 BIGINT bound
 * rendering, P4/P6 projection + key alias) is executed against a real
 * database through the same `JdbcSource` reader construction production
 * uses, then the extract flows through the FULL raw→stage→merge pipeline
 * (raw CSV.gz zone → DSL column transforms → latest-row dedup → keyed
 * upsert) and the stage table is checked row-for-row against an
 * independent plain-Scala model of the source.
 */
class JdbcDerbySpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val drv = "org.apache.derby.jdbc.EmbeddedDriver"

  // P5 executed: the BIGINT filter type renders timestamp bounds as epoch
  // seconds — the only dialect literal that is also plain ANSI SQL.
  private def epoch(ts: String): Long =
    Incremental.renderBound(ts, "BIGINT").toLong
  private val base = epoch("2026-03-01 00:00:00")

  // Independent model of the seeded source table (no Spark, no SQL).
  private def statusOf(i: Int): String = if (i % 3 == 0) "OPEN" else "CLOSED"
  private def centsOf(i: Int): Long = i * 100L + i % 7
  private def updOf(i: Int): Long = base + i * 60L
  private def dateOf(i: Int): String =
    LocalDate.of(2026, 1, 1).plusDays(i % 30).toString

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** One-time: in-memory Derby with a 200-row ORDERS source. */
  private lazy val db: Unit = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby_home").toString)
    Class.forName(drv)
    withConn { c =>
      val st = c.createStatement()
      st.executeUpdate("CREATE SCHEMA GRAFT")
      st.executeUpdate("""CREATE TABLE GRAFT.SRC_ORDERS(
        ORDER_ID INT NOT NULL PRIMARY KEY,
        STATUS VARCHAR(8) NOT NULL,
        AMOUNT DECIMAL(12,2) NOT NULL,
        UPDATED_AT BIGINT NOT NULL,
        CREATED_DATE DATE NOT NULL)""")
      val ps = c.prepareStatement(
        "INSERT INTO GRAFT.SRC_ORDERS VALUES (?,?,?,?,?)")
      (1 to 200).foreach { i =>
        ps.setInt(1, i)
        ps.setString(2, statusOf(i))
        ps.setBigDecimal(3,
          new java.math.BigDecimal(centsOf(i)).movePointLeft(2))
        ps.setLong(4, updOf(i))
        ps.setDate(5, java.sql.Date.valueOf(dateOf(i)))
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    }
  }

  /** The generated incremental extraction SQL for a [start, end] window:
    * P4/P6 projection with key alias + P3 predicate over P5-rendered
    * bounds — exactly what `load_with_query` pushes to the source. */
  private def extractionSql(startTs: String, endTs: String): String = {
    val baseQ = Incremental.fullQuery("GRAFT", "SRC_ORDERS",
      "status,amount,updated_at,created_date", idColumn = "order_id")
    val pred = Incremental.windowPredicateSql("updated_at",
      Incremental.renderBound(startTs, "BIGINT"),
      Incremental.renderBound(endTs, "BIGINT"))
    s"$baseQ where $pred"
  }

  test("S1 live: generated incremental SQL push-down extracts the window") {
    db
    val df = JdbcSource.readQuery(spark, url, drv,
      extractionSql("2026-03-01 01:00:00", "2026-03-01 02:40:00"))
    // window [base+3600, base+9600] inclusive -> ids 60..160
    val rows = df.select(col("id").cast("int"), col("STATUS"),
        (col("AMOUNT") * 100).cast("long"), col("UPDATED_AT").cast("long"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = (60 to 160)
      .map(i => (i, statusOf(i), centsOf(i), updOf(i))).toSet
    assert(rows == want)
    // the key alias really surfaced as `id`, and the DECIMAL survived typed
    assert(df.columns.map(_.toLowerCase).contains("id"))
    assert(df.schema("AMOUNT").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
  }

  test("S3 live: bounded-partition read splits the window across executors") {
    db
    val sql = extractionSql("2026-03-01 01:00:00", "2026-03-01 02:40:00")
    val df = JdbcSource.readPartitioned(spark, url, drv, s"($sql) AS src",
      "updated_at", (base + 3600L).toString, (base + 9600L).toString,
      numPartitions = 4)
    // Spark's bounds control the STRIDE, not the filter — the window
    // predicate lives in the pushed subquery, so the partitioned result
    // must equal the single-cursor read exactly.
    assert(df.rdd.getNumPartitions == 4)
    val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) >= 3, s"degenerate split: ${perPart.toSeq}")
    val ids = df.select(col("id").cast("int")).collect()
      .map(_.getInt(0)).toSet
    assert(ids == (60 to 160).toSet)
  }

  test("end-to-end live: JDBC extract -> raw csv.gz -> stage DSL -> upsert") {
    db
    val raw = java.nio.file.Files
      .createTempDirectory("derby_raw").toString + "/orders"
    val stage = java.nio.file.Files
      .createTempDirectory("derby_stage").toString + "/orders"
    val specs = Seq(
      ColumnSpec("orders", "id", 1, "int", "id", isId = true),
      ColumnSpec("orders", "status", 2, "string",
        "fn_transform_ClearString(STATUS)"),
      ColumnSpec("orders", "amount_cents", 3, "bigint",
        "floor(cast(AMOUNT as double) * 100)"),
      ColumnSpec("orders", "updated_at", 4, "bigint", "UPDATED_AT",
        isFilterDate = true),
      ColumnSpec("orders", "created_date", 5, "string", "CREATED_DATE"))
    def load(startTs: String, endTs: String): Unit = {
      // extract -> raw zone (append, the reference's csv.gz landing)
      RawZone.writeRawCsv(
        JdbcSource.readQuery(spark, url, drv, extractionSql(startTs, endTs)),
        raw)
      // raw -> stage: stringly CSV through the DSL transforms + dedup
      val result = StageTransform.run(RawZone.readRawCsv(spark, raw), specs)
      assert(result.quarantined.isEmpty, result.quarantined.toString)
      MergeWriter.write(spark, result.df, stage, LoadMode.IncrementalMerge,
        ids = Seq("id"), retrySleepMs = _ => 0L)
    }
    // batch 1: ids 60..160 at their original values
    load("2026-03-01 01:00:00", "2026-03-01 02:40:00")
    // source rows 100..120 are amended AFTER the first extraction
    withConn { c =>
      val st = c.createStatement()
      st.executeUpdate(s"""UPDATE GRAFT.SRC_ORDERS SET STATUS = 'AMEND',
        AMOUNT = AMOUNT + 5.00, UPDATED_AT = UPDATED_AT + ${20000L}
        WHERE ORDER_ID BETWEEN 100 AND 120""")
      st.close()
    }
    // batch 2: the incremental window catches exactly the amended rows
    // (new watermarks base+20000+[6000..7200] -> ids 100..120); the raw
    // zone now holds BOTH generations of those ids — the stage dedup and
    // the keyed upsert must both resolve to the amended generation.
    load("2026-03-01 07:13:20", "2026-03-01 07:33:20")
    val got = spark.read.parquet(stage)
      .select(col("id").cast("int"), col("status"), col("amount_cents"),
        col("updated_at"), col("created_date"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    val want = (60 to 160).map { i =>
      if (i >= 100 && i <= 120)
        (i, "AMEND", centsOf(i) + 500L, updOf(i) + 20000L, dateOf(i))
      else (i, statusOf(i), centsOf(i), updOf(i), dateOf(i))
    }.toSet
    assert(got == want)
  }
}
