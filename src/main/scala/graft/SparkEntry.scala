package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.{ColumnSpec, LoadMode, TableConfig}
import graft.pipeline.StageTransform
import graft.write.MergeWriter

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full config-driven ingest pipeline (metadata -> DSL
    * transforms -> dedup -> ordered projection -> merge-written stage table),
    * run end-to-end over sf0.001 lineitem, returning the stage table. */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = TableConfig(
      targetTableName = "PE_LINEITEM", endpoint = "TPCH", sourceSchema = "tpch",
      sourceTable = "lineitem", stageTableName = "lineitem_stage",
      loadType = "incremental", sourceTableType = "m",
      idColumn = "order_id,line_no")
    val specs = Seq(
      ColumnSpec("PE_LINEITEM", "order_id", 1, "bigint", "l_orderkey",
        isId = true, isOrderBy = true),
      ColumnSpec("PE_LINEITEM", "line_no", 2, "int", "l_linenumber",
        isId = true),
      ColumnSpec("PE_LINEITEM", "qty", 3, "decimal(12,2)", "l_quantity"),
      ColumnSpec("PE_LINEITEM", "flag", 4, "string",
        "fn_transform_ByteMagic(l_linestatus,$N)"),
      ColumnSpec("PE_LINEITEM", "ship_month", 5, "string",
        "fn_transform_Date_to_String(l_shipdate,yyyy-MM)"),
      ColumnSpec("PE_LINEITEM", "comment_c", 6, "string",
        "fn_transform_ClearString(l_returnflag,$none)"))
    val raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val staged = StageTransform.run(raw, specs).df
    val out = java.nio.file.Files
      .createTempDirectory("graft_entry").toString + "/lineitem_stage"
    MergeWriter.write(spark, staged, out, LoadMode.of(cfg),
      ids = cfg.idColumns, retrySleepMs = _ => 0L)
    spark.read.parquet(out)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ training-data
    * operator families). See graft.QueryCatalog. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** DuckDB-runnable oracle SQL per query (omitted => rows-only check). */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
