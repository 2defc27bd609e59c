package graft.meta

import org.apache.spark.sql.{Row, SparkSession}

/**
 * File-based metadata loading — the engine's stand-in for the reference's
 * config ingestion path (workbook -> upload-data-to-dynamo.py -> DynamoDB;
 * record shapes README.md:61-98 and models/config_model.csv,
 * models/credentials_model.csv). Configs are CSVs with the reference's
 * DynamoDB attribute names as headers; absent columns fall back to the
 * case-class defaults, so a minimal file needs only the identifying fields.
 *
 * Metadata is driver-sized (one row per table / column / endpoint): each
 * load is a single collect of a tiny frame; nothing here is distributed.
 */
object MetaLoader {

  private def field(r: Row, name: String, default: String = ""): String =
    if (!r.schema.fieldNames.contains(name)) default
    else Option(r.getAs[String](name)).map(_.trim).getOrElse(default)

  /** Workbook boolean convention (upload-data-to-dynamo.py:75-77): blank is
    * false, any mark is true — with the engine nicety that explicit negative
    * spellings also read false. The negative set matters: PARTITION_STABLE
    * feeds the pruned-merge safety gate, so a spreadsheet "no" must not
    * silently assert stability. */
  private[graft] def flag(s: String): Boolean = {
    val v = s.trim.toLowerCase
    v.nonEmpty && !Set("n", "no", "f", "false", "off", "0").contains(v)
  }

  private def csv(spark: SparkSession, path: String): Seq[Row] =
    spark.read.option("header", "true").csv(path).collect().toSeq

  /** ETL config records (reference config table, README.md:61-98). */
  def tableConfigs(spark: SparkSession, path: String): Seq[TableConfig] =
    csv(spark, path).map { r =>
      TableConfig(
        targetTableName = field(r, "TARGET_TABLE_NAME"),
        endpoint = field(r, "ENDPOINT"),
        sourceSchema = field(r, "SOURCE_SCHEMA"),
        sourceTable = field(r, "SOURCE_TABLE"),
        stageTableName = field(r, "STAGE_TABLE_NAME"),
        activeFlag = field(r, "ACTIVE_FLAG", "Y"),
        loadType = field(r, "LOAD_TYPE", "full"),
        filterOperator = field(r, "FILTER_OPERATOR"),
        filterColumn = field(r, "FILTER_COLUMN"),
        filterExp = field(r, "FILTER_EXP"),
        filterType = field(r, "FILTER_TYPE"),
        filterDataType = field(r, "FILTER_DATA_TYPE"),
        startValue = field(r, "START_VALUE"),
        endValue = field(r, "END_VALUE"),
        idColumn = field(r, "ID_COLUMN"),
        columns = field(r, "COLUMNS"),
        joinExpr = field(r, "JOIN_EXPR"),
        queryByGlue = field(r, "QUERY_BY_GLUE"),
        delayIncrementalIni =
          field(r, "DELAY_INCREMENTAL_INI", "-2").toIntOption.getOrElse(-2),
        sourceTableType = field(r, "SOURCE_TABLE_TYPE", "m"),
        processId = field(r, "PROCESS_ID"),
        crawler = field(r, "CRAWLER"),
        partitionStable = flag(field(r, "PARTITION_STABLE")))
    }

  /** Stage column specs (reference columns table,
    * datalake_ingestion_stack.py:176-188). */
  def columnSpecs(spark: SparkSession, path: String): Seq[ColumnSpec] =
    csv(spark, path).map { r =>
      ColumnSpec(
        targetTableName = field(r, "TARGET_TABLE_NAME"),
        columnName = field(r, "COLUMN_NAME"),
        columnId = field(r, "COLUMN_ID", "0").toIntOption.getOrElse(0),
        newDataType = field(r, "NEW_DATA_TYPE", "string"),
        transformation = field(r, "TRANSFORMATION"),
        isId = flag(field(r, "IS_ID")),
        isOrderBy = flag(field(r, "IS_ORDER_BY")),
        isPartition = flag(field(r, "IS_PARTITION")),
        isFilterDate = flag(field(r, "IS_FILTER_DATE")))
    }

  /** Source endpoints (reference credentials table,
    * models/credentials_model.csv). */
  def endpoints(spark: SparkSession, path: String): Seq[EndpointConfig] =
    csv(spark, path).map { r =>
      EndpointConfig(
        endpointName = field(r, "ENDPOINT_NAME"),
        bdType = field(r, "BD_TYPE"),
        srcServerName = field(r, "SRC_SERVER_NAME"),
        dbPortNumber = field(r, "DB_PORT_NUMBER", "0").toIntOption.getOrElse(0),
        srcDbName = field(r, "SRC_DB_NAME"),
        srcDbUsername = field(r, "SRC_DB_USERNAME"),
        srcDbSecret = field(r, "SRC_DB_SECRET"))
    }

  // ------------------------------------------------------------------
  // Workbook-derivation semantics (upload-data-to-dynamo.py:22-109): the
  // transformations the reference applies when turning spreadsheet rows
  // into config records. Pure functions, so a user porting their workbook
  // gets byte-identical records.

  /** FILTER_OPERATOR inference (:41): no full-filter expression -> lte,
    * otherwise between. */
  def deriveFilterOperator(expFilterFull: String): String =
    if (expFilterFull.trim.isEmpty) "lte" else "between"

  /** COLUMNS projection list (:33): "calc_expr name" pairs, comma-joined. */
  def projectionList(cols: Seq[(String, String)]): String =
    cols.map { case (e, c) => s"$e $c" }.mkString(",")

  /** SOURCE_TABLE cleanup (:46): alias minus dbo. prefix and (nolock) hint. */
  def cleanSourceTable(alias: String): String =
    alias.replace("dbo.", "").replace("(nolock)", "")

  /** TRANSFORMATION rendering (:80-109). Reproduced exactly, including the
    * reference's quirks: the Datetime check must come AFTER DatetimeMagic
    * (substring match), Case maps to Case_with_default with the INPUT column
    * repeated as the parameter (parameter_1 is read from the input column,
    * :82), '$' is stripped from defaults, and an unmatched function falls
    * back to the bare source column. */
  def renderTransformation(function: String, input: String, default: String,
      sourceColumn: String): String = {
    val d = default.replace("$", "")
    if (function.contains("fn_transform_ClearString"))
      s"fn_transform_ClearString($input)"
    else if (function.contains("fn_transform_Concatenate"))
      s"fn_transform_Concatenate($input)"
    else if (function.contains("fn_transform_DateMagic"))
      s"fn_transform_DateMagic($input,yyyy-MM-dd,$d)"
    else if (function.contains("fn_transform_DatetimeMagic"))
      s"fn_transform_DatetimeMagic($input,yyyy-MM-dd HH:mm:ss,$d)"
    else if (function.contains("fn_transform_Datetime"))
      s"fn_transform_Datetime($input)"
    else if (function.contains("fn_transform_ByteMagic"))
      s"fn_transform_ByteMagic($input,$d)"
    else if (function.contains("fn_transform_Case"))
      s"fn_transform_Case_with_default($input,$input,$d)"
    else if (function.contains("fn_transform_PeriodMagic"))
      s"fn_transform_PeriodMagic($input)"
    else sourceColumn
  }
}
