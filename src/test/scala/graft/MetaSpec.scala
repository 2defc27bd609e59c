package graft

import java.nio.file.Files
import graft.meta._

/** File-based metadata loading + the reference's workbook-derivation
  * semantics (upload-data-to-dynamo.py). */
class MetaSpec extends SparkSpec {

  private def writeCsv(lines: String*): String = {
    val f = Files.createTempFile("graft_meta", ".csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("table configs load from CSV; absent columns take defaults") {
    val path = writeCsv(
      "TARGET_TABLE_NAME,ENDPOINT,SOURCE_SCHEMA,SOURCE_TABLE,STAGE_TABLE_NAME," +
        "LOAD_TYPE,SOURCE_TABLE_TYPE,ID_COLUMN,PARTITION_STABLE,PROCESS_ID",
      "PE_ORDERS,PE,sales,orders,orders_stage,incremental,t,o_id,Y,10",
      "PE_CUST,PE,sales,customer,cust_stage,full,m,,,10")
    val got = MetaLoader.tableConfigs(spark, path)
      .map(t => t.targetTableName -> t).toMap
    val orders = got("PE_ORDERS")
    assert(orders.loadType == "incremental" && orders.sourceTableType == "t")
    assert(orders.idColumns == Seq("o_id") && orders.partitionStable)
    assert(LoadMode.of(orders) ==
      LoadMode.TransactionalWindowMerge(orders.delayIncrementalIni))
    val cust = got("PE_CUST")
    assert(cust.activeFlag == "Y") // absent column -> default
    assert(cust.delayIncrementalIni == -2 && !cust.partitionStable)
    assert(LoadMode.of(cust) == LoadMode.FullOverwrite)
  }

  test("column specs and endpoints load with workbook boolean convention") {
    val cols = writeCsv(
      "TARGET_TABLE_NAME,COLUMN_NAME,COLUMN_ID,NEW_DATA_TYPE,TRANSFORMATION," +
        "IS_ID,IS_ORDER_BY,IS_PARTITION",
      "PE_ORDERS,id,1,bigint,o_id,X,,",
      "PE_ORDERS,p,2,int,o_p,,,Y",
      "PE_ORDERS,v,3,string,o_v,false,0,N")
    val specs = MetaLoader.columnSpecs(spark, cols)
    assert(specs.map(_.columnName) == Seq("id", "p", "v"))
    assert(specs(0).isId && !specs(0).isPartition) // any mark = true
    assert(specs(1).isPartition && !specs(1).isId) // blank = false
    assert(!specs(2).isId && !specs(2).isOrderBy && !specs(2).isPartition)
    // explicit negative spellings must read false — PARTITION_STABLE gates
    // the pruned merge, so "no" asserting stability would corrupt tables
    Seq("no", "NO", "f", "off", "0", "false", "N", "").foreach(v =>
      assert(!MetaLoader.flag(v), s"'$v' must be false"))
    Seq("Y", "x", "true", "1 ").foreach(v =>
      assert(MetaLoader.flag(v), s"'$v' must be true"))
    val eps = writeCsv(
      "ENDPOINT_NAME,BD_TYPE,SRC_SERVER_NAME,DB_PORT_NUMBER,SRC_DB_NAME," +
        "SRC_DB_USERNAME,SRC_DB_SECRET",
      "PE,mssql,db.internal,1433,sales,ingest,secret-ref")
    val ep = MetaLoader.endpoints(spark, eps).head
    assert(ep.bdType == "mssql" && ep.dbPortNumber == 1433)
  }

  test("workbook derivations: operator, projection, alias, transformations") {
    assert(MetaLoader.deriveFilterOperator("") == "lte")
    assert(MetaLoader.deriveFilterOperator("{0} and x") == "between")
    assert(MetaLoader.projectionList(
      Seq(("a", "c1"), ("b+1", "c2"))) == "a c1,b+1 c2")
    assert(MetaLoader.cleanSourceTable("dbo.ORDERS (nolock)") == "ORDERS ")
    // DatetimeMagic must be checked before the Datetime substring
    assert(MetaLoader.renderTransformation(
      "fn_transform_DatetimeMagic", "c", "$0", "src") ==
      "fn_transform_DatetimeMagic(c,yyyy-MM-dd HH:mm:ss,0)")
    assert(MetaLoader.renderTransformation(
      "fn_transform_Datetime", "c", "", "src") == "fn_transform_Datetime(c)")
    // the reference's Case quirk: parameter = the input column, repeated
    assert(MetaLoader.renderTransformation(
      "fn_transform_Case", "c", "$d", "src") ==
      "fn_transform_Case_with_default(c,c,d)")
    // unmatched function falls back to the bare source column
    assert(MetaLoader.renderTransformation("", "c", "", "raw_col") == "raw_col")
  }

  test("CSV-loaded configs drive the orchestrator end to end") {
    val cfgCsv = writeCsv(
      "TARGET_TABLE_NAME,ENDPOINT,SOURCE_SCHEMA,SOURCE_TABLE," +
        "STAGE_TABLE_NAME,LOAD_TYPE,PROCESS_ID",
      "T_CUST,EP_PE,s,customer,cust_stage,full,10")
    val colsCsv = writeCsv(
      "TARGET_TABLE_NAME,COLUMN_NAME,COLUMN_ID,NEW_DATA_TYPE,TRANSFORMATION,IS_ID",
      "T_CUST,id,1,bigint,c_custkey,Y",
      "T_CUST,seg,2,string,c_mktsegment,")
    val tables = MetaLoader.tableConfigs(spark, cfgCsv)
    val specs = MetaLoader.columnSpecs(spark, colsCsv)
    val root = Files.createTempDirectory("graft_metaorch").toString
    val orch = new graft.pipeline.IngestOrchestrator(spark, root,
      readRaw = _ => spark.read.parquet(s"$sf/customer.parquet"),
      specsFor = t => specs.filter(_.targetTableName == t.targetTableName),
      parallelism = 1)
    val statuses = orch.runAll(orch.activeTables(tables, "10"))
    assert(statuses.map(_.status) == Seq("SUCCEEDED"))
    assert(spark.read.parquet(s"$root/cust_stage").columns.toSeq ==
      Seq("id", "seg"))
    assert(spark.read.parquet(s"$root/cust_stage").count() == 150)
  }
}
