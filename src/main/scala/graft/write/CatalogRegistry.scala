package graft.write

import org.apache.spark.sql.SparkSession

/**
 * Catalog registration for stage tables — the Spark-native analog of the
 * reference's Glue crawler job (crawlers_job.py:80-186): a database per
 * (project, engine, endpoint) plus one registered table per stage path, so
 * downstream SQL reads `db.table` instead of parquet paths. The crawler's
 * schema/partition discovery maps to schema inference at registration and
 * `MSCK REPAIR TABLE` for partition recovery; a crawler RE-run after a merge
 * maps to `REFRESH TABLE` (+ repair for new partition directories). The
 * LakeFormation grant calls (:110-168) are AWS-side permissioning with no
 * engine analog.
 */
object CatalogRegistry {

  /** `{project}_{engine}_{endpoint}_stage`, including the mssql->sqlserver
    * rename (crawlers_job.py:60-66). */
  def stageDatabaseName(project: String, bdType: String, endpoint: String): String = {
    val bt = if (bdType.trim == "mssql") "sqlserver" else bdType.trim
    s"${project}_${bt}_${endpoint}_stage"
  }

  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /**
   * Register (or refresh) one stage path as an external table. Idempotent —
   * call after every merge, as the reference re-runs its crawler per load:
   * existing registrations get `REFRESH TABLE` (rewritten files) and, when
   * partitioned, partition recovery (directories a pruned merge added or
   * removed). Schema comes from the parquet footers once, at registration.
   */
  def registerStage(spark: SparkSession, db: String, table: String,
      path: String, partitionCols: Seq[String] = Nil): Unit = {
    ensureDatabase(spark, db)
    val full = s"`$db`.`$table`"
    val exists = spark.catalog.tableExists(s"$db.$table")
    if (!exists) {
      val ddl = spark.read.parquet(path).schema.toDDL
      val partClause =
        if (partitionCols.isEmpty) ""
        else partitionCols.mkString("PARTITIONED BY (", ", ", ")")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $full ($ddl) USING PARQUET " +
        s"$partClause LOCATION '$path'")
    } else {
      spark.sql(s"REFRESH TABLE $full")
    }
    if (partitionCols.nonEmpty)
      spark.sql(s"MSCK REPAIR TABLE $full")
  }
}
