package graft.pipeline

import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.meta._
import graft.write.MergeWriter

/**
 * In-process orchestration of the raw->stage pipeline across a set of
 * configured tables — the Spark-native collapse of the reference's Step
 * Functions state machine (SURVEY §2.7; wiring
 * datalake_ingestion_stack.py:907-1014): the distributed choreography
 * (DMS lifecycle, per-endpoint Maps, poll loops) is AWS scaffolding around
 * what is, per table, exactly one Spark job. Status recording mirrors the
 * reference's DynamoDB status fields (SUCCEEDED / WARNING with quarantined
 * columns / failure reason; aje-stage-dms-load.py:536-542).
 *
 * Tables are independent; at scale run them concurrently from the driver
 * (Spark schedules jobs FIFO/FAIR across them) — the reference's
 * MAX_TABLES_AT_A_TIME_GLUE=5 fan-out becomes `parallelism` here.
 */
final class IngestOrchestrator(
    spark: SparkSession,
    stageRoot: String,
    readRaw: TableConfig => DataFrame,
    specsFor: TableConfig => Seq[ColumnSpec],
    parallelism: Int = 5,
    registerIn: Option[String] = None,
    // I5 backoff schedule (aje-stage-dms-load.py:467-503: 3 attempts,
    // linear backoff); injectable so tests and fast-retry deployments
    // don't sleep 60 s per attempt
    retrySleepMs: Int => Long = _ * 60000L) {

  /** Active-set predicate (P8, StartWorkFlow.py:62-100). */
  def activeTables(all: Seq[TableConfig], processId: String = "",
      countryPrefix: String = ""): Seq[TableConfig] =
    all.filter(t => t.activeFlag == "Y" &&
      (processId.isEmpty || t.processId == processId) &&
      t.endpoint.startsWith(countryPrefix))

  def runTable(t: TableConfig): RunStatus = {
    Try {
      val raw = readRaw(t)
      val specs = specsFor(t)
      val result = StageTransform.run(raw, specs)
      val partitions = specs.filter(_.isPartition).map(_.columnName)
      val ids = specs.filter(_.isId).map(_.columnName)
      val cutoff = currentCutoff(t)
      val stats = MergeWriter.write(spark, result.df,
        s"$stageRoot/${t.stageTableName}", LoadMode.of(t), ids, partitions,
        cutoff, retrySleepMs = retrySleepMs,
        partitionStable = t.partitionStable)
      // the reference re-runs its catalog crawler after stage loads
      // (crawlers_job.py); here: registration + partition recovery per
      // table, then the statistics feed — the crawler analog computes
      // stats in the same pass, so every registered stage table carries
      // rowCount/size plus NDV/min/max on its merge keys and the PLANNER
      // (CBO broadcast decisions, join reorder) sees them without any
      // caller having to remember a separate ANALYZE step.
      registerIn.foreach { db =>
        graft.write.CatalogRegistry.registerStage(
          spark, db, t.stageTableName, s"$stageRoot/${t.stageTableName}",
          partitions)
        // only ids that survived the transform: a quarantined id column
        // is a WARNING, and a failed ANALYZE must not escalate it
        graft.write.CatalogRegistry.analyzeStage(
          spark, db, t.stageTableName,
          ids.filter(result.df.columns.contains))
      }
      (result, stats)
    } match {
      case Success((result, stats)) =>
        if (result.quarantined.isEmpty)
          RunStatus(t.targetTableName, "SUCCEEDED",
            rowsWritten = stats.rowsWritten)
        else
          RunStatus(t.targetTableName, "WARNING",
            failReason = "can not create the columns: " +
              result.quarantinedColumns.mkString(","),
            rowsWritten = stats.rowsWritten,
            quarantinedColumns = result.quarantinedColumns)
      case Failure(e: MergeWriter.NoDataToMigrateException) =>
        RunStatus(t.targetTableName, "WARNING", failReason = e.getMessage)
      case Failure(e) =>
        RunStatus(t.targetTableName, "FAILED",
          failReason = Option(e.getMessage).getOrElse(e.toString))
    }
  }

  /** yyyyMM cutoff for transactional-window deletes
    * (aje-stage-dms-load.py:488-491). */
  private def currentCutoff(t: TableConfig): Int = {
    val now = java.time.LocalDate.now(graft.incr.Incremental.LimaZone)
    val lower = now.minusMonths(-1L * t.delayIncrementalIni)
    lower.getYear * 100 + lower.getMonthValue
  }

  /** Run every active table; driver-side thread pool fans the independent
    * Spark jobs out (executors stay saturated across tables). */
  def runAll(tables: Seq[TableConfig]): Seq[RunStatus] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, parallelism))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = tables.map(t =>
        scala.concurrent.Future(runTable(t)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }
}
