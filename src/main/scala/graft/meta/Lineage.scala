package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Column-level lineage extraction from an ANALYZED Catalyst plan — the
 * metadata answer a governed lake needs per published table ("which source
 * columns feed this output column?"), derived from the plan itself so it
 * can never drift from the code the way a hand-maintained mapping does.
 * The reference keeps hand-maintained column specifications per stage
 * table (`datalake_ingestion/datalake_ingestion_stack.py:176` provisions
 * the `stage_columns_especification` DynamoDB table the transforms read);
 * this derives the source→output column mapping, for free, from Catalyst.
 *
 * VALUE lineage: an output column is linked to every source-relation
 * column that can flow INTO ITS VALUES through projections, aggregates,
 * windows, generators, unions and expands. Filter/join predicates and
 * grouping keys that only gate WHICH rows appear (control lineage) are
 * deliberately excluded — the conventional cut (OpenLineage's
 * "transformation" edges make the same distinction).
 *
 * Pure plan walk on the driver: no data pass, no job; output size is
 * bounded by (output columns × source columns).
 */
object Lineage {

  /** (out_col, source, src_col) — one row per transitive value dependency
    * of each output column of `df`, sorted for determinism. `source` is
    * the catalog table name when the scan is a catalog read, else the
    * final path segment of the file relation (e.g. `lineitem.parquet`);
    * in-memory relations report `local`. */
  def columnLineage(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val m = sourcesOf(plan)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = plan.output.flatMap { a =>
      m.getOrElse(a.exprId, Set.empty)
        .map { case (src, c) => (a.name, src, c) }
    }.distinct.sortBy(r => (r._1, r._2, r._3))
    rows.toDF("out_col", "source", "src_col")
  }

  private def relationName(p: LogicalPlan): String = p match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).getOrElse(lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName).getOrElse("file")
        case _ => "relation"
      })
    case dsv2: DataSourceV2Relation =>
      dsv2.identifier.map(_.name()).getOrElse(dsv2.table.name())
    case _ => "local"
  }

  /** Bottom-up map: attribute ExprId → the set of (source, column) leaves
    * whose values can reach it. */
  private def sourcesOf(p: LogicalPlan)
      : Map[ExprId, Set[(String, String)]] = {
    val fromChildren: Map[ExprId, Set[(String, String)]] =
      p.children.map(sourcesOf)
        .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
    def resolve(ne: NamedExpression): (ExprId, Set[(String, String)]) =
      ne.exprId -> ne.references.toSeq
        .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty)).toSet
    p match {
      case leaf @ (_: LogicalRelation | _: DataSourceV2Relation) =>
        val src = relationName(leaf)
        leaf.output.map(a => a.exprId -> Set((src, a.name))).toMap
      case _: LocalRelation | _: Range =>
        p.output.map(a => a.exprId -> Set(("local", a.name))).toMap
      case proj: Project =>
        fromChildren ++ proj.projectList.map(resolve)
      case agg: Aggregate =>
        fromChildren ++ agg.aggregateExpressions.map(resolve)
      case w: Window =>
        fromChildren ++ w.windowExpressions.map(resolve)
      case g: Generate =>
        val gen = g.generator.references.toSeq
          .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty)).toSet
        fromChildren ++ g.generatorOutput.map(_.exprId -> gen)
      case u: Union =>
        // positional: output column i draws from column i of EVERY branch
        val byPos = u.children.map(c => c.output.map(a =>
          fromChildren.getOrElse(a.exprId, Set.empty[(String, String)])))
        fromChildren ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> byPos.map(_(i)).reduce(_ ++ _)
        }
      case e: Expand =>
        // grouping-set expansion: output i unions the i-th expression of
        // every projection row
        fromChildren ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.map(row => row(i).references.toSeq
            .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty))
            .toSet).reduce(_ ++ _)
        }
      case _ =>
        // Filter / Join / Sort / Distinct / Limit / SubqueryAlias /
        // Deduplicate …: outputs ARE child attributes — pass through
        fromChildren
    }
  }
}
