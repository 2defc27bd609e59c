package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.incr.Incremental
import graft.meta.ColumnSpec
import graft.ops.{Dedup, Graph, Multimodal, Recon, Sampling, Similarity, TextOps}
import graft.pipeline.StageTransform
import graft.write.MergeWriter

/**
 * The driver-facing query catalog: one entry per implemented operator from
 * SURVEY.md §2 plus the training-data-pipeline operator families (dedup,
 * similarity, text analysis, multimodal). Every SQL-expressible query has a
 * DuckDB oracle built to be BIT-IDENTICAL to the Spark result:
 *
 *  - aggregates go through DECIMAL casts (exact, order-independent) — never
 *    raw double sums, whose partial-aggregation order differs per engine;
 *  - similarity math runs on integer-quantized vectors (round(x*1000)), so
 *    dot products / norms are exact integers and derived doubles are
 *    bit-equal IEEE operations;
 *  - ratios are int/int divisions; scores are floor-quantized, not rounded
 *    (round has tie-mode differences across engines; floor has none);
 *  - timestamps are emitted as formatted strings (parquet tz-annotation
 *    differences otherwise leak into the compare);
 *  - md5 is the only string hash used — identical everywhere.
 */
object QueryCatalog {
  // family entries live under graft/catalog/ (one file per
  // operator family); this object only assembles the driver-facing maps.

  type Q = graft.catalog.Shared.Q

  val all: Seq[(String, Q, Option[String])] = {
    import graft.catalog._
    DslQueries.entries ++ PipelineQueries.entries ++
      RelationalQueries.entries ++ TextQueries.entries ++
      DedupQueries.entries ++ SimQueries.entries ++ MmQueries.entries ++
      SourceQueries.entries ++ SamplingQueries.entries ++
      GraphQueries.entries ++ FeatureQueries.entries ++
      CleanQueries.entries ++ MlQueries.entries ++ GeoQueries.entries ++
      StreamQueries.entries
  }

  def queries: Map[String, Q] = all.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
