package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.incr.Incremental
import graft.meta.ColumnSpec
import graft.ops.{Dedup, Graph, Multimodal, Recon, Sampling, Similarity, TextOps}
import graft.pipeline.StageTransform
import graft.write.MergeWriter
import graft.catalog.Shared._
import graft.catalog.DslQueries._
import graft.catalog.PipelineQueries._
import graft.catalog.RelationalQueries._
import graft.catalog.TextQueries._
import graft.catalog.DedupQueries._
import graft.catalog.SimQueries._
import graft.catalog.MmQueries._
import graft.catalog.SourceQueries._
import graft.catalog.SamplingQueries._
import graft.catalog.GraphQueries._

/** feature-engineering queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object FeatureQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Leave-one-out target encoding with additive smoothing (m = 20
    // pseudo-observations of the global prior): the standard
    // high-cardinality-categorical feature for downstream quality /
    // ranking models, built WITHOUT label leakage — each row's own label
    // is subtracted from its category's sum before the ratio. Shape: two
    // combine-enabled aggregates over the corpus, then a broadcast of
    // the category-cardinality-bounded encoding table; within a
    // category the encoding takes only two values (label 0 / label 1),
    // so the output is the (category x label) table itself — applying
    // it to rows is a broadcast map-join. The ratio is one fixed IEEE
    // chain over exact BIGINT counts.
    ("q_feature_target_enc",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(
          col("o_orderpriority").as("cat"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        val a = o.groupBy("cat")
          .agg(count(lit(1)).as("n_cat"), sum("y").as("sum_y"))
        val g = o.agg(sum("y").as("gs"), count(lit(1)).as("gn"))
        val prior = col("gs").cast("double") / col("gn").cast("double")
        val num = (col("sum_y") - col("y")).cast("double") +
          lit(20.0) * prior
        val den = (col("n_cat") - 1 + 20).cast("double")
        o.distinct()
          .join(a, Seq("cat")).crossJoin(broadcast(g))
          .select(col("cat"), col("y"), col("n_cat"), col("sum_y"),
            floor(num * lit(1e6) / den).cast("long").as("enc_ppm"))
      },
      Some("""WITH o AS (SELECT o_orderpriority AS cat,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders),
        a AS (SELECT cat, count(*) AS n_cat,
            CAST(sum(y) AS BIGINT) AS sum_y FROM o GROUP BY 1),
        g AS (SELECT CAST(sum(y) AS BIGINT) AS gs, count(*) AS gn FROM o),
        b AS (SELECT DISTINCT cat, CAST(y AS BIGINT) AS y FROM o)
        SELECT cat, y, n_cat, sum_y,
          CAST(floor((CAST(sum_y - y AS DOUBLE)
              + 20.0 * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))) * 1e6
            / CAST(n_cat - 1 + 20 AS DOUBLE)) AS BIGINT) AS enc_ppm
        FROM b JOIN a USING (cat), g""")))

}
