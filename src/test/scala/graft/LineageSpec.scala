package graft

import org.apache.spark.sql.functions._
import graft.meta.Lineage

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def edges(df: org.apache.spark.sql.DataFrame)
      : Set[(String, String, String)] =
    Lineage.columnLineage(df).as[(String, String, String)].collect().toSet

  test("projection, join and aggregate fold to source columns") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    assert(edges(q) == Set(
      ("prio", "orders.parquet", "o_orderpriority"),
      ("revenue", "lineitem.parquet", "l_extendedprice"),
      ("revenue", "lineitem.parquet", "l_discount")))
  }

  test("join keys and filters are control lineage — excluded by design") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val q = li.filter(col("l_quantity") > 10)
      .select(col("l_partkey").as("pk"))
    assert(edges(q) == Set(("pk", "lineitem.parquet", "l_partkey")))
  }

  test("window, generator and union lineage") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // generator: exploded tokens trace to text
    val gen = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    assert(edges(gen) == Set(
      ("doc_id", "documents.parquet", "doc_id"),
      ("tok", "documents.parquet", "text")))
    // window: rank over n_chars traces to its order column
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("n_chars")
    val win = docs.select(col("doc_id"),
      row_number().over(w).as("rnk"))
    val we = edges(win)
    assert(we.contains(("rnk", "documents.parquet", "n_chars")))
    assert(we.contains(("doc_id", "documents.parquet", "doc_id")))
    // union: positional merge across DIFFERENT source columns
    val u = docs.select(col("n_chars").as("v"))
      .union(docs.select(col("doc_id").as("v")))
    assert(edges(u) == Set(
      ("v", "documents.parquet", "n_chars"),
      ("v", "documents.parquet", "doc_id")))
  }

  test("multi-hop aliases and local relations resolve") {
    val local = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val q = li.select(col("l_orderkey").as("x"), col("l_tax"))
      .select((col("x") * 2).as("y"), col("l_tax"))
      .join(local, col("y") % 2 === col("k"))
      .select(col("y"), col("tag"))
    // the local leaf's TRUE columns are the tuple fields (_1, _2);
    // toDF's renames are a Project above the LocalRelation — value
    // lineage reports the leaf, not the alias
    assert(edges(q) == Set(
      ("y", "lineitem.parquet", "l_orderkey"),
      ("tag", "local", "_2")))
  }

  test("a catalog query's lineage is plan-derived and stable") {
    val q = SparkEntry.queries("q_join_revenue")(spark, sf)
    val e = edges(q)
    // every output column resolves to at least one source column, and all
    // sources are real fixture relations
    val outCols = q.columns.toSet
    assert(e.map(_._1).intersect(outCols).nonEmpty)
    assert(e.map(_._2).forall(_.endsWith(".parquet")))
  }
}
