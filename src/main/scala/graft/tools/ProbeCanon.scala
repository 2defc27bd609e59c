package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe (r12): the co-order canonical edge set built by
  * distinct -> self-join -> distinct (the shape 12 graph queries inline)
  * vs one groupBy(ok) + per-order pair explode + distinct. Same output
  * set; the join disappears. Interleaved warm passes, one JVM. */
object ProbeCanon {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def joinForm = {
      val lp = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      lp.join(lp.select(col("ok"), col("pk").as("pk2")), "ok")
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("a"), col("pk2").as("b")).distinct()
    }
    def explodeForm = {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") % 5 === 0)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
        .select(explode(expr(
          """flatten(transform(pks, (x, i) ->
               transform(slice(pks, i + 2, size(pks)), y ->
                 struct(x AS a, y AS b))))""")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
    }
    // sanity: same set
    val j = joinForm; val x = explodeForm
    val d1 = j.exceptAll(x).count(); val d2 = x.exceptAll(j).count()
    println(s"diff $d1 $d2 rows=${j.count()}")
    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(joinForm); time(explodeForm) // warm
    for (i <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      val a = time(joinForm)
      val b = time(explodeForm)
      println(f"join=$a%.2f explode=$b%.2f")
    }
    spark.stop()
  }
}
