package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock decomposition of q_graph_betweenness (r12 optimization
  * round): edge build, forward path-count rounds, backward dependency
  * rounds, final aggregate — each phase timed around its eager
  * materializations, one warm pass first so the readings are
  * steady-state (the Bench protocol). */
object ProbeBetweenness {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(newBackward: Boolean): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      def phase[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        out += name -> (System.nanoTime() - t0) / 1e9
        r
      }
      val rounds = 3
      val scale = 1000000L
      val (e, lvl0) = phase("build") {
        val seeds = spark.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_partkey") < 5)
          .select((col("l_partkey") * 2).as("seed"))
        val fwd = spark.read.parquet(s"$dir/lineitem.parquet")
          .select((col("l_partkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val e = fwd.union(fwd.select(col("dst").as("src"),
          col("src").as("dst"))).localCheckpoint()
        val lvl = seeds.select(col("seed").cast("long").as("s")).distinct()
          .select(col("s"), col("s").as("node"), lit(0L).as("level"),
            lit(1L).as("sigma")).localCheckpoint()
        (e, lvl)
      }
      var lvl = lvl0
      var frontier = lvl.select("s", "node", "sigma")
      for (r <- 1 to rounds) phase(s"fwd$r") {
        val next = e.join(frontier.withColumnRenamed("node", "src"), "src")
          .groupBy(col("s"), col("dst").as("node"))
          .agg(sum("sigma").as("sigma"))
          .join(lvl.select("s", "node"), Seq("s", "node"), "left_anti")
          .select(col("s"), col("node"), lit(r.toLong).as("level"),
            col("sigma"))
          .localCheckpoint()
        lvl = lvl.union(next)
        frontier = next.select("s", "node", "sigma")
      }
      val dag = if (!newBackward) null else phase("dag") {
        lvl.filter(col("level").between(1, rounds - 1))
          .withColumnRenamed("node", "src")
          .join(e, Seq("src"))
          .withColumn("lw", col("level") + 1)
          .join(lvl.select(col("s"), col("node").as("dst"),
              col("level").as("lw"), col("sigma").as("sigma_w")),
            Seq("s", "dst", "lw"))
          .select(col("s"), col("src"), col("dst"), col("level"),
            col("sigma"), col("sigma_w"))
          .localCheckpoint()
      }
      var delta = phase("bwd_init") {
        lvl.filter(col("level") === rounds)
          .select(col("s"), col("node"), lit(0L).as("delta"))
          .localCheckpoint()
      }
      var acc = delta
      for (l <- (rounds - 1) to 1 by -1) phase(s"bwd$l") {
        val dl = (if (newBackward)
          dag.filter(col("level") === l)
            .join(delta.select(col("s"), col("node").as("dst"),
              col("delta").as("delta_w")), Seq("s", "dst"), "left")
            .groupBy(col("s"), col("src").as("node"))
            .agg(sum(expr(
              s"sigma * ($scale + coalesce(delta_w, 0L)) div sigma_w"))
              .as("delta"))
        else {
          val wSide = lvl.filter(col("level") === (l + 1))
            .join(delta, Seq("s", "node"), "left")
            .select(col("s"), col("node").as("dst"),
              col("sigma").as("sigma_w"),
              coalesce(col("delta"), lit(0L)).as("delta_w"))
          lvl.filter(col("level") === l)
            .withColumnRenamed("node", "src")
            .join(e, Seq("src"))
            .join(wSide, Seq("s", "dst"))
            .groupBy(col("s"), col("src").as("node"))
            .agg(sum(expr(s"sigma * ($scale + delta_w) div sigma_w"))
              .as("delta"))
        }).localCheckpoint()
        delta = dl
        acc = acc.union(dl)
      }
      phase("final") {
        acc.groupBy("node")
          .agg(count(lit(1)).as("n_sources"), sum("delta").as("bc_micro"))
          .filter(col("bc_micro") > 0)
          .write.format("noop").mode("overwrite").save()
      }
      out.toSeq
    }
    run(false); run(true) // warm both
    for (i <- 1 to 3; nb <- Seq(false, true)) {
      spark.catalog.clearCache(); System.gc()
      val timed = run(nb)
      println(s"variant=${if (nb) "new" else "old"} " + timed.map {
        case (n, s) => f"$n=$s%.2f" }.mkString(" ") +
        f" total=${timed.map(_._2).sum}%.2f")
    }
    spark.stop()
  }
}
