package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade-ratio decomposition for q_graph_ktruss (VERDICT r11 next-round
  * #4): the sf10 probe read 9.35x per decade — within the O(|E|^1.5)
  * wedge-work contract but the closest completed reading to super-linear,
  * so break the wall time into its terms and measure the broadcast
  * counterfactual the way pagerank/walks were bracketed.
  *
  * Per round this prints edges-in, wedge count (Σ C(fanout_lo, 2) over the
  * degree-ordered orientation — the exact join work), max per-pivot
  * fan-out (the skew term the orientation is supposed to cap), triangle
  * count, survivors, and wall seconds; plus the final support pass. Modes:
  *   args = <sfDir> [broadcast|nobroadcast]
  * `nobroadcast` disables both static and AQE broadcast thresholds — at
  * cluster scale the degree table exceeds any broadcast bound, so that
  * plan is the 100 TB plan; comparing the two isolates how much of the
  * decade ratio is AQE's local[32] broadcast choice (the pagerank/walks
  * story) vs. genuine wedge growth.
  *
  * Stats pass and timed pass are SEPARATE loops over the same
  * checkpointed per-round edge sets: the wedge/fan-out aggregates would
  * otherwise inflate the round walls they are trying to explain.
  */
object ProbeKtruss {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val noBcast = args.length > 1 && args(1) == "nobroadcast"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (noBcast) {
      b.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      b.config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 4
    val t0 = System.nanoTime()
    def secSince(t: Long): Double = (System.nanoTime() - t) / 1e9

    // the q_graph_ktruss co-order edge set, canonicalized as ktruss does
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e0 = lp.join(lp.select(col("ok"), col("pk").as("pk2")), "ok")
      .filter(col("pk") < col("pk2"))
      .select(least(col("pk"), col("pk2")).cast("long").as("a"),
        greatest(col("pk"), col("pk2")).cast("long").as("b"))
      .distinct()
      .localCheckpoint()
    val nEdges0 = e0.count()
    val tBuild = secSince(t0)

    // timed peel rounds — exactly Graph.ktruss's loop, but with the wall
    // clock read between the per-round localCheckpoints
    var e = e0
    val roundWall = (1 to 3).map { _ =>
      val t = System.nanoTime()
      e = graft.ops.Graph.edgeSupport(e).filter(col("support") >= k - 2)
        .select("a", "b")
        .localCheckpoint()
      val survivors = e.count()
      (secSince(t), survivors)
    }
    val tF = System.nanoTime()
    val finalRows = graft.ops.Graph.edgeSupport(e).count()
    val tFinal = secSince(tF)

    // stats pass (untimed): per-round wedge work + skew cap on the SAME
    // edge sets the timed pass consumed (e0 plus each checkpointed round)
    def wedgeStats(canon: DataFrame): (Long, Long, Long) = {
      val deg = canon.select(col("a").as("node"))
        .union(canon.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val da = deg.select(col("node").as("a"), col("deg").as("da"))
      val db = deg.select(col("node").as("b"), col("deg").as("db"))
      val fan = canon.join(da, "a").join(db, "b")
        .select(when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"))
        .groupBy("lo").agg(count(lit(1)).as("f"))
      val r = fan.agg(
        sum((col("f") * (col("f") - 1) / 2).cast("long")).as("wedges"),
        max(col("f")).as("maxFan"),
        count(lit(1)).as("pivots")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var s = e0
    val roundStats = (1 to 3).map { i =>
      val st = wedgeStats(s)
      // recompute round i's survivor set only to advance the stats cursor
      s = graft.ops.Graph.edgeSupport(s).filter(col("support") >= k - 2)
        .select("a", "b").localCheckpoint()
      st
    }

    val rounds = roundWall.zip(roundStats).zipWithIndex.map {
      case (((w, surv), (wedges, maxFan, pivots)), i) =>
        f"""{"round":${i + 1},"wedges":$wedges,"maxFan":$maxFan,""" +
          f""""pivots":$pivots,"survivors":$surv,"sec":$w%.1f}"""
    }.mkString("[", ",", "]")
    println(f"""{"dir":"$dir","mode":"${if (noBcast) "nobroadcast"
      else "broadcast"}","edges":$nEdges0,"buildSec":$tBuild%.1f,""" +
      f""""rounds":$rounds,"finalRows":$finalRows,""" +
      f""""finalSec":$tFinal%.1f}""")
    spark.stop()
  }
}
