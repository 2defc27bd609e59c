package graft

import org.apache.spark.sql.functions._
import graft.ops.ML

class MLSpec extends SparkSpec {
  import spark.implicits._

  test("hardSigmoidPpm: linear region, clamps, exact floorDiv at negatives") {
    val got = Seq(-5000000L, -3L, 0L, 1L, 2000000L, 5000000L).toDF("z")
      .select(ML.hardSigmoidPpm($"z").as("p")).as[Long].collect().toSeq
    // -3/4 floors to -1 (floorDiv, not trunc); clamps at 0 and 1e6
    assert(got == Seq(0L, 499999L, 500000L, 500000L, 1000000L, 1000000L))
  }

  test("logisticGd: separable data fits a separating rule, history exact") {
    // y = 1 iff x1 >= 5; single feature, perfectly separable
    val feats = (0L to 9L).map(x => (x, if (x >= 5) 1L else 0L))
      .toDF("x1", "y")
    val fit = ML.logisticGd(feats, Seq("x1"), "y", rounds = 20, lr = 0.5)
    assert(fit.history.length == 21)
    assert(fit.history.head.toSeq == Seq(0L, 0L))
    // round 1 is hand-checkable: p = 500000 everywhere, so
    // g0 = sum(500000 - y*1e6) = 10*5e5 - 5*1e6 = 0
    // g1 = sum((500000 - y*1e6)*x1) = 5e5*(0+..+4) - 5e5*(5+..+9) = -12.5e6
    assert(fit.history(1).toSeq ==
      Seq(0L, -math.floor(-12500000.0 / 10 * 0.5).toLong))
    assert(fit.history(1)(1) == 625000L)
    // 20 rounds at lr=0.5 reach w = (-1517341, 342184) (hand-replayed)
    assert(fit.history.last.toSeq == Seq(-1517341L, 342184L))
    // the fitted rule classifies the training set perfectly
    val acc = fit.scored
      .select(sum(when(($"p_ppm" >= 500000L) === ($"y" === 1L), 1L)
        .otherwise(0L)).as("c")).as[Long].head()
    assert(acc == 10L)
  }

  test("logisticGd: round = one aggregate, weights are O(k) driver state") {
    val feats = Seq((1L, 2L, 0L), (3L, 1L, 1L), (2L, 2L, 1L))
      .toDF("a", "b", "y")
    val fit = ML.logisticGd(feats, Seq("a", "b"), "y", rounds = 2)
    assert(fit.history.forall(_.length == 3))
    assert(fit.scored.columns.contains("p_ppm"))
  }

  test("bestStump: picks the perfectly separating feature and threshold") {
    // f_good separates at bin <= 1; f_noise is independent of y
    val rows = Seq(
      (0L, 3L, 0L), (1L, 7L, 0L), (0L, 9L, 0L), (1L, 2L, 0L),
      (2L, 3L, 1L), (3L, 7L, 1L), (2L, 9L, 1L), (3L, 2L, 1L))
    val df = rows.toDF("f_good", "f_noise", "y")
    val got = ML.bestStump(df, Seq("f_good", "f_noise"), "y")
      .orderBy("feature").collect()
    val good = got.find(_.getString(0) == "f_good").get
    assert(good.getLong(1) == 1L)       // thr: bin <= 1 goes left
    assert(good.getLong(3) == 4L)       // n_left
    assert(good.getLong(4) == 0L)       // pos_left: pure left child
    assert(good.getLong(6) == 1L)       // is_best
    // perfect split: parent gini = 8*(1-0.5) = 4, children 0 ->
    // gain_ppm = 1e6 * 4/8 = 500000
    assert(good.getLong(5) == 500000L)
    val noise = got.find(_.getString(0) == "f_noise").get
    assert(noise.getLong(6) == 0L)
    assert(noise.getLong(5) < 500000L)
  }

  test("bestStump: last bin is never a threshold (no empty right child)") {
    val df = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)).toDF("f", "y")
    val got = ML.bestStump(df, Seq("f"), "y").collect()
    assert(got.length == 1 && got.head.getLong(1) == 0L)
  }

  test("aucPpm: matches the brute-force pair count, midranks for ties") {
    // scores with ties across classes: brute-force AUC =
    // (#(pos>neg) + 0.5*#(pos==neg)) / (n_pos*n_neg)
    val rows = Seq((10L, 0L), (20L, 0L), (20L, 1L), (30L, 0L), (30L, 1L),
      (40L, 1L), (40L, 1L), (5L, 0L))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum // in half-units x2
    val want = math.floor(1e6 * wins.toDouble /
      (2.0 * pos.size * neg.size)).toLong
    val got = ML.aucPpm(rows.toDF("s", "y"), "s", "y")
      .select("n_pos", "n_neg", "auc_ppm")
      .as[(Long, Long, Long)].head()
    assert(got == ((pos.size.toLong, neg.size.toLong, want)), got)
    // perfect separation -> exactly 1e6; one class empty -> NULL
    val perfect = ML.aucPpm(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("s", "y"), "s", "y").select("auc_ppm").as[Long].head()
    assert(perfect == 1000000L)
    val nullRow = ML.aucPpm(Seq((1L, 1L), (2L, 1L)).toDF("s", "y"),
      "s", "y").select("auc_ppm").collect().head
    assert(nullRow.isNullAt(0))
  }

  test("fsEm: separable patterns learn m >> u and a sane posterior split") {
    // 90 all-agree "true matches", 900 all-disagree, 60 noise patterns
    val pats = Seq(
      (1L, 1L, 1L, 90L), (0L, 0L, 0L, 900L),
      (1L, 0L, 0L, 20L), (0L, 1L, 0L, 20L), (0L, 0L, 1L, 20L))
    val fit = ML.fsEm(pats, rounds = 3)
    for (j <- 0 until 3) {
      assert(fit.mPpm(j) > fit.uPpm(j),
        s"field $j: m=${fit.mPpm(j)} must exceed u=${fit.uPpm(j)}")
      assert(fit.mPpm(j) >= 1000L && fit.mPpm(j) <= 999000L)
      assert(fit.uPpm(j) >= 1000L && fit.uPpm(j) <= 999000L)
    }
    val wMatch = fit.posterior((1L, 1L, 1L))
    val wNon = fit.posterior((0L, 0L, 0L))
    assert(wMatch > 900000L, s"all-agree posterior low: $wMatch")
    assert(wNon < 100000L, s"all-disagree posterior high: $wNon")
    // determinism: the quantized recurrence is a pure function
    assert(ML.fsEm(pats, rounds = 3).posterior == fit.posterior)
  }

  test("naiveBayesConfusion: separable corpus classifies held-out docs " +
      "perfectly; totals match the md5 split") {
    // 60 docs, two labels with distinctive marker words (each in ~24
    // train docs, comfortably over minDf=5) plus a shared token.
    val docs = (1L to 60L).map { id =>
      val lab = if (id % 2 == 0) "ca" else "cb"
      val word = if (id % 2 == 0) "alpha" else "bravo"
      (id, s"$word $word $word common", lab)
    }.toDF("doc_id", "text", "label")
    val got = ML.naiveBayesConfusion(docs, "doc_id", "text", "label")
      .as[(String, String, Long)].collect().toSeq.sortBy(_._1)
    // only diagonal rows: every held-out doc carries its marker 3x
    got.foreach { case (l, p, _) => assert(l == p, s"misrouted $l -> $p") }
    // the total equals the md5-split held-out count, computed the same way
    val nTest = docs.select(col("doc_id")).filter(
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long") % 5 === 0).count()
    assert(got.map(_._3).sum == nTest && nTest > 0)
  }

  test("naiveBayesConfusion: all-OOV held-out doc falls back to the prior") {
    // Find a held-out id, give it text made of tokens that appear nowhere
    // else (df=1 < minDf -> pruned from the vocabulary); the filler corpus
    // makes "cb" the strict majority class, so the OOV doc must route to
    // the prior argmin = cb regardless of its own (unusable) content.
    val ids = (1L to 40L)
    val testId = ids.find { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % 5 == 0
    }.get
    val docs = ids.map { id =>
      if (id == testId) (id, "zzqx wwvr", "ca")
      else if (id % 4 == 0) (id, "alpha alpha", "ca")
      else (id, "bravo bravo", "cb")
    }.toDF("doc_id", "text", "label")
    val got = ML.naiveBayesConfusion(docs, "doc_id", "text", "label")
      .as[(String, String, Long)].collect()
      .filter(_._1 == "ca").toSeq
    // the OOV ca doc predicts cb (majority prior) — present as ca->cb
    assert(got.exists { case (_, p, n) => p == "cb" && n >= 1L },
      s"expected a ca->cb prior-fallback row, got ${got.mkString(", ")}")
  }
}
