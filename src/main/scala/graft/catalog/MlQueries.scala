package graft.catalog

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Shared._
import graft.catalog.DedupQueries.cosineSql
import graft.ops.ML

/** In-engine model-training family (graft.ops.ML): distributed batch-GD
  * logistic regression with the hard-sigmoid surrogate, a probability-
  * calibration / ECE audit, and an information-gain decision stump — the
  * "train the curation model where the data lives" queries. Oracles
  * replay every GD round (the Lloyd-rounds pattern q_emb_kmeans pins):
  * weights are CTE scalars derived from the same integer gradient
  * aggregates, so the fitted model, not just the fit's output shape, is
  * cross-engine-verified. */
private[graft] object MlQueries {

  /** Per-user feature CTE shared by the ML oracles: two activity counts,
    * a kilocent spend feature, and the >$3200-of-purchases label. */
  private def featSql: String =
    s"""u AS MATERIALIZED (SELECT user_id,
      CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        AS BIGINT) AS x1,
      CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        AS BIGINT) AS x2,
      CAST(floor(CAST(sum(CASE WHEN event_type = 'click'
          THEN ${centsSql(""""value"""")} ELSE 0 END) AS DOUBLE)
        / 10000.0) AS BIGINT) AS x3,
      CASE WHEN sum(CASE WHEN event_type = 'purchase'
          THEN ${centsSql(""""value"""")} ELSE 0 END) > 320000
        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
    FROM events GROUP BY 1)"""

  /** Unrolled GD-round CTEs shared by the logreg-family oracles: scoring
    * (`pCte`), gradient moments (`gCte`), and the weight step (`wCte`) —
    * the exact integer/floor recurrence ML.logisticGd runs. `gdRoundsSql`
    * composes `rounds` of them from the all-zero init, leaving `pf` (the
    * final scored table) and `w{rounds}t` (the fitted weights) in scope.
    * Requires `u` (features) and `nn` (count) CTEs upstream. */
  private def pCte(p: String, w: String): String =
    s"""$p AS (SELECT u.*, least(greatest(CAST(floor(CAST(
        w0 + w1*x1 + w2*x2 + w3*x3 AS DOUBLE) / 4.0) AS BIGINT)
        + 500000, 0), 1000000) AS p
      FROM u, $w)"""
  private def gCte(g: String, p: String): String =
    s"""$g AS (SELECT
        CAST(sum(p - y*1000000) AS BIGINT) AS g0,
        CAST(sum((p - y*1000000) * x1) AS BIGINT) AS g1,
        CAST(sum((p - y*1000000) * x2) AS BIGINT) AS g2,
        CAST(sum((p - y*1000000) * x3) AS BIGINT) AS g3
      FROM $p)"""
  private def wCte(wNew: String, wOld: String, g: String): String =
    s"""$wNew AS (SELECT
        w0 - CAST(floor(CAST(g0 AS DOUBLE) / n * 0.01) AS BIGINT)
          AS w0,
        w1 - CAST(floor(CAST(g1 AS DOUBLE) / n * 0.01) AS BIGINT)
          AS w1,
        w2 - CAST(floor(CAST(g2 AS DOUBLE) / n * 0.01) AS BIGINT)
          AS w2,
        w3 - CAST(floor(CAST(g3 AS DOUBLE) / n * 0.01) AS BIGINT)
          AS w3
      FROM $wOld, $g, nn)"""
  private def gdRoundsSql(rounds: Int): String = {
    val cte = new StringBuilder(
      """w0t AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
        CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)""")
    for (r <- 1 to rounds)
      cte ++= s""",
        ${pCte(s"p$r", s"w${r - 1}t")}, ${gCte(s"g$r", s"p$r")},
        ${wCte(s"w${r}t", s"w${r - 1}t", s"g$r")}"""
    cte ++= s""",
        ${pCte("pf", s"w${rounds}t")}"""
    cte.toString
  }

  /** The same per-user features on the Spark side. */
  private def feats(s: SparkSession, d: String) =
    t(s, d, "events").groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("x2"),
        floor(sum(when(col("event_type") === "click", cents(col("value")))
          .otherwise(0L)).cast("double") / lit(10000.0)).cast("long")
          .as("x3"),
        when(sum(when(col("event_type") === "purchase",
          cents(col("value"))).otherwise(0L)) > 320000L, 1L)
          .otherwise(0L).as("y"))

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Logistic regression by 3 rounds of bulk-synchronous gradient
    // descent (ML.logisticGd): each round is ONE map-side-combined
    // aggregate producing 4 BIGINT gradient moments; weights are O(k)
    // driver state. The oracle unrolls all 3 rounds as CTEs — the
    // fitted weights themselves hash-match, not just the final score.
    ("q_ml_logreg",
      (s: SparkSession, d: String) => {
        val u = feats(s, d).cache()
        val fit = ML.logisticGd(u, Seq("x1", "x2", "x3"), "y",
          rounds = 3, lr = 0.01)
        val w = fit.history.last
        val out = fit.scored.agg(
          count(lit(1)).as("n_users"),
          sum(when((col("p_ppm") >= 500000L) === (col("y") === 1L), 1L)
            .otherwise(0L)).as("n_correct"),
          sum((col("p_ppm") - col("y") * lit(1000000L)) *
            (col("p_ppm") - col("y") * lit(1000000L))).as("ssq"))
          .select(
            lit(w(0)).as("w0_micro"), lit(w(1)).as("w1_micro"),
            lit(w(2)).as("w2_micro"), lit(w(3)).as("w3_micro"),
            col("n_users"),
            floor(lit(1e6) * col("n_correct").cast("double") /
              col("n_users").cast("double")).cast("long").as("acc_ppm"),
            floor(col("ssq").cast("double") / col("n_users") / lit(1e6))
              .cast("long").as("brier_ppm"))
        u.unpersist()
        out
      },
      Some {
        s"""WITH $featSql,
          nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
          ${gdRoundsSql(3)},
          m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(CASE WHEN (p >= 500000) = (y = 1) THEN 1 ELSE 0
                END) AS BIGINT) AS n_correct,
              CAST(sum((p - y*1000000) * (p - y*1000000)) AS BIGINT)
                AS ssq
            FROM pf)
          SELECT w0 AS w0_micro, w1 AS w1_micro, w2 AS w2_micro,
            w3 AS w3_micro, n_users,
            CAST(floor(1e6 * CAST(n_correct AS DOUBLE) /
              CAST(n_users AS DOUBLE)) AS BIGINT) AS acc_ppm,
            CAST(floor(CAST(ssq AS DOUBLE) / n_users / 1e6) AS BIGINT)
              AS brier_ppm
          FROM w3t, m"""
      }),

    // Exact ROC AUC of the fitted logreg scores by the Mann-Whitney U
    // identity with MIDRANKS for ties (AUC = P(score_pos > score_neg) +
    // P(=)/2 — the standard tie treatment): group by score (ppm domain,
    // bounded), one global cumulative over the AGGREGATE (the invariant
    // spec's allowed shape — never a corpus-row window), then
    //   2·Σ_pos midrank = Σ_s npos(s)·(2·below(s) + cnt(s) + 1)
    //   2U = that − 2·n_pos(n_pos+1)/2,  auc = 2U / (2·n_pos·n_neg)
    // — all integer until ONE final floor division, so the fitted
    // model's ranking quality hash-matches cross-engine exactly. The
    // weight rounds replay via the shared gdRoundsSql CTEs.
    ("q_ml_auc",
      (s: SparkSession, d: String) => {
        val u = feats(s, d).cache()
        val fit = ML.logisticGd(u, Seq("x1", "x2", "x3"), "y",
          rounds = 3, lr = 0.01)
        val out = ML.aucPpm(fit.scored, "p_ppm", "y")
        u.unpersist()
        out
      },
      Some(s"""WITH $featSql,
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        ${gdRoundsSql(3)},
        bys AS (SELECT p AS sc, CAST(count(*) AS BIGINT) AS cnt,
            CAST(sum(y) AS BIGINT) AS npos
          FROM pf GROUP BY 1),
        cum AS (SELECT sc, cnt, npos,
            CAST(coalesce(sum(cnt) OVER (ORDER BY sc
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
          FROM bys),
        a AS (SELECT
            CAST(sum(npos * (2*below + cnt + 1)) AS BIGINT) AS tspr,
            CAST(sum(npos) AS BIGINT) AS n_pos,
            CAST(sum(cnt - npos) AS BIGINT) AS n_neg
          FROM cum)
        SELECT n_pos, n_neg,
          tspr - n_pos * (n_pos + 1) AS two_u,
          CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE CAST(floor(1e6 * CAST(tspr - n_pos * (n_pos + 1)
              AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE)
                * CAST(n_neg AS DOUBLE))) AS BIGINT) END AS auc_ppm
        FROM a""")),

    // Precision / recall / F1 of the fitted logreg at a fixed threshold
    // grid — the operating-point readout next to q_ml_auc's ranking
    // readout. One corpus pass with a constant 3-row broadcast fan-out
    // (the checkpoint-table pattern); F1 comes from the COUNTS
    // (2tp/(2tp+fp+fn)), never from re-divided ppm values, so each cell
    // is one exact floor division.
    ("q_ml_pr_curve",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val u = feats(s, d).cache()
        val fit = ML.logisticGd(u, Seq("x1", "x2", "x3"), "y",
          rounds = 3, lr = 0.01)
        val thr = Seq(250000L, 500000L, 750000L).toDF("thr")
        def ppm(num: Column, den: Column): Column =
          when(den === 0L, lit(null).cast("long"))
            .otherwise(floor(lit(1e6) * num.cast("double") /
              den.cast("double")).cast("long"))
        val out = fit.scored.crossJoin(broadcast(thr))
          .groupBy("thr")
          .agg(
            sum(when(col("y") === 1L && col("p_ppm") >= col("thr"), 1L)
              .otherwise(0L)).as("tp"),
            sum(when(col("y") === 0L && col("p_ppm") >= col("thr"), 1L)
              .otherwise(0L)).as("fp"),
            sum(when(col("y") === 1L && col("p_ppm") < col("thr"), 1L)
              .otherwise(0L)).as("fn"))
          .select(col("thr"), col("tp"), col("fp"), col("fn"),
            ppm(col("tp"), col("tp") + col("fp")).as("precision_ppm"),
            ppm(col("tp"), col("tp") + col("fn")).as("recall_ppm"),
            ppm(lit(2L) * col("tp"),
              lit(2L) * col("tp") + col("fp") + col("fn")).as("f1_ppm"))
        u.unpersist()
        out
      },
      Some(s"""WITH $featSql,
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
        ${gdRoundsSql(3)},
        thr AS (SELECT CAST(u.t AS BIGINT) AS thr
          FROM UNNEST([250000, 500000, 750000]) u(t)),
        c AS (SELECT thr,
            CAST(sum(CASE WHEN y = 1 AND p >= thr THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
            CAST(sum(CASE WHEN y = 0 AND p >= thr THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
            CAST(sum(CASE WHEN y = 1 AND p < thr THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
          FROM pf, thr GROUP BY 1)
        SELECT thr, tp, fp, fn,
          CASE WHEN tp + fp = 0 THEN NULL
            ELSE CAST(floor(1e6 * CAST(tp AS DOUBLE) /
              CAST(tp + fp AS DOUBLE)) AS BIGINT) END AS precision_ppm,
          CASE WHEN tp + fn = 0 THEN NULL
            ELSE CAST(floor(1e6 * CAST(tp AS DOUBLE) /
              CAST(tp + fn AS DOUBLE)) AS BIGINT) END AS recall_ppm,
          CASE WHEN 2*tp + fp + fn = 0 THEN NULL
            ELSE CAST(floor(1e6 * CAST(2*tp AS DOUBLE) /
              CAST(2*tp + fp + fn AS DOUBLE)) AS BIGINT) END AS f1_ppm
        FROM c""")),

    // Grouped k-fold split assignment + leakage audit: folds must be a
    // function of the GROUP key (md5(user) % 5 — scan-stage, no
    // shuffle to assign), because hashing the row key instead scatters
    // one user's rows across folds and the model sees its own test
    // users in training (group leakage — the classic CV mistake). The
    // audit makes that concrete: `naive_spanning_users` counts users
    // whose EVENT-hashed folds disagree — every one of them would leak
    // under the row-keyed split. Per-fold census shows balance.
    ("q_ml_group_kfold",
      (s: SparkSession, d: String) => {
        def h(salt: String, c: org.apache.spark.sql.Column) =
          graft.plans.GraftExpressions.md5_prefix(
            concat(lit(salt), c.cast("string")), 8)
        val ev = t(s, d, "events")
        val naive = ev
          .select(col("user_id"),
            (h("fold|", col("event_id")) % 5).as("efold"))
          .groupBy("user_id")
          .agg(count_distinct(col("efold")).as("nf"))
          .agg(sum(when(col("nf") > 1, 1L).otherwise(0L))
            .as("naive_spanning_users"))
        val u = ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_ev"),
            max(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"))
          .withColumn("fold", h("fold|", col("user_id")) % 5)
        u.groupBy("fold")
          .agg(count(lit(1)).as("n_users"), sum("n_ev").as("n_events"),
            sum("y").as("pos_users"))
          .withColumn("label_rate_ppm",
            floor(lit(1e6) * col("pos_users").cast("double") /
              col("n_users").cast("double")).cast("long"))
          .crossJoin(broadcast(naive))
      },
      Some("""WITH naive AS (SELECT
            CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS naive_spanning_users
          FROM (SELECT user_id, count(DISTINCT
              CAST(concat('0x', substr(md5('fold|' ||
                CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5)
              AS nf
            FROM events GROUP BY 1)),
        u0 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
            CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS y
          FROM events GROUP BY 1),
        u AS (SELECT *, CAST(concat('0x', substr(md5('fold|' ||
              CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS fold
          FROM u0)
        SELECT fold, CAST(count(*) AS BIGINT) AS n_users,
          CAST(sum(n_ev) AS BIGINT) AS n_events,
          CAST(sum(y) AS BIGINT) AS pos_users,
          CAST(floor(1e6 * CAST(sum(y) AS DOUBLE) /
            CAST(count(*) AS DOUBLE)) AS BIGINT) AS label_rate_ppm,
          naive_spanning_users
        FROM u, naive GROUP BY fold, naive_spanning_users""")),

    // 2-fold cross-validated logistic regression — the generalization
    // audit on top of q_ml_logreg: train on each user-parity fold (2 GD
    // rounds), score BOTH folds with the frozen weights (scoring is a
    // pure scan-stage expression — ML.scoreHardSigmoid), and report the
    // train/test accuracy gap that flags overfitting before a curation
    // model ships. The oracle replays both folds' full GD chains.
    ("q_ml_cv",
      (s: SparkSession, d: String) => {
        val u = feats(s, d).cache()
        val xs = Seq("x1", "x2", "x3")
        def accCols(df: org.apache.spark.sql.DataFrame, w: Array[Long]) =
          graft.ops.ML.scoreHardSigmoid(df, xs, w)
            .agg(count(lit(1)).as("n"),
              sum(when((col("p_ppm") >= 500000L) === (col("y") === 1L),
                1L).otherwise(0L)).as("c"))
        val out = Seq(0L, 1L).map { f =>
          val tr = u.filter(pmod(col("user_id"), lit(2L)) === f)
          val te = u.filter(pmod(col("user_id"), lit(2L)) =!= f)
          val w = graft.ops.ML.logisticGd(tr, xs, "y",
            rounds = 2, lr = 0.01).history.last
          accCols(tr, w).select(col("n").as("n_train"),
              col("c").as("c_train"))
            .crossJoin(accCols(te, w).select(col("n").as("n_test"),
              col("c").as("c_test")))
            .select(lit(f).as("fold"),
              lit(w(0)).as("w0_micro"), lit(w(1)).as("w1_micro"),
              lit(w(2)).as("w2_micro"), lit(w(3)).as("w3_micro"),
              col("n_train"), col("n_test"),
              floor(lit(1e6) * col("c_train").cast("double") /
                col("n_train").cast("double")).cast("long")
                .as("train_acc_ppm"),
              floor(lit(1e6) * col("c_test").cast("double") /
                col("n_test").cast("double")).cast("long")
                .as("test_acc_ppm"))
            .withColumn("gap_ppm",
              col("train_acc_ppm") - col("test_acc_ppm"))
        }
        u.unpersist()
        out.reduce(_ unionAll _)
      },
      Some {
        def pCte(p: String, src: String, w: String): String =
          s"""$p AS (SELECT $src.*, least(greatest(CAST(floor(CAST(
              w0 + w1*x1 + w2*x2 + w3*x3 AS DOUBLE) / 4.0) AS BIGINT)
              + 500000, 0), 1000000) AS p
            FROM $src, $w)"""
        def foldChain(f: Int): String = {
          def gCte(g: String, p: String): String =
            s"""$g AS (SELECT
                CAST(sum(p - y*1000000) AS BIGINT) AS g0,
                CAST(sum((p - y*1000000) * x1) AS BIGINT) AS g1,
                CAST(sum((p - y*1000000) * x2) AS BIGINT) AS g2,
                CAST(sum((p - y*1000000) * x3) AS BIGINT) AS g3
              FROM $p)"""
          def wCte(wNew: String, wOld: String, g: String): String =
            s"""$wNew AS (SELECT
                w0 - CAST(floor(CAST(g0 AS DOUBLE) / n * 0.01) AS BIGINT)
                  AS w0,
                w1 - CAST(floor(CAST(g1 AS DOUBLE) / n * 0.01) AS BIGINT)
                  AS w1,
                w2 - CAST(floor(CAST(g2 AS DOUBLE) / n * 0.01) AS BIGINT)
                  AS w2,
                w3 - CAST(floor(CAST(g3 AS DOUBLE) / n * 0.01) AS BIGINT)
                  AS w3
              FROM $wOld, $g, nn$f)"""
          s"""tr$f AS (SELECT * FROM u WHERE user_id % 2 = $f),
            te$f AS (SELECT * FROM u WHERE user_id % 2 <> $f),
            nn$f AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr$f),
            w0t$f AS (SELECT CAST(0 AS BIGINT) AS w0,
              CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
              CAST(0 AS BIGINT) AS w3),
            ${pCte(s"p1$f", s"tr$f", s"w0t$f")},
            ${gCte(s"g1$f", s"p1$f")},
            ${wCte(s"w1t$f", s"w0t$f", s"g1$f")},
            ${pCte(s"p2$f", s"tr$f", s"w1t$f")},
            ${gCte(s"g2$f", s"p2$f")},
            ${wCte(s"w2t$f", s"w1t$f", s"g2$f")},
            ${pCte(s"ptr$f", s"tr$f", s"w2t$f")},
            ${pCte(s"pte$f", s"te$f", s"w2t$f")},
            mtr$f AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
                CAST(sum(CASE WHEN (p >= 500000) = (y = 1) THEN 1
                  ELSE 0 END) AS BIGINT) AS c_train
              FROM ptr$f),
            mte$f AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
                CAST(sum(CASE WHEN (p >= 500000) = (y = 1) THEN 1
                  ELSE 0 END) AS BIGINT) AS c_test
              FROM pte$f)"""
        }
        def foldRow(f: Int): String =
          s"""SELECT CAST($f AS BIGINT) AS fold, w0 AS w0_micro,
            w1 AS w1_micro, w2 AS w2_micro, w3 AS w3_micro,
            n_train, n_test,
            CAST(floor(1e6 * CAST(c_train AS DOUBLE) /
              CAST(n_train AS DOUBLE)) AS BIGINT) AS train_acc_ppm,
            CAST(floor(1e6 * CAST(c_test AS DOUBLE) /
              CAST(n_test AS DOUBLE)) AS BIGINT) AS test_acc_ppm,
            CAST(floor(1e6 * CAST(c_train AS DOUBLE) /
                CAST(n_train AS DOUBLE)) AS BIGINT)
              - CAST(floor(1e6 * CAST(c_test AS DOUBLE) /
                CAST(n_test AS DOUBLE)) AS BIGINT) AS gap_ppm
          FROM w2t$f, mtr$f, mte$f"""
        s"""WITH $featSql,
          ${foldChain(0)},
          ${foldChain(1)}
          ${foldRow(0)}
          UNION ALL
          ${foldRow(1)}"""
      }),

    // Probability calibration audit (reliability diagram + expected
    // calibration error): a Laplace-smoothed click-share heuristic is
    // the "model score"; decile score bins compare mean predicted ppm
    // with observed label rate, and ECE weights the per-bin gap by bin
    // mass. The ECE window runs over <= 10 domain-bounded bin rows.
    ("q_ml_calibration",
      (s: SparkSession, d: String) => {
        val scored = feats(s, d)
          .withColumn("p_hat_ppm",
            floor(lit(1e6) * (col("x1") + lit(1L)).cast("double") /
              (col("x1") + col("x2") + lit(2L)).cast("double"))
              .cast("long"))
          .withColumn("bin",
            least(floor(col("p_hat_ppm").cast("double") / lit(100000.0))
              .cast("long"), lit(9L)))
        val bins = scored.groupBy("bin")
          .agg(count(lit(1)).as("n_b"), sum("p_hat_ppm").as("sp"),
            sum("y").as("pos"))
          .select(col("bin"), col("n_b"),
            floor(col("sp").cast("double") / col("n_b").cast("double"))
              .cast("long").as("mean_pred_ppm"),
            floor(lit(1e6) * col("pos").cast("double") /
              col("n_b").cast("double")).cast("long").as("obs_ppm"))
        val all = Window.partitionBy()
        bins
          .withColumn("ece_ppm",
            floor(sum(col("n_b") *
                abs(col("mean_pred_ppm") - col("obs_ppm"))).over(all)
              .cast("double") / sum(col("n_b")).over(all).cast("double"))
              .cast("long"))
      },
      Some(s"""WITH $featSql,
          sc AS (SELECT u.*,
              CAST(floor(1e6 * CAST(x1 + 1 AS DOUBLE) /
                CAST(x1 + x2 + 2 AS DOUBLE)) AS BIGINT) AS p_hat_ppm
            FROM u),
          sb AS (SELECT least(CAST(floor(CAST(p_hat_ppm AS DOUBLE)
                / 100000.0) AS BIGINT), 9) AS bin, p_hat_ppm, y
            FROM sc),
          bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
              CAST(floor(CAST(sum(p_hat_ppm) AS DOUBLE) /
                CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_pred_ppm,
              CAST(floor(1e6 * CAST(sum(y) AS DOUBLE) /
                CAST(count(*) AS DOUBLE)) AS BIGINT) AS obs_ppm
            FROM sb GROUP BY 1)
          SELECT bin, n_b, mean_pred_ppm, obs_ppm,
            CAST(floor(CAST(sum(n_b * abs(mean_pred_ppm - obs_ppm))
                OVER () AS DOUBLE) /
              CAST(sum(n_b) OVER () AS DOUBLE)) AS BIGINT) AS ece_ppm
          FROM bins""")),

    // kNN classifier evaluation over the labeled embeddings: exact
    // integer-quantized cosine 5-NN (the q_sim_topk substrate — self
    // excluded by construction), majority vote with a (votes desc,
    // label asc) tiebreak, per-true-label recall. This is the "is the
    // embedding space label-separable" audit run before trusting
    // embedding-based curation. The probe side is a FIXED eval slice
    // (vec_id < 2000 — leave-one-out at catalog scales), so cost is
    // probes × corpus: linear in the corpus for a bounded eval set —
    // the sf1 probe measured the unbounded LOO at 79× on 10× data
    // (n², by definition) vs ~10× bounded. Exact brute-force scoring
    // is the contract of an EVAL; the production path stays LSH/IVF.
    ("q_ml_knn_eval",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "embeddings")
        val knn = graft.ops.Similarity.cosineTopK(
          e, "vec_id", "embedding", e.filter(col("vec_id") < 2000),
          "vec_id", "embedding", k = 5)
        val lbl = e.select(col("vec_id"), col("label").cast("long")
          .as("lab"))
        val votes = knn
          .join(lbl.select(col("vec_id").as("neighbor_id"),
            col("lab").as("nlabel")), Seq("neighbor_id"))
          .groupBy("query_id", "nlabel")
          .agg(count(lit(1)).as("votes"))
        val pred = votes.withColumn("rk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(col("votes").desc, col("nlabel"))))
          .filter(col("rk") === 1)
          .select(col("query_id"), col("nlabel").as("pred"))
        pred.join(lbl.select(col("vec_id").as("query_id"),
            col("lab").as("true_label")), Seq("query_id"))
          .groupBy("true_label")
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("pred") === col("true_label"), 1L)
              .otherwise(0L)).as("n_correct"))
          .withColumn("recall_ppm",
            floor(lit(1e6) * col("n_correct").cast("double") /
              col("n_eval").cast("double")).cast("long"))
      },
      Some(s"""WITH c AS MATERIALIZED (SELECT vec_id, $quantSql AS v,
            CAST(label AS BIGINT) AS lab
          FROM embeddings),
        scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            c.lab AS nlabel, ${cosineSql("q.v", "c.v")} AS cosine
          FROM c q JOIN c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < 2000),
        knn AS (SELECT query_id, nlabel FROM
            (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM scored)
          WHERE rnk <= 5),
        votes AS (SELECT query_id, nlabel,
            CAST(count(*) AS BIGINT) AS votes
          FROM knn GROUP BY 1, 2),
        pred AS (SELECT query_id, nlabel AS pred FROM
            (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY votes DESC, nlabel) AS rk FROM votes)
          WHERE rk = 1)
        SELECT c.lab AS true_label, CAST(count(*) AS BIGINT) AS n_eval,
          CAST(sum(CASE WHEN p.pred = c.lab THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
          CAST(floor(1e6 * CAST(sum(CASE WHEN p.pred = c.lab THEN 1
              ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE))
            AS BIGINT) AS recall_ppm
        FROM pred p JOIN c ON c.vec_id = p.query_id
        GROUP BY 1""")),

    // Bagged stump ensemble (a 3-tree random forest at depth 1 —
    // Breiman 2001's two ingredients, bootstrap bags and voting, with
    // the deterministic twist the gate needs: bags are md5-keyed 50%
    // subsamples, not RNG draws). Per bag: ONE Gini-stump fit (the
    // q_ml_stump machinery) collected as O(1) driver rule state; each
    // rule's leaf predictions are its leaf majorities; the ensemble
    // scores every event by 2-of-3 vote as a pure scan-stage CASE
    // chain. The oracle replays all three bag fits AND the vote, so
    // the learned ensemble itself hash-matches.
    ("q_ml_forest",
      (s: SparkSession, d: String) => {
        val feats3 = Seq("f_day", "f_hour", "f_vbin")
        val e = t(s, d, "events").select(col("event_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"),
          least(floor(cents(col("value")).cast("double") / lit(5000.0))
            .cast("long"), lit(9L)).as("f_vbin"),
          date_format(col("ts"), "HH").cast("long").as("f_hour"),
          floor((dayofmonth(col("ts")) - lit(1)).cast("double") /
            lit(7.0)).cast("long").as("f_day")).cache()
        val rules = (0 to 2).map { b =>
          val bag = e.filter(graft.plans.GraftExpressions.md5_prefix(
            concat(lit(s"bag$b|"), col("event_id").cast("string")), 8)
            % 2 === 0)
          val best = ML.bestStump(bag, feats3, "y")
            .filter(col("is_best") === 1).head()
          val pos = bag.agg(sum("y")).head().getLong(0)
          val (feature, thr, n, nl, pl) = (best.getString(0),
            best.getLong(1), best.getLong(2), best.getLong(3),
            best.getLong(4))
          (b.toLong, feature, thr, nl, pl,
            if (2 * pl > nl) 1L else 0L,
            if (2 * (pos - pl) > (n - nl)) 1L else 0L)
        }
        def predOf(r: (Long, String, Long, Long, Long, Long, Long)) =
          when(col(r._2) <= lit(r._3), lit(r._6)).otherwise(lit(r._7))
        val votes = rules.map(predOf).reduce(_ + _)
        val m = e.agg(count(lit(1)).as("ens_n"),
          sum(when((votes >= 2L) === (col("y") === 1L), 1L)
            .otherwise(0L)).as("ens_correct"))
        val ruleDf = s.createDataFrame(rules)
          .toDF("bag", "feature", "thr", "n_left", "pos_left",
            "left_pred", "right_pred")
        val out = ruleDf.crossJoin(broadcast(m))
          .withColumn("ens_acc_ppm",
            floor(lit(1e6) * col("ens_correct").cast("double") /
              col("ens_n").cast("double")).cast("long"))
        e.unpersist()
        out
      },
      Some {
        def bagChain(b: Int): String = {
          def gini(n: String, pos: String): String =
            s"""(CAST($n * $n - $pos * $pos
              - ($n - $pos) * ($n - $pos) AS DOUBLE)
              / CAST($n AS DOUBLE))"""
          s"""bag$b AS (SELECT * FROM e WHERE
              CAST(concat('0x', substr(md5('bag$b|' ||
                CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0),
            m$b AS (SELECT 'f_vbin' AS feature, f_vbin AS bin, y
                FROM bag$b
              UNION ALL SELECT 'f_hour', f_hour, y FROM bag$b
              UNION ALL SELECT 'f_day', f_day, y FROM bag$b),
            cells$b AS (SELECT feature, bin,
                CAST(count(*) AS BIGINT) AS c,
                CAST(sum(y) AS BIGINT) AS pos
              FROM m$b GROUP BY 1, 2),
            sp$b AS (SELECT feature, bin,
                CAST(sum(c) OVER wl AS BIGINT) AS n_left,
                CAST(sum(pos) OVER wl AS BIGINT) AS pos_left,
                CAST(sum(c) OVER wt AS BIGINT) AS n,
                CAST(sum(pos) OVER wt AS BIGINT) AS pos_tot,
                row_number() OVER wo AS rk, count(*) OVER wt AS nb
              FROM cells$b
              WINDOW wl AS (PARTITION BY feature ORDER BY bin
                  ROWS UNBOUNDED PRECEDING),
                wo AS (PARTITION BY feature ORDER BY bin),
                wt AS (PARTITION BY feature)),
            g$b AS (SELECT feature, bin, n, n_left, pos_left, pos_tot,
                ${gini("n", "pos_tot")} - ${gini("n_left", "pos_left")}
                  - ${gini("(n - n_left)", "(pos_tot - pos_left)")}
                  AS gain_num
              FROM sp$b WHERE rk < nb),
            rule$b AS (SELECT CAST($b AS BIGINT) AS bag, feature,
                bin AS thr, n_left, pos_left,
                CASE WHEN 2 * pos_left > n_left THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS left_pred,
                CASE WHEN 2 * (pos_tot - pos_left) > (n - n_left)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
                  AS right_pred
              FROM g$b
              ORDER BY gain_num DESC, feature, bin LIMIT 1)"""
        }
        def voteArm(b: Int): String =
          s"""(SELECT CASE WHEN (CASE feature
              WHEN 'f_vbin' THEN e.f_vbin
              WHEN 'f_hour' THEN e.f_hour
              ELSE e.f_day END) <= thr THEN left_pred ELSE right_pred
            END FROM rule$b)"""
        s"""WITH e AS MATERIALIZED (SELECT event_id,
            CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS y,
            least(CAST(floor(CAST(${centsSql(""""value"""")} AS DOUBLE)
              / 5000.0) AS BIGINT), 9) AS f_vbin,
            CAST(strftime(ts, '%H') AS BIGINT) AS f_hour,
            CAST(floor(CAST(CAST(strftime(ts, '%d') AS BIGINT) - 1
              AS DOUBLE) / 7.0) AS BIGINT) AS f_day
          FROM events),
        ${bagChain(0)},
        ${bagChain(1)},
        ${bagChain(2)},
        scored AS (SELECT y,
            ${voteArm(0)} + ${voteArm(1)} + ${voteArm(2)} AS votes
          FROM e),
        em AS (SELECT CAST(count(*) AS BIGINT) AS ens_n,
            CAST(sum(CASE WHEN (votes >= 2) = (y = 1) THEN 1 ELSE 0
              END) AS BIGINT) AS ens_correct
          FROM scored)
        SELECT bag, feature, thr, n_left, pos_left, left_pred,
          right_pred, ens_n, ens_correct,
          CAST(floor(1e6 * CAST(ens_correct AS DOUBLE) /
            CAST(ens_n AS DOUBLE)) AS BIGINT) AS ens_acc_ppm
        FROM (SELECT * FROM rule0 UNION ALL SELECT * FROM rule1
          UNION ALL SELECT * FROM rule2), em"""
      }),

    // Gini-gain decision stump (ML.bestStump) over three small-domain
    // binned event features, label = is-purchase. Gini, not entropy:
    // the impurity is an exact integer numerator over one division, so
    // the gain is a fixed IEEE chain both engines replay bit-for-bit
    // (floor-log2 entropy collapses most splits to the same whole-bit
    // gain). Threshold windows run over each feature's observed bin
    // domain (<= 24 rows), never the data.
    ("q_ml_stump",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "events").select(
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"),
          least(floor(cents(col("value")).cast("double") / lit(5000.0))
            .cast("long"), lit(9L)).as("f_vbin"),
          date_format(col("ts"), "HH").cast("long").as("f_hour"),
          floor((dayofmonth(col("ts")) - lit(1)).cast("double") /
            lit(7.0)).cast("long").as("f_day"))
        ML.bestStump(e, Seq("f_day", "f_hour", "f_vbin"), "y")
      },
      Some {
        def gini(n: String, pos: String): String =
          s"""(CAST($n * $n - $pos * $pos
            - ($n - $pos) * ($n - $pos) AS DOUBLE) / CAST($n AS DOUBLE))"""
        s"""WITH e AS (SELECT
            CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS y,
            least(CAST(floor(CAST(${centsSql(""""value"""")} AS DOUBLE)
              / 5000.0) AS BIGINT), 9) AS f_vbin,
            CAST(strftime(ts, '%H') AS BIGINT) AS f_hour,
            CAST(floor(CAST(CAST(strftime(ts, '%d') AS BIGINT) - 1
              AS DOUBLE) / 7.0) AS BIGINT) AS f_day
          FROM events),
        m AS (SELECT 'f_vbin' AS feature, f_vbin AS bin, y FROM e
          UNION ALL SELECT 'f_hour', f_hour, y FROM e
          UNION ALL SELECT 'f_day', f_day, y FROM e),
        cells AS (SELECT feature, bin, CAST(count(*) AS BIGINT) AS c,
            CAST(sum(y) AS BIGINT) AS pos
          FROM m GROUP BY 1, 2),
        sp AS (SELECT feature, bin,
            CAST(sum(c) OVER wl AS BIGINT) AS n_left,
            CAST(sum(pos) OVER wl AS BIGINT) AS pos_left,
            CAST(sum(c) OVER wt AS BIGINT) AS n,
            CAST(sum(pos) OVER wt AS BIGINT) AS pos_tot,
            row_number() OVER wo AS rk, count(*) OVER wt AS nb
          FROM cells
          WINDOW wl AS (PARTITION BY feature ORDER BY bin
              ROWS UNBOUNDED PRECEDING),
            wo AS (PARTITION BY feature ORDER BY bin),
            wt AS (PARTITION BY feature)),
        g AS (SELECT feature, bin, n, n_left, pos_left,
            ${gini("n", "pos_tot")} - ${gini("n_left", "pos_left")}
              - ${gini("(n - n_left)", "(pos_tot - pos_left)")}
              AS gain_num
          FROM sp WHERE rk < nb),
        b AS (SELECT *, row_number() OVER (PARTITION BY feature
            ORDER BY gain_num DESC, bin) AS pick FROM g),
        f AS (SELECT * FROM b WHERE pick = 1)
        SELECT feature, bin AS thr, n, n_left, pos_left,
          CAST(floor(1e6 * gain_num / CAST(n AS DOUBLE)) AS BIGINT)
            AS gain_ppm,
          CASE WHEN row_number() OVER (ORDER BY gain_num DESC, feature,
            bin) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS is_best
        FROM f"""
      }),

    // Multinomial naive Bayes language classifier, trained AND scored
    // in-engine (ML.naiveBayesConfusion): md5 hash split (20% held out),
    // df>=5 vocabulary, whole-bit surprisal weights (NO transcendentals
    // — the q_text_lm_score discipline), add-one smoothing. Scoring is
    // ONE broadcast model join; the per-label grid materializes at doc
    // granularity only (score = prior + w_unseen*n_d + sum of seen-term
    // deltas). Output: held-out confusion matrix — the measured quality
    // of the cheapest corpus labeler a curation pipeline deploys.
    ("q_ml_naive_bayes",
      (s: SparkSession, d: String) => ML.naiveBayesConfusion(
        t(s, d, "documents"), "doc_id", "text", "lang")
        .withColumnRenamed("label", "lang")
        .withColumnRenamed("label_pred", "lang_pred"),
      Some(s"""WITH base AS (SELECT doc_id AS id, lang AS label,
            ${tokensSql()} AS ts,
            (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 5 = 0) AS is_test
          FROM documents),
        toks AS (SELECT id, label, is_test, t AS term
          FROM base, UNNEST(ts) AS u(t)),
        vocab AS (SELECT term FROM
          (SELECT term, count(DISTINCT id) AS df FROM toks
           WHERE NOT is_test GROUP BY 1) WHERE df >= 5),
        cnt AS (SELECT label, term, CAST(count(*) AS BIGINT) AS cnt
          FROM toks JOIN vocab USING (term)
          WHERE NOT is_test GROUP BY 1, 2),
        v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        tot AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot
          FROM cnt GROUP BY 1),
        ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_train
          FROM base WHERE NOT is_test),
        pri AS (SELECT nl.label AS cand,
            CAST(length(bin(n_train)) - length(bin(n_lab)) AS BIGINT)
              AS prior_bits,
            CAST(length(bin(coalesce(tot, 0) + v)) - 1 AS BIGINT)
              AS w_unseen
          FROM (SELECT label, CAST(count(*) AS BIGINT) AS n_lab
              FROM base WHERE NOT is_test GROUP BY 1) nl
          LEFT JOIN tot ON tot.label = nl.label, ntr, v),
        w AS (SELECT c.label AS cand, c.term,
            CAST(length(bin(tot + v)) - length(bin(cnt + 1)) AS BIGINT)
              AS w
          FROM cnt c JOIN tot ON tot.label = c.label, v),
        tt AS (SELECT id, term FROM toks
          WHERE is_test AND term IN (SELECT term FROM vocab)),
        nd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_d
          FROM tt GROUP BY 1),
        adj AS (SELECT tt.id, w.cand,
            CAST(sum(w.w - p.w_unseen) AS BIGINT) AS adj
          FROM tt JOIN w USING (term) JOIN pri p ON p.cand = w.cand
          GROUP BY 1, 2),
        grid AS (SELECT b.id, b.label, p.cand,
            p.prior_bits + p.w_unseen * coalesce(nd.n_d, 0)
              + coalesce(adj.adj, 0) AS score
          FROM base b CROSS JOIN pri p
          LEFT JOIN nd ON nd.id = b.id
          LEFT JOIN adj ON adj.id = b.id AND adj.cand = p.cand
          WHERE b.is_test),
        pred AS (SELECT id, label, cand, row_number()
            OVER (PARTITION BY id ORDER BY score ASC, cand ASC) AS rn
          FROM grid)
        SELECT label AS lang, cand AS lang_pred,
          CAST(count(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1 GROUP BY 1, 2"""))
  )
}
