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

/** relational, aggregation and experimentation queries — split from the single-object catalog;
  * content unchanged. Assembled by [[graft.QueryCatalog]]. */
private[graft] object RelationalQueries {
  val entries: Seq[(String, Q, Option[String])] = Seq(

    // TPC-H Q1-shaped pricing summary: decimal-exact, partial-agg friendly
    // Holt linear exponential smoothing (level+trend) over the daily
    // series, one-step forecast per event type — the forecasting
    // primitive behind capacity planning and anomaly baselines. With
    // alpha = beta = 1/2 every recursion step is multiply-by-0.5 and add:
    // DYADIC rationals, exactly representable in doubles, so the float
    // recursion is bit-identical across engines — replayed by DuckDB's
    // list_reduce over the same day-ordered fold (state = [level, trend]
    // pair; init = [x_1, 0]). The per-type series is CALENDAR-BOUNDED
    // (one element per day), so the collect_list state is domain-bounded
    // like the other calendar windows.
    ("q_agg_holt",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val step = (acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) => {
          val level = lit(0.5) * x.getItem(0) +
            lit(0.5) * (acc.getItem(0) + acc.getItem(1))
          array(level,
            lit(0.5) * (level - acc.getItem(0)) +
              lit(0.5) * acc.getItem(1))
        }
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("n"))))
            .as("xs0"), count(lit(1)).as("n_days"))
          .withColumn("xs", transform(col("xs0"),
            e => array(e.getField("n").cast("double"), lit(0.0))))
          .withColumn("st", aggregate(
            slice(col("xs"), lit(2), size(col("xs")) - 1),
            element_at(col("xs"), 1), step))
          .select(col("event_type"), col("n_days"),
            col("st").getItem(0).as("level"),
            col("st").getItem(1).as("trend"),
            (col("st").getItem(0) + col("st").getItem(1))
              .as("forecast_next"))
      },
      Some("""WITH daily AS (SELECT event_type,
            strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
          FROM events GROUP BY 1, 2),
        arr AS (SELECT event_type,
            list([CAST(n AS DOUBLE), CAST(0 AS DOUBLE)] ORDER BY day)
              AS xs,
            count(*) AS n_days
          FROM daily GROUP BY 1),
        f AS (SELECT event_type, n_days, list_reduce(xs, (acc, x) -> [
            0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
            0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
              + 0.5 * acc[2]
          ]) AS st FROM arr)
        SELECT event_type, n_days, st[1] AS level, st[2] AS trend,
          st[1] + st[2] AS forecast_next
        FROM f""")),

    // One-sided CUSUM changepoint detector over each event type's daily
    // count series (Page 1954): s_i = max(0, s_{i-1} + dev_i - allowance),
    // alarm when s_i clears the threshold. All arithmetic is exact BIGINT
    // in "8N-scaled count units" (dev_i = 8·N·n_i − 8·S, allowance = an
    // eighth of the mean = S, threshold = one mean = 8·S), so the fold is
    // bit-identical cross-engine — same ordered-fold shape as q_agg_holt:
    // a calendar-bounded per-key array folded with one aggregate() HOF,
    // replayed by DuckDB's list_reduce. No corpus-sized window: the only
    // shuffle is the combine-enabled daily groupBy.
    ("q_agg_cusum",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val g = daily.groupBy("event_type").agg(
          array_sort(collect_list(struct(col("day"), col("n")))).as("xs"),
          count(lit(1)).as("n_days"), sum("n").as("total"))
        val step = (acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) => {
          val sNew = greatest(lit(0L), acc.getItem(0) +
            lit(8L) * col("n_days") * x.getField("n") -
            lit(9L) * col("total"))
          array(sNew, greatest(acc.getItem(1), sNew),
            acc.getItem(2) +
              when(sNew > lit(8L) * col("total"), 1L).otherwise(0L))
        }
        g.withColumn("st",
            aggregate(col("xs"), array(lit(0L), lit(0L), lit(0L)), step))
          .select(col("event_type"), col("n_days"), col("total"),
            col("st").getItem(0).as("final_cusum"),
            col("st").getItem(1).as("max_cusum"),
            col("st").getItem(2).as("n_alarms"))
      },
      Some("""WITH daily AS (SELECT event_type,
            strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
          FROM events GROUP BY 1, 2),
        arr AS (SELECT event_type,
            list([CAST(n AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)]
              ORDER BY day) AS xs,
            CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(n) AS BIGINT) AS total
          FROM daily GROUP BY 1),
        f AS (SELECT event_type, n_days, total,
          list_reduce(list_prepend(
              [CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)], xs),
            (acc, x) -> [
              greatest(CAST(0 AS BIGINT),
                acc[1] + 8 * n_days * x[1] - 9 * total),
              greatest(acc[2], greatest(CAST(0 AS BIGINT),
                acc[1] + 8 * n_days * x[1] - 9 * total)),
              acc[3] + CASE WHEN greatest(CAST(0 AS BIGINT),
                  acc[1] + 8 * n_days * x[1] - 9 * total) > 8 * total
                THEN 1 ELSE 0 END]) AS st
          FROM arr)
        SELECT event_type, n_days, total, st[1] AS final_cusum,
          st[2] AS max_cusum, st[3] AS n_alarms
        FROM f""")),

    // Hampel filter — the robust rolling-outlier detector (median/MAD
    // where a z-score would be dragged by the outlier itself): per
    // (event_type, day) exact micro sums, a centered 7-row window, med =
    // the lower-median order statistic of the window list, MAD = the
    // same order statistic of |x − med|, flag |s − med| > 3·MAD. All
    // integer order statistics on sorted window lists (no float, no
    // percentile interpolation); windows are calendar-bounded (~30 rows
    // per type), the corpus pass is one combine-enabled daily aggregate.
    ("q_window_hampel",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("s"))
        val w = Window.partitionBy("event_type").orderBy(col("day").asc)
          .rowsBetween(-3, 3)
        daily.withColumn("lst", collect_list(col("s")).over(w))
          .withColumn("med", expr("element_at(array_sort(lst), " +
            "cast((size(lst) + 1) div 2 as int))"))
          .withColumn("mad", expr("element_at(array_sort(transform(lst, " +
            "v -> abs(v - med))), cast((size(lst) + 1) div 2 as int))"))
          .select(col("event_type"), col("day"), col("s"), col("med"),
            col("mad"),
            when(abs(col("s") - col("med")) > lit(3L) * col("mad"), 1L)
              .otherwise(0L).as("is_outlier"))
      },
      Some("""WITH daily AS (SELECT event_type,
            strftime(ts, '%Y-%m-%d') AS day,
            CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS BIGINT) AS s
          FROM events GROUP BY 1, 2),
        wl AS (SELECT *, list(s) OVER (PARTITION BY event_type
            ORDER BY day ASC ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            AS lst
          FROM daily),
        m AS (SELECT *, list_sort(lst)[(len(lst) + 1) // 2] AS med
          FROM wl),
        mm AS (SELECT *, list_sort(list_transform(lst,
            v -> abs(v - med)))[(len(lst) + 1) // 2] AS mad FROM m)
        SELECT event_type, day, s, CAST(med AS BIGINT) AS med,
          CAST(mad AS BIGINT) AS mad,
          CASE WHEN abs(s - med) > 3 * mad THEN CAST(1 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS is_outlier
        FROM mm""")),

    // Last-observation-carried-forward gap fill: a sparse per-type daily
    // series (holes punched on every 3rd day) expands to the full
    // calendar x type grid and fills each hole with the latest known
    // value — last(x, ignoreNulls) over a per-type calendar-bounded
    // window (the documented domain-bounded exception; the grid is
    // |days|·|types|, never the event stream). The sibling of
    // q_agg_gapfill's zero-fill: LOCF is the right fill for LEVEL
    // metrics (balances, gauges), zero-fill for FLOW metrics (counts).
    ("q_window_locf",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(cents(col("value"))).as("x"))
          .filter(dayofmonth(col("day")) % 3 =!= 0)
        val cal = t(s, d, "events")
          .agg(min(to_date(col("ts"))).as("lo"),
            max(to_date(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val types = daily.select("event_type").distinct()
        val w = Window.partitionBy("event_type").orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        cal.crossJoin(broadcast(types))
          .join(daily, Seq("event_type", "day"), "left")
          .withColumn("filled", last(col("x"), ignoreNulls = true).over(w))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"),
            col("filled"),
            when(col("x").isNull, 1L).otherwise(0L).as("is_filled"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        sparse AS (SELECT * FROM daily WHERE day(day) % 3 <> 0),
        b AS (SELECT min(CAST(ts AS DATE)) AS lo,
            max(CAST(ts AS DATE)) AS hi FROM events),
        cal AS (SELECT CAST(unnest(generate_series(lo, hi,
            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        grid AS (SELECT t.event_type, cal.day
          FROM cal CROSS JOIN (SELECT DISTINCT event_type FROM sparse) t),
        j AS (SELECT g.event_type, g.day, s.x
          FROM grid g LEFT JOIN sparse s
            ON g.event_type = s.event_type AND g.day = s.day)
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
          last_value(x IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS filled,
          CASE WHEN x IS NULL THEN CAST(1 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS is_filled
        FROM j""")),

    // Linear-interpolation gap fill — the missing-data treatment between
    // q_window_locf's step fill and q_agg_seasonal's model fill: interior
    // gaps get the straight line between the flanking known points
    // (filled = pv + floor((nv−pv)·(day−pd)/(nd−pd)), exact BIGINT
    // numerator, one double floor-division — floor, not integer div,
    // because the slope can be negative and the engines' integer
    // divisions disagree on truncation direction), edge gaps (no known
    // point on one side) stay null and are tagged. Same sparse series /
    // calendar-spine construction as LOCF; four domain-bounded windows
    // (calendar-sized partitions) — the 100 TB form keys the spine by
    // (series, year) so no partition outgrows the calendar.
    ("q_window_interp",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(cents(col("value"))).as("x"))
          .filter(dayofmonth(col("day")) % 3 =!= 0)
        val cal = t(s, d, "events")
          .agg(min(to_date(col("ts"))).as("lo"),
            max(to_date(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val types = daily.select("event_type").distinct()
        val wp = Window.partitionBy("event_type").orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wn = Window.partitionBy("event_type").orderBy(col("day").asc)
          .rowsBetween(0, Window.unboundedFollowing)
        val lerp = col("pv") + floor(
          ((col("nv") - col("pv")) *
            datediff(col("day"), col("pd"))).cast("double") /
          datediff(col("nd"), col("pd")).cast("double")).cast("long")
        cal.crossJoin(broadcast(types))
          .join(daily, Seq("event_type", "day"), "left")
          .withColumn("pv", last(col("x"), ignoreNulls = true).over(wp))
          .withColumn("pd", last(when(col("x").isNotNull, col("day")),
            ignoreNulls = true).over(wp))
          .withColumn("nv", first(col("x"), ignoreNulls = true).over(wn))
          .withColumn("nd", first(when(col("x").isNotNull, col("day")),
            ignoreNulls = true).over(wn))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("x"),
            when(col("x").isNotNull, col("x"))
              .when(col("pv").isNotNull && col("nv").isNotNull, lerp)
              .otherwise(lit(null).cast("long")).as("filled"),
            when(col("x").isNotNull, 0L)
              .when(col("pv").isNotNull && col("nv").isNotNull, 1L)
              .otherwise(2L).as("method"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(sum(CAST(floor("value" * 100) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        sparse AS (SELECT * FROM daily WHERE day(day) % 3 <> 0),
        b AS (SELECT min(CAST(ts AS DATE)) AS lo,
            max(CAST(ts AS DATE)) AS hi FROM events),
        cal AS (SELECT CAST(unnest(generate_series(lo, hi,
            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        grid AS (SELECT t.event_type, cal.day
          FROM cal CROSS JOIN (SELECT DISTINCT event_type FROM sparse) t),
        j AS (SELECT g.event_type, g.day, s.x
          FROM grid g LEFT JOIN sparse s
            ON g.event_type = s.event_type AND g.day = s.day),
        w AS (SELECT event_type, day, x,
            last_value(x IGNORE NULLS) OVER (PARTITION BY event_type
              ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS pv,
            last_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
            first_value(x IGNORE NULLS) OVER (PARTITION BY event_type
              ORDER BY day ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM j)
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
          CASE WHEN x IS NOT NULL THEN x
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                 pv + CAST(floor(CAST((nv - pv) *
                     date_diff('day', pd, day) AS DOUBLE) /
                   CAST(date_diff('day', pd, nd) AS DOUBLE)) AS BIGINT)
               ELSE NULL END AS filled,
          CASE WHEN x IS NOT NULL THEN CAST(0 AS BIGINT)
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                 CAST(1 AS BIGINT)
               ELSE CAST(2 AS BIGINT) END AS method
        FROM w""")),

    // Holt forecast BACKTEST — the evaluation q_agg_holt's fit lacks:
    // roll through the series accumulating the one-step-ahead absolute
    // error |level+trend − x| BEFORE each update, in the same bit-exact
    // ordered fold (identical IEEE ops in identical order in both
    // engines). Emits the error sum and a floor-quantized MAE — the
    // number that says whether the smoothing constants are any good.
    ("q_agg_holt_backtest",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val step = (acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) => {
          val xv = x.getItem(0)
          val err = abs(acc.getItem(0) + acc.getItem(1) - xv)
          val level = lit(0.5) * xv +
            lit(0.5) * (acc.getItem(0) + acc.getItem(1))
          array(level,
            lit(0.5) * (level - acc.getItem(0)) +
              lit(0.5) * acc.getItem(1),
            acc.getItem(2) + err)
        }
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("n"))))
            .as("xs0"), count(lit(1)).as("n_days"))
          .withColumn("xs", transform(col("xs0"),
            e => array(e.getField("n").cast("double"), lit(0.0),
              lit(0.0))))
          .withColumn("st", aggregate(
            slice(col("xs"), lit(2), size(col("xs")) - 1),
            element_at(col("xs"), 1), step))
          .select(col("event_type"), col("n_days"),
            col("st").getItem(2).as("sum_abs_err"),
            when(col("n_days") < 2, lit(null).cast("long")).otherwise(
              floor(col("st").getItem(2) * 1e6 /
                (col("n_days") - 1).cast("double")).cast("long"))
              .as("mae_micro"))
      },
      Some("""WITH daily AS (SELECT event_type,
            strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
          FROM events GROUP BY 1, 2),
        arr AS (SELECT event_type,
            list([CAST(n AS DOUBLE), CAST(0 AS DOUBLE),
              CAST(0 AS DOUBLE)] ORDER BY day) AS xs,
            CAST(count(*) AS BIGINT) AS n_days
          FROM daily GROUP BY 1),
        f AS (SELECT event_type, n_days, list_reduce(xs, (acc, x) -> [
            0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
            0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
              + 0.5 * acc[2],
            acc[3] + abs(acc[1] + acc[2] - x[1])
          ]) AS st FROM arr)
        SELECT event_type, n_days, st[3] AS sum_abs_err,
          CASE WHEN n_days < 2 THEN NULL
            ELSE CAST(floor(st[3] * 1e6 / CAST(n_days - 1 AS DOUBLE))
              AS BIGINT) END AS mae_micro
        FROM f""")),

    // Wald–Wolfowitz runs test on each event type's daily series: is the
    // sequence of above/below-median days random, or does it trend/cycle?
    // Median is the lower order statistic (pure rank — tie order can't
    // matter), the run count is an ordered aggregate() fold over the
    // calendar-bounded day array, and z² stays a ratio of exact BIGINTs:
    // z² = (n(R−1) − 2·n1·n0)²·(n−1) / (2·n1·n0·(2·n1·n0 − n)), one
    // floor-quantized IEEE division at the end. Same fold shape as
    // q_agg_holt/q_agg_cusum; only shuffle is the daily groupBy.
    ("q_agg_runs_test",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"))
        val g = daily.groupBy("event_type").agg(
          array_sort(collect_list(struct(col("day"), col("n")))).as("xs"),
          count(lit(1)).as("nd"))
        val vals = transform(col("xs"), x => x.getField("n"))
        val med = element_at(array_sort(vals), ((col("nd") + 1) / 2)
          .cast("int"))
        val sign = (v: org.apache.spark.sql.Column) =>
          when(v > col("med"), 1L).otherwise(0L)
        val step = (acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) =>
          array(sign(x),
            acc.getItem(1) + when(sign(x) =!= acc.getItem(0), 1L)
              .otherwise(0L))
        val withRuns = g.withColumn("med", med)
          .withColumn("vals", vals)
          .withColumn("n1",
            aggregate(col("vals"), lit(0L), (a, x) => a + sign(x)))
          .withColumn("runs", aggregate(
            slice(col("vals"), lit(2), size(col("vals")) - 1),
            array(sign(element_at(col("vals"), 1)), lit(1L)),
            step).getItem(1))
        val n = col("nd"); val n1 = col("n1"); val n0 = col("nd") - col("n1")
        val a = n * (col("runs") - 1) - lit(2L) * n1 * n0
        val den = lit(2L) * n1 * n0 * (lit(2L) * n1 * n0 - n)
        withRuns.select(col("event_type"), col("nd").as("n_days"),
          col("med"), col("n1").as("n_above"), col("runs"),
          when(den <= 0, lit(null).cast("long")).otherwise(
            floor((a * a * (n - 1)).cast("double") * 1e6 /
              den.cast("double")).cast("long")).as("z2_micro"))
      },
      Some("""WITH daily AS (SELECT event_type,
            strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
          FROM events GROUP BY 1, 2),
        arr AS (SELECT event_type,
            list(CAST(n AS BIGINT) ORDER BY day) AS vals,
            CAST(count(*) AS BIGINT) AS nd
          FROM daily GROUP BY 1),
        m AS (SELECT event_type, vals, nd,
            list_sort(vals)[CAST((nd + 1) // 2 AS INTEGER)] AS med
          FROM arr),
        f AS (SELECT event_type, nd, med,
            CAST(list_sum(list_transform(vals,
              v -> CASE WHEN v > med THEN 1 ELSE 0 END)) AS BIGINT) AS n1,
            list_reduce(
              list_prepend([CASE WHEN vals[1] > med THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END, CAST(1 AS BIGINT)],
                list_transform(vals[2:],
                  v -> [CASE WHEN v > med THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END, CAST(0 AS BIGINT)])),
              (acc, x) -> [x[1],
                acc[2] + CASE WHEN x[1] <> acc[1] THEN 1 ELSE 0 END]
            )[2] AS runs
          FROM m)
        SELECT event_type, nd AS n_days, med, n1 AS n_above, runs,
          CASE WHEN 2 * n1 * (nd - n1) * (2 * n1 * (nd - n1) - nd) <= 0
            THEN NULL
            ELSE CAST(floor(
              CAST((nd * (runs - 1) - 2 * n1 * (nd - n1))
                 * (nd * (runs - 1) - 2 * n1 * (nd - n1))
                 * (nd - 1) AS DOUBLE) * 1e6 /
              CAST(2 * n1 * (nd - n1) * (2 * n1 * (nd - n1) - nd)
                AS DOUBLE)) AS BIGINT) END AS z2_micro
        FROM f""")),

    // Pareto frontier (skyline: maximize p_size, minimize price). The
    // scale shape: a combine-enabled groupBy(p_size).min collapses the
    // corpus to one row per size BEFORE any ordered scan, so the window
    // below runs over a domain-bounded table (|distinct sizes|), not the
    // corpus — the pre-aggregate IS the partition-local skyline prune, and
    // the frontier joins back as a broadcast. A (size, best-price) pair
    // survives iff no strictly-larger size reached an equal-or-lower
    // minimum price; rows tied with their size's best price all keep
    // (dominance must be strict in at least one dimension).
    ("q_agg_skyline",
      (s: SparkSession, d: String) => {
        val p = t(s, d, "part").select(col("p_partkey"),
          col("p_size").cast("int").as("p_size"),
          cents(col("p_retailprice")).as("price_cents"))
        val best = p.groupBy("p_size")
          .agg(min("price_cents").as("best_cents"))
        val w = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val sky = best.withColumn("min_larger", min("best_cents").over(w))
          .filter(col("min_larger").isNull ||
            col("best_cents") < col("min_larger"))
          .select(col("p_size").as("sky_size"),
            col("best_cents").as("sky_cents"))
        p.join(broadcast(sky),
          col("p_size") === col("sky_size") &&
            col("price_cents") === col("sky_cents"))
          .select(col("p_partkey"), col("p_size"), col("price_cents"))
      },
      Some("""WITH q AS (SELECT p_partkey, CAST(p_size AS INT) AS p_size,
            CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
          FROM part)
        SELECT p_partkey, p_size, price_cents FROM q a
        WHERE NOT EXISTS (SELECT 1 FROM q b
          WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
            AND (b.p_size > a.p_size OR b.price_cents < a.price_cents))""")),

    // Weekday-seasonality deviation: each day's event count against its
    // weekday's total, in the exact-integer (x·n − Σx) form (no float
    // mean) with one floor-quantized relative deviation — the seasonal
    // baseline an anomaly monitor subtracts before alerting. Two
    // combine-enabled aggregates (daily, then per-weekday moments
    // broadcast back onto the 7-row-per-weekday day table).
    ("q_agg_seasonal",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            (weekday(col("ts")) + 1).as("isodow"))
          .agg(count(lit(1)).as("n"))
        val wd = daily.groupBy("isodow")
          .agg(count(lit(1)).as("n_days"), sum("n").as("sum_wd"))
        daily.join(broadcast(wd), "isodow")
          .select(col("day"), col("isodow").cast("int").as("isodow"),
            col("n"),
            floor((col("n") * col("n_days") - col("sum_wd")).cast("double")
              * 1e6 / col("sum_wd").cast("double")).cast("long")
              .as("dev_ppm"))
      },
      Some("""WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
            isodow(ts) AS isodow, count(*) AS n
          FROM events GROUP BY 1, 2),
        wd AS (SELECT isodow, count(*) AS n_days,
            CAST(sum(n) AS BIGINT) AS sum_wd
          FROM daily GROUP BY 1)
        SELECT day, CAST(d.isodow AS INT) AS isodow, n,
          CAST(floor(CAST(n * n_days - sum_wd AS DOUBLE) * 1e6 /
            CAST(sum_wd AS DOUBLE)) AS BIGINT) AS dev_ppm
        FROM daily d JOIN wd ON d.isodow = wd.isodow""")),

    ("q_agg_hourly",
      // tumbling-window time-series aggregation via Spark's window():
      // hourly event counts + distinct users + min/max value (min/max are
      // order-independent on doubles; float SUMs are not cross-engine-safe)
      (s: SparkSession, d: String) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n_events"), col("n_users"),
          col("min_value"), col("max_value")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
          AS hour, event_type,
          count(*) AS n_events, count(DISTINCT user_id) AS n_users,
          min("value") AS min_value, max("value") AS max_value
        FROM events GROUP BY 1, 2""")),

    // Daily active users + cumulative distinct reach: first-seen day per
    // user (one groupBy — the classic "count distinct so far" rewrite that
    // needs NO stateful running distinct), then a running sum over the
    // CALENDAR (the only window, bounded by days-in-range, not corpus)
    ("q_agg_reach",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val active = e.groupBy("day").agg(count(lit(1)).as("n_active"))
        val firstSeen = e.groupBy("user_id").agg(min("day").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        active.join(firstSeen, Seq("day"), "left")
          .na.fill(0L, Seq("n_new"))
          .withColumn("cum_reach", sum("n_new").over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_active"), col("n_new"), col("cum_reach"))
      },
      Some("""WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events),
          a AS (SELECT day, count(*) AS n_active FROM e GROUP BY 1),
          f AS (SELECT user_id, min(day) AS day FROM e GROUP BY 1),
          nn AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1)
        SELECT strftime(a.day, '%Y-%m-%d') AS day, a.n_active,
          coalesce(nn.n_new, 0) AS n_new,
          CAST(sum(coalesce(nn.n_new, 0)) OVER (ORDER BY a.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_reach
        FROM a LEFT JOIN nn USING (day)""")),

    // Cohort LTV curve: cumulative purchase revenue per signup cohort by
    // day offset — the money sibling of q_seq_cohort's retention counts.
    // Revenue accumulates in exact BIGINT cents; the only window runs
    // over the (cohort, offset) GRID (calendar² rows, not events), and
    // the per-user mean divides once at presentation.
    ("q_agg_ltv",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "events")
        val cohort = e.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("cohort_day"))
        val sizes = cohort.groupBy("cohort_day")
          .agg(count(lit(1)).as("n_cohort"))
        val rev = e.filter(col("event_type") === "purchase")
          .join(cohort, Seq("user_id"))
          .groupBy(col("cohort_day"),
            datediff(to_date(col("ts")), col("cohort_day"))
              .cast("long").as("day_offset"))
          .agg(sum(cents(col("value"))).as("rev_cents"))
        val w = Window.partitionBy("cohort_day")
          .orderBy(col("day_offset").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        rev.withColumn("cum_cents", sum("rev_cents").over(w))
          .join(broadcast(sizes), Seq("cohort_day"))
          .select(date_format(col("cohort_day"), "yyyy-MM-dd")
              .as("cohort_day"),
            col("day_offset"), col("rev_cents"), col("cum_cents"),
            col("n_cohort"),
            (floor(lit(1e4) * col("cum_cents").cast("double") /
              col("n_cohort").cast("double")) / lit(1e6))
              .as("ltv_per_user"))
      },
      Some(s"""WITH c AS (SELECT user_id, min(CAST(ts AS DATE))
            AS cohort_day FROM events GROUP BY 1),
          sz AS (SELECT cohort_day, count(*) AS n_cohort
            FROM c GROUP BY 1),
          r AS (SELECT c.cohort_day,
              CAST(date_diff('day', c.cohort_day, CAST(e.ts AS DATE))
                AS BIGINT) AS day_offset,
              CAST(sum(${centsSql(""""value"""")}) AS BIGINT) AS rev_cents
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' GROUP BY 1, 2),
          cum AS (SELECT cohort_day, day_offset, rev_cents,
              CAST(sum(rev_cents) OVER (PARTITION BY cohort_day
                ORDER BY day_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS cum_cents
            FROM r)
        SELECT strftime(cum.cohort_day, '%Y-%m-%d') AS cohort_day,
          day_offset, rev_cents, cum_cents, n_cohort,
          floor(1e4 * CAST(cum_cents AS DOUBLE) /
            CAST(n_cohort AS DOUBLE)) / 1e6 AS ltv_per_user
        FROM cum JOIN sz ON cum.cohort_day = sz.cohort_day""")),

    // Longest consecutive-active-day streak per user (islands on the
    // per-user day grid — gamified-engagement's favorite metric), rolled
    // into a streak-length histogram. Both windows are per-user and
    // bounded by the user's distinct active days.
    ("q_window_streak",
      (s: SparkSession, d: String) => {
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy(col("day").asc)
        val streaks = days
          .withColumn("rn", row_number().over(w))
          .withColumn("grp", expr("date_sub(day, rn)"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("best_streak"))
        streaks.groupBy("best_streak")
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
          g AS (SELECT user_id, day,
              day - CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY day) AS INTEGER) AS grp
            FROM d),
          st AS (SELECT user_id, count(*) AS len
            FROM g GROUP BY user_id, grp),
          best AS (SELECT user_id, CAST(max(len) AS BIGINT) AS best_streak
            FROM st GROUP BY 1)
        SELECT best_streak, count(*) AS n_users
        FROM best GROUP BY 1""")),

    // Freshness / watermark-lag report: per event type, the newest event
    // and its lag behind the global high-water mark — the staleness SLA
    // panel every incremental pipeline watches (a type whose feed died
    // shows a growing lag while the table still "has data"). Two tiny
    // aggregates, the global mark broadcast as one row.
    ("q_incr_freshness",
      (s: SparkSession, d: String) => {
        val perType = t(s, d, "events").groupBy("event_type")
          .agg(max(unix_micros(col("ts"))).as("max_us"),
            count(lit(1)).as("n_events"))
        val global = perType.agg(max("max_us").as("global_us"))
        perType.crossJoin(broadcast(global))
          .select(col("event_type"), col("n_events"),
            date_format((col("max_us") / lit(1000000L)).cast("timestamp"),
              "yyyy-MM-dd HH:mm:ss").as("latest"),
            ((col("global_us") - col("max_us")) / lit(1000000L))
              .cast("long").as("lag_seconds"))
      },
      Some("""WITH p AS (SELECT event_type, max(epoch_us(ts)) AS max_us,
            count(*) AS n_events FROM events GROUP BY 1),
          g AS (SELECT max(max_us) AS global_us FROM p)
        SELECT event_type, n_events,
          strftime(to_timestamp(max_us // 1000000), '%Y-%m-%d %H:%M:%S')
            AS latest,
          CAST((global_us - max_us) // 1000000 AS BIGINT) AS lag_seconds
        FROM p, g""")),

    // User reactivation distribution: a reactivation is a return after
    // >=2 idle days (the lag-window gap rule; the threshold matches the
    // fixture's event density — a 30-day dense stream has no week-long
    // gaps); the rollup buckets users by
    // how often they churned-and-returned — the lifecycle histogram
    // retention teams track. Per-user window (bounded), exact day math.
    ("q_seq_reactivation",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val perUser = t(s, d, "events")
          .withColumn("gap_days",
            datediff(to_date(col("ts")),
              lag(to_date(col("ts")), 1).over(w)))
          .groupBy("user_id")
          .agg(sum(when(col("gap_days") >= 2, 1L).otherwise(0L))
            .as("n_reactivations"))
        perUser.groupBy("n_reactivations")
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH g AS (SELECT user_id,
            date_diff('day', lag(CAST(ts AS DATE)) OVER (
              PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
              CAST(ts AS DATE)) AS gap_days
          FROM events),
        pu AS (SELECT user_id,
            CAST(sum(CASE WHEN gap_days >= 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_reactivations
          FROM g GROUP BY 1)
        SELECT n_reactivations, count(*) AS n_users
        FROM pu GROUP BY 1""")),

    // Backfill planner: which CONTIGUOUS day ranges are missing from a
    // partitioned table — the recompute scoping step of an incremental
    // pipeline (backfills are issued per gap RANGE, not per day). A
    // deterministic subset of days is excluded to simulate loss; missing
    // days come from an anti-join against the calendar, and consecutive
    // days collapse into ranges via the islands trick (day minus
    // row_number is constant within a run). All windows are
    // calendar-bounded.
    // Changed-partition detection (Incremental.changedPartitions): which
    // months did a new source generation touch? Current = base minus every
    // 89th order (deletes) with every 97th order's custkey bumped
    // (updates); a month is recomputed only if its content fingerprint
    // moved. The oracle derives the expected statuses in closed form from
    // the same predicates — certifying the detector's OUTPUT (no false
    // changes, no missed changes on this fixture), while the fingerprint
    // mechanics (order-independence, add/remove/change taxonomy) are
    // spec-pinned.
    ("q_incr_changed_partitions",
      (s: SparkSession, d: String) => {
        val base = t(s, d, "orders").select(
          date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_orderkey").cast("long").as("k"),
          col("o_custkey").cast("long").as("ck"),
          col("o_orderstatus"))
        val current = base.filter(col("k") % 89 =!= 0)
          .withColumn("ck", when(col("k") % 97 === 0, col("ck") + 1)
            .otherwise(col("ck")))
        Incremental.changedPartitions(base, current, "month")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
          count(*) AS n_base,
          CAST(sum(CASE WHEN o_orderkey % 89 <> 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_current,
          CASE WHEN sum(CASE WHEN o_orderkey % 89 <> 0 THEN 1 ELSE 0 END)
              = 0 THEN 'removed'
            WHEN max(CASE WHEN o_orderkey % 89 = 0 OR o_orderkey % 97 = 0
              THEN 1 ELSE 0 END) = 1 THEN 'changed'
            ELSE 'unchanged' END AS status
        FROM orders GROUP BY 1""")),

    // Out-of-orderness audit — the measurement that sizes a streaming
    // watermark delay: replay each user's events in ARRIVAL order
    // (event_id) and compare event time against the user's running
    // event-time frontier; an event below the frontier is late, its gap
    // the lateness magnitude. One per-user window (parallel by key),
    // then a combine-enabled rollup per event type: late share and the
    // max/p-ish lateness the watermark must tolerate.
    ("q_incr_out_of_order",
      (s: SparkSession, d: String) => {
        // deterministic arrival perturbation (the fixture's event_id is
        // already time-ordered — unperturbed, the audit is trivially all
        // zeros and the oracle compare proves nothing)
        val w = Window.partitionBy("user_id")
          .orderBy(col("arrival").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .withColumn("arrival",
            col("event_id") + (col("event_id") % 7) * 3)
          .withColumn("frontier", max(col("ts")).over(w))
          .withColumn("late_s",
            when(col("ts") < col("frontier"),
              (unix_timestamp(col("frontier")) - unix_timestamp(col("ts")))
                .cast("long")).otherwise(lit(0L)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
            max("late_s").as("max_late_s"),
            sum("late_s").as("sum_late_s"))
      },
      Some("""WITH e AS (SELECT event_type, ts, user_id, event_id,
            event_id + (event_id % 7) * 3 AS arrival FROM events),
        f AS (SELECT event_type, ts,
            max(ts) OVER (PARTITION BY user_id ORDER BY arrival, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS frontier
          FROM e),
        l AS (SELECT event_type,
            CASE WHEN ts < frontier
              THEN CAST(date_diff('second', ts, frontier) AS BIGINT)
              ELSE 0 END AS late_s
          FROM f)
        SELECT event_type, count(*) AS n_events,
          CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_late,
          CAST(max(late_s) AS BIGINT) AS max_late_s,
          CAST(sum(late_s) AS BIGINT) AS sum_late_s
        FROM l GROUP BY 1""")),

    // Watermark sizing sweep: for candidate watermark delays W, how many
    // events would a streaming job DROP (lateness > W, against the same
    // deterministically perturbed arrival order as q_incr_out_of_order)?
    // The table that turns that audit's lateness stats into the actual
    // sizing decision — pick the smallest W with acceptable loss. ONE
    // pass: the per-user frontier window (domain-bounded), a single
    // conditional aggregate of all five W cells, and a 5-row explode of
    // the one-row result.
    ("q_incr_watermark_sweep",
      (s: SparkSession, d: String) => {
        val ws = Seq(0L, 60L, 300L, 900L, 3600L)
        val w = Window.partitionBy("user_id")
          .orderBy(col("arrival").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = t(s, d, "events")
          .withColumn("arrival",
            col("event_id") + (col("event_id") % 7) * 3)
          .withColumn("frontier", max(col("ts")).over(w))
          .withColumn("late_s",
            when(col("ts") < col("frontier"),
              (unix_timestamp(col("frontier")) - unix_timestamp(col("ts")))
                .cast("long")).otherwise(lit(0L)))
        val aggs = count(lit(1)).as("n") +: ws.map(wm =>
          sum(when(col("late_s") > wm, 1L).otherwise(0L)).as(s"d_$wm"))
        val one = late.agg(aggs.head, aggs.tail: _*)
        one.select(col("n"), explode(array(ws.map(wm =>
            struct(lit(wm).as("watermark_s"),
              col(s"d_$wm").as("n_dropped"))): _*)).as("s"))
          .select(col("s.watermark_s").as("watermark_s"), col("n"),
            col("s.n_dropped").as("n_dropped"),
            floor((col("n") - col("s.n_dropped")).cast("double") *
              lit(1e6) / col("n").cast("double")).cast("long")
              .as("retained_ppm"))
      },
      Some("""WITH e AS (SELECT ts, user_id, event_id,
            event_id + (event_id % 7) * 3 AS arrival FROM events),
        f AS (SELECT ts,
            max(ts) OVER (PARTITION BY user_id ORDER BY arrival, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS frontier
          FROM e),
        l AS (SELECT CASE WHEN ts < frontier
            THEN CAST(date_diff('second', ts, frontier) AS BIGINT)
            ELSE 0 END AS late_s FROM f),
        a AS (SELECT count(*) AS n,
            CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS d_0,
            CAST(sum(CASE WHEN late_s > 60 THEN 1 ELSE 0 END) AS BIGINT)
              AS d_60,
            CAST(sum(CASE WHEN late_s > 300 THEN 1 ELSE 0 END) AS BIGINT)
              AS d_300,
            CAST(sum(CASE WHEN late_s > 900 THEN 1 ELSE 0 END) AS BIGINT)
              AS d_900,
            CAST(sum(CASE WHEN late_s > 3600 THEN 1 ELSE 0 END) AS BIGINT)
              AS d_3600
          FROM l),
        u AS (SELECT CAST(0 AS BIGINT) AS watermark_s, n, d_0 AS n_dropped
            FROM a
          UNION ALL SELECT 60, n, d_60 FROM a
          UNION ALL SELECT 300, n, d_300 FROM a
          UNION ALL SELECT 900, n, d_900 FROM a
          UNION ALL SELECT 3600, n, d_3600 FROM a)
        SELECT watermark_s, n, n_dropped,
          CAST(floor(CAST(n - n_dropped AS DOUBLE) * 1e6
            / CAST(n AS DOUBLE)) AS BIGINT) AS retained_ppm
        FROM u""")),

    // CDC changelog netting (Incremental.netChanges) — the executable form
    // of the reference's DMS CDC apply: a deterministic I/U/D changelog
    // built from orders nets to final row images (last writer wins on the
    // sequence, delete tombstones drop the key) BEFORE any merge replays
    // it. One per-key window, parallel by key; key history per apply
    // window is small by CDC contract.
    ("q_incr_cdc_apply",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(col("o_orderkey").as("id"),
          col("o_orderstatus").as("status"),
          cents(col("o_totalprice")).as("price_cents"))
        val log = o.select(col("id"), lit(1L).as("seq"), lit("I").as("op"),
            col("status"), col("price_cents"))
          .union(o.filter(col("id") % 3 === 0)
            .select(col("id"), lit(2L).as("seq"), lit("U").as("op"),
              lit("X").as("status"),
              (col("price_cents") + 777L).as("price_cents")))
          .union(o.filter(col("id") % 5 === 0)
            .select(col("id"), lit(3L).as("seq"), lit("D").as("op"),
              lit(null).cast("string").as("status"),
              lit(null).cast("long").as("price_cents")))
        Incremental.netChanges(log, Seq("id"), "seq", "op")
      },
      Some(s"""WITH o AS (SELECT o_orderkey AS id,
            o_orderstatus AS status,
            ${centsSql("o_totalprice")} AS price_cents
          FROM orders),
        log AS (
          SELECT id, CAST(1 AS BIGINT) AS seq, 'I' AS op, status,
            price_cents FROM o
          UNION ALL SELECT id, 2, 'U', 'X', price_cents + 777 FROM o
            WHERE id % 3 = 0
          UNION ALL SELECT id, 3, 'D', NULL, NULL FROM o
            WHERE id % 5 = 0),
        r AS (SELECT *, row_number() OVER (PARTITION BY id
            ORDER BY seq DESC) AS rn FROM log)
        SELECT id, seq, op, status, price_cents
        FROM r WHERE rn = 1 AND op <> 'D'""")),

    ("q_incr_backfill",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "events")
        val present = e.filter(dayofmonth(col("ts")) % 7 =!= 3 &&
            !dayofmonth(col("ts")).between(20, 22))
          .select(to_date(col("ts")).as("day")).distinct()
        val cal = e.agg(min(to_date(col("ts"))).as("lo"),
            max(to_date(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val w = Window.orderBy(col("day").asc)
        cal.join(present, Seq("day"), "left_anti")
          .withColumn("rn", row_number().over(w))
          .withColumn("grp", expr("date_sub(day, rn)"))
          .groupBy("grp")
          .agg(date_format(min("day"), "yyyy-MM-dd").as("gap_start"),
            date_format(max("day"), "yyyy-MM-dd").as("gap_end"),
            count(lit(1)).as("n_days"))
          .drop("grp")
      },
      Some("""WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo,
              max(CAST(ts AS DATE)) AS hi FROM events),
          cal AS (SELECT CAST(unnest(generate_series(lo, hi,
            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
          present AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
            WHERE day(ts) % 7 <> 3 AND day(ts) NOT BETWEEN 20 AND 22),
          missing AS (SELECT day,
              day - CAST(row_number() OVER (ORDER BY day) AS INTEGER)
                AS grp
            FROM cal ANTI JOIN present USING (day))
        SELECT strftime(min(day), '%Y-%m-%d') AS gap_start,
          strftime(max(day), '%Y-%m-%d') AS gap_end,
          count(*) AS n_days
        FROM missing GROUP BY grp""")),

    // Trailing-7-day distinct users per day — the sliding count-distinct
    // that has NO incremental form (users leave the window): the
    // scale-correct rewrite explodes each distinct (user, active-day) into
    // its <= 7 covering windows (bounded fan-out, corpus-linear) and
    // re-distincts per window — never a running distinct state, never a
    // per-day rescan. Windows clipped to days with actual activity.
    ("q_agg_sliding_reach",
      (s: SparkSession, d: String) => {
        val e = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val bounds = e.agg(max("day").as("max_day"))
        e.crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(sequence(col("day"),
              least(date_add(col("day"), 6), col("max_day")))).as("w_day"))
          .distinct()
          .groupBy("w_day")
          .agg(count(lit(1)).as("n_users_7d"))
          .select(date_format(col("w_day"), "yyyy-MM-dd").as("day"),
            col("n_users_7d"))
      },
      Some("""WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events),
          b AS (SELECT max(day) AS max_day FROM e),
          w AS (SELECT DISTINCT user_id, day + CAST(o AS INTEGER) AS w_day
            FROM e, b, UNNEST(range(0, 7)) AS u(o)
            WHERE day + CAST(o AS INTEGER) <= max_day)
        SELECT strftime(w_day, '%Y-%m-%d') AS day,
          count(*) AS n_users_7d
        FROM w GROUP BY 1""")),

    // Incremental rollup maintenance: the merged (base-partial + delta-
    // partial) aggregate must equal the full recompute — the algebraic
    // mergeability that lets a 100 TB daily rollup absorb a new partition
    // by combining partials instead of rescanning history. The oracle IS
    // the full recompute, so the hash-match is the maintenance proof.
    ("q_incr_agg_merge",
      (s: SparkSession, d: String) => {
        val split = lit("2024-01-20").cast("timestamp")
        def rollup(df: DataFrame): DataFrame = df
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("value"))).as("value_cents"))
        val e = t(s, d, "events")
        rollup(e.filter(col("ts") < split))
          .unionByName(rollup(e.filter(col("ts") >= split)))
          .groupBy("day", "event_type")
          .agg(sum("n").as("n"), sum("value_cents").as("value_cents"))
      },
      Some(s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
          count(*) AS n,
          CAST(sum(${centsSql(""""value"""")}) AS BIGINT) AS value_cents
        FROM events GROUP BY 1, 2""")),

    // Incremental JOIN-view maintenance — the delta-join algebra:
    //   (A∪ΔA) ⋈ (B∪ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    // The maintained per-priority revenue rollup is the base partial
    // (old⋈old, in production a stored table) merged with the three delta
    // contributions — each delta term joins a DELTA-sized side, so
    // absorbing a batch costs |Δ|-proportional work, never a rescan of
    // history. Deltas are split on INDEPENDENT keys (orders by orderkey,
    // lineitem by linenumber) so every cross term is non-empty and the
    // oracle — the full recompute — certifies the whole algebra.
    ("q_incr_join_delta",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(col("o_orderkey").as("ok"),
          col("o_orderpriority").as("prio"),
          (col("o_orderkey") % 10 === 0).as("dlt"))
        val li = t(s, d, "lineitem").select(col("l_orderkey").as("ok"),
          cents(col("l_extendedprice")).as("rev"),
          (col("l_linenumber") % 3 === 0).as("dlt"))
        def part(a: DataFrame, b: DataFrame): DataFrame =
          a.drop("dlt").join(b.drop("dlt"), "ok")
            .groupBy("prio")
            .agg(count(lit(1)).as("n"), sum("rev").as("rev_cents"))
        val base = part(o.filter(!col("dlt")), li.filter(!col("dlt")))
        val dA = part(o.filter(col("dlt")), li.filter(!col("dlt")))
        val dB = part(o.filter(!col("dlt")), li.filter(col("dlt")))
        val dAB = part(o.filter(col("dlt")), li.filter(col("dlt")))
        base.unionByName(dA).unionByName(dB).unionByName(dAB)
          .groupBy("prio")
          .agg(sum("n").as("n"), sum("rev_cents").as("rev_cents"))
      },
      Some(s"""SELECT o_orderpriority AS prio, count(*) AS n,
          CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS rev_cents
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1""")),

    // Post-backfill reconciliation audit (Recon.diff): the "right" table
    // is orders after a simulated faulty migration — every 97th key
    // dropped, every 89th price drifted one cent, every 101st key
    // re-added under a rogue negative id — and the diff must recover
    // EXACTLY that fault set with per-column drill-down. One full-outer
    // co-partitioned join; matched rows are never emitted (at 100 TB the
    // diff is the output contract, not a table copy).
    ("q_recon_rowdiff",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
          cents(col("o_totalprice")).as("price_cents"),
          col("o_orderstatus").as("ostatus"),
          col("o_orderpriority").as("prio"))
        val right = o.filter(col("k") % 97 =!= 0)
          .withColumn("price_cents", col("price_cents") +
            when(col("k") % 89 === 0, 1L).otherwise(0L))
          .unionByName(o.filter(col("k") % 101 === 0)
            .withColumn("k", -col("k")))
        Recon.diff(o, right, Seq("k"),
          Seq("price_cents", "ostatus", "prio"))
      },
      Some(s"""WITH l AS (SELECT o_orderkey AS k,
            ${centsSql("o_totalprice")} AS price_cents,
            o_orderstatus AS ostatus, o_orderpriority AS prio
          FROM orders),
        r AS (SELECT k, price_cents
              + CASE WHEN k % 89 = 0 THEN 1 ELSE 0 END AS price_cents,
            ostatus, prio FROM l WHERE k % 97 <> 0
          UNION ALL
          SELECT -k, price_cents, ostatus, prio FROM l WHERE k % 101 = 0),
        j AS (SELECT coalesce(l.k, r.k) AS k,
            l.k IS NOT NULL AS lp, r.k IS NOT NULL AS rp,
            l.price_cents AS lpc, r.price_cents AS rpc,
            l.ostatus AS lo, r.ostatus AS ro,
            l.prio AS lpr, r.prio AS rpr
          FROM l FULL OUTER JOIN r ON l.k = r.k),
        o AS (SELECT k,
            CASE WHEN NOT rp THEN 'removed' WHEN NOT lp THEN 'added'
              ELSE 'changed' END AS status,
            CASE WHEN lp AND rp THEN concat_ws(',',
                CASE WHEN lpc IS NOT DISTINCT FROM rpc THEN NULL
                  ELSE 'price_cents' END,
                CASE WHEN lo IS NOT DISTINCT FROM ro THEN NULL
                  ELSE 'ostatus' END,
                CASE WHEN lpr IS NOT DISTINCT FROM rpr THEN NULL
                  ELSE 'prio' END)
              ELSE '' END AS changed_cols
          FROM j)
        SELECT k, status, changed_cols FROM o
        WHERE status <> 'changed' OR changed_cols <> ''""")),

    // Time-series densification: hourly resample (max value per hour) onto
    // each event type's full hour grid, gaps filled by
    // last-observation-carried-forward. The grid is calendar-bounded (hours
    // between first and last event), so the per-type window state never
    // scales with event volume — the corpus-sized work is one
    // combine-enabled hourly aggregate.
    ("q_agg_gapfill",
      (s: SparkSession, d: String) => {
        val hourly = t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(max(col("value")).as("v"))
          .select(col("w.start").as("hour"), col("event_type"), col("v"))
        val grid = hourly.groupBy("event_type")
          .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
          .select(col("event_type"),
            explode(sequence(col("h0"), col("h1"),
              expr("interval 1 hour"))).as("hour"))
        val w = Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("event_type", "hour"), "left_outer")
          .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
          .select(col("event_type"),
            date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("filled"),
            col("v").isNull.cast("long").as("is_gap"))
      },
      Some("""WITH hourly AS (SELECT date_trunc('hour', ts) AS hour,
            event_type, max("value") AS v
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1
          FROM hourly GROUP BY 1),
        grid AS (SELECT event_type,
            unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
        j AS (SELECT g.event_type, g.hour, h.v
          FROM grid g LEFT JOIN hourly h USING (event_type, hour))
        SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
          last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS filled,
          CAST(v IS NULL AS BIGINT) AS is_gap
        FROM j""")),

    // Recency-decayed per-user engagement features — the feature-
    // engineering step of a behavioral/user-model pipeline (recent
    // activity outweighs stale activity). The decay is a POWER-OF-TWO
    // half-life (one halving per 168h week, capped at 40 shifts): value
    // micros are right-shifted by the integer week count, so the entire
    // computation is BIGINT arithmetic — exact, order-independent, and
    // replayed bit-for-bit by the oracle (exp()-based decay would hit the
    // engine-variant-transcendental problem; a shift is the same number
    // everywhere). ONE combine-enabled aggregate after a broadcast of the
    // 1-row corpus max-timestamp; no windows, no per-user state.
    ("q_agg_decay", {
      ((s: SparkSession, d: String) => {
        val ev = t(s, d, "events").select(col("user_id"),
          col("ts").cast("long").as("ep"),
          floor(col("value") * 1e6).cast("long").as("micros"))
        val ref = ev.agg(max(col("ep")).as("ref_ep"))
        ev.crossJoin(broadcast(ref))
          .withColumn("sh", least(
            expr("((ref_ep - ep) div 3600) div 168"), lit(40L)).cast("int"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("micros")).as("raw_sum"),
            sum(expr("shiftright(micros, sh)")).as("dec_sum"),
            sum(expr("shiftright(1000000, sh)").cast("long")).as("dec_n"),
            expr("(max(ref_ep) - max(ep)) div 3600").as("hours_idle"))
          .select(col("user_id"), col("n_events"), col("raw_sum"),
            col("dec_sum"), col("dec_n"), col("hours_idle"),
            (col("dec_sum").cast("double") / 1e6).as("engagement"))
      }): Q
      },
      Some("""WITH ev AS (SELECT user_id,
            epoch_us(ts) // 1000000 AS ep,
            CAST(floor("value" * 1e6) AS BIGINT) AS micros FROM events),
          r AS (SELECT max(ep) AS ref_ep FROM ev),
          d AS (SELECT user_id, ep, micros, ref_ep,
              CAST(least(((ref_ep - ep) // 3600) // 168, 40) AS INT) AS sh
            FROM ev, r)
          SELECT user_id, count(*) AS n_events,
            CAST(sum(micros) AS BIGINT) AS raw_sum,
            CAST(sum(micros >> sh) AS BIGINT) AS dec_sum,
            CAST(sum(1000000 >> sh) AS BIGINT) AS dec_n,
            (max(ref_ep) - max(ep)) // 3600 AS hours_idle,
            CAST(CAST(sum(micros >> sh) AS BIGINT) AS DOUBLE) / 1e6
              AS engagement
          FROM d GROUP BY 1""")),

    // Integer-exact z-score anomaly gate: hourly count cells per event
    // type, flagged when (x*n - s1)^2 > 9*(n*s2 - s1^2) — the 3-sigma test
    // multiplied through by n^2 so every comparison is an exact BIGINT
    ("q_agg_anomaly",
      (s: SparkSession, d: String) => graft.ops.Stats.countAnomalies(
          t(s, d, "events"), Seq("event_type"),
          date_trunc("hour", col("ts")), k = 3)
        .select(col("event_type"),
          date_format(col("cell"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n_rows"), col("n_cells"), col("s1"), col("s2")),
      Some("""WITH cells AS (SELECT event_type,
            date_trunc('hour', ts) AS cell, count(*) AS n_rows
          FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, count(*) AS n_cells,
            CAST(sum(n_rows) AS BIGINT) AS s1,
            CAST(sum(n_rows * n_rows) AS BIGINT) AS s2
          FROM cells GROUP BY 1)
        SELECT c.event_type, strftime(c.cell, '%Y-%m-%d %H:%M:%S') AS hour,
          c.n_rows, m.n_cells, m.s1, m.s2
        FROM cells c JOIN m USING (event_type)
        WHERE (c.n_rows * m.n_cells - m.s1) * (c.n_rows * m.n_cells - m.s1)
          > 9 * (m.n_cells * m.s2 - m.s1 * m.s1)""")),

    // Training-sequence construction (beyond reference): each user's first
    // 20 events, time-ordered with an exact tie-break, as one
    // comma-joined behavioral sequence — the sequence-building step a
    // user-model pipeline feeds a tokenizer. One shuffle: ordered window
    // rank + the groupBy share the (user_id) partitioning; the per-row
    // transform touches <= 20 elements.
    ("q_seq_events",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            array_join(transform(
              array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ",").as("sequence"))
      },
      Some("""WITH r AS (SELECT user_id, event_type,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC) AS rn
          FROM events)
        SELECT user_id, count(*) AS n_events,
          string_agg(event_type, ',' ORDER BY rn) AS sequence
        FROM r WHERE rn <= 20 GROUP BY 1""")),

    // User-journey transition matrix (first-order Markov stats): adjacent
    // event-type pairs within each user's timeline, with the conditional
    // probability of each successor — floor-quantized from exact integer
    // counts. The lead() window is USER-bounded (same state bound as
    // sessionize); the corpus-sized work is one combine-enabled groupBy
    // over (from, to) pairs.
    // Settlement-date assignment (next business day) — the finance-
    // warehouse date op: each order settles on the first weekday after
    // its order date that is not a holiday (fixture holiday list
    // injected as literals). Scale shape: the date→settlement MAPPING is
    // computed once on the CALENDAR-BOUNDED distinct-date × business-day
    // grid (the documented grid-sized benign class) and then broadcast
    // onto the fact scan — the corpus never enters a range join. Output:
    // settlement-lag histogram with exact cents (weekend orders settle
    // Monday → lag 2-3; Friday + holiday-Monday → lag 4).
    ("q_agg_settlement",
      (s: SparkSession, d: String) => {
        val holidays = Seq("1995-05-01", "1996-07-04", "1997-12-25")
        val o = t(s, d, "orders").select(
          col("o_orderdate").cast("date").as("od"),
          cents(col("o_totalprice")).as("v"))
        val dates = o.select(col("od").as("dt")).distinct()
        val span = dates.agg(min("dt").as("mn"), max("dt").as("mx"))
        val cal = span.select(explode(sequence(col("mn"),
            date_add(col("mx"), 10))).as("day"))
          .filter(dayofweek(col("day")).isin(2, 3, 4, 5, 6) &&
            !col("day").cast("string").isin(holidays: _*))
        val mapping = dates.join(cal, col("day") > col("dt"))
          .groupBy("dt").agg(min(col("day")).as("settle"))
        o.join(broadcast(mapping), col("od") === col("dt"))
          .select(datediff(col("settle"), col("od")).cast("long")
            .as("lag_days"), col("v"))
          .groupBy("lag_days")
          .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("cents"))
      },
      Some(s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od,
            ${centsSql("o_totalprice")} AS v FROM orders),
        span AS (SELECT min(od) AS mn, max(od) AS mx FROM o),
        cal AS (SELECT CAST(unnest(range(CAST(mn AS TIMESTAMP),
              CAST(mx + 11 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
            AS day
          FROM span),
        bd AS (SELECT day FROM cal WHERE isodow(day) BETWEEN 1 AND 5
          AND CAST(day AS VARCHAR) NOT IN
            ('1995-05-01', '1996-07-04', '1997-12-25')),
        dates AS (SELECT DISTINCT od AS dt FROM o),
        mapping AS (SELECT dt, min(day) AS settle
          FROM dates JOIN bd ON day > dt GROUP BY 1)
        SELECT CAST(date_diff('day', od, settle) AS BIGINT) AS lag_days,
          CAST(count(*) AS BIGINT) AS n_orders,
          CAST(sum(v) AS BIGINT) AS cents
        FROM o JOIN mapping ON od = dt
        GROUP BY 1""")),

    // RFM segmentation — the classic customer-value cube: per customer
    // Recency (days since last order), Frequency (order count), Monetary
    // (lifetime cents), each binned into global QUINTILES, then the
    // 5×5×5 segment census with per-segment value totals. Quintile bins
    // come from Sampling.curriculumBins' rule (floor(rank·5/n), rank via
    // the two-pass range scan — never a corpus ntile window); recency
    // ranks by ascending last-active day, so most-recent = highest bin.
    // One customer-level aggregate is the only corpus-sized shuffle; the
    // three rank passes run over the already-aggregated customer table.
    ("q_seq_rfm",
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "orders")
          .groupBy(col("o_custkey").as("ck"))
          .agg(max(datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long")).as("last_day"),
            count(lit(1)).as("freq"),
            sum(cents(col("o_totalprice"))).as("money"))
        def bin(src: DataFrame, metric: org.apache.spark.sql.Column,
            name: String): DataFrame =
          Sampling.curriculumBins(
            src.select(col("ck"), metric.as(s"m_$name")),
            orderCols = Seq(s"m_$name", "ck"), bins = 5, binCol = name)
            .select(col("ck"), col(name))
        val r = bin(cust, col("last_day"), "r_bin")
        val f = bin(cust, col("freq"), "f_bin")
        val m = bin(cust, col("money"), "m_bin")
        cust.join(r, "ck").join(f, "ck").join(m, "ck")
          .groupBy("r_bin", "f_bin", "m_bin")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("money")).as("segment_cents"))
      },
      Some(s"""WITH cust AS (SELECT o_custkey AS ck,
            max(date_diff('day', DATE '1970-01-01',
              CAST(o_orderdate AS DATE))) AS last_day,
            CAST(count(*) AS BIGINT) AS freq,
            CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS money,
            count(*) OVER () AS n
          FROM orders GROUP BY 1),
        r AS (SELECT ck, CAST(floor(CAST((row_number() OVER (
              ORDER BY last_day, ck) - 1) * 5 AS DOUBLE) / n) AS BIGINT)
            AS r_bin FROM cust),
        f AS (SELECT ck, CAST(floor(CAST((row_number() OVER (
              ORDER BY freq, ck) - 1) * 5 AS DOUBLE) / n) AS BIGINT)
            AS f_bin FROM cust),
        m AS (SELECT ck, CAST(floor(CAST((row_number() OVER (
              ORDER BY money, ck) - 1) * 5 AS DOUBLE) / n) AS BIGINT)
            AS m_bin FROM cust)
        SELECT r_bin, f_bin, m_bin,
          CAST(count(*) AS BIGINT) AS n_customers,
          CAST(sum(money) AS BIGINT) AS segment_cents
        FROM cust JOIN r USING (ck) JOIN f USING (ck) JOIN m USING (ck)
        GROUP BY 1, 2, 3""")),

    // Sequential pattern mining (the PrefixSpan/GSP family, bounded):
    // support of every WITH-GAPS ordered 3-subsequence over each user's
    // first 8 events — "view … cart … purchase counts even with browsing
    // in between", which q_seq_transitions' contiguous bigrams cannot
    // see. The per-user event cap bounds the triple fan-out at C(8,3) =
    // 56 rows/user (the structural guard — unbounded sequences make this
    // family quadratic-plus); the triple generation is two user-keyed
    // equi self-joins with rank inequalities INSIDE one partitioning;
    // support = distinct users, combine-enabled. Patterns ranked by
    // support with a deterministic tie order.
    ("q_seq_patterns",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val ev = t(s, d, "events")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 8)
          .select(col("user_id").as("u"), col("rk"),
            col("event_type").as("e"))
        val a = ev.select(col("u"), col("rk").as("r1"), col("e").as("e1"))
        val b = ev.select(col("u"), col("rk").as("r2"), col("e").as("e2"))
        val c = ev.select(col("u"), col("rk").as("r3"), col("e").as("e3"))
        a.join(b, Seq("u")).filter(col("r1") < col("r2"))
          .join(c, Seq("u")).filter(col("r2") < col("r3"))
          .groupBy("e1", "e2", "e3")
          .agg(countDistinct(col("u")).as("support"),
            count(lit(1)).as("n_occurrences"))
      },
      Some("""WITH r AS (SELECT user_id AS u, event_type AS e,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC) AS rk
          FROM events),
        ev AS (SELECT u, rk, e FROM r WHERE rk <= 8)
        SELECT a.e AS e1, b.e AS e2, c.e AS e3,
          CAST(count(DISTINCT a.u) AS BIGINT) AS support,
          CAST(count(*) AS BIGINT) AS n_occurrences
        FROM ev a JOIN ev b ON a.u = b.u AND a.rk < b.rk
        JOIN ev c ON b.u = c.u AND b.rk < c.rk
        GROUP BY 1, 2, 3""")),

    ("q_seq_transitions",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val tr = t(s, d, "events")
          .withColumn("next", lead(col("event_type"), 1).over(w))
          .filter(col("next").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val outTotals = tr.groupBy("from_type").agg(sum(col("n")).as("tot"))
        tr.join(broadcast(outTotals), Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            (floor(col("n").cast("double") / col("tot").cast("double") * 1e6)
              / 1e6).as("p_next"))
      },
      Some("""WITH r AS (SELECT user_id, event_type, lead(event_type) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next
          FROM events),
        tr AS (SELECT event_type AS from_type, next AS to_type,
            count(*) AS n
          FROM r WHERE next IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
          FROM tr GROUP BY 1)
        SELECT from_type, to_type, n,
          floor(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6) / 1e6 AS p_next
        FROM tr JOIN tot USING (from_type)""")),

    // Markov-chain analysis of the event stream: Laplace-smoothed
    // transition matrix + 3-round integer power iteration toward the
    // stationary distribution — "where do user journeys spend their
    // time" as one deterministic number per state. The corpus collapses
    // to the (event-type x event-type) count matrix first (the
    // vocabulary-bounded table); smoothing fills the zero cells, so even
    // absorbing/unseen states get the uniform row. All arithmetic is
    // BIGINT fixed-point (probabilities in ppm, mass at 1e12 scale,
    // per-term floor division) — replayable bit-for-bit by the oracle's
    // unrolled round CTEs.
    ("q_seq_markov",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val tr = t(s, d, "events")
          .withColumn("next", lead(col("event_type"), 1).over(w))
          .filter(col("next").isNotNull)
          .groupBy(col("event_type").as("tsrc"), col("next").as("tdst"))
          .agg(count(lit(1)).as("c"))
          // lazy cut (r13): tr is read by both state arms, tot and the
          // matrix join — one corpus window pass instead of ~6
          .localCheckpoint(false)
        val states = tr.select(col("tsrc").as("st"))
          .union(tr.select(col("tdst").as("st"))).distinct()
          .localCheckpoint(false)
        val kdf = states.agg(count(lit(1)).as("k"))
        val tot = tr.groupBy(col("tsrc").as("osrc"))
          .agg(sum("c").as("tot"))
        val m = broadcast(states.select(col("st").as("msrc")))
          .crossJoin(broadcast(states.select(col("st").as("mdst"))))
          .join(tr, col("msrc") === col("tsrc") &&
            col("mdst") === col("tdst"), "left")
          .join(broadcast(tot), col("msrc") === col("osrc"), "left")
          .crossJoin(broadcast(kdf))
          .select(col("msrc"), col("mdst"),
            expr("(coalesce(c, 0L) + 1) * 1000000L div " +
              "(coalesce(tot, 0L) + k)").as("p"))
          // the k²-row matrix is referenced every round: cut it once
          // (lazily — compute-once via the checkpoint cache)
          .localCheckpoint(false)
        var v = states.crossJoin(broadcast(kdf))
          .select(col("st"), expr("1000000000000L div k").as("v"))
        for (_ <- 1 to 3) {
          v = v.join(m, col("st") === col("msrc"))
            .groupBy(col("mdst"))
            .agg(sum(expr("v * p div 1000000L")).as("v"))
            .select(col("mdst").as("st"), col("v"))
        }
        states.join(broadcast(tot), col("st") === col("osrc"), "left")
          .join(v, Seq("st"))
          .select(col("st"), coalesce(col("tot"), lit(0L)).as("n_out"),
            col("v").as("v_scaled"))
      },
      Some("""WITH r AS (SELECT user_id, event_type, lead(event_type) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next
          FROM events),
        tr AS (SELECT event_type AS tsrc, next AS tdst, count(*) AS c
          FROM r WHERE next IS NOT NULL GROUP BY 1, 2),
        st AS (SELECT DISTINCT s AS st FROM (SELECT tsrc AS s FROM tr
          UNION ALL SELECT tdst FROM tr)),
        k AS (SELECT count(*) AS k FROM st),
        tot AS (SELECT tsrc AS osrc, CAST(sum(c) AS BIGINT) AS tot
          FROM tr GROUP BY 1),
        m AS (SELECT a.st AS msrc, b.st AS mdst,
            CAST((COALESCE(c, 0) + 1) * 1000000
              // (COALESCE(tot, 0) + k) AS BIGINT) AS p
          FROM st a CROSS JOIN st b CROSS JOIN k
          LEFT JOIN tr ON tr.tsrc = a.st AND tr.tdst = b.st
          LEFT JOIN tot ON tot.osrc = a.st),
        v0 AS (SELECT st, CAST(1000000000000 // k AS BIGINT) AS v
          FROM st, k),
        v1 AS (SELECT mdst AS st, CAST(sum(v * p // 1000000) AS BIGINT)
          AS v FROM v0 JOIN m ON v0.st = m.msrc GROUP BY 1),
        v2 AS (SELECT mdst AS st, CAST(sum(v * p // 1000000) AS BIGINT)
          AS v FROM v1 JOIN m ON v1.st = m.msrc GROUP BY 1),
        v3 AS (SELECT mdst AS st, CAST(sum(v * p // 1000000) AS BIGINT)
          AS v FROM v2 JOIN m ON v2.st = m.msrc GROUP BY 1)
        SELECT st, COALESCE(tot, 0) AS n_out, v AS v_scaled
        FROM st LEFT JOIN tot ON st.st = tot.osrc
        JOIN v3 USING (st)""")),

    // Markov next-event prediction, EVALUATED: train the argmax-next
    // table on even user_ids, score it on odd users' transitions —
    // per-state predicted event, held-out hit count, and accuracy. The
    // baseline every sequence model must beat, with the train/test
    // split that makes the number honest (self-scoring a majority-class
    // predictor is circular). The predictor table is vocabulary-bounded
    // (argmax via a 25-row window); scoring is one broadcast join over
    // the held-out transition counts.
    // Model-order selection for the sequence baseline: FIRST- vs
    // SECOND-order Markov next-event predictors trained on even users,
    // scored on held-out odd users, side by side. The order-2 state
    // space is vocabulary² (25 contexts — domain-bounded); contexts
    // unseen in training fall back to the order-1 prediction (the
    // standard backoff), so both rows score every held-out transition
    // and the accuracy gap is the honest value of the extra state.
    ("q_seq_markov2",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val tr = t(s, d, "events")
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .withColumn("next", lead(col("event_type"), 1).over(w))
          .filter(col("next").isNotNull)
          .select(col("user_id"), coalesce(col("prev"), lit("^")).as("p2"),
            col("event_type").as("p1"), col("next").as("nx"))
          // lazy cut (r13): tr feeds both predictor builds and the
          // held-out side — one double-window corpus pass instead of 4
          .localCheckpoint(false)
        val train = tr.filter(col("user_id") % 2 === 0)
        val pred1 = train.groupBy("p1", "nx")
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(Window.partitionBy("p1")
            .orderBy(col("c").desc, col("nx").asc)))
          .filter(col("rn") === 1)
          .select(col("p1"), col("nx").as("pr1"))
        val pred2 = train.groupBy("p2", "p1", "nx")
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("p2", "p1")
              .orderBy(col("c").desc, col("nx").asc)))
          .filter(col("rn") === 1)
          .select(col("p2"), col("p1"), col("nx").as("pr2"))
        val eval_ = tr.filter(col("user_id") % 2 === 1)
          .groupBy("p2", "p1", "nx").agg(count(lit(1)).as("n"))
          .join(broadcast(pred1), Seq("p1"), "left")
          .join(broadcast(pred2), Seq("p2", "p1"), "left")
          .withColumn("pr2b", coalesce(col("pr2"), col("pr1")))
          // lazy cut: both union arms score off this one table
          .localCheckpoint(false)
        eval_.select(lit(1L).as("model_order"),
            col("n"),
            when(col("nx") === col("pr1"), col("n")).otherwise(0L)
              .as("hit"))
          .union(eval_.select(lit(2L).as("model_order"), col("n"),
            when(col("nx") === col("pr2b"), col("n")).otherwise(0L)
              .as("hit")))
          .groupBy("model_order")
          .agg(sum("n").as("n_eval"), sum("hit").as("n_correct"))
          .withColumn("acc_ppm",
            expr("n_correct * 1000000L div n_eval"))
      },
      Some("""WITH r AS (SELECT user_id,
            coalesce(lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC), '^') AS p2,
            event_type AS p1,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC) AS nx
          FROM events),
        tr AS (SELECT user_id, p2, p1, nx FROM r WHERE nx IS NOT NULL),
        train AS (SELECT * FROM tr WHERE user_id % 2 = 0),
        pred1 AS (SELECT p1, nx AS pr1 FROM (
            SELECT p1, nx, row_number() OVER (PARTITION BY p1
              ORDER BY count(*) DESC, nx ASC) AS rn
            FROM train GROUP BY p1, nx) WHERE rn = 1),
        pred2 AS (SELECT p2, p1, nx AS pr2 FROM (
            SELECT p2, p1, nx, row_number() OVER (PARTITION BY p2, p1
              ORDER BY count(*) DESC, nx ASC) AS rn
            FROM train GROUP BY p2, p1, nx) WHERE rn = 1),
        ev AS (SELECT e.p2, e.p1, e.nx, count(*) AS n,
            any_value(pred1.pr1) AS pr1,
            any_value(coalesce(pred2.pr2, pred1.pr1)) AS pr2b
          FROM tr e
          LEFT JOIN pred1 ON pred1.p1 = e.p1
          LEFT JOIN pred2 ON pred2.p2 = e.p2 AND pred2.p1 = e.p1
          WHERE e.user_id % 2 = 1
          GROUP BY 1, 2, 3),
        u AS (
          SELECT CAST(1 AS BIGINT) AS model_order, n,
            CASE WHEN nx = pr1 THEN n ELSE 0 END AS hit FROM ev
          UNION ALL
          SELECT CAST(2 AS BIGINT), n,
            CASE WHEN nx = pr2b THEN n ELSE 0 END FROM ev)
        SELECT model_order, CAST(sum(n) AS BIGINT) AS n_eval,
          CAST(sum(hit) AS BIGINT) AS n_correct,
          CAST(sum(hit) * 1000000 // sum(n) AS BIGINT) AS acc_ppm
        FROM u GROUP BY 1""")),

    ("q_seq_markov_eval",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val tr = t(s, d, "events")
          .withColumn("next", lead(col("event_type"), 1).over(w))
          .filter(col("next").isNotNull)
          .select(col("user_id"), col("event_type").as("from_type"),
            col("next").as("to_type"))
        val train = tr.filter(col("user_id") % 2 === 0)
          .groupBy("from_type", "to_type").agg(count(lit(1)).as("c"))
        val pred = train.withColumn("rn", row_number().over(
            Window.partitionBy("from_type")
              .orderBy(col("c").desc, col("to_type").asc)))
          .filter(col("rn") === 1)
          .select(col("from_type"), col("to_type").as("predicted"))
        val eval_ = tr.filter(col("user_id") % 2 === 1)
          .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        eval_.join(broadcast(pred), Seq("from_type"))
          .groupBy("from_type")
          .agg(first(col("predicted")).as("predicted"),
            sum("n").as("n_eval"),
            sum(when(col("to_type") === col("predicted"), col("n"))
              .otherwise(0L)).as("n_correct"))
          .select(col("from_type"), col("predicted"), col("n_eval"),
            col("n_correct"),
            floor(col("n_correct").cast("double") * lit(1e6) /
              col("n_eval").cast("double")).cast("long").as("acc_ppm"))
      },
      Some("""WITH r AS (SELECT user_id, event_type, lead(event_type)
            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            AS next FROM events),
        tr AS (SELECT user_id, event_type AS from_type, next AS to_type
          FROM r WHERE next IS NOT NULL),
        train AS (SELECT from_type, to_type, count(*) AS c FROM tr
          WHERE user_id % 2 = 0 GROUP BY 1, 2),
        pred AS (SELECT from_type, to_type AS predicted FROM (
            SELECT from_type, to_type, row_number() OVER (
              PARTITION BY from_type ORDER BY c DESC, to_type ASC) AS rn
            FROM train) WHERE rn = 1),
        ev AS (SELECT from_type, to_type, count(*) AS n FROM tr
          WHERE user_id % 2 = 1 GROUP BY 1, 2)
        SELECT from_type, any_value(predicted) AS predicted,
          CAST(sum(n) AS BIGINT) AS n_eval,
          CAST(sum(CASE WHEN to_type = predicted THEN n ELSE 0 END)
            AS BIGINT) AS n_correct,
          CAST(floor(CAST(sum(CASE WHEN to_type = predicted THEN n
              ELSE 0 END) AS DOUBLE) * 1e6
            / CAST(sum(n) AS DOUBLE)) AS BIGINT) AS acc_ppm
        FROM ev JOIN pred USING (from_type) GROUP BY 1""")),

    // Absorption probability: per state, the probability a user journey
    // REACHES 'purchase' within 4 steps under the smoothed Markov chain
    // — the "conversion potential" of each funnel state (where
    // q_seq_markov asks where journeys settle, this asks whether they
    // convert first). Same vocabulary-bounded matrix; backward fixed-
    // point in exact ppm BIGINT (p(purchase) pinned at 1e6, per-term
    // floor division), unrolled in the oracle.
    ("q_seq_absorption",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val tr = t(s, d, "events")
          .withColumn("next", lead(col("event_type"), 1).over(w))
          .filter(col("next").isNotNull)
          .groupBy(col("event_type").as("tsrc"), col("next").as("tdst"))
          .agg(count(lit(1)).as("c"))
          // lazy cut (r13): tr is read by both state arms, tot and the
          // matrix join — one corpus window pass instead of ~6
          .localCheckpoint(false)
        val states = tr.select(col("tsrc").as("st"))
          .union(tr.select(col("tdst").as("st"))).distinct()
          .localCheckpoint(false)
        val kdf = states.agg(count(lit(1)).as("k"))
        val tot = tr.groupBy(col("tsrc").as("osrc"))
          .agg(sum("c").as("tot"))
        val m = broadcast(states.select(col("st").as("msrc")))
          .crossJoin(broadcast(states.select(col("st").as("mdst"))))
          .join(tr, col("msrc") === col("tsrc") &&
            col("mdst") === col("tdst"), "left")
          .join(broadcast(tot), col("msrc") === col("osrc"), "left")
          .crossJoin(broadcast(kdf))
          .select(col("msrc"), col("mdst"),
            expr("(coalesce(c, 0L) + 1) * 1000000L div " +
              "(coalesce(tot, 0L) + k)").as("p"))
          // the k²-row matrix is referenced every round: cut it once
          // (lazily — compute-once via the checkpoint cache)
          .localCheckpoint(false)
        var v = states.select(col("st"),
          when(col("st") === "purchase", 1000000L).otherwise(0L).as("v"))
        for (_ <- 1 to 4) {
          v = states.select(col("st").as("msrc"))
            .join(m, Seq("msrc"))
            .join(v.select(col("st").as("mdst"), col("v")), Seq("mdst"))
            .groupBy(col("msrc"))
            .agg(sum(expr("p * v div 1000000L")).as("v0"))
            .select(col("msrc").as("st"),
              when(col("st") === "purchase", 1000000L)
                .otherwise(col("v0")).as("v"))
        }
        states.join(broadcast(tot), col("st") === col("osrc"), "left")
          .join(v, Seq("st"))
          .select(col("st"), coalesce(col("tot"), lit(0L)).as("n_out"),
            col("v").as("p_reach_ppm"))
      },
      Some("""WITH r AS (SELECT user_id, event_type, lead(event_type) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next
          FROM events),
        tr AS (SELECT event_type AS tsrc, next AS tdst, count(*) AS c
          FROM r WHERE next IS NOT NULL GROUP BY 1, 2),
        st AS (SELECT DISTINCT s AS st FROM (SELECT tsrc AS s FROM tr
          UNION ALL SELECT tdst FROM tr)),
        k AS (SELECT count(*) AS k FROM st),
        tot AS (SELECT tsrc AS osrc, CAST(sum(c) AS BIGINT) AS tot
          FROM tr GROUP BY 1),
        m AS (SELECT a.st AS msrc, b.st AS mdst,
            CAST((COALESCE(c, 0) + 1) * 1000000
              // (COALESCE(tot, 0) + k) AS BIGINT) AS p
          FROM st a CROSS JOIN st b CROSS JOIN k
          LEFT JOIN tr ON tr.tsrc = a.st AND tr.tdst = b.st
          LEFT JOIN tot ON tot.osrc = a.st),
        v0 AS (SELECT st, CASE WHEN st = 'purchase'
            THEN CAST(1000000 AS BIGINT) ELSE 0 END AS v FROM st),
        v1 AS (SELECT msrc AS st, CASE WHEN msrc = 'purchase'
            THEN CAST(1000000 AS BIGINT)
            ELSE CAST(sum(p * v // 1000000) AS BIGINT) END AS v
          FROM m JOIN v0 ON v0.st = m.mdst GROUP BY 1),
        v2 AS (SELECT msrc AS st, CASE WHEN msrc = 'purchase'
            THEN CAST(1000000 AS BIGINT)
            ELSE CAST(sum(p * v // 1000000) AS BIGINT) END AS v
          FROM m JOIN v1 ON v1.st = m.mdst GROUP BY 1),
        v3 AS (SELECT msrc AS st, CASE WHEN msrc = 'purchase'
            THEN CAST(1000000 AS BIGINT)
            ELSE CAST(sum(p * v // 1000000) AS BIGINT) END AS v
          FROM m JOIN v2 ON v2.st = m.mdst GROUP BY 1),
        v4 AS (SELECT msrc AS st, CASE WHEN msrc = 'purchase'
            THEN CAST(1000000 AS BIGINT)
            ELSE CAST(sum(p * v // 1000000) AS BIGINT) END AS v
          FROM m JOIN v3 ON v3.st = m.mdst GROUP BY 1)
        SELECT st, COALESCE(tot, 0) AS n_out, v AS p_reach_ppm
        FROM st LEFT JOIN tot ON st.st = tot.osrc
        JOIN v4 USING (st)""")),

    // Markov removal-effect attribution (Anderl et al. 2016 — the
    // data-driven alternative to last-touch/U-shaped): journeys =
    // user sequences split at each purchase, states = start ∪ channels ∪
    // {purchase, null}. Base conversion probability = P(start reaches
    // purchase within 6 steps) under the exact-ppm transition matrix;
    // removing channel c kills every walk that enters c (v(c) pinned 0
    // each round — node removal in the within-N-steps formulation needs
    // no matrix edit). Credit share = removal effect / Σ effects, exact
    // floor-ppm. ONE pass over events builds all transition arms (explode
    // of a per-row filtered array in the scan stage); the k²-bounded
    // matrix is checkpointed once and reused by all 5 fixed-point chains
    // (5 × 6 rounds of broadcast-size joins — no further corpus scans).
    ("q_seq_attribution_markov",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val channels = Seq("click", "error", "signup", "view")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val tr = t(s, d, "events")
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .withColumn("next", lead(col("event_type"), 1).over(w))
          .select(explode(expr("""filter(array(
              IF(prev IS NULL OR prev = 'purchase',
                 named_struct('tsrc', 'start', 'tdst', event_type), NULL),
              IF(event_type <> 'purchase',
                 named_struct('tsrc', event_type,
                              'tdst', coalesce(next, 'null')), NULL)),
            x -> x IS NOT NULL)""")).as("e"))
          .select(col("e.tsrc"), col("e.tdst"))
          .groupBy("tsrc", "tdst").agg(count(lit(1)).as("c"))
        // row-sum via a window over the k²-bounded transition table, not
        // a groupBy+self-join: the join form evaluated `tr` — and with it
        // the full events window pass — once per join side inside the
        // checkpoint job (r13; one corpus pass instead of two)
        val m = tr.withColumn("tot",
            sum("c").over(Window.partitionBy("tsrc")))
          .select(col("tsrc"), col("tdst"),
            expr("c * 1000000L div tot").as("p"))
          .localCheckpoint()
        val stDf = ("start" +: channels :+ "purchase" :+ "null").toDF("st")
        // ALL five fixed-point chains (base + one per removed channel)
        // advance together in ONE keyed table — (variant, state) is at
        // most 5 x 7 rows, so each round is a single broadcast-size join
        // instead of five parallel chain DAGs re-planning the same step
        val variants = ("base" +: channels).toDF("variant")
        val grid = variants.crossJoin(stDf)
        var v = grid.select(col("variant"), col("st"),
          when(col("st") === "purchase", 1000000L).otherwise(0L).as("v"))
        for (_ <- 1 to 6) {
          val step = v.select(col("variant"), col("st").as("tdst"),
              col("v").as("vd"))
            .join(m, "tdst")
            .groupBy(col("variant"), col("tsrc").as("st"))
            .agg(sum(expr("p * vd div 1000000L")).as("v0"))
          v = grid.join(step, Seq("variant", "st"), "left")
            .select(col("variant"), col("st"),
              when(col("st") === "purchase", 1000000L)
                .otherwise(when(col("st") === col("variant"), 0L)
                  .otherwise(coalesce(col("v0"), lit(0L)))).as("v"))
        }
        val atStart = v.filter(col("st") === "start")
        val base = atStart.filter(col("variant") === "base")
          .select(col("v").as("pb"))
        val rem = atStart.filter(col("variant") =!= "base")
          .select(col("variant").as("channel"), col("v").as("pr"))
        val re = rem.crossJoin(broadcast(base))
          .withColumn("re_ppm",
            expr("(pb - pr) * 1000000L div greatest(pb, 1L)"))
        val totRe = re.agg(greatest(sum("re_ppm"), lit(1L)).as("tre"))
        re.crossJoin(broadcast(totRe))
          .select(col("channel"), col("pb").as("p_base_ppm"),
            col("pr").as("p_removed_ppm"),
            col("re_ppm").as("removal_effect_ppm"),
            expr("re_ppm * 1000000L div tre").as("credit_ppm"))
      },
      Some(markovAttributionSql(Seq("click", "error", "signup", "view"),
        6))),

    // Exact Shapley-value attribution over journey channel SETS — the
    // third leg of the attribution suite (heuristic U-shaped, model-based
    // Markov removal, game-theoretic Shapley). The characteristic
    // function v(S) = conversion rate of journeys whose touched-channel
    // set ⊆ S (exact ppm); with 4 channels the subset lattice is 16 rows,
    // so φ_i = Σ_S |S|!(3−|S|)!·(v(S∪i)−v(S)) is a broadcast-size join
    // after ONE corpus pass (journey split + bit_or mask + 16-row
    // census). Credits are in ppm·24 units (weights kept as exact 24ths
    // — no rational rounding); φ can be negative (a channel whose
    // presence predicts NOT converting earns negative credit).
    ("q_seq_attribution_shapley",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val j = t(s, d, "events")
          .withColumn("jid", coalesce(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .over(w), lit(0L)))
          .groupBy("user_id", "jid")
          .agg(expr("bit_or(CASE event_type WHEN 'click' THEN 1 " +
            "WHEN 'error' THEN 2 WHEN 'signup' THEN 4 " +
            "WHEN 'view' THEN 8 ELSE 0 END)").as("mask"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("conv"))
        val tmask = j.groupBy("mask")
          .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        val allm = s.range(16).select(col("id").as("m"))
        val v = broadcast(allm)
          .join(broadcast(tmask), expr("(mask & m) = mask"), "left")
          .groupBy("m")
          .agg(coalesce(sum("n"), lit(0L)).as("n"),
            coalesce(sum("c"), lit(0L)).as("c"))
          .withColumn("v_ppm",
            expr("CASE WHEN n = 0 THEN 0L ELSE c * 1000000L div n END"))
        val ch = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
          ("view", 8L)).toDF("channel", "bit")
        broadcast(ch).join(broadcast(allm), expr("(m & bit) = 0"))
          .join(broadcast(v.select(col("m").as("sm"),
            col("v_ppm").as("vs"))), col("m") === col("sm"))
          .join(broadcast(v.select(col("m").as("im"),
            col("v_ppm").as("vi"))), expr("im = (m | bit)"))
          .withColumn("w24", expr("CASE bit_count(m) WHEN 0 THEN 6L " +
            "WHEN 1 THEN 2L WHEN 2 THEN 2L ELSE 6L END"))
          .groupBy("channel")
          .agg(sum(expr("w24 * (vi - vs)")).as("phi_ppm24"),
            sum(expr("CASE WHEN vi > vs THEN w24 * (vi - vs) ELSE 0L END"))
              .as("phi_pos_ppm24"))
      },
      Some("""WITH r AS (SELECT user_id, event_type,
            coalesce(count(CASE WHEN event_type = 'purchase' THEN 1 END)
              OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS jid
          FROM events),
        j AS (SELECT user_id, jid,
            bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM r GROUP BY 1, 2),
        tmask AS (SELECT mask, count(*) AS n, sum(conv) AS c FROM j
          GROUP BY 1),
        allm AS (SELECT unnest(range(0, 16)) AS m),
        v AS (SELECT allm.m, coalesce(sum(t.n), 0) AS n,
            coalesce(sum(t.c), 0) AS c,
            CASE WHEN coalesce(sum(t.n), 0) = 0 THEN 0
                 ELSE coalesce(sum(t.c), 0) * 1000000
                   // coalesce(sum(t.n), 0) END AS v_ppm
          FROM allm LEFT JOIN tmask t ON (t.mask & allm.m) = t.mask
          GROUP BY 1),
        ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
          ('signup', 4), ('view', 8)) AS c(channel, bit)),
        terms AS (SELECT ch.channel,
            CASE bit_count(s.m) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
              ELSE 6 END AS w24,
            vi.v_ppm - vs.v_ppm AS gain
          FROM ch JOIN allm s ON (s.m & ch.bit) = 0
          JOIN v vs ON vs.m = s.m
          JOIN v vi ON vi.m = (s.m | ch.bit))
        SELECT channel, CAST(sum(w24 * gain) AS BIGINT) AS phi_ppm24,
          CAST(sum(CASE WHEN gain > 0 THEN w24 * gain ELSE 0 END)
            AS BIGINT) AS phi_pos_ppm24
        FROM terms GROUP BY 1""")),

    // Last-touch conversion attribution: each purchase credits the user's
    // most recent PRIOR click/view (conversions with no prior touch fall
    // into the 'organic' bucket). The carry-forward is a per-user window
    // (state bounded by one user's history — the accepted domain-bounded
    // class, same as q_seq_transitions); revenue sums in exact BIGINT
    // cents with a total (ts, event_id) tie order.
    ("q_seq_attribution",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .withColumn("touch",
            last(when(col("event_type").isin("click", "view"),
              col("event_type")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("touch"), lit("organic")).as("touch"))
          .agg(count(lit(1)).as("n_conversions"),
            (sum(cents(col("value"))) / lit(100.0)).as("revenue"))
      },
      Some(s"""WITH r AS (SELECT event_type, "value",
            last_value(CASE WHEN event_type IN ('click', 'view')
                THEN event_type END IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
          FROM events)
        SELECT coalesce(touch, 'organic') AS touch,
          count(*) AS n_conversions,
          CAST(sum(${centsSql(""""value"""")}) AS BIGINT) / 100.0 AS revenue
        FROM r WHERE event_type = 'purchase' GROUP BY 1""")),

    // Position-based (U-shaped) multi-touch attribution — the fractional
    // counterpart of q_seq_attribution's winner-take-all last touch:
    // journeys are the touch runs between purchases (journey id = count
    // of purchases strictly before the row), and each converting
    // journey's credit splits 40/20/40 (first / middles / last; 1 touch
    // = 100%, 2 touches = 50/50). Credit is EXACT ppm BIGINT — middles
    // get floor(200000/(n-2)) and the first middle absorbs the
    // remainder, so every journey sums to exactly 1,000,000 ppm (the
    // audit invariant fractional attribution must hold or double-counts
    // revenue). All windows partition by user (user-bounded, the seq
    // family's policy); credited revenue = Σ credit·value_cents in
    // ppm-cents, exact.
    ("q_seq_attribution_position",
      (s: SparkSession, d: String) => {
        val wj = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = t(s, d, "events")
          .withColumn("j", coalesce(sum(
            when(col("event_type") === "purchase", 1L)).over(wj), lit(0L)))
        val wt = Window.partitionBy("user_id", "j")
          .orderBy(col("ts").asc, col("event_id").asc)
        val wn = Window.partitionBy("user_id", "j")
        val touches = ev
          .filter(col("event_type").isin("click", "view"))
          .withColumn("idx", row_number().over(wt).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("j"),
            cents(col("value")).as("conv_cents"))
        // Spark's `/` on longs is DOUBLE division — take the exact
        // integer quotient via a double floor (operands < 2^53)
        val mid = floor(lit(200000.0) /
          (col("n") - 2L).cast("double")).cast("long")
        val rem = lit(200000L) % (col("n") - 2L)
        val credit =
          when(col("n") === 1, lit(1000000L))
            .when(col("n") === 2, lit(500000L))
            .when(col("idx") === 1 || col("idx") === col("n"),
              lit(400000L))
            .otherwise(mid + when(col("idx") === 2, rem).otherwise(0L))
        touches.join(conv, Seq("user_id", "j"))
          .select(col("event_type").as("touch"),
            credit.as("credit_ppm"), col("conv_cents"))
          .groupBy("touch")
          .agg(count(lit(1)).as("n_touches"),
            sum(col("credit_ppm")).as("conversions_ppm"),
            sum(col("credit_ppm") * col("conv_cents"))
              .as("revenue_ppm_cents"))
      },
      Some(s"""WITH ev AS (SELECT user_id, event_id, ts, event_type,
            ${centsSql(""""value"""")} AS v_cents,
            COALESCE(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
              END) OVER (PARTITION BY user_id ORDER BY ts ASC,
              event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
              1 PRECEDING) AS BIGINT), 0) AS j
          FROM events),
        touches AS (SELECT user_id, j, event_type,
            CAST(row_number() OVER (PARTITION BY user_id, j
              ORDER BY ts ASC, event_id ASC) AS BIGINT) AS idx,
            CAST(count(*) OVER (PARTITION BY user_id, j) AS BIGINT) AS n
          FROM ev WHERE event_type IN ('click', 'view')),
        conv AS (SELECT user_id, j, v_cents AS conv_cents FROM ev
          WHERE event_type = 'purchase'),
        credited AS (SELECT event_type AS touch,
            CASE WHEN n = 1 THEN 1000000
                 WHEN n = 2 THEN 500000
                 WHEN idx = 1 OR idx = n THEN 400000
                 ELSE CAST(200000 // (n - 2) AS BIGINT) +
                   CASE WHEN idx = 2
                     THEN CAST(200000 % (n - 2) AS BIGINT)
                     ELSE 0 END
            END AS credit_ppm, conv_cents
          FROM touches JOIN conv USING (user_id, j))
        SELECT touch, count(*) AS n_touches,
          CAST(sum(credit_ppm) AS BIGINT) AS conversions_ppm,
          CAST(sum(credit_ppm * conv_cents) AS BIGINT)
            AS revenue_ppm_cents
        FROM credited GROUP BY 1""")),

    // Per-user training-feature assembly — the behavioral flagship
    // composition (the events-side q_curate_pack): activity stats,
    // first/last/favorite event type and the shift-decayed engagement sum
    // joined into ONE wide feature table. Every ordered pick is a
    // min/max(struct(...)) aggregate with a total tie order (ep, event_id
    // unique; favorite ties break on type) — NO windows over the corpus
    // stream; three combine-enabled user-keyed aggregates + two user-keyed
    // joins that AQE co-partitions.
    ("q_seq_user_profile", {
      ((s: SparkSession, d: String) => {
        val ev = t(s, d, "events").select(col("user_id"),
          col("event_id").as("eid"), col("ts").cast("long").as("ep"),
          floor(col("value") * 1e6).cast("long").as("micros"),
          col("event_type").as("tp"))
        val ref = ev.agg(max(col("ep")).as("ref_ep"))
        val base = ev.groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          count_distinct(expr("ep div 86400")).as("active_days"),
          expr("(max(ep) - min(ep)) div 3600").as("span_hours"),
          min(struct(col("ep"), col("eid"), col("tp")))
            .getField("tp").as("first_type"),
          max(struct(col("ep"), col("eid"), col("tp")))
            .getField("tp").as("last_type"),
          sum(col("micros")).as("micros_sum"))
        val fav = ev.groupBy("user_id", "tp").agg(count(lit(1)).as("n"))
          .groupBy("user_id")
          .agg(max(struct(col("n"), col("tp"))).getField("tp").as("fav_type"))
        val dec = ev.crossJoin(broadcast(ref))
          .withColumn("sh", least(
            expr("((ref_ep - ep) div 3600) div 168"), lit(40L)).cast("int"))
          .groupBy("user_id")
          .agg(sum(expr("shiftright(micros, sh)")).as("dec_sum"))
        base.join(fav, "user_id").join(dec, "user_id")
      }): Q
      },
      Some("""WITH ev AS (SELECT user_id, event_id AS eid,
            epoch_us(ts) // 1000000 AS ep,
            CAST(floor("value" * 1e6) AS BIGINT) AS micros,
            event_type AS tp FROM events),
          r AS (SELECT max(ep) AS ref_ep FROM ev),
          base AS (SELECT user_id, count(*) AS n_events,
            count(DISTINCT ep // 86400) AS active_days,
            (max(ep) - min(ep)) // 3600 AS span_hours,
            CAST(sum(micros) AS BIGINT) AS micros_sum FROM ev GROUP BY 1),
          fo AS (SELECT user_id, tp AS first_type FROM (
            SELECT user_id, tp, row_number() OVER (PARTITION BY user_id
              ORDER BY ep ASC, eid ASC) AS rn FROM ev) WHERE rn = 1),
          la AS (SELECT user_id, tp AS last_type FROM (
            SELECT user_id, tp, row_number() OVER (PARTITION BY user_id
              ORDER BY ep DESC, eid DESC) AS rn FROM ev) WHERE rn = 1),
          fav AS (SELECT user_id, tp AS fav_type FROM (
            SELECT user_id, tp, row_number() OVER (PARTITION BY user_id
              ORDER BY n DESC, tp DESC) AS rn
            FROM (SELECT user_id, tp, count(*) AS n FROM ev GROUP BY 1, 2))
            WHERE rn = 1),
          dec AS (SELECT user_id, CAST(sum(micros >> sh) AS BIGINT)
              AS dec_sum FROM (
            SELECT user_id, micros,
              CAST(least(((ref_ep - ep) // 3600) // 168, 40) AS INT) AS sh
            FROM ev, r) GROUP BY 1)
        SELECT b.user_id, n_events, active_days, span_hours, first_type,
          last_type, micros_sum, fav_type, dec_sum
        FROM base b JOIN fo USING (user_id) JOIN la USING (user_id)
          JOIN fav USING (user_id) JOIN dec USING (user_id)""")),

    // Ordered funnel (view -> click -> purchase): greedy per-user stage
    // matching via one codegen'd array fold (ONE user_id shuffle); the
    // oracle replays the equivalent chained first-match formulation
    ("q_seq_funnel",
      (s: SparkSession, d: String) => graft.ops.Funnel.funnelCounts(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase")),
      Some("""WITH rn AS (SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS rn
          FROM events),
        s1 AS (SELECT user_id, min(rn) AS r FROM rn
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT rn.user_id, min(rn.rn) AS r
          FROM rn JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND rn.rn > s1.r GROUP BY 1),
        s3 AS (SELECT rn.user_id, min(rn.rn) AS r
          FROM rn JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND rn.rn > s2.r GROUP BY 1)
        SELECT 1 AS stage, 'view' AS stage_name,
          (SELECT count(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""")),

    // Time-windowed funnel: each stage must convert within 6 hours of the
    // previous match; gaps compared in exact microseconds on both engines
    ("q_seq_funnel_windowed",
      (s: SparkSession, d: String) => graft.ops.Funnel.funnelCountsWithin(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = 21600),
      Some("""WITH rn AS (SELECT user_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS rn
          FROM events),
        s1 AS (SELECT user_id, min(rn) AS r, min_by(ts, rn) AS t
          FROM rn WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT rn.user_id, min(rn.rn) AS r, min_by(rn.ts, rn.rn) AS t
          FROM rn JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND rn.rn > s1.r
            AND epoch_us(rn.ts) - epoch_us(s1.t) <= 21600000000 GROUP BY 1),
        s3 AS (SELECT rn.user_id, min(rn.rn) AS r
          FROM rn JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND rn.rn > s2.r
            AND epoch_us(rn.ts) - epoch_us(s2.t) <= 21600000000 GROUP BY 1)
        SELECT 1 AS stage, 'view' AS stage_name,
          (SELECT count(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""")),

    // Cohort retention: first-active-day cohorts x day offsets with exact
    // integer counts and a 6dp floor-quantized ratio
    ("q_seq_cohort",
      (s: SparkSession, d: String) => graft.ops.Funnel.cohortRetention(
        t(s, d, "events"), "user_id", "ts"),
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY 1),
        c AS (SELECT cohort_day, count(*) AS n_cohort FROM f GROUP BY 1),
        a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
          FROM events),
        r AS (SELECT f.cohort_day,
            CAST(date_diff('day', f.cohort_day, a.active_day) AS INTEGER)
              AS day_offset,
            count(*) AS n_active
          FROM a JOIN f USING (user_id) GROUP BY 1, 2)
        SELECT r.cohort_day, r.day_offset, r.n_active, c.n_cohort,
          floor(1e6 * r.n_active / c.n_cohort) / 1e6 AS retention
        FROM r JOIN c USING (cohort_day)""")),

    // R×C categorical association (the chi-squared contingency audit —
    // q_agg_abtest's big sibling): segment × nation observed vs expected,
    // per-cell (o·N − r·c)² kept as an exact BIGINT and floor-quantized
    // through ONE deterministic IEEE cast+divide per cell, then summed.
    // All tables here are domain-bounded (|segments|·|nations| cells);
    // marginals join back as broadcasts. The summary row carries the
    // degrees of freedom so a consumer can threshold.
    ("q_profile_contingency",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
          .select(col("c_mktsegment").as("seg"),
            col("c_nationkey").cast("long").as("nat"))
        val cell = c.groupBy("seg", "nat").agg(count(lit(1)).as("o"))
        val rm = cell.groupBy("seg").agg(sum("o").as("r"))
        val cm = cell.groupBy("nat").agg(sum("o").as("cc"))
        val tot = cell.agg(sum("o").as("nn"),
          count_distinct(col("seg")).as("nr"),
          count_distinct(col("nat")).as("nc"))
        val a = col("o") * col("nn") - col("r") * col("cc")
        cell.join(broadcast(rm), "seg").join(broadcast(cm), "nat")
          .crossJoin(broadcast(tot))
          .withColumn("cell_micro",
            // square in DOUBLE: the BIGINT (a*a) wraps past |a| ~ 3e9 —
            // the deterministic-IEEE product of identical casts instead
            floor(a.cast("double") * a.cast("double") * 1e6 /
              (col("nn") * col("r") * col("cc")).cast("double"))
              .cast("long"))
          .groupBy(col("nn").as("n"), col("nr"), col("nc"))
          .agg(count(lit(1)).as("n_cells"),
            sum("cell_micro").as("chi2_micro"))
          .select(col("n"), col("n_cells"), col("chi2_micro"),
            ((col("nr") - 1) * (col("nc") - 1)).as("dof"))
      },
      Some("""WITH c AS (SELECT c_mktsegment AS seg,
            CAST(c_nationkey AS BIGINT) AS nat FROM customer),
        cell AS (SELECT seg, nat, count(*) AS o FROM c GROUP BY 1, 2),
        rm AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cell
          GROUP BY 1),
        cm AS (SELECT nat, CAST(sum(o) AS BIGINT) AS cc FROM cell
          GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
            count(DISTINCT seg) AS nr, count(DISTINCT nat) AS nc
          FROM cell),
        x AS (SELECT
            CAST(floor(CAST(o*nn - r*cc AS DOUBLE)
              * CAST(o*nn - r*cc AS DOUBLE) * 1e6
              / CAST(nn * r * cc AS DOUBLE)) AS BIGINT) AS cell_micro,
            nn, nr, nc
          FROM cell JOIN rm USING (seg) JOIN cm USING (nat), tot)
        SELECT nn AS n, CAST(count(*) AS BIGINT) AS n_cells,
          CAST(sum(cell_micro) AS BIGINT) AS chi2_micro,
          CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof
        FROM x GROUP BY nn, nr, nc""")),

    // Two-proportion A/B test (chi-squared form): users hash-split by id
    // parity, per-user-day conversion flag, z² = (c1·n2 − c2·n1)²·(n1+n2)
    // / (n1·n2·c·(n−c)). The DIFFERENCE c1·n2 − c2·n1 stays an exact
    // BIGINT (each c·n product wraps only past ~9e18 — ~sf1e5); its
    // SQUARE and the 4-factor denominator do NOT fit 64 bits at sf1 (the
    // 10× fixture caught the raw form throwing ARITHMETIC_OVERFLOW under
    // ANSI), so both are staged through PAIRED double products —
    // ((diff·diff)·nn)·1e6 / ((n1·n2)·(c·(n−c))) in one fixed IEEE op
    // order, each BIGINT factor pair exact before its cast. The 3.841459
    // cutoff is chi²(1, 0.05). Two combine-enabled aggregates, no window.
    ("q_agg_abtest",
      (s: SparkSession, d: String) => {
        // unit = user-DAY (a user converts on a day they purchase) —
        // user-lifetime conversion saturates to 1 on this fixture
        val u = t(s, d, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("v", pmod(col("user_id"), lit(2L)))
        val a = u.agg(
          sum(when(col("v") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("c1"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("c2"))
        val diff = (col("c1") * col("n2") - col("c2") * col("n1"))
          .cast("double")
        val num = diff * diff * (col("n1") + col("n2")).cast("double")
        val den = (col("n1") * col("n2")).cast("double") *
          ((col("c1") + col("c2")) *
            (col("n1") + col("n2") - col("c1") - col("c2"))).cast("double")
        a.withColumn("z2_micro",
            when(col("n1") * col("n2") === 0 ||
                (col("c1") + col("c2")) *
                  (col("n1") + col("n2") - col("c1") - col("c2")) === 0,
              lit(null).cast("long"))
              .otherwise(floor(num * 1e6 / den).cast("long")))
          .withColumn("significant",
            when(col("z2_micro") > 3841459L, 1L).otherwise(0L))
      },
      Some("""WITH u AS (SELECT user_id,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM events GROUP BY user_id, CAST(ts AS DATE)),
        g AS (SELECT user_id % 2 AS v, conv FROM u),
        a AS (SELECT
            CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
              AS c1,
            CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
              AS c2
          FROM g),
        z AS (SELECT n1, c1, n2, c2,
            CASE WHEN n1 * n2 = 0
                OR (c1+c2) * (n1+n2-c1-c2) = 0 THEN NULL
              ELSE CAST(floor(
                CAST(c1*n2 - c2*n1 AS DOUBLE)
                  * CAST(c1*n2 - c2*n1 AS DOUBLE)
                  * CAST(n1+n2 AS DOUBLE) * 1e6 /
                (CAST(n1 * n2 AS DOUBLE)
                  * CAST((c1+c2) * (n1+n2-c1-c2) AS DOUBLE)))
                AS BIGINT) END AS z2_micro
          FROM a)
        SELECT n1, c1, n2, c2, z2_micro,
          CASE WHEN z2_micro > 3841459 THEN CAST(1 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS significant
        FROM z""")),

    // Group-sequential A/B monitoring (Pocock 1977; O'Brien-Fleming
    // 1979) — the "peek 5 times without inflating alpha" discipline of
    // production experimentation, in q_agg_abtest's sqrt-free z² form:
    // five 6-day interims accumulate arm counts via a window over the 5
    // interim rows (domain-bounded, never data-sized), the z² statistic
    // is the exact-integer-moments ratio, and the spending boundaries
    // are published constants (K=5, two-sided alpha=0.05: Pocock
    // z=2.413 -> z² 5.822569; OBF z_k = 2.04*sqrt(5/k) -> z² 4.1616*5/k
    // in micro literals). first_cross columns show why OBF exists: it
    // spends almost nothing early and nearly the fixed-sample bound at
    // the end. One fact scan.
    ("q_agg_groupseq",
      (s: SparkSession, d: String) => {
        val u = t(s, d, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("v", pmod(col("user_id"), lit(2L)))
          // interim k = which 6-day block the user-day falls in (1..5)
          .withColumn("k",
            floor((dayofmonth(col("day")) - lit(1)).cast("double") /
              lit(6.0)).cast("long") + lit(1L))
        val per = u.groupBy("k").agg(
          sum(when(col("v") === 0, 1L).otherwise(0L)).as("dn1"),
          sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("dc1"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("dn2"),
          sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("dc2"))
        val w = Window.orderBy("k") // 5 interim rows
        val cum = per
          .withColumn("n1", sum("dn1").over(w))
          .withColumn("c1", sum("dc1").over(w))
          .withColumn("n2", sum("dn2").over(w))
          .withColumn("c2", sum("dc2").over(w))
        val diff = (col("c1") * col("n2") - col("c2") * col("n1"))
          .cast("double")
        val pooled = (col("c1") + col("c2")) *
          (col("n1") + col("n2") - col("c1") - col("c2"))
        val obfBound = // 4.1616 * 5/k in micro, exact integer literals
          when(col("k") === 1, 20808000L).when(col("k") === 2, 10404000L)
            .when(col("k") === 3, 6936000L).when(col("k") === 4, 5202000L)
            .otherwise(4161600L)
        val z = cum.withColumn("z2_micro",
            when(col("n1") * col("n2") === 0 || pooled === 0,
              lit(null).cast("long"))
              .otherwise(floor(diff * diff *
                (col("n1") + col("n2")).cast("double") * lit(1e6) /
                ((col("n1") * col("n2")).cast("double") *
                  pooled.cast("double"))).cast("long")))
          .withColumn("pocock_sig",
            when(col("z2_micro") > 5822569L, 1L).otherwise(0L))
          .withColumn("obf_sig",
            when(col("z2_micro") > obfBound, 1L).otherwise(0L))
        val all = Window.partitionBy()
        z.withColumn("pocock_first_k",
            min(when(col("pocock_sig") === 1, col("k"))).over(all))
          .withColumn("obf_first_k",
            min(when(col("obf_sig") === 1, col("k"))).over(all))
          .select("k", "n1", "c1", "n2", "c2", "z2_micro",
            "pocock_sig", "obf_sig", "pocock_first_k", "obf_first_k")
      },
      Some("""WITH u AS (SELECT user_id, day,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM (SELECT user_id, event_type, CAST(ts AS DATE) AS day
            FROM events) GROUP BY 1, 2),
        g AS (SELECT user_id % 2 AS v, conv,
            CAST(floor(CAST(CAST(strftime(day, '%d') AS BIGINT) - 1
              AS DOUBLE) / 6.0) AS BIGINT) + 1 AS k
          FROM u),
        per AS (SELECT k,
            CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS dn1,
            CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
              AS dc1,
            CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS dn2,
            CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
              AS dc2
          FROM g GROUP BY 1),
        cum AS (SELECT k,
            CAST(sum(dn1) OVER wk AS BIGINT) AS n1,
            CAST(sum(dc1) OVER wk AS BIGINT) AS c1,
            CAST(sum(dn2) OVER wk AS BIGINT) AS n2,
            CAST(sum(dc2) OVER wk AS BIGINT) AS c2
          FROM per WINDOW wk AS (ORDER BY k ROWS UNBOUNDED PRECEDING)),
        z AS (SELECT k, n1, c1, n2, c2,
            CASE WHEN n1 * n2 = 0
                OR (c1+c2) * (n1+n2-c1-c2) = 0 THEN NULL
              ELSE CAST(floor(
                CAST(c1*n2 - c2*n1 AS DOUBLE)
                  * CAST(c1*n2 - c2*n1 AS DOUBLE)
                  * CAST(n1+n2 AS DOUBLE) * 1e6 /
                (CAST(n1 * n2 AS DOUBLE)
                  * CAST((c1+c2) * (n1+n2-c1-c2) AS DOUBLE)))
                AS BIGINT) END AS z2_micro
          FROM cum),
        sig AS (SELECT *,
            CASE WHEN z2_micro > 5822569 THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS pocock_sig,
            CASE WHEN z2_micro > (CASE k WHEN 1 THEN 20808000
                WHEN 2 THEN 10404000 WHEN 3 THEN 6936000
                WHEN 4 THEN 5202000 ELSE 4161600 END)
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
              AS obf_sig
          FROM z)
        SELECT k, n1, c1, n2, c2, z2_micro, pocock_sig, obf_sig,
          min(CASE WHEN pocock_sig = 1 THEN k END) OVER ()
            AS pocock_first_k,
          min(CASE WHEN obf_sig = 1 THEN k END) OVER () AS obf_first_k
        FROM sig""")),

    // Kolmogorov–Smirnov two-sample statistic, EXACT: D = max over
    // values of |F1 − F2| evaluates as max|cum1·n2 − cum2·n1| / (n1·n2)
    // with the per-group cumulative counts from ONE range-partitioned
    // prefix scan over the value-grouped table — every comparison a
    // BIGINT, no ECDF floats anywhere. Completes the two-sample family:
    // abtest (proportions), welch (means), mannwhitney (ranks), ks
    // (whole distribution shape).
    ("q_agg_ks",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(
          pmod(col("o_custkey"), lit(2L)).as("g"),
          floor(col("o_totalprice") / 100.0).cast("long").as("x"))
        val byVal = o.groupBy("x").agg(
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("c1"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("c2"))
        // two prefixes over |values| rows — one range-partitioned scan
        // each (the value table is already corpus-collapsed)
        val p1 = graft.ops.Prefix.runningOffsetsOrdered(byVal, Seq("x"), "c1")
          .withColumnRenamed("offset", "p1")
        val p2 = graft.ops.Prefix.runningOffsetsOrdered(
            p1, Seq("x"), "c2")
          .withColumnRenamed("offset", "p2")
        val cum1 = col("p1") + col("c1")
        val cum2 = col("p2") + col("c2")
        val tot = p2.agg(sum("c1").as("n1"), sum("c2").as("n2"))
        p2.crossJoin(broadcast(tot))
          .select(col("x"), (cum1 * col("n2") - cum2 * col("n1"))
            .as("dnum"), col("n1"), col("n2"))
          .groupBy("n1", "n2")
          .agg(max(abs(col("dnum"))).as("d_num"))
          .select(col("n1"), col("n2"), col("d_num"),
            floor(col("d_num").cast("double") * 1e6 /
              (col("n1") * col("n2")).cast("double")).cast("long")
              .as("d_micro"))
      },
      Some("""WITH o AS (SELECT o_custkey % 2 AS g,
            CAST(floor(o_totalprice / 100.0) AS BIGINT) AS x FROM orders),
        bv AS (SELECT x,
            CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM o GROUP BY 1),
        cumt AS (SELECT x,
            CAST(sum(c1) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum1,
            CAST(sum(c2) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum2
          FROM bv),
        tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
            CAST(sum(c2) AS BIGINT) AS n2 FROM bv)
        SELECT n1, n2,
          CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
          CAST(floor(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE) * 1e6
            / CAST(n1 * n2 AS DOUBLE)) AS BIGINT) AS d_micro
        FROM cumt, tot GROUP BY n1, n2""")),

    // Welch two-sample t² on order values of two customer cohorts
    // (hash-split): means and variances from exact integer moments, the
    // statistic one floor-quantized division of cross-engine-identical
    // doubles — t² = (m1−m2)² / (v1/n1 + v2/n2), each term a fixed IEEE
    // expression of exact BIGINTs. The parametric complement of
    // q_agg_abtest (proportions) and q_agg_mannwhitney (ranks).
    // Isotonic calibration (Stats.isotonicFit — PAVA via the minimax
    // formula) of P(purchase | $25 value bin): the monotone-curve step a
    // quality-classifier pipeline runs between raw score and threshold.
    // One corpus pass (per-bin count/sum); the B^3 minimax runs on the
    // 12-row bin table. Segment averages are single IEEE divisions of
    // exact BIGINTs, so the min/max lattice replays bit-identically.
    ("q_agg_isotonic",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events").filter(col("value").isNotNull)
          .select(
            least(floor(cents(col("value")).cast("double") / lit(2500.0)),
              lit(11.0)).cast("long").as("score_bin"),
            (col("event_type") === "purchase").cast("long").as("label"))
        graft.ops.Stats.isotonicFit(ev, "score_bin", "label")
      },
      Some(s"""WITH e AS (SELECT
            CAST(least(floor(CAST(${centsSql("\"value\"")} AS DOUBLE)
              / 2500.0), 11.0) AS BIGINT) AS bin,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
          FROM events WHERE "value" IS NOT NULL),
        bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(label) AS BIGINT) AS s FROM e GROUP BY 1),
        cum AS (SELECT a.bin, CAST(sum(b.n) AS BIGINT) AS cn,
            CAST(sum(b.s) AS BIGINT) AS cs
          FROM bins a JOIN bins b ON b.bin <= a.bin GROUP BY 1),
        segs AS (
          SELECT p.bin + 1 AS j, k.bin AS k,
              CAST(k.cs - p.cs AS DOUBLE) / CAST(k.cn - p.cn AS DOUBLE)
                AS avg
            FROM cum k JOIN cum p ON p.bin < k.bin
          UNION ALL
          SELECT (SELECT min(bin) FROM bins) AS j, bin AS k,
              CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) AS avg
            FROM cum),
        inn AS (SELECT i.bin AS i, s.j, min(s.avg) AS mn
          FROM (SELECT bin FROM bins) i
          JOIN segs s ON s.j <= i.bin AND s.k >= i.bin GROUP BY 1, 2),
        fit AS (SELECT i, max(mn) AS f FROM inn GROUP BY 1)
        SELECT b.bin, b.n, b.s,
          CAST(floor(1e6 * CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
            AS BIGINT) AS rate_micro,
          CAST(floor(1e6 * f) AS BIGINT) AS fit_micro
        FROM bins b JOIN fit ON b.bin = fit.i""")),

    ("q_agg_welch",
      (s: SparkSession, d: String) => {
        // hecto-units, not cents: the n·Σx² − (Σx)² variance numerator
        // must stay inside BIGINT at population scale (cents² overflows
        // past ~1e5 rows of 1e6-cent values; /100 buys 4 decades)
        val o = t(s, d, "orders").select(
          pmod(col("o_custkey"), lit(2L)).as("g"),
          floor(col("o_totalprice") / 100.0).cast("long").as("x"))
        val m = o.groupBy("g").agg(count(lit(1)).as("n"),
          sum("x").as("s1"), sum(col("x") * col("x")).as("s2"))
        val a = m.agg(
          sum(when(col("g") === 0, col("n"))).as("n1"),
          sum(when(col("g") === 0, col("s1"))).as("a1"),
          sum(when(col("g") === 0, col("s2"))).as("q1"),
          sum(when(col("g") === 1, col("n"))).as("n2"),
          sum(when(col("g") === 1, col("s1"))).as("a2"),
          sum(when(col("g") === 1, col("s2"))).as("q2"))
        // mean_i = a_i/n_i ; var_i/n_i = (n_i·q_i − a_i²)/(n_i²·(n_i−1))
        // — the n_i² in the denominator already folds the standard-error
        // division, so the se² below is v1n + v2n directly
        val m1 = col("a1").cast("double") / col("n1").cast("double")
        val m2 = col("a2").cast("double") / col("n2").cast("double")
        val v1n = (col("n1") * col("q1") - col("a1") * col("a1"))
          .cast("double") /
          (col("n1") * col("n1") * (col("n1") - 1)).cast("double")
        val v2n = (col("n2") * col("q2") - col("a2") * col("a2"))
          .cast("double") /
          (col("n2") * col("n2") * (col("n2") - 1)).cast("double")
        a.select(col("n1"), col("n2"),
          when(col("n1") < 2 || col("n2") < 2 ||
              (col("n1") * col("q1") === col("a1") * col("a1")) &&
              (col("n2") * col("q2") === col("a2") * col("a2")),
            lit(null).cast("long")).otherwise(
            floor((m1 - m2) * (m1 - m2) * 1e6 / (v1n + v2n))
              .cast("long")).as("t2_micro"))
      },
      Some("""WITH o AS (SELECT o_custkey % 2 AS g,
            CAST(floor(o_totalprice / 100.0) AS BIGINT) AS x FROM orders),
        m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s1,
            CAST(sum(x * x) AS BIGINT) AS s2
          FROM o GROUP BY 1),
        a AS (SELECT
            CAST(sum(CASE WHEN g = 0 THEN n END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN g = 0 THEN s1 END) AS BIGINT) AS a1,
            CAST(sum(CASE WHEN g = 0 THEN s2 END) AS BIGINT) AS q1,
            CAST(sum(CASE WHEN g = 1 THEN n END) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN g = 1 THEN s1 END) AS BIGINT) AS a2,
            CAST(sum(CASE WHEN g = 1 THEN s2 END) AS BIGINT) AS q2
          FROM m)
        SELECT n1, n2,
          CASE WHEN n1 < 2 OR n2 < 2
            OR (n1 * q1 = a1 * a1 AND n2 * q2 = a2 * a2) THEN NULL
          ELSE CAST(floor(
            (CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE))
            * (CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1e6 /
            (CAST(n1 * q1 - a1 * a1 AS DOUBLE) /
               CAST(n1 * n1 * (n1 - 1) AS DOUBLE)
             + CAST(n2 * q2 - a2 * a2 AS DOUBLE) /
               CAST(n2 * n2 * (n2 - 1) AS DOUBLE)))
            AS BIGINT) END AS t2_micro
        FROM a""")),

    // Per-segment OLS fit (price-on-quantity by return flag) as EXACT
    // RATIONALS: slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) and intercept =
    // (Sy·Sxx − Sx·Sxy)/same — numerator/denominator shipped as exact
    // integer STRINGS (one combine-enabled moment aggregate, products
    // widened through DECIMAL(18,0)² = (37,0) here, HUGEINT in the
    // oracle; the digit strings match at any scale, where BIGINT output
    // columns overflowed loudly at sf1 — n·Sxy passes 2^63 there, the
    // 10× fixture caught the cast). The quantized point estimates are one
    // floor(double) of those exact integers (decimal→double and
    // HUGEINT→double are both correctly rounded — identical). The
    // regression analog of q_agg_welch's moment discipline.
    ("q_agg_ols",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y"))
        val m = li.groupBy("flag").agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
        val numS = d18(col("n")) * d18(col("sxy")) -
          d18(col("sx")) * d18(col("sy"))
        val denS = d18(col("n")) * d18(col("sxx")) -
          d18(col("sx")) * d18(col("sx"))
        val numI = d18(col("sy")) * d18(col("sxx")) -
          d18(col("sx")) * d18(col("sxy"))
        m.select(col("flag"), col("n"),
          numS.cast("string").as("slope_num"),
          denS.cast("string").as("den"),
          numI.cast("string").as("intercept_num"),
          floor(numS.cast("double") * 1e6 / denS.cast("double"))
            .cast("long").as("slope_micro"),
          floor(numI.cast("double") * 1e3 / denS.cast("double"))
            .cast("long").as("intercept_milli"))
      },
      Some("""WITH li AS (SELECT l_returnflag AS flag,
            CAST(l_quantity AS BIGINT) AS x,
            CAST(floor(l_extendedprice) AS BIGINT) AS y FROM lineitem),
        m AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x * y) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx
          FROM li GROUP BY 1),
        r AS (SELECT flag, n,
            CAST(n AS HUGEINT) * sxy
              - CAST(sx AS HUGEINT) * sy AS slope_num,
            CAST(n AS HUGEINT) * sxx
              - CAST(sx AS HUGEINT) * sx AS den,
            CAST(sy AS HUGEINT) * sxx
              - CAST(sx AS HUGEINT) * sxy AS intercept_num
          FROM m)
        SELECT flag, n, CAST(slope_num AS VARCHAR) AS slope_num,
          CAST(den AS VARCHAR) AS den,
          CAST(intercept_num AS VARCHAR) AS intercept_num,
          CAST(floor(CAST(slope_num AS DOUBLE) * 1e6
            / CAST(den AS DOUBLE)) AS BIGINT) AS slope_micro,
          CAST(floor(CAST(intercept_num AS DOUBLE) * 1e3
            / CAST(den AS DOUBLE)) AS BIGINT) AS intercept_milli
        FROM r""")),

    // Cohen's kappa (1960) — chance-corrected agreement between two
    // labelings of the same corpus, the standard inter-annotator /
    // classifier-vs-gold QC number for labeled training data. Raters:
    // the n-gram langId heuristic vs the fixture's gold lang column.
    // Exact rationals, the q_agg_ols discipline: kappa = (N·agree −
    // Σ_k a_k·b_k) / (N² − Σ_k a_k·b_k) with marginal products staged
    // through DECIMAL(38,0)/HUGEINT (N² passes 2^63 long before 100 TB),
    // shipped as digit strings + one floor(double) quantized estimate;
    // the chance term joins the two marginal tables on the label (a
    // broadcast-sized join — the label space is the rater alphabet).
    // Degenerate single-label corpora null out via nullif(den, 0) on
    // both sides (the q_agg_cuped lesson).
    ("q_agg_kappa",
      (s: SparkSession, d: String) => {
        val lab = t(s, d, "documents").filter(col("text").isNotNull)
          .select(TextOps.langId(col("text")).as("a"), col("lang").as("b"))
        def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
        val tot = lab.agg(count(lit(1)).as("n"),
          sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
        val am = lab.groupBy("a").agg(count(lit(1)).as("ca"))
        val bm = lab.groupBy("b").agg(count(lit(1)).as("cb"))
        val ab = am.join(bm, col("a") === col("b"))
          .agg(coalesce(sum(d18(col("ca")) * d18(col("cb"))),
            lit(0).cast("decimal(37,0)")).as("sab"))
        val knum = d18(col("n")) * d18(col("n_agree")) - col("sab")
        val kden = d18(col("n")) * d18(col("n")) - col("sab")
        tot.crossJoin(ab).select(
          col("n"), col("n_agree"),
          floor(col("n_agree").cast("double") * 1e6 /
            col("n").cast("double")).cast("long").as("po_micro"),
          floor(knum.cast("double") * 1e6 /
            nullif(kden, lit(0)).cast("double")).cast("long")
            .as("kappa_micro"),
          knum.cast("string").as("kappa_num"),
          kden.cast("string").as("kappa_den"))
      },
      Some(s"""WITH pred AS (SELECT doc_id, lang_pred
          FROM ($langIdOracleSql)),
        lab AS (SELECT p.lang_pred AS a, d.lang AS b
          FROM pred p JOIN documents d USING (doc_id)
          WHERE d.text IS NOT NULL),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
              AS n_agree
          FROM lab),
        am AS (SELECT a, CAST(count(*) AS BIGINT) AS ca FROM lab
          GROUP BY 1),
        bm AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM lab
          GROUP BY 1),
        ab AS (SELECT coalesce(sum(CAST(ca AS HUGEINT) * cb),
            CAST(0 AS HUGEINT)) AS sab
          FROM am JOIN bm ON am.a = bm.b),
        r AS (SELECT n, n_agree,
            CAST(n AS HUGEINT) * n_agree - sab AS knum,
            CAST(n AS HUGEINT) * n - sab AS kden
          FROM tot, ab)
        SELECT n, n_agree,
          CAST(floor(CAST(n_agree AS DOUBLE) * 1e6
            / CAST(n AS DOUBLE)) AS BIGINT) AS po_micro,
          CAST(floor(CAST(knum AS DOUBLE) * 1e6
            / CAST(nullif(kden, 0) AS DOUBLE)) AS BIGINT) AS kappa_micro,
          CAST(knum AS VARCHAR) AS kappa_num,
          CAST(kden AS VARCHAR) AS kappa_den
        FROM r""")),

    // Robust trend on the weekly order-count series: Theil–Sen slope
    // (median of all pairwise slopes — 29.4% breakdown point where OLS
    // has 0) + the Mann–Kendall S test with tie-corrected variance — the
    // nonparametric pair to q_agg_ols/q_agg_holt. The pair set is
    // CALENDAR²-bounded (the order-date domain is fixed — it does not
    // grow with SF), so the pairwise cross join is the documented
    // grid-sized benign class, and the single-task median window runs on
    // ≤ weeks² rows. Determinism: pairwise slopes are exact rationals;
    // the sort key num/den is ONE correctly-rounded double division of
    // integers (distinct rationals stay distinct: they differ by
    // ≥ 1/den², far above double error at any count magnitude), ties
    // broken by (ti, tj); the median is the ceil(n/2) discrete rank, its
    // exact rational shipped alongside the quantized estimate. z uses
    // IEEE sqrt (correctly rounded by the standard on both engines) in
    // one fixed chain.
    ("q_agg_trend",
      (s: SparkSession, d: String) => {
        val wk = t(s, d, "orders")
          .select(floor(datediff(col("o_orderdate"),
            lit("1970-01-01").cast("date")) / lit(7.0)).cast("long")
            .as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
        val pi = wk.select(col("t").as("ti"), col("c").as("ci"))
        val pj = wk.select(col("t").as("tj"), col("c").as("cj"))
        val p = pi.crossJoin(pj).filter(col("ti") < col("tj"))
          .select(col("ti"), col("tj"),
            (col("cj") - col("ci")).as("num"),
            (col("tj") - col("ti")).as("den"))
          .withColumn("slope",
            col("num").cast("double") / col("den").cast("double"))
        val stats = p.agg(count(lit(1)).as("n_pairs"),
          sum(signum(col("num").cast("double")).cast("long")).as("s"))
        val nW = wk.agg(count(lit(1)).as("nw"))
        val ties = wk.groupBy("c").agg(count(lit(1)).as("tc"))
          .agg(coalesce(sum(col("tc") * (col("tc") - 1) *
            (lit(2L) * col("tc") + 5)), lit(0L)).as("tieterm"))
        val ranked = p.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("slope"), col("ti"), col("tj"))))
        val med = ranked.crossJoin(broadcast(stats))
          // Column./ is DOUBLE division — cast back to the integer rank
          // ((n+1)/2.0 is an exact half, truncation == floor for n >= 0)
          .filter(col("rn") ===
            ((col("n_pairs") + 1) / 2).cast("long"))
          .select(col("num").as("slope_num"), col("den").as("slope_den"))
        stats.crossJoin(broadcast(nW)).crossJoin(broadcast(ties))
          .crossJoin(broadcast(med))
          .withColumn("var18",
            col("nw") * (col("nw") - 1) * (lit(2L) * col("nw") + 5) -
              col("tieterm"))
          .select(col("nw").as("n_weeks"), col("n_pairs"), col("s"),
            col("var18"),
            col("slope_num"), col("slope_den"),
            floor(col("slope_num").cast("double") * 1e6 /
              col("slope_den").cast("double")).cast("long")
              .as("slope_micro"),
            when(col("var18") > 0, floor(lit(1e3) *
              (col("s").cast("double") -
                signum(col("s").cast("double"))) /
              sqrt(col("var18").cast("double") / 18.0)).cast("long"))
              .otherwise(lit(null)).as("z_milli"))
      },
      Some("""WITH wk AS (SELECT CAST(floor(date_diff('day',
              DATE '1970-01-01', CAST(o_orderdate AS DATE)) / 7.0)
              AS BIGINT) AS t,
            CAST(count(*) AS BIGINT) AS c
          FROM orders GROUP BY 1),
        p AS (SELECT i.t AS ti, j.t AS tj,
            j.c - i.c AS num, j.t - i.t AS den,
            CAST(j.c - i.c AS DOUBLE) / CAST(j.t - i.t AS DOUBLE) AS slope
          FROM wk i JOIN wk j ON i.t < j.t),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(sign(CAST(num AS DOUBLE))) AS BIGINT) AS s FROM p),
        nw AS (SELECT CAST(count(*) AS BIGINT) AS nw FROM wk),
        tt AS (SELECT coalesce(CAST(sum(tc * (tc - 1) * (2 * tc + 5))
              AS BIGINT), CAST(0 AS BIGINT)) AS tieterm
          FROM (SELECT CAST(count(*) AS BIGINT) AS tc FROM wk GROUP BY c)),
        md AS (SELECT num AS slope_num, den AS slope_den
          FROM (SELECT num, den, row_number()
              OVER (ORDER BY slope, ti, tj) AS rn FROM p), st
          WHERE rn = (n_pairs + 1) // 2)
        SELECT nw AS n_weeks, n_pairs, s,
          nw * (nw - 1) * (2 * nw + 5) - tieterm AS var18,
          slope_num, slope_den,
          CAST(floor(CAST(slope_num AS DOUBLE) * 1e6
            / CAST(slope_den AS DOUBLE)) AS BIGINT) AS slope_micro,
          CASE WHEN nw * (nw - 1) * (2 * nw + 5) - tieterm > 0
          THEN CAST(floor(1e3 * (CAST(s AS DOUBLE)
              - sign(CAST(s AS DOUBLE)))
            / sqrt(CAST(nw * (nw - 1) * (2 * nw + 5) - tieterm AS DOUBLE)
              / 18.0)) AS BIGINT)
          ELSE NULL END AS z_milli
        FROM st, nw, tt, md""")),

    // Difference-in-differences (the panel-causal workhorse; Card &
    // Krueger 1994 form): hash-assigned treatment × fixed pre/post cut,
    // DiD = (m̄11 − m̄10) − (m̄01 − m̄00) over exact integer cell moments.
    // ONE conditional-aggregation pass (8 combine-enabled sums, no join,
    // no pivot scan); each cell mean is one correctly-rounded double
    // division of exact BIGINTs and the estimate is one fixed
    // parenthesized IEEE chain, floor-quantized — the q_agg_cuped
    // discipline, with the same nullif guard on possibly-empty cells.
    // Completes the causal family: abtest (randomized), cuped (variance
    // reduction), ope (off-policy), did (parallel-trends panel).
    ("q_agg_did",
      (s: SparkSession, d: String) => {
        val ev = events(s, d).select(
          when(col("user_id") % 2 === 1, 1).otherwise(0).as("tr"),
          when(col("ts") >=
            lit("2024-01-16 00:00:00").cast("timestamp"), 1)
            .otherwise(0).as("post"),
          cents(col("value")).as("v"))
        def cell(tr: Int, post: Int, c: org.apache.spark.sql.Column) =
          sum(when(col("tr") === tr && col("post") === post, c)
            .otherwise(lit(0L)))
        val m = ev.agg(
          cell(1, 1, lit(1L)).as("n11"), cell(1, 1, col("v")).as("s11"),
          cell(1, 0, lit(1L)).as("n10"), cell(1, 0, col("v")).as("s10"),
          cell(0, 1, lit(1L)).as("n01"), cell(0, 1, col("v")).as("s01"),
          cell(0, 0, lit(1L)).as("n00"), cell(0, 0, col("v")).as("s00"))
        def mean(sc: String, nc: String) =
          col(sc).cast("double") /
            nullif(col(nc), lit(0L)).cast("double")
        m.select(col("n11"), col("s11"), col("n10"), col("s10"),
          col("n01"), col("s01"), col("n00"), col("s00"),
          floor(lit(1e3) *
            ((mean("s11", "n11") - mean("s10", "n10")) -
              (mean("s01", "n01") - mean("s00", "n00"))))
            .cast("long").as("did_millicents"))
      },
      Some(s"""WITH ev AS (SELECT
            CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr,
            CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN 1 ELSE 0 END AS post,
            ${centsSql("value")} AS v
          FROM events),
        m AS (SELECT
            CAST(sum(CASE WHEN tr = 1 AND post = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n11,
            CAST(sum(CASE WHEN tr = 1 AND post = 1 THEN v ELSE 0 END)
              AS BIGINT) AS s11,
            CAST(sum(CASE WHEN tr = 1 AND post = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n10,
            CAST(sum(CASE WHEN tr = 1 AND post = 0 THEN v ELSE 0 END)
              AS BIGINT) AS s10,
            CAST(sum(CASE WHEN tr = 0 AND post = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n01,
            CAST(sum(CASE WHEN tr = 0 AND post = 1 THEN v ELSE 0 END)
              AS BIGINT) AS s01,
            CAST(sum(CASE WHEN tr = 0 AND post = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n00,
            CAST(sum(CASE WHEN tr = 0 AND post = 0 THEN v ELSE 0 END)
              AS BIGINT) AS s00
          FROM ev)
        SELECT n11, s11, n10, s10, n01, s01, n00, s00,
          CAST(floor(1e3 * (
            (CAST(s11 AS DOUBLE) / CAST(nullif(n11, 0) AS DOUBLE)
              - CAST(s10 AS DOUBLE) / CAST(nullif(n10, 0) AS DOUBLE))
            - (CAST(s01 AS DOUBLE) / CAST(nullif(n01, 0) AS DOUBLE)
              - CAST(s00 AS DOUBLE) / CAST(nullif(n00, 0) AS DOUBLE))))
            AS BIGINT) AS did_millicents
        FROM m""")),

    // Kaplan–Meier survival curve (1958 product-limit estimator) over
    // user lifetimes — the churn/retention curve with RIGHT-CENSORING
    // done correctly (users still active in the final week are censored,
    // not counted as churned — naive retention curves conflate the two).
    // Lifetime = days between a user's first and last event; the event
    // table is CALENDAR-BOUNDED (≤ observation-window days), so the
    // at-risk window and the collect are bounded regardless of user
    // count; the corpus-sized work is ONE per-user min/max aggregate.
    // S(t) = Π (1 − dᵢ/nᵢ) as a left-associative ordered product of
    // correctly-rounded double factors — the q_agg_holt ordered-fold
    // convention: Spark folds slice(fs, 1, i+1), DuckDB list_reduce's
    // first-element init gives the identical ((f1·f2)·f3)… chain.
    ("q_seq_survival",
      (s: SparkSession, d: String) => {
        val ud = events(s, d)
          .select(col("user_id"),
            datediff(col("ts").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("dd"))
          .groupBy("user_id").agg(min("dd").as("f"), max("dd").as("l"))
        val gm = ud.agg(max("l").as("gm"))
        val lt = ud.crossJoin(broadcast(gm))
          .select((col("l") - col("f")).as("t"),
            when(col("l") < col("gm") - 7, 1L).otherwise(0L).as("churn"))
        val cells = lt.groupBy("t")
          .agg(sum("churn").as("d"), count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("t")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        val curve = cells
          .crossJoin(broadcast(cells.agg(sum("c").as("tot"))))
          .withColumn("n_risk",
            col("tot") - coalesce(sum(col("c")).over(w), lit(0L)))
        val arr = curve.agg(array_sort(collect_list(
          struct(col("t"), col("d"), col("n_risk")))).as("xs"))
        arr
          .withColumn("fs", transform(col("xs"),
            x => lit(1.0) - x.getField("d").cast("double") /
              x.getField("n_risk").cast("double")))
          .select(col("fs"), posexplode(col("xs")).as(Seq("i", "x")))
          .select(col("x.t").as("t"), col("x.n_risk").as("n_risk"),
            col("x.d").as("d"),
            floor(lit(1e6) * aggregate(
              slice(col("fs"), lit(1), col("i") + 1), lit(1.0),
              (a, b) => a * b)).cast("long").as("s_micro"))
      },
      Some("""WITH ud AS (SELECT user_id,
            min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
              AS f,
            max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
              AS l
          FROM events GROUP BY 1),
        gm AS (SELECT max(l) AS gm FROM ud),
        lt AS (SELECT l - f AS t,
            CASE WHEN l < gm - 7 THEN 1 ELSE 0 END AS churn
          FROM ud, gm),
        cells AS (SELECT t, CAST(sum(churn) AS BIGINT) AS d,
            CAST(count(*) AS BIGINT) AS c
          FROM lt GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cells),
        curve AS (SELECT t, d,
            tot - coalesce(sum(c) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS n_risk
          FROM cells, tot),
        arr AS (SELECT
            list(CAST(t AS BIGINT) ORDER BY t) AS ts,
            list(d ORDER BY t) AS ds,
            list(n_risk ORDER BY t) AS ns,
            list(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
              ORDER BY t) AS fs
          FROM curve)
        SELECT ts[i] AS t, ns[i] AS n_risk, ds[i] AS d,
          CAST(floor(1e6 * list_reduce(fs[1:i], (a, b) -> a * b))
            AS BIGINT) AS s_micro
        FROM arr, UNNEST(range(1, len(ts) + 1)) AS u(i)""")),

    // Autocorrelation of the daily order-count series at lags 1..7 — the
    // seasonality detector run before any forecasting/backtest op. EXACT:
    // with integer counts, Σ(n·x_t − S)(n·x_{t+k} − S) clears the rational
    // mean by multiplying through by n² — every term BIGINT (counts keep
    // magnitudes ~1e6, so the worst product is ~1e12 summed over ~1e4
    // days). The day index comes from the range-partitioned prefix scan
    // over the calendar-collapsed daily table (no global one-partition
    // window, even though days are domain-bounded); lagged pairs are an
    // idx+k self-join, linear per lag.
    ("q_agg_acf",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "orders").groupBy(col("o_orderdate").as("dt"))
          .agg(count(lit(1)).as("x"))
          .withColumn("one", lit(1L))
        val idxd = graft.ops.Prefix.runningOffsets(daily, "dt", "one")
          .select(col("dt"), col("x"), (col("offset") + 1L).as("idx"))
        val tot = idxd.agg(count(lit(1)).as("n"), sum("x").as("s"))
        val dev = idxd.crossJoin(broadcast(tot))
          .select(col("idx"), (col("n") * col("x") - col("s")).as("dv"),
            col("n"))
        val lags = s.range(1, 8).select(col("id").as("lag"))
        val pairs = dev.as("a").crossJoin(broadcast(lags))
          .join(dev.as("b"),
            col("b.idx") === col("a.idx") + col("lag"))
          .groupBy("lag")
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("a.dv") * col("b.dv")).as("num"))
        val den = dev.agg(sum(col("dv") * col("dv")).as("den"))
        pairs.crossJoin(broadcast(den))
          .select(col("lag"), col("n_pairs"), col("num"), col("den"),
            floor(col("num").cast("double") * 1e3 /
              col("den").cast("double")).cast("long").as("acf_milli"))
      },
      Some("""WITH daily AS (SELECT o_orderdate AS dt,
            CAST(count(*) AS BIGINT) AS x,
            CAST(row_number() OVER (ORDER BY o_orderdate) AS BIGINT) AS idx
          FROM orders GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS s FROM daily),
        dev AS (SELECT idx, n * x - s AS dv FROM daily, tot),
        den AS (SELECT CAST(sum(dv * dv) AS BIGINT) AS den FROM dev),
        lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
        pairs AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(a.dv * b.dv) AS BIGINT) AS num
          FROM dev a JOIN lags ON true
          JOIN dev b ON b.idx = a.idx + lag
          GROUP BY 1)
        SELECT lag, n_pairs, num, den,
          CAST(floor(CAST(num AS DOUBLE) * 1e3 / CAST(den AS DOUBLE))
            AS BIGINT) AS acf_milli
        FROM pairs, den""")),

    // Mann–Whitney rank-sum test, midranks and all: the combined sample
    // collapses to one row per distinct VALUE (combine-enabled), the
    // global rank prefix comes from the range-partitioned prefix scan
    // over that value table (never a corpus sort in one task), and
    // doubled midranks keep every tie-handling term an exact BIGINT:
    // 2·R1 = Σ c1·(2·prefix + c + 1). The z² statistic is one
    // deterministic IEEE chain at the end. The nonparametric sibling of
    // q_agg_welch — same cohorts, no normality assumption.
    ("q_agg_mannwhitney",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(
          pmod(col("o_custkey"), lit(2L)).as("g"),
          floor(col("o_totalprice") / 100.0).cast("long").as("x"))
        val byVal = o.groupBy("x").agg(count(lit(1)).as("c"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("c1"))
        val ranked = graft.ops.Prefix.runningOffsetsOrdered(
          byVal, Seq("x"), "c")
        val a = ranked.agg(
          sum(col("c1") * (lit(2L) * col("offset") + col("c") + 1))
            .as("two_r1"),
          sum(col("c1")).as("n1"), sum(col("c") - col("c1")).as("n2"))
        val bigA = col("two_r1") - col("n1") * (col("n1") + 1) -
          col("n1") * col("n2")
        val den = col("n1") * col("n2") * (col("n1") + col("n2") + 1)
        a.select(col("n1"), col("n2"), col("two_r1"),
          (col("two_r1") - col("n1") * (col("n1") + 1)).as("two_u1"),
          floor(bigA.cast("double") * bigA.cast("double") * lit(3e6) /
            den.cast("double")).cast("long").as("z2_micro"))
      },
      Some("""WITH o AS (SELECT o_custkey % 2 AS g,
            CAST(floor(o_totalprice / 100.0) AS BIGINT) AS x FROM orders),
        bv AS (SELECT x, count(*) AS c,
            CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1
          FROM o GROUP BY 1),
        r AS (SELECT x, c, c1,
            COALESCE(sum(c) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
          FROM bv),
        a AS (SELECT
            CAST(sum(c1 * (2 * off + c + 1)) AS BIGINT) AS two_r1,
            CAST(sum(c1) AS BIGINT) AS n1,
            CAST(sum(c - c1) AS BIGINT) AS n2
          FROM r)
        SELECT n1, n2, two_r1,
          two_r1 - n1 * (n1 + 1) AS two_u1,
          CAST(floor(
            CAST(two_r1 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
            * CAST(two_r1 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE) * 3e6
            / CAST(n1 * n2 * (n1 + n2 + 1) AS DOUBLE)) AS BIGINT)
            AS z2_micro
        FROM a""")),

    // Kruskal–Wallis H: the k-sample extension of q_agg_mannwhitney (same
    // machinery — one row per distinct VALUE, range-partitioned prefix
    // offsets, doubled midranks so every rank-sum term is an exact
    // BIGINT: 2·R_g = Σ c_g·(2·prefix + c + 1)). Five customer cohorts;
    // H and its tie-corrected form are one deterministic IEEE chain at
    // the end (the (2R_g)² squares would wrap 2^63 at exactly the corpus
    // sizes the test targets, so they square as doubles; the N³ tie
    // denominator is widened — decimal here, HUGEINT in the oracle —
    // before its own double cast).
    ("q_agg_kruskal",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(
          pmod(col("o_custkey"), lit(5L)).as("g"),
          floor(col("o_totalprice") / 100.0).cast("long").as("x"))
        val aggs = count(lit(1)).as("c") +: (0 to 4).map(g =>
          sum(when(col("g") === g, 1L).otherwise(0L)).as(s"c$g"))
        val byVal = o.groupBy("x").agg(aggs.head, aggs.tail: _*)
        val ranked = graft.ops.Prefix.runningOffsetsOrdered(
          byVal, Seq("x"), "c")
        val rankAggs =
          (0 to 4).map(g => sum(col(s"c$g") *
            (lit(2L) * col("offset") + col("c") + 1)).as(s"tr$g")) ++
          (0 to 4).map(g => sum(col(s"c$g")).as(s"n$g")) ++
          Seq(sum(col("c")).as("n"),
            sum(col("c") * col("c") * col("c") - col("c")).as("tie_t"))
        val a = ranked.agg(rankAggs.head, rankAggs.tail: _*)
        def term(g: Int) =
          col(s"tr$g").cast("double") * col(s"tr$g").cast("double") /
            col(s"n$g").cast("double")
        val sumterm = term(0) + term(1) + term(2) + term(3) + term(4)
        val h = lit(3.0) * sumterm /
          (col("n").cast("double") * (col("n") + 1).cast("double")) -
          lit(3.0) * (col("n") + 1).cast("double")
        val corr = lit(1.0) - col("tie_t").cast("double") /
          (col("n").cast("decimal(38,0)") * col("n") * col("n") -
            col("n")).cast("double")
        a.withColumn("h", h).withColumn("corr", corr)
          .select(col("n"), col("tie_t"),
            floor(lit(1e6) * col("h")).cast("long").as("h_micro"),
            floor(lit(1e6) * (col("h") / col("corr"))).cast("long")
              .as("h_adj_micro"))
      },
      Some("""WITH o AS (SELECT o_custkey % 5 AS g,
            CAST(floor(o_totalprice / 100.0) AS BIGINT) AS x FROM orders),
        bv AS (SELECT x, count(*) AS c,
            CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
            CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
            CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
            CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
          FROM o GROUP BY 1),
        r AS (SELECT x, c, c0, c1, c2, c3, c4,
            CAST(COALESCE(sum(c) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
          FROM bv),
        a AS (SELECT
            CAST(sum(c0 * (2 * off + c + 1)) AS BIGINT) AS tr0,
            CAST(sum(c1 * (2 * off + c + 1)) AS BIGINT) AS tr1,
            CAST(sum(c2 * (2 * off + c + 1)) AS BIGINT) AS tr2,
            CAST(sum(c3 * (2 * off + c + 1)) AS BIGINT) AS tr3,
            CAST(sum(c4 * (2 * off + c + 1)) AS BIGINT) AS tr4,
            CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
            CAST(sum(c2) AS BIGINT) AS n2, CAST(sum(c3) AS BIGINT) AS n3,
            CAST(sum(c4) AS BIGINT) AS n4,
            CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(c * c * c - c) AS BIGINT) AS tie_t
          FROM r),
        hh AS (SELECT n, tie_t,
            3.0 * (CAST(tr0 AS DOUBLE) * CAST(tr0 AS DOUBLE)
                / CAST(n0 AS DOUBLE)
              + CAST(tr1 AS DOUBLE) * CAST(tr1 AS DOUBLE)
                / CAST(n1 AS DOUBLE)
              + CAST(tr2 AS DOUBLE) * CAST(tr2 AS DOUBLE)
                / CAST(n2 AS DOUBLE)
              + CAST(tr3 AS DOUBLE) * CAST(tr3 AS DOUBLE)
                / CAST(n3 AS DOUBLE)
              + CAST(tr4 AS DOUBLE) * CAST(tr4 AS DOUBLE)
                / CAST(n4 AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
              - 3.0 * CAST(n + 1 AS DOUBLE) AS h,
            1.0 - CAST(tie_t AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE) AS corr
          FROM a)
        SELECT n, tie_t,
          CAST(floor(1e6 * h) AS BIGINT) AS h_micro,
          CAST(floor(1e6 * (h / corr)) AS BIGINT) AS h_adj_micro
        FROM hh""")),

    // Theil–Sen slope of weekly regional revenue: the median of all
    // pairwise slopes — the outlier-robust trend estimate (a handful of
    // corrupted weeks cannot move it, unlike the OLS fit in q_agg_ols).
    // Slopes stay exact rationals (BIGINT cents / week-diff); ordering
    // uses the IEEE quotient with the exact (num, den) pair as
    // tie-break, so both engines select the identical median element.
    // Scale: the corpus collapses to a weekly table first (one
    // combine-enabled aggregate); pairs and the per-region window are
    // calendar-bounded (W(W-1)/2 with W = #weeks), never corpus-sized.
    ("q_agg_theilsen",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("rk"),
            expr("datediff(o_orderdate, DATE '1992-01-01') div 7")
              .as("wk"),
            cents(col("o_totalprice")).as("pc"))
        // lazy cut (r13): the weekly rollup feeds both self-join sides
        val w = o.groupBy("rk", "wk").agg(sum("pc").as("yc"))
          .localCheckpoint(false)
        val p = w.as("a").join(w.as("b"),
            col("a.rk") === col("b.rk") && col("a.wk") < col("b.wk"))
          .select(col("a.rk").as("rk"),
            (col("b.yc") - col("a.yc")).as("num"),
            (col("b.wk") - col("a.wk")).as("den"))
        val sd = col("num").cast("double") / col("den").cast("double")
        val byR = Window.partitionBy("rk")
        val r = p.withColumn("rn", row_number().over(
            byR.orderBy(sd.asc, col("num").asc, col("den").asc)))
          .withColumn("n_pairs", count(lit(1)).over(byR))
        r.filter(expr("rn = (n_pairs + 1) div 2"))
          .select(col("rk"), col("n_pairs"),
            floor(col("num").cast("double") * lit(1e6) /
              col("den").cast("double")).cast("long").as("slope_micro"))
      },
      Some(s"""WITH o AS (SELECT n_regionkey AS rk,
            date_diff('day', DATE '1992-01-01', o_orderdate) // 7 AS wk,
            ${centsSql("o_totalprice")} AS pc
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        w AS (SELECT rk, wk, CAST(sum(pc) AS BIGINT) AS yc
          FROM o GROUP BY 1, 2),
        p AS (SELECT a.rk AS rk, b.yc - a.yc AS num, b.wk - a.wk AS den
          FROM w a JOIN w b ON a.rk = b.rk AND a.wk < b.wk),
        r AS (SELECT rk, num, den,
            row_number() OVER (PARTITION BY rk
              ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) ASC,
                num ASC, den ASC) AS rn,
            count(*) OVER (PARTITION BY rk) AS n_pairs
          FROM p)
        SELECT rk, n_pairs,
          CAST(floor(CAST(num AS DOUBLE) * 1e6 / CAST(den AS DOUBLE))
            AS BIGINT) AS slope_micro
        FROM r WHERE rn = (n_pairs + 1) // 2""")),

    // Single-changepoint detection per nation: the week split maximizing
    // the between-segment sum of squares — binary segmentation's first
    // (and most load-bearing) step, run on the weekly series so every
    // window is calendar-bounded. The split statistic
    // A² / (k·(n-k)) with A = S_k·n - S_tot·k is exact BIGINT up to the
    // final square (which would wrap 2^63, so it squares as a double —
    // one fixed IEEE chain, argmax tie-broken by earliest week). The
    // reported gain is its square root (correctly-rounded IEEE on both
    // engines), back in cents units.
    ("q_agg_changepoint",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nk"),
            expr("datediff(o_orderdate, DATE '1992-01-01') div 7")
              .as("wk"),
            cents(col("o_totalprice")).as("pc"))
        val ser = o.groupBy("nk", "wk").agg(sum("pc").as("yc"))
        val ord = Window.partitionBy("nk").orderBy("wk")
        val whole = Window.partitionBy("nk")
        val cum = ser
          .withColumn("k", row_number().over(ord).cast("long"))
          .withColumn("sk", sum("yc").over(ord))
          .withColumn("n", count(lit(1)).over(whole))
          .withColumn("stot", sum("yc").over(whole))
        val a = (col("sk") * col("n") - col("stot") * col("k"))
        val score = a.cast("double") * a.cast("double") /
          (col("k") * (col("n") - col("k"))).cast("double")
        val scored = cum.filter(col("k") < col("n"))
          .withColumn("score", score)
        scored.withColumn("rn", row_number().over(
            Window.partitionBy("nk")
              .orderBy(col("score").desc, col("wk").asc)))
          .filter(col("rn") === 1)
          .select(col("nk"), col("n").as("n_weeks"),
            col("wk").as("split_wk"),
            expr("sk div k").as("mean1_cents"),
            expr("(stot - sk) div (n - k)").as("mean2_cents"),
            floor(sqrt(col("score"))).cast("long").as("gain_sqrt_cents"))
      },
      Some(s"""WITH o AS (SELECT c_nationkey AS nk,
            date_diff('day', DATE '1992-01-01', o_orderdate) // 7 AS wk,
            ${centsSql("o_totalprice")} AS pc
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ser AS (SELECT nk, wk, CAST(sum(pc) AS BIGINT) AS yc
          FROM o GROUP BY 1, 2),
        cum AS (SELECT nk, wk,
            CAST(row_number() OVER (PARTITION BY nk ORDER BY wk)
              AS BIGINT) AS k,
            CAST(sum(yc) OVER (PARTITION BY nk ORDER BY wk)
              AS BIGINT) AS sk,
            CAST(count(*) OVER (PARTITION BY nk) AS BIGINT) AS n,
            CAST(sum(yc) OVER (PARTITION BY nk) AS BIGINT) AS stot
          FROM ser),
        scored AS (SELECT nk, wk, k, sk, n, stot,
            CAST(sk * n - stot * k AS DOUBLE)
              * CAST(sk * n - stot * k AS DOUBLE)
              / CAST(k * (n - k) AS DOUBLE) AS score
          FROM cum WHERE k < n),
        best AS (SELECT *, row_number() OVER (PARTITION BY nk
            ORDER BY score DESC, wk ASC) AS rn FROM scored)
        SELECT nk, n AS n_weeks, wk AS split_wk,
          sk // k AS mean1_cents,
          (stot - sk) // (n - k) AS mean2_cents,
          CAST(floor(sqrt(score)) AS BIGINT) AS gain_sqrt_cents
        FROM best WHERE rn = 1""")),

    // Split-conformal calibration (alpha = 0.1): fit a trivial per-
    // priority mean-price model on a deterministic half of the orders,
    // take the ceil((n+1)(1-alpha))-th smallest absolute residual as the
    // conformal quantile q_hat, and AUDIT the guaranteed >= 90% coverage
    // on the held-out half — the distribution-free prediction-interval
    // recipe a scoring pipeline ships with its model. Exact throughout:
    // integer cents residuals, the quantile rank from the
    // range-partitioned prefix scan over the residual VALUE table
    // (mannwhitney machinery — never a corpus sort in one task), the
    // split from the replayable md5 score.
    ("q_agg_conformal",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(
          col("o_orderpriority").as("prio"),
          cents(col("o_totalprice")).as("pc"),
          (Sampling.hashScore(col("o_orderkey")) < 0.5).as("is_cal"))
        val pred = o.filter(col("is_cal")).groupBy("prio")
          .agg(sum("pc").as("sp"), count(lit(1)).as("np"))
          .select(col("prio"), expr("sp div np").as("predc"))
        // lazy cuts (r13): scored feeds the calibration histogram AND the
        // final coverage aggregate; byVal feeds the rank walk AND n_cal —
        // uncut, each lazy arm re-ran the orders scan + broadcast join
        val scored = o.join(broadcast(pred), Seq("prio"))
          .select(col("is_cal"), abs(col("pc") - col("predc")).as("sc"))
          .localCheckpoint(false)
        val byVal = scored.filter(col("is_cal"))
          .groupBy("sc").agg(count(lit(1)).as("c"))
          .localCheckpoint(false)
        val ranked = graft.ops.Prefix.runningOffsetsOrdered(
          byVal, Seq("sc"), "c")
        val ncal = byVal.agg(sum("c").as("n_cal"))
        val qhat = ranked.crossJoin(broadcast(ncal))
          .filter(col("offset") + col("c") >=
            expr("(9L * (n_cal + 1) + 9) div 10"))
          .agg(min("sc").as("q_hat"))
        scored.filter(!col("is_cal"))
          .crossJoin(broadcast(qhat)).crossJoin(broadcast(ncal))
          .agg(first(col("n_cal")).as("n_cal"),
            count(lit(1)).as("n_test"),
            first(col("q_hat")).as("q_hat_cents"),
            sum(when(col("sc") <= col("q_hat"), 1L).otherwise(0L))
              .as("n_covered"))
          .select(col("n_cal"), col("n_test"), col("q_hat_cents"),
            col("n_covered"),
            floor(col("n_covered").cast("double") * lit(1e6) /
              col("n_test").cast("double")).cast("long")
              .as("coverage_ppm"))
      },
      Some(s"""WITH o AS (SELECT o_orderpriority AS prio,
            ${centsSql("o_totalprice")} AS pc,
            ${hashScoreSql("o_orderkey")} < 0.5 AS is_cal
          FROM orders),
        pred AS (SELECT prio, CAST(sum(pc) AS BIGINT)
            // CAST(count(*) AS BIGINT) AS predc
          FROM o WHERE is_cal GROUP BY 1),
        scored AS (SELECT is_cal, abs(pc - predc) AS sc
          FROM o JOIN pred USING (prio)),
        bv AS (SELECT sc, count(*) AS c FROM scored WHERE is_cal
          GROUP BY 1),
        r AS (SELECT sc, c,
            CAST(COALESCE(sum(c) OVER (ORDER BY sc
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
          FROM bv),
        ncal AS (SELECT CAST(sum(c) AS BIGINT) AS n_cal FROM bv),
        qhat AS (SELECT min(sc) AS q_hat FROM r, ncal
          WHERE off + c >= (9 * (n_cal + 1) + 9) // 10)
        SELECT any_value(n_cal) AS n_cal,
          count(*) AS n_test,
          any_value(q_hat) AS q_hat_cents,
          CAST(sum(CASE WHEN sc <= q_hat THEN 1 ELSE 0 END) AS BIGINT)
            AS n_covered,
          CAST(floor(CAST(sum(CASE WHEN sc <= q_hat THEN 1 ELSE 0 END)
              AS DOUBLE) * 1e6 / CAST(count(*) AS DOUBLE)) AS BIGINT)
            AS coverage_ppm
        FROM scored, qhat, ncal WHERE NOT is_cal""")),

    // Difference-in-differences: the causal-inference workhorse for
    // "did the change move the metric" when treatment wasn't randomized
    // — treated cohort (even custkeys) vs control, before vs after the
    // 1998-01-01 cut (the fixture's order dates span 1995..2001); DiD = (T_post − T_pre) − (C_post − C_pre) on mean
    // order value. ONE conditional aggregate over the join (four exact
    // BIGINT sum/count cells), then a fixed IEEE chain for the means —
    // the 100 TB shape is the same single pass.
    ("q_agg_did",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .select((col("o_custkey") % 2 === 0).as("treated"),
            (col("o_orderdate") >= lit(java.sql.Date.valueOf("1998-01-01")))
              .as("post"),
            cents(col("o_totalprice")).as("pc"))
        def cell(tr: Boolean, po: Boolean, nm: String) = Seq(
          sum(when(col("treated") === tr && col("post") === po,
            col("pc")).otherwise(0L)).as(s"s_$nm"),
          sum(when(col("treated") === tr && col("post") === po, 1L)
            .otherwise(0L)).as(s"n_$nm"))
        val a = o.agg(
          (cell(true, false, "t1") ++ cell(true, true, "t2") ++
            cell(false, false, "c1") ++ cell(false, true, "c2")).head,
          (cell(true, false, "t1") ++ cell(true, true, "t2") ++
            cell(false, false, "c1") ++ cell(false, true, "c2")).tail: _*)
        def m(nm: String) =
          col(s"s_$nm").cast("double") / col(s"n_$nm").cast("double")
        a.select(col("n_t1"), col("n_t2"), col("n_c1"), col("n_c2"),
          floor(m("t1")).cast("long").as("mean_t_pre_cents"),
          floor(m("t2")).cast("long").as("mean_t_post_cents"),
          floor(m("c1")).cast("long").as("mean_c_pre_cents"),
          floor(m("c2")).cast("long").as("mean_c_post_cents"),
          floor((m("t2") - m("t1") - (m("c2") - m("c1"))) * lit(1e3))
            .cast("long").as("did_milli_cents"))
      },
      Some(s"""WITH o AS (SELECT o_custkey % 2 = 0 AS treated,
            o_orderdate >= DATE '1998-01-01' AS post,
            ${centsSql("o_totalprice")} AS pc FROM orders),
        a AS (SELECT
            CAST(sum(CASE WHEN treated AND NOT post THEN pc ELSE 0 END)
              AS BIGINT) AS s_t1,
            CAST(sum(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END)
              AS BIGINT) AS n_t1,
            CAST(sum(CASE WHEN treated AND post THEN pc ELSE 0 END)
              AS BIGINT) AS s_t2,
            CAST(sum(CASE WHEN treated AND post THEN 1 ELSE 0 END)
              AS BIGINT) AS n_t2,
            CAST(sum(CASE WHEN NOT treated AND NOT post THEN pc ELSE 0 END)
              AS BIGINT) AS s_c1,
            CAST(sum(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END)
              AS BIGINT) AS n_c1,
            CAST(sum(CASE WHEN NOT treated AND post THEN pc ELSE 0 END)
              AS BIGINT) AS s_c2,
            CAST(sum(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END)
              AS BIGINT) AS n_c2
          FROM o)
        SELECT n_t1, n_t2, n_c1, n_c2,
          CAST(floor(CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE))
            AS BIGINT) AS mean_t_pre_cents,
          CAST(floor(CAST(s_t2 AS DOUBLE) / CAST(n_t2 AS DOUBLE))
            AS BIGINT) AS mean_t_post_cents,
          CAST(floor(CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE))
            AS BIGINT) AS mean_c_pre_cents,
          CAST(floor(CAST(s_c2 AS DOUBLE) / CAST(n_c2 AS DOUBLE))
            AS BIGINT) AS mean_c_post_cents,
          CAST(floor((CAST(s_t2 AS DOUBLE) / CAST(n_t2 AS DOUBLE)
              - CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
              - (CAST(s_c2 AS DOUBLE) / CAST(n_c2 AS DOUBLE)
                - CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE))) * 1e3)
            AS BIGINT) AS did_milli_cents
        FROM a""")),

    // Local-peak detection on the weekly revenue series: a week is a
    // peak when it beats both neighbors AND clears a prominence gate of
    // 1.3x the nation's mean week (kept exact: 10·yc·n_weeks >
    // 13·total — no division). The spike-mining primitive behind
    // campaign attribution and anomaly triage; all windows are
    // per-nation and calendar-bounded.
    ("q_agg_peaks",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nk"),
            expr("datediff(o_orderdate, DATE '1992-01-01') div 7")
              .as("wk"),
            cents(col("o_totalprice")).as("pc"))
        val ser = o.groupBy("nk", "wk").agg(sum("pc").as("yc"))
        val ord = Window.partitionBy("nk").orderBy("wk")
        val whole = Window.partitionBy("nk")
        ser.withColumn("prev", lag("yc", 1).over(ord))
          .withColumn("next", lead("yc", 1).over(ord))
          .withColumn("n", count(lit(1)).over(whole))
          .withColumn("stot", sum("yc").over(whole))
          .filter(col("prev").isNotNull && col("next").isNotNull &&
            col("yc") > col("prev") && col("yc") >= col("next") &&
            lit(10L) * col("yc") * col("n") > lit(13L) * col("stot"))
          .select(col("nk"), col("wk").as("peak_wk"), col("yc"))
      },
      Some(s"""WITH o AS (SELECT c_nationkey AS nk,
            date_diff('day', DATE '1992-01-01', o_orderdate) // 7 AS wk,
            ${centsSql("o_totalprice")} AS pc
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ser AS (SELECT nk, wk, CAST(sum(pc) AS BIGINT) AS yc
          FROM o GROUP BY 1, 2),
        x AS (SELECT nk, wk, yc,
            lag(yc) OVER (PARTITION BY nk ORDER BY wk) AS prev,
            lead(yc) OVER (PARTITION BY nk ORDER BY wk) AS next,
            CAST(count(*) OVER (PARTITION BY nk) AS BIGINT) AS n,
            CAST(sum(yc) OVER (PARTITION BY nk) AS BIGINT) AS stot
          FROM ser)
        SELECT nk, wk AS peak_wk, yc FROM x
        WHERE prev IS NOT NULL AND next IS NOT NULL
          AND yc > prev AND yc >= next
          AND 10 * yc * n > 13 * stot""")),

    // Deterministic Poisson(λ=1) bootstrap: 8 resample replicates in ONE
    // pass — each row's replicate weight is a quantized-Poisson draw from
    // an md5 prefix (identical integer thresholds interpolated into both
    // engines), so the replicate totals are exactly reproducible. The
    // scan-stage 8x fan-out feeds a combine-enabled groupBy(b); the
    // spread of the 8 totals is the uncertainty estimate a 100 TB
    // aggregate can't get any other way without a second pass.
    // Two-proportion power analysis — the DESIGN-side complement of
    // q_agg_abtest (that one asks "is the running test significant";
    // this one asks "how many units per arm would we need to detect a
    // given lift at 80% power / 5% two-sided alpha" — the sizing table an
    // experimentation platform shows before launch). Standard pooled
    // formula: n = (z_a·sqrt(2·p̄(1-p̄)) + z_b·sqrt(p̄(1-p̄)+p2(1-p2)))²/δ²
    // with p2 = p̄ + δ over an MDE grid. ONE corpus aggregate (the same
    // user-day conversion cells as q_agg_abtest) cross-joined with the
    // 5-row broadcast grid; everything after the aggregate is a fixed
    // IEEE chain on two exact BIGINT-derived doubles (sqrt is
    // correctly-rounded in both engines), so the oracle matches
    // bit-for-bit. z constants fixed at 1.959964 / 0.841621.
    ("q_agg_power",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val u = t(s, d, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
        val a = u.agg(count(lit(1)).as("n"), sum("conv").as("c"))
        val grid = Seq(5000L, 10000L, 20000L, 50000L, 100000L)
          .toDF("mde_ppm")
        a.crossJoin(broadcast(grid))
          .withColumn("pb",
            col("c").cast("double") / col("n").cast("double"))
          .withColumn("delta", col("mde_ppm").cast("double") / lit(1e6))
          .withColumn("p2", col("pb") + col("delta"))
          .withColumn("s_",
            lit(1.959964) *
              sqrt(lit(2.0) * col("pb") * (lit(1.0) - col("pb"))) +
            lit(0.841621) *
              sqrt(col("pb") * (lit(1.0) - col("pb")) +
                col("p2") * (lit(1.0) - col("p2"))))
          .select(col("mde_ppm"),
            floor(col("pb") * lit(1e6)).cast("long").as("pooled_ppm"),
            ceil(col("s_") * col("s_") / (col("delta") * col("delta")))
              .cast("long").as("n_required"))
      },
      Some("""WITH u AS (SELECT user_id,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM events GROUP BY user_id, CAST(ts AS DATE)),
        a AS (SELECT count(*) AS n, CAST(sum(conv) AS BIGINT) AS c FROM u),
        grid AS (SELECT CAST(m AS BIGINT) AS mde_ppm
          FROM (VALUES (5000), (10000), (20000), (50000), (100000))
            AS g(m)),
        x AS (SELECT mde_ppm,
            CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pb,
            CAST(mde_ppm AS DOUBLE) / 1e6 AS delta
          FROM a, grid),
        y AS (SELECT mde_ppm, pb, delta, pb + delta AS p2 FROM x),
        z AS (SELECT mde_ppm, pb, delta,
            1.959964 * sqrt(2.0 * pb * (1.0 - pb)) +
            0.841621 * sqrt(pb * (1.0 - pb) + p2 * (1.0 - p2)) AS s_
          FROM y)
        SELECT mde_ppm,
          CAST(floor(pb * 1e6) AS BIGINT) AS pooled_ppm,
          CAST(ceil(s_ * s_ / (delta * delta)) AS BIGINT) AS n_required
        FROM z""")),

    ("q_agg_bootstrap",
      (s: SparkSession, d: String) => {
        val thr = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L)
        val o = t(s, d, "orders")
          .select(col("o_orderkey").as("id"),
            cents(col("o_totalprice")).as("pc"))
          .select(col("id"), col("pc"),
            explode(sequence(lit(0L), lit(7L))).as("b"))
        val h = graft.plans.GraftExpressions.md5_prefix(
          concat(col("id").cast("string"), lit("|"),
            col("b").cast("string")), 8)
        val w = when(h < thr(0), 0L).when(h < thr(1), 1L)
          .when(h < thr(2), 2L).when(h < thr(3), 3L).otherwise(4L)
        o.withColumn("w", w).groupBy("b")
          .agg(sum(col("w")).as("n_eff"),
            sum(col("w") * col("pc")).as("total_cents"))
      },
      Some(s"""WITH x AS (SELECT o_orderkey AS id,
            ${centsSql("o_totalprice")} AS pc FROM orders),
        e AS (SELECT id, pc, unnest(range(0, 8)) AS b FROM x),
        h AS (SELECT b, pc,
            CAST(concat('0x', substr(md5(CAST(id AS VARCHAR) || '|' ||
              CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
          FROM e),
        w AS (SELECT b, pc,
            CASE WHEN hv < 1580030168 THEN 0
                 WHEN hv < 3160060337 THEN 1
                 WHEN hv < 3950075421 THEN 2
                 WHEN hv < 4213413783 THEN 3 ELSE 4 END AS w
          FROM h)
        SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
          CAST(sum(w * pc) AS BIGINT) AS total_cents
        FROM w GROUP BY 1""")),

    // Two-sample permutation test per event type (is mean per-user spend
    // different between odd and even user cohorts?) with md5-replayable
    // permutations: rep 0 is the OBSERVED split (user_id % 2); reps
    // 1..199 reassign each unit by an md5 bit of (type, user, rep). The
    // unit table (one exact micro-sum per (type, user)) is built FIRST,
    // so the B× fan-out multiplies users, not events — the scale shape
    // that keeps resampling viable at 100 TB (B bounded, corpus reduced
    // before the blow-up; every aggregate combine-enabled). The statistic
    // |mean1 − mean0| is two IEEE divisions + one subtraction over exact
    // BIGINTs — bit-identical cross-engine; p = (#extreme + 1)/(B + 1)
    // in exact ppm (add-one: the observed split is itself a permutation).
    ("q_agg_permtest",
      (s: SparkSession, d: String) => {
        val B = 199
        val g = t(s, d, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
          .select(col("event_type"), col("user_id"), col("x"),
            explode(expr(s"sequence(0, $B)")).as("r"))
          .withColumn("side",
            when(col("r") === 0, col("user_id") % 2)
              .otherwise(expr("cast(conv(substr(md5(concat(event_type, " +
                "':', user_id, ':', r)), 1, 8), 16, 10) as bigint) % 2")))
          .groupBy("event_type", "r")
          .agg(sum(when(col("side") === 1L, col("x")).otherwise(0L)).as("s1"),
            sum(when(col("side") === 0L, col("x")).otherwise(0L)).as("s0"),
            count(when(col("side") === 1L, lit(1))).as("n1"),
            count(when(col("side") === 0L, lit(1))).as("n0"))
          .withColumn("tstat", expr("abs(cast(s1 as double) / " +
            "cast(nullif(n1, 0) as double) - cast(s0 as double) / " +
            "cast(nullif(n0, 0) as double))"))
        // the observed split is rep 0 of the SAME grouped table — lift it
        // with a window over event_type (5 partitions x B+1 rows,
        // domain-bounded) instead of a self-join, which would recompute
        // the whole fan-out twice
        val gw = Window.partitionBy("event_type")
        g.withColumn("t_obs", max(when(col("r") === 0, col("tstat"))).over(gw))
          .withColumn("s_odd", max(when(col("r") === 0, col("s1"))).over(gw))
          .withColumn("s_even", max(when(col("r") === 0, col("s0"))).over(gw))
          .withColumn("n_odd", max(when(col("r") === 0, col("n1"))).over(gw))
          .withColumn("n_even", max(when(col("r") === 0, col("n0"))).over(gw))
          .filter(col("r") > 0)
          .groupBy("event_type")
          .agg((max("n_odd") + max("n_even")).as("n_units"),
            max("s_odd").as("s_odd"), max("s_even").as("s_even"),
            floor(max("t_obs")).cast("long").as("t_obs_micro"),
            sum(when(coalesce(col("tstat") >= col("t_obs"), lit(false)),
              1L).otherwise(0L)).as("n_extreme"))
          .withColumn("p_ppm",
            expr(s"(n_extreme + 1) * 1000000L div ${B + 1}"))
      },
      Some("""WITH units AS MATERIALIZED (SELECT event_type, user_id,
            CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        sided AS (SELECT event_type, r,
            CASE WHEN r = 0 THEN user_id % 2
                 ELSE CAST(concat('0x', substr(md5(concat(event_type, ':',
                   CAST(user_id AS VARCHAR), ':', CAST(r AS VARCHAR))),
                   1, 8)) AS BIGINT) % 2 END AS side, x
          FROM units CROSS JOIN (SELECT unnest(range(0, 200)) AS r)),
        g AS MATERIALIZED (SELECT event_type, r,
            CAST(sum(CASE WHEN side = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
            CAST(sum(CASE WHEN side = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
            CAST(count(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS n1,
            CAST(count(CASE WHEN side = 0 THEN 1 END) AS BIGINT) AS n0
          FROM sided GROUP BY 1, 2),
        tt AS (SELECT *, abs(CAST(s1 AS DOUBLE) /
              CAST(nullif(n1, 0) AS DOUBLE) - CAST(s0 AS DOUBLE) /
              CAST(nullif(n0, 0) AS DOUBLE)) AS tstat FROM g),
        lifted AS (SELECT *,
            max(CASE WHEN r = 0 THEN tstat END)
              OVER (PARTITION BY event_type) AS t_obs,
            max(CASE WHEN r = 0 THEN s1 END)
              OVER (PARTITION BY event_type) AS s_odd,
            max(CASE WHEN r = 0 THEN s0 END)
              OVER (PARTITION BY event_type) AS s_even,
            max(CASE WHEN r = 0 THEN n1 END)
              OVER (PARTITION BY event_type) AS n_odd,
            max(CASE WHEN r = 0 THEN n0 END)
              OVER (PARTITION BY event_type) AS n_even
          FROM tt)
        SELECT event_type,
          CAST(max(n_odd) + max(n_even) AS BIGINT) AS n_units,
          max(s_odd) AS s_odd, max(s_even) AS s_even,
          CAST(floor(max(t_obs)) AS BIGINT) AS t_obs_micro,
          CAST(sum(CASE WHEN coalesce(tstat >= t_obs, false)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
          CAST((sum(CASE WHEN coalesce(tstat >= t_obs, false)
            THEN 1 ELSE 0 END) + 1) * 1000000 // 200 AS BIGINT) AS p_ppm
        FROM lifted WHERE r > 0
        GROUP BY 1""")),

    // Benjamini–Hochberg FDR step-up over the per-type permutation
    // p-values (B = 99 here — the multiple-testing layer cares about the
    // CORRECTION, not p resolution): rank p ascending, k* = max rank with
    // p(i)·m ≤ α·i (exact integers, α = 0.10), discoveries = ranks ≤ k*.
    // The BH pass is a window over m = 5 rows — domain-bounded by the
    // metric vocabulary, never by the corpus.
    ("q_agg_fdr",
      (s: SparkSession, d: String) => {
        val B = 99
        val g = t(s, d, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(floor(col("value") * lit(1e6)).cast("long")).as("x"))
          .select(col("event_type"), col("user_id"), col("x"),
            explode(expr(s"sequence(0, $B)")).as("r"))
          .withColumn("side",
            when(col("r") === 0, col("user_id") % 2)
              .otherwise(expr("cast(conv(substr(md5(concat(event_type, " +
                "':', user_id, ':', r)), 1, 8), 16, 10) as bigint) % 2")))
          .groupBy("event_type", "r")
          .agg(sum(when(col("side") === 1L, col("x")).otherwise(0L)).as("s1"),
            sum(when(col("side") === 0L, col("x")).otherwise(0L)).as("s0"),
            count(when(col("side") === 1L, lit(1))).as("n1"),
            count(when(col("side") === 0L, lit(1))).as("n0"))
          .withColumn("tstat", expr("abs(cast(s1 as double) / " +
            "cast(nullif(n1, 0) as double) - cast(s0 as double) / " +
            "cast(nullif(n0, 0) as double))"))
        val p = g.withColumn("t_obs",
            max(when(col("r") === 0, col("tstat")))
              .over(Window.partitionBy("event_type")))
          .filter(col("r") > 0)
          .groupBy("event_type")
          .agg(sum(when(coalesce(col("tstat") >= col("t_obs"), lit(false)),
            1L).otherwise(0L)).as("n_extreme"))
          .withColumn("p_ppm",
            expr(s"(n_extreme + 1) * 1000000L div ${B + 1}"))
        val wAll = Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        p.withColumn("rnk", row_number().over(
            Window.orderBy(col("p_ppm").asc, col("event_type").asc)))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("passes",
            when(col("p_ppm") * col("m") <= lit(100000L) * col("rnk"), 1L)
              .otherwise(0L))
          .withColumn("kstar",
            max(when(col("passes") === 1L, col("rnk")).otherwise(0L))
              .over(wAll))
          .select(col("event_type"), col("p_ppm"),
            col("rnk").cast("long").as("rnk"), col("passes"),
            when(col("rnk") <= col("kstar"), 1L).otherwise(0L)
              .as("discovered"))
      },
      Some("""WITH units AS MATERIALIZED (SELECT event_type, user_id,
            CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        sided AS (SELECT event_type, r,
            CASE WHEN r = 0 THEN user_id % 2
                 ELSE CAST(concat('0x', substr(md5(concat(event_type, ':',
                   CAST(user_id AS VARCHAR), ':', CAST(r AS VARCHAR))),
                   1, 8)) AS BIGINT) % 2 END AS side, x
          FROM units CROSS JOIN (SELECT unnest(range(0, 100)) AS r)),
        g AS MATERIALIZED (SELECT event_type, r,
            CAST(sum(CASE WHEN side = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
            CAST(sum(CASE WHEN side = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
            CAST(count(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS n1,
            CAST(count(CASE WHEN side = 0 THEN 1 END) AS BIGINT) AS n0
          FROM sided GROUP BY 1, 2),
        tt AS (SELECT *, abs(CAST(s1 AS DOUBLE) /
              CAST(nullif(n1, 0) AS DOUBLE) - CAST(s0 AS DOUBLE) /
              CAST(nullif(n0, 0) AS DOUBLE)) AS tstat FROM g),
        lifted AS (SELECT *, max(CASE WHEN r = 0 THEN tstat END)
              OVER (PARTITION BY event_type) AS t_obs
          FROM tt),
        p AS (SELECT event_type,
            CAST((sum(CASE WHEN coalesce(tstat >= t_obs, false)
              THEN 1 ELSE 0 END) + 1) * 1000000 // 100 AS BIGINT) AS p_ppm
          FROM lifted WHERE r > 0 GROUP BY 1),
        ranked AS (SELECT event_type, p_ppm,
            CAST(row_number() OVER (ORDER BY p_ppm ASC, event_type ASC)
              AS BIGINT) AS rnk,
            CAST(count(*) OVER () AS BIGINT) AS m
          FROM p),
        marked AS (SELECT *, CASE WHEN p_ppm * m <= 100000 * rnk
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS passes
          FROM ranked)
        SELECT event_type, p_ppm, rnk, passes,
          CASE WHEN rnk <= max(CASE WHEN passes = 1 THEN rnk ELSE 0 END)
              OVER () THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS discovered
        FROM marked""")),

    // Paired t-test in the sqrt-free t² form (the within-subject design
    // the two-sample family lacks: abtest/welch compare groups, this
    // compares each user WITH THEMSELVES pre vs post the Jan-16 cut, so
    // between-user variance cancels): d = post − pre spend per (type,
    // user); t² = (Σd)²·(n−1) / (n·Σd² − (Σd)²) is an exact integer
    // rational — squares staged through DECIMAL (the CUPED rule), one
    // double division at presentation. Compare t2_micro with the
    // χ²₁ 95% bound (3.841459) exactly as q_agg_abtest does.
    ("q_agg_paired",
      (s: SparkSession, d: String) => {
        val cut = to_timestamp(lit("2024-01-16 00:00:00"))
        val u = t(s, d, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg((sum(when(col("ts") >= cut, cents(col("value")))
              .otherwise(0L)) -
            sum(when(col("ts") < cut, cents(col("value")))
              .otherwise(0L))).as("dd"))
        u.groupBy("event_type")
          .agg(count(lit(1)).as("n_users"), sum("dd").as("sum_d"),
            sum(expr("cast(dd as decimal(19,0)) * " +
              "cast(dd as decimal(19,0))")).as("sum_d2"))
          .withColumn("num", expr("cast(sum_d as decimal(20,0)) * " +
            "cast(sum_d as decimal(20,0)) * " +
            "cast(n_users - 1 as decimal(12,0))"))
          .withColumn("den", expr("cast(n_users as decimal(12,0)) * " +
            "cast(sum_d2 as decimal(24,0)) - " +
            "cast(sum_d as decimal(20,0)) * cast(sum_d as decimal(20,0))"))
          .select(col("event_type"), col("n_users"), col("sum_d"),
            floor(lit(1000) * col("sum_d").cast("double") /
              col("n_users").cast("double")).cast("long")
              .as("mean_d_milli"),
            floor(lit(1e6) * col("num").cast("double") /
              expr("cast(nullif(den, 0) as double)")).cast("long")
              .as("t2_micro"))
          .withColumn("significant",
            when(col("t2_micro") > 3841459L, 1L).otherwise(0L))
      },
      Some(s"""WITH u AS (SELECT event_type, user_id,
            CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN ${centsSql(""""value"""")} ELSE 0 END) AS BIGINT) -
            CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN ${centsSql(""""value"""")} ELSE 0 END) AS BIGINT)
              AS dd
          FROM events GROUP BY 1, 2),
        a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
            CAST(sum(dd) AS BIGINT) AS sum_d,
            sum(CAST(dd AS DECIMAL(19,0)) * CAST(dd AS DECIMAL(19,0)))
              AS sum_d2
          FROM u GROUP BY 1),
        b AS (SELECT *,
            CAST(sum_d AS DECIMAL(20,0)) * CAST(sum_d AS DECIMAL(20,0))
              * CAST(n_users - 1 AS DECIMAL(12,0)) AS num,
            CAST(n_users AS DECIMAL(12,0)) * CAST(sum_d2 AS DECIMAL(24,0))
              - CAST(sum_d AS DECIMAL(20,0))
                * CAST(sum_d AS DECIMAL(20,0)) AS den
          FROM a)
        SELECT event_type, n_users, sum_d,
          CAST(floor(1000 * CAST(sum_d AS DOUBLE) /
            CAST(n_users AS DOUBLE)) AS BIGINT) AS mean_d_milli,
          CAST(floor(1e6 * CAST(num AS DOUBLE) /
            CAST(nullif(den, 0) AS DOUBLE)) AS BIGINT) AS t2_micro,
          CASE WHEN CAST(floor(1e6 * CAST(num AS DOUBLE) /
              CAST(nullif(den, 0) AS DOUBLE)) AS BIGINT) > 3841459
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS significant
        FROM b""")),

    // CUPED variance reduction (Deng et al., WSDM 2013 — the standard
    // experimentation trick): per event type, each user's PRE-period
    // spend (before Jan 16) is the covariate for the POST-period metric;
    // θ = cov(pre, post)/var(pre) pooled, and the adjusted treatment
    // effect uses mean algebra (Δ_cuped = Δ_raw − θ·Δ_pre) so no
    // per-row float is ever summed — every input is an exact BIGINT cents
    // sum, cross products go through DECIMAL (overflow-safe to ~sf10;
    // promote widths beyond), and the few IEEE ops run in one fixed
    // order. var_reduction_ppm = floor(ρ²·1e6) — how much narrower the
    // confidence interval gets for free. One combine-enabled pass.
    ("q_agg_cuped",
      (s: SparkSession, d: String) => {
        val cut = to_timestamp(lit("2024-01-16 00:00:00"))
        val u = t(s, d, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(when(col("ts") < cut, cents(col("value")))
              .otherwise(0L)).as("x"),
            sum(when(col("ts") >= cut, cents(col("value")))
              .otherwise(0L)).as("y"))
          .withColumn("arm", col("user_id") % 2)
        u.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            // products through DECIMAL so Spark (non-ANSI would wrap a raw
            // BIGINT x*x silently) and DuckDB (would error) widen the same
            // way — any overflow past decimal(38) is loud in both engines
            sum(expr("cast(x as decimal(19,0)) * cast(x as decimal(19,0))"))
              .as("sxx"),
            sum(expr("cast(x as decimal(19,0)) * cast(y as decimal(19,0))"))
              .as("sxy"),
            sum(expr("cast(y as decimal(19,0)) * cast(y as decimal(19,0))"))
              .as("syy"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx1"),
            sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx0"),
            sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"))
          .withColumn("num", expr("cast(n as decimal(12,0)) * " +
            "cast(sxy as decimal(24,0)) - cast(sx as decimal(18,0)) * " +
            "cast(sy as decimal(18,0))"))
          .withColumn("den", expr("cast(n as decimal(12,0)) * " +
            "cast(sxx as decimal(24,0)) - cast(sx as decimal(18,0)) * " +
            "cast(sx as decimal(18,0))"))
          .withColumn("deny", expr("cast(n as decimal(12,0)) * " +
            "cast(syy as decimal(24,0)) - cast(sy as decimal(18,0)) * " +
            "cast(sy as decimal(18,0))"))
          .withColumn("theta", expr(
            "cast(num as double) / cast(nullif(den, 0) as double)"))
          // nullif on the arm counts (matching theta's den guard): a type
          // with users in only one arm yields NULL, not Infinity — Spark's
          // floor(inf) would silently give Long.MaxValue while DuckDB raises
          .withColumn("diff_raw", expr(
            "cast(sy1 as double) / cast(nullif(n1, 0) as double) - " +
            "cast(sy0 as double) / cast(nullif(n0, 0) as double)"))
          .withColumn("diff_pre", expr(
            "cast(sx1 as double) / cast(nullif(n1, 0) as double) - " +
            "cast(sx0 as double) / cast(nullif(n0, 0) as double)"))
          .select(col("event_type"), col("n").as("n_users"),
            floor(col("theta") * lit(1e6)).cast("long").as("theta_micro"),
            floor(col("diff_raw") * lit(1e4)).cast("long")
              .as("diff_raw_hundredths"),
            floor((col("diff_raw") - col("theta") * col("diff_pre"))
              * lit(1e4)).cast("long").as("diff_cuped_hundredths"),
            floor(expr("cast(num as double) * cast(num as double) / " +
              "(cast(nullif(den, 0) as double) * " +
              "cast(nullif(deny, 0) as double))") * lit(1e6)).cast("long")
              .as("var_reduction_ppm"))
      },
      Some(s"""WITH u AS MATERIALIZED (SELECT event_type, user_id,
            CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN ${centsSql(""""value"""")} ELSE 0 END) AS BIGINT) AS x,
            CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
              THEN ${centsSql(""""value"""")} ELSE 0 END) AS BIGINT) AS y,
            user_id % 2 AS arm
          FROM events GROUP BY 1, 2),
        g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
            sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
            sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
            CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
            CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0
          FROM u GROUP BY 1),
        d AS (SELECT *,
            CAST(n AS DECIMAL(12,0)) * CAST(sxy AS DECIMAL(24,0)) -
              CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS num,
            CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(24,0)) -
              CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0)) AS den,
            CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(24,0)) -
              CAST(sy AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0)) AS deny
          FROM g),
        e AS (SELECT *,
            CAST(num AS DOUBLE) / CAST(nullif(den, 0) AS DOUBLE) AS theta,
            CAST(sy1 AS DOUBLE) / CAST(nullif(n1, 0) AS DOUBLE) -
              CAST(sy0 AS DOUBLE) / CAST(nullif(n0, 0) AS DOUBLE) AS diff_raw,
            CAST(sx1 AS DOUBLE) / CAST(nullif(n1, 0) AS DOUBLE) -
              CAST(sx0 AS DOUBLE) / CAST(nullif(n0, 0) AS DOUBLE) AS diff_pre
          FROM d)
        SELECT event_type, n AS n_users,
          CAST(floor(theta * 1e6) AS BIGINT) AS theta_micro,
          CAST(floor(diff_raw * 1e4) AS BIGINT) AS diff_raw_hundredths,
          CAST(floor((diff_raw - theta * diff_pre) * 1e4) AS BIGINT)
            AS diff_cuped_hundredths,
          CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
            (CAST(nullif(den, 0) AS DOUBLE) *
             CAST(nullif(deny, 0) AS DOUBLE)) * 1e6) AS BIGINT)
            AS var_reduction_ppm
        FROM e""")),

    // Top conversion paths: each user's FIRST FIVE events (total
    // (ts, event_id) order — deterministic under ties) join into a path
    // string, then a combine-enabled census keeps paths shared by >= 2
    // users. Per-user state is bounded by the slice, not the stream; the
    // ordered fold replays in DuckDB as list(... ORDER BY)[1:5].
    ("q_seq_paths",
      (s: SparkSession, d: String) => {
        val p = t(s, d, "events").groupBy(col("user_id"))
          .agg(concat_ws(">", slice(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), 1, 5)).as("path"))
        p.groupBy("path").agg(count(lit(1)).as("n_users"))
          .filter(col("n_users") >= 2)
      },
      Some("""WITH p AS (SELECT user_id,
            array_to_string(
              (list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
          FROM events GROUP BY 1)
        SELECT path, count(*) AS n_users FROM p
        GROUP BY 1 HAVING count(*) >= 2""")),

    // Kaplan–Meier survival (user churn with right-censoring): lifetime =
    // days between a user's first and last event; users still active on
    // the corpus's final day are CENSORED, not churned — the distinction
    // naive churn rates get wrong. S(t) folds as exact micro-units
    // (S' = floor(S·(r−d)/r), r from a suffix sum over the ≤|days|
    // lifetime domain), so the whole curve is bit-identical cross-engine.
    // Corpus-sized work is one per-user aggregate; everything after runs
    // on the domain-bounded lifetime table.
    ("q_seq_survival",
      (s: SparkSession, d: String) => {
        val byday = t(s, d, "events").groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("d0"),
            max(to_date(col("ts"))).as("d1"))
        val mx = byday.agg(max("d1").as("mx"))
        val u = byday.crossJoin(broadcast(mx)).select(
          datediff(col("d1"), col("d0")).cast("long").as("t"),
          when(col("d1") < col("mx"), 1L).otherwise(0L).as("churn"))
        val tl = u.groupBy("t").agg(count(lit(1)).as("n"),
          sum("churn").as("d"))
        val wsuf = Window.orderBy(col("t").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val tr = tl.withColumn("r", sum("n").over(wsuf))
        val step = (acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) => {
          val prevS = coalesce(try_element_at(acc, lit(-1)).getField("s"),
            lit(1000000L))
          concat(acc, array(struct(
            x.getField("t").as("t"), x.getField("d").as("d"),
            x.getField("r").as("r"),
            floor((prevS * (x.getField("r") - x.getField("d")))
              .cast("double") / x.getField("r").cast("double"))
              .cast("long").as("s"))))
        }
        tr.agg(array_sort(collect_list(struct(col("t"), col("d"),
            col("r")))).as("xs"))
          .select(explode(aggregate(col("xs"),
            array().cast("array<struct<t:bigint,d:bigint,r:bigint," +
              "s:bigint>>"), step)).as("e"))
          .select(col("e.t").as("t"), col("e.d").as("n_churned"),
            col("e.r").as("n_at_risk"), col("e.s").as("surv_micro"))
      },
      Some("""WITH byday AS (SELECT user_id,
            min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
          FROM events GROUP BY 1),
        mx AS (SELECT max(d1) AS mx FROM byday),
        u AS (SELECT CAST(d1 - d0 AS BIGINT) AS t,
            CASE WHEN d1 < mx THEN 1 ELSE 0 END AS churn
          FROM byday, mx),
        tl AS (SELECT t, count(*) AS n, CAST(sum(churn) AS BIGINT) AS d
          FROM u GROUP BY 1),
        tr AS (SELECT t, d, CAST(sum(n) OVER (ORDER BY t
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
            AS r
          FROM tl),
        g AS (SELECT list({'t': t, 'd': d, 'r': r} ORDER BY t) AS xs
          FROM tr),
        f AS (SELECT list_reduce(
            list_prepend(
              CAST([] AS STRUCT(t BIGINT, d BIGINT, r BIGINT,
                s BIGINT)[]),
              list_transform(xs, x -> [{'t': x.t, 'd': x.d, 'r': x.r,
                's': CAST(0 AS BIGINT)}])),
            (acc, e) -> list_append(acc, {'t': e[1].t, 'd': e[1].d,
              'r': e[1].r,
              's': CAST(floor(CAST(coalesce(acc[-1].s, 1000000)
                  * (e[1].r - e[1].d) AS DOUBLE)
                / CAST(e[1].r AS DOUBLE)) AS BIGINT)})) AS res
          FROM g)
        SELECT q.x.t AS t, q.x.d AS n_churned, q.x.r AS n_at_risk,
          q.x.s AS surv_micro
        FROM f, UNNEST(res) AS q(x)""")),

    // RFM segmentation (recency / frequency / monetary quintiles): exact
    // global ranks for each dimension come from three range-partitioned
    // prefix scans (rank = exclusive count prefix + 1 — no corpus-sized
    // ntile window), quintile = floor(5·(rank−1)/n)+1 with recency
    // inverted (fresher = higher). The output is the classic 5x5x5 cell
    // census with per-cell revenue — the marketing-segmentation rollup.
    ("q_seq_rfm",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val anchor = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
        val cust = o.groupBy(col("o_custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last"),
            count(lit(1)).as("f"), sum(cents(col("o_totalprice"))).as("m"))
          .crossJoin(broadcast(anchor))
          .withColumn("r", datediff(col("mx"), col("last")).cast("long"))
          .select("o_custkey", "r", "f", "m")
          // lazy cut (r13): the count below materializes it, so the score
          // chain reads the cache instead of re-running the orders rollup
          .localCheckpoint(false)
        val n = cust.count() // one scalar driver action, like q_text_index
        def score(df: DataFrame, metric: String, out: String,
            invert: Boolean): DataFrame = {
          val ranked = graft.ops.Prefix.runningOffsetsOrdered(
            df.withColumn("one", lit(1L)),
            Seq(metric, "o_custkey"), "one")
          val b = floor((col("offset") * 5).cast("double") / n.toDouble)
            .cast("long") + 1L
          ranked.withColumn(out, if (invert) lit(6L) - b else b)
            .drop("one", "offset")
        }
        val scored = score(score(score(cust, "r", "score_r", invert = true),
          "f", "score_f", invert = false), "m", "score_m", invert = false)
        scored.groupBy("score_r", "score_f", "score_m")
          .agg(count(lit(1)).as("n_customers"), sum("m").as("revenue_cents"))
      },
      Some(s"""WITH cust AS (SELECT o_custkey,
            max(CAST(o_orderdate AS DATE)) AS last, count(*) AS f,
            CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS m
          FROM orders GROUP BY 1),
        a AS (SELECT max(last) AS mx FROM cust),
        base AS (SELECT o_custkey, CAST(mx - last AS BIGINT) AS r, f, m
          FROM cust, a),
        n AS (SELECT count(*) AS nn FROM base),
        rk AS (SELECT o_custkey, r, f, m,
            row_number() OVER (ORDER BY r, o_custkey) - 1 AS rr,
            row_number() OVER (ORDER BY f, o_custkey) - 1 AS rf,
            row_number() OVER (ORDER BY m, o_custkey) - 1 AS rm
          FROM base),
        sc AS (SELECT o_custkey, m,
            6 - (CAST(floor(CAST(rr * 5 AS DOUBLE) / nn) AS BIGINT) + 1)
              AS score_r,
            CAST(floor(CAST(rf * 5 AS DOUBLE) / nn) AS BIGINT) + 1
              AS score_f,
            CAST(floor(CAST(rm * 5 AS DOUBLE) / nn) AS BIGINT) + 1
              AS score_m
          FROM rk, n)
        SELECT score_r, score_f, score_m, count(*) AS n_customers,
          CAST(sum(m) AS BIGINT) AS revenue_cents
        FROM sc GROUP BY 1, 2, 3""")),

    // Peak concurrency by sweep line: each user-day session becomes a
    // +1/−1 delta at its first/last event, the GLOBAL running sum over
    // (ts, start-before-end, user) comes from the range-partitioned
    // prefix scan (Prefix.runningOffsetsOrdered — no single-partition
    // window over the corpus-sized delta stream), and the per-day max of
    // offset+delta is the day's peak concurrent-session count. Sessions
    // never span days, so the running sum self-resets at day boundaries.
    ("q_agg_concurrency",
      (s: SparkSession, d: String) => {
        val sess = t(s, d, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        val deltas = sess.select(col("day"), col("t0").as("at"),
            lit(1L).as("delta"), lit(0L).as("dord"), col("user_id"))
          .union(sess.select(col("day"), col("t1").as("at"),
            lit(-1L).as("delta"), lit(1L).as("dord"), col("user_id")))
        graft.ops.Prefix.runningOffsetsOrdered(deltas,
            Seq("at", "dord", "user_id"), "delta")
          .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
          .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L))
              .as("n_sessions"),
            max(col("offset") + col("delta")).as("peak_concurrency"))
      },
      Some("""WITH sess AS (SELECT user_id, CAST(ts AS DATE) AS day,
            min(ts) AS t0, max(ts) AS t1
          FROM events GROUP BY 1, 2),
        d AS (SELECT day, t0 AS at, 1 AS delta, 0 AS dord, user_id
            FROM sess
          UNION ALL SELECT day, t1, -1, 1, user_id FROM sess),
        o AS (SELECT day, delta,
            sum(delta) OVER (ORDER BY at, dord, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
          FROM d)
        SELECT strftime(day, '%Y-%m-%d') AS day,
          CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_sessions,
          CAST(max(conc) AS BIGINT) AS peak_concurrency
        FROM o GROUP BY 1""")),

    ("q_agg_sessionize",
      // batch sessionization: a session breaks after a 30-min gap. lag ->
      // flag -> running sum is the canonical two-window composition; both
      // windows share the same (user_id, ts) partitioning+ordering so Spark
      // plans ONE shuffle + one sort. Gaps compare in exact integer micros.
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val gap = unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)
        val isNew = when(gap.isNull || gap > 1800L * 1000000L, 1L)
          .otherwise(0L)
        t(s, d, "events")
          .withColumn("session_id", sum(isNew).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("t_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("t_end"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, ts,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
          FROM events),
        s AS (SELECT user_id, event_id, ts,
          CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000
                        THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM g)
        SELECT user_id, session_id, count(*) AS n_events,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
          strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS t_end
        FROM s GROUP BY 1, 2""")),

    // Same sessions through Spark's BUILT-IN session_window (merging
    // event-time sessions with a 30-min gap) — pinned to the identical
    // lag->flag->running-sum oracle as q_agg_sessionize, so the built-in
    // and hand-rolled routes are proven equivalent
    ("q_agg_sessionwindow",
      (s: SparkSession, d: String) => t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("t_start"))
        .select(col("user_id"), col("t_start"), col("n_events")),
      Some("""WITH g AS (SELECT user_id, event_id, ts,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
          FROM events),
        s AS (SELECT user_id, ts,
          -- session_window's span is [ts, ts+gap) EXCLUSIVE: an event
          -- exactly 30 min later starts a NEW session (>=), where the
          -- hand-rolled q_agg_sessionize merges it (>)
          CAST(sum(CASE WHEN gap IS NULL OR gap >= 1800000000
                        THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM g)
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
          count(*) AS n_events
        FROM s GROUP BY user_id, session_id""")),

    ("q_agg_pricing",
      // all money runs as floor-quantized BIGINT cents (see `cents` scaladoc:
      // double→decimal casts of RAW doubles are cross-engine-unstable on the
      // half-cent digit); sums are exact integers, presentation divides by a
      // double literal — one IEEE op, bit-identical in both engines
      (s: SparkSession, d: String) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("sum_base"),
          (sum(cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))) / lit(10000.0))
            .as("sum_disc"),
          count(lit(1)).as("n")),
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(sum(${centsSql("l_quantity")}) AS BIGINT) / 100.0 AS sum_qty,
        CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) / 100.0
          AS sum_base,
        CAST(sum(${centsSql("l_extendedprice")} *
                 (100 - ${centsSql("l_discount")})) AS BIGINT) / 10000.0
          AS sum_disc,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // TPC-H Q5-shaped 6-table join: two broadcast dim chains feeding the
    // lineitem-orders fact join, revenue in exact integer cents. Catalyst
    // broadcasts region/nation/supplier/customer and leaves ONE shuffle
    // (the fact-fact join) + the final group-by
    // part-dimension revenue breakdown (TPC-H Q14 shape): fact joins the
    // broadcast part dim on l_partkey, one shuffle for the 6-type group —
    // also the only query exercising the `part` fixture table
    ("q_join_part_revenue",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type"))
          .agg((sum(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount")))) / lit(10000.0))
              .as("revenue"),
            count(lit(1)).as("n_items"),
            (sum(cents(col("p_retailprice"))) / lit(100.0)).as("retail"))
      },
      Some(s"""SELECT p_type,
          CAST(sum(${centsSql("l_extendedprice")} *
                   (100 - ${centsSql("l_discount")})) AS BIGINT) / 10000.0
            AS revenue,
          count(*) AS n_items,
          CAST(sum(${centsSql("p_retailprice")}) AS BIGINT) / 100.0 AS retail
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1""")),

    // TPC-H Q22 shape (scalar subquery + anti join): positive-balance
    // customers above the average positive balance with no RECENT orders
    // (dormant since 2000-01-01), by nation. Balances compared in exact
    // integer cents; the scalar threshold is one broadcast row; the anti
    // join is the only fact shuffle
    // Null-safe equi-join (<=>): NULL keys MATCH each other — the join
    // semantics entity-resolution and late-dimension pipelines need when
    // "unknown" is a legitimate key value. EqualNullSafe is still an
    // equi-join key for Spark (hash join, never a nested loop; the plan
    // pin asserts it), unlike the OR-of-IS-NULL rewrite users reach for.
    ("q_join_nullsafe",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").select(
          when(col("c_custkey") % 7 === 0, lit(null))
            .otherwise(col("c_nationkey")).cast("long").as("ck"),
          col("c_custkey"))
        val su = t(s, d, "supplier").select(
          when(col("s_suppkey") % 5 === 0, lit(null))
            .otherwise(col("s_nationkey")).cast("long").as("sk"),
          col("s_suppkey"))
        c.join(su, col("ck") <=> col("sk"))
          .groupBy(coalesce(col("ck"), lit(-1L)).as("nation"))
          .agg(count(lit(1)).as("n_pairs"),
            count_distinct(col("c_custkey")).as("n_customers"),
            count_distinct(col("s_suppkey")).as("n_suppliers"))
      },
      Some("""WITH c AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE CAST(c_nationkey AS BIGINT) END AS ck, c_custkey
          FROM customer),
        su AS (SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
              ELSE CAST(s_nationkey AS BIGINT) END AS sk, s_suppkey
          FROM supplier)
        SELECT coalesce(ck, -1) AS nation, count(*) AS n_pairs,
          count(DISTINCT c_custkey) AS n_customers,
          count(DISTINCT s_suppkey) AS n_suppliers
        FROM c JOIN su ON ck IS NOT DISTINCT FROM sk
        GROUP BY 1""")),

    // STL-lite decomposition of the daily revenue series: trend = centered
    // 7-day window sum (kept x7 — no division), dev7 = 7·x − trend
    // (exact), seasonal = each weekday's mean dev7 floor-quantized to
    // micro-units, residual = dev7·1e6 − seasonal (exact BIGINTs all the
    // way). Both windows run over the calendar-bounded day table — the
    // documented constant-state exception — and the weekday means join
    // back as a 7-row broadcast.
    ("q_agg_stl",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"),
            (weekday(col("ts")) + 1).as("isodow"))
          .agg(sum(cents(col("value"))).as("x"))
        val w = Window.orderBy(col("day").asc).rowsBetween(-3, 3)
        val tr = daily
          .withColumn("n7", count(lit(1)).over(w))
          .withColumn("sum7", sum("x").over(w))
          .filter(col("n7") === 7)
          .withColumn("dev7", col("x") * 7 - col("sum7"))
        val wd = tr.groupBy("isodow")
          .agg(floor(sum(col("dev7")).cast("double") * 1e6 /
            count(lit(1)).cast("double")).cast("long").as("seasonal_micro"))
        tr.join(broadcast(wd), "isodow")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("isodow").cast("int").as("isodow"), col("x"),
            col("sum7").as("trend_x7"), col("dev7"),
            col("seasonal_micro"),
            (col("dev7") * 1000000L - col("seasonal_micro"))
              .as("residual_micro"))
      },
      Some(s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
            isodow(ts) AS isodow,
            CAST(sum(${centsSql("\"value\"")}) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        tr AS (SELECT day, isodow, x,
            count(*) OVER wnd AS n7, CAST(sum(x) OVER wnd AS BIGINT) AS sum7
          FROM daily
          WINDOW wnd AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
            AND 3 FOLLOWING)),
        dv AS (SELECT day, isodow, x, sum7, x * 7 - sum7 AS dev7 FROM tr
          WHERE n7 = 7),
        wd AS (SELECT isodow,
            CAST(floor(CAST(sum(dev7) AS DOUBLE) * 1e6 /
              CAST(count(*) AS DOUBLE)) AS BIGINT) AS seasonal_micro
          FROM dv GROUP BY 1)
        SELECT strftime(day, '%Y-%m-%d') AS day,
          CAST(dv.isodow AS INT) AS isodow, x, sum7 AS trend_x7, dev7,
          seasonal_micro,
          dev7 * 1000000 - seasonal_micro AS residual_micro
        FROM dv JOIN wd ON dv.isodow = wd.isodow""")),

    ("q_join_noorders",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"))
        val pos = c.filter(col("bal_cents") > 0)
        val thr = pos.agg((sum("bal_cents").cast("double") /
          count(lit(1))).as("thr"))
        pos.crossJoin(broadcast(thr))
          .filter(col("bal_cents") > col("thr"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"),
            sum("bal_cents").as("bal_cents_sum"))
      },
      Some(s"""WITH c AS (SELECT c_custkey, c_nationkey,
            ${centsSql("c_acctbal")} AS bal_cents FROM customer),
          t AS (SELECT CAST(CAST(sum(bal_cents) AS BIGINT) AS DOUBLE)
              / count(*) AS thr FROM c WHERE bal_cents > 0)
        SELECT c_nationkey, count(*) AS n_cust,
          CAST(sum(bal_cents) AS BIGINT) AS bal_cents_sum
        FROM c, t
        WHERE bal_cents > 0 AND bal_cents > thr
          AND NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1""")),

    // TPC-H Q17 shape (aggregate-compare join): lineitems below a fifth of
    // their part's average quantity. The test 5*qty*cnt < sum multiplies
    // the avg through so every comparison is an exact BIGINT
    ("q_join_lowqty",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem").select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_cents"))
        val pp = li.groupBy("l_partkey")
          .agg(sum("qty").as("sq"), count(lit(1)).as("cq"))
        li.join(pp, Seq("l_partkey"))
          .filter(col("qty") * 5 * col("cq") < col("sq"))
          .agg(count(lit(1)).as("n_items"),
            (sum("price_cents") / lit(100.0)).as("total_price"))
      },
      Some(s"""WITH li AS (SELECT l_partkey,
            CAST(l_quantity AS BIGINT) AS qty,
            ${centsSql("l_extendedprice")} AS price_cents FROM lineitem),
          pp AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq,
            count(*) AS cq FROM li GROUP BY 1)
        SELECT count(*) AS n_items,
          CAST(sum(price_cents) AS BIGINT) / 100.0 AS total_price
        FROM li JOIN pp USING (l_partkey)
        WHERE qty * 5 * cq < sq""")),

    // Inter-purchase interval per customer: days between consecutive
    // orders (lag window, customer-bounded state), rolled up to average /
    // max gap and order count — the churn-risk feature every retention
    // model starts from. Gap arithmetic on epoch DAYS (exact integers);
    // the average presents via one floor-quantized division.
    ("q_join_ordergap",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, d, "orders")
          .withColumn("gap_days",
            datediff(col("o_orderdate"),
              lag(col("o_orderdate"), 1).over(w)).cast("long"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum("gap_days").as("sum_gap_days"),
            max("gap_days").as("max_gap_days"),
            (floor(lit(1e6) * sum("gap_days").cast("double") /
              greatest(count(col("gap_days")), lit(1L)).cast("double")) /
              lit(1e6)).as("avg_gap_days"))
      },
      Some("""WITH g AS (SELECT o_custkey,
            CAST(date_diff('day', lag(o_orderdate) OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate ASC, o_orderkey ASC), o_orderdate)
              AS BIGINT) AS gap_days
          FROM orders)
        SELECT o_custkey, count(*) AS n_orders,
          CAST(sum(gap_days) AS BIGINT) AS sum_gap_days,
          max(gap_days) AS max_gap_days,
          floor(1e6 * CAST(CAST(sum(gap_days) AS BIGINT) AS DOUBLE) /
            CAST(greatest(count(gap_days), 1) AS DOUBLE)) / 1e6
            AS avg_gap_days
        FROM g GROUP BY 1""")),

    // TPC-H Q2 shape (correlated-min decorrelation): for each small part,
    // the supplier(s) offering the minimum price. The correlated scalar
    // subquery decorrelates to groupBy-min + equi-join back (ties kept, as
    // in Q2); part/supplier/nation are broadcast dims, so the only fact
    // shuffles are the two offer aggregations. Prices compared in exact
    // integer cents.
    ("q_join_mincost",
      (s: SparkSession, d: String) => {
        // lazy cut (r13): off feeds the per-part min AND the offer join
        val off = t(s, d, "lineitem")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(cents(col("l_extendedprice"))).as("offer_cents"))
          .localCheckpoint(false)
        val mo = off.groupBy("l_partkey")
          .agg(min("offer_cents").as("min_cents"))
        off.join(mo, Seq("l_partkey"))
          .filter(col("offer_cents") === col("min_cents"))
          .join(broadcast(t(s, d, "part").filter(col("p_size") <= 5)),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("p_partkey"), col("p_type"), col("s_name"),
            col("n_name"), (col("min_cents") / lit(100.0)).as("min_price"))
      },
      Some(s"""WITH off AS (SELECT l_partkey, l_suppkey,
            min(${centsSql("l_extendedprice")}) AS offer_cents
          FROM lineitem GROUP BY 1, 2),
          mo AS (SELECT l_partkey, min(offer_cents) AS min_cents
          FROM off GROUP BY 1)
        SELECT p_partkey, p_type, s_name, n_name,
          CAST(min_cents AS BIGINT) / 100.0 AS min_price
        FROM off JOIN mo USING (l_partkey)
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE offer_cents = min_cents AND p_size <= 5""")),

    // TPC-H Q18 shape (HAVING-filtered semi enrichment): orders whose
    // total quantity exceeds the threshold, with their customer. The
    // lineitem aggregate is map-side combinable and its survivors are few,
    // so the enrichment join broadcasts the AGGREGATE, not the fact table;
    // order dates render as strings for cross-engine byte equality.
    // "Blocking supplier" analysis — the TPC-H Q21 shape, the hardest
    // classic correlated form (EXISTS + NOT EXISTS both on fact-fact
    // self-joins): suppliers whose late lines (shipped > 30 days after
    // the order date) were the ONLY late ones in a multi-supplier
    // finished order. The ENGINE runs the scalable aggregate rewrite —
    // ONE order-level combine-enabled aggregate (distinct supps, distinct
    // late supps) re-joined to the late lines, so the corpus is scanned
    // twice and shuffled on the order key instead of walking two
    // correlated self-joins; the ORACLE runs the textbook doubly-
    // correlated EXISTS/NOT-EXISTS form, so the hash match PROVES the
    // rewrite equivalent, not merely self-consistent. late_supps = 1
    // together with l1 late forces "the late supplier is me" with no
    // third join. Dimension joins (supplier, nation gate) broadcast.
    ("q_join_waiting",
      (s: SparkSession, d: String) => {
        val lo = t(s, d, "lineitem")
          .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
            (col("l_shipdate") >
              date_add(col("o_orderdate").cast("date"), 30))
              .cast("long").as("late"))
        val stats = lo.groupBy("ok").agg(
          countDistinct(col("sk")).as("n_supps"),
          countDistinct(when(col("late") === 1L, col("sk")))
            .as("late_supps"))
        val waiting = lo.filter(col("late") === 1L)
          .join(stats.filter(col("n_supps") >= 2 &&
            col("late_supps") === 1), Seq("ok"))
        // group by the KEY, not the name: supplier names repeat across
        // the sf1 fixture's key-offset copies (and real-world names
        // collide too) — the name is a label, the key is the identity
        waiting.groupBy("sk").agg(count(lit(1)).as("numwait"))
          .join(broadcast(t(s, d, "supplier")
            .join(t(s, d, "nation"),
              col("s_nationkey") === col("n_nationkey"))
            .filter(col("n_name").isin("NATION_0", "NATION_1",
              "NATION_2"))
            .select(col("s_suppkey"), col("s_name"))),
            col("sk") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("numwait"))
      },
      Some("""WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate
          FROM lineitem),
        o AS (SELECT o_orderkey, o_orderdate FROM orders
          WHERE o_orderstatus = 'F')
        SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM l l1
        JOIN o ON o.o_orderkey = l1.l_orderkey
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
          AND l1.l_shipdate > CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
          AND EXISTS (SELECT 1 FROM l l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l l3 JOIN o o3
              ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > CAST(o3.o_orderdate AS DATE) + INTERVAL 30 DAY)
        GROUP BY 1, 2""")),

    ("q_join_bigorders",
      (s: SparkSession, d: String) => {
        val big = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        t(s, d, "orders")
          .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
            (cents(col("o_totalprice")) / lit(100.0)).as("total_price"),
            col("sum_qty"))
      },
      Some(s"""WITH big AS (SELECT l_orderkey,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY 1 HAVING sum_qty > 300)
        SELECT c_name, c_custkey, o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS order_date,
          CAST(${centsSql("o_totalprice")} AS BIGINT) / 100.0
            AS total_price,
          sum_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey""")),

    // Market-basket association mining: co-ordered part pairs with support
    // and lift. The pair fan-out is per-ORDER-bounded (an order carries at
    // most a handful of lines, so the self-join emits <= C(lines,2) rows
    // per order — corpus-LINEAR, unlike a part-keyed pairing which would
    // square on popular parts); the global order count is one broadcast
    // row, and lift renders via the floor(1e6*x)/1e6 fixed-point both
    // engines compute identically.
    ("q_basket_lift",
      (s: SparkSession, d: String) => {
        // lazy cut (r13): items feeds both self-join sides, the totals
        // aggregate and the order count — one distinct pass, not four
        val items = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
          .localCheckpoint(false)
        val pairs = items.as("a").join(items.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
          .agg(count(lit(1)).as("n_co"))
          .filter(col("n_co") >= 3)
        val totals = items.groupBy("l_partkey")
          .agg(count(lit(1)).as("n_part"))
        val nOrders = items.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_orders"))
        pairs
          .join(totals.select(col("l_partkey").as("p1"),
            col("n_part").as("n1")), Seq("p1"))
          .join(totals.select(col("l_partkey").as("p2"),
            col("n_part").as("n2")), Seq("p2"))
          .crossJoin(broadcast(nOrders))
          .withColumn("lift",
            floor(lit(1e6) * (col("n_co") * col("n_orders")).cast("double") /
              (col("n1") * col("n2")).cast("double")) / lit(1e6))
          .select("p1", "p2", "n_co", "n1", "n2", "lift")
      },
      Some("""WITH i AS (SELECT DISTINCT l_orderkey, l_partkey
            FROM lineitem),
          pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
              count(*) AS n_co
            FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 3),
          tot AS (SELECT l_partkey, count(*) AS n_part FROM i GROUP BY 1),
          no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM i)
        SELECT p1, p2, n_co, t1.n_part AS n1, t2.n_part AS n2,
          floor(1e6 * CAST(n_co * n_orders AS DOUBLE) /
            CAST(t1.n_part * t2.n_part AS DOUBLE)) / 1e6 AS lift
        FROM pr JOIN tot t1 ON p1 = t1.l_partkey
                JOIN tot t2 ON p2 = t2.l_partkey
                CROSS JOIN no""")),

    // Supply-concentration profile (Herfindahl index per part): squared
    // supplier shares sum to ss/tot² — kept as exact BIGINT numerator and
    // denominator through both combine-enabled aggregates, with ONE double
    // division at presentation. Two map-side-combining groupBys, no
    // window, no join: the shape a 100 TB concentration report wants.
    // Concentration cut ("how many top customers cover 80% of a segment's
    // revenue"): per-customer revenue in exact cents, ranked desc inside
    // each segment by the RANGE-PARTITIONED prefix scan
    // (Prefix.runningOffsetsBy, 5 segment groups — well inside its
    // low-cardinality contract) instead of Window.partitionBy(segment),
    // so no task ever buffers a whole segment — the hot-group-safe form
    // of the cumulative-share analytic. Membership is the exact integer
    // test 5·offset < 4·total on the EXCLUSIVE prefix, so the minimal
    // cover always includes the row that crosses the 80% line.
    ("q_agg_pareto_cut",
      (s: SparkSession, d: String) => {
        val rev = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("rev"))
        val c = t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))
          .join(rev, col("c_custkey") === col("o_custkey"))
          .select(col("seg"), col("c_custkey"), col("rev"))
          // lazy cut (r13): c feeds the rank walk AND the totals; the
          // walk's internal checkpoint is the materializing action
          .localCheckpoint(false)
        val ranked = graft.ops.Prefix.runningOffsetsBy(
          c.withColumn("negrev", -col("rev")),
          "seg", Seq("negrev", "c_custkey"), "rev")
        val totals = c.groupBy("seg")
          .agg(sum("rev").as("total_rev"), count(lit(1)).as("n_customers"))
        ranked.join(broadcast(totals), "seg")
          .filter(col("offset") * 5 < col("total_rev") * 4)
          .groupBy(col("seg"), col("n_customers"), col("total_rev"))
          .agg(count(lit(1)).as("n_cover"), sum("rev").as("cover_rev"))
          .select(col("seg"), col("n_customers"), col("total_rev"),
            col("n_cover"), col("cover_rev"))
      },
      Some(s"""WITH rev AS (SELECT o_custkey AS k,
            CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        c AS (SELECT c_mktsegment AS seg, c_custkey, rev
          FROM customer JOIN rev ON c_custkey = k),
        o AS (SELECT seg, c_custkey, rev,
            COALESCE(sum(rev) OVER (PARTITION BY seg
              ORDER BY rev DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
            sum(rev) OVER (PARTITION BY seg) AS total,
            count(*) OVER (PARTITION BY seg) AS n_customers
          FROM c)
        SELECT seg, CAST(n_customers AS BIGINT) AS n_customers,
          CAST(total AS BIGINT) AS total_rev,
          CAST(count(*) AS BIGINT) AS n_cover,
          CAST(sum(rev) AS BIGINT) AS cover_rev
        FROM o WHERE 5 * off < 4 * total
        GROUP BY seg, n_customers, total""")),

    // Gini inequality coefficient per segment, on exact ranks: the
    // rank-weighted sum Σ rank·x comes from the range-partitioned grouped
    // prefix scan (rank = exclusive count prefix + 1 — no per-segment
    // window), and G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) evaluates with
    // exact BIGINT numerators and one floor-quantized IEEE division.
    // Complements q_agg_hhi (share concentration) with the rank-based
    // inequality measure. Ties broken by customer id — deterministic and
    // the standard midrank-free formulation.
    ("q_profile_gini",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").select(col("c_mktsegment").as("seg"),
            col("c_custkey"), cents(col("c_acctbal")).as("x"))
          .filter(col("x") >= 0)
          .withColumn("one", lit(1L))
        val ranked = graft.ops.Prefix.runningOffsetsBy(c, "seg",
            Seq("x", "c_custkey"), "one")
          .withColumn("rank", col("offset") + 1L)
        val g = ranked.groupBy("seg").agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum(col("rank") * col("x")).as("srx"))
        g.select(col("seg"), col("n"), col("sx"),
          floor((lit(2L) * col("srx") - (col("n") + 1) * col("sx"))
            .cast("double") * 1e6 /
            (col("n") * col("sx")).cast("double")).cast("long")
            .as("gini_ppm"))
      },
      Some(s"""WITH c AS (SELECT c_mktsegment AS seg, c_custkey,
            ${centsSql("c_acctbal")} AS x
          FROM customer WHERE ${centsSql("c_acctbal")} >= 0),
        r AS (SELECT seg, x,
            row_number() OVER (PARTITION BY seg ORDER BY x, c_custkey)
              AS rank
          FROM c),
        g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS sx,
            CAST(sum(rank * x) AS BIGINT) AS srx
          FROM r GROUP BY 1)
        SELECT seg, n, sx,
          CAST(floor(CAST(2 * srx - (n + 1) * sx AS DOUBLE) * 1e6 /
            CAST(n * sx AS DOUBLE)) AS BIGINT) AS gini_ppm
        FROM g""")),

    ("q_agg_hhi",
      (s: SparkSession, d: String) => {
        val per = t(s, d, "lineitem")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("q"))
        per.groupBy("l_partkey")
          .agg(count(lit(1)).as("n_suppliers"),
            sum(col("q") * col("q")).as("ss"),
            sum(col("q")).as("tot"))
          .withColumn("hhi",
            floor(lit(1e6) * col("ss").cast("double") /
              (col("tot") * col("tot")).cast("double")) / lit(1e6))
      },
      Some("""WITH per AS (SELECT l_partkey, l_suppkey,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY 1, 2)
        SELECT l_partkey, count(*) AS n_suppliers,
          CAST(sum(q * q) AS BIGINT) AS ss,
          CAST(sum(q) AS BIGINT) AS tot,
          floor(1e6 * CAST(CAST(sum(q * q) AS BIGINT) AS DOUBLE) /
            CAST(CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT) AS DOUBLE))
            / 1e6 AS hhi
        FROM per GROUP BY 1""")),

    // Runtime-filter semi-join: a Bloom filter built over the filtered
    // dimension's keys reaches the FACT SCAN as one broadcast row, so
    // non-matching orders drop in the scan stage — before any exchange —
    // and the exact broadcast join afterwards removes the false positives.
    // The explicit form of the sideways information passing a 100 TB
    // selective-dim join lives on (the fact side never shuffles rows the
    // dim cannot match). The oracle is the plain semi-join — the bloom is
    // semantically transparent by construction.
    ("q_join_bloom_prune",
      (s: SparkSession, d: String) => {
        val dim = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING" &&
            col("c_acctbal") > 9000)
          .select(col("c_custkey"))
        val bits = dim.agg(graft.plans.GraftExpressions.bloom_bits(
          col("c_custkey").cast("string"), 1 << 17, 4).as("bits"))
        t(s, d, "orders")
          .crossJoin(broadcast(bits))
          .filter(graft.plans.GraftExpressions.bloom_contains(col("bits"),
            col("o_custkey").cast("string"), 1 << 17, 4))
          .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            (sum(cents(col("o_totalprice"))) / lit(100.0)).as("total_price"))
      },
      Some(s"""SELECT o_orderpriority, count(*) AS n_orders,
          CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) / 100.0
            AS total_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
          WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000)
        GROUP BY 1""")),

    ("q_join_region_revenue",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        val c = t(s, d, "customer")
        val su = t(s, d, "supplier")
        val n = t(s, d, "nation")
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg((sum(cents(col("l_extendedprice")) *
            (lit(100L) - cents(col("l_discount")))) / lit(10000.0))
            .as("revenue"))
      },
      Some(s"""SELECT n_name,
        CAST(sum(${centsSql("l_extendedprice")} *
                 (100 - ${centsSql("l_discount")})) AS BIGINT) / 10000.0
          AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name""")),

    // grouping sets: ROLLUP over (returnflag, linestatus) with an explicit
    // level marker — partial-aggregable, one shuffle for every level
    ("q_agg_rollup",
      (s: SparkSession, d: String) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("lvl")),
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(sum(${centsSql("l_quantity")}) AS BIGINT) / 100.0 AS sum_qty,
          count(*) AS n,
          CAST(GROUPING(l_returnflag) AS BIGINT) * 2 +
            CAST(GROUPING(l_linestatus) AS BIGINT) AS lvl
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // EXPLICIT grouping sets (the third grouping-analytics form next to
    // ROLLUP/CUBE): per-returnflag and per-linestatus marginals in ONE
    // partial-aggregated pass — no union of two scans
    ("q_agg_groupingsets",
      (s: SparkSession, d: String) => t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg((sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("lvl")),
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(sum(${centsSql("l_quantity")}) AS BIGINT) / 100.0 AS sum_qty,
          count(*) AS n,
          CAST(GROUPING(l_returnflag) AS BIGINT) * 2 +
            CAST(GROUPING(l_linestatus) AS BIGINT) AS lvl
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")),

    // 3-way join, small dims broadcast; revenue per market segment
    ("q_join_revenue",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            (sum(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount")))) / lit(10000.0))
              .as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
      },
      Some(s"""SELECT c_mktsegment,
        CAST(sum(${centsSql("l_extendedprice")} *
                 (100 - ${centsSql("l_discount")})) AS BIGINT) / 10000.0
          AS revenue,
        count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // SLIDING event-time windows (1 h window, 30 min slide): every event
    // lands in exactly two windows — Spark's window() explodes to the
    // covering windows before the aggregate, the same shape the oracle
    // reproduces with an explicit two-start UNNEST
    ("q_agg_sliding",
      (s: SparkSession, d: String) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("min_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("n_events"), col("min_value")),
      Some("""WITH slid AS (SELECT event_type, "value",
          unnest([date_trunc('hour', ts) +
              CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                   ELSE INTERVAL 0 MINUTE END,
            date_trunc('hour', ts) +
              CASE WHEN minute(ts) >= 30 THEN INTERVAL 0 MINUTE
                   ELSE -INTERVAL 30 MINUTE END]) AS ws
          FROM events)
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
          count(*) AS n_events, min("value") AS min_value
        FROM slid GROUP BY 1, 2""")),

    // Full cube over the two flag dimensions — all four grouping levels in
    // one pass (Spark expands to a single partial-aggregated plan)
    ("q_agg_cube",
      (s: SparkSession, d: String) => t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("lvl")),
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(sum(${centsSql("l_quantity")}) AS BIGINT) / 100.0 AS sum_qty,
          count(*) AS n,
          CAST(GROUPING(l_returnflag) AS BIGINT) * 2 +
            CAST(GROUPING(l_linestatus) AS BIGINT) AS lvl
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // Pivot (long -> wide): daily event counts, one column per event type.
    // The value list is DECLARED, not discovered — an undeclared pivot runs
    // an extra distinct job over the fact table just to learn its columns,
    // and a 100 TB scan to find five known strings is waste. Absent
    // (day, type) cells are 0, not null, matching the conditional-aggregate
    // formulation the pivot rewrites to.
    // Price-index suite (Laspeyres / Paasche / Fisher) — the composed
    // index-number analytics a pricing/finance warehouse publishes:
    // per (part, year) unit prices in cents (floor of the exact
    // cents-per-unit ratio — deterministic, documents the quantization),
    // base year = first year, per-year basket = parts present in BOTH
    // periods. Laspeyres weights by base quantities, Paasche by current,
    // Fisher is their geometric mean (one sqrt — IEEE-identical). All
    // four index sums are BIGINT-exact (cents × quantities stay < 2^53
    // per term and < 2^63 summed); only the final ratios are doubles.
    // Shape: one (part, year) aggregate, a broadcast base-year join, a
    // per-year sum — two shuffles total.
    ("q_agg_price_index",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem").join(
          t(s, d, "orders").select(col("o_orderkey").as("l_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr")),
          Seq("l_orderkey"))
        val py = li.groupBy(col("l_partkey").as("pk"), col("yr"))
          .agg(sum(cents(col("l_extendedprice"))).as("ext"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .select(col("pk"), col("yr"),
            floor(col("ext").cast("double") / col("qty").cast("double"))
              .cast("long").as("p"),
            col("qty"))
          // lazy cut (r13): py feeds the base-year anchor, the base-year
          // rows and the index join — one lineitem⋈orders rollup, not 3
          .localCheckpoint(false)
        val y0 = py.agg(min("yr").as("y0"))
        val base = py.crossJoin(broadcast(y0)).filter(col("yr") === col("y0"))
          .select(col("pk"), col("p").as("p0"), col("qty").as("q0"))
        py.join(base, Seq("pk"))
          .groupBy("yr")
          .agg(count(lit(1)).as("n_parts"),
            sum(col("p") * col("q0")).as("lnum"),
            sum(col("p0") * col("q0")).as("lden"),
            sum(col("p") * col("qty")).as("pnum"),
            sum(col("p0") * col("qty")).as("pden"))
          .select(col("yr"), col("n_parts"),
            floor(lit(1000.0) * col("lnum").cast("double") /
              col("lden").cast("double")).cast("long")
              .as("laspeyres_milli"),
            floor(lit(1000.0) * col("pnum").cast("double") /
              col("pden").cast("double")).cast("long")
              .as("paasche_milli"),
            floor(lit(1000.0) * sqrt(
              (col("lnum").cast("double") / col("lden").cast("double")) *
              (col("pnum").cast("double") / col("pden").cast("double"))))
              .cast("long").as("fisher_milli"))
      },
      Some("""WITH li AS (SELECT l_partkey AS pk,
            CAST(year(o_orderdate) AS BIGINT) AS yr,
            CAST(floor(l_extendedprice * 100) AS BIGINT) AS ext_cents,
            CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        py AS (SELECT pk, yr,
            CAST(floor(CAST(sum(ext_cents) AS DOUBLE) /
              CAST(sum(qty) AS DOUBLE)) AS BIGINT) AS p,
            CAST(sum(qty) AS BIGINT) AS qty
          FROM li GROUP BY 1, 2),
        y0 AS (SELECT min(yr) AS y0 FROM py),
        base AS (SELECT pk, p AS p0, qty AS q0 FROM py, y0
          WHERE yr = y0),
        j AS (SELECT yr, count(*) AS n_parts,
            CAST(sum(p * q0) AS BIGINT) AS lnum,
            CAST(sum(p0 * q0) AS BIGINT) AS lden,
            CAST(sum(p * qty) AS BIGINT) AS pnum,
            CAST(sum(p0 * qty) AS BIGINT) AS pden
          FROM py JOIN base USING (pk) GROUP BY 1)
        SELECT yr, n_parts,
          CAST(floor(1000.0 * CAST(lnum AS DOUBLE) /
            CAST(lden AS DOUBLE)) AS BIGINT) AS laspeyres_milli,
          CAST(floor(1000.0 * CAST(pnum AS DOUBLE) /
            CAST(pden AS DOUBLE)) AS BIGINT) AS paasche_milli,
          CAST(floor(1000.0 * sqrt(
            (CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE)) *
            (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE))))
            AS BIGINT) AS fisher_milli
        FROM j""")),

    // UNPIVOT/melt — the inverse of q_agg_pivot and the other half of
    // the wide<->long reshaping pair (metric tables ship long, models
    // consume wide): a 5-row wide aggregate (three BIGINT measures per
    // order priority) melts into (priority, metric, value) via Spark's
    // native `unpivot` (Expand under the hood — one operator, no join,
    // no shuffle past the aggregate; at 100 TB melt multiplies rows by
    // #measures in the scan stage, never reshuffles). Oracle = UNION ALL
    // of one SELECT per measure.
    ("q_agg_melt",
      (s: SparkSession, d: String) => {
        val wide = t(s, d, "orders").groupBy(
            col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_total_cents"),
            max(cents(col("o_totalprice"))).as("max_total_cents"))
        wide.unpivot(
          Array(col("priority")),
          Array(col("n_orders"), col("sum_total_cents"),
            col("max_total_cents")),
          "metric", "value")
      },
      Some("""WITH wide AS (SELECT o_orderpriority AS priority,
            count(*) AS n_orders,
            CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS sum_total_cents,
            CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS max_total_cents
          FROM orders GROUP BY 1)
        SELECT priority, 'n_orders' AS metric, n_orders AS value
        FROM wide
        UNION ALL
        SELECT priority, 'sum_total_cents', sum_total_cents FROM wide
        UNION ALL
        SELECT priority, 'max_total_cents', max_total_cents FROM wide""")),

    ("q_agg_pivot", {
      val types = Seq("click", "error", "purchase", "signup", "view")
      ((s: SparkSession, d: String) => t(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .pivot("event_type", types).agg(count(lit(1)))
        .select(col("d") +:
          types.map(ty => coalesce(col(ty), lit(0L)).as(ty)): _*)): Q
      },
      Some(Seq("click", "error", "purchase", "signup", "view").map(ty =>
        s"count(*) FILTER (WHERE event_type = '$ty') AS $ty")
        .mkString("SELECT strftime(ts, '%Y-%m-%d') AS d, ", ", ",
          " FROM events GROUP BY 1"))),

    // Point-in-time enrichment: each click joined to the user's latest
    // purchase at-or-before it (ops/AsofJoin — union + ONE keyed window,
    // not a quadratic range join). DuckDB's native ASOF LEFT JOIN is the
    // oracle, so the operator's semantics are pinned to the standard.
    ("q_join_asof",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(cents(col("value"))).as("purchase_cents"))
        graft.ops.AsofJoin.backward(clicks, purchases, Seq("user_id"),
            "ts", "ts", Seq("purchase_cents"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
            col("purchase_cents"))
      },
      Some(s"""WITH l AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        r AS (SELECT user_id, ts,
            max(${centsSql("\"value\"")}) AS purchase_cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id,
          strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s, r.purchase_cents
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts""")),

    // Moving-window analytics: trailing 4-row sum/count + lag delta per
    // user. Both frames share one (user_id) partitioning + (ts, event_id)
    // sort, so Spark plans ONE shuffle + one sort for all three columns.
    // TIME-range window (RANGE BETWEEN INTERVAL, not ROWS): events in the
    // trailing 30 minutes per user — the rate-limiter / burst-detection
    // frame, which row-count windows cannot express (bursts have variable
    // row counts). Ordered on exact epoch micros so the frame bound is
    // integer arithmetic on both engines.
    ("q_window_timerange",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-1800L * 1000000L, Window.currentRow)
        t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_trailing_30m"),
            sum(cents(col("value"))).over(w).as("cents_trailing_30m"))
      },
      Some("""SELECT event_id, user_id,
          count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
            AS n_trailing_30m,
          CAST(sum(CAST(floor("value" * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cents_trailing_30m
        FROM events""")),

    // Per-user maximum drawdown: running peak minus current value, maxed —
    // the time-series stress metric (how far below its own high-water mark
    // a series fell). One per-user window (user-bounded state) sharing its
    // (user, ts) sort with the rollup; values in exact cents throughout.
    ("q_window_drawdown",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("v", cents(col("value")))
          .withColumn("peak", max("v").over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max("peak").as("peak_cents"),
            max(col("peak") - col("v")).as("max_drawdown_cents"))
      },
      Some(s"""WITH r AS (SELECT user_id, ${centsSql(""""value"""")} AS v,
            max(${centsSql(""""value"""")}) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          FROM events)
        SELECT user_id, count(*) AS n_events,
          CAST(max(peak) AS BIGINT) AS peak_cents,
          CAST(max(peak - v) AS BIGINT) AS max_drawdown_cents
        FROM r GROUP BY 1""")),

    // Exact WEIGHTED median per group — the order statistic where each
    // value counts `weight` times (here: price weighted by shipped
    // quantity — "the price at which half the VOLUME moved", not half
    // the line items): per (flag, price) weight cells, then the
    // grouped two-pass range scan (Prefix.runningOffsetsBy — 3 flag
    // groups, enforced low-cardinality contract; NEVER a corpus-sized
    // per-group window) gives each cell its cumulative weight, and the
    // lower weighted median is the unique cell whose cumulative
    // interval covers ceil(W/2). All exact BIGINTs.
    ("q_agg_weighted_median",
      (s: SparkSession, d: String) => {
        // lazy cut (r13): cells feeds the rank walk AND the per-flag
        // totals — one lineitem aggregate pass instead of two
        val cells = t(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            cents(col("l_extendedprice")).as("price_cents"))
          .agg(sum(col("l_quantity").cast("long")).as("w"))
          .localCheckpoint(false)
        val off = graft.ops.Prefix.runningOffsetsBy(
          cells, "flag", Seq("price_cents"), "w")
        val tot = cells.groupBy("flag")
          .agg(sum("w").as("total_w"), count(lit(1)).as("n_values"))
        off.join(broadcast(tot), Seq("flag"))
          .withColumn("h", expr("(total_w + 1L) div 2L"))
          .filter(col("offset") < col("h") &&
            col("h") <= col("offset") + col("w"))
          .select(col("flag"), col("total_w"), col("n_values"),
            col("price_cents").as("wmedian_cents"),
            col("w").as("weight_at_median"))
      },
      Some(s"""WITH cells AS (SELECT l_returnflag AS flag,
            ${centsSql("l_extendedprice")} AS price_cents,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2),
        o AS (SELECT *,
            CAST(coalesce(sum(w) OVER (PARTITION BY flag
              ORDER BY price_cents ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS off,
            CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS total_w,
            CAST(count(*) OVER (PARTITION BY flag) AS BIGINT)
              AS n_values
          FROM cells)
        SELECT flag, total_w, n_values, price_cents AS wmedian_cents,
          w AS weight_at_median
        FROM o WHERE off < (total_w + 1) // 2
          AND (total_w + 1) // 2 <= off + w""")),

    // Per-group MODE — the aggregate ANSI SQL forgot (most frequent
    // value, deterministic tiebreak on the value itself): two
    // combine-enabled groupBys sharing one partitioning + a
    // group-keyed rank window over the group's DISTINCT values (value
    // cardinality, never row count). max_by/arg-max alone can't give
    // the (count desc, value asc) tie rule portably — the rank makes
    // the tiebreak explicit and oracle-checkable. Frequency share in
    // exact ppm.
    ("q_agg_mode",
      (s: SparkSession, d: String) => {
        val cells = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderpriority").as("v"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("month")
          .orderBy(col("c").desc, col("v"))
        cells
          .withColumn("n_rows", sum("c").over(Window.partitionBy("month")))
          .withColumn("n_distinct",
            count(lit(1)).over(Window.partitionBy("month")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("month"), col("v").as("mode_value"),
            col("c").as("mode_count"), col("n_rows"), col("n_distinct"),
            floor(lit(1e6) * col("c").cast("double") /
              col("n_rows").cast("double")).cast("long")
              .as("share_ppm"))
      },
      Some("""WITH cells AS (SELECT strftime(o_orderdate, '%Y-%m')
              AS month, o_orderpriority AS v,
            CAST(count(*) AS BIGINT) AS c
          FROM orders GROUP BY 1, 2),
        r AS (SELECT *,
            CAST(sum(c) OVER (PARTITION BY month) AS BIGINT) AS n_rows,
            CAST(count(*) OVER (PARTITION BY month) AS BIGINT)
              AS n_distinct,
            row_number() OVER (PARTITION BY month
              ORDER BY c DESC, v) AS rk
          FROM cells)
        SELECT month, v AS mode_value, c AS mode_count, n_rows,
          n_distinct,
          CAST(floor(1e6 * CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE))
            AS BIGINT) AS share_ppm
        FROM r WHERE rk = 1""")),

    // Bollinger bands — the rolling mean ± 2σ envelope (the volatility-
    // normalized anomaly gate on a level series): per event type, daily
    // cent totals, a 7-row trailing window carrying BOTH exact integer
    // moments (Σx, Σx²), band edges from ONE fixed IEEE chain (mean,
    // population σ via correctly-rounded sqrt), and a breakout flag.
    // Sums stage through the BIGINT daily totals (≤ ~2^40 at catalog
    // scales; DECIMAL past that — the CUPED rule). The window is
    // calendar-bounded (~30 rows per type), never the event stream.
    ("q_window_bollinger",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(sum(cents(col("value"))).as("x"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, Window.currentRow)
        val mean = sum("x").over(w).cast("double") /
          count(lit(1)).over(w).cast("double")
        val s2 = greatest(
          sum(col("x") * col("x")).over(w).cast("double") /
            count(lit(1)).over(w).cast("double") - mean * mean,
          lit(0.0))
        daily
          .withColumn("n_win", count(lit(1)).over(w))
          .withColumn("mean_milli",
            floor(lit(1000) * mean).cast("long"))
          .withColumn("sigma_milli",
            floor(lit(1000) * sqrt(s2)).cast("long"))
          .withColumn("breakout",
            when(col("x").cast("double") > mean + lit(2.0) * sqrt(s2),
              1L).when(col("x").cast("double") <
                mean - lit(2.0) * sqrt(s2), -1L).otherwise(0L))
          .select("event_type", "day", "x", "n_win", "mean_milli",
            "sigma_milli", "breakout")
      },
      Some(s"""WITH daily AS (SELECT event_type,
            strftime(ts, '%Y-%m-%d') AS day,
            CAST(sum(${centsSql(""""value"""")}) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, day, x,
            CAST(count(*) OVER wb AS BIGINT) AS n_win,
            CAST(sum(x) OVER wb AS BIGINT) AS sx,
            CAST(sum(x * x) OVER wb AS BIGINT) AS sxx
          FROM daily WINDOW wb AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT event_type, day, x, n_win,
          CAST(floor(1000 * (CAST(sx AS DOUBLE) / CAST(n_win AS DOUBLE)))
            AS BIGINT) AS mean_milli,
          CAST(floor(1000 * sqrt(greatest(CAST(sxx AS DOUBLE) /
            CAST(n_win AS DOUBLE) - (CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE)) * (CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE)), 0.0))) AS BIGINT) AS sigma_milli,
          CASE WHEN CAST(x AS DOUBLE) > CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE) + 2.0 * sqrt(greatest(CAST(sxx AS DOUBLE) /
              CAST(n_win AS DOUBLE) - (CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE)) * (CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE)), 0.0)) THEN CAST(1 AS BIGINT)
            WHEN CAST(x AS DOUBLE) < CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE) - 2.0 * sqrt(greatest(CAST(sxx AS DOUBLE) /
              CAST(n_win AS DOUBLE) - (CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE)) * (CAST(sx AS DOUBLE) /
              CAST(n_win AS DOUBLE)), 0.0))
            THEN CAST(-1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
            AS breakout
        FROM m""")),

    ("q_window_moving",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val wm = w.rowsBetween(-3, Window.currentRow)
        t(s, d, "events")
          .withColumn("v", cents(col("value")))
          .select(col("event_id"), col("user_id"),
            sum(col("v")).over(wm).as("mov_cents"),
            count(lit(1)).over(wm).as("n_win"),
            (col("v") - lag(col("v"), 1).over(w)).as("delta_cents"))
      },
      Some(s"""WITH v AS (SELECT event_id, user_id, ts,
          ${centsSql("\"value\"")} AS v FROM events)
        SELECT event_id, user_id,
          CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_cents,
          count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_win,
          v - lag(v, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS delta_cents
        FROM v""")),

    // Ranking-function surface: ntile / percent_rank / cume_dist over one
    // shared window — all integer-derived doubles (rank/count ratios), so
    // cross-engine exact
    ("q_window_rankfns",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
      },
      Some("""SELECT source, doc_id, n_chars,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume
        FROM documents
        WINDOW w AS (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC)""")),

    // Top-k per group: the O2 surface the reference lacks, as a rank
    // window — the scalable shape (no global sort, no driver collect)
    ("q_window_topk",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
      },
      Some("""SELECT source, doc_id, n_chars, rnk FROM (
          SELECT source, doc_id, n_chars,
            row_number() OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id ASC) AS rnk
          FROM documents) WHERE rnk <= 3""")),

    // JSON surface: typed extraction from a JSON string column (the
    // training-data norm for event payloads). get_json_object stays inside
    // whole-stage codegen; path + cast both push into the scan stage.
    ("q_json_props",
      (s: SparkSession, d: String) => t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          cents(col("value")).as("v"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_cents")),
      Some(s"""SELECT CAST(json_extract(props, '$$.k') AS BIGINT) AS k,
          count(*) AS n,
          CAST(sum(${centsSql("\"value\"")}) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1""")),

    // Spark-4 VariantType path: a nested JSON payload (object + array,
    // built deterministically from event columns) goes through parse_json
    // into the binary Variant encoding, then typed variant_get extractions
    // — object paths, a nested path, and an array index — feed a filter
    // and an aggregate. This is the open-schema ingestion shape for
    // semi-structured event payloads: Variant decodes once per row and
    // each extraction is a codegen'd path lookup, no per-field re-parse
    // the way repeated get_json_object would. The oracle replays the same
    // construction + JSON-path extraction in DuckDB's JSON type.
    ("q_src_variant",
      (s: SparkSession, d: String) => {
        val day = date_format(col("ts"), "yyyy-MM-dd")
        val js = concat(
          lit("{\"meta\":{\"type\":\""), col("event_type"),
          lit("\",\"day\":\""), day,
          lit("\"},\"k\":"), get_json_object(col("props"), "$.k"),
          lit(",\"tags\":[\""), col("event_type"), lit("\",\""), day,
          lit("\"]}"))
        t(s, d, "events").select(col("event_id"), js.as("js"))
          .select(col("event_id"), parse_json(col("js")).as("v"))
          .select(col("event_id"),
            variant_get(col("v"), "$.meta.type", "string").as("vtype"),
            variant_get(col("v"), "$.meta.day", "string").as("vday"),
            variant_get(col("v"), "$.k", "long").as("k"),
            variant_get(col("v"), "$.tags[1]", "string").as("tag1"))
          .filter(col("k") > 50)
          .groupBy("vtype")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            min("vday").as("min_day"), max("tag1").as("max_tag1"))
      },
      Some("""WITH j AS (SELECT event_id,
          '{"meta":{"type":"' || event_type || '","day":"' ||
          strftime(ts, '%Y-%m-%d') || '"},"k":' ||
          json_extract_string(props, '$.k') ||
          ',"tags":["' || event_type || '","' ||
          strftime(ts, '%Y-%m-%d') || '"]}' AS js
        FROM events),
        x AS (SELECT event_id,
          json_extract_string(js, '$.meta.type') AS vtype,
          json_extract_string(js, '$.meta.day') AS vday,
          CAST(json_extract(js, '$.k') AS BIGINT) AS k,
          json_extract_string(js, '$.tags[1]') AS tag1
        FROM j)
        SELECT vtype, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
          min(vday) AS min_day, max(tag1) AS max_tag1
        FROM x WHERE k > 50 GROUP BY 1""")),

    // Set-op decontamination framing: corpus fingerprints EXCEPT a held-out
    // set's fingerprints (U1 — absent in the reference). EXCEPT plans as a
    // hash-partitioned distinct + anti semi-join on the 16-byte digest, the
    // same single-shuffle shape as exact dedup.
    ("q_set_except",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        docs.select(md5(col("text").cast("binary")).as("fp"))
          .except(docs
            .filter(Sampling.hashScore(col("doc_id")) < 0.05)
            .select(md5(col("text").cast("binary")).as("fp")))
      },
      Some(s"""SELECT md5(text) AS fp FROM documents
        EXCEPT SELECT md5(text) AS fp FROM documents
        WHERE ${hashScoreSql("doc_id")} < 0.05""")),

    // SCD-2 history merge (beyond the reference's SCD-0/1): one version
    // batch against a bootstrapped dimension — changed keys close their
    // old version and open a new one, identical keys stay untouched, new
    // keys insert. Version label is an explicit literal, so the whole
    // history is deterministic and the oracle replays it.
    ("q_merge_scd2",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val base = o.filter(col("o_orderkey") % 4 =!= 0)
          .select(col("o_orderkey").as("id"),
            col("o_orderstatus").as("status"),
            cents(col("o_totalprice")).as("price_cents"))
        val batch = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("id"),
            when(col("o_orderkey") % 3 === 0, lit("X"))
              .otherwise(col("o_orderstatus")).as("status"),
            cents(col("o_totalprice")).as("price_cents"))
        MergeWriter.scd2Merge(
          MergeWriter.scd2Bootstrap(base, "2024-01-01"),
          batch, Seq("id"), "2024-02-01")
      },
      Some(s"""WITH base AS (SELECT o_orderkey AS id, o_orderstatus AS status,
            ${centsSql("o_totalprice")} AS price_cents
          FROM orders WHERE o_orderkey % 4 <> 0),
        b AS (SELECT o_orderkey AS id,
            CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
              AS status,
            ${centsSql("o_totalprice")} AS price_cents
          FROM orders WHERE o_orderkey % 2 = 0),
        shared AS (SELECT base.id, base.status AS ostatus,
            base.price_cents AS oprice, b.status AS nstatus,
            b.price_cents AS nprice
          FROM base JOIN b USING (id)),
        changed AS (SELECT * FROM shared
          WHERE ostatus IS DISTINCT FROM nstatus
             OR oprice IS DISTINCT FROM nprice)
        SELECT id, status, price_cents, valid_from, valid_to, is_current
        FROM (
          SELECT id, ostatus AS status, oprice AS price_cents,
            '2024-01-01' AS valid_from, '2024-02-01' AS valid_to,
            false AS is_current FROM changed
          UNION ALL
          SELECT id, status, price_cents, '2024-01-01', NULL, true
          FROM base WHERE id NOT IN (SELECT id FROM changed)
          UNION ALL
          SELECT id, nstatus, nprice, '2024-02-01', NULL, true FROM changed
          UNION ALL
          SELECT id, status, price_cents, '2024-02-01', NULL, true
          FROM b WHERE id NOT IN (SELECT id FROM base))""")),

    // Keyless interval-containment join: purchases falling inside derived
    // error-spike windows. ops/RangeJoin bucketizes the time axis (15-min
    // buckets vs 30-min windows) so the theta-join runs as a hash join with
    // bounded interval replication — not a BroadcastNestedLoop/cartesian
    // scan. All axis math in exact epoch micros.
    // Point-in-time dimension enrichment — the SCD-2 read path: each fact
    // row joins the dimension VERSION valid at its event date (here a
    // two-version synthetic dim: nationkey bumped from 1996-07-01). The
    // join is equi on the key with the validity range as a residual
    // predicate, so it plans as an ordinary hash/sort-merge join on
    // custkey — never a nested loop — and scales like any keyed join;
    // ISO date STRINGS compare lexicographically, keeping the predicate
    // engine-identical. The oracle derives the valid version in closed
    // form.
    ("q_join_scd_pit",
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val dim = cust.select(col("c_custkey").as("ck"),
            col("c_nationkey").as("nk"),
            lit("1900-01-01").as("valid_from"),
            lit("1996-06-30").as("valid_to"))
          .unionByName(cust.select(col("c_custkey").as("ck"),
            (col("c_nationkey") + 100).as("nk"),
            lit("1996-07-01").as("valid_from"),
            lit("9999-12-31").as("valid_to")))
        val o = t(s, d, "orders").select(col("o_orderkey"),
          col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        o.join(dim, col("o_custkey") === col("ck") &&
            col("od") >= col("valid_from") && col("od") <= col("valid_to"))
          .select(col("o_orderkey"), col("o_custkey"), col("od"),
            col("nk").as("nation_at_order"))
      },
      Some("""SELECT o_orderkey, o_custkey,
          strftime(o_orderdate, '%Y-%m-%d') AS od,
          CASE WHEN strftime(o_orderdate, '%Y-%m-%d') <= '1996-06-30'
            THEN c_nationkey ELSE c_nationkey + 100 END AS nation_at_order
        FROM orders JOIN customer ON o_custkey = c_custkey""")),

    ("q_join_range",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val windows = ev.filter(col("event_type") === "error")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"), min(unix_micros(col("ts"))).as("lo"))
          .filter(col("n") >= 6)
          .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("wid"),
            col("lo"), (col("lo") + lit(1800000000L)).as("hi"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), unix_micros(col("ts")).as("t"), col("ts"))
        graft.ops.RangeJoin.pointInInterval(purchases, "t",
            windows, "lo", "hi", bucket = 900000000L)
          .select(col("wid"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
      },
      Some("""WITH err AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n,
            min(epoch_us(ts)) AS lo
          FROM events WHERE event_type = 'error' GROUP BY 1),
        w AS (SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS wid, lo,
            lo + 1800000000 AS hi
          FROM err WHERE n >= 6),
        p AS (SELECT event_id, epoch_us(ts) AS t, ts FROM events
          WHERE event_type = 'purchase')
        SELECT w.wid, p.event_id,
          strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
        FROM w JOIN p ON w.lo <= p.t AND p.t <= w.hi""")),

    // Sequence packing (concat-and-chunk batch prep): each document's token
    // span mapped to its 512-token training sequences via a GLOBAL running
    // offset — computed by ops/Prefix's two-pass distributed prefix sum,
    // not the single-reducer Window.orderBy the oracle uses (same result,
    // one task vs every partition in parallel).
    // Length-bucketed batch construction: docs bucketed by token-count
    // OCTAVE (bits — same-magnitude lengths pad efficiently together),
    // then per-bucket running offsets assign contiguous ~2048-token
    // batches. Composition of the bit-bucket trick with the grouped
    // two-pass prefix scan (Prefix.runningOffsetsBy) — no hot-bucket
    // single-task window anywhere.
    ("q_curate_buckets",
      (s: SparkSession, d: String) => {
        val tc = t(s, d, "documents").select(col("doc_id"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("bucket", graft.plans.GraftExpressions
            .bit_length_long(greatest(col("n_tokens"), lit(1L))))
        graft.ops.Prefix.runningOffsetsBy(tc, "bucket", Seq("doc_id"),
            "n_tokens")
          .select(col("bucket"), col("doc_id"), col("n_tokens"),
            col("offset").as("bucket_offset"),
            floor(col("offset") / 2048.0).cast("long").as("batch_idx"))
      },
      Some(s"""WITH tc AS (SELECT doc_id,
            CAST(len(${tokensSql()}) AS BIGINT) AS n_tokens FROM documents),
        b AS (SELECT doc_id, n_tokens,
            CAST(length(bin(greatest(n_tokens, 1))) AS BIGINT) AS bucket
          FROM tc),
        o AS (SELECT bucket, doc_id, n_tokens,
            COALESCE(sum(n_tokens) OVER (PARTITION BY bucket
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
          FROM b)
        SELECT bucket, doc_id, n_tokens, CAST(off AS BIGINT)
            AS bucket_offset,
          CAST(floor(off / 2048.0) AS BIGINT) AS batch_idx
        FROM o""")),

    // Offline policy evaluation — the counterfactual value of a target
    // policy from logged interaction data: IPS (Horvitz–Thompson),
    // self-normalized IPS (Swaminathan & Joachims NeurIPS'15), the direct
    // method, and doubly robust (Dudík, Langford & Li ICML'11), side by
    // side over the event log with context = hour-of-day, action =
    // event_type, reward = exact micro value. Even-user events fit ALL
    // the models — the reward model q̂(x,a), the target policy π(x) =
    // argmax_a q̂ (argmax via a 24-partition ≤5-row window, q̂ desc then
    // action name — fully deterministic), AND the logging-propensity
    // estimate p̂(a|x) = n_tr(x,a)/n_tr(x); odd-user events are the
    // held-out logging data being reweighed. Propensities MUST come from
    // the train half: estimated on the eval half itself they telescope
    // (Σ over the n(x,a) matched events of n(x)/n(x,a) = n(x) exactly),
    // collapsing IPS = SNIPS = DR to the same number. Scale shape: TWO
    // combine-enabled corpus groupBys (train cells, eval cells — ≤120
    // rows each); everything downstream is broadcast-sized. Cross-engine
    // identity: per-context estimator terms floor-quantize to BIGINT
    // micros BEFORE the final sum (≤24 bounded terms — order-free integer
    // adds; the inner double products are identical IEEE ops on identical
    // exact integer inputs).
    ("q_agg_ope",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events").select(
          col("user_id"), date_format(col("ts"), "HH").as("x"),
          col("event_type").as("a"),
          floor(col("value") * lit(1e6)).cast("long").as("r"))
        val qhat = ev.filter(col("user_id") % 2 === 0)
          .groupBy("x", "a")
          .agg(sum("r").as("s_tr"), count(lit(1)).as("n_tr"))
          .withColumn("q_micro",
            floor(col("s_tr").cast("double") / col("n_tr").cast("double"))
              .cast("long"))
        val trainNx = qhat.groupBy("x").agg(sum("n_tr").as("n_tr_x"))
        // π(x) plus everything the estimators need about it: q̂(x,π) and
        // the train propensity denominator n_tr(x,π) (≥ 1 by argmax
        // construction — π only ranges over cells train has seen)
        val pol = qhat.withColumn("rk", row_number().over(
            Window.partitionBy("x")
              .orderBy(col("q_micro").desc, col("a").asc)))
          .filter(col("rk") === 1)
          .join(trainNx, "x")
          .select(col("x"), col("a").as("pi"), col("q_micro").as("q_pi"),
            col("n_tr").as("n_tr_pi"), col("n_tr_x"))
        val cells = ev.filter(col("user_id") % 2 =!= 0)
          .groupBy("x", "a")
          .agg(sum("r").as("s"), count(lit(1)).as("n_xa"))
        val nx = cells.groupBy("x").agg(sum("n_xa").as("n_x"))
        val terms = cells.join(broadcast(pol), "x")
          .withColumn("m", (col("a") === col("pi")).cast("long"))
          // w = 1/p̂(π|x) = n_tr_x / n_tr_pi for every matched event
          .withColumn("ips_t", when(col("m") === 1L,
            floor(col("s").cast("double") * col("n_tr_x").cast("double") /
              col("n_tr_pi").cast("double")).cast("long")).otherwise(0L))
          // Σw in micro-units (quantized per context, ≤24 terms)
          .withColumn("w_t", when(col("m") === 1L,
            floor(lit(1e6) * (col("n_xa") * col("n_tr_x")).cast("double") /
              col("n_tr_pi").cast("double")).cast("long")).otherwise(0L))
          .withColumn("dr_t", when(col("m") === 1L,
            floor((col("s") - col("n_xa") * col("q_pi")).cast("double") *
              col("n_tr_x").cast("double") / col("n_tr_pi").cast("double"))
              .cast("long")).otherwise(0L))
          .agg(sum("n_xa").as("n_eval"),
            sum(when(col("m") === 1L, col("n_xa")).otherwise(0L))
              .as("n_matched"),
            sum("w_t").as("w_sum_micro"),
            sum("ips_t").as("ips_sum"), sum("dr_t").as("dr_sum"))
        val dm = nx.join(broadcast(pol), "x")
          .agg(sum(col("n_x") * col("q_pi")).as("dm_sum"))
        terms.crossJoin(dm).select(
          col("n_eval"), col("n_matched"),
          floor(lit(1e6) * col("n_matched").cast("double") /
            col("n_eval").cast("double")).cast("long").as("match_ppm"),
          floor(col("ips_sum").cast("double") /
            col("n_eval").cast("double")).cast("long").as("ips_micro"),
          floor(lit(1e6) * col("ips_sum").cast("double") /
            nullif(col("w_sum_micro"), lit(0L)).cast("double")).cast("long")
            .as("snips_micro"),
          floor(col("dm_sum").cast("double") /
            col("n_eval").cast("double")).cast("long").as("dm_micro"),
          floor((col("dm_sum") + col("dr_sum")).cast("double") /
            col("n_eval").cast("double")).cast("long").as("dr_micro"))
      },
      Some("""WITH ev AS (SELECT user_id, strftime(ts, '%H') AS x,
            event_type AS a,
            CAST(floor("value" * 1e6) AS BIGINT) AS r FROM events),
        qh AS (SELECT x, a, CAST(sum(r) AS BIGINT) AS s_tr,
            CAST(count(*) AS BIGINT) AS n_tr
          FROM ev WHERE user_id % 2 = 0 GROUP BY 1, 2),
        qm AS (SELECT x, a, n_tr, CAST(floor(CAST(s_tr AS DOUBLE) /
            CAST(n_tr AS DOUBLE)) AS BIGINT) AS q_micro FROM qh),
        tnx AS (SELECT x, CAST(sum(n_tr) AS BIGINT) AS n_tr_x
          FROM qh GROUP BY 1),
        pol AS (SELECT x, a AS pi, q_micro AS q_pi, n_tr AS n_tr_pi,
            n_tr_x
          FROM (SELECT *, row_number() OVER (PARTITION BY x
              ORDER BY q_micro DESC, a ASC) AS rk FROM qm)
            JOIN tnx USING (x)
          WHERE rk = 1),
        cells AS (SELECT x, a, CAST(sum(r) AS BIGINT) AS s,
            CAST(count(*) AS BIGINT) AS n_xa
          FROM ev WHERE user_id % 2 <> 0 GROUP BY 1, 2),
        nx AS (SELECT x, CAST(sum(n_xa) AS BIGINT) AS n_x
          FROM cells GROUP BY 1),
        terms AS (SELECT c.x, c.a, c.s, c.n_xa, pi, q_pi, n_tr_pi, n_tr_x,
            CASE WHEN c.a = pi THEN 1 ELSE 0 END AS m,
            CASE WHEN c.a = pi THEN CAST(floor(CAST(s AS DOUBLE) *
              CAST(n_tr_x AS DOUBLE) / CAST(n_tr_pi AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS ips_t,
            CASE WHEN c.a = pi THEN CAST(floor(1e6 *
              CAST(n_xa * n_tr_x AS DOUBLE) / CAST(n_tr_pi AS DOUBLE))
              AS BIGINT) ELSE 0 END AS w_t,
            CASE WHEN c.a = pi THEN CAST(floor(
              CAST(s - n_xa * q_pi AS DOUBLE) * CAST(n_tr_x AS DOUBLE) /
              CAST(n_tr_pi AS DOUBLE)) AS BIGINT) ELSE 0 END AS dr_t
          FROM cells c JOIN pol USING (x)),
        a1 AS (SELECT CAST(sum(n_xa) AS BIGINT) AS n_eval,
            CAST(sum(CASE WHEN m = 1 THEN n_xa ELSE 0 END) AS BIGINT)
              AS n_matched,
            CAST(sum(w_t) AS BIGINT) AS w_sum_micro,
            CAST(sum(ips_t) AS BIGINT) AS ips_sum,
            CAST(sum(dr_t) AS BIGINT) AS dr_sum
          FROM terms),
        a2 AS (SELECT CAST(sum(n_x * q_pi) AS BIGINT) AS dm_sum
          FROM nx JOIN pol USING (x))
        SELECT n_eval, n_matched,
          CAST(floor(1e6 * CAST(n_matched AS DOUBLE) /
            CAST(n_eval AS DOUBLE)) AS BIGINT) AS match_ppm,
          CAST(floor(CAST(ips_sum AS DOUBLE) / CAST(n_eval AS DOUBLE))
            AS BIGINT) AS ips_micro,
          CAST(floor(1e6 * CAST(ips_sum AS DOUBLE) /
            CAST(nullif(w_sum_micro, 0) AS DOUBLE)) AS BIGINT)
            AS snips_micro,
          CAST(floor(CAST(dm_sum AS DOUBLE) / CAST(n_eval AS DOUBLE))
            AS BIGINT) AS dm_micro,
          CAST(floor(CAST(dm_sum + dr_sum AS DOUBLE) /
            CAST(n_eval AS DOUBLE)) AS BIGINT) AS dr_micro
        FROM a1, a2""")),

    // Bag-semantics set algebra (INTERSECT ALL / EXCEPT ALL) WITHOUT row
    // explosion: SQL's ALL variants materialize every duplicate row and
    // shuffle them all; over multiplicity-heavy signatures the count-
    // arithmetic form — per-key counts on each side, then least/greatest
    // on the two BIGINTs — is the same answer from ONE groupBy per side
    // and a key-equi join of two already-tiny count tables. At 100 TB the
    // shuffle carries one row per DISTINCT signature, not one per
    // duplicate. Signatures here: (event_type, value-kilocent bucket) of
    // the first half of January vs the second, the drift framing of
    // "which behaviours appeared/disappeared/persisted, with counts".
    ("q_set_bag",
      (s: SparkSession, d: String) => {
        val cut = to_timestamp(lit("2024-01-16 00:00:00"))
        val sig = t(s, d, "events").select(col("event_type"),
          floor(cents(col("value")).cast("double") / lit(1000.0))
            .cast("long").as("bucket"),
          when(col("ts") < cut, 1L).otherwise(0L).as("h1"))
        sig.groupBy("event_type", "bucket")
          .agg(sum("h1").as("m1"), sum(lit(1L) - col("h1")).as("m2"))
          .select(col("event_type"), col("bucket"), col("m1"), col("m2"),
            least(col("m1"), col("m2")).as("intersect_all"),
            greatest(col("m1") - col("m2"), lit(0L)).as("except_12"),
            greatest(col("m2") - col("m1"), lit(0L)).as("except_21"))
      },
      Some(s"""WITH sig AS (SELECT event_type,
            CAST(floor(CAST(${centsSql(""""value"""")} AS DOUBLE) / 1000.0)
              AS BIGINT) AS bucket,
            CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN 1 ELSE 0 END AS h1
          FROM events)
        SELECT event_type, bucket,
          CAST(sum(h1) AS BIGINT) AS m1,
          CAST(sum(1 - h1) AS BIGINT) AS m2,
          CAST(least(sum(h1), sum(1 - h1)) AS BIGINT) AS intersect_all,
          CAST(greatest(sum(h1) - sum(1 - h1), 0) AS BIGINT) AS except_12,
          CAST(greatest(sum(1 - h1) - sum(h1), 0) AS BIGINT) AS except_21
        FROM sig GROUP BY 1, 2""")),

    // FIFO lot allocation — the classic "match consumption to supply in
    // arrival order" problem (inventory cost basis, credit burn-down,
    // capacity accounting). The scalable formulation is NOT a loop: give
    // every supply lot the half-open interval [cum_before, cum_after) of
    // its user's cumulative supplied cents, every demand the same over
    // consumed cents, and the FIFO allocation between lot L and demand D
    // is exactly the overlap of the two intervals. Per-user windows (a
    // user's events are bounded — hundreds, not corpus-sized) build the
    // prefix sums; the allocation join is user-equi with an interval
    // post-filter, so it shuffles once on user_id and never fans out past
    // lots×demands of ONE user. Purchases supply, clicks consume.
    ("q_agg_fifo",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        def side(tp: String, pfx: String) = ev
          .filter(col("event_type") === tp)
          .select(col("user_id"), col("ts"), col("event_id"),
            cents(col("value")).as("amt"))
          .withColumn(s"${pfx}_hi", sum("amt").over(w))
          .withColumn(s"${pfx}_lo", col(s"${pfx}_hi") - col("amt"))
        val lots = side("purchase", "l")
          .select(col("user_id"), col("l_lo"), col("l_hi"))
        val dem = side("click", "c")
          .select(col("user_id").as("d_user"), col("c_lo"), col("c_hi"))
        val matched = lots.join(dem,
            col("user_id") === col("d_user") &&
            col("l_lo") < col("c_hi") && col("c_lo") < col("l_hi"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_allocs"),
            sum(least(col("l_hi"), col("c_hi")) -
              greatest(col("l_lo"), col("c_lo"))).as("matched_cents"))
        val totals = ev
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy("user_id")
          .agg(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_lots"),
            sum(when(col("event_type") === "purchase", cents(col("value")))
              .otherwise(0L)).as("supply_cents"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("n_demands"),
            sum(when(col("event_type") === "click", cents(col("value")))
              .otherwise(0L)).as("demand_cents"))
        totals.join(matched, Seq("user_id"), "left")
          .select(col("user_id"), col("n_lots"), col("n_demands"),
            col("supply_cents"), col("demand_cents"),
            coalesce(col("n_allocs"), lit(0L)).as("n_allocs"),
            coalesce(col("matched_cents"), lit(0L)).as("matched_cents"),
            (col("demand_cents") -
              coalesce(col("matched_cents"), lit(0L))).as("unfilled_cents"),
            (col("supply_cents") -
              coalesce(col("matched_cents"), lit(0L))).as("leftover_cents"))
      },
      Some(s"""WITH ev AS (SELECT user_id, ts, event_id, event_type,
            ${centsSql(""""value"""")} AS amt
          FROM events WHERE event_type IN ('purchase', 'click')),
        lots AS (SELECT user_id,
            sum(amt) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) - amt AS l_lo,
            sum(amt) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS l_hi
          FROM ev WHERE event_type = 'purchase'),
        dem AS (SELECT user_id,
            sum(amt) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) - amt AS c_lo,
            sum(amt) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS c_hi
          FROM ev WHERE event_type = 'click'),
        m AS (SELECT l.user_id, count(*) AS n_allocs,
            CAST(sum(least(l.l_hi, d.c_hi) - greatest(l.l_lo, d.c_lo))
              AS BIGINT) AS matched_cents
          FROM lots l JOIN dem d ON l.user_id = d.user_id
            AND l.l_lo < d.c_hi AND d.c_lo < l.l_hi
          GROUP BY 1),
        tot AS (SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_lots,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN amt ELSE 0 END)
              AS BIGINT) AS supply_cents,
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_demands,
            CAST(sum(CASE WHEN event_type = 'click' THEN amt ELSE 0 END)
              AS BIGINT) AS demand_cents
          FROM ev GROUP BY 1)
        SELECT t.user_id, n_lots, n_demands, supply_cents, demand_cents,
          CAST(coalesce(m.n_allocs, 0) AS BIGINT) AS n_allocs,
          coalesce(m.matched_cents, 0) AS matched_cents,
          demand_cents - coalesce(m.matched_cents, 0) AS unfilled_cents,
          supply_cents - coalesce(m.matched_cents, 0) AS leftover_cents
        FROM tot t LEFT JOIN m ON t.user_id = m.user_id""")),

    ("q_seq_pack",
      (s: SparkSession, d: String) => {
        val tc = t(s, d, "documents").select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.ops.Prefix.runningOffsets(tc, "doc_id", "n_tokens")
          .select(col("doc_id"), col("n_tokens"),
            col("offset").as("tok_offset"),
            floor(col("offset") / 512.0).cast("long").as("seq_start"),
            floor((col("offset") + greatest(col("n_tokens"), lit(1L)) -
              lit(1L)) / 512.0).cast("long").as("seq_end"))
      },
      Some(s"""WITH tc AS (SELECT doc_id,
            CAST(len(${tokensSql()}) AS BIGINT) AS n_tokens FROM documents),
        o AS (SELECT doc_id, n_tokens,
            COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS off
          FROM tc)
        SELECT doc_id, n_tokens, CAST(off AS BIGINT) AS tok_offset,
          CAST(floor(off / 512.0) AS BIGINT) AS seq_start,
          CAST(floor((off + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT)
            AS seq_end
        FROM o""")))

  // ================================================================ text

  /** BM25 constants, computed ONCE here and interpolated into the oracle
    * via Double.toString (shortest round-tripping repr — DuckDB parses
    * back the identical double, so e.g. `k1 + 1`'s rounding happens in
    * exactly one place). */
  private[graft] def Bm25K1: Double = 1.2
  private[graft] def Bm25B: Double = 0.75
  private[graft] def Bm25K1p1: Double = Bm25K1 + 1
  private[graft] def Bm25OneMb: Double = 1 - Bm25B

  /** Winnowing (k=4, w=4) selected-fingerprint CTEs, ending in `sel`
    * (doc_id, pos, h) — the DuckDB replay of [[TextOps.winnow]], shared by
    * the fingerprint dump and the near-dup pairs oracle. Windows become a
    * pos-range join; the rightmost-min tie rule is max(pos) over h = min. */
  private[graft] def winnowCtes(): String =
    s"""toks AS MATERIALIZED (SELECT doc_id, ${tokensSql()} AS tk
            FROM documents),
        g AS MATERIALIZED (SELECT doc_id, CAST(i AS INT) AS pos,
            CAST(concat('0x', substr(md5(
              tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
            ), 1, 15)) AS BIGINT) AS h
          FROM toks, UNNEST(range(0, len(tk) - 3)) AS u(i)
          WHERE len(tk) >= 4),
        n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
        win AS (SELECT doc_id, CAST(t AS INT) AS t
          FROM n, UNNEST(range(0, ng - 3)) AS u(t) WHERE ng >= 4),
        wm AS (SELECT w.doc_id, w.t, min(g.h) AS h
          FROM win w JOIN g ON g.doc_id = w.doc_id
            AND g.pos BETWEEN w.t AND w.t + 3
          GROUP BY 1, 2),
        sel AS MATERIALIZED (SELECT wm.doc_id, max(g.pos) AS pos, wm.h
          FROM wm JOIN g ON g.doc_id = wm.doc_id AND g.h = wm.h
            AND g.pos BETWEEN wm.t AND wm.t + 3
          GROUP BY wm.doc_id, wm.t, wm.h)"""

}
