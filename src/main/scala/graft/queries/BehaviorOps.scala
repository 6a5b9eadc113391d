package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextAnalysis

/** Behavioral / corpus-statistics surface (q74-q76): n-gram language
  * model tables, ordered funnels, retention cohorts — the classic
  * product-analytics and LM-data workloads, each shaped for scale
  * (mergeable aggregates instead of window sorts where possible).
  */
object BehaviorOps {

  private val NsPerDay = 86400000000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q74: trigram next-token table (the n-gram LM building
    // block): for every word-bigram prefix seen >= 5 times, the
    // most frequent next token. The argmax is max(struct(n, next)) —
    // a MERGEABLE aggregate with map-side partial (ties break to the
    // lexicographically larger token, deterministically), where the
    // window row_number() form would sort every group.
    "q74_ngram_lm" -> { (s, d) =>
      import s.implicits._
      val tri = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism) // CPU-bound tokenize
        .select($"text").as[String]
        .flatMap(TextAnalysis.ngramIterator(_, 3))
        .toDF("tg")
        .groupBy($"tg").agg(count(lit(1)).as("n"))
      tri.select(
          regexp_extract($"tg", "^(.*) ([a-z]+)$", 1).as("prefix"),
          regexp_extract($"tg", "^(.*) ([a-z]+)$", 2).as("nxt"),
          $"n")
        .groupBy($"prefix")
        .agg(max(struct($"n", $"nxt")).as("m"), sum($"n").as("total"))
        .filter($"total" >= 5)
        .select($"prefix", $"m.nxt".as("nxt"), $"m.n".as("cnt"), $"total")
    },

    // ---- q75: ordered funnel view→click→purchase per user: each
    // stage's timestamp must strictly follow the previous stage's.
    // ONE shuffle (groupByKey on user) with the per-user dependent-min
    // chain computed in a tight loop over the user's events — the SQL
    // equivalent is three correlated aggregation-join rounds.
    // Timestamps are µs-truncated BEFORE comparison (DuckDB timestamps
    // are µs — see q65), so the strict-> stage ordering agrees.
    "q75_funnel" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", expr("ts div 1000").as("ts"), $"event_type")
        .as[(Long, Long, String)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val evs = it.toArray
          def minAfter(tpe: String, after: Long): Long = {
            var m = Long.MaxValue
            var i = 0
            while (i < evs.length) {
              val (_, t, ty) = evs(i)
              if (ty == tpe && t > after && t < m) m = t
              i += 1
            }
            m
          }
          val t1 = minAfter("view", Long.MinValue)
          val t2 = if (t1 == Long.MaxValue) Long.MaxValue else minAfter("click", t1)
          val t3 = if (t2 == Long.MaxValue) Long.MaxValue else minAfter("purchase", t2)
          val stage = if (t3 != Long.MaxValue) 3 else if (t2 != Long.MaxValue) 2
            else if (t1 != Long.MaxValue) 1 else 0
          def orNeg(t: Long) = if (t == Long.MaxValue) -1L else t
          (uid, stage, orNeg(t1), orNeg(t2), orNeg(t3))
        }
        .toDF("user_id", "stage", "t_view", "t_click", "t_purchase")
    },

    // ---- q76: retention cohorts — users bucketed by first-seen day,
    // counted by activity-day offset. Two aggregations + one key join;
    // the (cohort, offset) matrix is the at-scale retention report.
    "q76_retention_cohorts" -> { (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d)
        .select($"user_id", expr(s"ts div $NsPerDay").as("day"))
      val first = e.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      e.join(first, "user_id")
        .select($"cohort_day", ($"day" - $"cohort_day").as("day_offset"), $"user_id")
        .distinct()
        .groupBy($"cohort_day", $"day_offset")
        .agg(count(lit(1)).as("n_users"))
    },

    // ---- q78: group-wise closed-form OLS (value regressed on day,
    // per event type) from mergeable sufficient statistics — ONE
    // map-side-combined aggregation carries (n, Σx, Σx², Σy, Σxy);
    // slope/intercept are a constant-time epilogue. Determinism: the
    // integer sums are exact, the double sums accumulate in
    // decimal(38,6) (order-independent), and the epilogue is a fixed
    // chain of double ops reproduced verbatim by the oracle.
    "q78_groupwise_ols" -> { (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d).select($"event_type",
        expr(s"ts div $NsPerDay").as("x"), $"value".as("y"))
      e.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"x").as("sx"),
          sum($"x" * $"x").as("sxx"),
          sum(($"y").cast("decimal(38,6)")).cast("double").as("sy"),
          sum(($"x" * $"y").cast("decimal(38,6)")).cast("double").as("sxy"))
        // Denominator in double: with day-scale x and ~1e7 events per
        // group the Long products n*sxx / sx*sx can exceed 2^63 and
        // wrap silently; double is overflow-safe and the oracle casts
        // identically so both sides run the same IEEE chain.
        .withColumn("slope",
          ($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n".cast("double") * $"sxx".cast("double") -
              $"sx".cast("double") * $"sx".cast("double")))
        // + 0.0 canonicalizes IEEE -0.0: a near-flat negative slope
        // rounds to -0.0 in engines that keep the sign through round.
        .select($"event_type", $"n",
          (graft.operators.Curation.floorRound($"slope", 6) + lit(0.0)).as("slope"),
          (graft.operators.Curation.floorRound(($"sy" - $"slope" * $"sx") / $"n", 6) + lit(0.0))
            .as("intercept"))
    },

    // ---- q79: first-order Markov transition matrix over per-user
    // event sequences (deterministic total order: µs time, event_id
    // tiebreak). One user-keyed shuffle feeds the lag window; the
    // (prev → next) counts aggregate map-side; probabilities divide
    // exact counts.
    "q79_markov_transitions" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      val pairs = Tables.events(s, d)
        .select($"user_id", $"event_id", expr("ts div 1000").as("t"),
          $"event_type".as("nxt"))
        .withColumn("prev", lag($"nxt", 1).over(w))
        .filter($"prev".isNotNull)
        .groupBy($"prev", $"nxt").agg(count(lit(1)).as("cnt"))
      val wp = Window.partitionBy($"prev")
      pairs
        .withColumn("prob",
          graft.operators.Curation.floorRound($"cnt" / sum($"cnt").over(wp), 6))
        .select($"prev", $"nxt", $"cnt", $"prob")
    },

    // ---- q80: time-series resampling — daily totals per event type
    // on a gap-free day grid with last-observation-carried-forward
    // fill. The grid is types × sequence(min_day, max_day) (one
    // single-row bounds agg cross-joined, never a driver loop); LOCF
    // is a running last(ignoreNulls) over the day order — one window
    // pass per series, no self-join per gap.
    "q80_resample_locf" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .select($"event_type", expr(s"ts div $NsPerDay").as("day"), $"value")
      val daily = e.groupBy($"event_type", $"day")
        .agg(graft.operators.Curation.floorRound(sum($"value".cast("decimal(38,6)")).cast("double"), 6).as("v"))
      val bounds = e.agg(min($"day").as("mn"), max($"day").as("mx"))
      val grid = e.select($"event_type").distinct()
        .crossJoin(bounds.select(explode(sequence($"mn", $"mx")).as("day")))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day",
          coalesce(last($"v", ignoreNulls = true).over(w), lit(0.0)).as("v"))
    },

    // ---- q82: JSON payload extraction — the dynamic-schema path every
    // journal consumer runs (events.props is a JSON string): from_json
    // with an explicit schema, then aggregate the extracted field.
    // Stays in whole-stage codegen (Jackson-backed expression), no UDF.
    "q82_json_extract" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          from_json($"props", lit("k INT")).getField("k").as("k"))
        .groupBy($"event_type")
        .agg(count($"k").as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
    },

    // ---- q98: CUSUM change-point detection per user — the offline
    // analog of drift monitoring over a metric stream. The usual form
    // (cumsum of x_i − μ) needs the per-user MEAN inside the running
    // sum, and decimal division rounds differently across engines; the
    // n-scaled identity n·CUSUM_i = n·S_i − i·S_n uses only exact
    // decimal sums and integer products, so the argmax is bit-exact and
    // tie-broken deterministically (earliest index). One shuffle on
    // user_id serves both windows and the ranking.
    "q98_cusum_changepoint" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wa = Window.partitionBy($"user_id")
      val rows = Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"value")
        .select($"user_id",
          row_number().over(wo).as("i"),
          sum($"value".cast("decimal(38,6)")).over(wo).as("si"),
          count(lit(1)).over(wa).as("n"),
          sum($"value".cast("decimal(38,6)")).over(wa).as("sn"))
        .select($"user_id", $"i", $"n",
          abs($"n" * $"si" - $"i" * $"sn").as("dev"))
      val rk = Window.partitionBy($"user_id")
        .orderBy($"dev".desc, $"i".asc)
      rows.select($"user_id", $"n".as("n_events"), $"i", $"dev",
          row_number().over(rk).as("rn"))
        .filter($"rn" === 1 && $"n_events" >= 20)
        .select($"user_id", $"n_events", $"i".as("cp_idx"),
          graft.operators.Curation.floorRound6(
            $"dev".cast("double") / $"n_events").as("cusum_abs"))
    },

    // ---- q101: batch sessionization — the gaps-and-islands idiom
    // (lag + conditional cumulative sum) that assigns explicit session
    // ids, where q39's session_window only aggregates per window.
    // Explicit ids are what downstream joins need (funnel-per-session,
    // session replay). Timestamps are µs-truncated BEFORE the lag (the
    // q65 discipline: equal-µs tie order can't change any gap), the
    // 24h break threshold is integer µs, and the one user_id shuffle
    // serves both windows and the per-session aggregate.
    "q101_sessionize" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val GapUs = 86400000000L // 24 h
      val wo = Window.partitionBy($"user_id").orderBy($"tsu".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", expr("ts DIV 1000").as("tsu"), $"event_id", $"value")
        .select($"user_id", $"tsu", $"value",
          when(lag($"tsu", 1).over(wo).isNull
            || $"tsu" - lag($"tsu", 1).over(wo) > GapUs, 1L)
            .otherwise(0L).as("brk"),
          $"event_id")
        .select($"user_id", $"tsu", $"value",
          sum($"brk").over(wo).as("sess"))
        .groupBy($"user_id", $"sess")
        .agg(count(lit(1)).as("n_events"),
          (max($"tsu") - min($"tsu")).as("dur_us"),
          graft.operators.Curation.floorRound(sum($"value".cast("decimal(38,6)")).cast("double"), 6)
            .as("sum_value"))
    },

    // ---- q109: SCD Type-2 dimension build — collapse each user's
    // event_type stream into validity intervals [valid_from, valid_to)
    // with a current-run flag (gaps-and-islands over the event log,
    // the warehouse-standard versioned-dimension operator). One
    // shuffle: lag + running sum + interval lead all share the
    // user_id window partitioning, and the run collapse reuses it.
    // Open intervals carry Long.MaxValue, not NULL, so the column
    // stays int64 in the differential compare.
    "q109_scd2" -> { (s, d) =>
      import s.implicits._
      graft.operators.Scd.type2(
          Tables.events(s, d).select($"user_id", $"event_type",
            expr("ts DIV 1000").as("tsu"), $"event_id"),
          key = $"user_id", attr = $"event_type", ts = $"tsu",
          tie = $"event_id")
        .select($"key".as("user_id"), $"attr".as("event_type"),
          $"valid_from", $"valid_to", $"n_obs", $"is_current")
    },

    // ---- q117: time-decayed multi-touch attribution — every
    // purchase distributes one unit of credit over the user's
    // view/click touches of the prior 7 days, weighted by half-life
    // decay 0.5^days_ago. Decay weights come from a bit shift
    // (1 / (1 << days)), so every weight is an exact 1/64-multiple
    // and the per-purchase normalizer sums exactly in double —
    // order-independent with no pow() cross-engine hazard. Shape: one
    // user-keyed join with a bounded time predicate (fan-out = touches
    // per user-week), a purchase-keyed window for the normalizer, one
    // final tiny aggregate.
    "q117_decay_attribution" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400000000L
      val ev = Tables.events(s, d).select($"user_id", $"event_id",
        $"event_type", expr("ts DIV 1000").as("tsu"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("pid"), $"tsu".as("pt"))
      val touches = ev.filter($"event_type".isin("view", "click"))
        .select($"user_id", $"event_type".as("ttype"), $"tsu".as("tt"))
      val pairs = purchases.join(touches, Seq("user_id"))
        .filter($"tt" <= $"pt" && $"pt" - $"tt" < lit(7 * DayUs))
        .select($"pid", $"ttype",
          expr(s"(pt - tt) DIV $DayUs").as("days_ago"))
        .select($"pid", $"ttype", $"days_ago",
          expr("1.0 / cast(shiftleft(1, cast(days_ago as int)) as double)")
            .as("w"))
      val wp = Window.partitionBy($"pid")
      pairs
        .select($"ttype", $"days_ago",
          graft.operators.Curation.floorRound($"w" / sum($"w").over(wp), 9).as("term"))
        .groupBy($"ttype", $"days_ago")
        .agg(count(lit(1)).as("n_pairs"),
          graft.operators.Curation.floorRound(sum($"term".cast("decimal(38,9)")).cast("double"), 6)
            .as("credit"))
    },

    // ---- q118: per-user behavioral feature vector — the feature-
    // engineering table a churn/quality model trains on: event count,
    // distinct types, Gini diversity of the type mix, and top-type
    // share. Gini avoids entropy's ln(): 1 - Σp² = (n² - Σc²)/n²
    // with exact integer numerators, so every feature is one IEEE
    // division of exact integers. Two-level aggregate: (user, type)
    // counts, then a user rollup that reuses the first shuffle's
    // partitioning (user ⊆ grouping keys).
    "q118_user_features" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        .groupBy($"user_id")
        .agg(sum($"c").as("n_events"), count(lit(1)).as("n_types"),
          sum($"c" * $"c").as("ssq"), max($"c").as("maxc"))
        .select($"user_id", $"n_events", $"n_types",
          graft.operators.Curation.floorRound6(
            ($"n_events" * $"n_events" - $"ssq").cast("double")
            / ($"n_events" * $"n_events").cast("double")).as("gini"),
          graft.operators.Curation.floorRound6(
            $"maxc".cast("double") / $"n_events".cast("double"))
            .as("top_share"))
    },

    // ---- q108: association rules over session baskets — which event
    // types co-occur in the same session (q101's 24h-gap sessions),
    // with support and lift. Pair generation self-joins the DISTINCT
    // (basket, item) relation on the basket key with item < item, so
    // per-basket work is |types|² ≤ 25 — bounded fan-out at any scale;
    // the global counts are map-side-combined aggregates. Support in
    // exact integer ppm; lift is one division of exact integer
    // products (n_ab·N / (n_a·n_b)).
    "q108_session_assoc" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val GapUs = 86400000000L
      val wo = Window.partitionBy($"user_id").orderBy($"tsu".asc, $"event_id".asc)
      val items = Tables.events(s, d)
        .select($"user_id", expr("ts DIV 1000").as("tsu"), $"event_id",
          $"event_type")
        .select($"user_id", $"event_type",
          when(lag($"tsu", 1).over(wo).isNull
            || $"tsu" - lag($"tsu", 1).over(wo) > GapUs, 1L)
            .otherwise(0L).as("brk"),
          $"tsu", $"event_id")
        .select($"user_id", $"event_type", sum($"brk").over(wo).as("sess"))
        .distinct()
        .persist()
      // Basket count as a LAZY 1-row cross join (the oracle's own
      // CROSS JOIN nb shape): a driver-side count() here would run the
      // whole sessionization job at plan-CONSTRUCTION time and bake a
      // stale literal into the plan.
      val nb = items.select($"user_id", $"sess").distinct()
        .agg(count(lit(1)).as("baskets"))
      val na = items.groupBy($"event_type".as("t")).agg(count(lit(1)).as("na"))
      val pairs = items.as("a").join(items.as("b"),
          $"a.user_id" === $"b.user_id" && $"a.sess" === $"b.sess"
            && $"a.event_type" < $"b.event_type")
        .groupBy($"a.event_type".as("ta"), $"b.event_type".as("tb"))
        .agg(count(lit(1)).as("nab"))
      val out = pairs
        .join(broadcast(na.select($"t".as("ta_k"), $"na".as("na_a"))),
          $"ta" === $"ta_k")
        .join(broadcast(na.select($"t".as("tb_k"), $"na".as("na_b"))),
          $"tb" === $"tb_k")
        .crossJoin(broadcast(nb))
        .select($"ta", $"tb", $"nab",
          expr("nab * 1000000 DIV baskets").as("support_ppm"),
          graft.operators.Curation.floorRound6(
            ($"nab" * $"baskets").cast("double")
              / ($"na_a" * $"na_b")).as("lift"))
      // items stays persisted until the caller's terminal action; the
      // bench clears cache per rep, Verify per query.
      out
    },

    // ---- q83: rolling 7-day mean per series over the q80 gap-free
    // grid — a RANGE window frame (value-based, not row-based): on a
    // dense grid rows==range, but the operator under test is the
    // range-frame path. Decimal accumulation keeps the windowed sum
    // order-independent.
    "q83_moving_avg" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val locf = queries("q80_resample_locf")(s, d)
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rangeBetween(-6, 0)
      // Cast the decimal-exact sum to DOUBLE before dividing (q78's
      // discipline, and what the oracle does): a decimal/decimal
      // quotient rounds rationally where the oracle's IEEE divide
      // rounds binary — near-tie quotients would differ at 1e-6.
      locf.select($"event_type", $"day",
        graft.operators.Curation.floorRound(sum($"v".cast("decimal(38,6)")).over(w).cast("double") /
          count(lit(1)).over(w), 6).as("ma7"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    // Same µs truncation, same 24h break, same (tsu, event_id) order.
    "q101_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    event_id, value
        |  FROM events),
        |b AS (
        |  SELECT user_id, tsu, event_id, value,
        |    CASE WHEN lag(tsu) OVER w IS NULL
        |           OR tsu - lag(tsu) OVER w > 86400000000 THEN 1
        |         ELSE 0 END AS brk
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |s AS (
        |  SELECT user_id, tsu, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM b)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(tsu) - min(tsu) AS BIGINT) AS dur_us,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS sum_value
        |FROM s GROUP BY user_id, sess""".stripMargin,

    // Same µs truncation and (tsu, event_id) order as q101; the open
    // interval uses the Long.MaxValue sentinel so valid_to stays
    // int64 (NULL would drift the pandas dtype to float64).
    "q109_scd2" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_type, tsu, event_id,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |r AS (
        |  SELECT user_id, event_type, tsu,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM b),
        |g AS (
        |  SELECT user_id, run, min(event_type) AS event_type,
        |    min(tsu) AS valid_from, count(*) AS n_obs
        |  FROM r GROUP BY user_id, run)
        |SELECT user_id, event_type,
        |  CAST(valid_from AS BIGINT) AS valid_from,
        |  CAST(coalesce(lead(valid_from) OVER wr, 9223372036854775807)
        |    AS BIGINT) AS valid_to,
        |  CAST(n_obs AS BIGINT) AS n_obs,
        |  CAST(CASE WHEN lead(valid_from) OVER wr IS NULL
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM g
        |WINDOW wr AS (PARTITION BY user_id ORDER BY run)""".stripMargin,

    // Same shift-derived decay weights (exact double sums), same
    // per-pair rounded normalization term before the decimal sum.
    "q117_decay_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
        |  FROM events),
        |p AS (SELECT user_id, event_id AS pid, tsu AS pt
        |      FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_type AS ttype, tsu AS tt
        |      FROM ev WHERE event_type IN ('view', 'click')),
        |pairs AS (
        |  SELECT pid, ttype, (pt - tt) // 86400000000 AS days_ago,
        |    1.0 / (1 << ((pt - tt) // 86400000000)) AS w
        |  FROM p JOIN t USING (user_id)
        |  WHERE tt <= pt AND pt - tt < 7 * 86400000000),
        |x AS (
        |  SELECT ttype, days_ago,
        |    floor((w / sum(w) OVER (PARTITION BY pid)) * 1000000000.0 + 0.5) / 1000000000.0 AS term
        |  FROM pairs)
        |SELECT ttype, CAST(days_ago AS BIGINT) AS days_ago,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  floor((CAST(sum(CAST(term AS DECIMAL(38,9))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS credit
        |FROM x GROUP BY 1, 2""".stripMargin,

    // Gini from exact integer sums of squares — no ln(), one IEEE
    // division per feature.
    "q118_user_features" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, sum(c) AS n_events, count(*) AS n_types,
        |    sum(c * c) AS ssq, max(c) AS maxc
        |  FROM c GROUP BY 1)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  floor(CAST(n_events * n_events - ssq AS DOUBLE)
        |    / CAST(n_events * n_events AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS gini,
        |  floor(CAST(maxc AS DOUBLE) / CAST(n_events AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS top_share
        |FROM u""".stripMargin,

    // Same session assignment as q101; items are DISTINCT per basket,
    // support is integer ppm (// floor division), lift one double
    // division of exact integer products.
    "q108_session_assoc" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    event_id, event_type
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_type, tsu, event_id,
        |    CASE WHEN lag(tsu) OVER w IS NULL
        |           OR tsu - lag(tsu) OVER w > 86400000000 THEN 1
        |         ELSE 0 END AS brk
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |items AS (
        |  SELECT DISTINCT user_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM b),
        |nb AS (SELECT count(*) AS n FROM
        |       (SELECT DISTINCT user_id, sess FROM items)),
        |na AS (SELECT event_type, count(*) AS na FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS nab
        |  FROM items a JOIN items b
        |    ON a.user_id = b.user_id AND a.sess = b.sess
        |   AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, nab,
        |  CAST(nab * 1000000 // nb.n AS BIGINT) AS support_ppm,
        |  floor(CAST(nab * nb.n AS DOUBLE) / (x.na * y.na)
        |    * 1000000.0 + 0.5) / 1000000.0 AS lift
        |FROM pairs
        |JOIN na x ON pairs.ta = x.event_type
        |JOIN na y ON pairs.tb = y.event_type
        |CROSS JOIN nb""".stripMargin,

    // Same n-scaled deviation; ts ordering matches the nanos-as-long
    // Spark sort because DuckDB orders the raw TIMESTAMP.
    "q98_cusum_changepoint" ->
      """WITH rows_ AS (
        |  SELECT user_id,
        |    row_number() OVER w AS i,
        |    sum(CAST(value AS DECIMAL(38,6))) OVER w AS si,
        |    count(*) OVER (PARTITION BY user_id) AS n,
        |    sum(CAST(value AS DECIMAL(38,6)))
        |      OVER (PARTITION BY user_id) AS sn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS UNBOUNDED PRECEDING)),
        |dev AS (
        |  SELECT user_id, n, i, abs(n * si - i * sn) AS dev,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY abs(n * si - i * sn) DESC, i ASC) AS rn
        |  FROM rows_)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(i AS BIGINT) AS cp_idx,
        |  floor(CAST(dev AS DOUBLE) / n * 1000000.0 + 0.5)
        |    / 1000000.0 AS cusum_abs
        |FROM dev WHERE rn = 1 AND n >= 20""".stripMargin,

    "q74_ngram_lm" ->
      """WITH toks AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
        |tri AS (
        |  SELECT unnest(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1])) AS prefix,
        |         unnest(list_transform(range(1, len(w)-1), i -> w[i+2])) AS nxt
        |  FROM toks WHERE len(w) >= 3),
        |cnt AS (SELECT prefix, nxt, count(*) AS n FROM tri GROUP BY 1, 2),
        |sel AS (
        |  SELECT prefix, nxt, n,
        |    CAST(sum(n) OVER (PARTITION BY prefix) AS BIGINT) AS total,
        |    row_number() OVER (PARTITION BY prefix ORDER BY n DESC, nxt DESC) AS rn
        |  FROM cnt)
        |SELECT prefix, nxt, n AS cnt, total FROM sel
        |WHERE rn = 1 AND total >= 5""".stripMargin,

    "q75_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.t > s1.t1
        |       WHERE event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.t > s2.t2
        |       WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT u.user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  coalesce(t1, -1) AS t_view, coalesce(t2, -1) AS t_click,
        |  coalesce(t3, -1) AS t_purchase
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id""".stripMargin,

    "q76_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN first ON e.user_id = first.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q78_groupwise_ols" ->
      """WITH stats AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(x * x) AS sxx,
        |    CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM (SELECT event_type,
        |          epoch_ns(ts) // 86400000000000 AS x, value AS y
        |        FROM events)
        |  GROUP BY event_type),
        |sl AS (
        |  SELECT event_type, n, sy, sx,
        |    (n * sxy - sx * sy) /
        |      (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM stats)
        |SELECT event_type, n, floor((slope) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS slope,
        |  floor(((sy - slope * sx) / n) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS intercept
        |FROM sl""".stripMargin,

    "q79_markov_transitions" ->
      """WITH seq AS (
        |  SELECT lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev,
        |    event_type AS nxt
        |  FROM events),
        |cnt AS (
        |  SELECT prev, nxt, count(*) AS cnt FROM seq
        |  WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, nxt, cnt,
        |  floor((CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY prev)) * 1000000.0 + 0.5) / 1000000.0
        |    AS prob
        |FROM cnt""".stripMargin,

    "q80_resample_locf" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value
        |  FROM events),
        |daily AS (
        |  SELECT event_type, day,
        |    floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS v
        |  FROM e GROUP BY 1, 2),
        |bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM e),
        |grid AS (
        |  SELECT t.event_type, g.day
        |  FROM (SELECT DISTINCT event_type FROM e) t,
        |    (SELECT unnest(generate_series(mn, mx)) AS day FROM bounds) g)
        |SELECT grid.event_type, grid.day,
        |  coalesce(last_value(daily.v IGNORE NULLS) OVER (
        |    PARTITION BY grid.event_type ORDER BY grid.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v
        |FROM grid LEFT JOIN daily
        |  ON grid.event_type = daily.event_type AND grid.day = daily.day""".stripMargin,

    "q82_json_extract" ->
      """SELECT event_type,
        |  count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    "q83_moving_avg" -> {
      val locf =
        """WITH e AS (
          |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value
          |  FROM events),
          |daily AS (
          |  SELECT event_type, day,
          |    floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS v
          |  FROM e GROUP BY 1, 2),
          |bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM e),
          |grid AS (
          |  SELECT t.event_type, g.day
          |  FROM (SELECT DISTINCT event_type FROM e) t,
          |    (SELECT unnest(generate_series(mn, mx)) AS day FROM bounds) g),
          |locf AS (
          |  SELECT grid.event_type, grid.day,
          |    coalesce(last_value(daily.v IGNORE NULLS) OVER (
          |      PARTITION BY grid.event_type ORDER BY grid.day
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v
          |  FROM grid LEFT JOIN daily
          |    ON grid.event_type = daily.event_type AND grid.day = daily.day)""".stripMargin
      locf +
        """
          |SELECT event_type, day,
          |  floor((CAST(sum(CAST(v AS DECIMAL(38,6))) OVER (
          |      PARTITION BY event_type ORDER BY day
          |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
          |    / count(*) OVER (
          |      PARTITION BY event_type ORDER BY day
          |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) * 1000000.0 + 0.5) / 1000000.0 AS ma7
          |FROM locf""".stripMargin
    }
  )
}
