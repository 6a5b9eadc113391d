package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TemporalJoins

/** Temporal-join and approximate-aggregate operators (SURVEY §2.7/§2.9
  * extensions): as-of join, interval (range) join, exact percentiles,
  * and HLL distinct-count with an in-query accuracy bound.
  */
object AnalyticOps {

  private val HourNs = 3600L * 1000000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q40: as-of join (attribution): every non-purchase event is
    // attributed to the same user's latest purchase at-or-before its
    // time. One shuffle (union + keyed running last) — no range
    // self-join; see TemporalJoins.asOf for the scale argument.
    "q40_asof_attribution" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val left = ev.filter($"event_type" =!= "purchase")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
      TemporalJoins.asOf(left, col("user_id"), col("ts"),
          purchases, col("user_id"), col("ts"), col("event_id"), "purchase_id")
        .select($"event_id", $"purchase_id")
    },

    // ---- q41: interval join: the 20 earliest purchases each open a
    // 1-hour window; count/sum ALL events landing in each window (no
    // equi-key — a genuine range join against a broadcast band table).
    "q41_range_join_windows" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val bands = ev.filter($"event_type" === "purchase")
        .orderBy($"ts".asc, $"event_id".asc).limit(20)
        .select($"event_id".as("band_id"), $"ts".as("t0"),
          ($"ts" + HourNs).as("t1"))
      TemporalJoins.rangeJoinBroadcast(
          ev.select($"ts", $"value"), col("ts"), bands, col("t0"), col("t1"))
        .groupBy($"band_id")
        .agg(count(lit(1)).as("n_events"),
          graft.operators.Curation.floorRound(sum($"value".cast("decimal(38,6)")).cast("double"), 4).as("sum_value"))
    },

    // ---- q42: exact percentiles (linear interpolation) per group —
    // Spark's `percentile` is an exact sort-based aggregate; DuckDB's
    // quantile_cont uses the same (n-1)·p definition.
    "q42_percentiles" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d).groupBy($"o_orderpriority")
        .agg(
          graft.operators.Curation.floorRound(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          graft.operators.Curation.floorRound(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          graft.operators.Curation.floorRound(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
    },

    // ---- q113: DDSketch mergeable quantiles — p50/p90/p99 of event
    // value per type read from the log-γ bucketed sketch (α = 1%
    // relative error; Masson et al., VLDB 2019). The sketch is a
    // custom Aggregator whose ~1k-bucket map merges map-side, so the
    // shuffle carries buckets·partitions rows however large the input
    // — the mergeable replacement for q42's exact sort-based
    // percentile. Extraction (cumulative walk to rank ceil(q·n), then
    // the bucket midpoint 2γ^b/(γ+1)) stays in the plan: explode the
    // sketch, one window cumsum, conditional-min the crossing bucket.
    // KNOWN cross-engine limit (exception to the libm-free rule): the
    // bucket index is ceil(ln v / ln γ), so a value whose log ratio
    // straddles an ulp boundary can land in adjacent buckets on JVM
    // vs DuckDB libm, shifting a quantile by one bucket (≈2α). That
    // sits inside DDSketch's own ±α accuracy contract — an
    // integer-exact replay would need correctly-rounded logs on both
    // engines, which neither guarantees.
    "q113_ddsketch_quantiles" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val g = 1.01 / 0.99
      val dd = graft.functions.DDSketchAgg.ddsketch(g)
      // The walk counts the sketch's zero store ahead of every
      // positive bucket (zeros sort below all positives). A quantile
      // landing INSIDE the zero mass would still report the first
      // positive bucket in this SQL-shaped extraction — fine for
      // value-metric data where zeros are a trace fraction; use
      // DDSketchAgg.quantile for zero-heavy/negative data (exact
      // three-store walk, spec-covered).
      val buckets = Tables.events(s, d)
        .groupBy($"event_type").agg(dd($"value").as("sk"))
        .select($"event_type", $"sk.zero".as("zc"),
          explode($"sk.pos").as(Seq("bkt", "cnt")))
      val w = Window.partitionBy($"event_type")
      val wc = w.orderBy($"bkt".asc).rowsBetween(Window.unboundedPreceding, 0)
      def est(b: org.apache.spark.sql.Column) =
        graft.operators.Curation.floorRound(lit(2.0) * pow(lit(g), b) / lit(g + 1.0), 6)
      buckets
        .select($"event_type", $"bkt", $"cnt",
          ($"zc" + sum($"cnt").over(wc)).as("cum"),
          ($"zc" + sum($"cnt").over(w)).as("n"))
        .groupBy($"event_type")
        .agg(max($"n").as("n"),
          est(min(when($"cum" >= ceil(lit(0.50) * $"n"), $"bkt"))).as("p50"),
          est(min(when($"cum" >= ceil(lit(0.90) * $"n"), $"bkt"))).as("p90"),
          est(min(when($"cum" >= ceil(lit(0.99) * $"n"), $"bkt"))).as("p99"))
    },

    // ---- q116: 2-D Pareto frontier — users not dominated on
    // (activity, spend): the curation trade-off explorer generalized
    // (quality-vs-length doc selection has the same shape). No O(n²)
    // dominance join: one aggregate to per-x maxima, a prefix-max
    // sweep over the |distinct x| table, and a broadcast semi-join
    // back (see operators.Skyline). Decimal-exact y so frontier
    // equality matches bit-for-bit across engines.
    "q116_pareto_frontier" -> { (s, d) =>
      import s.implicits._
      val users = Tables.events(s, d).groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          graft.operators.Curation.floorRound(sum($"value".cast("decimal(38,6)")).cast("double"), 4)
            .as("sum_value"))
      graft.operators.Skyline.frontier2d(users, $"n_events", $"sum_value")
        .select($"user_id", $"n_events", $"sum_value")
    },

    // ---- q115: distribution drift audit — the data-quality monitor
    // a training pipeline runs between ingestion snapshots: per event
    // type, a chi-square-style drift statistic between the value
    // histograms of the reference window (first half of the month)
    // and the current window (second half). Fixed-width bins
    // (floor(value/50), clamped to 10) keep binning rational — no
    // quantile pass, no ln; each bin's term is one fixed IEEE
    // expression rounded to 1e-9 before an exact decimal sum, so the
    // statistic is order-independent and oracle-replayable. Shape:
    // both windows histogram in ONE pass over events (conditional
    // counts per (type, bin)), per-type totals come from a window
    // over the ~50-row bin table.
    "q115_drift_audit" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val Boundary = lit("2024-01-16 00:00:00")
      val binned = Tables.events(s, d)
        .select($"event_type",
          least(floor($"value" / lit(50.0)), lit(9.0)).cast("long").as("bin"),
          ($"ts" < unix_timestamp(Boundary) * lit(1000000000L)).as("is_ref"))
        .groupBy($"event_type", $"bin")
        .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("rc"),
          sum(when($"is_ref", 0L).otherwise(1L)).as("cc"))
      val w = Window.partitionBy($"event_type")
      val pr = $"rc".cast("double") / $"n_ref".cast("double")
      val pc = $"cc".cast("double") / $"n_cur".cast("double")
      binned
        .select($"event_type", $"rc", $"cc",
          sum($"rc").over(w).as("n_ref"), sum($"cc").over(w).as("n_cur"))
        .select($"event_type", $"n_ref", $"n_cur",
          graft.operators.Curation.floorRound((pc - pr) * (pc - pr) / (pr + lit(1e-6)), 9).as("term"))
        .groupBy($"event_type")
        .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
          graft.operators.Curation.floorRound(sum($"term".cast("decimal(38,9)")).cast("double"), 6)
            .as("chi2"))
    },

    // ---- q100: equi-depth histograms — 8 equal-population buckets of
    // event value per event type (the optimizer-statistics shape, and
    // the binning step of quantile-based feature engineering). ntile
    // over a total order (value, event_id — the id breaks duplicate
    // values deterministically) makes bucket membership exact and
    // partition-independent; one shuffle on event_type serves the
    // window, then a map-side-combined 8-row-per-type aggregate.
    "q100_equidepth_hist" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type")
        .orderBy($"value".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"event_type", $"value", $"event_id")
        .select($"event_type", $"value", ntile(8).over(w).as("bucket"))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n"),
          graft.operators.Curation.floorRound(min($"value"), 6).as("lo"),
          graft.operators.Curation.floorRound(max($"value"), 6).as("hi"))
    },

    // ---- q107: robust outlier detection per group — median/MAD
    // z-score (insensitive to the outliers it hunts, unlike mean/σ).
    // Two exact sort-based percentile passes (the q42 machinery), the
    // deviation join keyed on the 5-row group table (broadcast), then
    // one counting aggregate; threshold 3σ via the 1.4826 MAD
    // consistency constant (3·1.4826 = 4.4478), a single double
    // multiply on both engines.
    "q107_mad_outliers" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select($"event_type", $"med", abs($"value" - $"med").as("adev"))
      val mad = dev.groupBy($"event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy($"event_type")
        .agg(graft.operators.Curation.floorRound(max($"med"), 6).as("med"),
          graft.operators.Curation.floorRound(max($"mad"), 6).as("mad"),
          sum(when($"adev" > lit(4.4478) * $"mad", 1L).otherwise(0L))
            .as("n_outliers"))
    },

    // ---- q145: winsorized robust mean per group — values clamped to
    // [p05, p95] before averaging, the heavy-tail-resistant mean that
    // complements q107's median/MAD outlier COUNTS with a usable
    // center estimate. Exact sort-based percentiles (the q42/q107
    // convention — DDSketch q113 is the mergeable scale path), 5-row
    // cut broadcast, decimal-accumulated mean.
    "q145_winsorized_stats" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value")
      val cuts = ev.groupBy($"event_type").agg(
        expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(cuts), "event_type")
        .select($"event_type", $"lo", $"hi",
          least(greatest($"value", $"lo"), $"hi").as("w"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          graft.operators.Curation.floorRound(max($"lo"), 6).as("lo"),
          graft.operators.Curation.floorRound(max($"hi"), 6).as("hi"),
          graft.operators.Curation.floorRound(sum($"w".cast("decimal(38,6)")).cast("double")
            / count(lit(1)), 6).as("wmean"))
    },

    // ---- q43: HLL++ distinct count, self-checked: the query emits the
    // exact count only when the sketch lands within 5% of it (else a
    // sentinel that fails the oracle compare). Proves the mergeable
    // sketch path — the 100 TB distinct-count operator — against truth
    // without requiring the oracle to replicate HLL internals.
    "q43_hll_distinct_bound" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d).groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact"),
          approx_count_distinct($"user_id", 0.02).as("approx"))
        .select($"event_type",
          when(abs($"approx" - $"exact") <= $"exact" * 0.05, $"exact")
            .otherwise(-$"approx").as("n_distinct"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    // Same (value, event_id) total order; DuckDB's ntile splits the
    // remainder across the leading buckets exactly like Spark's.
    "q100_equidepth_hist" ->
      """SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
        |  floor((min(value)) * 1000000.0 + 0.5) / 1000000.0 AS lo, floor((max(value)) * 1000000.0 + 0.5) / 1000000.0 AS hi
        |FROM (
        |  SELECT event_type, value,
        |    ntile(8) OVER (PARTITION BY event_type
        |      ORDER BY value ASC, event_id ASC) AS bucket
        |  FROM events)
        |GROUP BY event_type, bucket""".stripMargin,

    "q40_asof_attribution" ->
      """WITH u AS (
        |  SELECT user_id AS k, epoch_ns(ts) AS t, 0 AS typ, event_id AS v,
        |         NULL::BIGINT AS event_id
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_ns(ts), 1, NULL, event_id
        |  FROM events WHERE event_type <> 'purchase')
        |SELECT event_id, purchase_id FROM (
        |  SELECT event_id, typ, last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY t, typ, v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_id
        |  FROM u) x
        |WHERE typ = 1""".stripMargin,

    "q41_range_join_windows" ->
      s"""WITH bands AS (
         |  SELECT event_id AS band_id, epoch_ns(ts) AS t0,
         |         epoch_ns(ts) + $HourNs AS t1
         |  FROM events WHERE event_type = 'purchase'
         |  ORDER BY ts, event_id LIMIT 20)
         |SELECT band_id, count(*) AS n_events,
         |  floor((CAST(sum(CAST("value" AS DECIMAL(38,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_value
         |FROM events e JOIN bands b
         |  ON epoch_ns(e.ts) >= b.t0 AND epoch_ns(e.ts) < b.t1
         |GROUP BY band_id""".stripMargin,

    "q42_percentiles" ->
      """SELECT o_orderpriority,
        |  floor((quantile_cont(o_totalprice, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor((quantile_cont(o_totalprice, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90,
        |  floor((quantile_cont(o_totalprice, 0.99)) * 10000.0 + 0.5) / 10000.0 AS p99
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // Same decomposition: per-x maxima, strictly-greater-x prefix
    // max, join back on the frontier coordinate.
    "q116_pareto_frontier" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS n_events,
        |    floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        |      AS sum_value
        |  FROM events GROUP BY 1),
        |g AS (SELECT n_events, max(sum_value) AS ymax
        |      FROM u GROUP BY 1),
        |f AS (SELECT n_events, ymax,
        |        max(ymax) OVER (ORDER BY n_events DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM g)
        |SELECT u.user_id, u.n_events, u.sum_value
        |FROM u JOIN f ON u.n_events = f.n_events AND u.sum_value = f.ymax
        |WHERE f.pm IS NULL OR f.ymax > f.pm""".stripMargin,

    // Same fixed-width binning and boundary, identical per-bin IEEE
    // term rounded to 1e-9 before the exact decimal sum; windowed
    // integer sums pass through CAST (HUGEINT rule).
    "q115_drift_audit" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS bin,
        |    (CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00')
        |      AS is_ref
        |  FROM events),
        |c AS (
        |  SELECT event_type, bin,
        |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS rc,
        |    sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
        |  FROM b GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, rc, cc,
        |    sum(rc) OVER (PARTITION BY event_type) AS n_ref,
        |    sum(cc) OVER (PARTITION BY event_type) AS n_cur
        |  FROM c),
        |x AS (
        |  SELECT event_type, n_ref, n_cur,
        |    floor(((CAST(cc AS DOUBLE) / CAST(n_cur AS DOUBLE)
        |         - CAST(rc AS DOUBLE) / CAST(n_ref AS DOUBLE))
        |        * (CAST(cc AS DOUBLE) / CAST(n_cur AS DOUBLE)
        |         - CAST(rc AS DOUBLE) / CAST(n_ref AS DOUBLE))
        |        / (CAST(rc AS DOUBLE) / CAST(n_ref AS DOUBLE) + 1e-6)) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS term
        |  FROM t)
        |SELECT event_type, CAST(max(n_ref) AS BIGINT) AS n_ref,
        |  CAST(max(n_cur) AS BIGINT) AS n_cur,
        |  floor((CAST(sum(CAST(term AS DECIMAL(38,9))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS chi2
        |FROM x GROUP BY event_type""".stripMargin,

    // Replays the sketch pipeline end-to-end: same ln-ratio
    // bucketing (γ written as the literal division 1.01/0.99 on both
    // engines), same cumulative walk to rank ceil(q·n) (q·n is one
    // IEEE multiply of identical doubles), same midpoint formula.
    "q113_ddsketch_quantiles" ->
      """WITH p AS (
        |  SELECT event_type,
        |    CAST(ceil(ln(value) / ln(1.01/0.99)) AS BIGINT) AS bkt
        |  FROM events WHERE value > 0),
        |z AS (
        |  SELECT event_type,
        |    sum(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS zc
        |  FROM events GROUP BY 1),
        |c AS (SELECT event_type, bkt, count(*) AS cnt FROM p GROUP BY 1, 2),
        |t AS (
        |  SELECT c.event_type, bkt, cnt,
        |    z.zc + sum(cnt) OVER (PARTITION BY c.event_type ORDER BY bkt
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    z.zc + sum(cnt) OVER (PARTITION BY c.event_type) AS n
        |  FROM c JOIN z ON c.event_type = z.event_type)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  floor((2 * pow(1.01/0.99, min(CASE WHEN cum >= ceil(0.50 * n)
        |    THEN bkt END)) / (1.01/0.99 + 1)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        |  floor((2 * pow(1.01/0.99, min(CASE WHEN cum >= ceil(0.90 * n)
        |    THEN bkt END)) / (1.01/0.99 + 1)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
        |  floor((2 * pow(1.01/0.99, min(CASE WHEN cum >= ceil(0.99 * n)
        |    THEN bkt END)) / (1.01/0.99 + 1)) * 1000000.0 + 0.5) / 1000000.0 AS p99
        |FROM t GROUP BY event_type""".stripMargin,

    "q43_hll_distinct_bound" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY event_type""".stripMargin,

    // quantile_cont shares Spark percentile's (n-1)·p interpolation
    // (q42 precedent); the threshold constant is CAST so both engines
    // multiply the same double.
    "q107_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, floor((max(d.med)) * 1000000.0 + 0.5) / 1000000.0 AS med,
        |  floor((max(m.mad)) * 1000000.0 + 0.5) / 1000000.0 AS mad,
        |  CAST(sum(CASE WHEN d.adev > CAST(4.4478 AS DOUBLE) * m.mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1""".stripMargin,

    // quantile_cont ≡ percentile interpolation (q42/q107 precedent);
    // the clamp and the decimal accumulation mirror the Spark side.
    "q145_winsorized_stats" ->
      """WITH cuts AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT e.event_type, c.lo, c.hi,
        |    least(greatest(e.value, c.lo), c.hi) AS w
        |  FROM events e JOIN cuts c USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  floor((max(lo)) * 1000000.0 + 0.5) / 1000000.0 AS lo, floor((max(hi)) * 1000000.0 + 0.5) / 1000000.0 AS hi,
        |  floor((CAST(sum(CAST(w AS DECIMAL(38,6))) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |    AS wmean
        |FROM w GROUP BY event_type""".stripMargin
  )
}
