package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational surface of the engine: the query shapes Gazette applications
  * express over materialized state (SURVEY.md §2.5, §2.7-2.9), declared with
  * the DataFrame API so Catalyst owns physical strategy (broadcast vs
  * sort-merge join, partial aggregation, pushdown).
  *
  * Determinism notes for the DuckDB oracle:
  *  - double SUMs are order-dependent; we aggregate in DECIMAL(38,6)
  *    (exact, order-independent, same result in DuckDB) and cast the final
  *    value back to double, rounded. `dsum` below encapsulates that.
  *  - every top-k query carries a unique tiebreak key.
  */
object Relational {

  /** Order-independent exact sum of a double column: decimal-accumulate,
    * then floor-round back to double (rule 9 — the decimal SUM is
    * exact, but `round()` of its double cast still splits engines on
    * shortest-repr half-ulp boundaries). Mirrors
    * `floor(cast(sum(cast(x as decimal(38,6))) as double) * 10^s + 0.5)
    * / 10^s` on the oracle side. Shared with CorpusOps — ONE definition
    * of the discipline.
    */
  private[queries] def dsum(c: Column, scale: Int = 2): Column =
    graft.operators.Curation.floorRound(
      sum(c.cast("decimal(38,6)")).cast("double"), scale)

  private def davg(c: Column, scale: Int = 4): Column =
    graft.operators.Curation.floorRound(
      sum(c.cast("decimal(38,6)")).cast("double") / count(lit(1)), scale)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q01: grouped aggregation with partial/map-side combine (SURVEY
    // A3/A9: Gazette's in-txn aggregate caches == Spark partial hash-agg).
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1995-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- q02: join + agg + top-k with unique tiebreak (ORDER BY/LIMIT,
    // SURVEY §2.9). Aggregate lineitem BEFORE the join: revenue is keyed
    // by l_orderkey alone, so the fact table reduces to |orders| rows
    // pre-join — at scale this converts a fact-fact sort-merge join into
    // an agg + broadcast-friendly join.
    "q02_top_revenue_orders" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      // Scan → partial agg → ONE key exchange: on a multi-file table
      // the partial decimal agg parallelizes at the scan; injecting a
      // pre-agg repartition for the single-row-group local files was
      // tried and rejected — the extra stage costs more (codegen + AQE)
      // than the serial partial agg it relieves.
      val rev = li.groupBy($"l_orderkey")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      rev.join(o, $"l_orderkey" === $"o_orderkey")
        .select($"o_orderkey", $"o_orderpriority", $"revenue")
        .orderBy($"revenue".desc, $"o_orderkey".asc)
        .limit(10)
    },

    // ---- q03: mid-size join + group (customer x orders).
    "q03_segment_order_stats" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          dsum($"o_totalprice").as("total_price"),
          countDistinct($"o_custkey").as("n_customers"))
    },

    // ---- q04: star join over small dims — the dims are broadcast
    // (Gazette's "high-volume x low-volume" shard join pattern,
    // consumer/protocol/protocol.proto:74-78). Explicit broadcast() hints.
    "q04_region_revenue" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val na = Tables.nation(s, d)
      val re = Tables.region(s, d)
      li.join(broadcast(su), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(na), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(re), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
             count(lit(1)).as("n_items"))
    },

    // ---- q05/q06: semi/anti joins (EXISTS / NOT EXISTS surface).
    "q05_customers_with_orders" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select($"o_custkey".as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_active"), dsum($"c_acctbal").as("sum_bal"))
    },
    "q06_customers_without_orders" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter($"o_totalprice" > 400000.0)
        .select($"o_custkey".as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    },

    // ---- q07: bounded per-key retention — bike-share's "last 20 rides"
    // (SURVEY A6, examples/bike-share/sql_statements.go:54-59) as
    // ROW_NUMBER() OVER (PARTITION BY key ORDER BY time DESC) <= N.
    "q07_last_orders_per_customer" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      o.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_orderdate"), $"rn")
    },

    // ---- q08: per-key running fold — stream-sum's running CRC update
    // shape (SURVEY A5) as a cumulative window aggregate.
    "q08_running_supplier_revenue" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.filter($"l_suppkey" <= 20)
        .withColumn("running_qty",
          graft.operators.Curation.floorRound(sum($"l_quantity".cast("decimal(38,6)")).over(w).cast("double"), 2))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss").as("l_shipdate"), $"running_qty")
    },

    // ---- q09: relational set ops (SURVEY §2.9 union/intersect/except).
    "q09_part_setops" -> { (s, d) =>
      import s.implicits._
      val p = Tables.part(s, d)
      val brandA = p.filter($"p_brand" === "Brand#1").select($"p_partkey")
      val large  = p.filter($"p_size" >= 25).select($"p_partkey")
      val cheap  = p.filter($"p_retailprice" < 950.0).select($"p_partkey")
      brandA.union(large).distinct()
        .intersect(p.filter($"p_size" >= 5).select($"p_partkey"))
        .except(cheap)
        .select($"p_partkey")
    },

    // ---- q10: exact dedup via distinct (read-committed dedup analog).
    "q10_distinct_event_types" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type", $"user_id" % 100 as "user_bucket")
        .distinct()
    },

    // ---- q11: processing-time/tumbling window over the event stream
    // (SURVEY §2.8): hourly buckets, per-type counts.
    // `ts` is read as long nanos (see Verify session config); the hourly
    // bucket is exact integer arithmetic — no timestamp codec ambiguity.
    "q11_events_hourly" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("hour_epoch", expr("(ts DIV 3600000000000) * 3600"))
        .groupBy($"hour_epoch", $"event_type")
        .agg(count(lit(1)).as("n"),
             dsum($"value", 4).as("sum_value"))
    },

    // ---- q39: session windows (§2.8) in batch form: per-user sessions
    // with a 6h inactivity gap. `session_window` is the same operator
    // Structured Streaming uses with watermarks (WindowingSpec covers
    // the streaming form); the oracle is the classic gaps-and-islands
    // SQL. Session start is emitted as epoch micros (ns truncated
    // identically on both sides).
    "q39_session_windows" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("ets", timestamp_micros(expr("ts DIV 1000")))
        .groupBy($"user_id", session_window($"ets", "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", unix_micros($"w.start").as("session_start"), $"n_events")
    },

    // ---- q81: pivot (long→wide reshape, the companion of q12's
    // rollup and q66's cube): order counts and decimal-exact totals by
    // status × priority, priorities as columns. Spark's pivot with an
    // explicit value list plans as ONE aggregation (each cell a
    // conditional aggregate) — no per-column scan, no join.
    "q81_pivot_priority" -> { (s, d) =>
      import s.implicits._
      val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val wide = Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", pris)
        .agg(count(lit(1)))
      // An empty cell pivots to NULL; a conditional count is 0 — align
      // with the count semantics (matters on sparse status×priority).
      pris.zipWithIndex.foldLeft(wide) { case (df, (p, i)) =>
        df.withColumn(s"p${i + 1}", coalesce(col(p), lit(0L))).drop(p)
      }
    },

    // ---- q12: rollup (multi-level aggregation).
    "q12_nation_rollup" -> { (s, d) =>
      import s.implicits._
      val c  = Tables.customer(s, d)
      val na = Tables.nation(s, d)
      val re = Tables.region(s, d)
      c.join(broadcast(na), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(re), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_bal"))
    },

    // ---- q13: correlated-style aggregate filter: orders above their
    // customer's average order value (join back on grouped subquery).
    "q13_above_avg_orders" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
      // Decimal-exact average (q106's discipline): a plain double avg
      // merges partial sums in partition order, and a row within an
      // ulp of avg*1.5 could flip between engines.
      val avgs = o.groupBy($"o_custkey".as("k"))
        .agg((sum($"o_totalprice".cast("decimal(38,6)")).cast("double")
          / count(lit(1))).as("avg_price"))
      o.join(avgs, $"o_custkey" === $"k")
        .filter($"o_totalprice" > $"avg_price" * 1.5)
        .select($"o_orderkey", $"o_custkey", graft.operators.Curation.floorRound($"o_totalprice", 2).as("o_totalprice"))
    },

    // ---- q106: small-quantity-order revenue (TPC-H Q17's shape) —
    // the scalar correlated subquery (per-part average quantity in the
    // WHERE clause) decorrelated into a pre-aggregated self-join:
    // lineitem aggregates once per partkey, joins back on the same
    // key (one co-partitioned shuffle pair), and the part dimension
    // broadcasts. A per-row subquery plan would rescan lineitem per
    // part; this shape scans it exactly twice at any scale. The
    // per-part average divides a decimal-exact sum by the count, so
    // the threshold comparison is bit-identical on both engines.
    "q106_small_qty_revenue" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val avgs = li.groupBy($"l_partkey".as("k"))
        .agg((sum($"l_quantity".cast("decimal(38,6)")).cast("double")
          / count(lit(1))).as("avgq"))
      li.join(avgs, $"l_partkey" === $"k")
        .filter($"l_quantity" < $"avgq" * lit(0.2))
        .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_li"),
          graft.operators.Curation.floorRound(sum($"l_extendedprice".cast("decimal(38,6)")).cast("double")
            / lit(7.0), 2).as("avg_yearly"))
    },

    // ---- q114: waiting suppliers (TPC-H Q21's shape) — suppliers
    // whose delayed line was the ONLY delay in a multi-supplier
    // finished order. The textbook form is a doubly-correlated
    // EXISTS / NOT EXISTS; here both decorrelate into an
    // orderkey-clustered semi-join (another supplier exists) and
    // anti-join (no OTHER delayed supplier) over the same delayed-line
    // relation — every join keys on l_orderkey, so the plan is one
    // co-partitioned join cascade with no per-row subquery rescans.
    // "Delayed" = shipped > 90 days after the order date (this
    // schema's commit/receipt-date proxy). The tiny supplier dim
    // broadcasts; ties in the top-10 break on the unique s_name.
    "q114_waiting_suppliers" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      val delayed = li
        .join(Tables.orders(s, d).filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .filter(datediff($"l_shipdate", $"o_orderdate") > 90)
        .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      delayed
        .join(li.select($"l_orderkey".as("ok2"), $"l_suppkey".as("sk2")),
          $"ok" === $"ok2" && $"sk" =!= $"sk2", "left_semi")
        .join(delayed.select($"ok".as("ok3"), $"sk".as("sk3")),
          $"ok" === $"ok3" && $"sk" =!= $"sk3", "left_anti")
        .join(broadcast(Tables.supplier(s, d)), $"sk" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name".asc)
        .limit(10)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty,
        |  floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
        |  floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
        |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor((CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1995-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_revenue_orders" ->
      """SELECT o_orderkey, o_orderpriority,
        |  floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q03_segment_order_stats" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_price,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q04_region_revenue" ->
      """SELECT r_name,
        |  floor((CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q05_customers_with_orders" ->
      """SELECT c_mktsegment, count(*) AS n_active,
        |  floor((CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q06_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,

    "q07_last_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q08_running_supplier_revenue" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate,
        |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS running_qty
        |FROM lineitem
        |WHERE l_suppkey <= 20""".stripMargin,

    "q09_part_setops" ->
      """SELECT p_partkey FROM (
        |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
        |  UNION
        |  SELECT p_partkey FROM part WHERE p_size >= 25)
        |INTERSECT
        |SELECT p_partkey FROM part WHERE p_size >= 5
        |EXCEPT
        |SELECT p_partkey FROM part WHERE p_retailprice < 950.0""".stripMargin,

    "q10_distinct_event_types" ->
      """SELECT DISTINCT event_type, user_id % 100 AS user_bucket FROM events""".stripMargin,

    "q11_events_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
        |  count(*) AS n,
        |  floor((CAST(sum(CAST("value" AS DECIMAL(38,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q39_session_windows" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |           OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 21600000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |i AS (
        |  SELECT user_id, us, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m)
        |SELECT user_id, min(us) AS session_start, count(*) AS n_events
        |FROM i GROUP BY user_id, island""".stripMargin,

    "q81_pivot_priority" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS p5
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q12_nation_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  floor((CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q13_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS o_totalprice
        |FROM orders o
        |JOIN (SELECT o_custkey AS k,
        |        CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |          / count(*) AS avg_price
        |      FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.k
        |WHERE o_totalprice > avg_price * 1.5""".stripMargin,

    // Written in the decorrelated form the engine plans; DuckDB would
    // decorrelate the textbook correlated subquery into this same
    // shape. Decimal-exact per-part average, double constants CAST so
    // the threshold arithmetic matches Spark bit-for-bit.
    "q106_small_qty_revenue" ->
      """WITH a AS (
        |  SELECT l_partkey AS k,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*) AS avgq
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_li,
        |  floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(7.0 AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS avg_yearly
        |FROM lineitem l
        |JOIN a ON l.l_partkey = a.k
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_quantity < avgq * CAST(0.2 AS DOUBLE)
        |GROUP BY 1""".stripMargin,

    // The correlated EXISTS/NOT EXISTS form — DuckDB decorrelates it
    // into the same semi/anti cascade the engine plans explicitly.
    "q114_waiting_suppliers" ->
      """WITH del AS (
        |  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND date_diff('day', CAST(o.o_orderdate AS DATE),
        |                  CAST(l.l_shipdate AS DATE)) > 90)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM del l1 JOIN supplier ON l1.sk = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM del l3
        |    WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 10""".stripMargin
  )
}
