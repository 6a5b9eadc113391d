package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Bfs, Dedup, HeavyHitters, IncrementalAgg, KCore, PageRank, SetSimilarity, SnapshotDiff, Triangles, ZOrder}

/** Round-3 scale surface (q67+): operators whose point is the 100 TB
  * execution shape — exact-but-sub-quadratic similarity join, two-pass
  * heavy hitters, snapshot diffing, space-filling-curve layout,
  * fixed-point iterative graph compute.
  */
object ScaleOps {

  /** The co-purchase pair graph shared by q95/q99/q105/q110: parts
    * co-occurring in an order (quantity >= 25 keeps analysis density).
    * q95 consumes the canonical u < v pairs ([[coPurchasePairsRaw]];
    * its operator dedups), the edge queries the symmetrized distinct
    * directed list ([[coPurchaseEdges]]). ONE set-builder
    * ([[coPurchaseSets]]) so the graph queries (and their oracle CTEs)
    * cannot drift apart.
    */
  /** Shared oracle CTEs for the co-purchase pair graph — `li` and the
    * canonical `pairs(u, v)` — mirroring [[coPurchasePairsRaw]] so the
    * Scala helper and the four graph oracles (q95/q99/q105/q110)
    * cannot drift apart. `mat` marks them MATERIALIZED for oracles
    * whose unrolled chains re-read `pairs` many times.
    */
  /** The epoch-day expression both curve keys (q70/q91) quantize —
    * one definition so the two layouts stay on the same grid.
    */
  private val OrderDayExpr =
    "unix_millis(cast(o_orderdate as timestamp)) div 86400000"

  /** (custkey min, custkey max, day min, day max) — the shared bounds
    * pull for the curve keys (one 1-row driver action).
    */
  private def orderCurveBounds(orders: DataFrame): IndexedSeq[Long] = {
    import org.apache.spark.sql.functions.{expr, max, min}
    val r = orders.agg(
      min(expr("o_custkey")), max(expr("o_custkey")),
      min(expr(OrderDayExpr)), max(expr(OrderDayExpr))).head()
    (0 to 3).map(r.getLong)
  }

  private def coPurchaseCtes(mat: Boolean = false): String = {
    val m = if (mat) " MATERIALIZED" else ""
    s"""li AS$m (
       |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 25),
       |pairs AS$m (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""".stripMargin
  }

  /** The sorted distinct part set of each qualifying order — the
    * single-exchange core of the pair build (r11 optimization, guide
    * §2.3/§2.4): the old self-join on l_orderkey scanned AND shuffled
    * lineitem twice before a third exchange for the pair distinct;
    * grouping to a per-order set shuffles the table once (map-side
    * partial collect_set dedups within the order), and pair generation
    * becomes local array work. Same pair set by construction.
    */
  private def coPurchaseSets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d).filter($"l_quantity" >= 25)
      .select($"l_orderkey", $"l_partkey")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"l_partkey")).as("ps"))
      .filter(size($"ps") >= 2)
  }

  /** Canonical u < v co-purchase pairs, NOT yet deduplicated across
    * orders (within an order they are distinct via collect_set). The
    * only consumer is q95, whose [[Triangles.perNodeCounts]] dedups
    * internally anyway — a distinct here would pay a second full
    * exchange of the pair set for nothing (r11; the before-plan shows
    * both). ps is sorted ascending, so slicing strictly after x yields
    * exactly the canonical pairs of the old a.l_partkey < b.l_partkey
    * self-join.
    */
  private def coPurchasePairsRaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    coPurchaseSets(s, d)
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps) - i - 1), " +
          "y -> struct(x AS u, y AS v))))")).as("p"))
      .select($"p.u".as("u"), $"p.v".as("v"))
  }

  /** [[coPurchasePairsRaw]] symmetrized to a directed (src, dst) list.
    * Both orientations are generated in the SAME per-order explode and
    * deduplicated by ONE distinct (r11): the old
    * `pairs.unionAll(pairs.swap)` form re-ran the entire pair plan —
    * self-join included — once per union branch inside every caller's
    * persist() materialization.
    */
  private[graft] def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    coPurchaseSets(s, d)
      .select(explode(expr(
        "flatten(transform(ps, x -> " +
          "transform(filter(ps, y -> y != x), " +
          "y -> struct(x AS src, y AS dst))))")).as("p"))
      .select($"p.src".as("src"), $"p.dst".as("dst"))
      .distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q67: prefix-filtered exact set-similarity self-join
    // (AllPairs/PPJoin family): same result set as the exhaustive q24
    // baseline — no LSH recall loss — but candidate generation only
    // inverts each document's rare-first prefix tokens, so the
    // stop-shingle posting lists that make q24 quadratic never enter
    // the index. Lower threshold than q24/q25 (0.80) both to
    // differentiate the checked surface and because exact methods are
    // what you reach for when tau drops and LSH recall decays.
    "q67_prefix_simjoin" -> { (s, d) =>
      import s.implicits._
      val docs = Dedup.docShingles(Tables.documents(s, d), $"doc_id", $"text", 3)
      SetSimilarity.prefixJaccardSelfJoin(docs, 0.80)
        .select($"da", $"db", graft.operators.Curation.floorRound($"jaccard", 4).as("jaccard"))
    },

    // ---- q68: two-pass exact heavy hitters (Misra-Gries candidates →
    // exact recount of candidates only). Same answer as a full
    // vocabulary groupBy + HAVING, but with O(k·partitions) state —
    // the shape that still works when the vocabulary doesn't fit.
    "q68_heavy_hitters" -> { (s, d) =>
      import s.implicits._
      HeavyHitters.frequentTokens(Tables.documents(s, d), $"text", k = 500)
    },

    // ---- q69: snapshot diff between two corpus versions (simulated
    // deterministically from `documents`: version A drops doc_id%10=0,
    // version B drops doc_id%7=0 and edits doc_id%5=0), keyed by
    // doc_id with an md5 content fingerprint. The incremental-refresh
    // front door: downstream reprocessing reads added ∪ changed only.
    "q69_snapshot_diff" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val a = docs.filter($"doc_id" % 10 =!= 0).select($"doc_id", $"text")
      val b = docs.filter($"doc_id" % 7 =!= 0).select($"doc_id",
        when($"doc_id" % 5 === 0, concat($"text", lit(" v2")))
          .otherwise($"text").as("text"))
      SnapshotDiff.diff(a, b, "doc_id", md5($"text"))
        .filter($"status" =!= "unchanged")
    },

    // ---- q70: z-order (Morton) clustering key over orders
    // (customer × order day): the multi-dimensional file-layout op.
    // Spark computes min/max stats once (constant-folded literals);
    // the oracle recomputes them in a CTE — identical integer math
    // either way. The layout exchange itself (repartitionByRange on
    // zv) is exercised in the spec; the gate checks the key values.
    "q70_zorder_key" -> { (s, d) =>
      import s.implicits._
      val orders = Tables.orders(s, d)
      val b = orderCurveBounds(orders)
      val dims = Seq(
        ("o_custkey", b(0).toString, b(1).toString),
        (OrderDayExpr, b(2).toString, b(3).toString))
      orders.select($"o_orderkey",
        expr(ZOrder.zSql(dims, bits = 16, duck = false)).as("zv"))
    },

    // ---- q91: Hilbert clustering key over the SAME dimensions as
    // q70 — the better-locality curve (consecutive keys are always
    // grid neighbors, so range-partitioned files cover tighter
    // hyper-boxes than Morton's bit-boundary jumps). Native codegen
    // walk on the Spark side; the oracle unrolls the same reflect/
    // rotate levels as a CTE chain — integer-exact in both dialects.
    "q91_hilbert_key" -> { (s, d) =>
      import s.implicits._
      val orders = Tables.orders(s, d)
      val b = orderCurveBounds(orders)
      orders.select($"o_orderkey",
        graft.functions.F.hilbert2(
          expr(ZOrder.rankSql("o_custkey",
            b(0).toString, b(1).toString, bits = 16, duck = false)),
          expr(ZOrder.rankSql(OrderDayExpr,
            b(2).toString, b(3).toString, bits = 16, duck = false)),
          bits = 16).as("hv"))
    },

    // ---- q71: fixed-point PageRank (3 iterations) over the
    // bidirectional customer↔supplier trade graph (distinct pairs from
    // lineitem⋈orders; vertex id = 2·custkey / 2·suppkey+1). Integer
    // nano-rank arithmetic makes the iterative computation bit-exact
    // and partition-order-independent — reproducible distributed graph
    // compute, replayable by the SQL oracle.
    "q71_pagerank" -> { (s, d) =>
      import s.implicits._
      val pairs = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
      PageRank.ranksFixedPoint(edges, iters = 3)
    },

    // ---- q95: per-part triangle counts over the co-purchase graph
    // (parts sharing an order, quantity ≥ 25 to keep the graph at
    // analysis density). Degree-ordered orientation finds each
    // triangle once with O(m^1.5) wedge work regardless of skew — the
    // only triangle-counting shape that survives a celebrity vertex
    // at 100 TB (see Triangles scaladoc).
    "q95_triangle_counts" -> { (s, d) =>
      Triangles.perNodeCounts(coPurchasePairsRaw(s, d))
    },

    // ---- q99: synchronous label propagation (2 rounds) over the q95
    // co-purchase graph — community detection where connected
    // components are too coarse (the graph is one giant component;
    // LPA's majority vote splits it along dense regions). Each round
    // is one vertex-keyed join + one (dst, label) count + one per-dst
    // rank: all hash shuffles on vertex ids, state is |V| labels —
    // round-synchronous and deterministic because ties go to
    // (count DESC, label ASC), so the result is independent of
    // partitioning and replayable as unrolled SQL rounds.
    "q99_label_propagation" -> { (s, d) =>
      import s.implicits._
      val edges = coPurchaseEdges(s, d)
        .select($"src".as("u"), $"dst".as("v"))
        .persist()
      var labels = edges.select($"u".as("node")).distinct()
        .select($"node", $"node".as("label"))
      // r11: the per-round vote is an ARGMAX per dst — max(struct(cnt,
      // −label)) picks (count DESC, label ASC) exactly like the old
      // row_number window, but as a mergeable hash aggregate with
      // map-side partials instead of an exchange + sort + WindowExec
      // (the clusterWinners pattern). Labels are vertex ids ≥ 0, so
      // −label inverts their order losslessly; ties in (cnt, label)
      // cannot exist (label is the group key of the count).
      for (_ <- 1 to 2)
        labels = edges.join(labels, $"u" === $"node")
          .groupBy($"v".as("dst"), $"label")
          .agg(count(lit(1)).as("cnt"))
          .groupBy($"dst")
          .agg(max(struct($"cnt", (-$"label").as("nl"))).as("m"))
          .select($"dst".as("node"), (-$"m.nl").as("label"))
      labels
    },

    // ---- q105: multi-source BFS (3 hops) over the q95 co-purchase
    // graph from its 3 smallest vertices — k-hop neighborhood /
    // reachability features. Frontier expansion: each round joins only
    // the newly-found vertices against the cached edges and anti-joins
    // the visited set, so per-round work is Σ outdeg(frontier) — the
    // textbook Pregel shape, replayed by a recursive-CTE oracle.
    "q105_bfs_khop" -> { (s, d) =>
      import s.implicits._
      // Persisted (q99's discipline): seeds derive from the same frame
      // Bfs caches internally — unpersisted, the lineitem self-join +
      // distinct (the dominant cost) would run once for the seed pull
      // and again to fill the BFS edge cache.
      val edges = coPurchaseEdges(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seeds = edges.select($"src".as("node")).distinct()
        .orderBy($"node".asc).limit(3)
      Bfs.distances(edges, seeds, maxHops = 3)
    },

    // ---- q110: k-core decomposition (k=4) of the q95 co-purchase
    // graph — iterative degree peeling to the dense core, the standard
    // pre-filter before community detection / graph ML and the
    // spam-subgraph miner. Each round is one degree aggregation plus
    // two semi-joins against the cached edge list (work ∝ |E|, no
    // quadratic step); the unique fixpoint makes the unrolled-SQL
    // oracle replay exact.
    "q110_kcore" -> { (s, d) =>
      KCore.core(coPurchaseEdges(s, d), k = 4, maxRounds = 6)
    },

    // ---- q161: recursive SQL as an ENGINE CAPABILITY — the same
    // 3-hop multi-source walk as q105 expressed as a genuine
    // `WITH RECURSIVE` through spark.sql (Spark 4's UnionLoop; the
    // reference analog is bike-share's recursive cycle walk,
    // examples/bike-share/sql_statements.go:64-104). Spark's recursion
    // supports UNION ALL only, so the walk recovers BFS layers with
    // min(dist); the DISTINCT in the recursive leg collapses each
    // level to unique (node, dist) rows, so the per-iteration working
    // set is bounded by |V|·depth instead of the path count — on a
    // dense graph the undeduplicated UNION ALL walk multiplies by
    // mean out-degree per hop. (min(dist) over distinct pairs is
    // identical to min over paths, so results are unchanged.)
    // [[Bfs.distances]] (q105) remains the 100-TB path — its frontier
    // anti-join also skips re-expanding nodes SEEN AT EARLIER levels,
    // which the level-local DISTINCT cannot; this entry certifies the
    // SQL surface, not a new scale plan.
    "q161_recursive_cte" -> { (s, d) =>
      // Persisted (q105's discipline): the UnionLoop re-reads the edge
      // view once per iteration (4×) and the seed subquery once more —
      // unpersisted, the lineitem self-join + distinct would replay
      // five times.
      val e = coPurchaseEdges(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.createOrReplaceTempView("graft_q161_edges")
      s.sql(
        """WITH RECURSIVE walk(node, dist) AS (
          |  SELECT node, 0 FROM (
          |    SELECT src AS node FROM graft_q161_edges
          |    GROUP BY src ORDER BY node LIMIT 3)
          |  UNION ALL
          |  SELECT DISTINCT e.dst, w.dist + 1 FROM walk w
          |  JOIN graft_q161_edges e ON e.src = w.node
          |  WHERE w.dist < 3)
          |SELECT CAST(node AS BIGINT) AS node,
          |  CAST(min(dist) AS INT) AS dist
          |FROM walk GROUP BY node""".stripMargin)
    },

    // ---- q72: cross-corpus near-dup join — dedup a fresh slice
    // (doc_id%3=0) against the curated rest without self-joining the
    // history. LSH bands per side, bucket-equal candidates, exact
    // Jaccard verification; no ordering constraint between sides.
    "q72_crosscorpus_dedup" -> { (s, d) =>
      import s.implicits._
      val sh = Dedup.docShingles(Tables.documents(s, d), $"doc_id", $"text", 3)
      Dedup.minhashLshJoin(
        sh.filter($"doc_id" % 3 === 0), sh.filter($"doc_id" % 3 =!= 0), 0.85)
        .select($"da", $"db", graft.operators.Curation.floorRound($"jaccard", 4).as("jaccard"))
    },

    // ---- q73: incremental view maintenance of a per-language
    // (doc count, char sum) materialization across the q69 snapshot
    // transition: maintenance work scales with |changes|, not |B|.
    // The result must equal (and is oracle-checked against) a fresh
    // aggregation of snapshot B.
    "q73_incremental_agg" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val a = docs.filter($"doc_id" % 10 =!= 0).select($"doc_id", $"lang", $"text")
      val b = docs.filter($"doc_id" % 7 =!= 0).select($"doc_id", $"lang",
        when($"doc_id" % 5 === 0, concat($"text", lit(" v2")))
          .otherwise($"text").as("text"))
      val aggA = a.groupBy($"lang".as("g"))
        .agg(count(lit(1)).as("n"), sum(length($"text")).as("s"))
      val delta = IncrementalAgg.countSumDelta(
        a, b, key = "doc_id", grp = "lang", length($"text"), md5($"text"))
      IncrementalAgg.maintainCountSum(aggA, delta)
        .select($"g".as("lang"), $"n".as("n_docs"), $"s".as("sum_chars"))
    },

    // ---- q77: salted equi-join — the manual skew-join split (events
    // has 5 event types: EVERY key is hot). The small dimension is
    // replicated `salts`×, the fact side scatters uniformly by row
    // hash, the join runs on (key, salt); result equals the plain
    // join, checked through a post-join aggregate.
    "q77_salted_join" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val dim = ev.select($"event_type").distinct()
        .select($"event_type", upper($"event_type").as("label"),
          length($"event_type").as("wt"))
      graft.operators.Skew.saltedJoin(ev, dim, "event_type", salts = 16)
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          graft.operators.Curation.floorRound(sum($"value".cast("decimal(38,6)")).cast("double") * first($"wt"), 2)
            .as("weighted"))
    },

    // ---- q84: ANALYZE-style column statistics — the control-plane op
    // that feeds CBO/pruning at 100 TB (row counts, null counts, NDVs,
    // min/max per column). One pruned columnar scan + single-distinct
    // aggregate PER COLUMN, unioned: N exact countDistinct in one
    // aggregate would plan as an N-way row expand over the fact table
    // (measured 7s vs ~2s at sf0.1); per-column jobs keep each
    // distinct on the no-expand path and each scan reads one column.
    "q84_table_stats" -> { (s, d) =>
      import s.implicits._
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      val li = Tables.lineitem(s, d)
      val nRows = li.count()
      cols.map { c =>
        li.select(col(c))
          .agg(count(col(c)).as("n_notnull"),
            countDistinct(col(c)).as("ndv"),
            min(col(c)).cast("string").as("min_s"),
            max(col(c)).cast("string").as("max_s"))
          .select(lit(c).as("col_name"), lit(nRows).as("n_rows"),
            $"n_notnull", $"ndv", $"min_s", $"max_s")
      }.reduce(_ unionAll _)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q67_prefix_simjoin" ->
      s"WITH ${PipelineOps.nearDupCtes("", 0.80)}\nSELECT da, db, jaccard FROM neardup",

    "q68_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS cnt FROM tok
        |GROUP BY token
        |HAVING count(*) * 500 > (SELECT count(*) FROM tok)""".stripMargin,

    "q69_snapshot_diff" ->
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 <> 0),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS fp
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.fp <> b.fp THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |WHERE (a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp <> b.fp)""".stripMargin,

    "q70_zorder_key" -> {
      val z = graft.operators.ZOrder.zSql(Seq(
        ("o_custkey", "mn0", "mx0"),
        ("(epoch_ms(o_orderdate) // 86400000)", "mn1", "mx1")),
        bits = 16, duck = true)
      s"""WITH stats AS (
        |  SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
        |    min(epoch_ms(o_orderdate) // 86400000) AS mn1,
        |    max(epoch_ms(o_orderdate) // 86400000) AS mx1
        |  FROM orders)
        |SELECT o_orderkey, $z AS zv FROM orders, stats""".stripMargin
    },

    "q91_hilbert_key" -> {
      val bits = 16
      val xr = graft.operators.ZOrder.rankSql(
        "o_custkey", "mn0", "mx0", bits, duck = true)
      val yr = graft.operators.ZOrder.rankSql(
        "(epoch_ms(o_orderdate) // 86400000)", "mn1", "mx1", bits, duck = true)
      s"""WITH stats AS (
        |  SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
        |    min(epoch_ms(o_orderdate) // 86400000) AS mn1,
        |    max(epoch_ms(o_orderdate) // 86400000) AS mx1
        |  FROM orders),
        |${graft.operators.ZOrder.hilbertSqlDuck(Seq("o_orderkey"), xr, yr,
             bits, "orders, stats")}
        |SELECT o_orderkey, CAST(d$bits AS BIGINT) AS hv FROM h$bits""".stripMargin
    },

    "q71_pagerank" -> {
      val S = 1000000000L
      def iter(i: Int) =
        s"""s$i AS (
           |  SELECT e.dst AS node, sum(r.r // d.deg) AS s
           |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
           |  JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst),
           |r$i AS (
           |  SELECT node, (15 * ($S // n.n)) // 100 + (85 * s) // 100 AS r
           |  FROM s$i, n)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT src AS node, ($S // n.n) AS r FROM deg, n),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS r
         |FROM r3""".stripMargin
    },

    // Identical degree-ordered orientation: okey packs (degree, id)
    // into one BIGINT; each triangle closes once at its okey-least
    // vertex, then credits all three corners.
    "q95_triangle_counts" ->
      s"""WITH ${coPurchaseCtes()},
        |e AS (SELECT u, v FROM pairs),
        |deg AS (SELECT n, count(*) AS d FROM (
        |  SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
        |o AS (SELECT
        |    CASE WHEN (ku.d, ku.n) < (kv.d, kv.n) THEN e.u ELSE e.v END AS src,
        |    CASE WHEN (ku.d, ku.n) < (kv.d, kv.n) THEN e.v ELSE e.u END AS dst,
        |    CASE WHEN (ku.d, ku.n) < (kv.d, kv.n)
        |      THEN ROW(kv.d, kv.n) ELSE ROW(ku.d, ku.n) END AS dkey
        |  FROM e JOIN deg ku ON e.u = ku.n JOIN deg kv ON e.v = kv.n),
        |tri AS (
        |  SELECT a.src AS x, a.dst AS y, b.dst AS z
        |  FROM o a JOIN o b ON a.src = b.src AND a.dkey < b.dkey
        |  JOIN o c ON c.src = a.dst AND c.dst = b.dst)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT unnest([x, y, z]) AS node FROM tri)
        |GROUP BY node""".stripMargin,

    // Two unrolled LPA rounds, same (count DESC, label ASC) vote.
    "q99_label_propagation" ->
      s"""WITH ${coPurchaseCtes()},
        |e AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
        |l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),
        |v1 AS (
        |  SELECT e.v AS dst, l.label, count(*) AS cnt
        |  FROM e JOIN l0 l ON e.u = l.node GROUP BY 1, 2),
        |l1 AS (
        |  SELECT dst AS node, label FROM (
        |    SELECT dst, label, row_number() OVER (PARTITION BY dst
        |      ORDER BY cnt DESC, label ASC) AS rn FROM v1) x WHERE rn = 1),
        |v2 AS (
        |  SELECT e.v AS dst, l.label, count(*) AS cnt
        |  FROM e JOIN l1 l ON e.u = l.node GROUP BY 1, 2)
        |SELECT dst AS node, label FROM (
        |  SELECT dst, label, row_number() OVER (PARTITION BY dst
        |    ORDER BY cnt DESC, label ASC) AS rn FROM v2) x WHERE rn = 1""".stripMargin,

    // The same UNION ALL path walk as the Spark side (Spark's
    // recursion has no UNION-distinct yet); the dist<3 guard bounds
    // cyclic walks and min(dist) recovers BFS layers.
    "q161_recursive_cte" ->
      s"""WITH RECURSIVE ${coPurchaseCtes()},
        |e AS (SELECT u AS src, v AS dst FROM pairs
        |      UNION ALL SELECT v, u FROM pairs),
        |walk(node, dist) AS (
        |  SELECT node, 0 FROM (
        |    SELECT src AS node FROM e GROUP BY src ORDER BY node LIMIT 3)
        |  UNION ALL
        |  SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
        |  WHERE w.dist < 3)
        |SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS INT) AS dist
        |FROM walk GROUP BY node""".stripMargin,

    // The recursive walk generates every (node, dist<=3) discovery;
    // UNION dedup bounds it by 4|V|, min(dist) recovers BFS layers.
    "q105_bfs_khop" ->
      s"""WITH RECURSIVE ${coPurchaseCtes()},
        |e AS (SELECT u AS src, v AS dst FROM pairs
        |      UNION ALL SELECT v, u FROM pairs),
        |seeds AS (SELECT src AS node FROM e GROUP BY src
        |          ORDER BY src LIMIT 3),
        |walk(node, dist) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
        |  WHERE w.dist < 3)
        |SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS INT) AS dist
        |FROM walk GROUP BY node""".stripMargin,

    // Six unrolled peel rounds (the operator's maxRounds) then the
    // same final deg >= k select — a converged early stop on the Spark
    // side returns identical rows because later rounds are no-ops.
    // Every CTE is MATERIALIZED: each round references its predecessor
    // three times (degree agg + two joins), so inlining would blow the
    // expression tree up ~3^rounds — the SQL mirror of why the Spark
    // operator persists each round's edge list.
    "q110_kcore" -> {
      val k = 4
      def round(i: Int) =
        s"""k$i AS MATERIALIZED (
           |  SELECT src AS node FROM e${i - 1} GROUP BY src
           |  HAVING count(*) >= $k),
           |e$i AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN k$i a ON e.src = a.node
           |  JOIN k$i b ON e.dst = b.node)""".stripMargin
      s"""WITH ${coPurchaseCtes(mat = true)},
        |e0 AS MATERIALIZED (
        |  SELECT u AS src, v AS dst FROM pairs
        |  UNION ALL SELECT v, u FROM pairs),
        |${(1 to 6).map(round).mkString(",\n")}
        |SELECT CAST(src AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e6 GROUP BY src HAVING count(*) >= $k""".stripMargin
    },

    "q72_crosscorpus_dedup" -> {
      // Brute-force cross-side Jaccard: same shingle CTEs as the
      // self-join oracles, pairs restricted to (new, rest) sides.
      s"""WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM toks WHERE len(w) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |cnt AS (SELECT doc_id, len(s) AS c FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle
        |  WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
        |  GROUP BY 1, 2)
        |SELECT da, db,
        |  floor((CAST(shared AS DOUBLE) / (ca.c + cb.c - shared)) * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM pairs
        |JOIN cnt ca ON da = ca.doc_id
        |JOIN cnt cb ON db = cb.doc_id
        |WHERE CAST(shared AS DOUBLE) / (ca.c + cb.c - shared) >= 0.85""".stripMargin
    },

    "q73_incremental_agg" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0)
        |GROUP BY lang""".stripMargin,

    "q77_salted_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type, upper(event_type) AS label,
        |    length(event_type) AS wt
        |  FROM events)
        |SELECT label, count(*) AS n,
        |  floor((CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * any_value(wt)) * 100.0 + 0.5) / 100.0
        |    AS weighted
        |FROM events JOIN dim USING (event_type)
        |GROUP BY label""".stripMargin,

    "q84_table_stats" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, (SELECT count(*) FROM lineitem) AS n_rows,
           |  count($c) AS n_notnull, count(DISTINCT $c) AS ndv,
           |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    }
  )
}
