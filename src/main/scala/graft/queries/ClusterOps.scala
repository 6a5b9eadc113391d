package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Clustering, CountMin, Decomposition, FuzzyJoin}
import graft.operators.TextAnalysis

/** Clustering, semantic dedup, sketching, record linkage, and
  * multi-dimensional analytics (q61-q66).
  *
  * Oracle notes: k-means determinism rests on three contracts shared
  * with the SQL side — md5-ordered centroid seeding, index-order double
  * accumulation for distances, and exact fixed-point centroid means
  * (see [[Clustering.VecMean]]). The KMV sketch and fuzzy join are
  * plain deterministic pipelines.
  */
object ClusterOps {

  private val Dim = 64
  private val KmvK = 32

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q61: deterministic Lloyd's k-means (k=8, one update round)
    // over the embedding corpus; output is the final cell assignment.
    // The per-round cost at scale: one broadcast (k·dim doubles), one
    // narrow assignment map, one map-side-combined k-row mean agg.
    "q61_kmeans" -> { (s, d) =>
      import s.implicits._
      Clustering.kmeansAssign(Tables.embeddings(s, d), k = 8, updates = 1)
        .select($"vec_id", $"cell")
    },

    // ---- q62: SemDeDup-shaped semantic dedup: cosine near-dup pairs
    // compared only WITHIN a k-means cell — Σ|cell|²/2 comparisons
    // instead of n²/2 (the cross-cell pairs are the sacrificed recall).
    "q62_semantic_dedup" -> { (s, d) =>
      import s.implicits._
      val assigned = Clustering.kmeansAssign(
        Tables.embeddings(s, d), k = 8, updates = 1)
      Clustering.semanticDupPairs(assigned, threshold = 0.4)
        .select($"cell", $"va", $"vb", $"sim")
    },

    // ---- q120: Gonzalez greedy k-center selection (k=8, cosine
    // distance) — the coreset / diversity-pruning primitive: each round
    // adds the point farthest from every chosen center. Per round at
    // scale: one narrow least()-update map over the cached corpus and
    // a 1-row argmax pull; the oracle replays the same 8 rounds as a
    // chained CTE (seed → incremental min-dist update → argmax).
    "q120_kcenter_coreset" -> { (s, d) =>
      import s.implicits._
      Clustering.kcenterGreedy(Tables.embeddings(s, d), k = 8)
    },

    // ---- q125: sorted-neighborhood record linkage (window 3, edit
    // distance <= 2) over customer names — the complementary blocking
    // strategy to q64's length bands. Global rank is the scale-safe
    // two-phase form (range exchange + per-partition index + P-row
    // offset broadcast); candidates come from an integer rank
    // equi-join, never a cross join.
    "q125_sorted_neighborhood" -> { (s, d) =>
      import s.implicits._
      graft.operators.SortedNeighborhood.pairs(
        Tables.customer(s, d), $"c_name", window = 3, maxDist = 2)
    },

    // ---- q63: KMV (bottom-k) distinct sketch per language: the k
    // minimum normalized hashes of each group; est = (k-1)/u_k. A
    // mergeable sketch (union = merge-and-truncate) — the companion to
    // q43's HLL, with exact per-group error visible to the oracle. The
    // bounded TopK aggregator keeps k entries per partition pre-shuffle.
    "q63_kmv_sketch" -> { (s, d) =>
      import s.implicits._
      val topk = graft.functions.TopKAgg.topK(KmvK)
      Tables.documents(s, d)
        .select($"lang", $"doc_id",
          (conv(substring(md5($"text"), 1, 8), 16, 10).cast("long")
            / lit(4294967296.0)).as("u"))
        // KMV sketches DISTINCT hash values: duplicate texts share a u,
        // and letting both occupy sketch slots pulls u_k below the true
        // k-th distinct hash — overestimating est = (k-1)/u_k and
        // double-counting on merge (KmvOverlap's groupBy(src, u) rule).
        .groupBy($"lang", $"u").agg(min($"doc_id").as("doc_id"))
        .groupBy($"lang")
        .agg(topk(-$"u", $"doc_id").as("sk"))
        .select($"lang",
          size($"sk").as("k"),
          graft.operators.Curation.floorRound(-element_at($"sk", size($"sk")).getField("v"), 12).as("kth"),
          graft.operators.Curation.floorRound((size($"sk") - 1).cast("double")
            / -element_at($"sk", size($"sk")).getField("v"), 4).as("est"))
    },

    // ---- q96: count-min sketch accuracy audit — token frequencies
    // estimated from a 4×1024 counter table vs exact counts for every
    // token appearing ≥ 50 times. Completes the mergeable-sketch
    // family (HLL q43 distincts, KMV q63 per-group distincts,
    // Misra-Gries q68 heavy hitters; CMS = point frequencies): the
    // sketch is d·w rows whatever the vocabulary, built map-side
    // combined, merged by addition. Estimates are md5-deterministic so
    // the oracle replays them bit-for-bit; est ≥ true always (min of
    // overcounting rows), and the overshoot the gate records IS the
    // sketch's documented ε·N error at this width.
    "q96_count_min" -> { (s, d) =>
      import s.implicits._
      // Persist the VOCAB-sized count table, not the per-occurrence
      // explode (hellingerBySource's cache-sizing doctrine): both
      // consumers — the sketch and the exact truth — only need counts,
      // and sketchCounts folds them in by weight.
      val counts = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(TextAnalysis.wordTokens($"text")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("n_true"))
        .persist()
      val sk = CountMin.sketchCounts(counts, $"tok", $"n_true", d = 4, w = 1024)
      val truth = counts.filter($"n_true" >= 50)
      CountMin.estimate(sk, truth.select($"tok"), $"tok", d = 4, w = 1024)
        .join(truth, $"item" === $"tok")
        .select($"tok", $"n_true", $"est".as("n_est"))
    },

    // ---- q64: fuzzy self-join (record linkage) over distinct part
    // names: all pairs within levenshtein distance 2, found via lossless
    // length blocking — no O(n²) cross join (FuzzyJoin doc).
    "q64_fuzzy_join" -> { (s, d) =>
      import s.implicits._
      FuzzyJoin.selfJoin(Tables.part(s, d), $"p_name", maxDist = 2)
    },

    // ---- q92: entity-resolution clusters — q64's fuzzy-linkage pairs
    // closed into components by the large-star/small-star alternation
    // (the O(log n)-round CC; linkage graphs CHAIN — a≈b≈c with
    // dist(a,c)>2 — so the diameter bound min-label relies on is
    // exactly what this composition cannot assume). Stable long ids =
    // min partkey per name; canonical entity = name of the component's
    // min id.
    "q92_entity_clusters" -> { (s, d) =>
      import s.implicits._
      val part = Tables.part(s, d)
      // NOT pinned (r11, measured): the name→id table is referenced
      // four times, but it is a tiny scan+agg and a persist() showed
      // no reproducible in-suite win over recomputing it as four
      // cheap broadcast builds — the cache round-trip (write +
      // columnar InMemoryTableScan per reference) costs about what
      // the recompute does.
      val ids = part.groupBy($"p_name".as("name"))
        .agg(min($"p_partkey").as("id"))
      val pairs = FuzzyJoin.selfJoin(part, $"p_name", maxDist = 2)
      val e = pairs
        .join(ids.select($"name".as("na"), $"id".as("ia")), "na")
        .join(ids.select($"name".as("nb"), $"id".as("ib")), "nb")
      val cc = graft.operators.Curation.connectedComponentsStars(
        e.select($"ia".as("a"), $"ib".as("b")))
      cc.join(ids.select($"id", $"name"), "id")
        .join(ids.select($"id".as("comp"), $"name".as("canonical")), "comp")
        .select($"name", $"canonical")
    },

    // ---- q65: per-user event-gap sequence features via lag(): count,
    // exact total and max inter-event gap. Gaps are µs-truncated per
    // timestamp (DuckDB timestamps are µs; truncating BEFORE the diff
    // makes tie order among equal-µs rows irrelevant — a sorted
    // sequence's consecutive diffs depend only on the value multiset).
    // One shuffle on user_id serves both the window and the agg.
    "q65_event_gaps" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tsu".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", expr("ts DIV 1000").as("tsu"), $"event_id")
        .select($"user_id", ($"tsu" - lag($"tsu", 1).over(w)).as("gap"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"gap").as("sum_gap_us"),
          max($"gap").as("max_gap_us"))
    },

    // ---- q66: CUBE over (returnflag, linestatus): all 2^2 grouping
    // sets in one pass (Spark expands to a single shuffle with a
    // grouping-id column — not 4 scans).
    "q66_cube_qty" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(graft.operators.Curation.floorRound(sum($"l_quantity".cast("decimal(38,6)")).cast("double"), 4)
            .as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"sum_qty", $"n")
    },

    // ---- q126: covariance matrix of the embedding corpus — the PCA /
    // whitening statistics pass. ONE typed aggregation with a d(d+1)/2
    // scaled-long buffer (map-side combine → P buffers cross the wire,
    // corpus-size-independent); the d² cell fan-out happens after the
    // aggregate. Power iteration over the result is driver-side
    // metadata work (DecompositionSpec).
    "q126_embedding_covariance" -> { (s, d) =>
      import s.implicits._
      Decomposition.covariance(Tables.embeddings(s, d), $"embedding", Dim)
        // + 0.0 canonicalizes IEEE -0.0 to +0.0 (oracle-dialect rule 8):
        // DuckDB's round() emits -0.0 for tiny negative covariances.
        .select($"i", $"j", (graft.operators.Curation.floorRound($"cov", 6) + lit(0.0)).as("cov"))
    },

    // ---- q127: Johnson-Lindenstrauss sign projection (64 → 16 dims)
    // of every embedding — the shrink-before-LSH step. The ±1 matrix
    // derives from md5 on both engines; terms accumulate as scaled
    // longs so the (id, k) aggregate is order-exact.
    "q127_jl_projection" -> { (s, d) =>
      import s.implicits._
      Decomposition.signProject(
        Tables.embeddings(s, d), $"vec_id", $"embedding", outDim = 16)
    },

    // ---- q130: diagonal-Mahalanobis embedding outlier scores — the
    // corrupt-vector screen before ANN indexing. One d-row moment
    // aggregate (map-side combined, broadcast back); the per-vector
    // sum is the only data-sized exchange.
    "q130_embedding_outliers" -> { (s, d) =>
      import s.implicits._
      Decomposition.diagMahalanobis(
        Tables.embeddings(s, d), $"vec_id", $"embedding")
    },

    // ---- q148: in-context (semantic) pack order — docs ordered so
    // semantically-related documents are ADJACENT within training
    // shards (Shi et al. 2024, "In-Context Pretraining"): priority =
    // k-means cell, seeded-pseudo-random within a cell, positions via
    // the two-phase rank. The context-window locality knob.
    "q148_semantic_pack_order" -> { (s, d) =>
      import s.implicits._
      val cells = Clustering.kmeansAssign(Tables.embeddings(s, d),
          k = 8, updates = 1)
        .select($"vec_id".as("doc_id"), $"cell")
      graft.operators.EpochShuffle.orderWithPriority(cells,
        $"doc_id", $"cell", seed = "icp42", shards = 4)
    },

    // ---- q139: KMV-sketch cross-source n-gram overlap — union /
    // intersection estimates from per-source k-min hash sketches
    // (mergeable; the continuous feed-overlap audit), hash-checked
    // against the exact intersection in the same result. Completes
    // the sketch family: HLL q43 distincts, KMV q63 per-group counts,
    // CMS q96 frequencies, MG q68 heavy hitters — q139 = set ALGEBRA.
    "q139_kmv_overlap" -> { (s, d) =>
      import s.implicits._
      graft.operators.KmvOverlap.sourceOverlap(
        Tables.documents(s, d), $"source", $"text", n = 3, k = 128)
    }
  )

  /** Shared k-means CTE chain ending in a2(vec_id, v, cell) — mirrors
    * [[Clustering.kmeansAssign]] with k=8, updates=1, seed "km42".
    */
  private[queries] def kmeansCte: String = {
    def assignFrom(src: String) =
      s"""SELECT vec_id, v, ci AS cell FROM (
         |  SELECT e.vec_id, e.v, s.ci,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_aggregate(list_transform(range(1, ${Dim + 1}),
         |        k -> (e.v[k]-s.c[k])*(e.v[k]-s.c[k])), 'sum') ASC, s.ci ASC) AS r
         |  FROM e CROSS JOIN $src s) t WHERE r = 1""".stripMargin
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |samp AS (SELECT vec_id, v,
       |    row_number() OVER (ORDER BY md5('km42' || vec_id::VARCHAR), vec_id) AS rn
       |  FROM e),
       |init AS (SELECT rn - 1 AS ci, v AS c FROM samp WHERE rn <= 8),
       |a1 AS (${assignFrom("init")}),
       |upd AS (SELECT cell AS ci, list(m ORDER BY i) AS c FROM (
       |    SELECT cell, i,
       |      CAST(sum(CAST(floor((v[i]) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS m
       |    FROM a1 CROSS JOIN range(1, ${Dim + 1}) AS t(i) GROUP BY cell, i) u
       |  GROUP BY cell),
       |a2 AS (${assignFrom("upd")})""".stripMargin
  }

  /** q120 oracle: the 8 greedy rounds unrolled as chained CTEs. Round r:
    * p_r = argmax of the running min-dist (excluding chosen ids — by id,
    * never by md = 0, matching the engine), c_r = its vector, d_r =
    * incremental `least` update — the same op order as
    * [[Clustering.kcenterGreedy]], so every double is bit-identical.
    */
  private val kcenterOracle: String = {
    val k = 8
    val sb = new StringBuilder
    sb.append(
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
        |d1 AS (SELECT e.vec_id, e.v,
        |    floor((1 - (floor((list_cosine_similarity(e.v, c1.v)) * 1000000.0 + 0.5) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS md
        |  FROM e CROSS JOIN c1),
        |""".stripMargin)
    for (r <- 2 to k) {
      val prevD = s"d${r - 1}"
      val excl = (1 until r).map(j => s"SELECT vec_id FROM c$j")
        .mkString(" UNION ALL ")
      sb.append(
        s"""p$r AS (SELECT vec_id, md FROM $prevD
           |  WHERE vec_id NOT IN ($excl)
           |  ORDER BY md DESC, vec_id ASC LIMIT 1),
           |c$r AS (SELECT e.vec_id, e.v FROM e JOIN p$r USING (vec_id)),
           |""".stripMargin)
      if (r < k) sb.append(
        s"""d$r AS (SELECT d.vec_id, d.v, least(d.md,
           |    floor((1 - (floor((list_cosine_similarity(d.v, c$r.v)) * 1000000.0 + 0.5) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0) AS md
           |  FROM $prevD d CROSS JOIN c$r),
           |""".stripMargin)
    }
    val rows = (2 to k)
      .map(r => s"UNION ALL SELECT $r AS r, vec_id, md AS sel_dist FROM p$r")
      .mkString("\n")
    sb.append(
      s"""sel AS (
         |SELECT 1 AS r, vec_id, CAST(2.0 AS DOUBLE) AS sel_dist FROM c1
         |$rows)
         |SELECT CAST(r AS INT) AS r, vec_id, sel_dist FROM sel""".stripMargin)
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(
    "q120_kcenter_coreset" -> kcenterOracle,

    // Window of 3 in rank order = each key against its 1st and 2nd
    // successors; the rank join replays as b.rk in (a.rk+1, a.rk+2).
    "q125_sorted_neighborhood" ->
      """WITH k AS (SELECT DISTINCT c_name AS k FROM customer),
        |r AS (SELECT k, row_number() OVER (ORDER BY k) AS rk FROM k),
        |p AS (SELECT a.k AS a, b.k AS b FROM r a JOIN r b
        |      ON b.rk > a.rk AND b.rk <= a.rk + 2)
        |SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS dist
        |FROM p WHERE levenshtein(a, b) <= 2""".stripMargin,

    "q61_kmeans" ->
      s"WITH $kmeansCte\nSELECT vec_id, cell FROM a2",

    "q62_semantic_dedup" ->
      s"""WITH $kmeansCte
         |SELECT a.cell, a.vec_id AS va, b.vec_id AS vb,
         |  floor((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 AS sim
         |FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE floor((list_cosine_similarity(a.v, b.v)) * 1000000.0 + 0.5) / 1000000.0 >= 0.4""".stripMargin,

    "q63_kmv_sketch" ->
      s"""WITH u0 AS (SELECT lang, doc_id,
         |    ('0x' || substr(md5(text), 1, 8))::UBIGINT / 4294967296.0 AS u
         |  FROM documents),
         |u AS (SELECT lang, u, min(doc_id) AS doc_id
         |  FROM u0 GROUP BY lang, u),
         |r AS (SELECT lang, u,
         |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
         |  FROM u)
         |SELECT lang, count(*) AS k, floor((max(u)) * 1000000000000.0 + 0.5) / 1000000000000.0 AS kth,
         |  floor(((count(*) - 1) / max(u)) * 10000.0 + 0.5) / 10000.0 AS est
         |FROM r WHERE rn <= $KmvK GROUP BY lang""".stripMargin,

    // Same 4 row-salted md5 hashes ('cms<j>:' prefix), same 1024-wide
    // counters, same min-of-rows estimate.
    "q96_count_min" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        |  FROM documents),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |sk AS (
        |  SELECT j,
        |    ('0x' || substr(md5('cms' || j || ':' || tok), 1, 8))::UBIGINT
        |      % 1024 AS bucket,
        |    count(*) AS c
        |  FROM toks CROSS JOIN js GROUP BY 1, 2),
        |truth AS (
        |  SELECT tok, count(*) AS n_true FROM toks GROUP BY tok
        |  HAVING count(*) >= 50),
        |probe AS (
        |  SELECT t.tok, js.j,
        |    ('0x' || substr(md5('cms' || js.j || ':' || t.tok), 1, 8))::UBIGINT
        |      % 1024 AS bucket
        |  FROM truth t CROSS JOIN js)
        |SELECT t.tok, CAST(t.n_true AS BIGINT) AS n_true,
        |  CAST(min(coalesce(sk.c, 0)) AS BIGINT) AS n_est
        |FROM truth t JOIN probe p ON t.tok = p.tok
        |LEFT JOIN sk ON p.j = sk.j AND p.bucket = sk.bucket
        |GROUP BY t.tok, t.n_true""".stripMargin,

    "q64_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS na, b.name AS nb,
        |  levenshtein(a.name, b.name) AS dist
        |FROM n a JOIN n b
        |  ON a.name < b.name AND abs(length(a.name) - length(b.name)) <= 2
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin,

    // Recursive closure over the q64 linkage pairs (the q47 oracle's
    // reach pattern) — canonical = name of least reachable id.
    "q92_entity_clusters" ->
      """WITH RECURSIVE n AS (
        |  SELECT p_name AS name, min(p_partkey) AS id FROM part GROUP BY 1),
        |pairs AS (
        |  SELECT a.id AS ia, b.id AS ib
        |  FROM n a JOIN n b
        |    ON a.name < b.name AND abs(length(a.name) - length(b.name)) <= 2
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |edges AS (SELECT ia AS a, ib AS b FROM pairs
        |          UNION SELECT ib, ia FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |    WHERE e.b <> r.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS comp
        |         FROM reach GROUP BY a)
        |SELECT na.name AS name, nc.name AS canonical
        |FROM comp JOIN n na ON comp.id = na.id
        |          JOIN n nc ON comp.comp = nc.id""".stripMargin,

    "q65_event_gaps" ->
      """WITH g AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(gap) AS BIGINT) AS sum_gap_us,
        |  max(gap) AS max_gap_us
        |FROM g GROUP BY user_id""".stripMargin,

    "q66_cube_qty" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  floor((CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    // Scaled-long replay of the covariance sufficient statistics: the
    // floor(x*1e9 + 0.5) longs sum exactly, so the double epilogue is
    // bit-identical to the Spark aggregator's fixed op order.
    "q126_embedding_covariance" ->
      """WITH x AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |         unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings),
        |n AS (SELECT count(*) AS n FROM embeddings),
        |s1 AS (
        |  SELECT i, sum(CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS s
        |  FROM x GROUP BY i),
        |p AS (
        |  SELECT a.i AS i, b.i AS j,
        |    sum(CAST(floor(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) * 1e9 + 0.5)
        |        AS BIGINT)) AS p
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
        |  floor((p.p / 1e9 / n.n - (si.s / 1e9 / n.n) * (sj.s / 1e9 / n.n)) * 1000000.0 + 0.5) / 1000000.0
        |    + 0.0 AS cov
        |FROM p, n
        |JOIN s1 si ON si.i = p.i
        |JOIN s1 sj ON sj.i = p.j""".stripMargin,

    "q127_jl_projection" ->
      """WITH m AS (
        |  SELECT j0, k,
        |    CASE WHEN ('0x' || substr(md5('jl42:' || (j0 + 1)::VARCHAR
        |        || ':' || k::VARCHAR), 1, 8))::BIGINT % 2 = 0
        |      THEN 1.0 ELSE -1.0 END AS sign
        |  FROM (SELECT unnest(range(0, 64)) AS j0) js,
        |       (SELECT unnest(range(1, 17)) AS k) ks),
        |x AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |         unnest(range(0, len(embedding))) AS j0
        |  FROM embeddings)
        |SELECT x.vec_id AS id, CAST(m.k AS INT) AS k,
        |  floor(sum(CAST(floor(CAST(x.v AS DOUBLE) * m.sign * 1e9 + 0.5)
        |      AS BIGINT)) / 1e9 / sqrt(16.0) * 1000000.0 + 0.5)
        |    / 1000000.0 AS proj
        |FROM x JOIN m ON x.j0 = m.j0
        |GROUP BY 1, 2""".stripMargin,

    // Scaled-long moment replay; mu/var form in the same double-op
    // order as the Spark side, sqrt is correctly-rounded IEEE on both.
    "q130_embedding_outliers" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         unnest(range(0, len(embedding))) AS j0
        |  FROM embeddings),
        |st AS (
        |  SELECT j0,
        |    sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS s,
        |    sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS p,
        |    count(*) AS n
        |  FROM x GROUP BY j0),
        |st2 AS (
        |  SELECT j0, s / 1e9 / n AS mu,
        |         p / 1e9 / n - (s / 1e9 / n) * (s / 1e9 / n) AS v
        |  FROM st),
        |term AS (
        |  SELECT x.vec_id,
        |    floor((CASE WHEN v <= 0 THEN 0.0
        |      ELSE ((x.x - mu) / sqrt(v)) * ((x.x - mu) / sqrt(v)) END) * 1000000.0 + 0.5) / 1000000.0 AS t
        |  FROM x JOIN st2 USING (j0))
        |SELECT vec_id AS id,
        |  floor((CAST(sum(CAST(t AS DECIMAL(38,6))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS maha2
        |FROM term GROUP BY vec_id""".stripMargin,

    // The shared k-means CTEs supply cells; the rank replays q136's
    // window form ordered by (cell, okey).
    "q148_semantic_pack_order" ->
      s"""WITH $kmeansCte,
         |keyed AS (
         |  SELECT vec_id AS doc_id, cell,
         |    CAST(('0x' || substr(md5('s:icp42:' || vec_id::VARCHAR), 1, 8))
         |      ::UBIGINT % 4 AS INT) AS shard,
         |    md5('o:icp42:' || vec_id::VARCHAR) AS okey
         |  FROM a2)
         |SELECT shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY cell, okey) - 1
         |    AS pos,
         |  doc_id, CAST(cell AS INT) AS priority
         |FROM keyed""".stripMargin,

    // Sketch ranks dedupe (src, u) before the k-min cut (collisions
    // can't double-count); the union estimate is Beyer et al.'s
    // (k-1)/u_k once saturated, the exact merged-set size below that.
    "q139_kmv_overlap" ->
      """WITH toks AS (
        |  SELECT source, regexp_extract_all(lower(text), '[a-z]+') AS w
        |  FROM documents),
        |shd AS (
        |  SELECT DISTINCT source AS src,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM toks WHERE len(w) >= 3),
        |h AS (
        |  SELECT src, u, min(h2) AS h2 FROM (
        |    SELECT src,
        |      ('0x' || substr(md5(s), 1, 8))::UBIGINT / 4294967296.0 AS u,
        |      ('0x' || substr(md5(s), 9, 8))::UBIGINT AS h2
        |    FROM shd) t
        |  GROUP BY src, u),
        |r AS (SELECT src, u,
        |        row_number() OVER (PARTITION BY src ORDER BY u, h2) AS rn
        |      FROM h),
        |sk AS (SELECT src, u FROM r WHERE rn <= 128),
        |srcs AS (SELECT DISTINCT src FROM shd),
        |pairs AS (SELECT a.src AS src_a, b.src AS src_b
        |          FROM srcs a JOIN srcs b ON a.src < b.src),
        |merged AS (
        |  SELECT p.src_a, p.src_b, s.u FROM pairs p
        |  JOIN sk s ON s.src IN (p.src_a, p.src_b)
        |  GROUP BY 1, 2, 3),
        |mr AS (SELECT src_a, src_b, u,
        |         row_number() OVER (PARTITION BY src_a, src_b ORDER BY u) AS rn
        |       FROM merged),
        |uk AS (SELECT src_a, src_b, u FROM mr WHERE rn <= 128),
        |agg AS (SELECT src_a, src_b, count(*) AS ku, max(u) AS ukmax
        |        FROM uk GROUP BY 1, 2),
        |mm AS (SELECT uk.src_a, uk.src_b, count(*) AS m
        |       FROM uk
        |       JOIN sk sa ON sa.src = uk.src_a AND sa.u = uk.u
        |       JOIN sk sb ON sb.src = uk.src_b AND sb.u = uk.u
        |       GROUP BY 1, 2),
        |ex AS (SELECT x.src AS src_a, y.src AS src_b, count(*) AS exact_inter
        |       FROM shd x JOIN shd y ON x.s = y.s AND x.src < y.src
        |       GROUP BY 1, 2)
        |SELECT a.src_a, a.src_b,
        |  CAST(coalesce(mm.m, 0) AS BIGINT) AS m,
        |  CAST(a.ku AS BIGINT) AS ku,
        |  CASE WHEN a.ku >= 128 THEN floor((127.0 / a.ukmax) * 100.0 + 0.5) / 100.0
        |       ELSE CAST(a.ku AS DOUBLE) END AS union_est,
        |  floor((coalesce(mm.m, 0) / a.ku *
        |    (CASE WHEN a.ku >= 128
        |          THEN floor((127.0 / a.ukmax) * 100.0 + 0.5) / 100.0
        |          ELSE CAST(a.ku AS DOUBLE) END)) * 100.0 + 0.5) / 100.0 AS inter_est,
        |  CAST(coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_inter
        |FROM agg a
        |LEFT JOIN mm USING (src_a, src_b)
        |LEFT JOIN ex USING (src_a, src_b)""".stripMargin
  )
}
