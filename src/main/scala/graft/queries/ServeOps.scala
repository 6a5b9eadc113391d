package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Multimodal, Retrieval, Similarity}

/** Serving-tier composition queries: what a retrieval/training stack
  * runs BETWEEN the index and the consumer — diversification, context
  * packing, batch shaping.
  */
object ServeOps {

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(

    // ---- q150: maximal-marginal-relevance rerank — the
    // diversification pass after ANN candidate generation (λ·rel −
    // (1−λ)·max-sim-to-selected, greedy). Candidates come from the
    // labeled-exact top-k here; the greedy step is poolSize²-bounded
    // local work per probe (no extra shuffle), so the shape holds when
    // ivfProbeIndex feeds it at corpus scale.
    "q150_mmr_rerank" -> { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      Similarity.mmrRerank(emb, emb.filter($"vec_id" < 5),
        k = 4, poolSize = 8, lambda = 0.7)
    },

    // ---- q151: RAG context assembly under a character budget — per
    // probe, keep the (rel desc, id) prefix of its top-20 candidates
    // whose cumulative document cost fits 4000 chars. Window partitions
    // are top-k bounded by construction; the budget cut is a running
    // sum, not an iterative loop.
    "q151_context_assembly" -> { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val cands = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 5), k = 20)
        .join(Tables.documents(s, d).select($"doc_id", $"n_chars"),
          col("vec_id") === col("doc_id"))
      Retrieval.contextAssembly(cands, col("probe_id"), col("vec_id"),
        col("sim"), col("n_chars"), budget = 4000L)
        .withColumnRenamed("id", "vec_id")
    },

    // ---- q152: aspect-ratio bucketed batching for multimodal training
    // loaders — media quantize to an aspect bucket, take a dense
    // two-phase rank within it (a per-bucket row_number window would
    // sort the corpus under ≤ 9 reducers), and group into batches of
    // 16; output is per-batch shape stats with padding efficiency.
    "q152_aspect_bucketing" -> { (s, d) =>
      Multimodal.aspectBuckets(
        Multimodal.synthesize(Tables.documents(s, d)), batchSize = 16)
        .orderBy(col("ar_q"), col("batch_id"))
    }
  )

  def oracleSql: Map[String, String] = Map(

    // Greedy MMR unrolled to its 4 steps: pool = exact top-8 per probe;
    // each step anti-joins the selected set, scores every remaining
    // candidate against it (max pairwise cosine via the same
    // CAST-to-DOUBLE list kernel as q27), and picks the argmax with
    // (score DESC, sim DESC, vec_id ASC) ties — the same resolution as
    // the operator's (rel desc, vec_id asc)-sorted strict-> scan. All
    // weight arithmetic is forced to DOUBLE so both engines run the
    // identical IEEE chain (DuckDB's bare 0.7 literal is DECIMAL), and
    // pair sims + the emitted score use the divergence-free
    // floor(x*1e6 + 0.5)/1e6 form instead of round() — Spark's
    // shortest-decimal round and DuckDB's exact-binary round disagree
    // on x.xxxxx5-boundary doubles.
    "q150_mmr_rerank" -> {
      def step(t: Int) =
        s"""c$t AS (
           |  SELECT po.probe_id, po.vec_id, po.sim, po.v,
           |    CAST(0.7 AS DOUBLE) * po.sim
           |      - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
           |        * max(floor(list_cosine_similarity(po.v, s.v) * 1e6 + 0.5)
           |              / 1e6) AS score
           |  FROM pool po JOIN sel${t - 1} s ON s.probe_id = po.probe_id
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
           |    WHERE x.probe_id = po.probe_id AND x.vec_id = po.vec_id)
           |  GROUP BY po.probe_id, po.vec_id, po.sim, po.v),
           |p$t AS (
           |  SELECT probe_id, vec_id, sim, v, score, $t AS step FROM (
           |    SELECT c.*, row_number() OVER (PARTITION BY probe_id
           |      ORDER BY score DESC, sim DESC, vec_id ASC) AS rn FROM c$t c) z
           |  WHERE rn = 1),
           |sel$t AS (SELECT probe_id, vec_id, v FROM sel${t - 1}
           |  UNION ALL SELECT probe_id, vec_id, v FROM p$t)""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
         |pool AS (
         |  SELECT probe_id, vec_id, sim, v FROM (
         |    SELECT p.probe_id, c.vec_id,
         |      round(list_cosine_similarity(p.pv, c.v), 6) AS sim, c.v,
         |      row_number() OVER (PARTITION BY p.probe_id
         |        ORDER BY round(list_cosine_similarity(p.pv, c.v), 6) DESC,
         |                 c.vec_id ASC) AS rn
         |    FROM p JOIN e c ON c.vec_id <> p.probe_id) t
         |  WHERE rn <= 8),
         |p1 AS (
         |  SELECT probe_id, vec_id, sim, v,
         |    CAST(0.7 AS DOUBLE) * sim AS score, 1 AS step FROM (
         |    SELECT pool.*, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY sim DESC, vec_id ASC) AS rn FROM pool) z
         |  WHERE rn = 1),
         |sel1 AS (SELECT probe_id, vec_id, v FROM p1),
         |${(2 to 4).map(step).mkString(",\n")}
         |SELECT probe_id, vec_id, CAST(step AS BIGINT) AS mmr_rank,
         |  floor(score * 1e6 + 0.5) / 1e6 AS score
         |FROM (SELECT probe_id, vec_id, score, step FROM p1
         |  UNION ALL SELECT probe_id, vec_id, score, step FROM p2
         |  UNION ALL SELECT probe_id, vec_id, score, step FROM p3
         |  UNION ALL SELECT probe_id, vec_id, score, step FROM p4) u""".stripMargin
    },

    "q151_context_assembly" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |pool AS (
        |  SELECT probe_id, vec_id, sim, rn FROM (
        |    SELECT p.probe_id, c.vec_id,
        |      round(list_cosine_similarity(p.pv, c.v), 6) AS sim,
        |      row_number() OVER (PARTITION BY p.probe_id
        |        ORDER BY round(list_cosine_similarity(p.pv, c.v), 6) DESC,
        |                 c.vec_id ASC) AS rn
        |    FROM p JOIN e c ON c.vec_id <> p.probe_id) t
        |  WHERE rn <= 20),
        |acc AS (
        |  SELECT probe_id, vec_id, rn, d.n_chars AS cost,
        |    sum(d.n_chars) OVER (PARTITION BY probe_id ORDER BY rn
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM pool JOIN documents d ON d.doc_id = pool.vec_id)
        |SELECT probe_id, vec_id, CAST(rn AS BIGINT) AS pos,
        |  CAST(cost AS BIGINT) AS cost, CAST(cum AS BIGINT) AS cum_cost
        |FROM acc WHERE cum <= 4000""".stripMargin,

    "q152_aspect_bucketing" ->
      """WITH m AS (
        |  SELECT doc_id, length(text) % 640 AS w, length(text) % 480 AS h
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, w, h,
        |    CAST(LEAST(CAST(floor(w * 4.0 / h) AS BIGINT), 8) AS INT) AS ar_q
        |  FROM m WHERE w > 0 AND h > 0),
        |r AS (SELECT ar_q, w, h,
        |  row_number() OVER (PARTITION BY ar_q ORDER BY doc_id) - 1 AS pos
        |  FROM k)
        |SELECT ar_q, CAST(pos // 16 AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(w) AS BIGINT) AS max_w, CAST(max(h) AS BIGINT) AS max_h,
        |  round(CAST(sum(w * h) AS DOUBLE)
        |    / (count(*) * max(w) * max(h)), 6) AS pad_eff
        |FROM r GROUP BY 1, 2""".stripMargin
  )
}
