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

    // ---- q153: deletion-impact audit — takedown / right-to-be-
    // forgotten planning: for a deletion set (doc_id % 53 = 0), the
    // fraction of each derived training artifact (pack sequences,
    // epoch-order suffixes, IVF cells) that must rebuild. Joins against
    // the small deletion set + count aggregates; only the dozen scalar
    // counts reach the driver.
    "q153_deletion_impact" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      graft.operators.Takedown.impactAudit(
        docs, Tables.embeddings(s, d),
        docs.filter($"doc_id" % 53 === 0).select($"doc_id"))
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
         |      floor((list_cosine_similarity(p.pv, c.v)) * 1000000.0 + 0.5) / 1000000.0 AS sim, c.v,
         |      row_number() OVER (PARTITION BY p.probe_id
         |        ORDER BY floor((list_cosine_similarity(p.pv, c.v)) * 1000000.0 + 0.5) / 1000000.0 DESC,
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

    // Replays the three artifact derivations with their own gate
    // queries' CTEs (q54 packing, q136 epoch keys, the shared k-means
    // cells) against the same deletion set; rebuild fractions use the
    // floor-scaled form (rule 9).
    "q153_deletion_impact" ->
      s"""WITH ${ClusterOps.kmeansCte},
        |del AS (SELECT doc_id FROM documents WHERE doc_id % 53 = 0),
        |t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(regexp_extract_all(text, '[^ \\t\\n\\x0b\\f\\r]+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS end_tok
        |  FROM t),
        |packs AS (
        |  SELECT doc_id, shard,
        |    CAST((end_tok - n_tokens) // 512 AS BIGINT) AS seq_first,
        |    CAST(CASE WHEN n_tokens = 0 THEN (end_tok - n_tokens) // 512
        |         ELSE (end_tok - 1) // 512 END AS BIGINT) AS seq_last
        |  FROM c),
        |pseq AS (SELECT DISTINCT shard, seq FROM (
        |  SELECT shard, unnest(range(seq_first, seq_last + 1)) AS seq
        |  FROM packs) z),
        |pdel AS (SELECT DISTINCT shard, seq FROM (
        |  SELECT p.shard, unnest(range(p.seq_first, p.seq_last + 1)) AS seq
        |  FROM packs p JOIN del USING (doc_id)) z),
        |keyed AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('s:ep7:' || doc_id::VARCHAR), 1, 8))
        |      ::UBIGINT % 8 AS INT) AS shard,
        |    md5('o:ep7:' || doc_id::VARCHAR) AS okey
        |  FROM documents),
        |ord AS (
        |  SELECT shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY okey) - 1 AS pos,
        |    doc_id
        |  FROM keyed),
        |mins AS (SELECT shard, min(pos) AS mp FROM ord JOIN del
        |  USING (doc_id) GROUP BY shard),
        |cells AS (SELECT vec_id, cell FROM a2),
        |cdel AS (SELECT cells.cell, cells.vec_id FROM cells
        |  JOIN del ON cells.vec_id = del.doc_id)
        |SELECT * FROM (
        |SELECT 'pack_seq' AS artifact,
        |  CAST((SELECT count(*) FROM pdel) AS BIGINT) AS units_touched,
        |  CAST((SELECT count(*) FROM pseq) AS BIGINT) AS units_total,
        |  CAST((SELECT count(*) FROM packs JOIN del USING (doc_id))
        |    AS BIGINT) AS rows_deleted,
        |  floor(CAST((SELECT count(*) FROM pdel) AS DOUBLE)
        |    / (SELECT count(*) FROM pseq) * 1e6 + 0.5) / 1e6 AS rebuild_frac
        |UNION ALL
        |SELECT 'epoch_suffix',
        |  CAST((SELECT count(*) FROM mins) AS BIGINT),
        |  CAST((SELECT count(DISTINCT shard) FROM ord) AS BIGINT),
        |  CAST((SELECT count(*) FROM ord JOIN del USING (doc_id)) AS BIGINT),
        |  floor(CAST((SELECT count(*) FROM ord o JOIN mins m
        |        ON o.shard = m.shard AND o.pos >= m.mp) AS DOUBLE)
        |    / (SELECT count(*) FROM ord) * 1e6 + 0.5) / 1e6
        |UNION ALL
        |SELECT 'ivf_cell',
        |  CAST((SELECT count(DISTINCT cell) FROM cdel) AS BIGINT),
        |  CAST((SELECT count(DISTINCT cell) FROM cells) AS BIGINT),
        |  CAST((SELECT count(*) FROM cdel) AS BIGINT),
        |  floor(CAST((SELECT count(DISTINCT cell) FROM cdel) AS DOUBLE)
        |    / (SELECT count(DISTINCT cell) FROM cells) * 1e6 + 0.5) / 1e6
        |) u""".stripMargin,

    "q151_context_assembly" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |pool AS (
        |  SELECT probe_id, vec_id, sim, rn FROM (
        |    SELECT p.probe_id, c.vec_id,
        |      floor((list_cosine_similarity(p.pv, c.v)) * 1000000.0 + 0.5) / 1000000.0 AS sim,
        |      row_number() OVER (PARTITION BY p.probe_id
        |        ORDER BY floor((list_cosine_similarity(p.pv, c.v)) * 1000000.0 + 0.5) / 1000000.0 DESC,
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
        |  floor(CAST(sum(w * h) AS DOUBLE)
        |    / (count(*) * max(w) * max(h)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS pad_eff
        |FROM r GROUP BY 1, 2""".stripMargin
  )
}
