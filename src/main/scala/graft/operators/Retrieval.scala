package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lexical ranking (BM25) over the positional index, and hybrid
  * rank fusion (RRF) combining lexical and vector retrieval.
  *
  * Scale design (100 TB):
  *  - BM25 work is Σ|posting list| of the QUERY's terms, never
  *    corpus-sized: the postings relation is filtered to the query
  *    terms before any shuffle (at rest the index would be
  *    term-bucketed, so the filter prunes partitions — same layout
  *    story as the at-rest ANN family, q85-q87). Document lengths are
  *    a narrow per-doc scan; the corpus-wide (N, Σdl) statistic is a
  *    1-row broadcast. Per-term document frequencies are at most
  *    |query| rows — broadcast-joined back to the tf relation.
  *  - RRF fusion joins two ranked lists on the item id — both lists
  *    are top-k-bounded (≪ corpus), so the fuse stage is trivially
  *    broadcastable regardless of corpus size.
  *
  * Determinism (oracle bit-reproducibility, see COVERAGE.md rulebook):
  * the idf is the LOG-FREE odds form (N − df + 0.5)/(df + 0.5) — a
  * single IEEE division of exact-in-binary operands — because ln()
  * differs across libm implementations (same reasoning as q89's
  * log-free bigram likelihood). The tf normalization
  * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) is evaluated in the same
  * operation order on both engines; per-term contributions are rounded
  * to 6 decimals and summed as DECIMAL(28,6) so the per-document score
  * is order-independent. RRF contributions 1/(K + rank) are divisions
  * of exact integers, summed in a fixed two-operand expression.
  *
  * Reference analog: gazette's word-count / n-gram consumer exposes
  * point and prefix lookups over indexed token counts
  * (examples/word-count/counter.go); BM25 is the ranking layer a
  * retrieval user builds over exactly that index surface.
  */
object Retrieval {

  /** BM25 scores for every document matching at least one query term:
    * (doc_id, n_terms_hit, score). `score` is the decimal-summed,
    * 6-decimal-rounded per-term contribution sum (see scaladoc above);
    * `n_terms_hit` the number of distinct query terms present.
    *
    * Plan shape: postings filter (term IN query) → per-(doc,term)
    * count [one exchange on doc_id,term] → df broadcast join (≤|query|
    * rows) → doc-length join on doc_id → 1-row stats broadcast →
    * per-doc sum [one exchange on doc_id].
    */
  def bm25(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val toks = docs.select(id.cast("long").as("doc_id"),
      TextAnalysis.wordTokens(text).as("w"))
    // Narrow per-doc length scan; (N, Σdl) reduces to one broadcast row.
    val doclen = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val stats = doclen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // Term frequencies: only the query terms' postings ever shuffle.
    val tf = toks.select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isin(terms.distinct: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    // Same operation order as the oracle SQL — see object scaladoc.
    val idf = (col("n_docs") - col("dfc") + lit(0.5)) / (col("dfc") + lit(0.5))
    val tfn = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(df), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(idf * tfn, 6).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("contrib").cast("decimal(28,6)")).cast("double").as("score"))
  }

  /** Top-k BM25 with a rank column (score DESC, doc_id ASC —
    * deterministic under rounded-score ties). The global top-k is the
    * mergeable [[graft.functions.TopKAgg]] heap (k rows per partition
    * reach the final combine — no global sort, no single-partition
    * window over the scored table, which at 100 TB holds every doc
    * hitting any query term); the k winners then broadcast-join back
    * to recover the per-doc columns.
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               terms: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Consumed twice (heap + join-back) and Spark has no cross-branch
    // plan reuse: persist the posting-list-bounded scored table.
    val scored = bm25(docs, id, text, terms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tk = graft.functions.TopKAgg.topK(k)
    val top = scored.agg(tk(col("score"), col("doc_id")).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.id").as("doc_id"), (col("pos") + 1).cast("int").as("rank"))
    scored.join(broadcast(top), "doc_id")
      .select(col("doc_id"), col("n_terms_hit"), col("score"), col("rank"))
  }

  /** Materialize the BM25 index at rest, term-bucketed: postings with
    * pre-aggregated term frequencies partitioned by `tb = crc32(term)
    * mod buckets` (so a query's term filter prunes to its terms'
    * partitions), per-term document frequencies (same bucketing), the
    * per-doc length table, and the 1-row corpus stats. Same layout
    * story as the at-rest ANN family (q85-q87): index once, then every
    * probe reads only the partitions its terms hash to.
    */
  def indexAtRest(docs: DataFrame, id: Column, text: Column, path: String,
                  buckets: Int = 64): Unit = {
    val toks = docs.select(id.cast("long").as("doc_id"),
      TextAnalysis.wordTokens(text).as("w"))
    val doclen = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    doclen.write.mode("overwrite").parquet(s"$path/doclen")
    doclen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats")
    // tf is consumed twice (postings write + df derivation) and the
    // tokenize->explode->groupBy pipeline is the dominant index-build
    // cost — persist so it runs once (no cross-action plan reuse).
    val tf = toks.select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(crc32(col("term")), lit(buckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      tf.write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
      tf.groupBy(col("term")).agg(count(lit(1)).as("dfc"))
        .withColumn("tb", pmod(crc32(col("term")), lit(buckets)))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/df")
    } finally tf.unpersist()
  }

  /** BM25 top-k per query against the at-rest index. `queries` carries
    * (query_id, terms array<string>); the batch's distinct terms are a
    * bounded driver-side pull (exactly the IVF probed-cell pattern) so
    * the postings read plans `tb IN (...)` partition pruning plus the
    * term row filter — work per batch is Σ|posting list| of the
    * batch's terms, independent of corpus size.
    */
  def bm25ProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, buckets: Int = 64,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Dedup per-query terms: batch bm25 applies terms.distinct, and a
    // duplicated term must not double its contribution rows here.
    val q = queries.select(col("query_id"), explode(col("terms")).as("term"))
      .distinct()
    val terms = q.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (terms.isEmpty)
      // typed empty frame: callers select/write these columns
      return spark.range(0).select(
        col("id").as("query_id"), lit(0L).as("doc_id"),
        lit(0L).as("n_terms_hit"), lit(0.0).as("score"), lit(0).as("rank"))
    val crc = new java.util.zip.CRC32
    val tbs = terms.map { t =>
      crc.reset(); crc.update(t.getBytes("UTF-8"))
      (crc.getValue % buckets).toInt
    }.distinct
    val prune = (df: DataFrame) =>
      df.filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
    val tf = prune(spark.read.parquet(s"$path/postings"))
    val dfc = prune(spark.read.parquet(s"$path/df")).drop("tb")
    val doclen = spark.read.parquet(s"$path/doclen")
    val stats = spark.read.parquet(s"$path/stats")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("dfc") + lit(0.5)) / (col("dfc") + lit(0.5))
    val tfn = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(dfc), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), round(idf * tfn, 6).as("contrib"))
      .join(q, "term") // restrict each query to ITS terms
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("contrib").cast("decimal(28,6)")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Serve a QUERY stream against the at-rest BM25 index: each
    * micro-batch of (query_id, terms) probes [[bm25ProbeIndex]] — the
    * probed term-bucket set is data-dependent, so partition pruning is
    * planned batch by batch via foreachBatch — and appends per-query
    * top-k rows to `outPath`. At-least-once per batch, identical rows
    * on replay (same caveat and remedy as the IVF serving tier).
    */
  def bm25StreamingServe(queryStream: DataFrame, path: String,
      outPath: String, checkpoint: String, k: Int,
      buckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          bm25ProbeIndex(batch.sparkSession, path, batch, k, buckets)
            .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Reciprocal-rank fusion of two ranked lists. Inputs carry
    * (id, rank); output is (id, rank_a, rank_b, rrf, rank) for the
    * fused top-k, rrf = 1/(K+rank_a) + 1/(K+rank_b) with absent ranks
    * contributing 0. Both inputs are top-k-bounded, so the outer join
    * is broadcast-scale by construction.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              kRrf: Int = 60): DataFrame = {
    val left = a.select(col(idCol).as("id"), col("rank").as("rank_a"))
    val right = b.select(col(idCol).as("id"), col("rank").as("rank_b"))
    val contrib = (r: Column) =>
      coalesce(lit(1.0) / (lit(kRrf) + r), lit(0.0))
    val w = Window.orderBy(col("rrf").desc, col("id").asc)
    left.join(right, Seq("id"), "full_outer")
      .select(col("id"), col("rank_a"), col("rank_b"),
        round(contrib(col("rank_a")) + contrib(col("rank_b")), 6).as("rrf"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
