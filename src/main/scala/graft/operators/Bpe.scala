package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and application, distributed
  * (Sennrich et al. 2016, word-token symbols): each round counts
  * adjacent symbol pairs corpus-wide, adopts the most frequent pair as
  * a merge, and rewrites every document's symbol stream greedily
  * left-to-right. The round structure is the same iterative shape as
  * k-means: per round ONE map-side-combined pair aggregation (only
  * (pair, count) rows shuffle — counts collapse to the pair vocabulary
  * pre-exchange), ONE 1-row argmax pull to the driver, and ONE narrow
  * rewrite map over the cached corpus — a codegen'd single-pass
  * kernel ([[graft.functions.BpeMergeOne]]; the Catalyst HOF fold it
  * replaced allocated a sequence+filter+transform chain per document
  * per round and its compounded codegen paid tens of seconds of JIT on
  * first execution). The corpus
  * is re-persisted each round so round r never replays rounds 1..r-1
  * (at cluster scale: checkpoint every few rounds instead).
  *
  * Merged symbols are space-joined token runs; original tokens are
  * `[a-z]+` so a merged symbol can never collide with a base token.
  *
  * Determinism: integer pair counts; argmax ties break lexicographically
  * on (left, right); the greedy left-to-right rewrite advances two
  * positions at a match (matches never overlap; `l == r` runs merge
  * pairwise from the left) — replayable exactly in DuckDB
  * (`list_reduce` over singleton lists, seeding the accumulator with
  * the first symbol).
  */
object Bpe {

  /** Greedy single-pair merge: one native kernel pass. */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.functions.BpeMergeOne(ColumnBridge.expression(syms), l, r))
  }

  /** Adjacent symbol pairs of one document, as (l, r) structs. */
  private def pairsOf(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"),
          element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** Train `rounds` merges over the corpus; returns them in adoption
    * order: (r 1.., lhs, rhs, freq — the corpus-wide pair count at
    * adoption time). Stops early if no pair occurs twice.
    */
  def trainMerges(docs: DataFrame, id: Column, text: Column,
      rounds: Int, aggPartitions: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds > 0, s"rounds must be positive, got $rounds")

    // Iterative-loop latency discipline (measured, round 10; see
    // IterLoop): the per-round pair table is VOCAB-bounded (931
    // distinct pairs on the sf0.1 corpus; vocab² worst case at any
    // scale), so the reduce side of the count is a few KB no matter
    // how big the corpus is, while map-side partial agg still
    // collapses counts to the pair vocabulary before the exchange.
    // `aggPartitions` sizes the reduce side: the default suits pair
    // vocabularies up to ~10 M; a web-scale early-round vocabulary
    // wants ~vocab²·16B/64MiB partitions.
    IterLoop.tinyReduce(spark, aggPartitions) {
      trainMergesLoop(docs, id, text, rounds)
    }
  }

  private def trainMergesLoop(docs: DataFrame, id: Column, text: Column,
      rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    var corpus = docs
      .select(id.cast("long").as("doc_id"),
        TextAnalysis.wordTokens(text).as("syms"))
      .filter(size(col("syms")) >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The parent round's cache is dropped only AFTER the child's first
    // action (the argmax below) has materialized the child — so each
    // round costs exactly ONE corpus pass, with no extra count() pass.
    var parent: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = corpus
        .select(explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2) // a singleton pair is not a vocab merge
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(1)
        .as[(String, String, Long)].collect()
      if (parent != null) { parent.unpersist(); parent = null }
      if (best.isEmpty) done = true
      else {
        val (l, rr, cnt) = best(0)
        merges += ((r, l, rr, cnt))
        parent = corpus
        corpus = corpus.withColumn("syms", applyMerge(col("syms"), l, rr))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r += 1
      }
    }
    if (parent != null) parent.unpersist()
    corpus.unpersist()
    spark.createDataFrame(merges.toSeq).toDF("r", "lhs", "rhs", "freq")
      .select(col("r").cast("int").as("r"), col("lhs"), col("rhs"),
        col("freq"))
  }

  /** Apply an ordered merge list to the corpus (the serving pass:
    * train once, encode everywhere); per-doc compression report
    * (doc_id, n_base, n_bpe, ratio). ONE narrow Project, no shuffle at
    * any scale: the whole merge list rides a single fused kernel call
    * ([[graft.functions.BpeEncodeLen]] — one reusable buffer per
    * document, merge layers applied in place). The per-merge Project
    * chain this replaced was correct but compounded: ~7 array HOF
    * expressions per layer meant 10 layers of codegen whose first
    * execution JIT'd for tens of seconds, and every layer materialized
    * an intermediate symbol array per document.
    */
  def encodeStats(docs: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val base = docs.select(id.cast("long").as("doc_id"),
      TextAnalysis.wordTokens(text).as("syms"))
    base.select(col("doc_id"), size(col("syms")).cast("long").as("n_base"),
        ColumnBridge.column(graft.functions.BpeEncodeLen(
          ColumnBridge.expression(col("syms")), merges))
          .cast("long").as("n_bpe"))
      .withColumn("ratio",
        when(col("n_base") > 0,
          Curation.floorRound6(col("n_bpe").cast("double") / col("n_base")))
          .otherwise(lit(1.0)))
  }
}
