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
  * rewrite map over the cached corpus (the merge pair is a plan
  * literal inside a plan-native `aggregate` fold — no UDF, no row
  * serialization boundary). The corpus
  * is re-persisted each round so round r never replays rounds 1..r-1
  * (at cluster scale: checkpoint every few rounds instead).
  *
  * Merged symbols are space-joined token runs; original tokens are
  * `[a-z]+` so a merged symbol can never collide with a base token.
  *
  * Determinism: integer pair counts; argmax ties break lexicographically
  * on (left, right); the greedy left-to-right rewrite is a fold with
  * exact list semantics — all replayable in DuckDB (`list_reduce` over
  * singleton lists, seeding the accumulator with the first symbol).
  */
object Bpe {

  /** Greedy left-to-right single-pair merge as a fold: append each
    * symbol unless the accumulator ends with `l` and the symbol is `r`
    * — then replace the tail with the merged symbol. O(len²) per doc
    * (each append copies the accumulator), so it is used ONLY for the
    * `l == r` pairs whose overlapping matches need the sequential
    * greedy decision; [[mergeVectorized]] covers the common case.
    */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(s"$l $r"))))
        .otherwise(concat(acc, array(x))))

  /** O(len) merge for `l != r`: matches cannot overlap (overlapping
    * matches at i and i+1 would force syms(i+1) = r = l), so greedy
    * left-to-right keeps EVERY match — position i survives unless it
    * was consumed as the second half of a match at i-1, and every
    * surviving match start rewrites to the merged symbol. Pure
    * position arithmetic over the array, no accumulator copies.
    */
  private def mergeVectorized(syms: Column, l: String, r: String): Column = {
    val n = size(syms)
    def m(i: Column): Column =
      (i < n) && (element_at(syms, i) === l) && (element_at(syms, i + 1) === r)
    // n = 0 guard: Spark's sequence(1, 0) counts DOWN to [1, 0].
    when(n >= 1,
      transform(
        filter(sequence(lit(1), n), i => !((i > 1) && m(i - 1))),
        i => when(m(i), lit(s"$l $r")).otherwise(element_at(syms, i))))
      .otherwise(array().cast("array<string>"))
  }

  /** Greedy single-pair merge, cheapest correct form for the pair. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    if (l == r) mergeFold(syms, l, r) else mergeVectorized(syms, l, r)

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
      rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds > 0, s"rounds must be positive, got $rounds")

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
    * (doc_id, n_base, n_bpe, ratio). The merges compose as `rounds`
    * narrow Projects — no shuffle at any scale. One Project PER merge
    * layer on purpose: each applyMerge references the previous layer
    * as an ATTRIBUTE. Folding all layers into a single nested Column
    * would copy each layer's whole expression at every one of its ~7
    * references — an exponentially-sized tree before the first row is
    * read. (CollapseProject keeps the layers separate: it refuses to
    * inline non-cheap, multiply-referenced expressions.)
    */
  def encodeStats(docs: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val base = docs.select(id.cast("long").as("doc_id"),
        TextAnalysis.wordTokens(text).as("syms"))
      .withColumn("enc", col("syms"))
    val enc = merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn("enc", applyMerge(col("enc"), l, r))
    }
    enc.select(col("doc_id"), size(col("syms")).cast("long").as("n_base"),
        size(col("enc")).cast("long").as("n_bpe"))
      .withColumn("ratio",
        when(col("n_base") > 0,
          Curation.floorRound6(col("n_bpe").cast("double") / col("n_base")))
          .otherwise(lit(1.0)))
  }
}
