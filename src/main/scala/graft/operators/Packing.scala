package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for LLM training pipelines: concatenate documents in
  * a deterministic order and chunk the token stream into fixed-budget
  * training sequences ("concat-and-chunk" — the packing strategy GPT-style
  * pretraining uses; docs straddle sequence boundaries rather than pad).
  *
  * Scale design (100 TB): a single global token stream would force one
  * total-order window — a 1-partition sort. Instead the corpus is sharded
  * by a pure function of the doc id into `shards` independent packing
  * streams (exactly how parallel training-data writers emit shard files),
  * so the cumulative-sum window partitions by shard: `shards` bounded
  * window groups, one hash shuffle, no global sort. Membership and
  * ordering depend only on (doc_id, shards, budget) — re-runs, corpus
  * repartitioning, and speculative retries all produce identical packs.
  */
object Packing {

  /** Assign each document its span in the packed token stream of its
    * shard: returns (doc_id, shard, n_tokens, start_tok, seq_first,
    * seq_last) where seq_* are the first/last training-sequence indices
    * the document's tokens land in (budget tokens per sequence).
    * Zero-token documents occupy no tokens: their seq span collapses to
    * the boundary sequence (seq_first = seq_last = start/budget).
    */
  def packSequences(docs: DataFrame, id: Column, text: Column,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val base = docs.select(id.cast("long").as("doc_id"),
      TextAnalysis.tokenCount(text).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    base.withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_tok"),
        floor(col("start_tok") / budget).as("seq_first"),
        when(col("n_tokens") === 0, floor(col("start_tok") / budget))
          .otherwise(floor((col("end_tok") - 1) / budget)).as("seq_last"))
  }

  /** Per-sequence occupancy of a packed shard stream: how many documents
    * contribute to each training sequence and how many tokens of it are
    * real (the final sequence of a shard may be short). Derived from
    * `packSequences` output with one explode over the per-doc sequence
    * span — spans are short (a doc rarely straddles many sequences), so
    * the explode is ~|docs| rows, not |tokens|.
    */
  def sequenceOccupancy(packed: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    packed.filter(col("n_tokens") > 0)
      .select(col("shard"), col("n_tokens"), col("start_tok"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .withColumn("tok_in_seq",
        least(col("start_tok") + col("n_tokens"), (col("seq_id") + 1) * budget) -
          greatest(col("start_tok"), col("seq_id") * budget))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok_in_seq")).as("n_tokens"))
  }
}
