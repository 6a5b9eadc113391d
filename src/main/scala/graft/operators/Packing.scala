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

  /** Best-fit-decreasing bin packing within hash shards — the packing
    * SFT/instruction-tuning pipelines use when documents must NOT
    * straddle sequence boundaries (no cross-document attention
    * contamination): whole docs only, each sequence padded from
    * `budget` down to its content. BFD is the classic 11/9·OPT+1
    * approximation, deterministic here: docs sort by (len desc,
    * doc_id) within their shard, and each takes the bin with the
    * LEAST remaining room that still fits (room ties break toward the
    * lowest bin index), else opens a new bin. The tie-break is chosen
    * to be order-free so the DuckDB oracle (q94) can replay the fold
    * exactly with list primitives.
    *
    * Scale shape: the greedy loop is inherently sequential PER SHARD,
    * so shards are the parallelism unit (exactly how parallel shard
    * writers run it); a shard materializes only (doc_id, len) pairs —
    * metadata, not text — so a 100 TB corpus at 10⁴ shards holds ~10⁶
    * doc entries per shard task. One hash shuffle on the shard key.
    *
    * Docs longer than `budget` get a singleton over-budget bin
    * (flagged by `oversize`) — the caller truncates or re-chunks them
    * upstream (e.g. [[packSequences]] for concat-style splitting).
    *
    * Returns (doc_id, shard, n_tokens, bin, bin_fill, oversize) where
    * `bin` is the per-shard bin index in creation order and
    * `bin_fill` the bin's final token count.
    */
  def packBestFit(docs: DataFrame, id: Column, text: Column,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    // Null text packs as a zero-token doc and null ids are dropped:
    // both would otherwise crash the primitive-tuple encoder ("null
    // value in non-nullable field") and kill the whole job, where the
    // rest of the text surface degrades gracefully on nulls.
    val base = docs.select(id.cast("long").as("doc_id"),
      coalesce(TextAnalysis.tokenCount(text), lit(0)).cast("long").as("n_tokens"))
      .filter(col("doc_id").isNotNull)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .as[(Long, Long, Long)]
    base.groupByKey(_._3).flatMapGroups { (shard, rows) =>
      val sorted = rows.map { case (d, n, _) => (d, n) }.toArray
        .sortBy { case (d, n) => (-n, d) }
      // remaining-room index: TreeMap(remaining -> ordered bin ids).
      // Key type is boxed java.lang.Long on purpose: ceilingKey returns
      // null when nothing fits, and a scala.Long-typed key would silently
      // unbox that null to 0L and defeat the new-bin branch.
      val byRoom = new java.util.TreeMap[java.lang.Long, java.util.TreeSet[Integer]]
      val fill = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = Array.newBuilder[(Long, Long, Long, Int, Long, Boolean)]
      def take(room: Long): Int = {
        val s = byRoom.get(room)
        val b = s.pollFirst()
        if (s.isEmpty) byRoom.remove(room)
        b.intValue
      }
      def offer(bin: Int): Unit = {
        val room = budget - fill(bin)
        if (room > 0)
          byRoom.computeIfAbsent(room,
            _ => new java.util.TreeSet[Integer]).add(bin)
      }
      for ((d, n) <- sorted) {
        if (n > budget) { // singleton over-budget bin
          fill += n
          out += ((d, shard, n, fill.length - 1, n, true))
        } else {
          val entry: java.lang.Long = byRoom.ceilingKey(n)
          val bin =
            if (entry == null) { fill += 0L; fill.length - 1 }
            else take(entry.longValue)
          fill(bin) += n
          out += ((d, shard, n, bin, 0L, false))
          offer(bin)
        }
      }
      val fills = fill.toArray
      out.result().map { case (d, sh, n, b, f, ov) =>
        (d, sh, n, b, if (ov) f else fills(b), ov)
      }.iterator
    }.toDF("doc_id", "shard", "n_tokens", "bin", "bin_fill", "oversize")
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
