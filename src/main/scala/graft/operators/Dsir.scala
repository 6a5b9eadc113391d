package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data-selection importance reweighting (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw document by the log-likelihood
  * ratio of a hashed-unigram language model fit on a TARGET slice vs
  * one fit on the full RAW corpus. Documents that look like the
  * target get positive weight; off-distribution documents negative —
  * the standard cheap importance score for mixing/filtering
  * pretraining data toward a quality domain.
  *
  * Scale design: the tokenizer is a narrow per-partition map; both
  * language models are ONE aggregation down to `buckets` rows (map-
  * side partial combine, so the shuffle carries at most
  * buckets·partitions rows regardless of corpus size); the per-bucket
  * LLR table and its 1-row totals are broadcast back; the only
  * data-sized shuffle is the final per-doc sum keyed by doc_id. No
  * driver-side collection anywhere — the K-row model stays a plan-
  * side broadcast.
  *
  * Determinism / oracle parity: the feature hash is the first 8 hex
  * chars of md5(token) mod `buckets` — md5 is native in both Spark
  * (codegen) and DuckDB, so the oracle replays the bucketing exactly.
  * Laplace-smoothed probabilities are formed in IEEE double with a
  * fixed operation order, each token's LLR term is rounded to 1e-6,
  * and the per-doc sum accumulates those rounded terms in
  * decimal(38,6) — order-independent on both engines.
  */
object Dsir {

  /** Per-document DSIR importance weights.
    *
    * @param docs     corpus with `id`/`text` columns
    * @param isTarget predicate marking the target-domain rows (they
    *                 stay in the raw model too, as in the paper where
    *                 raw = the full crawl)
    * @param buckets  hashed feature-space size
    * @return (doc_id, n_toks, dsir_llr) — docs with zero tokens drop
    *         out (no features to score)
    */
  def weights(docs: DataFrame, id: Column, text: Column, isTarget: Column,
              buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    // Narrow CPU-bound tokenize: same fused tokenizer as the dedup
    // family ([a-z]+ over lowercase), one row per token OCCURRENCE —
    // DSIR scores count multiplicity, not distinct tokens.
    val toks = docs
      .select(id.cast("long").as("doc_id"), text.cast("string").as("text"),
        isTarget.cast("boolean").as("is_tgt"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String, Boolean)]
      .flatMap { case (d, t, tgt) =>
        TextAnalysis.tokenize(t).map(w => (d, w, tgt))
      }
      .toDF("doc_id", "w", "is_tgt")
      .select($"doc_id", $"is_tgt",
        (conv(substring(md5($"w".cast("binary")), 1, 8), 16, 10)
          .cast("long") % buckets).as("b"))
      // Consumed twice (model build + scoring join) and Spark has no
      // cross-branch subexpression reuse: persist so the CPU-bound
      // tokenize+md5 pass runs once.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Both hashed-unigram models in one K-row aggregate.
    val byBucket = toks.groupBy($"b").agg(
      count(lit(1)).as("r_b"),
      sum(when($"is_tgt", 1L).otherwise(0L)).as("t_b"))
    val totals = byBucket.agg(sum($"r_b").as("r_tot"), sum($"t_b").as("t_tot"))
    // LLR per bucket: ln(p_target/p_raw) with +1 Laplace smoothing,
    // formed in a fixed double-op order ((t+1)(R+K)) / ((T+K)(r+1))
    // so the oracle reproduces it bit-for-bit; rounded to 1e-6 making
    // the downstream decimal sum exact.
    val k = lit(buckets.toDouble)
    val llr = byBucket.crossJoin(broadcast(totals)).select($"b",
      graft.operators.Curation.floorRound(log(
        (($"t_b".cast("double") + lit(1.0)) * ($"r_tot".cast("double") + k)) /
        (($"t_tot".cast("double") + k) * ($"r_b".cast("double") + lit(1.0)))), 6).as("v"))
    toks.join(broadcast(llr), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"),
        graft.operators.Curation.floorRound(sum($"v".cast("decimal(38,6)")).cast("double"), 6)
          .as("dsir_llr"))
  }
}
