package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: find training
  * documents sharing word n-grams with a held-out evaluation set — the
  * standard n-gram-overlap contamination check (GPT-3 appendix C /
  * PaLM-style 8-gram scans, here parameterized).
  *
  * Scale design (100 TB): the eval set is tiny relative to the corpus,
  * so its exploded (shingle → eval_doc) table broadcast-joins against
  * the training side's exploded shingles — the training corpus is
  * scanned once, never shuffled on shingle. Shingles are 64-bit hashes
  * (Dedup.docShingles), so the broadcast table is fixed-width longs.
  */
object Contamination {

  /** Per-training-doc contamination report against `evalPred`-selected
    * docs: (doc_id, n_shared_shingles, n_eval_docs) for every training
    * doc sharing at least one n-gram with any eval doc.
    *
    * `docs` must be (doc_id, sh) from [[Dedup.docShingles]]; rows where
    * `evalPred(doc_id)` holds form the eval set and are excluded from
    * the report.
    */
  def ngramOverlap(docs: DataFrame, evalPred: Column => Column): DataFrame = {
    // NULL-proof split: a predicate evaluating NULL would fail BOTH
    // filters, silently excluding the doc from the eval set AND the
    // training report — a decontamination gap. NULL counts as "not
    // eval", keeping every doc on exactly one side.
    val isEval = coalesce(evalPred(col("doc_id")), lit(false))
    // Both filter branches read `docs` — typically docShingles' fused
    // tokenize+shingle+hash pipeline — and Spark has no cross-branch
    // plan reuse: unpersisted, the dominant tokenize cost runs TWICE.
    // This cache is CORPUS-sized (every doc's shingle array), too big
    // to leave pinned for a harness cache clear: materialize the
    // report-sized result and release it HERE (the bm25ProbeIndex
    // pattern — a bare lazy return would make the cache unreleasable,
    // unpersist on a derived frame being a sameResult no-op). The
    // RETURNED frame is cached; callers done with it unpersist().
    val cached = docs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalSh = cached.filter(isEval)
      .select(col("doc_id").as("eval_doc"), explode(col("sh")).as("h"))
      .distinct()
    val trainSh = cached.filter(!isEval)
      .select(col("doc_id"), explode(col("sh")).as("h"))
    val out = trainSh.join(broadcast(evalSh), "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared_shingles"),
        countDistinct(col("eval_doc")).as("n_eval_docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cached.unpersist()
    out
  }
}
