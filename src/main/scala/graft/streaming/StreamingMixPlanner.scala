package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Live mixture planning over a document STREAM — the streaming form
  * of the q149 waterfill: each micro-batch folds its per-source token
  * totals into the running corpus totals, and the refreshed
  * |sources|-row allocation plan is re-solved and published per
  * trigger. Downstream, [[Curation.extendManifest]] consumes the
  * newest plan to admit arriving documents into their headroom, and
  * [[StreamingMixMonitor]] checks the realized mix against it — the
  * observe/plan/act triangle of a continuously-ingesting corpus.
  *
  * Exactly-once: batch totals land under `statsDir/batch=<id>` with
  * overwrite semantics (a retried micro-batch replaces its own
  * partial output — [[StreamingDedup]]'s convention), and each plan
  * derives only from batches ≤ its own id, so a REPLAYED batch
  * recomputes exactly the plan it published the first time even when
  * later batches' outputs already exist on disk.
  *
  * Scale shape: per batch, ONE map-side-combined per-source aggregate
  * of the batch, one |batches·sources|-row stats read (tiny — totals,
  * not documents), and the waterfill's |sources|-row window chain.
  * The corpus itself is never rescanned.
  */
object StreamingMixPlanner {

  /** foreachBatch body. `docs` must carry (source, n_tokens). */
  def sink(statsDir: String, planDir: String, weight: Column => Column,
      budgetPct: Int)(docs: DataFrame, batchId: Long): Unit = {
    val spark = docs.sparkSession
    docs.select(col("source").cast("string").as("source"),
        coalesce(col("n_tokens").cast("long"), lit(0L)).as("n_tokens"))
      .filter(col("source").isNotNull)
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("toks"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
    // Corpus-so-far = batches ≤ this one (a replay must ignore
    // later batches' directories left by the pre-crash run).
    val sofar = spark.read.parquet(statsDir)
      .filter(col("batch") <= batchId)
    Curation.waterfillBudget(sofar, col("source"), col("toks"),
        weight, budgetPct)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$planDir/batch=$batchId")
  }
}
