package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-mix monitoring over a document STREAM: per micro-batch,
  * compare the batch's source histogram against a fixed REFERENCE mix
  * (the mixture plan's target, or the corpus histogram) and emit one
  * row per batch — the streaming form of the q156 batch-mix audit, for
  * catching a wedged upstream source or a runaway producer while the
  * pipeline runs rather than in the post-mortem.
  *
  * Same integer TVD form as
  * [[graft.operators.EpochShuffle.batchMixAudit]]:
  * `tvd_num = Σ_s |R·c_{b,s} − n_b·R_s|` over the union of batch and
  * reference sources (R = Σ R_s), TVD = tvd_num / (2·R·n_b) — exact
  * integer arithmetic, replayable bit-for-bit.
  *
  * Use via `docs.writeStream.foreachBatch(StreamingMixMonitor.sink(
  * ref, outDir))`; rows (batch_id, n_docs, tvd_num, worst_source,
  * worst_dev) accumulate under `outDir`, one `batch=<id>` partition
  * per micro-batch (overwrite semantics — a retried batch replaces its
  * own partial output, the exactly-once convention shared with
  * [[StreamingDedup]]).
  *
  * Scale shape: ONE map-side-combined per-source count of the batch
  * (|sources| rows), then driver-side integer math against the
  * broadcast-scale reference map. Nothing batch-sized leaves the
  * executors.
  *
  * @param ref (source, weight) reference rows — counts or plan
  *            weights; only ratios matter. Must be small (|sources|).
  */
object StreamingMixMonitor {

  def sink(ref: Map[String, Long], outDir: String)(
      docs: DataFrame, batchId: Long): Unit = {
    require(ref.nonEmpty && ref.values.forall(_ >= 0), "ref: non-negative weights")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(col("source").cast("string").as("source"))
      .filter(col("source").isNotNull)
      .groupBy(col("source")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val nB = counts.values.sum
    val r = ref.values.sum
    if (nB > 0 && r > 0) {
      val all = (counts.keySet ++ ref.keySet).toSeq.sorted
      val devs = all.map { s =>
        s -> (r * counts.getOrElse(s, 0L) - nB * ref.getOrElse(s, 0L))
      }
      val tvd = devs.map { case (_, d) => math.abs(d) }.sum
      // max dev, ties to the SMALLEST source name — the same
      // (dev DESC, source ASC) rule as batchMixAudit's row_number.
      val (worstSrc, worstDev) = devs.minBy { case (s, d) => (-d, s) }
      Seq((batchId, nB, tvd, worstSrc, worstDev))
        .toDF("batch_id", "n_docs", "tvd_num", "worst_source", "worst_dev")
        .write.mode("overwrite")
        .parquet(s"$outDir/batch=$batchId")
    }
  }
}
