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
    require(ref.nonEmpty && ref.values.forall(_ >= 0) && ref.values.sum > 0,
      "ref: non-negative weights with a positive sum — an all-zero " +
        "reference would silently emit no rows forever")
    val spark = docs.sparkSession
    import spark.implicits._
    // Reduce the reference by its gcd (corpus-count references can be
    // token-scale huge; only ratios matter) and compute devs in BigInt
    // — r·c products overflow Long silently otherwise, and a wrapped
    // negative TVD is worse than no monitor.
    val g = ref.values.filter(_ > 0)
      .reduce((a, b) => BigInt(a).gcd(BigInt(b)).toLong)
    val refR = ref.map { case (s, w) => s -> w / g }
    val counts = docs
      .select(col("source").cast("string").as("source"))
      .filter(col("source").isNotNull)
      .groupBy(col("source")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val nB = counts.values.sum
    val r = refR.values.sum
    if (nB > 0) {
      val all = (counts.keySet ++ refR.keySet).toSeq.sorted
      val devs = all.map { s =>
        s -> (BigInt(r) * BigInt(counts.getOrElse(s, 0L)) -
          BigInt(nB) * BigInt(refR.getOrElse(s, 0L)))
      }
      val tvd = devs.map { case (_, d) => d.abs }.sum
      // Worst over-represented source among sources PRESENT in the
      // batch — the same population and (dev DESC, source ASC) tie
      // rule as batchMixAudit's row_number (an absent source is only
      // ever under-represented; ranking it would let a weight-0 ghost
      // win ties and diverge the two audits).
      val (worstSrc, worstDev) = devs.filter(d => counts.contains(d._1))
        .minBy { case (s, d) => (-d, s) }
      require(tvd.isValidLong && worstDev.isValidLong,
        s"mix-monitor TVD exceeds Long range (ref sum $r, batch $nB) — " +
          "scale the reference weights down")
      Seq((batchId, nB, tvd.toLong, worstSrc, worstDev.toLong))
        .toDF("batch_id", "n_docs", "tvd_num", "worst_source", "worst_dev")
        .write.mode("overwrite")
        .parquet(s"$outDir/batch=$batchId")
    }
  }
}
