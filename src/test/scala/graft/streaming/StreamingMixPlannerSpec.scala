package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamingMixPlanner: the per-trigger plan equals the batch
  * waterfill over everything ingested so far, and a replayed batch
  * republishes its original plan even with later batches on disk.
  */
class StreamingMixPlannerSpec extends SparkSpec {

  test("per-trigger plans track the corpus so far; replay is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger

    val statsDir = java.nio.file.Files.createTempDirectory("graft-smp-st").toString
    val planDir = java.nio.file.Files.createTempDirectory("graft-smp-pl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-smp-ck").toString
    val w = (src: org.apache.spark.sql.Column) =>
      when(src === "a", 3L).otherwise(1L)
    val input = MemoryStream[(String, Long)](spark)
    def drain(expect: Long): Unit = {
      val q = input.toDF().toDF("source", "n_tokens").writeStream
        .foreachBatch(StreamingMixPlanner.sink(statsDir, planDir, w, 60) _)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(90000), "drain timed out")
      assert(q.recentProgress.map(_.numInputRows).sum == expect,
        s"expected $expect rows this drain")
    }
    def planOf(b: Long): Map[String, Long] =
      spark.read.parquet(s"$planDir/batch=$b").collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap
    def refPlan(rows: Seq[(String, Long)]): Map[String, Long] =
      graft.operators.Curation.waterfillBudget(
          rows.toDF("source", "n_tokens"), $"source", $"n_tokens", w, 60)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap

    val b0 = Seq(("a", 100L), ("b", 300L))
    val b1 = Seq(("a", 500L), ("c", 200L))
    input.addData(b0: _*)
    drain(2)
    assert(planOf(0) == refPlan(b0), "batch-0 plan != batch waterfill")
    input.addData(b1: _*)
    drain(2)
    assert(planOf(1) == refPlan(b0 ++ b1), "batch-1 plan must cover corpus so far")
    // Replay batch 0 with batch 1's outputs already on disk: the
    // republished plan must be EXACTLY the original (≤ batchId filter).
    StreamingMixPlanner.sink(statsDir, planDir, w, 60)(
      b0.toDF("source", "n_tokens"), 0L)
    assert(planOf(0) == refPlan(b0), "replayed batch-0 plan drifted")
    assert(planOf(1) == refPlan(b0 ++ b1), "batch-1 plan must be untouched")
  }
}
