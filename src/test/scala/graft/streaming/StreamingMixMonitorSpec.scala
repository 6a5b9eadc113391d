package graft.streaming

import graft.SparkSpec

/** StreamingMixMonitor: per-micro-batch integer TVD against a fixed
  * reference mix, with the same dev/tie conventions as batchMixAudit.
  */
class StreamingMixMonitorSpec extends SparkSpec {

  test("mix monitor: per-batch TVD rows, exact integer math, retry-safe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger

    val outDir = java.nio.file.Files.createTempDirectory("graft-mix-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mix-ckpt").toString
    // Reference mix: a:1, b:1 (R = 2).
    val ref = Map("a" -> 1L, "b" -> 1L)
    val input = MemoryStream[(Long, String)](spark)
    // Batch 0: perfect mix (2a, 2b). Batch 1: all-a burst (4a) — the
    // runaway-producer shape the monitor exists to flag.
    input.addData((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
    val q = input.toDF().toDF("doc_id", "source").writeStream
      .foreachBatch(StreamingMixMonitor.sink(ref, outDir) _)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(90000)
    input.addData((5L, "a"), (6L, "a"), (7L, "a"), (8L, "a"))
    val q2 = input.toDF().toDF("doc_id", "source").writeStream
      .foreachBatch(StreamingMixMonitor.sink(ref, outDir) _)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(90000)

    val rows = spark.read.parquet(outDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    // Batch 0: c=(2,2), n=4, R=2 → dev_s = 2·2 − 4·1 = 0 for both;
    // tvd 0; worst ties → "a".
    assert(rows(0L) == ((4L, 0L, "a", 0L)), s"batch0: ${rows(0L)}")
    // Batch 1: c=(4,0) → dev_a = 2·4 − 4·1 = 4, dev_b = −4; tvd 8 →
    // TVD = 8/(2·2·4) = 0.5, the (1,0) vs (½,½) distance.
    assert(rows(1L) == ((4L, 8L, "a", 4L)), s"batch1: ${rows(1L)}")
  }
}
