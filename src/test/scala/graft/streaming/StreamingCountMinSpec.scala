package graft.streaming

import graft.SparkSpec
import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Streaming count-min: the tiered at-rest sketch equals the batch
  * sketch of everything ingested, under retries, compaction, and
  * crash interleavings.
  */
class StreamingCountMinSpec extends SparkSpec {

  private val D = 4
  private val W = 64

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def countersMap(path: String): Map[(Int, Long), Long] = {
    StreamingCountMin.counters(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def batchEquivalent(rows: Seq[String]): Map[(Int, Long), Long] = {
    import spark.implicits._
    CountMin.sketch(rows.toDF("x"), col("x"), D, W).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("stream equals batch; compaction is lossless; retry is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmp("graft-scm")
    val input = MemoryStream[String](spark)
    val q = StreamingCountMin.ingest(input.toDF().select($"value".as("x")),
      col("x"), D, W, path, tmp("graft-scm-ckpt"))
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    for (b <- 1 to 3) {
      val rows = (1 to 200).map(i => s"k${(i * b) % 25}")
      all ++= rows
      input.addData(rows)
      q.processAllAvailable()
    }
    q.stop()
    assert(countersMap(path) == batchEquivalent(all.toSeq))

    // A replayed batch overwrites its own directory: same counters.
    val replay = (1 to 200).map(i => s"k${(i * 3) % 25}")
    StreamingCountMin.writeBatch(replay.toDF("x"), 2L, col("x"), D, W, path)
    assert(countersMap(path) == batchEquivalent(all.toSeq))

    // Compaction folds the delta without changing a single counter,
    // and estimates keep the CMS overestimate invariant afterwards.
    StreamingCountMin.compact(spark, path)
    assert(countersMap(path) == batchEquivalent(all.toSeq))
    val truth = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = StreamingCountMin.estimate(spark, path,
        truth.keys.toSeq.toDF("x"), col("x"), D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(truth.forall { case (k, n) => est(k) >= n })

    // Post-compact ingest lands in a fresh delta and merges on read.
    StreamingCountMin.writeBatch(Seq("k1", "k1").toDF("x"), 3L,
      col("x"), D, W, path)
    assert(countersMap(path) == batchEquivalent(all.toSeq ++ Seq("k1", "k1")))
  }

  test("a crash between commit and cleanup never double-counts") {
    import spark.implicits._
    val path = tmp("graft-scm-crash")
    StreamingCountMin.writeBatch(Seq("a", "a", "b").toDF("x"), 0L,
      col("x"), D, W, path)
    StreamingCountMin.writeBatch(Seq("a", "c").toDF("x"), 1L,
      col("x"), D, W, path)
    val want = batchEquivalent(Seq("a", "a", "b", "a", "c"))
    StreamingCountMin.compact(spark, path)
    // Simulate the crash window: resurrect a folded delta directory
    // alongside the committed base (as if cleanup never ran). The
    // watermark must exclude it.
    StreamingCountMin.writeBatch(Seq("a", "c").toDF("x"), 1L,
      col("x"), D, W, path)
    assert(countersMap(path) == want)
    // And the next compact must not fold it again either.
    StreamingCountMin.writeBatch(Seq("d").toDF("x"), 2L, col("x"), D, W, path)
    StreamingCountMin.compact(spark, path)
    assert(countersMap(path) == batchEquivalent(
      Seq("a", "a", "b", "a", "c", "d")))
  }
}
