package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {

  // Distinct base documents share no 3-shingles; near-dups share most.
  // Letter-only words: the [a-z]+ tokenizer drops digits.
  private def doc(seed: Int, words: Int = 60): String = {
    val rnd = new scala.util.Random(seed)
    (1 to words)
      .map(_ => Seq.fill(5)(('a' + rnd.nextInt(26)).toChar).mkString)
      .mkString(" ")
  }
  private def nearDup(seed: Int): String = doc(seed) + " tail extra"

  private def runBatch(indexDir: String, outDir: String,
      batchId: Long, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    StreamingDedup.sink(indexDir, outDir)(rows.toDF("doc_id", "text"), batchId)
  }

  private def accepted(outDir: String): Set[Long] = {
    import spark.implicits._
    spark.read.schema("doc_id LONG, text STRING").parquet(outDir)
      .select($"doc_id").as[Long].collect().toSet
  }

  test("filters near-dups within a batch, across batches, keeps novel docs") {
    val indexDir = Files.createTempDirectory("sd-idx").toString
    val outDir = Files.createTempDirectory("sd-out").toString

    // Batch 0: A(1), B(2), and an in-batch near-dup of A (3) → 3 dropped.
    runBatch(indexDir, outDir, 0L,
      Seq(1L -> doc(101), 2L -> doc(102), 3L -> nearDup(101)))
    assert(accepted(outDir) == Set(1L, 2L))

    // Batch 1: near-dup of B (4) dropped against the INDEX; novel C (5)
    // kept; exact re-send of A (6) dropped.
    runBatch(indexDir, outDir, 1L,
      Seq(4L -> nearDup(102), 5L -> doc(103), 6L -> doc(101)))
    assert(accepted(outDir) == Set(1L, 2L, 5L))

    // Batch 2: novel doc plus a near-dup of batch 1's survivor.
    runBatch(indexDir, outDir, 2L,
      Seq(7L -> doc(104), 8L -> nearDup(103)))
    assert(accepted(outDir) == Set(1L, 2L, 5L, 7L))
  }

  test("a retried micro-batch is idempotent (index already holds its survivors)") {
    val indexDir = Files.createTempDirectory("sd-idx2").toString
    val outDir = Files.createTempDirectory("sd-out2").toString
    runBatch(indexDir, outDir, 0L, Seq(1L -> doc(201), 2L -> doc(202)))
    // Spark re-runs batch 0 after a sink failure: same input, same id.
    runBatch(indexDir, outDir, 0L, Seq(1L -> doc(201), 2L -> doc(202)))
    assert(accepted(outDir) == Set(1L, 2L))
    // the index holds each survivor exactly once per table
    import spark.implicits._
    val idx = spark.read.schema(StreamingDedup.shinglesSchema)
      .parquet(s"$indexDir/shingles")
    assert(idx.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // and batch 1 still dedups against it
    runBatch(indexDir, outDir, 1L, Seq(3L -> nearDup(201), 4L -> doc(203)))
    assert(accepted(outDir) == Set(1L, 2L, 4L))
  }

  test("documents too short to shingle survive to the output") {
    val indexDir = Files.createTempDirectory("sd-idx4").toString
    val outDir = Files.createTempDirectory("sd-out4").toString
    // doc 2 has two tokens (< shingleN=3): it can duplicate nothing and
    // must reach the output, not silently vanish with its shingle row.
    runBatch(indexDir, outDir, 0L,
      Seq(1L -> doc(401), 2L -> "hello world", 3L -> nearDup(401)))
    assert(accepted(outDir) == Set(1L, 2L))
    // ...and again when it arrives in a later batch.
    runBatch(indexDir, outDir, 1L, Seq(4L -> "tiny", 5L -> nearDup(401)))
    assert(accepted(outDir) == Set(1L, 2L, 4L))
  }

  test("end-to-end over a streaming source") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val indexDir = Files.createTempDirectory("sd-idx3").toString
    val outDir = Files.createTempDirectory("sd-out3").toString
    val ckpt = Files.createTempDirectory("sd-ckpt3").toString

    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingDedup.sink(indexDir, outDir) _)
      .option("checkpointLocation", ckpt)
      .start()
    input.addData(1L -> doc(301), 2L -> doc(302))
    q.processAllAvailable()
    input.addData(3L -> nearDup(301), 4L -> doc(303))
    q.processAllAvailable()
    q.stop()
    assert(accepted(outDir) == Set(1L, 2L, 4L))
  }
}
