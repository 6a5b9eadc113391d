package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.Journal

/** Read-your-writes barrier (consumer Stat analog): readThrough blocks
  * until the running query commits the journal head, then the sink
  * must contain everything written before the barrier.
  */
class ReadThroughSpec extends SparkSpec {

  test("readThrough releases once the committed offset covers the head") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-rt").toString
    val ckpt = Files.createTempDirectory("graft-rt-ckpt").toString
    Journal.append(Seq("a1", "a2").toDF("payload"), root, "t/rt")
    // DSv2 journal stream: its offsets are {"head":N}, which the
    // barrier reads from committed progress.
    val q = spark.readStream.format("journal")
      .option("root", root).option("journal", "t/rt").load()
      .writeStream.format("memory").queryName("rt_rows")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      assert(ConsumerApp.readThrough(q, root, "t/rt", timeoutMs = 60000),
        "barrier timed out on batch 1")
      assert(spark.table("rt_rows").count() == 2)

      // Publish more; a barrier at the NEW head sees exactly the new state.
      Journal.append(Seq("b1", "b2", "b3").toDF("payload"), root, "t/rt")
      assert(ConsumerApp.readThrough(q, root, "t/rt", timeoutMs = 60000),
        "barrier timed out on batch 2")
      assert(spark.table("rt_rows").count() == 5)

      // An already-satisfied barrier returns immediately.
      val t0 = System.nanoTime()
      assert(ConsumerApp.readThrough(q, root, "t/rt", timeoutMs = 60000))
      assert((System.nanoTime() - t0) / 1e6 < 5000)
    } finally q.stop()
  }
}
