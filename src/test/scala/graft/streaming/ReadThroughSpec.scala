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

  test("multi-source query: another journal's head cannot release the barrier") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-rt2").toString
    val ckpt = Files.createTempDirectory("graft-rt2-ckpt").toString
    // 'big' is far ahead of 'small' in byte offsets.
    Journal.append((1 to 200).map(i => s"big-$i").toDF("payload"), root, "t/big")
    Journal.append(Seq("s1").toDF("payload"), root, "t/small")
    def src(j: String) = spark.readStream.format("journal")
      .option("root", root).option("journal", j).load()
    val q = src(Journal.listFragments(root, "t/big").head.journal)
      .union(src("t/small"))
      .writeStream.format("memory").queryName("rt2_rows")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // Barrier on 'small' at an offset BEYOND its head must time out
      // even though 'big''s committed head exceeds it numerically.
      val smallHead = Journal.head(root, "t/small")
      assert(ConsumerApp.readThrough(q, root, "t/small", timeoutMs = 60000),
        "barrier at small's own head should pass")
      assert(!ConsumerApp.readThrough(q, root, "t/small",
        throughOffset = smallHead + 1000, timeoutMs = 3000),
        "unreached offset must not be released by the other journal's head")
    } finally q.stop()
  }
}
