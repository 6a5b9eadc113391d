package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DSv2 `journal` format: batch/stream parity over the same fragments,
  * exact offsets in streaming, checkpointed resume mid-journal.
  */
class JournalV2Spec extends SparkSpec {

  test("format(journal) batch read matches Journal.read") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-v2").toString
    Journal.append((1 to 500).map(i => s"rec-$i").toDF("payload").repartition(3),
      root, "v2/j", "gz")

    val v2 = spark.read.format("journal")
      .option("root", root).option("journal", "v2/j").load()
    assert(v2.schema.fieldNames.toSeq == Seq("journal", "begin", "end", "payload"))
    val a = v2.orderBy("begin").collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    val b = Journal.read(spark, root, "v2/j").collect().sortBy(_.begin)
      .map(e => (e.begin, e.end, e.payload))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 500)
  }

  test("format(journal) streaming: tail reads with exact offsets and restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-v2s").toString
    val ckpt = Files.createTempDirectory("graft-v2s-ckpt").toString
    val outDir = Files.createTempDirectory("graft-v2s-out").toString
    Journal.append(Seq("a1", "a2").toDF("payload"), root, "sj", "none")

    def drain(): Unit = {
      val q = spark.readStream.format("journal")
        .option("root", root).option("journal", "sj").load()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }

    drain()
    val r1 = spark.read.parquet(outDir)
    assert(r1.count() == 2)
    // exact byte offsets surfaced in streaming mode: "a1\n" = [0,3), "a2\n" = [3,6)
    assert(r1.orderBy("begin").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L), (3L, 6L)))

    // Append while stopped; restart resumes from the checkpointed head —
    // only the new span is read.
    Journal.append(Seq("b1", "b2", "b3").toDF("payload"), root, "sj", "none")
    drain()
    val r2 = spark.read.parquet(outDir).orderBy("begin")
    assert(r2.count() == 5)
    assert(r2.select("payload").as[String].collect().toSeq ==
      Seq("a1", "a2", "b1", "b2", "b3"))
  }

  test("maxBytesPerTrigger bounds each micro-batch (admission control)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-v2ac").toString
    val ckpt = Files.createTempDirectory("graft-v2ac-ckpt").toString
    // 100 records x 4 bytes ("r00\n") = 400 journal bytes.
    Journal.append((0 until 100).map(i => f"r$i%02d").toDF("payload"),
      root, "ac", "none")

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("journal")
      .option("root", root).option("journal", "ac")
      .option("maxBytesPerTrigger", "64") // 16 records per batch
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes += df.count(); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()

    assert(batchSizes.sum == 100, s"batches: $batchSizes")
    // the byte cap holds per batch: 64 bytes / 4 bytes-per-record = 16
    assert(batchSizes.forall(_ <= 16), s"batches: $batchSizes")
    assert(batchSizes.count(_ > 0) >= 6, s"expected a paced backfill, got $batchSizes")
  }
}
