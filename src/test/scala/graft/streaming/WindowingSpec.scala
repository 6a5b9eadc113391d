package graft.streaming

import graft.SparkSpec
import graft.functions.F
import org.apache.spark.sql.functions._

/** Event-time semantics (SURVEY §2.8): event time extracted from UUID
  * clocks, watermarked tumbling windows dropping late data, and session
  * windows.
  */
class WindowingSpec extends SparkSpec {

  private def microsOf(s: String): Long =
    java.sql.Timestamp.valueOf(s).getTime * 1000L

  test("uuid_time drives watermarked tumbling windows; late rows drop") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(Array[Byte], Long)](spark)
    val windowed = input.toDF().toDF("uuid", "v")
      .withColumn("event_time", F.uuid_time($"uuid"))
      .withWatermark("event_time", "10 minutes")
      .groupBy(window($"event_time", "10 minutes"))
      .agg(sum($"v").as("sv"))
      .select(date_format($"window.start", "HH:mm").as("w"), $"sv")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-win").toString
    val q = windowed.writeStream.format("memory").queryName("win_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    def uuid(ts: String): Array[Byte] =
      graft.functions.GazetteUuid.build(Array[Byte](1, 2, 3, 4, 5, 6),
        graft.functions.GazetteUuid.microsToClock(microsOf(ts)), 0)

    // Window [10:00,10:10) gets 1+2; watermark then advances past it.
    // (Watermark set at batch N's end gates emission during batch N+1.)
    input.addData(uuid("2024-01-01 10:00:30") -> 1L, uuid("2024-01-01 10:05:00") -> 2L)
    q.processAllAvailable()
    input.addData(uuid("2024-01-01 10:31:00") -> 4L) // after batch: watermark 10:21
    q.processAllAvailable()
    input.addData(uuid("2024-01-01 10:01:00") -> 100L) // late beyond 10:21: dropped
    input.addData(uuid("2024-01-01 10:45:00") -> 8L)
    q.processAllAvailable() // emits [10:00,10:10); after: watermark 10:35
    input.addData(uuid("2024-01-01 11:10:00") -> 16L)
    q.processAllAvailable() // after: watermark 11:00
    input.addData(uuid("2024-01-01 11:20:00") -> 32L)
    q.processAllAvailable() // emits windows ending <= 11:00
    val m = spark.table("win_out").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(m("10:00") == 3L, s"late row must not reopen the closed window: $m")
    assert(m("10:30") == 4L, s"got $m")
    assert(m("10:40") == 8L, s"got $m")
  }

  test("dropDuplicatesWithinWatermark dedups by uuid — the simple-case " +
      "alternative to the Sequencer (SURVEY §2.8)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(String, Long)](spark)
    val deduped = input.toDF().toDF("uuid", "v")
      .withColumn("event_time",
        timestamp_micros(lit(1700000000000000L) + $"v" * 60000000L))
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("uuid")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-dd").toString
    val q = deduped.writeStream.format("memory").queryName("dd_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    input.addData("a" -> 0L, "b" -> 1L, "a" -> 2L) // in-batch duplicate a
    q.processAllAvailable()
    input.addData("a" -> 3L, "c" -> 4L)            // cross-batch duplicate a
    q.processAllAvailable()
    val vs = spark.table("dd_out").collect().map(_.getString(0)).toSeq
    q.stop()
    assert(vs.sorted == Seq("a", "b", "c"), s"got $vs")
  }

  test("stream-stream interval join with watermarks bounds both states") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // Impressions joined to clicks within [imp, imp+10min] — the
    // M5/§2.7 streaming-join shape. Watermarks on BOTH sides plus the
    // interval condition let Spark evict state instead of buffering
    // streams forever (the unbounded-state trap at scale).
    val imps = MemoryStream[(Long, String)](spark)
    val clicks = MemoryStream[(Long, String)](spark)
    val impDf = imps.toDF().toDF("ad", "t")
      .withColumn("imp_time", to_timestamp($"t")).drop("t")
      .withWatermark("imp_time", "5 minutes")
    val clkDf = clicks.toDF().toDF("ad2", "t")
      .withColumn("clk_time", to_timestamp($"t")).drop("t")
      .withWatermark("clk_time", "5 minutes")
    val joined = impDf.join(clkDf,
      $"ad" === $"ad2" &&
        $"clk_time" >= $"imp_time" &&
        $"clk_time" <= $"imp_time" + expr("INTERVAL 10 MINUTES"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    val q = joined.select($"ad", date_format($"clk_time", "HH:mm").as("ct"))
      .writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    imps.addData(1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:01:00")
    clicks.addData(1L -> "2024-01-01 10:05:00") // within window → joins
    q.processAllAvailable()
    clicks.addData(2L -> "2024-01-01 10:30:00") // 29min later → outside window
    clicks.addData(1L -> "2024-01-01 10:08:00") // second click, still inside
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "10:05"), (1L, "10:08")))
  }

  test("session windows group bursts separated by gaps (batch)") {
    import spark.implicits._
    val events = Seq(
      ("u1", "2024-01-01 10:00:00", 1L), ("u1", "2024-01-01 10:03:00", 2L),
      ("u1", "2024-01-01 10:20:00", 4L), // >5min gap → new session
      ("u2", "2024-01-01 10:00:00", 8L))
      .toDF("user", "t", "v")
      .withColumn("event_time", to_timestamp($"t"))
    val sessions = events
      .groupBy($"user", session_window($"event_time", "5 minutes"))
      .agg(sum($"v").as("sv"))
      .select($"user", $"sv")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sessions == Set(("u1", 3L), ("u1", 4L), ("u2", 8L)))
  }
}
