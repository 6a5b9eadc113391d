package graft.streaming

import graft.SparkSpec
import graft.functions.Hashes
import org.apache.spark.sql.functions._

class ExampleAppsSpec extends SparkSpec {

  test("word-count: ngram counts and prefix query") {
    import spark.implicits._
    val docs = Seq("the quick fox", "the quick dog", "a quick fox").toDF("text")
    val counts = WordCountApp.ngramCounts(docs, 2)
    val m = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("the quick") == 2 && m("quick fox") == 2 && m("quick dog") == 1)
    assert(WordCountApp.prefixQuery(counts, "quick ").count() == 2)
  }

  test("stream-sum: golden CRC64 vectors, chunk-split invariance, final emit") {
    import spark.implicits._
    import StreamSumApp._
    // one-chunk and split-chunk streams must produce the same final sum
    val chunks = Seq(
      Chunk("s1", 1, "battery horse".getBytes), Chunk("s1", 2, Array.empty),
      Chunk("s2", 1, "battery".getBytes), Chunk("s2", 2, " horse".getBytes),
      Chunk("s2", 3, Array.empty))
    val out = sums(spark.createDataset(chunks)).collect().map(s => s.id -> s.value).toMap
    assert(out("s1") == 0xae763109c1192ed6L)
    assert(out("s2") == 0xae763109c1192ed6L)
    // self-verification invariant: equals one-shot CRC of concatenated data
    assert(out("s2") == Hashes.crc64("battery horse".getBytes))
  }

  test("stream-sum rejects out-of-order seqNo") {
    import StreamSumApp._
    intercept[IllegalArgumentException] {
      update(Sum("x", 1, 0L), Chunk("x", 3, "z".getBytes))
    }
  }

  test("stream-sum: a chunk lost before the terminator errors, not a wrong sum") {
    import spark.implicits._
    import StreamSumApp._
    // Chunk 2 of stream "s" was lost; the terminator arrives as seqNo 3.
    // stream_sum.go's Update validates continuity on EVERY chunk — the
    // finalizing empty chunk included — so this must raise, not emit the
    // CRC of the partial data.
    val chunks = Seq(
      Chunk("s", 1, "battery".getBytes), Chunk("s", 3, Array.empty))
    val e = intercept[org.apache.spark.SparkException] {
      sums(spark.createDataset(chunks)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("invalid SeqNo")), msgs(e).mkString("; "))
  }

  test("bike-share: bounded retention + cycle detection") {
    import spark.implicits._
    import BikeShareApp._
    // bike 7 rides: 1→2, 2→3, 3→1 — a 3-cycle returning to station 1...
    // then the newest ride 1→2 closes a cycle ending at 2? Walk semantics:
    // newest ride is 3→1; chain backwards 2→3 then 1→2; prev.begin==1 ==
    // newest.end → cycle [1,2,3,1].
    val rides = Seq(
      Ride(7, 1, 2, 100), Ride(7, 2, 3, 200), Ride(7, 3, 1, 300),
      Ride(8, 5, 6, 100), Ride(8, 6, 7, 200)) // no cycle for bike 8
    val out = cycles(spark.createDataset(rides), minLen = 3).collect()
    assert(out.length == 1)
    assert(out.head.bike == 7)
    assert(out.head.stations == Seq(1L, 2L, 3L, 1L))
  }

  test("bike-share retention bounds state to last 20 rides") {
    import BikeShareApp._
    // 30 rides that never chain: history must cap at 20
    val rides = (1 to 30).map(i => Ride(9, i * 10L, i * 10L + 1, i * 100L)).toList
    val h = rides.foldLeft(History(Nil))((h, r) => History((r :: h.rides).take(Retain)))
    assert(h.rides.length == 20)
    assert(detectCycle(h.rides, 3).isEmpty)
  }

  test("stream-sum over a streaming source emits across micro-batches") {
    import spark.implicits._
    import StreamSumApp._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val input = MemoryStream[Chunk](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ss-ckpt").toString
    val q = sums(input.toDS()).writeStream
      .format("memory").queryName("stream_sums")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // micro-batch 1: partial stream — state holds, nothing final emitted
    input.addData(Chunk("a", 1, "battery".getBytes))
    q.processAllAvailable()
    assert(spark.table("stream_sums").count() == 0)
    // micro-batch 2: remainder + final chunk — the carried state completes
    input.addData(Chunk("a", 2, " horse".getBytes), Chunk("a", 3, Array.empty))
    q.processAllAvailable()
    val vals = spark.table("stream_sums").as[Sum].collect()
    q.stop()
    assert(vals.map(_.value).toSet == Set(0xae763109c1192ed6L),
      s"got ${vals.toList}")
  }
}
