package graft.streaming

import graft.SparkSpec

/** Streaming bucketed-Hellinger drift monitor (the incremental q132):
  * a source matching the reference converges to ~0 drift, a shifted
  * source scores high, counts accumulate across micro-batches, and
  * state is buckets-bounded.
  */
class StreamingDriftSpec extends SparkSpec {

  private val buckets = 64

  test("matching source converges to ~0, shifted source drifts high, state accumulates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val refText = Seq.fill(200)("alpha beta gamma delta").mkString(" ")
    val ref = StreamingDrift.bucketDistribution(
      graft.operators.TextAnalysis.tokenize(refText).iterator, buckets)

    val input = MemoryStream[(String, String)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString
    val latest = new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()
    val q = StreamingDrift.drift(input.toDS(), ref, buckets)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingDrift.Drift], _: Long) =>
        df.collect().foreach(d => latest.put(d.src, (d.n_tokens, d.hellinger2)))
        ()
      }
      .start()

    for (_ <- 1 to 3) {
      input.addData(Seq(
        ("steady", "alpha beta gamma delta alpha beta gamma delta"),
        ("shifted", "zeta eta theta iota kappa lambda")))
      q.processAllAvailable()
    }
    q.stop()

    val (steadyN, steadyH) = latest.get("steady")
    val (shiftN, shiftH) = latest.get("shifted")
    assert(steadyN == 24L && shiftN == 18L) // counts accumulate over 3 batches
    assert(steadyH < 0.01, s"steady source drifted: $steadyH")
    assert(shiftH > 0.5, s"shifted source should drift high: $shiftH")
  }

  test("streaming drift equals the batch bucketed computation on the same data") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Seq(
      ("s1", "one two three four"), ("s1", "five six seven"),
      ("s2", "one one one two"))
    val refToks = "one two three four five six seven eight".split(" ")
    val ref = StreamingDrift.bucketDistribution(refToks.iterator, buckets)

    val input = MemoryStream[(String, String)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt2").toString
    val latest = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val q = StreamingDrift.drift(input.toDS(), ref, buckets)
      .writeStream.option("checkpointLocation", ckpt).outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingDrift.Drift], _: Long) =>
        df.collect().foreach(d => latest.put(d.src, d.hellinger2)); ()
      }
      .start()
    // split across two micro-batches to exercise state accumulation
    input.addData(docs.take(2)); q.processAllAvailable()
    input.addData(docs.drop(2)); q.processAllAvailable()
    q.stop()

    for ((src, expected) <- Seq("s1" -> docs.filter(_._1 == "s1"), "s2" -> docs.filter(_._1 == "s2"))) {
      val toks = expected.flatMap(d => graft.operators.TextAnalysis.tokenize(d._2))
      val c = new Array[Long](buckets)
      toks.foreach(t => c(StreamingDrift.bucket(t, buckets)) += 1)
      var h = 0.0
      for (i <- 0 until buckets) {
        val d = math.sqrt(c(i).toDouble / toks.size) - math.sqrt(ref(i))
        h += d * d
      }
      assert(math.abs(latest.get(src) - h * 0.5) < 1e-12, s"$src mismatch")
    }
  }
}
