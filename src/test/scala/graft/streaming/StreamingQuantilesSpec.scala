package graft.streaming

import graft.SparkSpec
import graft.functions.DDSketchAgg

/** Streaming DDSketch maintenance (the incremental q113): estimates
  * track the batch sketch exactly as micro-batches accumulate, per-key
  * state is independent, and recovery converges to the same sketch.
  */
class StreamingQuantilesSpec extends SparkSpec {

  private val Gamma = 1.01 / 0.99

  test("streamed estimates equal the batch sketch at every checkpoint") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Double)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sq-ckpt").toString
    val latest = new java.util.concurrent.ConcurrentHashMap[
      String, StreamingQuantiles.Estimate]()
    val q = StreamingQuantiles.quantiles(input.toDS(), Gamma)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingQuantiles.Estimate],
         _: Long) => df.collect().foreach(e => latest.put(e.key, e)); ()
      }
      .start()

    val rnd = new scala.util.Random(5)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (b <- 1 to 3) {
      val vals = Seq.fill(400)(math.exp(rnd.nextGaussian()))
      seen ++= vals
      input.addData(vals.map(("lat", _)))
      q.processAllAvailable()

      // The streamed estimate must equal re-aggregating everything
      // seen so far through the batch Aggregator (merge is addition,
      // so incremental == one-shot).
      val agg = new DDSketchAgg.DDSketch(Gamma)
      val ref = seen.foldLeft(agg.zero)((s, v) => agg.reduce(s, v))
      val e = latest.get("lat")
      assert(e.n == seen.size.toLong, s"batch $b count")
      assert(e.p50 == DDSketchAgg.quantile(Gamma, ref, 0.50), s"batch $b p50")
      assert(e.p99 == DDSketchAgg.quantile(Gamma, ref, 0.99), s"batch $b p99")
      // And the guarantee holds vs the exact quantile.
      val sorted = seen.sorted
      val exact = sorted(math.ceil(0.5 * seen.size).toInt - 1)
      assert(math.abs(e.p50 - exact) <= 0.011 * exact)
    }
    q.stop()
  }

  test("keys keep independent sketches; only updated keys re-emit") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Double)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sq2-ckpt").toString
    val emitted = scala.collection.mutable.ArrayBuffer.empty[
      (Long, StreamingQuantiles.Estimate)]
    val q = StreamingQuantiles.quantiles(input.toDS(), Gamma)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingQuantiles.Estimate],
         id: Long) => df.collect().foreach(e => emitted += ((id, e))); ()
      }
      .start()

    input.addData(Seq(("a", 10.0), ("a", 20.0), ("b", 1000.0)))
    q.processAllAvailable()
    input.addData(Seq(("b", 2000.0)))
    q.processAllAvailable()
    q.stop()

    val last = emitted.groupBy(_._2.key).view.mapValues(_.last._2).toMap
    assert(last("a").n == 2L && last("b").n == 2L)
    // b's scale unaffected by a's values and vice versa.
    assert(last("a").p99 < 100.0 && last("b").p50 > 900.0)
    // Batch 2 touched only b: a must not re-emit.
    val batch2Keys = emitted.collect { case (id, e) if id == 1L => e.key }
    assert(batch2Keys.toSet == Set("b"))
  }
}
