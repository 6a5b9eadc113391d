package graft.streaming

import graft.SparkSpec

/** Streaming slot-sharded Misra-Gries (the incremental q68): the hot
  * token survives across micro-batches with bounded state, estimates
  * honor the MG undercount bound, and state persists batch to batch.
  */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("hot token survives micro-batches; MG bound holds; state is bounded") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shh-ckpt").toString
    val k = 4; val slots = 8
    // foreachBatch keeps the LATEST summary per slot (update output).
    val latest = new java.util.concurrent.ConcurrentHashMap[
      (Int, String), (Long, Long)]()
    val q = StreamingHeavyHitters.candidates(input.toDS(), k, slots)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingHeavyHitters.Candidate], _: Long) =>
        val rows = df.collect()
        // A slot's emission is its FULL current summary: replace the
        // slot wholesale so evicted tokens don't linger as stale rows.
        val touched = rows.map(_.slot).toSet
        latest.keySet.removeIf(k0 => touched.contains(k0._1))
        rows.foreach(c => latest.put((c.slot, c.token), (c.est, c.slot_total)))
        ()
      }
      .start()

    def noise(b: Int, i: Int) = s"z$b${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    // 3 micro-batches: 30% 'hot', unique noise otherwise.
    for (b <- 1 to 3) {
      val rows = (1 to 500).map(i => if (i % 10 < 3) "hot" else noise(b, i))
      input.addData(rows)
      q.processAllAvailable()
    }
    q.stop()

    var hotEst = -1L; var hotTotal = -1L
    val bySlot = scala.collection.mutable.Map.empty[Int, Int]
    import scala.jdk.CollectionConverters._
    for (((slot, tok), (est, tot)) <- latest.asScala) {
      bySlot(slot) = bySlot.getOrElse(slot, 0) + 1
      if (tok == "hot") { hotEst = est; hotTotal = tot }
    }
    val trueHot = 3 * 150L
    // Survived, with est in [true - n_slot/k, true].
    assert(hotEst > 0, "hot token evicted from its slot summary")
    assert(hotEst <= trueHot && hotEst >= trueHot - hotTotal / k,
      s"est $hotEst outside MG bound for true $trueHot (slot total $hotTotal)")
    // Bounded state: every slot holds < k tokens.
    assert(bySlot.values.forall(_ <= k - 1), s"slot overflow: $bySlot")
  }
}
