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

  test("slot state survives a checkpoint restart") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shh-restart").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-shh-out").toString
    val input = MemoryStream[String](spark)

    def runQuery(expectRows: Long): Unit = {
      // Update-mode stateful stream: parquet needs Append, so persist
      // batch emissions through foreachBatch instead.
      val q = StreamingHeavyHitters.candidates(input.toDS(), k = 4, slots = 2)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingHeavyHitters.Candidate], _: Long) =>
          df.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      def processed = q.recentProgress.map(_.numInputRows).sum
      while (q.isActive && processed < expectRows && System.nanoTime() < deadline)
        Thread.sleep(200)
      Thread.sleep(300)
      q.stop()
    }

    input.addData(Seq.fill(60)("hot") ++ (1 to 40).map(i => s"n${('a' + i % 26).toChar}$i"))
    runQuery(expectRows = 100)
    // Restart from the checkpoint: the second batch's emission must
    // count ON TOP of the recovered slot state, not from zero.
    input.addData(Seq.fill(50)("hot"))
    runQuery(expectRows = 50)
    val schema = org.apache.spark.sql.Encoders
      .product[StreamingHeavyHitters.Candidate].schema
    val rows = spark.read.schema(schema).parquet(outDir)
      .as[StreamingHeavyHitters.Candidate].collect()
    val hotEsts = rows.filter(_.token == "hot").map(_.est).sorted
    assert(hotEsts.nonEmpty && hotEsts.last > 60,
      s"recovered state should push hot past batch-1 count; got ${hotEsts.toList}")
  }
}
