package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end streaming corpus pipeline: the observe/plan/act triangle
  * composed as ONE flow with a kill/restart in the middle —
  *
  *   docs stream ─ foreachBatch ┬─ [[StreamingMixPlanner]]  (observe+plan)
  *                              ├─ [[Curation.extendManifest]] (act: admit
  *                              │    arriving docs into plan headroom,
  *                              │    append-only manifest snapshots)
  *                              ├─ admitted-docs file sink ──▶ stage B
  *                              └─ [[StreamingMixMonitor]]  (audit the
  *                                   realized mix)
  *   stage B: file stream ─ [[StreamingOrder.assign]] ─ (shard, pos) sink
  *
  * Each piece is spec'd alone elsewhere; this proves they AGREE
  * batch-for-batch across a restart: manifests extend append-only,
  * spend never exceeds the batch's plan, stage B's positions cover
  * exactly the admitted docs with dense per-shard counters resuming
  * from the checkpoint, audits mirror the integer TVD — and a crash
  * REPLAY of an already-processed batch republishes byte-identical
  * artifacts (the reference analog: word-count's publish-then-query
  * round-trips, word_count_test.go:21-100, and stream-sum's
  * self-verifying exactly-once, stream_sum.go:389-440).
  */
class CorpusPipelineE2ESpec extends SparkSpec {

  private val refMix = Map("a" -> 3L, "b" -> 1L, "c" -> 1L)
  private val weight = (s: org.apache.spark.sql.Column) =>
    when(s === "a", 3L).otherwise(1L)

  private def emptyManifest(spark: org.apache.spark.sql.SparkSession) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("source", StringType),
        StructField("doc_id", LongType), StructField("n_tokens", LongType),
        StructField("cum_tokens", LongType))))

  /** The composed foreachBatch body (stage A). */
  private def pipeline(statsDir: String, planDir: String,
      manifestDir: String, admittedDir: String, auditDir: String)(
      docs: DataFrame, batchId: Long): Unit = {
    val spark = docs.sparkSession
    // 1. observe + plan: running totals -> per-batch waterfill plan.
    StreamingMixPlanner.sink(statsDir, planDir, weight, 60)(docs, batchId)
    // 2. act: admit this batch's docs into the refreshed plan's
    // headroom above the previous manifest snapshot (batch ids are
    // sequential per checkpoint, so batchId-1 IS the previous state;
    // a replayed batch reads the same predecessor it read originally).
    val plan = spark.read.parquet(s"$planDir/batch=$batchId")
    val prev =
      if (batchId == 0L) emptyManifest(spark)
      else spark.read.parquet(s"$manifestDir/batch=${batchId - 1}")
    val next = Curation.extendManifest(prev, docs, col("doc_id"),
      col("source"), col("n_tokens"), plan, seed = "e2e")
    next.coalesce(1).write.mode("overwrite")
      .parquet(s"$manifestDir/batch=$batchId")
    val admitted = next.join(prev.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("source"), col("doc_id"), col("n_tokens"),
        lit(batchId).as("batch"))
    admitted.coalesce(1).write.mode("overwrite")
      .parquet(s"$admittedDir/b$batchId")
    next.unpersist()
    // 3. audit the REALIZED mix (what was admitted) vs the target.
    StreamingMixMonitor.sink(refMix, auditDir)(
      spark.read.parquet(s"$admittedDir/b$batchId"), batchId)
  }

  test("plan/manifest/order/audit agree batch-for-batch across a restart; replay is exact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger

    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-e2e-$tag").toString
    val (statsDir, planDir, manifestDir, admittedDir, auditDir) =
      (tmp("stats"), tmp("plan"), tmp("man"), tmp("adm"), tmp("audit"))
    val (ckptA, ckptB, posDir) = (tmp("cka"), tmp("ckb"), tmp("pos"))

    val input = MemoryStream[(Long, String, Long)](spark)
    def drainA(): Unit = {
      val q = input.toDF().toDF("doc_id", "source", "n_tokens")
        .writeStream
        .foreachBatch(
          pipeline(statsDir, planDir, manifestDir, admittedDir, auditDir) _)
        .option("checkpointLocation", ckptA)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stage A drain timed out")
    }
    val adSchema = StructType(Seq(StructField("source", StringType),
      StructField("doc_id", LongType), StructField("n_tokens", LongType),
      StructField("batch", LongType)))
    def drainB(): Unit = {
      val q = StreamingOrder.assign(
          spark.readStream.schema(adSchema).parquet(s"$admittedDir/*"),
          $"doc_id", seed = "ord", shards = 2)
        .writeStream.format("parquet").option("path", posDir)
        .option("checkpointLocation", ckptB)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stage B drain timed out")
    }
    def manifest(b: Long): Set[(String, Long, Long, Long)] =
      spark.read.parquet(s"$manifestDir/batch=$b")
        .as[(String, Long, Long, Long)].collect().toSet
    def admitted(b: Long): Set[(String, Long, Long)] =
      spark.read.parquet(s"$admittedDir/b$b")
        .select($"source", $"doc_id", $"n_tokens")
        .as[(String, Long, Long)].collect().toSet
    def planAlloc(b: Long): Map[String, Long] =
      spark.read.parquet(s"$planDir/batch=$b").collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap

    // Three batches of arriving docs; 'a' is over-weighted (3) so its
    // headroom grows fastest. Doc ids unique across the stream.
    val b0 = (0L until 12L).map(i =>
      (i, Seq("a", "b", "c")(((i % 3)).toInt), 10L))
    val b1 = (12L until 30L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
    val b2 = (30L until 42L).map(i => (i, Seq("a", "c")((i % 2).toInt), 10L))

    input.addData(b0: _*)
    drainA()
    drainB() // stage B consumes batch 0's admissions
    input.addData(b1: _*)
    drainA() // CRASH POINT: stage B has NOT seen batch 1 yet.
    // ---- kill/restart: both queries are stopped; new instances below
    // resume from their checkpoints with batch 2 arriving after the
    // restart.
    input.addData(b2: _*)
    drainA()
    drainB() // restart from ckptB: must position batches 1 AND 2

    // Batch-for-batch agreement.
    val batchDocs = Map(0L -> b0, 1L -> b1, 2L -> b2)
    for (b <- 0L to 2L) {
      val prev = if (b == 0) Set.empty[(String, Long, Long, Long)]
                 else manifest(b - 1)
      val cur = manifest(b)
      assert(prev.subsetOf(cur), s"batch $b: manifest not append-only")
      // admitted(b) is exactly the manifest delta.
      val delta = (cur -- prev).map(r => (r._1, r._2, r._3))
      assert(delta == admitted(b), s"batch $b: admitted != manifest delta")
      // spend never exceeds the batch's own plan.
      val spend = cur.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
      val alloc = planAlloc(b)
      spend.foreach { case (s, t) =>
        assert(t <= alloc.getOrElse(s, 0L),
          s"batch $b: source $s spent $t > alloc ${alloc.get(s)}")
      }
      // the plan is the waterfill over everything ingested so far.
      val sofar = (0L to b).flatMap(batchDocs).groupBy(_._2)
        .map { case (s, rs) => (s, rs.map(_._3).sum) }.toSeq
      val ref = Curation.waterfillBudget(sofar.toDF("source", "n_tokens"),
          $"source", $"n_tokens", weight, 60)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      assert(alloc == ref, s"batch $b: plan != batch waterfill over corpus so far")
      // the audit row mirrors the integer TVD of the ADMITTED mix.
      val adm = admitted(b)
      if (adm.nonEmpty) {
        val counts = adm.groupBy(_._1).map { case (s, rs) => s -> rs.size.toLong }
        val nB = counts.values.sum
        val r = refMix.values.sum
        val want = (counts.keySet ++ refMix.keySet).toSeq
          .map(s => math.abs(r * counts.getOrElse(s, 0L) -
            nB * refMix.getOrElse(s, 0L))).sum
        val got = spark.read.parquet(s"$auditDir/batch=$b")
          .select($"n_docs", $"tvd_num").as[(Long, Long)].head()
        assert(got == ((nB, want)), s"batch $b: audit row $got != mirror ($nB, $want)")
      }
    }

    // Stage B positioned EXACTLY the admitted docs, densely per shard,
    // with pre-restart assignments immutable (same checkpoint state).
    val posSchema = StructType(Seq(StructField("shard", IntegerType),
      StructField("pos", LongType), StructField("doc_id", LongType)))
    val pos = spark.read.schema(posSchema).parquet(posDir)
      .as[(Int, Long, Long)].collect().toVector
    val admittedAll = (0L to 2L).flatMap(b => admitted(b).map(_._2)).toSet
    assert(pos.map(_._3).toSet == admittedAll,
      "positions must cover exactly the admitted docs")
    assert(pos.map(_._3).distinct.length == pos.length,
      "a doc was positioned twice across the restart")
    pos.groupBy(_._1).foreach { case (sh, rows) =>
      assert(rows.map(_._2).sorted == (0L until rows.length.toLong).toVector,
        s"shard $sh positions not dense across restart")
    }

    // Crash REPLAY: re-run batch 1's foreachBatch body with batch 2's
    // outputs already on disk. Every artifact it republishes must be
    // content-identical, and batch 2's artifacts untouched.
    val snap = (manifest(1), admitted(1), planAlloc(1), manifest(2), planAlloc(2))
    pipeline(statsDir, planDir, manifestDir, admittedDir, auditDir)(
      b1.toDF("doc_id", "source", "n_tokens"), 1L)
    assert(manifest(1) == snap._1, "replayed manifest drifted")
    assert(admitted(1) == snap._2, "replayed admissions drifted")
    assert(planAlloc(1) == snap._3, "replayed plan drifted")
    assert(manifest(2) == snap._4, "later manifest touched by replay")
    assert(planAlloc(2) == snap._5, "later plan touched by replay")
  }
}
