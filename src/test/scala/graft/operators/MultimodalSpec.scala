package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media(n: Int) = {
    import spark.implicits._
    Multimodal.synthesize(
      (1 to n).map(i => (i.toLong, "x" * (i * 10))).toDF("doc_id", "text"))
  }

  test("extractFeatures: deterministic byte stats and frame counts") {
    import spark.implicits._
    val out = Multimodal.extractFeatures(media(10), frameBytes = 64)
      .orderBy($"doc_id").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id * 10)                 // n_bytes = text length
      assert(r.getLong(2) == id * 10 * 'x'.toLong)    // byte_sum
      assert(r.getLong(3) == 'x'.toLong)              // first_byte
      assert(r.getLong(4) == (id * 10 + 63) / 64)     // ceil frames
    }
  }

  test("sampleFrames: stride-sampled fixed-size slices tile the blob") {
    import spark.implicits._
    // one 1000-byte blob, 256-byte frames → frames 0..3, stride 2 → 0, 2
    val m = Multimodal.synthesize(Seq((1L, "y" * 1000)).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(m, frameBytes = 256, stride = 2)
      .orderBy($"frame_no").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(frames.head.getAs[Array[Byte]](2).length == 256)
    // the last sampled frame is full here (frame 2 covers [512, 768))
    assert(frames(1).getAs[Array[Byte]](2).length == 256)
  }

  test("extractFeatures and sampleFrames stay in Tungsten (no RDD scan)") {
    // The r6 verdict's done-condition: blob feature extraction must not
    // drop the stage to an RDDScanExec — the scan stays columnar and
    // the projection/generator codegens.
    val m = media(5)
    for (df <- Seq(Multimodal.extractFeatures(m), Multimodal.sampleFrames(m))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Scan ExistingRDD"), s"RDD scan leaked:\n$plan")
    }
  }

  test("repartitionBySize derives the partition count from total blob bytes") {
    // ~10 blobs of 1000 bytes; target 2500 → ceil(10000/2500) = 4 parts
    import spark.implicits._
    val m = Multimodal.synthesize(
      (1 to 10).map(i => (i.toLong, "z" * 1000)).toDF("doc_id", "text"))
    val parts = Multimodal.repartitionBySize(m, targetBytes = 2500L)
      .rdd.getNumPartitions
    assert(parts == 4)
    // and a corpus 10x larger gets 10x the partitions — count scales
    // with data, not with a config constant
    val m10 = Multimodal.synthesize(
      (1 to 100).map(i => (i.toLong, "z" * 1000)).toDF("doc_id", "text"))
    assert(Multimodal.repartitionBySize(m10, 2500L).rdd.getNumPartitions == 40)
    // non-positive targets are a contract error, not a silent div-by-zero
    intercept[IllegalArgumentException](Multimodal.repartitionBySize(m, 0L))
    intercept[IllegalArgumentException](Multimodal.repartitionBySize(m, -5L))
  }

  test("resizePlan: shorter side hits the target exactly, aspect within 1 px") {
    import spark.implicits._
    val media = Seq((1L, 640, 480), (2L, 480, 640), (3L, 224, 224),
        (4L, 1000, 50), (5L, 0, 300), (6L, 300, -1)) // 5/6 degenerate
      .toDF("doc_id", "width", "height")
      .withColumn("media", lit(Array.emptyByteArray))
      .withColumn("format", lit("fake/raw"))
    val out = Multimodal.resizePlan(media, shorter = 224).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "degenerate dims must drop")
    out.foreach { case (d, (w, h, tw, th, bytes)) =>
      assert(math.min(tw, th) == 224L, s"doc $d shorter side $tw x $th")
      // floor-scaled aspect: |tw·h − th·w| <= max(w, h)
      assert(math.abs(tw * h - th * w) <= math.max(w, h), s"doc $d aspect")
      assert(bytes == tw * th * 3)
    }
    assert(out(1L) == ((640L, 480L, 298L, 224L, 298L * 224 * 3)))
    assert(out(3L) == ((224L, 224L, 224L, 224L, 224L * 224 * 3)))
  }
}
