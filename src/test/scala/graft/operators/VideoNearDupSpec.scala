package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("keyframeHashes: real container slice + SPI decode + dHash — " +
    "counts match the fixture schedule, variants stay within 3 bits " +
    "per aligned pattern, fillers never surface") {
    val media = Seq(
      (0L, VideoFixtures.neardupMjpeg(5L, 0)),
      (1L, VideoFixtures.neardupMjpeg(5L, 1)),
      (2L, VideoFixtures.neardupMjpeg(5L, 2)), // head trim: one fewer
      (3L, VideoFixtures.neardupMjpeg(5L, 3))
    ).toDF("doc_id", "media")
    val kf = VideoNearDup.keyframeHashes(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nK = 3 + (5L % 3).toInt // 5 % 3 = 2 -> 5 keyframes
    assert(kf.count(_._1 == 0L) == nK)
    assert(kf.count(_._1 == 1L) == nK)
    assert(kf.count(_._1 == 2L) == nK - 1)
    assert(kf.count(_._1 == 3L) == nK)
    // Aligned patterns across members hash within 3 bits: base sample
    // 1+2k carries pattern k; the trimmed member carries pattern k at
    // sample 2k-1.
    val h = kf.map { case (id, s, hh) => (id, s) -> hh }.toMap
    for (k <- 0 until nK) {
      val base = h((0L, 1 + 2 * k))
      assert(java.lang.Long.bitCount(base ^ h((1L, 1 + 2 * k))) <= 3)
      assert(java.lang.Long.bitCount(base ^ h((3L, 1 + 2 * k))) <= 3)
      if (k >= 1)
        assert(java.lang.Long.bitCount(base ^ h((2L, 2 * k - 1))) <= 3)
    }
    // Distinct patterns are far apart (no in-video self-pairs later).
    for (k <- 0 until nK; j <- (k + 1) until nK)
      assert(java.lang.Long.bitCount(
        h((0L, 1 + 2 * k)) ^ h((0L, 1 + 2 * j))) > 6)
  }

  test("pairs: offset voting pairs every variant (trim reports its " +
    "offset), refuses shuffled stock-frame overlap, minFrac gates") {
    val media = (0 until 8).map { d =>
      val c = d / 4
      val far = d % 4 == 3 && c % 3 == 0 // cluster 0's member 3 is far
      (d.toLong, VideoFixtures.neardupMjpeg(c.toLong, d % 4, far))
    }.toDF("doc_id", "media")
    val kf = VideoNearDup.keyframeHashes(media).persist()
    val p = VideoNearDup.pairs(kf, minFrac = 0.6).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getInt(3)))).toMap
    // Cluster 0 (far member 3): pairs among {0,1,2}; cluster 1
    // (in-dup member 3 = docs 4..7): all six pairs.
    val want = Set((0L, 1L), (0L, 2L), (1L, 2L),
      (4L, 5L), (4L, 6L), (4L, 7L), (5L, 6L), (5L, 7L), (6L, 7L))
    assert(p.keySet == want, s"pairs ${p.keySet} != $want")
    // Trim offsets: member 2 vs untrimmed members votes at ±2 samples.
    assert(p((0L, 2L))._2 == -2 && p((1L, 2L))._2 == -2)
    assert(p((4L, 6L))._2 == -2 && p((6L, 7L))._2 == 2)
    assert(p((0L, 1L))._2 == 0)
    kf.unpersist()

    // Shuffled stock frames: two videos share every pattern but in
    // REVERSED order — no single offset aligns more than one frame,
    // so offset voting must refuse what set-overlap would pair.
    val stock = (0 until 5).map(k => k -> 0xA5A5L * (k + 1) * 0x9E37L)
    val rows =
      stock.map { case (k, hh) => (100L, k, hh) } ++
        stock.map { case (k, hh) => (101L, 4 - k, hh) } ++
        // and a true copy at offset 7 of video 100
        stock.map { case (k, hh) => (102L, k + 7, hh) }
    val kf2 = rows.toDF("doc_id", "sample", "h")
    val p2 = VideoNearDup.pairs(kf2, maxDist = 0, blocks = 6,
      minFrac = 0.6).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getInt(3))))
      .toMap
    assert(!p2.contains((100L, 101L)),
      "reversed-order stock frames must NOT pair")
    assert(p2((100L, 102L)) == ((5L, 7)), "true copy pairs at its offset")
    // Reversed pair shares exactly one aligned frame (k=2): visible
    // below minFrac but present in the vote table — raise minFrac to
    // 1/5 and it appears; the gate keeps 0.6.
    val loose = VideoNearDup.pairs(kf2, maxDist = 0, blocks = 6,
      minFrac = 0.2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((100L, 101L)))

    intercept[IllegalArgumentException] {
      VideoNearDup.pairs(kf2, minFrac = 0.0)
    }
    intercept[IllegalArgumentException] { // maxDist < blocks refusal rides up
      VideoNearDup.pairs(kf2, maxDist = 6, blocks = 6)
    }
  }
}
