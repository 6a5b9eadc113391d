package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VIDEO near-duplicate detection — the fourth face of the engine's
  * one near-dup contract (text: MinHash shingles; image: dHash; audio:
  * envelope hash), lifted to SEQUENCES: a re-encoded, requantized,
  * rescaled, or head-trimmed copy of a video keeps per-keyframe
  * perceptual hashes within a few bits at a CONSISTENT temporal
  * offset, so near-dup videos are exactly the pairs whose keyframe
  * hash sequences align.
  *
  * The pipeline composes three certified layers and adds one:
  * 1. container slicing — [[VideoContainer.codecRanges]] /
  *    [[MkvContainer.codecRanges]] resolve each sync sample's exact
  *    byte range (non-key bytes never leave the scan);
  * 2. SPI decode — a [[SampleDecoder.FrameDecoder]] rasterizes each
  *    keyframe payload (MJPEG built-in; plugged codecs ride free);
  * 3. per-keyframe dHash — [[ImagePhash.dhashImage]], the image
  *    side's exact grid kernel;
  * 4. TEMPORAL OFFSET VOTING (this file): keyframe-level near-dup
  *    pairs come from the same Manku block-combination join the
  *    image side certified corpus-linear ([[ImagePhash.hammingPairs]]
  *    keyed on (video, sample) structs); each cross-video keyframe
  *    match votes for the sample offset it implies, and a video pair
  *    qualifies when its BEST single offset collects enough matches —
  *    the frame-voting alignment of the public video copy-detection
  *    family (Douze/Jégou/Schmid, "An image-based approach to video
  *    copy detection", 2008-era CIVR line), which a plain set-overlap
  *    test cannot replicate (it would pair videos sharing shuffled
  *    stock frames) and an all-positions test cannot survive (a
  *    one-frame head trim misaligns every position).
  *
  * Scale shape: two narrow per-row maps (container walk, keyframe
  * decode+hash), then the corpus-linear combination join; the voting
  * aggregations run on the PAIR table, never the corpus. No driver
  * collects, no cartesian anywhere.
  */
object VideoNearDup {

  /** (doc_id, sample, h): one row per DECODABLE keyframe — dHash over
    * the raster the resolved provider produced. Blobs whose codec no
    * provider claims are excluded (the stub boundary); a keyframe the
    * provider cannot rasterize is dropped (quarantine — near-dup
    * evidence must come from real pixels only).
    */
  def keyframeHashes(media: DataFrame, blobCol: String = "media",
      decoders: Seq[SampleDecoder.FrameDecoder] =
        SampleDecoder.frameDefaults): DataFrame = {
    val claimed: Set[String] = decoders.flatMap(_.codecs).toSet
    val hash = udf { (codec: String, bytes: Array[Byte]) =>
      decoders.find(_.codecs.contains(codec))
        .flatMap(_.decode(codec, bytes))
        .map(ImagePhash.dhashImage)
    }
    // The container walk (codec gate + range map + slicing) is the
    // SHARED plan — Multimodal.keyframePayloads — so this path and
    // decodeKeyframes cannot drift; only the per-raster kernel differs.
    Multimodal.keyframePayloads(media, blobCol, claimed)
      .select(col("doc_id"), col("sample"),
        hash(col("codec"), col("payload")).as("h"))
      .filter(col("h").isNotNull)
  }

  /** Video near-dup pairs from keyframe hashes: (ida < idb, matched,
    * offset, nkf_a, nkf_b) where `matched` is the keyframe-match count
    * at the pair's best sample offset and a pair qualifies when
    * matched >= minFrac · min(nkf_a, nkf_b). `maxDist`/`blocks` are
    * the per-KEYFRAME hamming knobs (same refusal contract as
    * [[ImagePhash.hammingPairs]]: maxDist < blocks).
    *
    * Offset semantics: `offset` = idb.sample − ida.sample at the
    * winning alignment, so a head-trimmed copy reports exactly its
    * trim (in sample numbers) and an untrimmed re-encode reports 0.
    * Ties on the vote count break to the largest offset —
    * deterministic, so the gate oracle can pin it.
    */
  def pairs(kf: DataFrame, idCol: String = "doc_id",
      sampleCol: String = "sample", hashCol: String = "h",
      maxDist: Int = 3, blocks: Int = 6,
      minFrac: Double = 0.5): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac in (0,1]: $minFrac")
    val base = kf.select(col(idCol).cast("long").as("vid"),
      col(sampleCol).cast("int").as("s"), col(hashCol).as("h"))
      .where(col("h").isNotNull)
    val nk = base.groupBy(col("vid")).agg(count(lit(1)).as("nkf"))
    // Keyframe-level Manku join on (video, sample) composite ids.
    // Struct ordering is lexicographic, so for cross-video pairs
    // ida.vid < idb.vid always holds — the video pair is canonical
    // for free.
    val kfPairs = ImagePhash.hammingPairs(
      base.select(struct(col("vid"), col("s")).as("kid"), col("h")),
      "kid", "h", maxDist, blocks)
      .where(col("ida.vid") =!= col("idb.vid"))
    val votes = kfPairs
      .groupBy(col("ida.vid").as("vida"), col("idb.vid").as("vidb"),
        (col("idb.s") - col("ida.s")).as("off"))
      .agg(count(lit(1)).as("m"))
    val best = votes
      .groupBy(col("vida"), col("vidb"))
      .agg(max(struct(col("m"), col("off"))).as("b"))
      .select(col("vida"), col("vidb"),
        col("b.m").as("matched"), col("b.off").as("offset"))
    best
      .join(nk.select(col("vid").as("vida"), col("nkf").as("nkf_a")), "vida")
      .join(nk.select(col("vid").as("vidb"), col("nkf").as("nkf_b")), "vidb")
      .where(col("matched") >=
        ceil(lit(minFrac) * least(col("nkf_a"), col("nkf_b"))))
      .select(col("vida").as("ida"), col("vidb").as("idb"),
        col("matched"), col("offset"), col("nkf_a"), col("nkf_b"))
  }
}
