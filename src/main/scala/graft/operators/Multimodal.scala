package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travels as an
  * opaque `binary` column plus typed metadata, processed in executor-side
  * batches.
  *
  * The default PIXEL decode step is a clearly-marked STUB (this
  * container ships no codec libraries): `decodeStub` derives
  * deterministic pseudo-features from the raw bytes. The stub
  * boundary is now a formal SPI — [[SampleDecoder]]: the certified
  * keyframe-slicing plan ([[decodeKeyframes]]) resolves a
  * FrameDecoder per container codec id and [[decodeAudioFeatures]]
  * walks a PcmDecoder chain, so a deployment PLUGS AVC/HEVC/VP9/AV1
  * or MP3/AAC/Opus decoders in without editing the engine; unplugged
  * codecs keep the quarantine behavior. HEADER decoding
  * is real: [[ImageHeader]] parses PNG/JPEG/GIF/BMP geometry and
  * channels from a blob's leading bytes (JDK-only), so
  * [[aspectBuckets]] and [[resizePlan]] run on actual media via
  * [[ImageHeader.fromBinary]]. An OPT-IN full-pixel path exists for
  * the formats the JDK itself decodes: [[decodeImages]] (real decoded
  * geometry via `javax.imageio`) and [[resizeImages]] (bilinear
  * resample realizing resizePlan's exact geometry and byte budget).
  * Everything around the stub — the schema contract, partitioning, and
  * the frame-sampling layout — is real and tested, and both
  * [[extractFeatures]] and [[sampleFrames]] are ordinary projections /
  * generators (no `.rdd`): the blob scan stays columnar and the plan
  * stays in whole-stage codegen. A real codec or model runtime
  * initializes once per executor inside the extraction UDF's closure
  * (lazy val), the JVM analog of `mapInPandas`' per-batch handle.
  *
  * Scale notes: feature extraction is a narrow map (no shuffle); media
  * blobs should ride in their own column so Parquet column pruning skips
  * them when queries touch only metadata; `repartitionBySize` bounds
  * task payloads when blob sizes are skewed.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Deterministic fake media bytes derived from a text column — stands
    * in for real image/audio payloads in tests and the driver gate.
    */
  def synthesize(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("fake/raw").as("format"),
      (length(col(textCol)) % 640).cast("int").as("width"),
      (length(col(textCol)) % 480).cast("int").as("height"))

  /** STUB decoder: a real deployment replaces this with a codec
    * invocation (??? in spirit). Deterministic: features are pure byte
    * statistics so tests and the DuckDB oracle can mirror them. Real
    * executor-local decode paths exist for the formats the JDK ships
    * codecs for — [[decodeImages]]/[[resizeImages]] (PNG/JPEG/GIF/BMP)
    * and [[decodeAudioFeatures]] (WAV/AIFF/AU PCM) — and the video
    * CONTAINER layer is real as of round 10 ([[VideoContainer]]:
    * MP4/AVI metadata plus exact keyframe byte ranges, so only
    * sync-sample payloads reach the decoder); compressed audio
    * (MP3/AAC) and video CODEC decode of those payloads remain
    * stubbed behind this shape — and the [[SampleDecoder]] SPI is
    * where a deployment plugs the real ones into the certified
    * slicing plan.
    */
  private def decodeStub(media: Array[Byte]): (Long, Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < media.length) { sum += media(i) & 0xff; i += 1 }
    (media.length.toLong, sum, if (media.isEmpty) 0L else (media(0) & 0xff).toLong)
  }

  /** Size-aware repartitioning for blob columns: choose the partition
    * COUNT from the data (ceil(total blob bytes / targetBytes)) so each
    * task's expected payload is ~targetBytes regardless of corpus
    * growth — a fixed partition count silently fattens tasks at 100 TB
    * until executors OOM. One cheap agg (sum of lengths, pruned to the
    * blob column) + one round-robin exchange; indivisible oversized
    * blobs still travel whole, everything else balances.
    */
  def repartitionBySize(media: DataFrame, targetBytes: Long,
      blobCol: String = "media"): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // sum() over zero rows (or an all-NULL blob column) is NULL.
    val row = media.select(sum(length(col(blobCol)).cast("long"))).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    media.repartition(parts)
  }

  /** Feature extraction over the media column: (doc_id, n_bytes,
    * byte_sum, first_byte, n_frames) per blob. A struct-returning UDF
    * in a plain projection (the [[ImageHeader.imageMeta]] style) — the
    * scan stays columnar and the surrounding plan stays in whole-stage
    * codegen, where the previous `.rdd.mapPartitions` form dropped the
    * whole stage to an `RDDScanExec` over `Row`s. A real codec/model
    * handle initializes once per executor (a lazy val in the UDF's
    * closure object), which amortizes setup strictly better than the
    * old per-`batchSize`-group seam did.
    */
  def extractFeatures(media: DataFrame, frameBytes: Int = 256): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    val stats = udf { bytes: Array[Byte] => decodeStub(bytes) }
    // Null blobs drop ([[ImageHeader.fromBinary]] deliberately KEEPS
    // such rows for quarantine routing — decoding them would NPE and
    // one dirty row would abort the whole job).
    media.filter(col("media").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        stats(col("media")).as("s"))
      .select(col("doc_id"), col("s._1").as("n_bytes"),
        col("s._2").as("byte_sum"), col("s._3").as("first_byte"),
        expr(s"(s._1 + ${frameBytes - 1L}) div $frameBytes").as("n_frames"))
  }

  /** Aspect-ratio bucketed batching (the image-model training-loader
    * trick: batch media of similar shape so per-batch padding to the
    * batch max is cheap). Media rows quantize to an aspect bucket
    * (`floor(w·4/h)` capped at 8), take a dense deterministic position
    * within their bucket (ordered by doc_id), and group into batches of
    * `batchSize`; the result is per-batch shape stats with the padding
    * efficiency `sum(w·h) / (n · max_w · max_h)`.
    *
    * Scale shape: a per-bucket `row_number` window would sort the whole
    * corpus under ≤ 9 reducer tasks, so positions use the two-phase
    * global-rank form (range exchange + per-partition index + P-row
    * offset broadcast + per-bucket base subtract — [[EpochShuffle]]'s
    * machinery). Rows with degenerate dimensions (w or h ≤ 0, e.g.
    * undecodable media) are excluded rather than poisoning a bucket.
    *
    * The returned frame is cached (the collected offsets are only valid
    * for the materialization they were counted from — EpochShuffle's
    * replay-hazard contract); callers done with the batch table should
    * `unpersist()` it.
    */
  def aspectBuckets(media: DataFrame, batchSize: Int = 16): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = media.sparkSession
    import spark.implicits._
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val keyed = media
      .filter(col("width") > 0 && col("height") > 0)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("width").cast("long").as("w"),
        col("height").cast("long").as("h"))
      .withColumn("ar_q",
        least(floor(col("w") * 4.0 / col("h")), lit(8L)).cast("int"))
    val local = keyed
      .repartitionByRange(parts, col("ar_q"), col("doc_id"))
      .sortWithinPartitions(col("ar_q"), col("doc_id"))
      .select(col("ar_q"), col("doc_id"), col("w"), col("h"))
      .as[(Int, Long, Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0L
        it.map { case (q, d, w, h) => val r = (pid, i, q, d, w, h); i += 1; r }
      }.toDF("pid", "li", "ar_q", "doc_id", "w", "h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    val ranked = local.join(broadcast(offDf), "pid")
      .select(col("ar_q"), col("doc_id"), col("w"), col("h"),
        (col("off") + col("li")).as("rk"))
    val bases = ranked.groupBy(col("ar_q")).agg(min(col("rk")).as("base"))
    // Offsets are only valid for the materialization they were counted
    // from (EpochShuffle's replay-hazard note): force the result while
    // `local` is still pinned, then release it.
    val out = ranked.join(broadcast(bases), "ar_q")
      .withColumn("batch_id", ((col("rk") - col("base")) / batchSize)
        .cast("long"))
      .groupBy(col("ar_q"), col("batch_id"))
      .agg(count(lit(1)).as("n"), max(col("w")).as("max_w"),
        max(col("h")).as("max_h"),
        // floorRound6 (rule 9): a derived ratio of products.
        Curation.floorRound6(sum(col("w") * col("h")).cast("double") /
          (count(lit(1)) * max(col("w")) * max(col("h")))).as("pad_eff"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    local.unpersist()
    out
  }

  /** Resize planning for image columns: integer target geometry that
    * scales the SHORTER side to `shorter` px preserving aspect (the
    * standard vision-preprocess step). The geometry/byte math is real
    * and oracle-mirrored; the pixel resample itself sits at the
    * decode-stub boundary (no codec libs in this environment) —
    * `out_bytes` is the exact RGB buffer a real resampler allocates,
    * which is what the size-aware repartitioning and loader batching
    * actually need. Degenerate dims (w or h ≤ 0, e.g. undecodable
    * media) are excluded — [[aspectBuckets]]' rule. Pure projection:
    * zero shuffle at any scale.
    */
  def resizePlan(media: DataFrame, shorter: Int): DataFrame = {
    require(shorter > 0, s"shorter side must be positive, got $shorter")
    media.filter(col("width") > 0 && col("height") > 0)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("width").cast("long").as("w"),
        col("height").cast("long").as("h"))
      .withColumn("target_w", expr(s"(w * $shorter) div least(w, h)"))
      .withColumn("target_h", expr(s"(h * $shorter) div least(w, h)"))
      .withColumn("out_bytes", col("target_w") * col("target_h") * 3)
  }

  /** Shared JDK decode for the opt-in pixel paths: null on anything
    * undecodable. Catches NonFatal, not just IOException — the JDK's
    * ImageIO readers throw RuntimeExceptions on malformed bodies (bad
    * GIF LZW codes, zero-size BMP color tables, ...), and one dirty
    * blob must quarantine, not abort the job. The explicit
    * MemoryCacheImageInputStream keeps ImageIO off its default
    * DISK-backed stream cache (a temp-file create/write/delete per row
    * in java.io.tmpdir — pure waste for in-memory byte arrays). Close
    * discipline: `ImageIO.read(ImageInputStream)` closes the passed
    * stream itself, in its own finally, whenever a reader RUNS —
    * success or reader failure — and a second close there throws
    * IOException("closed") straight into the catch, quarantining every
    * decodable blob (found the hard way). The one path that does NOT
    * close is the null return (no registered reader recognizes the
    * format — it exits before the finally), so that path closes here,
    * or every undecodable blob leaks its cache segments until GC.
    */
  private[operators] def decodeImage(bytes: Array[Byte])
      : java.awt.image.BufferedImage =
    if (bytes == null) null
    else try {
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img = javax.imageio.ImageIO.read(stream)
      if (img == null) stream.close()
      img
    } catch { case scala.util.control.NonFatal(_) => null }

  /** OPTIONAL executor-local full-pixel decode via `javax.imageio` —
    * the JDK ships PNG/JPEG/GIF/BMP readers, so this needs no codec
    * libraries. Returns the input with REAL decoded `width`/`height`
    * (replacing whatever metadata said), so [[aspectBuckets]] and
    * [[resizePlan]] run on decoded geometry end-to-end. Undecodable or
    * null blobs keep NULL dims ([[ImageHeader.fromBinary]]'s
    * keep-for-quarantine rule; the w>0 filters downstream drop them).
    *
    * This is the opt-in pixel path; the header/synthetic paths remain
    * the oracle-gated surface ([[ImageHeader]] geometry is
    * byte-identical to these dims for well-formed files — pinned in
    * MultimodalSpec).
    */
  def decodeImages(media: DataFrame, blobCol: String = "media"): DataFrame = {
    val dec = udf { bytes: Array[Byte] =>
      val img = decodeImage(bytes)
      if (img == null) None else Some((img.getWidth, img.getHeight))
    }
    media.withColumn("_px", dec(col(blobCol)))
      .withColumn("width", col("_px._1"))
      .withColumn("height", col("_px._2"))
      .drop("_px")
  }

  /** OPTIONAL full decode → bilinear resample realizing
    * [[resizePlan]]'s geometry: per image, the shorter side scales to
    * `shorter` px (identical floor-division math to resizePlan, so
    * `octet_length(rgb) == resizePlan.out_bytes` row for row — the
    * spec pins this). Output rows: (doc_id, target_w, target_h, rgb)
    * with `rgb` the row-major 3-byte-per-pixel raster (BGR channel
    * order, `TYPE_3BYTE_BGR`) a training loader consumes. Undecodable/
    * null/degenerate blobs drop, as resizePlan's w>0 filter does.
    * Pure projection — zero shuffle; decode cost is the per-row map.
    */
  def resizeImages(media: DataFrame, shorter: Int,
      blobCol: String = "media"): DataFrame = {
    require(shorter > 0, s"shorter side must be positive, got $shorter")
    val rs = udf { bytes: Array[Byte] =>
      val img = decodeImage(bytes)
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val s = math.min(w, h)
        val tw = ((w.toLong * shorter) / s).toInt
        val th = ((h.toLong * shorter) / s).toInt
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
        } finally g.dispose()
        val raster = out.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        Some((tw, th, raster))
      }
    }
    media.filter(col(blobCol).isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        rs(col(blobCol)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"), col("r._1").as("target_w"),
        col("r._2").as("target_h"), col("r._3").as("rgb"))
  }

  /** Executor-local audio decode through the [[SampleDecoder.PcmDecoder]]
    * chain — first provider whose magic-byte `claims` matches wins.
    * The default chain is `javax.sound.sampled` (WAV/AIFF/AU; the JDK
    * ships no MP3/AAC/Opus codec — a deployment prepends those
    * providers). Returns null on unclaimed/undecodable bytes,
    * mirroring [[decodeImage]]'s quarantine rule. Providers return
    * 16-bit signed little-endian PCM at the source rate, so feature
    * extraction reads ONE sample layout regardless of the file's.
    */
  private def decodeAudio(bytes: Array[Byte],
      decoders: Seq[SampleDecoder.PcmDecoder])
      : javax.sound.sampled.AudioInputStream =
    SampleDecoder.decodePcm(bytes, decoders).orNull

  /** OPTIONAL executor-local full audio decode (the audio sibling of
    * [[decodeImages]], closing the round-8 "audio stays stubbed" gap
    * for the formats the JDK can actually read): per blob, container
    * header fields AND signal statistics computed from the decoded PCM
    * samples — sample rate, channels, frame count, duration, RMS and
    * peak of the mono mix (normalized to [-1,1]), and zero-crossing
    * count (the classic cheap voicing/noise discriminator). Compressed
    * formats without a JDK codec (MP3/AAC/Opus) and all VIDEO decode
    * remain documented stubs — [[sampleFrames]] supplies the layout
    * with synthetic frames; a deployment plugs a codec UDF with this
    * exact signature.
    *
    * Pure projection: one UDF map, no shuffle; undecodable/null blobs
    * keep NULL features (quarantine rule). Spec-gated on real
    * in-test-synthesized WAV bytes (sine at known amplitude/frequency:
    * RMS ≈ A/√2, ZCR ≈ 2·f·dur); the oracle gate keeps the
    * byte-statistics path ([[extractFeatures]]) DuckDB can mirror.
    */
  def decodeAudioFeatures(media: DataFrame, blobCol: String = "media",
      decoders: Seq[SampleDecoder.PcmDecoder] =
        SampleDecoder.pcmDefaults): DataFrame = {
    val dec = udf { bytes: Array[Byte] =>
      val in = decodeAudio(bytes, decoders)
      if (in == null) None
      else try {
        val f = in.getFormat
        val ch = f.getChannels
        val bytesPerFrame = 2 * ch
        val buf = new Array[Byte](bytesPerFrame * 4096)
        var frames = 0L
        var sumSq = 0.0
        var peak = 0.0
        var zc = 0L
        var prevSign = 0
        // AudioInputStream.read returns an integral number of FRAMES
        // by contract — no partial-frame carry needed across reads.
        var n = in.read(buf)
        while (n > 0) {
          var off = 0
          while (off + bytesPerFrame <= n) {
            // Mono mix: average channels (16-bit little-endian signed).
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val lo = buf(off + 2 * c) & 0xff
              val hi = buf(off + 2 * c + 1)
              acc += ((hi << 8) | lo).toShort.toDouble
              c += 1
            }
            val s = acc / ch / 32768.0
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
            if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
            if (sign != 0) prevSign = sign
            frames += 1
            off += bytesPerFrame
          }
          n = in.read(buf)
        }
        if (frames == 0L) None
        else Some((f.getSampleRate.toInt, ch, frames,
          frames * 1000L / f.getSampleRate.toLong,
          math.sqrt(sumSq / frames), peak, zc))
      } catch { case scala.util.control.NonFatal(_) => None }
      finally in.close()
    }
    media.withColumn("_au", dec(col(blobCol)))
      .withColumn("sample_rate", col("_au._1"))
      .withColumn("channels", col("_au._2"))
      .withColumn("n_audio_frames", col("_au._3"))
      .withColumn("duration_ms", col("_au._4"))
      .withColumn("rms", col("_au._5"))
      .withColumn("peak", col("_au._6"))
      .withColumn("zero_crossings", col("_au._7"))
      .drop("_au")
  }

  /** REAL video pixel decode through the [[SampleDecoder]] SPI: the
    * container layer slices each sync sample's exact byte range out of
    * the blob (non-key bytes never leave the scan), and the decode
    * step resolves a [[SampleDecoder.FrameDecoder]] by the container's
    * codec id. The default provider set is the JDK-decodable family —
    * Motion-JPEG via `javax.imageio` ([[SampleDecoder.ImageIoFrames]]);
    * a deployment PREPENDS its codec-library providers (AVC, HEVC,
    * VP9, AV1 ...) and those codecs ride this exact certified slicing
    * plan — no engine edit. Output: one row per keyframe — (doc_id,
    * sample, frame_w, frame_h, mean_r, mean_g, mean_b) with integer
    * (floored) per-channel raster means; a payload the resolved
    * provider cannot decode keeps NULL frame fields (the
    * [[decodeImages]] quarantine rule, so a corrupt frame is visible
    * rather than dropped).
    *
    * Blobs whose container codec NO provider claims are excluded
    * (that decode IS the stub boundary, now exactly the unplugged
    * codecs); route mixed corpora with [[MediaRouter]] first. Scale
    * shape: two narrow per-row maps (container walk, then decode of
    * only keyframe bytes) — no shuffle, no driver collect; the decode
    * cost rides the keyframe byte volume, which stss-slicing already
    * minimized. Decoders are captured in the UDF closure, so they
    * serialize to executors with the plan.
    */
  def decodeKeyframes(media: DataFrame, blobCol: String = "media",
      decoders: Seq[SampleDecoder.FrameDecoder] =
        SampleDecoder.frameDefaults): DataFrame = {
    val claimed: Set[String] = decoders.flatMap(_.codecs).toSet
    val dec = udf { (codec: String, bytes: Array[Byte]) =>
      val img = decoders.find(_.codecs.contains(codec))
        .flatMap(_.decode(codec, bytes)).orNull
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var r = 0L; var g = 0L; var b = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          i += 1
        }
        val n = w.toLong * h
        if (n == 0L) None
        else Some((w, h, (r / n).toInt, (g / n).toInt, (b / n).toInt))
      }
    }
    keyframePayloads(media, blobCol, claimed)
      .select(col("doc_id"), col("sample"),
        dec(col("codec"), col("payload")).as("_f"))
      .select(col("doc_id"), col("sample"),
        col("_f._1").as("frame_w"), col("_f._2").as("frame_h"),
        col("_f._3").as("mean_r"), col("_f._4").as("mean_g"),
        col("_f._5").as("mean_b"))
  }

  /** THE one definition of the keyframe-payload plan — codec gate,
    * range map, and byte slicing: one row per sync sample, (doc_id,
    * codec, sample, payload). ONE container parse per blob (codec
    * gate + range map from the same kernel call — null = not video /
    * no provider claims the codec); the codec id rides along so the
    * consumer's kernel resolves the same provider the gate admitted;
    * non-key bytes never leave the scan task (binary substring on
    * exact stss-resolved ranges). [[decodeKeyframes]] and
    * [[VideoNearDup.keyframeHashes]] both map their per-raster
    * kernels over this plan, so the container-walk contract cannot
    * drift between consumers.
    */
  private[operators] def keyframePayloads(media: DataFrame,
      blobCol: String, claimed: Set[String]): DataFrame = {
    val kfs = udf { bytes: Array[Byte] =>
      VideoContainer.codecRanges(bytes, claimed.contains)
        .orElse(MkvContainer.codecRanges(bytes, claimed.contains)) match {
        case Some((codec, ranges)) if claimed.contains(codec) =>
          Some((codec, ranges.map(k => (k.sample, k.offset, k.size))))
        case _ => None
      }
    }
    media
      .select(col("doc_id").cast("long").as("doc_id"),
        col(blobCol).as("_b"),
        kfs(col(blobCol)).cast("struct<codec:string," +
            "kfs:array<struct<sample:int,offset:bigint,size:bigint>>>")
          .as("_ck"))
      .filter(col("_ck").isNotNull)
      .select(col("doc_id"), col("_b"), col("_ck.codec").as("codec"),
        explode(col("_ck.kfs")).as("kf"))
      .select(col("doc_id"), col("codec"), col("kf.sample").as("sample"),
        expr("substring(_b, kf.offset + 1, kf.size)").as("payload"))
  }

  /** Frame sampling: slice the blob into fixed-size frames and keep every
    * `stride`-th one — the video-keyframe-sampling layout, as a generator
    * (one output row per sampled frame). Entirely native expressions:
    * `sequence` + `explode` generate the sampled frame numbers and the
    * binary `substr` slices each frame (clipping the tail frame), so the
    * whole operator codegens — no UDF, no `.rdd`.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    media.filter(col("media").isNotNull) // null blobs drop
      .select(col("doc_id").cast("long").as("doc_id"), col("media"),
        expr(s"((octet_length(media) + ${frameBytes - 1L}) div $frameBytes)")
          .cast("int").as("n_frames"))
      .filter(col("n_frames") > 0) // empty blobs yield no frames
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_no"),
        col("media"))
      .select(col("doc_id"), col("frame_no"),
        col("media").substr(col("frame_no") * frameBytes + 1,
          lit(frameBytes)).as("frame"))
  }
}
