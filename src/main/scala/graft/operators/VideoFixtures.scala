package graft.operators

import java.io.ByteArrayOutputStream

/** Deterministic MP4/AVI fixture synthesis — the video counterpart of
  * the synthetic media path ([[Multimodal.syntheticMedia]]): real,
  * spec-conformant container bytes built from a handful of integer
  * parameters, so the container PARSER ([[VideoContainer]]) can be
  * oracle-gated as a build∘parse round-trip (the DuckDB oracle cannot
  * walk MP4 boxes, but it CAN compute what parse must return, because
  * every parsed field is a pure function of the build parameters).
  *
  * Layout written (14496-12): `ftyp` · `moov[mvhd,
  * trak[tkhd, mdia[mdhd, hdlr(vide), minf[stbl[stsd(avc1), stts,
  * stss, stsz, stsc, stco]]]]]` · `mdat`. Samples are chunked
  * [[ChunkSamples]] per chunk (a short final chunk exercises stsc's
  * two-run form), written back-to-back in mdat; sample `i` (1-based)
  * carries `sampleSize(i)` bytes beginning with `i` as big-endian
  * 32-bit — so a reader that slices a claimed keyframe range can
  * verify it landed on the right sample's first byte.
  */
object VideoFixtures {

  val ChunkSamples = 4

  /** Sample i's byte size (1-based): 64 + (i mod 5)·7 — small, varied,
    * and trivially replayable in SQL.
    */
  def sampleSize(i: Int): Long = 64L + (i % 5) * 7L

  /** Sync samples: 1, 1+k, 1+2k, ... */
  def keyframeSamples(nFrames: Int, keyEvery: Int): Seq[Int] =
    (1 to nFrames by keyEvery)

  /** The media fixture family's byte writer — shared with
    * [[AudioFixtures]] (big-endian names are the bare u16/u32, as the
    * BMFF/EBML builders read; little-endian variants serve the
    * RIFF-world and Ogg fixtures).
    */
  private[operators] final class W {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): W = { out.write(v & 0xff); this }
    def u16(v: Int): W = { u8(v >>> 8); u8(v) }
    def u32(v: Long): W = { u16((v >>> 16).toInt); u16(v.toInt) }
    def u16le(v: Int): W = { u8(v); u8(v >>> 8) }
    def u32le(v: Long): W = {
      u8(v.toInt); u8((v >>> 8).toInt); u8((v >>> 16).toInt)
      u8((v >>> 24).toInt)
    }
    def u64le(v: Long): W = { u32le(v); u32le(v >>> 32) }
    def cc(s: String): W = { out.write(s.getBytes("US-ASCII")); this }
    def zeros(n: Int): W = { out.write(new Array[Byte](n)); this }
    def bytes(b: Array[Byte]): W = { out.write(b); this }
    def result(): Array[Byte] = out.toByteArray
  }

  private[operators] def box(typ: String)(body: W => Unit): Array[Byte] = {
    val w = new W
    body(w)
    val payload = w.result()
    val h = new W
    h.u32(payload.length + 8L).cc(typ).bytes(payload)
    h.result()
  }

  /** A playable-shape MP4: one video track, `nFrames` samples at
    * `fps` (timescale = fps, delta 1), sync samples every `keyEvery`.
    * Synthetic `avc1` samples carrying the BE32 self-identifying magic
    * (see object scaladoc) — the container-parser gate fixture.
    */
  def mp4(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int): Array[Byte] =
    mp4Container(width, height, fps, keyEvery, "avc1",
      (1 to nFrames).map { i =>
        val w = new W
        w.u32(i.toLong)
        val fb = new Array[Byte]((sampleSize(i) - 4).toInt)
        java.util.Arrays.fill(fb, ((i * 31) & 0xff).toByte)
        w.bytes(fb).result()
      })

  /** The [[mp4]] track with a decoder-configuration child box in the
    * sample entry — the [[CodecConfig]] gate fixture: `codec` names
    * the entry fourcc (`avc1`/`hvc1`), `config` the avcC/hvcC record
    * bytes ([[CodecFixtures]] synthesizes spec-conformant ones).
    */
  def codedMp4(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int, codec: String, config: Array[Byte]): Array[Byte] =
    mp4Container(width, height, fps, keyEvery, codec,
      (1 to nFrames).map { i =>
        val w = new W
        w.u32(i.toLong)
        val fb = new Array[Byte]((sampleSize(i) - 4).toInt)
        java.util.Arrays.fill(fb, ((i * 31) & 0xff).toByte)
        w.bytes(fb).result()
      }, config)

  /** A REAL decodable video: Motion-JPEG in MP4 (sample entry `jpeg`),
    * every sample an actual baseline-JFIF image the JDK decodes —
    * `rgbOf(sample)` gives frame `i`'s solid fill as 0xRRGGBB. This is
    * the one video codec that needs no codec library (each frame IS a
    * JPEG), so it is the honest pixel-path fixture:
    * [[VideoContainer.keyframePayloads]] slices frames and
    * [[Multimodal.decodeKeyframes]] rasterizes them for real.
    */
  def mjpegMp4(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int, rgbOf: Int => Int): Array[Byte] =
    mp4Container(width, height, fps, keyEvery, "jpeg",
      (1 to nFrames).map(i => solidJpeg(width, height, rgbOf(i))))

  /** One solid-color baseline JPEG via `javax.imageio` (JDK-only).
    * The writer is driven through an explicit
    * `MemoryCacheImageOutputStream`: `ImageIO.write(img, fmt, out)`
    * wraps OutputStreams in a DISK-cached image stream by default — a
    * temp-file create/write/delete in java.io.tmpdir per encoded
    * frame, which dominated the MJPEG fixture build at tens of
    * thousands of frames (the encode-side twin of decodeImage's
    * input-stream note in operators/Multimodal.scala).
    */
  def solidJpeg(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, width, height) }
    finally g.dispose()
    encodeJpeg(img)
  }

  /** A full-range DIAGONAL grayscale gradient JPEG — the
    * [[ImagePhash]] gate fixture. Diagonal, not axis-aligned, on
    * purpose: both the horizontal and vertical block-mean steps are
    * then strictly monotonic (~14 gray levels each), so every dHash
    * AND vHash comparison has a deterministic sign with JPEG
    * requantization noise an order of magnitude below the step — an
    * axis-aligned gradient would leave the other axis TIED, and ties
    * resolve by encoder ringing, not by the builder's arithmetic.
    */
  def gradientJpeg(width: Int, height: Int,
      ascending: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val t0 = (x * 255 / math.max(1, width - 1) +
          y * 255 / math.max(1, height - 1)) / 2
        val t = if (ascending) t0 else 255 - t0
        img.setRGB(x, y, (t << 16) | (t << 8) | t)
        x += 1
      }
      y += 1
    }
    encodeJpeg(img)
  }

  // ---- near-duplicate image clusters (the q188 realistic corpus) ----

  private[operators] def mix64(z0: Long): Long = {
    // splitmix64 finalizer (public domain, Steele et al.) — decorrelates
    // consecutive cluster keys into independent pattern streams.
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform [0, 1) from a key-disjoint splitmix stream (the salt
    * multiplier exceeds every index used, so streams of distinct keys
    * never overlap).
    */
  private[operators] def rnd01(key: Long, i: Long): Double =
    (mix64(key * 1315423911L + i) >>> 11).toDouble / (1L << 53).toDouble

  /** One step of the MAXIMUM-ENTROPY walk on heights 0..heights-1 —
    * the Parry measure of the path graph: move up/down with
    * probability proportional to the eigenvector sin((h+1)π/(H+1)) of
    * the reachable height. Near-fair comparison bits everywhere
    * (≈0.85 bits/step for H=6) while every step stays exactly one
    * margin apart. This is the construction both near-dup fixture
    * patterns need: a margin-enforced chain with naive uniform draws
    * is attracted to its extremes, where the next direction is FORCED
    * — bits alternate, sequence entropy collapses to <0.5 bits/step,
    * and at 10⁴-10⁵-cluster corpora independent clusters collide
    * within the join's maxDist (observed as false pairs at sf1/sf10
    * before this walk).
    */
  private[operators] def parryStep(h: Int, heights: Int, u: Double): Int = {
    val up = if (h < heights - 1)
      math.sin((h + 2) * math.Pi / (heights + 1)) else 0.0
    val dn = if (h > 0) math.sin(h * math.Pi / (heights + 1)) else 0.0
    if (u * (up + dn) < up) h + 1 else h - 1
  }

  /** 9×8 block levels for one cluster key: per row, a max-entropy
    * height walk ([[parryStep]], 6 heights spaced 46 gray levels over
    * [12, 242]) — every horizontal neighbor pair exactly one 46-level
    * margin apart (far above JPEG DC-quantization noise at the
    * fixture's lowest quality), with near-fair comparison bits (≈50+
    * bits of sequence entropy over the hash, so independent clusters
    * cannot land within the join's maxDist at any gate corpus).
    * Exactly TWO designated "tie" cells (rows 2 and 5, column keyed
    * per cluster) hold the walk and sit only +2 above their left
    * neighbor: encoder noise decides those bits per variant — the
    * realistic few-bit-flip behavior of production near-dups —
    * bounding within-cluster hamming distance at 2 without fixing it
    * at 0 (the neighbor after a tie still clears a ≥44 margin).
    */
  private[operators] def neardupPattern(key: Long): Array[Int] = {
    val lv = new Array[Int](72)
    val tieCol = Array(
      java.lang.Long.remainderUnsigned(mix64(key ^ 0x7165L), 8).toInt,
      java.lang.Long.remainderUnsigned(mix64(key ^ 0x54321L), 8).toInt)
    var r = 0
    while (r < 8) {
      var h = (rnd01(key, 1000 + r) * 6).toInt
      lv(r * 9) = 12 + h * 46
      var c = 1
      while (c < 9) {
        val idx = r * 9 + c
        val isTie = (r == 2 && c == tieCol(0) + 1) ||
          (r == 5 && c == tieCol(1) + 1)
        if (isTie) lv(idx) = 12 + h * 46 + 2 // hold height, tiny rise
        else {
          h = parryStep(h, 6, rnd01(key, idx))
          lv(idx) = 12 + h * 46
        }
        c += 1
      }
      r += 1
    }
    lv
  }

  private def patternImage(key: Long): java.awt.image.BufferedImage = {
    // 12-px blocks → 108×96: the 9×8 pattern aligns EXACTLY with the
    // dHash block-mean grid, so each grid cell's mean is its block
    // level plus only encoder noise.
    val lv = neardupPattern(key)
    val img = new java.awt.image.BufferedImage(108, 96,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < 96) {
      var x = 0
      while (x < 108) {
        val t = lv((y / 12) * 9 + (x / 12))
        img.setRGB(x, y, (t << 16) | (t << 8) | t)
        x += 1
      }
      y += 1
    }
    img
  }

  private def decodeJpeg(b: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b)))
    require(img != null, "fixture JPEG must decode") // builder-produced
    img
  }

  /** One member of a near-duplicate image cluster — REAL pipeline
    * variants of the cluster's base image, not arithmetic hashes:
    * member 0 is the base encode (q=0.90); 1 decodes and re-encodes at
    * q=0.35 (heavy requantization); 2 decodes and bilinearly upscales
    * 1.5× (162×144) then re-encodes; 3 adds deterministic ±3-level
    * per-pixel noise then re-encodes. `far = true` swaps in an
    * unrelated pattern stream (key-disjoint via bitwise NOT) — the
    * non-duplicate negative a near-dup gate must NOT pair.
    */
  def neardupJpeg(cluster: Long, member: Int, far: Boolean = false)
      : Array[Byte] = {
    val key = if (far) ~cluster else cluster
    val base = encodeJpegQ(patternImage(key), 0.90f)
    member match {
      case _ if far => base // the far singleton needs no variant
      case 0 => base
      case 1 => encodeJpegQ(decodeJpeg(base), 0.35f)
      case 2 =>
        val img = decodeJpeg(base)
        val (w, h) = (img.getWidth * 3 / 2, img.getHeight * 3 / 2)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        encodeJpegQ(out, 0.75f)
      case _ =>
        val img = decodeJpeg(base)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val n = (java.lang.Long.remainderUnsigned(
              mix64(key * 31 + y.toLong * 1024 + x), 7L) - 3L).toInt
            val t0 = img.getRGB(x, y) & 0xff
            val t = math.max(0, math.min(255, t0 + n))
            img.setRGB(x, y, (t << 16) | (t << 8) | t)
            x += 1
          }
          y += 1
        }
        encodeJpegQ(img, 0.80f)
    }
  }

  private def encodeJpegQ(img: java.awt.image.BufferedImage,
      quality: Float): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    require(writers.hasNext, "JDK has no JPEG writer")
    val w = writers.next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally {
      w.dispose()
      ios.close()
    }
    out.toByteArray
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    require(writers.hasNext, "JDK has no JPEG writer") // never on a conformant JRE
    val w = writers.next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      w.setOutput(ios)
      w.write(img)
    } finally {
      w.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Audio-only BMFF (.m4a triage shape): ftyp + moov with one `soun`
    * track — enough container for [[VideoContainer.audioOnlyMp4]]'s
    * handler walk. `timescale > 0` adds an mvhd carrying
    * (timescale, durationTicks), the [[AudioContainer]] duration
    * source; the default keeps the mvhd-less tag-only shape.
    */
  def m4a(brand: String = "M4A ", timescale: Int = 0,
      durationTicks: Long = 0L): Array[Byte] = {
    val hdlr = box("hdlr")(w => w.u32(0).u32(0).cc("soun").zeros(12).u8(0))
    val mdia = box("mdia")(w => w.bytes(hdlr))
    val trak = box("trak")(w => w.bytes(mdia))
    val moov = box("moov") { w =>
      if (timescale > 0) {
        val mvhd = box("mvhd") { v =>
          v.u32(0).u32(0).u32(0)
            .u32(timescale.toLong).u32(durationTicks)
            .u32(0x00010000L).u16(0x0100).u16(0).zeros(8)
          v.u32(0x00010000L).u32(0).u32(0)
          v.u32(0).u32(0x00010000L).u32(0)
          v.u32(0).u32(0).u32(0x40000000L)
          v.zeros(24).u32(2)
        }
        w.bytes(mvhd)
      }
      w.bytes(trak)
      ()
    }
    val ftyp = box("ftyp")(w => w.cc(brand).u32(0).cc(brand))
    ftyp ++ moov
  }

  /** The shared progressive-MP4 layout: one `vide` track whose stsd
    * sample entry carries `codec`, samples = `payloads` (1-based
    * sample `i` is `payloads(i-1)`), chunked [[ChunkSamples]] per
    * chunk, sync every `keyEvery`.
    */
  /** The moov header boxes both MP4 layouts share: (mvhd, tkhd, mdhd,
    * hdlr, stsd) — keeping them in ONE place so a layout fix cannot
    * desynchronize the progressive and fragmented fixtures.
    */
  private def moovHeaders(width: Int, height: Int, fps: Int, nFrames: Int,
      codec: String, config: Array[Byte] = Array.empty)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val identityMatrix: W => Unit = w => {
      w.u32(0x00010000L).u32(0).u32(0)
      w.u32(0).u32(0x00010000L).u32(0)
      w.u32(0).u32(0).u32(0x40000000L)
    }
    val mvhd = box("mvhd") { w =>
      w.u32(0) // version 0 + flags
        .u32(0).u32(0) // times
        .u32(fps.toLong) // timescale
        .u32(nFrames.toLong) // duration
        .u32(0x00010000L).u16(0x0100).u16(0).zeros(8) // rate/volume/reserved
      identityMatrix(w)
      w.zeros(24).u32(2) // pre_defined, next_track_ID
    }
    val tkhd = box("tkhd") { w =>
      w.u32(7) // version 0, flags: enabled|in-movie|in-preview
        .u32(0).u32(0) // times
        .u32(1).u32(0) // track_ID, reserved
        .u32(nFrames.toLong) // duration (movie timescale)
        .zeros(8).u16(0).u16(0).u16(0).u16(0) // layer/group/volume
      identityMatrix(w)
      w.u32(width.toLong << 16).u32(height.toLong << 16)
    }
    val mdhd = box("mdhd") { w =>
      w.u32(0).u32(0).u32(0)
        .u32(fps.toLong).u32(nFrames.toLong) // timescale, duration
        .u16(0x55c4).u16(0) // language 'und', pre_defined
    }
    val hdlr = box("hdlr") { w =>
      w.u32(0).u32(0).cc("vide").zeros(12).u8(0) // empty name
    }
    val stsd = box("stsd") { w =>
      w.u32(0).u32(1)
      // VisualSampleEntry: 86 fixed bytes + optional codec-config
      // child box (avcC/hvcC — 14496-15 §5.4.2.1).
      w.u32(86L + config.length).cc(codec).zeros(6).u16(1)
        .zeros(16) // pre_defined/reserved
        .u16(width).u16(height)
        .u32(0x00480000L).u32(0x00480000L) // 72 dpi
        .u32(0).u16(1) // reserved, frame_count
        .zeros(32) // compressorname
        .u16(24).u16(0xffff) // depth, pre_defined -1
        .bytes(config)
    }
    (mvhd, tkhd, mdhd, hdlr, stsd)
  }

  /** One member of a near-duplicate VIDEO cluster — a real MJPEG MP4
    * whose KEYFRAME k carries the (cluster, k)-keyed near-dup pattern
    * ([[neardupJpeg]]'s exact image family, so per-keyframe dHash
    * drift stays within the image side's certified ≤3 bits), with
    * non-key filler frames between sync samples (never decoded — the
    * slicing plan's contract). Members are REAL pipeline variants:
    *   0 — base encode, keyframe patterns k = 0..nK−1;
    *   1 — per-frame heavy requantization (q=0.35 re-encode);
    *   2 — HEAD TRIM + per-pixel noise: starts at pattern k=1, so a
    *       correct aligner must report a consistent −2 sample offset
    *       (one keyframe at keyEvery=2) rather than fail all-positions;
    *   3 — 1.5× upscale re-encode (162×144 container) when in-dup, or
    *       the far singleton (key-disjoint pattern stream) when `far`.
    * nK = 3 + cluster%3 keyframes; keyEvery=2 (sync at samples
    * 1,3,5,…). The far member shares NO pattern with any cluster.
    */
  def neardupMjpeg(cluster: Long, member: Int, far: Boolean = false)
      : Array[Byte] = {
    val nK = 3 + (cluster % 3).toInt
    def fkey(k: Int): Long = mix64(cluster * 0x100000001B3L + k)
    val (variant, start, w, h) = member match {
      case _ if far => (0, 0, 108, 96)
      case 0 => (0, 0, 108, 96)
      case 1 => (1, 0, 108, 96)
      case 2 => (3, 1, 108, 96)
      case _ => (2, 0, 162, 144)
    }
    val filler = solidJpeg(w, h, 0x404040)
    val payloads = (start until nK).flatMap { k =>
      Seq(neardupJpeg(fkey(k), variant, far), filler)
    }
    mp4Container(w, h, 10, keyEvery = 2, "jpeg", payloads)
  }

  private def mp4Container(width: Int, height: Int, fps: Int,
      keyEvery: Int, codec: String,
      payloads: IndexedSeq[Array[Byte]],
      config: Array[Byte] = Array.empty): Array[Byte] = {
    val nFrames = payloads.length
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 && keyEvery > 0)
    def payloadSize(i: Int): Long = payloads(i - 1).length.toLong
    val (mvhd, tkhd, mdhd, hdlr, stsd) =
      moovHeaders(width, height, fps, nFrames, codec, config)
    val stts = box("stts")(w => w.u32(0).u32(1).u32(nFrames.toLong).u32(1))
    val keys = keyframeSamples(nFrames, keyEvery)
    val stss = box("stss") { w =>
      w.u32(0).u32(keys.length.toLong)
      keys.foreach(k => w.u32(k.toLong))
    }
    val stsz = box("stsz") { w =>
      w.u32(0).u32(0).u32(nFrames.toLong)
      (1 to nFrames).foreach(i => w.u32(payloadSize(i)))
    }
    val nChunks = (nFrames + ChunkSamples - 1) / ChunkSamples
    val lastChunkSamples = nFrames - (nChunks - 1) * ChunkSamples
    val stsc = box("stsc") { w =>
      if (nChunks == 1) { w.u32(0).u32(1).u32(1).u32(nFrames.toLong).u32(1) }
      else if (lastChunkSamples == ChunkSamples) {
        w.u32(0).u32(1).u32(1).u32(ChunkSamples.toLong).u32(1)
      } else {
        w.u32(0).u32(2)
        w.u32(1).u32(ChunkSamples.toLong).u32(1)
        w.u32(nChunks.toLong).u32(lastChunkSamples.toLong).u32(1)
      }
    }
    // stco needs the absolute mdat payload offset, which depends on the
    // moov size, which depends on stco's size — resolve by building the
    // moov once with zeroed offsets (same byte LENGTH), measuring, then
    // rebuilding with real offsets.
    def chunkOffsets(mdatPayload: Long): Seq[Long] = {
      var off = mdatPayload
      var sample = 1
      (1 to nChunks).map { c =>
        val here = off
        val inChunk = if (c == nChunks) lastChunkSamples else ChunkSamples
        (0 until inChunk).foreach { _ => off += payloadSize(sample); sample += 1 }
        here
      }
    }
    def stco(offsets: Seq[Long]): Array[Byte] = box("stco") { w =>
      w.u32(0).u32(offsets.length.toLong)
      offsets.foreach(o => w.u32(o))
    }
    def moov(offsets: Seq[Long]): Array[Byte] = {
      val stbl = box("stbl")(w => w.bytes(stsd).bytes(stts).bytes(stss)
        .bytes(stsz).bytes(stsc).bytes(stco(offsets)))
      val minf = box("minf")(w => w.bytes(stbl))
      val mdia = box("mdia")(w => w.bytes(mdhd).bytes(hdlr).bytes(minf))
      val trak = box("trak")(w => w.bytes(tkhd).bytes(mdia))
      box("moov")(w => w.bytes(mvhd).bytes(trak))
    }
    val ftyp = box("ftyp")(w => w.cc("isom").u32(0x200).cc("isom"))
    val probeMoov = moov(Seq.fill(nChunks)(0L))
    val mdatPayload = ftyp.length.toLong + probeMoov.length + 8
    val finalMoov = moov(chunkOffsets(mdatPayload))
    require(finalMoov.length == probeMoov.length)
    val mdat = box("mdat") { w =>
      payloads.foreach(p => w.bytes(p))
    }
    val out = new W
    out.bytes(ftyp).bytes(finalMoov).bytes(mdat)
    out.result()
  }

  /** A fragmented MP4 (CMAF shape): the same track as [[mp4]] but the
    * moov's sample tables are EMPTY (plus `mvex/trex`, as delivery
    * encoders write) and samples arrive in `moof`+`mdat` fragments of
    * `fragSamples`, each trun carrying per-sample sizes and flags
    * (key = global sample 1, 1+keyEvery, ...) with
    * default-base-is-moof addressing. Sample payloads keep the BE32
    * self-identifying magic.
    */
  def fmp4(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int, fragSamples: Int = 5): Array[Byte] = {
    require(keyEvery > 0)
    fmp4Build(width, height, fps, nFrames, fragSamples,
      trexDefaults = false, keyEvery = keyEvery)
  }

  /** The trex-defaults CMAF shape real encoders also write: sample
    * size and flags live in `mvex/trex` (size = [[TrexSampleSize]],
    * flags = non-sync) and the truns carry NO per-sample fields — only
    * a data offset and first-sample-flags marking each fragment's
    * first sample sync. A parser that ignores trex reads size-0
    * all-sync garbage from this file.
    */
  def fmp4TrexDefaults(width: Int, height: Int, fps: Int, nFrames: Int,
      fragSamples: Int = 5): Array[Byte] =
    fmp4Build(width, height, fps, nFrames, fragSamples,
      trexDefaults = true, keyEvery = 0)

  /** Fixed sample size of the trex-defaults variant (BE32 magic + fill). */
  val TrexSampleSize = 64L

  private def fmp4Build(width: Int, height: Int, fps: Int, nFrames: Int,
      fragSamples: Int, trexDefaults: Boolean, keyEvery: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 &&
      fragSamples > 0)
    val (mvhd, tkhd, mdhd, hdlr, stsd) =
      moovHeaders(width, height, fps, nFrames, "avc1")
    val emptyTables =
      box("stts")(w => w.u32(0).u32(0)) ++
        box("stsz")(w => w.u32(0).u32(0).u32(0)) ++
        box("stsc")(w => w.u32(0).u32(0)) ++
        box("stco")(w => w.u32(0).u32(0))
    val stbl = box("stbl")(w => w.bytes(stsd).bytes(emptyTables))
    val minf = box("minf")(w => w.bytes(stbl))
    val mdia = box("mdia")(w => w.bytes(mdhd).bytes(hdlr).bytes(minf))
    val trak = box("trak")(w => w.bytes(tkhd).bytes(mdia))
    val trex = box("trex") { w =>
      w.u32(0).u32(1).u32(1).u32(0)
      if (trexDefaults) w.u32(TrexSampleSize).u32(0x10000L) // non-sync
      else w.u32(0).u32(0)
    }
    val mvex = box("mvex")(w => w.bytes(trex))
    val moov = box("moov")(w => w.bytes(mvhd).bytes(trak).bytes(mvex))
    val ftyp = box("ftyp")(w => w.cc("isom").u32(0x200).cc("iso6"))
    def szOf(s: Int): Long = if (trexDefaults) TrexSampleSize else sampleSize(s)

    val out = new W
    out.bytes(ftyp).bytes(moov)
    var sample = 1
    var seq = 1L
    while (sample <= nFrames) {
      val cnt = math.min(fragSamples, nFrames - sample + 1)
      val first = sample
      def trun(dataOffset: Long): Array[Byte] = box("trun") { w =>
        if (trexDefaults) {
          // data-offset | first-sample-flags; NO per-sample fields —
          // sizes/flags come from trex, first sample sync per fragment.
          w.u32(0x000005L).u32(cnt.toLong).u32(dataOffset).u32(0L)
        } else {
          w.u32(0x000601L) // flags: data-offset | size | sample-flags
            .u32(cnt.toLong).u32(dataOffset)
          (0 until cnt).foreach { k =>
            val s = first + k
            w.u32(szOf(s))
            w.u32(if ((s - 1) % keyEvery == 0) 0L else 0x10000L)
          }
        }
      }
      def moof(dataOffset: Long): Array[Byte] = {
        val mfhd = box("mfhd")(w => w.u32(0).u32(seq))
        // tfhd: default-base-is-moof, track 1, no defaults.
        val tfhd = box("tfhd")(w => w.u32(0x020000L).u32(1))
        val traf = box("traf")(w => w.bytes(tfhd).bytes(trun(dataOffset)))
        box("moof")(w => w.bytes(mfhd).bytes(traf))
      }
      val probe = moof(0L)
      val frag = moof(probe.length + 8L) // mdat payload, moof-relative
      require(frag.length == probe.length)
      out.bytes(frag)
      val mdat = box("mdat") { w =>
        (first until first + cnt).foreach { s =>
          w.u32(s.toLong)
          val fill = (szOf(s) - 4).toInt
          val fb = new Array[Byte](fill)
          java.util.Arrays.fill(fb, ((s * 31) & 0xff).toByte)
          w.bytes(fb)
        }
      }
      out.bytes(mdat)
      sample += cnt
      seq += 1
    }
    out.result()
  }

  // ---- Matroska (EBML, RFC 8794) ----------------------------------------

  private def ebmlId(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (1 to n).map(k => ((id >>> (8 * (n - k))) & 0xff).toByte).toArray
  }
  /** Size as a fixed 8-byte varint (leading 0x01): legal (not
    * canonical-shortest), keeps child sizes independent of layout.
    */
  private def ebmlSize(n: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    out(0) = 1
    (1 to 7).foreach(k => out(k) = ((n >>> (8 * (7 - k))) & 0xff).toByte)
    out
  }
  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length.toLong) ++ payload
  private def elU(id: Long, v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    el(id, (1 to n).map(k => ((v >>> (8 * (n - k))) & 0xff).toByte).toArray)
  }
  private def elS(id: Long, s: String): Array[Byte] =
    el(id, s.getBytes("US-ASCII"))
  private def elF8(id: Long, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    el(id, (1 to 8).map(k => ((bits >>> (8 * (8 - k))) & 0xff).toByte).toArray)
  }

  /** A Matroska file with one video track: `nFrames` SimpleBlocks in
    * one Cluster, keyframe flag on samples 1, 1+keyEvery, ...; each
    * block's frame payload leads with the BE32 sample number (the
    * same self-identifying convention as [[mp4]]'s mdat samples).
    * Duration is written in integer milliseconds (TimestampScale
    * 1e6 ns) as `nFrames * 1000 / fps` — Long arithmetic, so the
    * parse result is oracle-replayable exactly.
    */
  private def simpleBlock(i: Int, key: Boolean): Array[Byte] = {
    val w = new W
    w.u8(0x81) // track 1 varint
    w.u16(i) // s16 relative timestamp
    w.u8(if (key) 0x80 else 0x00)
    w.u32(i.toLong) // self-identifying frame payload
    el(0xA3L, w.result())
  }

  def mkv(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 && keyEvery > 0)
    val blocks = (1 to nFrames)
      .map(i => simpleBlock(i, (i - 1) % keyEvery == 0)).reduce(_ ++ _)
    mkvAround(width, height, fps, nFrames, blocks)
  }

  /** [[mkv]] with a CodecPrivate element on the video track (the
    * avcC/hvcC record for AVC/HEVC codec ids, RFC 9559 §4.2.2) — the
    * Matroska arm of the [[CodecConfig]] gate.
    */
  def mkvWithCodecPrivate(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int, codec: String, codecPrivate: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 && keyEvery > 0)
    val blocks = (1 to nFrames)
      .map(i => simpleBlock(i, (i - 1) % keyEvery == 0)).reduce(_ ++ _)
    mkvAroundClusters(width, height, fps, nFrames, el(0x1F43B666L,
      elU(0xE7L, 0) ++ blocks), codec, codecPrivate)
  }

  /** [[mkv]]'s track split across TWO clusters, the FIRST with UNKNOWN
    * size (all size bits set — what live muxers write when they cannot
    * seek back to patch the length, RFC 8794 §6): a parser that maps
    * unknown-size to "extends to segment end" must still count the
    * second cluster's blocks rather than skip them as swallowed
    * children.
    */
  def mkvUnknownSizeClusters(width: Int, height: Int, fps: Int,
      nFrames: Int, keyEvery: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 1 && keyEvery > 0)
    val half = math.max(1, nFrames / 2)
    def blocksFor(r: Range): Array[Byte] =
      r.map(i => simpleBlock(i, (i - 1) % keyEvery == 0)).reduce(_ ++ _)
    val c1Payload = elU(0xE7L, 0) ++ blocksFor(1 to half)
    val c1 = ebmlId(0x1F43B666L) ++ ebmlSize((1L << 56) - 1) ++ c1Payload
    val c2 = el(0x1F43B666L, elU(0xE7L, half + 1L) ++
      blocksFor(half + 1 to nFrames))
    mkvAroundClusters(width, height, fps, nFrames, c1 ++ c2)
  }

  /** The live-mux shape at ADVERSARIAL length: `nClusters` sequential
    * unknown-size clusters of one keyframe block each. Under RFC 8794
    * §6 each cluster extends to the segment end, so every following
    * sibling arrives as its "child" — a recursive scan nests
    * `nClusters` deep and overflows the thread stack at a few tens of
    * thousands (~5 levels of JVM frames per cluster). The worklist
    * scan in [[MkvContainer]] must count every block flat.
    */
  def mkvLiveMuxChain(width: Int, height: Int, fps: Int,
      nClusters: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nClusters > 0)
    val sb = Array.newBuilder[Byte]
    var i = 1
    while (i <= nClusters) {
      val payload = elU(0xE7L, i.toLong) ++ simpleBlock(i, key = true)
      sb ++= ebmlId(0x1F43B666L) ++ ebmlSize((1L << 56) - 1) ++ payload
      i += 1
    }
    mkvAroundClusters(width, height, fps, nClusters, sb.result())
  }

  /** A crafted KNOWN-SIZE cluster nest `depth` levels deep (12 bytes
    * per level: 4-byte Cluster id + 8-byte size, emitted top-down so
    * construction is O(depth)). Clusters never legally nest, but a
    * malformed blob can claim anything; the scan must bound its
    * descent and quarantine-or-return, never throw.
    */
  def mkvDeepNest(width: Int, height: Int, fps: Int,
      depth: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && depth > 0)
    val cid = ebmlId(0x1F43B666L)
    val sb = Array.newBuilder[Byte]
    var k = 0
    while (k < depth) {
      // level k's payload holds the remaining (depth-1-k) levels.
      sb ++= cid ++ ebmlSize((depth - 1L - k) * 12L)
      k += 1
    }
    mkvAroundClusters(width, height, fps, 1, sb.result())
  }

  /** The [[mkv]] track/info skeleton around caller-supplied cluster
    * payload — shared by the block-form variants below.
    */
  private def mkvAround(width: Int, height: Int, fps: Int, nFrames: Int,
      blocks: Array[Byte], codec: String = "V_MPEG4/ISO/AVC"): Array[Byte] =
    mkvAroundClusters(width, height, fps, nFrames,
      el(0x1F43B666L, elU(0xE7L, 0) ++ blocks), codec)

  private def mkvAroundClusters(width: Int, height: Int, fps: Int,
      nFrames: Int, clusters: Array[Byte],
      codec: String = "V_MPEG4/ISO/AVC",
      codecPrivate: Array[Byte] = Array.empty): Array[Byte] = {
    val header = el(0x1A45DFA3L,
      elU(0x4286L, 1) ++ elU(0x42F7L, 1) ++ elU(0x42F2L, 4) ++
        elU(0x42F3L, 8) ++ elS(0x4282L, "matroska") ++
        elU(0x4287L, 4) ++ elU(0x4285L, 2))
    val info = el(0x1549A966L,
      elU(0x2AD7B1L, 1000000L) ++
        elF8(0x4489L, (nFrames.toLong * 1000L / fps).toDouble))
    val trackEntry = el(0xAEL,
      elU(0xD7L, 1) ++ elU(0x83L, 1) ++ elS(0x86L, codec) ++
        (if (codecPrivate.isEmpty) Array.empty[Byte]
         else el(0x63A2L, codecPrivate)) ++
        el(0xE0L, elU(0xB0L, width.toLong) ++ elU(0xBAL, height.toLong)))
    val tracks = el(0x1654AE6BL, trackEntry)
    val segment = el(0x18538067L, info ++ tracks ++ clusters)
    header ++ segment
  }

  /** The third REAL-decodable MJPEG container: Matroska with codec id
    * `V_MJPEG`, every SimpleBlock payload an actual baseline JPEG
    * ([[solidJpeg]]), keyframe flag on samples 1, 1+keyEvery, ... —
    * what [[MkvContainer.codecRanges]] slices and
    * [[Multimodal.decodeKeyframes]] rasterizes.
    */
  def mkvMjpeg(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int, rgbOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 && keyEvery > 0)
    val blocks = (1 to nFrames).map { i =>
      val w = new W
      w.u8(0x81) // track 1 varint
      w.u16(i) // s16 relative timestamp
      w.u8(if ((i - 1) % keyEvery == 0) 0x80 else 0x00)
      w.bytes(solidJpeg(width, height, rgbOf(i)))
      el(0xA3L, w.result())
    }.reduce(_ ++ _)
    mkvAround(width, height, fps, nFrames, blocks, codec = "V_MJPEG")
  }

  /** [[mkv]]'s track but every frame in its own BlockGroup/Block —
    * the muxer shape ffmpeg/mkvmerge write for tracks with reference
    * frames: non-key groups carry a ReferenceBlock (rel. timestamp
    * -1), key groups carry none. Same self-identifying BE32 payloads.
    */
  def mkvBlockGroups(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 && keyEvery > 0)
    val groups = (1 to nFrames).map { i =>
      val key = (i - 1) % keyEvery == 0
      val w = new W
      w.u8(0x81) // track 1 varint
      w.u16(i) // s16 relative timestamp
      w.u8(0x00) // Block has NO keyframe flag; that's the group's job
      w.u32(i.toLong)
      val block = el(0xA1L, w.result())
      val refBlock = el(0xFBL, Array(0xff.toByte)) // s8 -1: prior frame
      el(0xA0L, if (key) block else block ++ refBlock)
    }.reduce(_ ++ _)
    mkvAround(width, height, fps, nFrames, groups)
  }

  /** [[mkv]]'s track but ALL frames packed into ONE fixed-size-laced
    * SimpleBlock (lacing bits 0b100, lace count byte = n-1; legal
    * because every BE32 payload is the same 4 bytes) with the keyframe
    * flag set — the audio-style packing a frame counter must unpack.
    */
  def mkvLaced(width: Int, height: Int, fps: Int,
      nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 &&
      nFrames > 0 && nFrames <= 256)
    val w = new W
    w.u8(0x81).u16(0)
    w.u8(0x80 | 0x04) // keyframe + fixed-size lacing
    w.u8(nFrames - 1) // lace frame count - 1
    (1 to nFrames).foreach(i => w.u32(i.toLong))
    mkvAround(width, height, fps, nFrames, el(0xA3L, w.result()))
  }

  private def le32(w: W, v: Long): W = {
    w.u8(v.toInt).u8((v >>> 8).toInt).u8((v >>> 16).toInt)
      .u8((v >>> 24).toInt)
  }
  private def riffChunk(typ: String)(body: W => Unit): Array[Byte] = {
    val w = new W
    body(w)
    val p = w.result()
    val h = new W
    h.cc(typ); le32(h, p.length.toLong); h.bytes(p)
    if (p.length % 2 == 1) h.u8(0)
    h.result()
  }
  private def aviHeaders(width: Int, height: Int, usPerFrame: Long,
      nFrames: Long, codec: String): Array[Byte] = {
    val avih = riffChunk("avih") { w =>
      le32(w, usPerFrame); le32(w, 0); le32(w, 0); le32(w, 0)
      le32(w, nFrames); le32(w, 0); le32(w, 1); le32(w, 0)
      le32(w, width.toLong); le32(w, height.toLong)
      (0 until 4).foreach(_ => le32(w, 0))
    }
    val strh = riffChunk("strh") { w =>
      w.cc("vids").cc(codec)
      (0 until 12).foreach(_ => le32(w, 0))
    }
    val strl = riffChunk("LIST")(w => { w.cc("strl"); w.bytes(strh); () })
    riffChunk("LIST")(w => { w.cc("hdrl"); w.bytes(avih); w.bytes(strl); () })
  }

  /** Minimal AVI: RIFF('AVI ') → LIST hdrl → avih + LIST strl → strh
    * (vids). Enough container for [[VideoContainer.parse]]'s AVI path;
    * no frame data (metadata-only legacy ingest shape).
    */
  def avi(width: Int, height: Int, usPerFrame: Long,
      nFrames: Long, codec: String = "mjpg"): Array[Byte] =
    riffChunk("RIFF") { w =>
      w.cc("AVI ")
      w.bytes(aviHeaders(width, height, usPerFrame, nFrames, codec))
      ()
    }

  /** A REAL decodable MJPEG AVI — the classic webcam/capture shape:
    * LIST movi of '00dc' chunks (each a solid-fill baseline JPEG via
    * [[solidJpeg]]) plus an idx1 whose entries carry movi-relative
    * offsets and AVIIF_KEYFRAME (0x10) on frames 1, 1+keyEvery, ...
    * (MJPEG frames are all independently decodable; flagging a subset
    * exercises idx1 range resolution — an index-less variant is what
    * the intra-only fallback covers).
    */
  def aviMjpeg(width: Int, height: Int, usPerFrame: Long, nFrames: Int,
      keyEvery: Int, rgbOf: Int => Int,
      indexAll: Boolean = true): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0 &&
      nFrames > 0 && keyEvery > 0)
    val frames = (1 to nFrames).map(i => solidJpeg(width, height, rgbOf(i)))
    val chunks = frames.map(f => riffChunk("00dc")(w => { w.bytes(f); () }))
    // Entry offsets are relative to the 'movi' fourcc: the subtype is
    // payload byte 0, so chunk k starts at 4 + sum(padded sizes < k).
    val offsets = chunks.scanLeft(4L)((acc, c) => acc + c.length).init
    val movi = riffChunk("LIST") { w =>
      w.cc("movi"); chunks.foreach(c => w.bytes(c)); ()
    }
    // indexAll = false writes a SPARSE idx1 (keyframe entries only) —
    // a legal shape some capture tools emit; frame counts must then
    // come from the movi walk, not the index.
    val idx1 = riffChunk("idx1") { w =>
      (1 to nFrames).foreach { i =>
        val key = (i - 1) % keyEvery == 0
        if (key || indexAll) {
          w.cc("00dc")
          le32(w, if (key) 0x10L else 0L)
          le32(w, offsets(i - 1))
          le32(w, frames(i - 1).length.toLong)
        }
      }
    }
    riffChunk("RIFF") { w =>
      w.cc("AVI ")
      w.bytes(aviHeaders(width, height, usPerFrame, nFrames.toLong, "MJPG"))
      w.bytes(movi)
      w.bytes(idx1)
      ()
    }
  }
}
