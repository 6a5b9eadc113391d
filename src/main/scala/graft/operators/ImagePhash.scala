package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + hamming-banded near-duplicate pairing —
  * the IMAGE-side dedup primitive of a multimodal training pipeline
  * (the visual sibling of MinHash-LSH over text shingles): re-encoded,
  * resized, or recompressed copies of one image survive as byte-level
  * distinct blobs that exact dedup can never fold, but their
  * difference hashes land within a few bits.
  *
  * dHash (difference hash, the public-domain technique popularized by
  * Krawetz's "Kind of Like That"): decode → 9×8 block-mean grayscale
  * grid → 64 bits, bit set iff the right neighbor is strictly
  * brighter. [[vhash]] is the vertical variant (8×9 grid, bottom
  * neighbor). Gradient direction, structure, and layout survive
  * JPEG requantization; absolute levels (which it ignores) do not
  * need to.
  *
  * Pairing uses the pigeonhole band trick shared with the text-LSH
  * family ([[Similarity]]): split 64 bits into `bands` slices — any
  * pair within hamming distance `maxDist < bands` shares at least one
  * identical slice, so candidates come from an equi-join on
  * (band, slice) and the exact `bit_count(h1 ^ h2)` filter keeps no
  * false positives. Scale shape: the only shuffle is the (band,
  * slice)-keyed join — corpus-linear candidate generation at
  * production thresholds; a degenerate corpus (millions of identical
  * hashes) concentrates its OWN duplicate class into one bucket,
  * which is the answer, not skew (same contract as exact dedup's
  * hash-groupBy).
  */
object ImagePhash {

  /** Block-mean grayscale grid (`cols`×`rows`) of a decoded image:
    * cell (r, c) = mean luminance (ITU-R 601 integer weights) over
    * the pixel block [floor(c·w/cols), floor((c+1)·w/cols)) ×
    * [floor(r·h/rows), floor((r+1)·h/rows)) — deterministic integer
    * block edges, no resampling filter to disagree about.
    */
  private[operators] def grayGrid(img: java.awt.image.BufferedImage,
      cols: Int, rows: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](cols * rows)
    var r = 0
    while (r < rows) {
      val y0 = r * h / rows
      val y1 = math.max(y0 + 1, (r + 1) * h / rows)
      var c = 0
      while (c < cols) {
        val x0 = c * w / cols
        val x1 = math.max(x0 + 1, (c + 1) * w / cols)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        val n = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
        out(r * cols + c) = if (n <= 0) 0.0 else sum.toDouble / n
        c += 1
      }
      r += 1
    }
    out
  }

  private def decode(b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (b == null || b.length == 0) return None
    // Explicit memory-cached stream: ImageIO.read(InputStream)
    // disk-caches by default (a temp file per row — the decodeImage
    // lesson). Close discipline: ImageIO.read(ImageInputStream)
    // closes the stream itself in its own finally whenever a reader
    // RUNS (success or reader failure) — a second close there throws
    // IOException("closed") and would quarantine every decodable
    // blob. But the NULL return (no registered reader recognizes the
    // format) exits before that finally, leaving the stream and its
    // cache segments to GC — so close exactly that path ourselves.
    try {
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val img = javax.imageio.ImageIO.read(stream)
      if (img == null) { stream.close(); None } else Some(img)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 64-bit dHash: 9×8 grid; bit (r·8+c), MSB-first, set iff
    * grid[r][c+1] > grid[r][c] (strict — a flat block pair hashes 0,
    * so a solid image is all-zeros, not encoder noise).
    */
  def dhashOf(b: Array[Byte]): Option[Long] = decode(b).map(dhashImage)

  /** The raster-level dHash kernel — exposed so consumers that already
    * hold a decoded frame (the [[VideoNearDup]] keyframe path, where
    * rasters come from a [[SampleDecoder.FrameDecoder]] rather than a
    * whole-blob ImageIO decode) hash with EXACTLY the image-side grid.
    */
  private[operators] def dhashImage(img: java.awt.image.BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        bits <<= 1
        if (g(r * 9 + c + 1) > g(r * 9 + c)) bits |= 1L
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Vertical sibling: 8×9 grid; bit set iff the cell BELOW is
    * brighter. Together with [[dhashOf]] this distinguishes the four
    * gradient orientations a single-axis hash folds together.
    */
  def vhashOf(b: Array[Byte]): Option[Long] = decode(b).map { img =>
    val g = grayGrid(img, 8, 9)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        bits <<= 1
        if (g((r + 1) * 8 + c) > g(r * 8 + c)) bits |= 1L
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Column forms — null for undecodable blobs (quarantine rule). */
  def imageDhash(blob: Column): Column = {
    val f = udf { b: Array[Byte] => dhashOf(b) }
    f(blob)
  }
  def imageVhash(blob: Column): Column = {
    val f = udf { b: Array[Byte] => vhashOf(b) }
    f(blob)
  }

  /** Near-duplicate pairs (ida < idb, dist) with hamming(hash) <=
    * maxDist, via the pigeonhole band join: requires maxDist < bands
    * (else a qualifying pair could differ in every band and be
    * missed — refused at call time, the auto-knob contract of the
    * LSH family). 64 must divide by `bands`. This is the comboSize=1
    * special case of [[hammingPairs]] — fine at gate scale, but each
    * key is only 64/bands bits, so on a structured corpus its
    * candidate count grows super-linearly; the scale path is
    * [[hammingPairs]] with block combinations.
    */
  def bandedHammingPairs(df: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxDist >= 0 && maxDist < bands,
      s"pigeonhole guarantee needs maxDist < bands: $maxDist >= $bands")
    hammingCandidates(df, idCol, hashCol, blocks = bands, comboSize = 1)
      .where(col("dist") <= maxDist)
  }

  /** Block-combination hamming join — the CORPUS-LINEAR scale path
    * (the public design of Manku/Jain/Das Sarma, "Detecting
    * Near-Duplicates for Web Crawling", WWW 2007, generalized from
    * permuted prefix tables to combination keys): split the 64 bits
    * into `blocks` near-equal blocks; a pair within hamming distance
    * `maxDist` has differing bits in at most `maxDist` blocks, so at
    * least `blocks − maxDist` blocks match — and SOME combination of
    * `comboSize = blocks − maxDist` blocks matches exactly. Keying a
    * table on every C(blocks, comboSize) combination therefore finds
    * every qualifying pair from equi-joins alone, with key width
    * comboSize·(64/blocks) bits instead of a single band's
    * 64/bands — e.g. blocks=6, maxDist=3 gives 20 tables of ~32-bit
    * keys, cutting random-collision candidates by ~2^16 vs 16-bit
    * single bands. Explode factor is C(blocks, comboSize) rows per
    * doc (20 at the default) — linear, and the price that buys the
    * linear join. Candidates are distinct'd BEFORE the exact
    * bit_count filter (a pair can match several combinations), so no
    * false positives and no duplicates survive.
    */
  def hammingPairs(df: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, blocks: Int = 6): DataFrame = {
    require(blocks >= 2 && blocks <= 64, s"blocks out of range: $blocks")
    require(maxDist >= 0 && maxDist < blocks,
      s"pigeonhole guarantee needs maxDist < blocks: $maxDist >= $blocks")
    hammingCandidates(df, idCol, hashCol, blocks, blocks - maxDist)
      .where(col("dist") <= maxDist)
  }

  /** The candidate set BEFORE the distance filter: every distinct
    * (ida < idb) pair agreeing on at least one `comboSize`-block
    * combination key, with its exact hamming distance. Exposed
    * separately so scale probes can measure the candidate:pair
    * ratio — the number that certifies corpus-linear candidate
    * generation on a given hash distribution.
    */
  def hammingCandidates(df: DataFrame, idCol: String, hashCol: String,
      blocks: Int, comboSize: Int): DataFrame = {
    require(comboSize >= 1 && comboSize <= blocks,
      s"comboSize out of range: $comboSize of $blocks")
    // Near-equal block widths: block i covers bits
    // [i·64/blocks, (i+1)·64/blocks).
    val bounds = (0 to blocks).map(i => i * 64 / blocks)
    def blockVal(h: Column, i: Int): Column = {
      val w = bounds(i + 1) - bounds(i)
      val mask = if (w == 64) -1L else (1L << w) - 1
      shiftright(h, bounds(i)).bitwiseAND(lit(mask))
    }
    // All C(blocks, comboSize) combination keys, each folded into one
    // long (total key width <= 64 since the blocks partition 64 bits).
    // The explode factor IS C(blocks, comboSize): refuse settings whose
    // table count stops being a row-width constant (blocks=16,
    // comboSize=13 is already 560) — the contract mirror of the
    // maxDist < bands refusal.
    val combos = (0 until blocks).combinations(comboSize).toArray
    require(combos.length <= 256,
      s"C($blocks, $comboSize) = ${combos.length} tables: explode " +
        "factor too large — use fewer, wider blocks")
    val keyed = df.select(col(idCol).as("id"), col(hashCol).as("h"))
      .where(col("h").isNotNull)
      .select(col("id"), col("h"), explode(array(
        combos.zipWithIndex.map { case (cb, ci) =>
          val key = cb.foldLeft(lit(0L)) { (acc, bi) =>
            shiftleft(acc, bounds(bi + 1) - bounds(bi))
              .bitwiseOR(blockVal(col("h"), bi))
          }
          struct(lit(ci).as("t"), key.as("v"))
        }: _*)).as("tv"))
      .select(col("id"), col("h"), col("tv.t"), col("tv.v"))
    val a = keyed.select(col("t"), col("v"), col("id").as("ida"),
      col("h").as("ha"))
    val bb = keyed.select(col("t"), col("v"), col("id").as("idb"),
      col("h").as("hb"))
    a.join(bb, Seq("t", "v"))
      .where(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
      // A pair matching k combination keys appears k times: distinct
      // BEFORE the filter keeps the exchange width at the candidate
      // set, and the final predicate is exact.
      .distinct()
  }
}
