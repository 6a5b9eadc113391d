package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** POSIX tar (ustar) parsing + WebDataset sample grouping — the
  * standard SHARD format of multimodal training corpora: a shard is a
  * tar of files named `<sample-key>.<ext>` (e.g. `000017.jpg`,
  * `000017.txt`, `000017.json`), consecutive entries of one key
  * forming one training sample. The engine reads shards as binary
  * blobs and explodes them executor-side:
  *
  *  - [[entries]]: every regular file in the archive — name, size,
  *    exact payload byte range (512-byte header blocks, size-rounded
  *    data blocks, two-zero-block terminator; octal and GNU base-256
  *    size fields).
  *  - [[explodeSamples]]: WebDataset grouping — one row per sample
  *    key, a map from extension to payload bytes. Grouping is by key
  *    over the WHOLE archive (not only consecutive runs), so a
  *    re-sorted shard still groups correctly; WebDataset's
  *    consecutive-layout convention makes that the same answer on
  *    conformant shards.
  *
  * gzip shards (`.tar.gz`) inflate first (1F 8B magic), as [[Warc]].
  * A malformed header ends the walk keeping the parsed prefix
  * (truncated shards are routine). Scale shape: narrow per-row
  * flatMap; one sample's members stay on one row — the downstream
  * decode fleet (`Multimodal`) sees exactly the columns it needs.
  */
object TarArchive {

  final case class Entry(name: String, size: Long, payloadFrom: Long)

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    // GNU base-256: high bit of the first byte set.
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7f).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      v
    } else {
      var v = 0L
      var i = off
      val end = off + len
      while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
      while (i < end && b(i) >= '0' && b(i) <= '7') {
        v = v * 8 + (b(i) - '0'); i += 1
      }
      v
    }
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  private def inflateIfGz(blob: Array[Byte]): Array[Byte] =
    if (blob != null && blob.length >= 2 && (blob(0) & 0xff) == 0x1f &&
      (blob(1) & 0xff) == 0x8b) Gunzip.prefix(blob) // keeps truncated prefix
    else blob

  /** All regular-file entries (typeflag '0' or NUL); directories,
    * symlinks, and pax/GNU metadata entries are skipped STRUCTURALLY
    * (their data blocks are walked over, their content ignored — long
    * names via pax headers are out of scope for shard keys, which are
    * short by construction). The core-ustar `prefix` field (header
    * bytes 345..499, POSIX.1-1988) IS honored when the ustar magic is
    * present: entry name = prefix + "/" + name, so conformant shards
    * with paths over 100 chars keep their directory component (and
    * same-basename files from different directories stay distinct
    * sample keys).
    */
  def entries(blob: Array[Byte]): Array[Entry] = {
    val b = inflateIfGz(blob)
    if (b == null || b.length < 512) return Array.empty
    val out = Array.newBuilder[Entry]
    var i = 0
    var ok = true
    while (ok && i + 512 <= b.length) {
      // Terminator: a zero block.
      if (b(i) == 0) { ok = false }
      else {
        // POSIX magic is "ustar\0" + version "00"; GNU tar writes
        // "ustar  \0" (space at +262) and uses bytes 345+ for
        // atime/ctime, NOT a prefix — honoring the prefix there would
        // glue a timestamp onto every entry name. Gate the prefix on
        // the NUL at +262 (pre-POSIX archives have no magic at all and
        // also skip it).
        val posixUstar = b(i + 257) == 'u' && b(i + 258) == 's' &&
          b(i + 259) == 't' && b(i + 260) == 'a' && b(i + 261) == 'r' &&
          b(i + 262) == 0
        val base = cstr(b, i, 100)
        val prefix = if (posixUstar) cstr(b, i + 345, 155) else ""
        val name = if (prefix.isEmpty) base else prefix + "/" + base
        val size = octal(b, i + 124, 12)
        val typeflag = b(i + 156)
        if (name.isEmpty || size < 0 ||
          i + 512 + size > b.length) ok = false
        else {
          if (typeflag == '0' || typeflag == 0)
            out += Entry(name, size, i + 512L)
          val dataBlocks = ((size + 511) / 512) * 512
          i += 512 + dataBlocks.toInt
        }
      }
    }
    out.result()
  }

  /** One row per (keep..., sample key): `parts` maps extension →
    * payload bytes. The key is the entry name up to the FIRST dot of
    * its basename (WebDataset: `dir/000017.seg.png` groups under
    * `dir/000017` with extension `seg.png`). Duplicate
    * (sample_key, extension) members — malformed shards — keep the
    * FIRST occurrence (archive order, the member a sequential reader
    * would bind) and are counted in `n_dup_parts`, so a shard that
    * repeats member names is distinguishable from a clean one instead
    * of silently last-wins-overwriting data.
    */
  def explodeSamples(df: DataFrame, blobCol: String = "content",
      keep: Seq[String] = Seq.empty): DataFrame = {
    val f = udf { blob: Array[Byte] =>
      val b = inflateIfGz(blob)
      if (b == null) Array.empty[(String, Map[String, Array[Byte]], Int)]
      else {
        val es = entries(b)
        val grouped = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.Map[String, Array[Byte]]]
        val dups = scala.collection.mutable.Map.empty[String, Int]
        es.foreach { e =>
          val slash = e.name.lastIndexOf('/')
          val dot = e.name.indexOf('.', slash + 1)
          val (key, ext) =
            if (dot < 0) (e.name, "")
            else (e.name.substring(0, dot), e.name.substring(dot + 1))
          val m = grouped.getOrElseUpdate(key,
            scala.collection.mutable.Map.empty)
          if (m.contains(ext)) // malformed shard: keep-first, count it
            dups.update(key, dups.getOrElse(key, 0) + 1)
          else {
            val payload = java.util.Arrays.copyOfRange(b,
              e.payloadFrom.toInt, (e.payloadFrom + e.size).toInt)
            m += (ext -> payload)
          }
        }
        grouped.map { case (k, m) =>
          (k, m.toMap, dups.getOrElse(k, 0)) }.toArray
      }
    }
    val keepCols = keep.map(col)
    df.select(keepCols :+ explode(f(col(blobCol))).as("s"): _*)
      .select(keepCols :+ col("s._1").as("sample_key") :+
        col("s._2").as("parts") :+ col("s._3").as("n_dup_parts"): _*)
  }

  // ---- fixture ----------------------------------------------------------

  /** A conformant ustar shard on the deterministic schedule: sample i
    * (0-based) carries `NNNNN.txt` = `textOf(i)` and `NNNNN.bin` =
    * `binOf(i)` bytes; `gz` wraps the shard.
    */
  def textOf(i: Int): String = "sample-text-" * (1 + i % 2) + i.toString
  def binOf(i: Int): Array[Byte] =
    Array.tabulate(7 + i % 5)(j => ((i * 31 + j) & 0xff).toByte)

  /** A checksummed ustar header block; `prefix` fills the POSIX
    * prefix field (bytes 345..499). Package-private so specs can
    * assemble non-fixture shards (long paths, duplicate members).
    */
  private[operators] def tarHeader(name: String, size: Long,
      prefix: String = ""): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off,
        len - 1)
    }
    oct(420, 100, 8) // mode 0644
    oct(0, 108, 8); oct(0, 116, 8) // uid gid
    oct(size, 124, 12)
    oct(0, 136, 12) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
    h(156) = '0' // regular file
    System.arraycopy("ustar".getBytes, 0, h, 257, 5)
    h(263) = '0'; h(264) = '0' // version "00"
    if (prefix.nonEmpty) {
      val pb = prefix.getBytes("UTF-8")
      System.arraycopy(pb, 0, h, 345, math.min(pb.length, 155))
    }
    var sum = 0L
    h.foreach(b => sum += (b & 0xff))
    val cs = java.lang.Long.toOctalString(sum)
    val csp = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csp.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  private[operators] def tarEntry(out: java.io.ByteArrayOutputStream,
      name: String, data: Array[Byte], prefix: String = ""): Unit = {
    out.write(tarHeader(name, data.length.toLong, prefix))
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    out.write(new Array[Byte](pad))
  }

  def fixture(nSamples: Int, gz: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until nSamples).foreach { i =>
      val key = f"$i%05d"
      tarEntry(out, s"$key.txt", textOf(i).getBytes("UTF-8"))
      tarEntry(out, s"$key.bin", binOf(i))
    }
    out.write(new Array[Byte](1024)) // two-zero-block terminator
    val raw = out.toByteArray
    if (!gz) raw
    else {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(raw); g.close()
      o.toByteArray
    }
  }
}
