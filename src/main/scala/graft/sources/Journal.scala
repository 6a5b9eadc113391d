package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Journal = append-only byte log that is simultaneously a stream and a
  * set of immutable content-addressed files (the reference's core thesis,
  * docs/brokers-concepts.rst:4-22, 104-160).
  *
  * Spark-first re-expression:
  *  - a fragment is a file `%016x-%016x-%s.codec` (begin/end uncompressed
  *    byte offsets + SHA1, broker/protocol naming per
  *    fragment.ContentName, broker/fragment/spool.go:26-50),
  *  - writes spool per Spark partition (S6), the driver assigns
  *    contiguous offsets and commits by rename (S5/S7's
  *    spool→persist); content addressing makes retried writes idempotent,
  *  - reads list the fragment index, resolve overlaps via the cover set
  *    (S2-S3, broker/fragment/cover_set.go:36-142), and stream
  *    envelope rows with exact byte offsets — executors open fragments
  *    directly (the read-delegation path, S1).
  *
  * Framing is newline-delimited (ndjson / CSV lines — §1.2); payloads are
  * opaque strings here, decoded by `from_json`/`from_csv` downstream.
  *
  * Scale note: listing is driver-side (as Spark's FileStreamSource);
  * reads parallelize per fragment. Fragment target length (spool roll
  * policy) bounds fragment size so task granularity stays even.
  */
object Journal {

  final case class Fragment(
      journal: String, begin: Long, end: Long, sha1: String, codec: String,
      path: String) {
    def name: String = f"$begin%016x-$end%016x-$sha1.$codec"
  }

  /** One framed record with its byte span. */
  final case class Envelope(journal: String, begin: Long, end: Long, payload: String)

  // ---- compression codecs (S9) ---------------------------------------
  // The reference's fragment codecs (protocol CompressionCodec:
  // NONE/GZIP/ZSTANDARD/SNAPPY) with its file extensions; zstd + snappy
  // ride the libraries Spark already ships (zstd-jni, snappy-java).

  private[graft] def wrapOutput(codec: String, os: java.io.OutputStream): java.io.OutputStream =
    codec match {
      case "gz"   => new GZIPOutputStream(os)
      case "zst"  => new com.github.luben.zstd.ZstdOutputStream(os)
      case "sz"   => new org.xerial.snappy.SnappyFramedOutputStream(os)
      case "none" | "raw" => os
      case other  => throw new IllegalArgumentException(s"unknown codec: $other")
    }

  private[graft] def wrapInput(codec: String, is: java.io.InputStream): java.io.InputStream =
    codec match {
      case "gz"   => new GZIPInputStream(is)
      case "zst"  => new com.github.luben.zstd.ZstdInputStream(is)
      case "sz"   => new org.xerial.snappy.SnappyFramedInputStream(is)
      case "none" | "raw" => is
      case other  => throw new IllegalArgumentException(s"unknown codec: $other")
    }

  // ---- fragment index ------------------------------------------------

  private val FragmentRe = """([0-9a-f]{16})-([0-9a-f]{16})-([0-9a-f]{40})\.(\w+)""".r

  /** Fragment listing; `modifiedAfterMs` is the begin_mod_time read
    * filter (P5, protocol.proto:438-442): skip fragments persisted
    * before the bound.
    */
  def listFragments(root: String, journal: String,
      modifiedAfterMs: Long = Long.MinValue): Vector[Fragment] = {
    val dir = Paths.get(root, journal)
    if (!Files.isDirectory(dir)) Vector.empty
    else {
      // Recursive walk: fragments may live under Hive-style path-postfix
      // subdirectories (date=…/hour=…, protocol.proto:248-262).
      val stream = Files.walk(dir)
      try stream.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case FragmentRe(b, e, sha, codec)
              if Files.getLastModifiedTime(p).toMillis >= modifiedAfterMs =>
            Some(Fragment(journal, java.lang.Long.parseUnsignedLong(b, 16),
              java.lang.Long.parseUnsignedLong(e, 16), sha, codec, p.toString))
          case _ => None
        }
      }.toVector.sortBy(f => (f.begin, -f.end))
      finally stream.close()
    }
  }

  /** Retention maintenance (journals prune, SURVEY §2.12): delete
    * fragments whose span ends at or below `keepFromOffset`. Returns
    * deleted fragments.
    */
  def prune(root: String, journal: String, keepFromOffset: Long): Vector[Fragment] = {
    val (drop, _) = listFragments(root, journal).partition(_.end <= keepFromOffset)
    drop.foreach(f => Files.deleteIfExists(Paths.get(f.path)))
    drop
  }

  /** Compaction maintenance: coalesce runs of contiguous small
    * fragments into content-addressed fragments of up to `targetBytes`
    * uncompressed — the long-tail-of-tiny-files antidote (short spool
    * roll intervals at low write rates leave fragments far below the
    * target length; at 100 TB an uncompacted index costs listing time
    * and per-task scheduling overhead).
    *
    * Crash-safe ordering: the merged fragment is committed BEFORE its
    * sources are deleted. In the interim the index holds overlapping
    * fragments — exactly the state [[coverSet]] exists to resolve (the
    * merged fragment extends furthest and wins), so a crash at ANY
    * point leaves a correct, readable index; re-running compaction is
    * idempotent (content-addressed name, REPLACE_EXISTING rename).
    *
    * Only fragments directly in the journal root are compacted:
    * Hive-postfix subdirectories partition by path, and merging across
    * them would undo that layout.
    */
  def compact(root: String, journal: String, targetBytes: Long,
      codec: String = "gz"): Vector[Fragment] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val dir = Paths.get(root, journal)
    val rootFrags = listFragments(root, journal)
      .filter(f => Paths.get(f.path).getParent == dir)
    val cover = coverSet(rootFrags)

    // Pack consecutive CONTIGUOUS cover entries while the merged span
    // stays within targetBytes; only runs of >= 2 fragments compact.
    val runs = Vector.newBuilder[Vector[(Fragment, Long)]]
    var cur = Vector.empty[(Fragment, Long)]
    def flush(): Unit = { if (cur.length >= 2) runs += cur; cur = Vector.empty }
    cover.foreach { case e @ (f, readFrom) =>
      val runBegin = cur.headOption.map(_._2).getOrElse(readFrom)
      val contiguous = cur.lastOption.forall(_._1.end == readFrom)
      if (cur.nonEmpty && (!contiguous || f.end - runBegin > targetBytes)) flush()
      cur = cur :+ e
    }
    flush()

    runs.result().map { run =>
      val begin = run.head._2
      val end = run.last._1.end
      val tmp = Files.createTempFile(Paths.get(root), ".compact-", ".tmp")
      val digest = MessageDigest.getInstance("SHA-1")
      val out = new BufferedOutputStream(
        wrapOutput(codec, new FileOutputStream(tmp.toFile)), 1 << 16)
      run.foreach { case (f, readFrom) =>
        val in = new BufferedInputStream(
          wrapInput(f.codec, new FileInputStream(f.path)), 1 << 16)
        try {
          var skip = readFrom - f.begin
          while (skip > 0) {
            val s = in.skip(skip)
            require(s > 0, s"cannot seek to $readFrom in ${f.name}")
            skip -= s
          }
          var remaining = f.end - readFrom
          val buf = new Array[Byte](1 << 16)
          while (remaining > 0) {
            val n = in.read(buf, 0, math.min(buf.length, remaining).toInt)
            require(n > 0, s"truncated fragment ${f.name}")
            digest.update(buf, 0, n)
            out.write(buf, 0, n)
            remaining -= n
          }
        } finally in.close()
      }
      out.close()
      val sha = digest.digest().map("%02x".format(_)).mkString
      val frag = Fragment(journal, begin, end, sha, codec,
        dir.resolve(f"$begin%016x-$end%016x-$sha.$codec").toString)
      commitFragment(frag, tmp.toString)
      run.foreach { case (f, _) =>
        if (f.path != frag.path) Files.deleteIfExists(Paths.get(f.path))
      }
      frag
    }
  }

  /** Cover-set resolution (S3): orderly walk selecting, at each offset,
    * the fragment extending furthest; fully-covered fragments drop out.
    * Returns fragments with the exact uncompressed byte range to surface
    * from each ([readFrom, end)).
    */
  def coverSet(frags: Vector[Fragment]): Vector[(Fragment, Long)] = {
    val sorted = frags.sortBy(f => (f.begin, -f.end))
    var maxEnd = Long.MinValue
    val out = Vector.newBuilder[(Fragment, Long)]
    sorted.foreach { f =>
      if (f.end > maxEnd) {
        out += ((f, math.max(f.begin, if (maxEnd == Long.MinValue) f.begin else maxEnd)))
        maxEnd = f.end
      }
    }
    out.result()
  }

  /** Journal head: next append offset. */
  def head(root: String, journal: String): Long =
    listFragments(root, journal).map(_.end).foldLeft(0L)(math.max)

  // ---- write path (S5-S7) --------------------------------------------

  /** Append a DataFrame's `payload` string column as framed fragments.
    * One spool per Spark partition (and per path postfix when
    * `postfixCol` is set — Hive-style `date=…/hour=…` subdirectories,
    * the reference's path_postfix_template); offsets assigned
    * contiguously from the current head; commit = atomic rename into the
    * fragment index. Returns committed fragments.
    */
  def append(df: DataFrame, root: String, journal: String,
      codec: String = "gz", payloadCol: String = "payload",
      postfixCol: Option[String] = None): Seq[Fragment] =
    stage(df, root, journal, codec, payloadCol, postfixCol).map {
      case (frag, tmp) => commitFragment(frag, tmp)
    }

  /** Spool-and-plan half of `append`: spools each (partition, postfix)
    * group executor-side, assigns contiguous offsets from the journal
    * head, and returns the planned fragments paired with their spool tmp
    * files — WITHOUT renaming anything into the fragment index. Callers
    * commit each fragment with `commitFragment`; `batchSink` writes its
    * manifest between the two so the whole batch is crash-atomic.
    */
  private[graft] def stage(df: DataFrame, root: String, journal: String,
      codec: String = "gz", payloadCol: String = "payload",
      postfixCol: Option[String] = None): Seq[(Fragment, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val dir = Paths.get(root, journal)
    Files.createDirectories(dir)

    // Executor side: spool each (partition, postfix) group to a temp
    // file; report (partitionId, postfix, uncompressedLength, sha1, tmp).
    val rows = postfixCol match {
      case Some(pc) => df.select(col(payloadCol), col(pc).cast("string")).as[(String, String)]
      case None     => df.select(col(payloadCol)).as[String].map(p => (p, ""))
    }
    val spooled = rows.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        final class Spool(val tmp: Path) {
          val digest = MessageDigest.getInstance("SHA-1")
          var len = 0L
          private val fos = new FileOutputStream(tmp.toFile)
          val out = new BufferedOutputStream(wrapOutput(codec, fos), 1 << 16)
        }
        val spools = scala.collection.mutable.LinkedHashMap.empty[String, Spool]
        it.foreach { case (line, postfix) =>
          val sp = spools.getOrElseUpdate(postfix, new Spool(
            Files.createTempFile(Paths.get(root),
              s".spool-${journal.replace('/', '_')}-$idx-", ".tmp")))
          val bytes = (line + "\n").getBytes("UTF-8")
          sp.digest.update(bytes)
          sp.out.write(bytes)
          sp.len += bytes.length
        }
        spools.iterator.map { case (postfix, sp) =>
          sp.out.close()
          val sha = sp.digest.digest().map("%02x".format(_)).mkString
          (idx, postfix, sp.len, sha, sp.tmp.toString)
        }
      }.collect().sortBy(s => (s._1, s._2))

    // Driver side: prefix-sum offsets from the journal head; the
    // caller commits via rename (content-addressed names make
    // retries idempotent).
    var begin = head(root, journal)
    spooled.map { case (_, postfix, len, sha, tmpPath) =>
      val sub = if (postfix.isEmpty) dir else dir.resolve(postfix)
      Files.createDirectories(sub)
      val frag = Fragment(journal, begin, begin + len, sha, codec,
        sub.resolve(f"$begin%016x-${begin + len}%016x-$sha.$codec").toString)
      begin = frag.end
      (frag, tmpPath)
    }.toSeq
  }

  /** Commit one staged fragment: atomic rename of its spool into the
    * fragment index (the spool→persist step, S7).
    */
  private[graft] def commitFragment(frag: Fragment, tmpPath: String): Fragment = {
    Files.move(Paths.get(tmpPath), Paths.get(frag.path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    frag
  }

  /** Idempotent micro-batch sink for `writeStream.foreachBatch`: a
    * batch manifest prevents duplicate appends on retry (the engine's
    * analog of ACK-intent fencing, SURVEY §1.1 Register row).
    *
    * Crash-atomic two-phase commit: stage spools first, then write a
    * `.pending` manifest naming every planned fragment AND its spool
    * file, then rename fragments into the index, then finalize by
    * atomically renaming `.pending` → `.committed`. A retry after a
    * crash in ANY window reconciles from the pending manifest — it
    * completes outstanding renames when the spools survive, or rolls
    * back the batch's partial fragments and re-appends — so the batch's
    * records land exactly once. (Assumes the foreachBatch contract:
    * one writer per (journal, query), serial batch retries.)
    */
  def batchSink(root: String, journal: String, codec: String = "gz")(
      df: DataFrame, batchId: Long): Unit = {
    val dir = Paths.get(root, journal)
    val committed = dir.resolve(s".batch-$batchId.committed")
    if (Files.exists(committed)) return
    Files.createDirectories(dir)

    val pending = dir.resolve(s".batch-$batchId.pending")
    if (Files.exists(pending)) {
      // A prior attempt crashed mid-commit. Each manifest line is
      // "fragPath\tspoolPath": finish renames where the spool survived;
      // if any fragment can't be completed, roll the partial batch back
      // and fall through to a fresh append (offsets re-derive from the
      // head, which rollback restored).
      val entries = Files.readAllLines(pending).asScala
        .filter(_.nonEmpty).map(_.split('\t')).toVector
      entries.foreach { case Array(fragPath, tmpPath) =>
        if (!Files.exists(Paths.get(fragPath)) && Files.exists(Paths.get(tmpPath)))
          Files.move(Paths.get(tmpPath), Paths.get(fragPath),
            StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
      if (entries.forall(e => Files.exists(Paths.get(e(0))))) {
        Files.move(pending, committed, StandardCopyOption.ATOMIC_MOVE)
        return
      }
      entries.foreach(e => Files.deleteIfExists(Paths.get(e(0))))
      Files.delete(pending)
    }

    val staged = stage(df, root, journal, codec)
    // Write the pending manifest atomically (tmp + rename) BEFORE any
    // fragment rename — the manifest must never name fragments it
    // doesn't fully describe.
    val pendingTmp = Files.createTempFile(dir, s".batch-$batchId-", ".tmp")
    Files.writeString(pendingTmp,
      staged.map { case (f, tmp) => s"${f.path}\t$tmp" }.mkString("\n"))
    Files.move(pendingTmp, pending, StandardCopyOption.ATOMIC_MOVE)

    staged.foreach { case (frag, tmp) => commitFragment(frag, tmp) }
    Files.move(pending, committed, StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- fixed binary framing (§1.2 application/x-protobuf-fixed) ------

  /** Frame delimiter of the fixed framing: 4-byte magic + 4-byte
    * little-endian length precede each payload
    * (message/fixed_framing.go:26-148).
    */
  val FixedFramingMagic: Array[Byte] =
    Array(0x66.toByte, 0x33.toByte, 0x93.toByte, 0x36.toByte)

  final case class BinEnvelope(journal: String, begin: Long, end: Long, payload: Array[Byte])

  /** Append binary payloads with fixed framing. Offsets count
    * uncompressed bytes including the 8-byte frame headers.
    */
  def appendFramed(df: DataFrame, root: String, journal: String,
      codec: String = "gz", payloadCol: String = "payload"): Seq[Fragment] = {
    val spark = df.sparkSession
    import spark.implicits._
    val dir = Paths.get(root, journal)
    Files.createDirectories(dir)
    val spooled = df.select(col(payloadCol)).as[Array[Byte]].rdd
      .mapPartitionsWithIndex { (idx, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val tmp = Files.createTempFile(Paths.get(root),
            s".spool-${journal.replace('/', '_')}-$idx-", ".tmp")
          val digest = MessageDigest.getInstance("SHA-1")
          var len = 0L
          val fos = new FileOutputStream(tmp.toFile)
          val out = new BufferedOutputStream(wrapOutput(codec, fos), 1 << 16)
          val header = new Array[Byte](8)
          FixedFramingMagic.copyToArray(header)
          it.foreach { payload =>
            val n = payload.length
            header(4) = n.toByte; header(5) = (n >>> 8).toByte
            header(6) = (n >>> 16).toByte; header(7) = (n >>> 24).toByte
            digest.update(header); digest.update(payload)
            out.write(header); out.write(payload)
            len += 8L + n
          }
          out.close()
          val sha = digest.digest().map("%02x".format(_)).mkString
          Iterator((idx, len, sha, tmp.toString))
        }
      }.collect().sortBy(_._1)

    var begin = head(root, journal)
    spooled.map { case (_, len, sha, tmpPath) =>
      val frag = Fragment(journal, begin, begin + len, sha, codec,
        dir.resolve(f"$begin%016x-${begin + len}%016x-$sha.$codec").toString)
      Files.move(Paths.get(tmpPath), Paths.get(frag.path),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      begin = frag.end
      frag
    }.toSeq
  }

  /** Read fixed-framed binary envelopes with exact byte spans. */
  def readFramed(spark: SparkSession, root: String, journal: String): Dataset[BinEnvelope] = {
    import spark.implicits._
    val plan = coverSet(listFragments(root, journal))
    spark.createDataset(plan).flatMap { case (frag, readFrom) =>
      val raw = Files.newInputStream(Paths.get(frag.path))
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        wrapInput(frag.codec, raw), 1 << 16))
      in.skipNBytes(readFrom - frag.begin)
      var offset = readFrom
      new Iterator[BinEnvelope] {
        private var nextEnv: BinEnvelope = advance()
        private def advance(): BinEnvelope = {
          val header = new Array[Byte](8)
          val got = in.readNBytes(header, 0, 8)
          if (got == 0) null
          else if (got < 8 || !header.startsWith(FixedFramingMagic))
            throw new java.io.IOException(
              s"invalid fixed-framing header at $offset in ${frag.path}")
          else {
            val n = (header(4) & 0xff) | ((header(5) & 0xff) << 8) |
              ((header(6) & 0xff) << 16) | ((header(7) & 0xff) << 24)
            val payload = new Array[Byte](n)
            if (in.readNBytes(payload, 0, n) != n)
              throw new java.io.IOException(s"truncated frame at $offset in ${frag.path}")
            val begin = offset
            offset += 8L + n
            BinEnvelope(frag.journal, begin, offset, payload)
          }
        }
        override def hasNext: Boolean = nextEnv != null
        override def next(): BinEnvelope = {
          val e = nextEnv; nextEnv = advance(); e
        }
      }
    }
  }

  // ---- read path (S1-S4) ---------------------------------------------

  /** Iterate a fragment's records whose spans START in [from, to) — the
    * executor-side read of one planned slice (decompress, byte-skip to
    * the slice start, frame lines with exact offsets).
    *
    * Slice bounds need NOT be record-aligned: ownership is by first
    * byte. A reader landing mid-record discards the partial first line
    * (that record belongs to the slice holding its first byte), and a
    * record beginning before `to` is read to completion even when its
    * bytes extend past `to`. This is what makes byte-capped admission
    * control (maxBytesPerTrigger) safe — adjacent slices tile the
    * journal with no torn or duplicated records, the same
    * scan-to-next-delimiter rule the reference's framing readers apply
    * to arbitrary-offset reads.
    */
  def readFragmentSlice(frag: Fragment, from: Long, to: Long): Iterator[Envelope] = {
    val raw = Files.newInputStream(Paths.get(frag.path))
    val in = new java.io.BufferedInputStream(wrapInput(frag.codec, raw), 1 << 16)
    // Skip to from-1 first: the byte BEFORE the slice tells whether
    // `from` starts a record (previous byte is the '\n' terminator).
    val preTarget = (if (from > frag.begin) from - 1 else from) - frag.begin
    var skipped = 0L
    while (skipped < preTarget) {
      val n = in.skip(preTarget - skipped)
      if (n <= 0) throw new java.io.IOException(s"cannot skip to $from in ${frag.path}")
      skipped += n
    }
    var offset = from
    if (from > frag.begin) {
      val prev = in.read()
      if (prev == -1) return Iterator.empty
      if (prev != '\n') {
        // Mid-record: discard through the partial record's terminator.
        var b = in.read()
        while (b != -1 && b != '\n') { offset += 1; b = in.read() }
        if (b == -1) return Iterator.empty
        offset += 1 // count the discarded record's '\n'
      }
    }
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8"), 1 << 16)
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .map { line =>
        val begin = offset
        offset += line.getBytes("UTF-8").length + 1
        Envelope(frag.journal, begin, offset, line)
      }
      .takeWhile(_.begin < to)
  }

  /** Batch read: envelopes with exact uncompressed byte offsets.
    * Executors open fragment files directly; overlapping fragments are
    * resolved via the cover set and byte-skipped to the right offset.
    */
  def read(spark: SparkSession, root: String, journal: String): Dataset[Envelope] = {
    import spark.implicits._
    val plan = coverSet(listFragments(root, journal))
    spark.createDataset(plan).flatMap { case (frag, readFrom) =>
      readFragmentSlice(frag, readFrom, frag.end)
    }
  }

  /** Read all journals under `root` matching a label-selector-resolved
    * journal list (P3): union of per-journal reads.
    */
  def readAll(spark: SparkSession, root: String, journals: Seq[String]): Dataset[Envelope] =
    journals.map(read(spark, root, _)).reduce(_.unionAll(_))

  /** Streaming read: Spark's file source over the fragment index — new
    * fragments are discovered per micro-batch (the blocking-tail read as
    * repeated polls, S1). Payload-only envelopes (offset -1): exact
    * offsets in streaming mode arrive with a DSv2 MicroBatchStream in a
    * later round.
    */
  def readStream(spark: SparkSession, root: String, journal: String): DataFrame = {
    // This legacy path decodes via Hadoop's extension-registered codecs:
    // ".gz" is registered, plain text is fine, but ".zst"/".sz" are NOT
    // (snappy-framed has no Hadoop codec at all) — the text source would
    // stream compressed bytes as garbage lines with no error. The DSv2
    // `journal` format decodes every codec; use it for those journals.
    val codecs = listFragments(root, journal).map(_.codec).toSet
    val unsupported = codecs -- Set("gz", "none", "raw")
    require(unsupported.isEmpty,
      s"Journal.readStream cannot decode codec(s) $unsupported — read with " +
        """spark.readStream.format("journal") instead""")
    spark.readStream
      .option("pathGlobFilter", "*-*-*.*")
      .text(Paths.get(root, journal).toString)
      .select(
        lit(journal).as("journal"),
        lit(-1L).as("begin"), lit(-1L).as("end"),
        col("value").as("payload"))
  }
}
