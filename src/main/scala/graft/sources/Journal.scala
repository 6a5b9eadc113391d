package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.security.MessageDigest
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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
  * All fragment I/O goes through `org.apache.hadoop.fs.FileSystem`
  * resolved from the root's scheme — a plain POSIX path, `file:`,
  * `hdfs:`, `s3a:`, `gs:`, `abfs:` all work (the reference's pluggable
  * fragment stores, broker/stores/active_store.go:15-214 and the
  * s3/gcs/azure drivers). Commit-by-rename is atomic on HDFS/POSIX; on
  * object stores rename is copy+delete, but content-addressed names make
  * double-commits byte-identical, the same property the reference's
  * persister relies on.
  *
  * Framing is newline-delimited (ndjson / CSV lines — §1.2); payloads are
  * opaque strings here, decoded by `from_json`/`from_csv` downstream.
  *
  * Scale note: listing is driver-side (as Spark's FileStreamSource);
  * reads parallelize per fragment. Fragment target length (spool roll
  * policy) bounds fragment size so task granularity stays even. Listing
  * captures HDFS block hosts so the DSv2 scan can expose
  * `preferredLocations` (zone-aware read placement,
  * docs/brokers-concepts.rst:155-160).
  */
object Journal {

  final case class Fragment(
      journal: String, begin: Long, end: Long, sha1: String, codec: String,
      path: String, hosts: Seq[String] = Nil,
      // Store mod-time captured at listing time (0 for write-path
      // fragments that never round-tripped through a listing) — lets
      // time-based retention run off ONE listing instead of a
      // per-fragment getFileStatus RPC storm.
      modTimeMs: Long = 0L) {
    def name: String = f"$begin%016x-$end%016x-$sha1.$codec"
  }

  /** One framed record with its byte span. */
  final case class Envelope(journal: String, begin: Long, end: Long, payload: String)

  // ---- Hadoop FS plumbing --------------------------------------------

  /** Hadoop Configuration that survives closure serialization (the
    * stock class is not Serializable): executor-side fragment I/O must
    * see the session's `spark.hadoop.*` settings (object-store
    * credentials, endpoints), not a bare classpath default.
    */
  final class HadoopConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = {
      if (conf == null) conf = new Configuration()
      conf
    }
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Driver-side conf: the active session's Hadoop conf (which folds in
    * `spark.hadoop.*`) when one exists, else classpath defaults.
    */
  private[graft] def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def readString(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Validate a Hive-style path postfix ("key=value", or nested
    * "k1=v1/k2=v2") before any spool is created under it. The listing
    * attributes a file to a journal only when every interior directory
    * segment carries '=' (see listFragments), so a malformed postfix
    * would land fragments NO read ever returns AND no head derivation
    * ever sees — invisible dead bytes whose offsets the next append
    * reuses. An absolute or dot-leading segment would escape or hide
    * under the store root. Both write paths (batch stage and the DSv2
    * writer) call this on each distinct postfix value.
    */
  private[graft] def validatePostfix(p: String): Unit = {
    if (p.isEmpty) return
    require(!p.startsWith("/"),
      s"postfix must be a relative path, got '$p'")
    p.split('/').foreach { seg =>
      require(seg.nonEmpty && seg.contains('=') && !seg.startsWith("."),
        s"postfix segment '$seg' of '$p' is not Hive-style key=value: " +
          "fragments under it would be invisible to listings and their " +
          "offsets reused by the next append")
    }
  }

  /** Atomic string write: tmp file + rename, NO overwrite. Hadoop's
    * `FileSystem.rename` does not replace an existing destination on
    * HDFS/S3A (returns false; only POSIX local rename overwrites), so
    * every caller must target a fresh name: `.pending` manifests are
    * deleted by reconcile before a rewrite, and sweep horizons are
    * VERSIONED files (`...swept-<horizon>`) that are skipped when they
    * already exist — a delete-then-rename "overwrite" here would open
    * a window where the fence file is absent with markers already
    * swept, the silent-duplicate state the fence exists to refuse.
    */
  private def writeStringAtomic(fs: FileSystem, p: HPath, s: String): Unit = {
    val tmp = new HPath(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"rename $tmp -> $p failed " +
        "(destination may already exist: Hadoop rename never overwrites)")
    }
  }

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
    * before the bound. Fragment paths keep the caller's root form
    * (plain POSIX stays plain; URI roots stay URIs).
    */
  def listFragments(root: String, journal: String,
      modifiedAfterMs: Long = Long.MinValue): Vector[Fragment] =
    listFragments(Seq(root), journal, modifiedAfterMs)

  /** Multi-store listing (S4, the reference's WalkAllStores,
    * broker/fragment/index.go:224-257): one journal's fragments may
    * span several stores mid-migration; the union — cover-set-resolved
    * downstream — reads as one contiguous stream. Content addressing
    * dedupes a fragment present in two stores (same begin/end/sha).
    */
  def listFragments(roots: Seq[String], journal: String,
      modifiedAfterMs: Long): Vector[Fragment] = {
    val conf = hadoopConf
    roots.iterator.flatMap { root =>
      val dir = new HPath(root, journal)
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) Iterator.empty
      else {
        val qdirPath = fs.makeQualified(dir).toUri.getPath
        // Recursive walk: fragments may live under Hive-style
        // path-postfix subdirectories (date=…/hour=…,
        // protocol.proto:248-262). listFiles also surfaces block
        // locations in the same RPC — free locality hints.
        val it = fs.listFiles(dir, true)
        val buf = Vector.newBuilder[Fragment]
        while (it.hasNext) {
          val st = it.next()
          st.getPath.getName match {
            case FragmentRe(b, e, sha, codec)
                if st.getModificationTime >= modifiedAfterMs =>
              val rel = st.getPath.toUri.getPath
                .stripPrefix(qdirPath).stripPrefix("/")
              // Only Hive-style `key=value` postfix directories may sit
              // between the journal dir and its fragments: a NESTED
              // journal ("a/b/c" under "a/b") also lives inside this
              // subtree, and attributing its files to the parent would
              // interleave two journals' offset spaces in one index
              // (coverSet would then silently drop or mix bytes).
              val interior = rel.split('/').dropRight(1)
              if (interior.forall(_.contains('='))) {
                // Hosts as the FS reports them (HDFS: datanodes; local:
                // "localhost"; object stores: none or a placeholder) —
                // the same contract Spark's FilePartition surfaces.
                val hosts = st.getBlockLocations.toSeq
                  .flatMap(_.getHosts).distinct
                buf += Fragment(journal, java.lang.Long.parseUnsignedLong(b, 16),
                  java.lang.Long.parseUnsignedLong(e, 16), sha, codec,
                  new HPath(dir, rel).toString, hosts,
                  st.getModificationTime)
              }
            case _ =>
          }
        }
        buf.result()
      }
    }.toVector
      .distinctBy(f => (f.begin, f.end, f.sha1, f.codec))
      .sortBy(f => (f.begin, -f.end))
  }

  /** Hive-style `key=value` postfix directories between the journal
    * directory and a fragment file, parsed from its path (the
    * reference's path_postfix_template, protocol.proto:248-262). Empty
    * for top-level fragments.
    *
    * Parsing is SCOPED to the segments after the journal's own
    * directory: journal names and store roots may legally contain '='
    * (e.g. journal "events/region=us"), and treating those segments as
    * postfix values would mis-prune every fragment of the journal.
    */
  def postfixValues(f: Fragment): Map[String, String] = {
    val segs = new HPath(f.path).getParent.toString.split('/').toSeq
    val jSegs = f.journal.split('/').toSeq
    val at = segs.lastIndexOfSlice(jSegs)
    val tail = if (at >= 0) segs.drop(at + jSegs.length) else Seq.empty
    tail.iterator
      .filter(_.contains('='))
      .map { s => val i = s.indexOf('='); (s.substring(0, i), s.substring(i + 1)) }
      .toMap
  }

  /** Retention maintenance (journals prune, SURVEY §2.12): delete
    * fragments whose span ends at or below `keepFromOffset`. Returns
    * deleted fragments.
    */
  def prune(root: String, journal: String, keepFromOffset: Long): Vector[Fragment] =
    prune(Seq(root), journal, keepFromOffset)

  /** Multi-store prune: drop fragments wholly below `keepFromOffset`
    * across every store (mid-migration copies of one fragment delete
    * from each root that holds them).
    */
  def prune(roots: Seq[String], journal: String,
      keepFromOffset: Long): Vector[Fragment] =
    pruneListed(roots.flatMap(r => listFragments(r, journal)), keepFromOffset)

  /** Deletion half of [[prune]], over an already-fetched PER-ROOT
    * listing (no content dedup: a fragment duplicated across stores
    * mid-migration appears once per root and is deleted from each).
    * Split out so [[pruneOlderThan]] can reuse its horizon walk's
    * listings instead of paying a second LIST per store.
    */
  private def pruneListed(listed: Seq[Fragment],
      keepFromOffset: Long): Vector[Fragment] = {
    val conf = hadoopConf
    val drop = listed.filter(_.end <= keepFromOffset).toVector
    drop.foreach { f =>
      val p = new HPath(f.path)
      p.getFileSystem(conf).delete(p, false)
    }
    drop
  }

  /** Time-based retention (`fragment.retention`,
    * protocol.proto:229-246): delete fragments persisted before
    * `horizonMs`. The cut is resolved to an OFFSET first — the longest
    * cover-set prefix whose fragments all have mod-time < horizonMs —
    * then delegated to offset [[prune]]. Cutting strictly by mod-time
    * would punch holes behind a compacted (newer) fragment that covers
    * older offsets; the prefix rule keeps the surviving cover a
    * contiguous suffix, so reads simply begin at the first retained
    * offset, exactly as after an offset prune.
    */
  def pruneOlderThan(roots: Seq[String], journal: String,
      horizonMs: Long): Vector[Fragment] = {
    // ONE listing per store, reused for both halves: the deduplicated
    // cover walk below, and the per-root deletion (which must see a
    // fragment duplicated across stores once PER ROOT — deleting from
    // the deduplicated view would leave the sibling copy alive past
    // the retention horizon).
    val perRoot = roots.flatMap(r => listFragments(r, journal))
    val frags = perRoot.toVector
      .distinctBy(f => (f.begin, f.end, f.sha1, f.codec))
      .sortBy(f => (f.begin, -f.end))
    val cover = coverSet(frags)
    var keepFrom = 0L
    val it = cover.iterator
    var cut = false
    while (it.hasNext && !cut) {
      val (f, _) = it.next()
      if (f.modTimeMs < horizonMs) keepFrom = f.end else cut = true
    }
    if (keepFrom == 0L) Vector.empty
    else pruneListed(perRoot, keepFrom)
  }

  def pruneOlderThan(root: String, journal: String,
      horizonMs: Long): Vector[Fragment] =
    pruneOlderThan(Seq(root), journal, horizonMs)

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
    * idempotent (content-addressed name, overwrite-equivalent rename).
    *
    * Only fragments directly in the journal root are compacted:
    * Hive-postfix subdirectories partition by path, and merging across
    * them would undo that layout.
    */
  def compact(root: String, journal: String, targetBytes: Long,
      codec: String = "gz", deleteSources: Boolean = true): Vector[Fragment] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = hadoopConf
    val dir = new HPath(root, journal)
    val fs = dir.getFileSystem(conf)
    val rootFrags = listFragments(root, journal)
      .filter(f => new HPath(f.path).getParent == dir)
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
      val tmp = new HPath(new HPath(root),
        s".compact-${java.util.UUID.randomUUID}.tmp")
      val digest = MessageDigest.getInstance("SHA-1")
      val out = new BufferedOutputStream(wrapOutput(codec, fs.create(tmp, true)), 1 << 16)
      run.foreach { case (f, readFrom) =>
        val in = new BufferedInputStream(
          wrapInput(f.codec, fs.open(new HPath(f.path))), 1 << 16)
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
        new HPath(dir, f"$begin%016x-$end%016x-$sha.$codec").toString)
      commitFragment(frag, tmp.toString, conf)
      if (deleteSources) run.foreach { case (f, _) =>
        if (f.path != frag.path) fs.delete(new HPath(f.path), false)
      }
      frag
    }
  }

  /** Phase two of EVENTUAL-CONSISTENCY-safe compaction: delete
    * fragments whose every byte is shadowed by a single other fragment
    * that has been in the store at least `minCoverAgeMs`.
    *
    * The immediate-delete in [[compact]] assumes the store LISTS the
    * merged fragment as soon as it is renamed in. On a store whose
    * listings lag writes (the reference's fragment stores are
    * explicitly this class — eventually-consistent BLOB listings,
    * broker/fragment/stores.go:38-105), a reader inside the lag window
    * would see NEITHER the sources (deleted, physically gone) nor the
    * merged fragment (too fresh to list) — a hole in a committed span.
    * The safe sequence is `compact(deleteSources = false)` — readers
    * keep using the sources, the cover set resolves the overlap once
    * the merged fragment surfaces — then `sweepShadowed(minCoverAgeMs
    * = <the store's listing-consistency bound>)` on a later tick.
    * Conservative by construction: a fragment is only removed when one
    * covering fragment spans it entirely and that cover is old enough
    * that every lister already sees it.
    */
  def sweepShadowed(root: String, journal: String,
      minCoverAgeMs: Long = 0L): Vector[Fragment] = {
    val conf = hadoopConf
    val fs = new HPath(root, journal).getFileSystem(conf)
    val frags = listFragments(root, journal)
    val nowMs = System.currentTimeMillis()
    val oldCovers = frags.filter { g =>
      try nowMs - fs.getFileStatus(new HPath(g.path)).getModificationTime >=
        minCoverAgeMs
      catch { case _: java.io.IOException => false }
    }
    val swept = frags.filter { f =>
      oldCovers.exists(g => g.path != f.path &&
        g.begin <= f.begin && g.end >= f.end &&
        // Equal spans tie-break by path so two identical-span
        // fragments (distinct codecs) cannot delete each other.
        (g.begin < f.begin || g.end > f.end || g.path > f.path))
    }
    swept.foreach(f => fs.delete(new HPath(f.path), false))
    swept
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

  /** One shadowed byte range: `serving` is the cover-set fragment
    * whose bytes reads actually return over [from, until); `shadowed`
    * is a different-content fragment whose own bytes in that span are
    * therefore never served.
    */
  final case class ShadowedRange(serving: Fragment, shadowed: Fragment,
      from: Long, until: Long)

  /** Writer-race audit (round 9): for every fragment whose bytes are
    * partly or wholly served by a DIFFERENT fragment (overlap with a
    * distinct sha), the exact shadowed byte ranges and the fragment
    * serving each of them. The journal write contract is ONE appender
    * at a time per journal — the reference gets this by serializing
    * all appends through the journal's primary broker
    * (docs/brokers-concepts.rst "serializable appends that never
    * interleave"); this engine has no broker, so coordination is the
    * deployment's: distinct journals per writer, or an external lease.
    * A violation is NOT read-side corruption — [[coverSet]] resolves
    * overlaps deterministically, reads never interleave or duplicate
    * bytes — but the shadowed ranges' records silently never appear.
    * The per-range output names exactly what was lost and what serves
    * it, so remediation can re-append ONLY the shadowed records (a
    * fragment that merely crosses the cover boundary still serves its
    * tail — re-appending all of it would duplicate the served part).
    *
    * Reading the output: a FULL-containment entry (from == shadowed
    * .begin && until == shadowed.end) is either a lost same-head race
    * or a crashed compaction's not-yet-pruned source (compact's
    * documented crash window leaves the merged fragment covering its
    * sources — re-run compact to clear; the sha difference does NOT by
    * itself prove two appends there). A PARTIAL range is unambiguous:
    * only uncoordinated appends from diverged heads produce crossing
    * spans.
    */
  def overlappingFragments(roots: Seq[String],
      journal: String): Vector[ShadowedRange] = {
    // listFragments returns distinct (begin, end, sha, codec) already
    // sorted by (begin, -end) — coverSet's required order.
    val frags = listFragments(roots, journal, Long.MinValue)
    val cover = coverSet(frags) // (fragment, readFrom): serves [readFrom, end)
    val out = Vector.newBuilder[ShadowedRange]
    // Merge sweep: served ranges are disjoint ascending and frags are
    // begin-sorted, so each cover entry is visited O(1) amortized —
    // O(n + overlaps), not O(n²), on a 100 TB journal's listing.
    var ci = 0
    frags.foreach { f =>
      while (ci < cover.length && cover(ci)._1.end <= f.begin) ci += 1
      var i = ci
      var cont = true
      while (cont && i < cover.length) {
        val (c, readFrom) = cover(i)
        val servedFrom = math.max(readFrom, c.begin)
        if (servedFrom >= f.end) cont = false
        else {
          val from = math.max(f.begin, servedFrom)
          val until = math.min(f.end, c.end)
          if (from < until && c.sha1 != f.sha1)
            out += ShadowedRange(c, f, from, until)
          i += 1
        }
      }
    }
    out.result()
  }

  /** Close the writer-race loop: re-append ONLY the records lost to
    * the shadowed byte ranges named by [[overlappingFragments]] —
    * records are lost exactly when they BEGIN inside a shadowed range
    * (the cover-set reader emits a fragment's records from its served
    * slice onward and discards boundary straddlers, so a record
    * beginning in the shadowed prefix never surfaces, while one
    * beginning at or past the serving boundary is served from the
    * fragment itself; re-appending whole fragments would duplicate
    * that served tail). `readFragmentSlice`'s record-boundary
    * discipline gives this for free: a slice emits exactly the records
    * beginning in [from, until), reading the final straddler to its
    * terminator.
    *
    * The lost records are re-appended at the CURRENT head through the
    * normal append path (new offsets — the shadowed spans stay served
    * by the race's winner, as the audit documents). Distributed: one
    * narrow task per shadowed range; nothing is collected to the
    * driver. NOT idempotent — each run re-appends the ranges the audit
    * still names (the losing fragments remain in place as the audit
    * trail), so run once per incident, after the racing writers are
    * fenced. Reference analog: appends that "never interleave"
    * (docs/brokers-concepts.rst:14-22) — this op is the recovery the
    * reference's broker serialization makes unnecessary.
    */
  def repairShadowed(spark: SparkSession, roots: Seq[String],
      journal: String, codec: String = "gz"): Seq[Fragment] = {
    val ranges = overlappingFragments(roots, journal)
    if (ranges.isEmpty) return Nil
    import spark.implicits._
    val hc = new HadoopConf(hadoopConf)
    val j = journal
    val slices = ranges.map(r => (r.shadowed.path, r.shadowed.begin,
      r.shadowed.end, r.shadowed.sha1, r.shadowed.codec, r.from, r.until))
    val lost = spark.createDataset(slices)
      .repartition(math.min(slices.size,
        spark.sparkContext.defaultParallelism))
      .flatMap { case (path, b, e, sha, cdc, from, until) =>
        readFragmentSlice(Fragment(j, b, e, sha, cdc, path), from, until,
          hc.value).map(_.payload)
      }.toDF("payload")
    append(lost, roots.head, journal, codec, offsetRoots = roots)
  }

  /** Journal head: next append offset. */
  def head(root: String, journal: String): Long =
    head(Seq(root), journal)

  /** Multi-store head: next append offset across every store — the max
    * of the LISTED fragment ends and this JVM's OWN committed ends
    * (the head floor). The floor is what makes offset assignment safe
    * on an eventually-consistent store: a LIST that has not yet
    * surfaced the fragments this appender just committed would
    * otherwise re-derive a stale head, and the next append would mint
    * OVERLAPPING offsets — self-shadowing with no second writer
    * involved. The reference never hits this because the write head is
    * broker-process state, not store state (gazette_write_head,
    * broker/doc.go:24-27); the floor keeps the same invariant in the
    * appender JVM, which under the one-appender-per-journal contract
    * is exactly where the knowledge lives. Listing-only consumers
    * (readers, cover sets) are unaffected — they never call head().
    */
  def head(roots: Seq[String], journal: String): Long = {
    val listed = listFragments(roots, journal, Long.MinValue)
      .map(_.end).foldLeft(0L)(math.max)
    val floor = roots.iterator
      .map(r => headFloors.getOrDefault(floorKey(r, journal), 0L): Long)
      .foldLeft(0L)(math.max)
    math.max(listed, floor)
  }

  // This JVM's committed write heads, keyed by (root, journal): raised
  // at every driver-side commit point, never lowered — offsets are
  // forever-monotone in the reference too (pruning all fragments does
  // not rewind a broker's nextOffset). Deleting a journal's directory
  // under a live appender JVM and expecting offsets to restart is
  // outside the write contract; a fresh JVM starts from the listing.
  private val headFloors =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def floorKey(root: String, journal: String) = s"$root|$journal"
  private[graft] def raiseHeadFloor(root: String, journal: String,
      end: Long): Unit =
    headFloors.merge(floorKey(root, journal), end,
      (a, b) => if (a >= b) a else b)

  // ---- write path (S5-S7) --------------------------------------------

  /** Append a DataFrame's `payload` string column as framed fragments.
    * One spool per Spark partition (and per path postfix when
    * `postfixCol` is set — Hive-style `date=…/hour=…` subdirectories,
    * the reference's path_postfix_template); offsets assigned
    * contiguously from the current head; commit = atomic rename into the
    * fragment index. Returns committed fragments.
    *
    * `maxFragmentBytes` is the spool roll policy (the reference's
    * fragment `length` target, protocol.proto:214-218): a spool that
    * reaches the bound closes and a fresh one continues the partition,
    * so fragment size — and with it read-task granularity and
    * object-store PUT size — stays bounded no matter how large a write
    * partition is.
    *
    * `flushIntervalMs` is the TIME roll policy (the reference's
    * `fragment.flush_interval`, protocol.proto:229-246): a spool open
    * longer than the interval rolls at the next write, so a trickling
    * source's bytes reach the store on a clock instead of waiting for
    * size pressure (its closed tmp file is durable immediately; the
    * fragment becomes VISIBLE at this append's commit, as Spark's
    * batch commit protocol requires). 0 = size-only rolling.
    *
    * CONCURRENCY CONTRACT: one appender at a time per journal. The
    * reference serializes appends at the journal's primary broker;
    * this engine has no broker, so two simultaneous appenders would
    * both derive the same head and mint OVERLAPPING spans — reads stay
    * deterministic (cover-set resolution never interleaves bytes) but
    * the losing append is silently shadowed. Coordinate writers
    * externally (distinct journals, or a lease) and audit suspected
    * dual-writer windows with [[overlappingFragments]].
    */
  def append(df: DataFrame, root: String, journal: String,
      codec: String = "gz", payloadCol: String = "payload",
      postfixCol: Option[String] = None,
      maxFragmentBytes: Long = Long.MaxValue,
      offsetRoots: Seq[String] = Nil,
      maxAppendRate: Long = 0L,
      flushIntervalMs: Long = 0L): Seq[Fragment] = {
    val conf = hadoopConf
    val staged = stage(df, root, journal, codec, payloadCol, postfixCol,
      maxFragmentBytes, offsetRoots, maxAppendRate, flushIntervalMs)
    // A rename that throws mid-sequence leaves a valid committed prefix
    // (content-addressed, contiguous from the old head) — but the tmp
    // files of the remaining fragments would be orphaned with no
    // reclamation path. Delete them by name before rethrowing.
    var done = 0
    val out = try staged.map { case (frag, tmp) =>
      val f = commitFragment(frag, tmp, conf); done += 1; f
    } catch { case e: Throwable =>
      val fs = new HPath(root).getFileSystem(conf)
      staged.drop(done).foreach { case (_, tmp) =>
        try fs.delete(new HPath(tmp), false) catch { case _: Exception => () }
      }
      throw e
    }
    raiseHeadFloor(root, journal, out.iterator.map(_.end).foldLeft(0L)(math.max))
    graft.metrics.GraftMetrics.appendCommitted(journal, out.size,
      out.iterator.map(f => f.end - f.begin).sum,
      out.iterator.map(_.end).foldLeft(0L)(math.max))
    out
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
      postfixCol: Option[String] = None,
      maxFragmentBytes: Long = Long.MaxValue,
      offsetRoots: Seq[String] = Nil,
      maxAppendRate: Long = 0L,
      flushIntervalMs: Long = 0L): Seq[(Fragment, String)] = {
    require(maxFragmentBytes > 0, s"maxFragmentBytes must be positive")
    require(flushIntervalMs >= 0, s"flushIntervalMs may not be negative")
    val spark = df.sparkSession
    import spark.implicits._
    val conf = hadoopConf
    val dir = new HPath(root, journal)
    dir.getFileSystem(conf).mkdirs(dir)
    val hc = new HadoopConf(conf)

    // Executor side: spool each (partition, postfix) group to temp
    // files, rolling at maxFragmentBytes; report
    // (partitionId, postfix, rollSeq, uncompressedLength, sha1, tmp).
    val rows = postfixCol match {
      case Some(pc) => df.select(col(payloadCol), col(pc).cast("string")).as[(String, String)]
      case None     => df.select(col(payloadCol)).as[String].map(p => (p, ""))
    }
    val journalTag = journal.replace('/', '_')
    // maxAppendRate is the journal's AGGREGATE ceiling; resolve each
    // executor JVM's share on the driver (local[*]: the full rate) —
    // see AppendFlowControl.perJvmShare for the contract.
    val rateShare =
      graft.sources.v2.AppendFlowControl.perJvmShare(
        spark.sparkContext, maxAppendRate)
    val spooled = rows.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val fs = new HPath(root).getFileSystem(hc.value)
        def fresh(seq: Int) =
          new FragmentSpool(fs, root, s"$journalTag-$idx", codec, seq, journal)
        def finished(postfix: String, sp: FragmentSpool) = {
          val len = sp.len // read before finish() closes the stream
          (idx, postfix, sp.seq, len, sp.finish(), sp.tmp.toString)
        }
        val spools = scala.collection.mutable.LinkedHashMap.empty[String, FragmentSpool]
        val doneV = scala.collection.mutable.ArrayBuffer
          .empty[(Int, String, Int, Long, String, String)]
        // Per-journal JVM token bucket (max_append_rate,
        // protocol.proto:293-298); see AppendFlowControl for the
        // cluster-aggregate semantics.
        val flow = if (rateShare > 0)
          graft.sources.v2.AppendFlowControl.bucket(root, journal, rateShare)
        else null
        try {
          it.foreach { case (line, postfix) =>
            // Same validation as the DSv2 writer: a null payload would
            // string-concat into a literal "null" record (silent
            // corruption), a null postfix would NPE the driver's spool
            // sort — both deserve a clear error at the source.
            require(line != null, "journal append: null payload")
            require(postfix != null, "journal append: null postfix value")
            if (!spools.contains(postfix)) validatePostfix(postfix)
            var sp = spools.getOrElseUpdate(postfix, fresh(0))
            if (sp.shouldRoll(maxFragmentBytes, flushIntervalMs)) {
              doneV += finished(postfix, sp)
              sp = fresh(sp.seq + 1)
              spools(postfix) = sp
            }
            val bytes = line.getBytes("UTF-8")
            if (flow != null) flow.acquire(bytes.length + 1L)
            sp.write(bytes)
          }
          spools.iterator.foreach { case (postfix, sp) =>
            doneV += finished(postfix, sp) }
        } catch { case e: Throwable =>
          // A mid-partition failure (null-payload require, IO error)
          // must not strand open streams or orphan .spool-*.tmp files:
          // Spark retries the task with FRESH UUID-named spools, so
          // nothing reclaims this attempt's — the DSv2 writer's
          // abort() discipline, applied to the batch path. Cleanup is
          // best-effort; the original error is the one that matters.
          spools.valuesIterator.foreach { sp =>
            try sp.abortClose() catch { case _: Exception => () }
            try fs.delete(sp.tmp, false) catch { case _: Exception => () }
          }
          doneV.foreach { case (_, _, _, _, _, tmp) =>
            try fs.delete(new HPath(tmp), false)
            catch { case _: Exception => () }
          }
          throw e
        }
        doneV.iterator
      }
    val spooledArr =
      try spooled.collect()
      catch { case e: Throwable => sweepSpools(root, journalTag); throw e }
    val spooledSorted = spooledArr.sortBy(s => (s._1, s._2, s._3))

    // Driver side: prefix-sum offsets from the journal head in
    // (partition, postfix, rollSeq) order; the caller commits via
    // rename (content-addressed names make retries idempotent).
    // The head spans offsetRoots too: a multi-store journal (spec with
    // several stores, mid-migration) must not restart offsets at the
    // active store's local head — spans held in sibling stores would
    // collide and the cover set would silently drop one of them.
    // Past the collect the spool tmp names are known on the driver: a
    // failure in the head listing (or anything else before the caller
    // commits) deletes them directly instead of orphaning them.
    try planFragments(root, journal, codec,
      head((offsetRoots :+ root).distinct, journal),
      spooledSorted.map { case (_, postfix, _, len, sha, tmp) =>
        (postfix, len, sha, tmp) }.toSeq)
    catch { case e: Throwable =>
      val fs = new HPath(root).getFileSystem(conf)
      spooledArr.foreach { case (_, _, _, _, _, tmp) =>
        try fs.delete(new HPath(tmp), false) catch { case _: Exception => () }
      }
      throw e
    }
  }

  /** Best-effort reclamation of every spool tmp of one journal under
    * `root`, after a failed distributed spool JOB: succeeded tasks'
    * tmp names travel only in the lost job results, so the driver
    * cannot delete them by name. Safe because spool names are
    * journal-scoped (`.spool-<tag>-<part>-<uuid>.tmp`) and a journal
    * has one appender at a time (the flow-control model): the match
    * is exactly the failed append's files. The regex (not the glob
    * alone) keeps a sibling journal whose tag extends this one with a
    * '-' (journal "a/b-c" vs "a/b") out of the sweep.
    */
  private def sweepSpools(root: String, journalTag: String): Unit =
    try {
      val rp = new HPath(root)
      val fs = rp.getFileSystem(hadoopConf)
      val re = ("""\.spool-""" + java.util.regex.Pattern.quote(journalTag) +
        """-\d+-[0-9a-f]{8}-[0-9a-f-]{27}\.tmp""").r
      val sts = fs.globStatus(new HPath(rp, s".spool-$journalTag-*.tmp"))
      if (sts != null) sts.iterator
        .filter(st => re.pattern.matcher(st.getPath.getName).matches())
        .foreach(st => fs.delete(st.getPath, false))
    } catch { case _: Exception => () }

  /** Executor-side spool shared by the batch append ([[stage]]) and the
    * DSv2 writer — ONE definition of the record framing
    * ('\n'-terminated), SHA-1 accounting, codec wrapping, and the
    * size/time roll policy, so the two write paths cannot drift.
    */
  private[graft] final class FragmentSpool(fs: FileSystem, root: String,
      tag: String, codec: String, val seq: Int, journal: String = "") {
    val tmp = new HPath(new HPath(root),
      s".spool-$tag-${java.util.UUID.randomUUID}.tmp")
    private val digest = MessageDigest.getInstance("SHA-1")
    // Spool-time per-JVM record counter (task retries recount — the
    // per-process Prometheus semantics; commit-accurate totals are the
    // driver's append.bytes/fragments). Resolved once per spool.
    private val recordsCtr =
      if (journal.isEmpty) null
      else graft.metrics.GraftMetrics.counter(
        s"journal.${graft.metrics.GraftMetrics.journalTag(journal)}.append.records")
    var len = 0L
    private val bornNanos = System.nanoTime()
    private val out = new BufferedOutputStream(
      wrapOutput(codec, fs.create(tmp, true)), 1 << 16)
    /** Roll BEFORE the next write: size bound reached, or open past the
      * flush interval (fragment.flush_interval, protocol.proto:229-246). */
    def shouldRoll(maxFragmentBytes: Long, flushIntervalMs: Long): Boolean =
      len >= maxFragmentBytes || (flushIntervalMs > 0 && len > 0 &&
        System.nanoTime() - bornNanos >= flushIntervalMs * 1000000L)
    /** Append one framed record: payload bytes + '\n'. */
    def write(payload: Array[Byte]): Unit = {
      digest.update(payload); digest.update('\n'.toByte)
      out.write(payload); out.write('\n')
      len += payload.length + 1
      if (recordsCtr != null) recordsCtr.inc()
    }
    /** Close the stream and return the content SHA-1 hex. */
    def finish(): String = {
      out.close()
      digest.digest().map("%02x".format(_)).mkString
    }
    def abortClose(): Unit = out.close()
  }

  /** ONE definition of head-derived offset assignment + content-addressed
    * fragment naming, shared by [[stage]], [[commitSpooledEpoch]], and the
    * DSv2 batch commit — the naming/offset contract is the journal's core
    * invariant, and divergent copies would mint fragments the other
    * paths' listings misparse. `spooled` carries
    * (pathPostfix, uncompressedLength, sha1, spoolPath) in commit order.
    */
  private[graft] def planFragments(root: String, journal: String,
      codec: String, begin0: Long,
      spooled: Seq[(String, Long, String, String)]): Seq[(Fragment, String)] = {
    val dir = new HPath(root, journal)
    var begin = begin0
    spooled.map { case (postfix, len, sha, tmpPath) =>
      val sub = if (postfix.isEmpty) dir else new HPath(dir, postfix)
      val frag = Fragment(journal, begin, begin + len, sha, codec,
        new HPath(sub, f"$begin%016x-${begin + len}%016x-$sha.$codec").toString)
      begin = frag.end
      (frag, tmpPath)
    }
  }

  /** Commit one staged fragment: atomic rename of its spool into the
    * fragment index (the spool→persist step, S7). Content addressing
    * makes a lost rename race benign: an existing destination holds
    * byte-identical content, so the spool is simply discarded.
    */
  private[graft] def commitFragment(frag: Fragment, tmpPath: String,
      conf: Configuration = hadoopConf): Fragment = {
    val dst = new HPath(frag.path)
    val src = new HPath(tmpPath)
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    if (fs.exists(dst)) fs.delete(src, false)
    else if (!fs.rename(src, dst)) {
      if (fs.exists(dst)) fs.delete(src, false)
      else throw new java.io.IOException(s"rename $src -> $dst failed")
    }
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
    val conf = hadoopConf
    val dir = new HPath(root, journal)
    val fs = dir.getFileSystem(conf)
    val committed = new HPath(dir, s".batch-$batchId.committed")
    if (fs.exists(committed)) return
    assertNotSwept(fs, dir, "", batchId)
    fs.mkdirs(dir)

    val pending = new HPath(dir, s".batch-$batchId.pending")
    if (fs.exists(pending) && reconcilePending(fs, pending, committed, journal, codec, conf))
      return

    val staged = stage(df, root, journal, codec)
    commitManifested(fs, pending, committed, staged, conf)
    raiseHeadFloor(root, journal,
      staged.iterator.map(_._1.end).foldLeft(0L)(math.max))
    sweepMarkers(fs, dir, "", batchId)
  }

  /** One-pass multi-journal micro-batch sink (r12, guide §1.2 step 1):
    * spool EVERY route's fragments in a SINGLE distributed pass over
    * the batch — each row goes to the first route whose predicate
    * matches — then commit each journal independently with
    * [[batchSink]]'s exact two-phase manifest + `.committed`
    * idempotence-marker protocol.
    *
    * Why: the foreachBatch fan-out shape (one triaged frame → N
    * per-kind journals) previously persisted the batch and ran N
    * sequential batchSink jobs, each re-filtering the cache — N job
    * launches and N cache passes to partition one small frame, and at
    * a 4-batch replay that job-launch floor WAS the queries' cost
    * (measured: addBatch 0.40-0.54 s/batch, of which the engine's own
    * checkpoint I/O is only ~0.13 s). Here the batch is read once (the
    * triage projection runs once per record — no persist needed at
    * all) and every route's spool is written in that same pass; only
    * the per-journal driver-side commits remain. One job per batch is
    * the minimum passes this fan-out can do, at any scale.
    *
    * Identical bytes per journal: a route's spool receives exactly the
    * rows its filter form kept, in the same (partition, row) order,
    * and offsets are assigned per journal from its own head in
    * partition order — fragment names, content, and SHAs match the
    * sequential batchSink calls bit-for-bit (JournalRoutedSpec pins
    * this). Routes are expected DISJOINT: a row matching several
    * predicates lands only in the first (sequential filters would
    * duplicate it into both journals; no caller routes overlapping
    * predicates). Rows matching no route are dropped, exactly as no
    * filter would keep them.
    *
    * Exactly-once per (journal, batch) is unchanged: each journal
    * keeps its own `.pending` manifest and `.committed` marker. A
    * retried batch re-runs the spool pass, then per journal either
    * drops the fresh spools (marker present — content-addressed
    * duplicates of what the index already holds), reconciles a
    * crashed `.pending`, or commits — exactly the serial calls'
    * recovery matrix.
    */
  def batchSinkRouted(root: String,
      routes: Seq[(String, org.apache.spark.sql.Column)],
      df: DataFrame, batchId: Long, codec: String = "gz",
      payloadCol: String = "payload"): Unit = {
    require(routes.nonEmpty, "batchSinkRouted: no routes")
    require(routes.map(_._1).distinct.size == routes.size,
      s"batchSinkRouted: duplicate journal in ${routes.map(_._1).mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val conf = hadoopConf
    new HPath(root).getFileSystem(conf).mkdirs(new HPath(root))
    val hc = new HadoopConf(conf)
    // First matching predicate wins; unmatched rows drop. A NULL
    // predicate result is no-match, same as a filter.
    val routeIdx = routes.zipWithIndex
      .foldRight(lit(null).cast("int")) { case (((_, pred), i), acc) =>
        when(pred, lit(i)).otherwise(acc)
      }
    val journals = routes.map(_._1).toArray
    val tagOf = journals.map(_.replace('/', '_'))
    // NO Filter on the route: a Filter referencing the route column
    // gets pushed below the batch's triage projection and re-evaluates
    // the (expensive) triage expressions once in the Filter and again
    // in the Project — guide §4.4's duplicated-UDF trap, measured here
    // as 2-3× the per-batch cost on the guard/extract gates. Unmatched
    // rows are dropped inside the spool closure instead, so the triage
    // runs exactly once per row in the single Project below.
    val rows = df.select(col(payloadCol).cast("string"), routeIdx.as("__route"))
      .as[(String, Option[Int])]
    // Executor side: one FragmentSpool per route per partition — the
    // same framing/SHA/roll kernel and the same `.spool-<tag>-<part>-
    // <uuid>.tmp` naming as [[stage]] (sweepSpools reclaims either),
    // with stage's abort discipline on mid-partition failure.
    val spooled = rows.rdd.mapPartitionsWithIndex { (idx, it) =>
      val fs = new HPath(root).getFileSystem(hc.value)
      val spools = new Array[FragmentSpool](journals.length)
      val done = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Int, Long, String, String)]
      try {
        it.foreach {
          case (line, Some(r)) =>
            // Same validation as stage(): only ROUTED rows need a
            // payload (a dropped row was never written before either).
            require(line != null, "journal append: null payload")
            var sp = spools(r)
            if (sp == null) {
              sp = new FragmentSpool(fs, root, s"${tagOf(r)}-$idx", codec,
                seq = 0, journal = journals(r))
              spools(r) = sp
            }
            sp.write(line.getBytes("UTF-8"))
          case (_, None) => () // no route matched: drop, as no filter kept it
        }
        var r = 0
        while (r < spools.length) {
          val sp = spools(r)
          if (sp != null) {
            val len = sp.len // read before finish() closes the stream
            done += ((idx, r, sp.seq, len, sp.finish(), sp.tmp.toString))
          }
          r += 1
        }
      } catch { case e: Throwable =>
        spools.foreach { sp =>
          if (sp != null) {
            try sp.abortClose() catch { case _: Exception => () }
            try fs.delete(sp.tmp, false) catch { case _: Exception => () }
          }
        }
        done.foreach { case (_, _, _, _, _, tmp) =>
          try fs.delete(new HPath(tmp), false) catch { case _: Exception => () }
        }
        throw e
      }
      done.iterator
    }
    val spooledArr =
      try spooled.collect()
      catch { case e: Throwable =>
        tagOf.foreach(t => sweepSpools(root, t))
        throw e
      }
    try {
      val byRoute = spooledArr.groupBy(_._2)
      journals.zipWithIndex.foreach { case (journal, r) =>
        val mine = byRoute.getOrElse(r, Array.empty[(Int, Int, Int, Long, String, String)])
          .sortBy(s => (s._1, s._3))
          .map { case (_, _, _, len, sha, tmp) => ("", len, sha, tmp) }
          .toSeq
        commitBatchSpooled(root, journal, batchId, mine, codec, conf)
      }
    } catch { case e: Throwable =>
      // Spools not yet renamed into an index are orphans — reclaim by
      // name before rethrowing (consumed ones are already gone; a
      // delete of a missing path is a no-op).
      val fs = new HPath(root).getFileSystem(conf)
      spooledArr.foreach { case (_, _, _, _, _, tmp) =>
        try fs.delete(new HPath(tmp), false) catch { case _: Exception => () }
      }
      throw e
    }
  }

  /** [[batchSink]]'s commit protocol over an ALREADY-SPOOLED batch
    * (the one-pass routed sink): same `.committed` early-return, same
    * swept-horizon fence, same `.pending` reconcile, same
    * manifest-then-rename commit and marker sweep — sequenced over
    * spools that exist before the first marker check, so an
    * already-committed retry deletes them instead of re-staging.
    */
  private def commitBatchSpooled(root: String, journal: String,
      batchId: Long, spooled: Seq[(String, Long, String, String)],
      codec: String, conf: Configuration): Unit = {
    val dir = new HPath(root, journal)
    val fs = dir.getFileSystem(conf)
    def dropSpools(): Unit = spooled.foreach { case (_, _, _, t) =>
      try fs.delete(new HPath(t), false) catch { case _: Exception => () }
    }
    val committed = new HPath(dir, s".batch-$batchId.committed")
    if (fs.exists(committed)) { dropSpools(); return }
    try assertNotSwept(fs, dir, "", batchId)
    catch { case e: Throwable => dropSpools(); throw e }
    fs.mkdirs(dir)
    val pending = new HPath(dir, s".batch-$batchId.pending")
    if (fs.exists(pending) &&
        reconcilePending(fs, pending, committed, journal, codec, conf)) {
      dropSpools(); return
    }
    val staged = planFragments(root, journal, codec, head(root, journal), spooled)
    commitManifested(fs, pending, committed, staged, conf)
    raiseHeadFloor(root, journal,
      staged.iterator.map(_._1.end).foldLeft(0L)(math.max))
    sweepMarkers(fs, dir, "", batchId)
  }

  /** How many epochs of `.batch-*.committed` idempotence markers stay
    * behind the newest one. Spark's micro-batch engine replays at most
    * the batches not yet committed to its OWN checkpoint — always the
    * newest few — so markers this far back are dead weight; without a
    * sweep a short-trigger streaming sink grows the journal directory
    * (and every reader's per-trigger LIST) without bound. Rewinding a
    * checkpoint further back than this re-appends those batches.
    */
  private val MarkerRetention = 64L

  /** Delete `.batch-<prefix><id>.committed` markers with
    * id < current − [[MarkerRetention]]; amortized to every 16th id.
    * Non-numeric ids after the prefix (other queries' epoch tags in the
    * same directory) are never touched.
    */
  private def sweepMarkers(fs: FileSystem, dir: HPath, prefix: String,
      current: Long): Unit = {
    if (current % 16L != 0L) return
    val horizon = current - MarkerRetention
    if (horizon <= 0) return // batch ids are non-negative: nothing to sweep
    val sts = fs.globStatus(new HPath(dir, s".batch-$prefix*.committed"))
    if (sts == null) return
    // Record the sweep horizon BEFORE deleting any marker, so a rewound
    // checkpoint can be REFUSED instead of silently duplicated (see
    // assertNotSwept). The order matters: horizon-then-delete means a
    // crash mid-sweep leaves swept markers FENCED (over-strict is safe —
    // a replay whose marker still exists early-returns on the
    // fs.exists(committed) check before the fence runs); the reverse
    // order would leave deleted markers UNfenced, re-opening the exact
    // silent-duplicate window the fence exists to close.
    //
    // Horizons are VERSIONED files (`.batch-<prefix>swept-<horizon>`)
    // that are written once and never rewritten — the fence reads the
    // MAX over all of them — so no step here ever deletes-then-renames
    // an existing fence file (Hadoop rename can't overwrite, and an
    // "overwrite" emulation would open a fence-absent window with
    // markers already swept). Aged horizon files are garbage-collected
    // only AFTER the new horizon is durable; a crash leaves extras
    // behind, which the max() makes harmless.
    val hp = new HPath(dir, s".batch-${prefix}swept-$horizon")
    if (!fs.exists(hp)) // idempotent re-sweep: the file is complete by construction
      writeStringAtomic(fs, hp, horizon.toString)
    // Keep the fence's in-process fast path current (it never re-lists
    // after first touch); merge, don't overwrite, in case of an
    // out-of-order sweep call.
    sweptHorizons.merge((dir.toString, prefix), horizon,
      (a, b) => if (a.longValue >= b.longValue) a else b)
    horizonFiles(fs, dir, prefix).foreach { case (p, h) =>
      if (h < horizon) fs.delete(p, false)
    }
    sts.foreach { st =>
      val name = st.getPath.getName
        .stripPrefix(s".batch-$prefix").stripSuffix(".committed")
      val id = try java.lang.Long.parseLong(name)
        catch { case _: NumberFormatException => Long.MaxValue }
      if (id < horizon) fs.delete(st.getPath, false)
    }
  }

  /** Per-process cache of the max swept horizon per (dir, prefix): the
    * fence runs on EVERY batch commit, and the glob behind it is a full
    * client-side directory listing (paged LIST on S3A) — per-batch
    * that's real money on a journal directory with many fragments.
    * Under the sink's single-writer contract the horizon only advances
    * through this process's own [[sweepMarkers]] (which updates the
    * cache), so one listing at first touch suffices. Removing horizon
    * files to override a refused rewind requires restarting the writer
    * (the error message says so).
    */
  private val sweptHorizons =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** All swept-horizon files for `prefix` in `dir`, as (path, horizon):
    * the versioned form `.batch-<prefix>swept-<h>` (name carries the
    * horizon) and the legacy unversioned `.batch-<prefix>swept` (content
    * carries it). Files matching neither shape — e.g. another query's
    * tag caught by a shorter prefix's glob — are ignored.
    */
  private def horizonFiles(fs: FileSystem, dir: HPath,
      prefix: String): Seq[(HPath, Long)] = {
    val sts = fs.globStatus(new HPath(dir, s".batch-${prefix}swept*"))
    if (sts == null) Nil
    else sts.toSeq.flatMap { st =>
      val rest = st.getPath.getName.stripPrefix(s".batch-${prefix}swept")
      val h =
        if (rest.startsWith("-"))
          try Some(rest.substring(1).toLong)
          catch { case _: NumberFormatException => None }
        else if (rest.isEmpty)
          try Some(readString(fs, st.getPath).trim.toLong)
          catch { case _: Exception => None }
        else None
      h.map(st.getPath -> _)
    }
  }

  /** Fail loudly when batch `id` is below the swept-marker horizon: its
    * `.committed` idempotence marker may already have been deleted by
    * [[sweepMarkers]], so "marker absent" no longer proves "never
    * appended" — proceeding would silently re-append the batch as
    * duplicate records. Rewinds within [[MarkerRetention]] of the
    * newest batch (all Spark's micro-batch engine ever replays) never
    * trip this.
    */
  private def assertNotSwept(fs: FileSystem, dir: HPath, prefix: String,
      id: Long): Unit = {
    val key = (dir.toString, prefix)
    val horizon = Option(sweptHorizons.get(key)).map(_.longValue).getOrElse {
      val h = horizonFiles(fs, dir, prefix).map(_._2)
        .foldLeft(0L)(math.max)
      sweptHorizons.put(key, h)
      h
    }
    if (horizon > 0 && id < horizon) throw new IllegalStateException(
      s"batch $id of $dir is below the swept idempotence horizon " +
      s"$horizon: markers more than $MarkerRetention behind the newest " +
      "batch are deleted, so this batch cannot be proven un-appended " +
      "and a re-append would duplicate its records. Restore a " +
      "checkpoint within the retention window, or deduplicate and " +
      s"remove the .batch-${prefix}swept* horizon files to override " +
      "(then restart this writer: the horizon is cached in-process).")
  }

  /** Reconcile a crashed attempt's `.pending` manifest. Each line is
    * "fragPath\tspoolPath": finish renames where the spool survived;
    * when every fragment is then present, finalize the committed marker
    * and return true (batch fully landed). Otherwise roll the partial
    * batch back — delete its fragments and the manifest, restoring the
    * head — and return false so the caller re-appends.
    */
  private def reconcilePending(fs: FileSystem, pending: HPath, committed: HPath,
      journal: String, codec: String, conf: Configuration): Boolean = {
    val entries = readString(fs, pending).split('\n')
      .filter(_.nonEmpty).map(_.split('\t')).toVector
    entries.foreach { case Array(fragPath, tmpPath) =>
      if (!fs.exists(new HPath(fragPath)) && fs.exists(new HPath(tmpPath)))
        commitFragment(Fragment(journal, 0, 0, "", codec, fragPath), tmpPath, conf)
    }
    if (entries.forall(e => fs.exists(new HPath(e(0))))) {
      if (!fs.rename(pending, committed))
        throw new java.io.IOException(s"rename $pending -> $committed failed")
      true
    } else {
      entries.foreach(e => fs.delete(new HPath(e(0)), false))
      fs.delete(pending, false)
      false
    }
  }

  /** Manifest-then-rename commit of already-staged fragments: write the
    * pending manifest atomically BEFORE any fragment rename — the
    * manifest must never name fragments it doesn't fully describe —
    * then rename every spool into the index and finalize the marker.
    */
  private def commitManifested(fs: FileSystem, pending: HPath, committed: HPath,
      staged: Seq[(Fragment, String)], conf: Configuration): Unit = {
    writeStringAtomic(fs, pending,
      staged.map { case (f, tmp) => s"${f.path}\t$tmp" }.mkString("\n"))
    staged.foreach { case (frag, tmp) => commitFragment(frag, tmp, conf) }
    if (!fs.rename(pending, committed))
      throw new java.io.IOException(s"rename $pending -> $committed failed")
    if (staged.nonEmpty)
      graft.metrics.GraftMetrics.appendCommitted(staged.head._1.journal,
        staged.size, staged.iterator.map { case (f, _) => f.end - f.begin }.sum,
        staged.iterator.map(_._1.end).max)
  }

  /** Exactly-once commit of executor-spooled fragments for one epoch of
    * a DSv2 streaming write (the `journal` sink's analog of
    * [[batchSink]], sharing its manifest fencing). `spooled` carries one
    * (pathPostfix, uncompressedLength, sha1, spoolPath) per non-empty
    * (partition, postfix) group, in (partition, postfix) order; offsets
    * are assigned here, at commit time, so a rolled-back predecessor
    * re-derives the head correctly. Returns committed fragments (empty
    * when the epoch was already committed — duplicates of a retried
    * epoch are dropped and their spools deleted).
    */
  private[graft] def commitSpooledEpoch(root: String, journal: String,
      epochTag: String, spooled: Seq[(String, Long, String, String)],
      codec: String, offsetRoots: Seq[String] = Nil): Seq[Fragment] = {
    val conf = hadoopConf
    val dir = new HPath(root, journal)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val committed = new HPath(dir, s".batch-$epochTag.committed")
    val pending = new HPath(dir, s".batch-$epochTag.pending")
    def dropSpools(): Unit =
      spooled.foreach { case (_, _, _, t) => fs.delete(new HPath(t), false) }

    if (fs.exists(committed)) { dropSpools(); return Nil }
    if (fs.exists(pending) && reconcilePending(fs, pending, committed, journal, codec, conf)) {
      dropSpools(); return Nil
    }
    // Same rewind fence as batchSink: an epoch below this query's swept
    // horizon cannot be proven un-committed.
    locally {
      val cut0 = epochTag.lastIndexOf('-')
      if (cut0 >= 0)
        try assertNotSwept(fs, dir, epochTag.substring(0, cut0 + 1),
          java.lang.Long.parseLong(epochTag.substring(cut0 + 1)))
        catch {
          case _: NumberFormatException => ()
          // The fence refuses the epoch permanently — reclaim its
          // executor-spooled .spool-*.tmp files before propagating, as
          // append/stage do on their failure seams.
          case e: IllegalStateException => dropSpools(); throw e
        }
    }
    val staged = planFragments(root, journal, codec,
      head((offsetRoots :+ root).distinct, journal), spooled)
    commitManifested(fs, pending, committed, staged, conf)
    raiseHeadFloor(root, journal,
      staged.iterator.map(_._1.end).foldLeft(0L)(math.max))
    // Epoch tags are "<queryId>-<epochId>": sweep THIS query's aged
    // markers (the per-query prefix keeps other writers' tags safe).
    val cut = epochTag.lastIndexOf('-')
    if (cut >= 0) {
      try sweepMarkers(fs, dir, epochTag.substring(0, cut + 1),
        java.lang.Long.parseLong(epochTag.substring(cut + 1)))
      catch { case _: NumberFormatException => () }
    }
    staged.map(_._1)
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
    val conf = hadoopConf
    val dir = new HPath(root, journal)
    dir.getFileSystem(conf).mkdirs(dir)
    val hc = new HadoopConf(conf)
    val journalTag = journal.replace('/', '_')
    val spooled = df.select(col(payloadCol)).as[Array[Byte]].rdd
      .mapPartitionsWithIndex { (idx, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val fs = new HPath(root).getFileSystem(hc.value)
          val tmp = new HPath(new HPath(root),
            s".spool-$journalTag-$idx-${java.util.UUID.randomUUID}.tmp")
          val digest = MessageDigest.getInstance("SHA-1")
          var len = 0L
          val out = new BufferedOutputStream(
            wrapOutput(codec, fs.create(tmp, true)), 1 << 16)
          val header = new Array[Byte](8)
          FixedFramingMagic.copyToArray(header)
          try {
            it.foreach { payload =>
              val n = payload.length
              header(4) = n.toByte; header(5) = (n >>> 8).toByte
              header(6) = (n >>> 16).toByte; header(7) = (n >>> 24).toByte
              digest.update(header); digest.update(payload)
              out.write(header); out.write(payload)
              len += 8L + n
            }
            out.close()
          } catch { case e: Throwable =>
            // Mirror stage()'s failure discipline: retries open FRESH
            // UUID-named tmps, so this attempt's must not outlive it.
            try out.close() catch { case _: Exception => () }
            try fs.delete(tmp, false) catch { case _: Exception => () }
            throw e
          }
          val sha = digest.digest().map("%02x".format(_)).mkString
          Iterator((idx, len, sha, tmp.toString))
        }
      }
    val spooledArr =
      try spooled.collect()
      catch { case e: Throwable => sweepSpools(root, journalTag); throw e }
    val spooledSorted = spooledArr.sortBy(_._1)

    var begin = head(root, journal)
    val out = spooledSorted.map { case (_, len, sha, tmpPath) =>
      val frag = Fragment(journal, begin, begin + len, sha, codec,
        new HPath(dir, f"$begin%016x-${begin + len}%016x-$sha.$codec").toString)
      commitFragment(frag, tmpPath, conf)
      begin = frag.end
      frag
    }.toSeq
    raiseHeadFloor(root, journal, out.iterator.map(_.end).foldLeft(0L)(math.max))
    graft.metrics.GraftMetrics.appendCommitted(journal, out.size,
      out.iterator.map(f => f.end - f.begin).sum,
      out.iterator.map(_.end).foldLeft(0L)(math.max))
    out
  }

  /** Read fixed-framed binary envelopes with exact byte spans. */
  def readFramed(spark: SparkSession, root: String, journal: String): Dataset[BinEnvelope] = {
    import spark.implicits._
    val plan = coverSet(listFragments(root, journal))
    val hc = new HadoopConf(hadoopConf)
    spark.createDataset(plan).flatMap { case (frag, readFrom) =>
      val p = new HPath(frag.path)
      val raw = p.getFileSystem(hc.value).open(p)
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        wrapInput(frag.codec, raw), 1 << 16))
      in.skipNBytes(readFrom - frag.begin)
      var offset = readFrom
      new Iterator[BinEnvelope] {
        private var nextEnv: BinEnvelope = advance()
        private def advance(): BinEnvelope = {
          val header = new Array[Byte](8)
          val got = in.readNBytes(header, 0, 8)
          if (got == 0) { in.close(); null } // EOF: release the FS stream
          else if (got < 8 || !header.startsWith(FixedFramingMagic)) {
            in.close()
            throw new java.io.IOException(
              s"invalid fixed-framing header at $offset in ${frag.path}")
          } else {
            val n = (header(4) & 0xff) | ((header(5) & 0xff) << 8) |
              ((header(6) & 0xff) << 16) | ((header(7) & 0xff) << 24)
            val payload = new Array[Byte](n)
            if (in.readNBytes(payload, 0, n) != n) {
              in.close()
              throw new java.io.IOException(s"truncated frame at $offset in ${frag.path}")
            }
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
  def readFragmentSlice(frag: Fragment, from: Long, to: Long,
      conf: Configuration = hadoopConf): Iterator[Envelope] = {
    val p = new HPath(frag.path)
    val raw = p.getFileSystem(conf).open(p)
    val in = new java.io.BufferedInputStream(wrapInput(frag.codec, raw), 1 << 16)
    // Skip to from-1 first: the byte BEFORE the slice tells whether
    // `from` starts a record (previous byte is the '\n' terminator).
    val preTarget = (if (from > frag.begin) from - 1 else from) - frag.begin
    var skipped = 0L
    while (skipped < preTarget) {
      val n = try in.skip(preTarget - skipped) catch {
        case e: Throwable => in.close(); throw e
      }
      if (n <= 0) {
        in.close()
        throw new java.io.IOException(s"cannot skip to $from in ${frag.path}")
      }
      skipped += n
    }
    var offset = from
    if (from > frag.begin) {
      val prev = in.read()
      if (prev == -1) { in.close(); return Iterator.empty }
      if (prev != '\n') {
        // Mid-record: discard through the partial record's terminator.
        var b = in.read()
        while (b != -1 && b != '\n') { offset += 1; b = in.read() }
        if (b == -1) { in.close(); return Iterator.empty }
        offset += 1 // count the discarded record's '\n'
      }
    }
    // Strict '\n'-only framing with direct byte accounting — NOT
    // BufferedReader.readLine, which also treats '\r'/'\r\n' as
    // terminators: a payload ending in '\r' would then consume two
    // terminator bytes while the offset advanced one, silently
    // shifting every later begin/end in the fragment (offsets are the
    // streaming checkpoint currency). Counting the raw bytes also
    // avoids re-encoding each line to measure it. The iterator closes
    // the stream itself on EVERY exit — end-of-fragment, the `to`
    // bound (admission-controlled slices stop mid-file), or a torn
    // unterminated tail (never committed, so never emitted).
    val buf = new java.io.ByteArrayOutputStream(256)
    val bound = to // inside Iterator, bare `to` resolves to IterableOnceOps.to
    // Per-JVM read counters (consumer read_messages/read_bytes analog,
    // consumer/interfaces.go:318-327): resolved once per slice, LongAdder
    // inc per record — noise next to the parse itself.
    val mTag = graft.metrics.GraftMetrics.journalTag(frag.journal)
    val mRecs = graft.metrics.GraftMetrics.counter(s"journal.$mTag.read.records")
    val mBytes = graft.metrics.GraftMetrics.counter(s"journal.$mTag.read.bytes")
    new Iterator[Envelope] with java.io.Closeable {
      private var nextEnv: Envelope = _
      private var done = false
      private var fetched = false
      override def close(): Unit = if (!done) { done = true; in.close() }
      private def fetch(): Unit = {
        if (done || fetched) return
        if (offset >= bound) { close(); return }
        buf.reset()
        var b = in.read()
        if (b == -1) { close(); return }
        while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
        if (b == -1) { close(); return } // torn tail: never committed
        val begin = offset
        offset += buf.size() + 1
        nextEnv = Envelope(frag.journal, begin, offset,
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
        mRecs.inc(); mBytes.inc(offset - begin)
        fetched = true
      }
      override def hasNext: Boolean = { fetch(); fetched }
      override def next(): Envelope = {
        fetch()
        if (!fetched) throw new NoSuchElementException
        fetched = false
        nextEnv
      }
    }
  }

  /** Batch read: envelopes with exact uncompressed byte offsets.
    * Executors open fragment files directly; overlapping fragments are
    * resolved via the cover set and byte-skipped to the right offset.
    */
  def read(spark: SparkSession, root: String, journal: String): Dataset[Envelope] =
    read(spark, Seq(root), journal)

  /** Multi-store batch read: the cover set over the union listing
    * stitches fragments from every store into one contiguous stream.
    */
  def read(spark: SparkSession, roots: Seq[String], journal: String): Dataset[Envelope] = {
    import spark.implicits._
    val plan = coverSet(listFragments(roots, journal, Long.MinValue))
    val hc = new HadoopConf(hadoopConf)
    spark.createDataset(plan).flatMap { case (frag, readFrom) =>
      readFragmentSlice(frag, readFrom, frag.end, hc.value)
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
    // The require above can only see fragments that exist NOW; a writer
    // switching to zst/sz mid-query would otherwise feed the text
    // source compressed bytes as garbage lines. The glob pins the query
    // to the codecs it can decode — a later unsupported fragment is
    // EXCLUDED (visible as a head/count gap) rather than silently
    // garbled. The DSv2 `journal` source decodes per-fragment codecs
    // and has neither limitation.
    spark.readStream
      .option("pathGlobFilter", "*-*-*.{gz,none,raw}")
      .text(new HPath(root, journal).toString)
      .select(
        lit(journal).as("journal"),
        lit(-1L).as("begin"), lit(-1L).as("end"),
        col("value").as("payload"))
  }
}
