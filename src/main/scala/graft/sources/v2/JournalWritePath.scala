package graft.sources.v2

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import graft.sources.Journal
import graft.sources.Journal.{Fragment, HadoopConf}

/** DSv2 write path for the `journal` format (S5: the Append RPC,
  * protocol.proto:484-616, re-expressed in Spark's commit protocol).
  *
  * Executors spool framed payloads per (partition, postfix) with an
  * incremental SHA1 (the reference's Spool, broker/fragment/spool.go:
  * 26-50); the driver assigns contiguous offsets at commit time in
  * (partition, postfix) order and renames spools into the fragment
  * index. Spark's commit coordinator (on by default) ensures exactly
  * one task attempt per partition commits; aborted attempts delete
  * their own spools. Streaming epochs share [[Journal.batchSink]]'s
  * `.batch-*` manifest fencing keyed by (queryId, epochId), so a
  * retried epoch lands exactly once.
  *
  * Write options: `codec` (fragment codec, default table codec);
  * `postfixCol` (string column routed to Hive-style `key=value` path
  * postfix subdirectories, the reference's path_postfix_template —
  * the column is consumed as routing metadata, not framed);
  * `maxFragmentBytes` (spool roll bound — the reference's fragment
  * `length` target, protocol.proto:214-218 — so fragment size and
  * read-task granularity stay bounded for any write-partition size);
  * `maxAppendRate` (bytes/sec write throttle — the reference's
  * per-journal `max_append_rate`, protocol.proto:293-298 — enforced by
  * a per-JVM token bucket, see [[AppendFlowControl]] for the
  * cluster-aggregate semantics).
  */
/** Table-level write defaults (a catalog table's JournalSpec fields);
  * per-write options override them. Keeps CREATE/ALTER TABLE
  * properties meaningful on the SQL write path, where no write
  * options are passed.
  */
final case class JournalWriteDefaults(
  maxFragmentBytes: Long = Long.MaxValue,
  maxAppendRate: Long = 0L,
  flushIntervalMs: Long = 0L)

class JournalWrite(roots: Seq[String], journal: String, tableCodec: String,
    info: LogicalWriteInfo,
    defaults: JournalWriteDefaults = JournalWriteDefaults()) extends Write {

  // New fragments persist to the FIRST store (the active store); the
  // other stores still participate in offset derivation below.
  private val root: String = roots.head

  private val codec: String =
    Option(info.options.get("codec")).getOrElse(tableCodec)

  private val maxFragmentBytes: Long = {
    val v = Option(info.options.get("maxFragmentBytes")).map(_.toLong)
      .getOrElse(defaults.maxFragmentBytes)
    // Parity with Journal.stage's require: 0 would roll an empty spool
    // on EVERY write — one fragment (and one commit rename) per record.
    require(v > 0, s"maxFragmentBytes must be positive, got $v")
    v
  }

  private val maxAppendRate: Long =
    Option(info.options.get("maxAppendRate")).map(_.toLong)
      .getOrElse(defaults.maxAppendRate)

  // fragment.flush_interval (protocol.proto:229-246): time-roll bound
  // for spools inside ONE batch/epoch — micro-batch triggers already
  // close spools per epoch, so this matters for long batch appends of
  // trickling sources. 0 = size-only rolling.
  private val flushIntervalMs: Long =
    Option(info.options.get("flushIntervalMs")).map(_.toLong)
      .getOrElse(defaults.flushIntervalMs)

  // Accepts any input schema carrying a string `payload` column (the
  // table declares ACCEPT_ANY_SCHEMA: journals frame opaque payloads,
  // they don't impose relational shape on writers). A single-string-
  // column input of any name also works.
  private val payloadIdx: Int = {
    val schema = info.schema()
    val byName = schema.fields.indexWhere(f =>
      f.name.equalsIgnoreCase("payload") && f.dataType == StringType)
    if (byName >= 0) byName
    else if (schema.fields.length == 1 && schema.fields(0).dataType == StringType) 0
    else throw new IllegalArgumentException(
      s"journal write needs a string `payload` column, got ${schema.simpleString}")
  }

  private val postfixIdx: Int =
    Option(info.options.get("postfixCol")).map { pc =>
      val i = info.schema().fields.indexWhere(_.name.equalsIgnoreCase(pc))
      require(i >= 0, s"postfixCol `$pc` not in ${info.schema().simpleString}")
      require(info.schema().fields(i).dataType == StringType,
        s"postfixCol `$pc` must be a string column")
      i
    }.getOrElse(-1)

  private def factory = new JournalWriterFactory(
    root, journal.replace('/', '_'), codec, payloadIdx, postfixIdx,
    maxFragmentBytes, new HadoopConf(Journal.hadoopConf),
    journal,
    // maxAppendRate is the journal's AGGREGATE ceiling; each executor
    // JVM gets its share (see AppendFlowControl.perJvmShare).
    AppendFlowControl.perJvmShare(
      org.apache.spark.sql.SparkSession.active.sparkContext, maxAppendRate),
    flushIntervalMs)

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      factory
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      JournalWrite.commitAppend(roots, journal, codec, messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      JournalWrite.dropSpools(root, messages)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      factory
    // queryId is stable across checkpointed restarts (unlike runId), so
    // a retried epoch maps to the same manifest and lands exactly once.
    private val qid = info.queryId()
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      Journal.commitSpooledEpoch(root, journal, s"$qid-$epochId",
        JournalWrite.ordered(messages), codec, offsetRoots = roots)
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      JournalWrite.dropSpools(root, messages)
  }
}

/** One spooled (postfix, rollSeq) group of a partition. */
case class Spooled(postfix: String, seq: Int, len: Long, sha1: String, tmpPath: String)

/** One partition's spool set, awaiting offset assignment + rename. */
case class SpoolCommit(partitionId: Int, spools: Seq[Spooled])
  extends WriterCommitMessage

object JournalWrite {
  /** Flatten commit messages into (postfix, len, sha, tmp) in
    * (partition, postfix, rollSeq) order — the order offsets are
    * assigned in, mirroring `Journal.stage`'s ordered-spool contract.
    */
  private[v2] def ordered(messages: Array[WriterCommitMessage]): Seq[(String, Long, String, String)] =
    messages.collect { case s: SpoolCommit => s }
      .flatMap(s => s.spools.map(sp => (s.partitionId, sp)))
      .sortBy { case (pid, sp) => (pid, sp.postfix, sp.seq) }
      .map { case (_, sp) => (sp.postfix, sp.len, sp.sha1, sp.tmpPath) }.toSeq

  /** Batch append commit: offsets assigned from the MULTI-STORE head in
    * (partition, postfix) order, spools renamed into the index at the
    * first (active) store. Deriving the head across every store keeps
    * mid-migration journals collision-free (see Journal.stage).
    */
  private[v2] def commitAppend(roots: Seq[String], journal: String, codec: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val root = roots.head
    val conf = Journal.hadoopConf
    val staged = Journal.planFragments(root, journal, codec,
      Journal.head(roots, journal), ordered(messages))
    staged.foreach { case (frag, tmpPath) =>
      Journal.commitFragment(frag, tmpPath, conf)
    }
    Journal.raiseHeadFloor(root, journal,
      staged.iterator.map(_._1.end).foldLeft(0L)(math.max))
    graft.metrics.GraftMetrics.appendCommitted(journal, staged.size,
      staged.iterator.map { case (f, _) => f.end - f.begin }.sum,
      staged.iterator.map(_._1.end).foldLeft(0L)(math.max))
  }

  private[v2] def dropSpools(root: String, messages: Array[WriterCommitMessage]): Unit = {
    val conf = Journal.hadoopConf
    messages.foreach {
      case s: SpoolCommit => s.spools.foreach { sp =>
        val p = new HPath(sp.tmpPath)
        p.getFileSystem(conf).delete(p, false)
      }
      case _ =>
    }
  }
}

/** Executor-side writer: one spool per (partition, postfix) group,
  * created lazily so empty partitions produce no fragment.
  */
class JournalWriterFactory(root: String, journalTag: String, codec: String,
    payloadIdx: Int, postfixIdx: Int, maxFragmentBytes: Long, hc: HadoopConf,
    journal: String, maxAppendRate: Long, flushIntervalMs: Long = 0L)
  extends DataWriterFactory with StreamingDataWriterFactory {

  // A throttled writer MUST carry its journal name: the token bucket is
  // keyed on it, and an empty key would silently merge throttles across
  // distinct journals in the JVM.
  require(maxAppendRate <= 0L || journal.nonEmpty,
    "JournalWriterFactory: maxAppendRate > 0 requires a non-empty journal")

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer(partitionId, taskId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    writer(partitionId, taskId)

  private def writer(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Journal.FragmentSpool: ONE spool implementation shared with the
      // batch append path (framing, SHA-1, codec, roll policy).
      private lazy val fs = new HPath(root).getFileSystem(hc.value)
      private def fresh(seq: Int) = new Journal.FragmentSpool(fs, root,
        s"$journalTag-$partitionId-$taskId", codec, seq, journal)
      private def finished(postfix: String, sp: Journal.FragmentSpool) = {
        val len = sp.len // read before finish() closes the stream
        Spooled(postfix, sp.seq, len, sp.finish(), sp.tmp.toString)
      }
      private val spools =
        scala.collection.mutable.LinkedHashMap.empty[String, Journal.FragmentSpool]
      private val rolled = Seq.newBuilder[Spooled]

      // Resolved executor-side: the bucket is shared by every writer of
      // this journal in the JVM, so parallel tasks jointly honor the cap.
      private lazy val flow: AppendFlowControl.TokenBucket =
        if (maxAppendRate > 0)
          AppendFlowControl.bucket(root, journal, maxAppendRate)
        else null

      override def write(row: InternalRow): Unit = {
        val u = row.getUTF8String(payloadIdx)
        require(u != null, "journal write: null payload")
        val postfix =
          if (postfixIdx < 0) ""
          else {
            val p = row.getUTF8String(postfixIdx)
            require(p != null, "journal write: null postfix value")
            p.toString
          }
        // Checked once per distinct value: a malformed postfix writes
        // fragments the listing never attributes (invisible data,
        // offsets reused) — refuse at the source.
        if (!spools.contains(postfix)) Journal.validatePostfix(postfix)
        var sp = spools.getOrElseUpdate(postfix, fresh(0))
        if (sp.shouldRoll(maxFragmentBytes, flushIntervalMs)) {
          rolled += finished(postfix, sp)
          sp = fresh(sp.seq + 1)
          spools(postfix) = sp
        }
        val payload = u.getBytes
        if (flow != null) flow.acquire(payload.length + 1L)
        sp.write(payload)
      }

      override def commit(): WriterCommitMessage = {
        spools.iterator.foreach { case (postfix, sp) => rolled += finished(postfix, sp) }
        spools.clear()
        SpoolCommit(partitionId, rolled.result())
      }

      override def abort(): Unit = {
        // Best-effort and PER-SPOOL: abort typically runs on an already
        // failing executor, where a codec close flushing to a dead
        // stream throws — one such throw must not skip the remaining
        // closes or any delete. A tmp skipped here is orphaned forever:
        // retries spool to fresh UUID names, and sweepSpools
        // deliberately never matches DSv2 spool names.
        spools.values.foreach { sp =>
          try sp.abortClose() catch { case _: Exception => () }
        }
        (rolled.result().map(sp => new HPath(sp.tmpPath)) ++ spools.values.map(_.tmp))
          .foreach(p => try fs.delete(p, false) catch { case _: Exception => () })
      }

      override def close(): Unit = ()
    }
}
