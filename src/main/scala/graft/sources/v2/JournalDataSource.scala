package graft.sources.v2

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Journal
import graft.sources.Journal.Fragment

/** DataSource V2 `journal` format (SURVEY §7 Phase 2, mapping S1-S4):
  * one journal is simultaneously a batch table and a micro-batch stream
  * over the same content-addressed fragment files.
  *
  * {{{
  *   spark.read.format("journal")
  *     .option("root", "/data/journals").option("journal", "topic/a").load()
  *   spark.readStream.format("journal").options(...).load()
  * }}}
  *
  * Batch: input partitions are cover-set-resolved fragments; executors
  * open fragment files directly (the reference's read delegation,
  * broker/read_api.go:51-55). Streaming: the journal head (max fragment
  * end offset) is the stream offset; each micro-batch reads the byte
  * range [start, end) via fragment slices — exact, replayable offsets,
  * so a checkpointed query resumes mid-journal (the blocking tail read
  * of protocol.proto:419-425 expressed as offset polling).
  */
class JournalDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "journal"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JournalDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JournalTable(properties.get("root"), properties.get("journal"),
      // getTable properties preserve the caller's option-key case
      Option(properties.get("maxBytesPerTrigger"))
        .orElse(Option(properties.get("maxbytespertrigger"))).map(_.toLong))
}

object JournalDataSource {
  val schema: StructType = StructType(Seq(
    StructField("journal", StringType, nullable = false),
    StructField("begin", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

class JournalTable(root: String, journal: String,
    maxBytesPerTrigger: Option[Long] = None) extends Table with SupportsRead {
  require(root != null && journal != null, "options root and journal are required")
  override def name(): String = s"journal:$journal"
  override def schema(): StructType = JournalDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new JournalScan(root, journal, maxBytesPerTrigger)
}

class JournalScan(root: String, journal: String,
    maxBytesPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = JournalDataSource.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Journal.coverSet(Journal.listFragments(root, journal))
        .map { case (f, from) => FragmentPartition(f, from, f.end): InputPartition }
        .toArray
    override def createReaderFactory(): PartitionReaderFactory = new FragmentReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JournalMicroBatchStream(root, journal, maxBytesPerTrigger)
}

/** A fragment slice [from, to) to surface as rows. */
case class FragmentPartition(fragment: Fragment, from: Long, to: Long) extends InputPartition

class FragmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FragmentPartition]
    new PartitionReader[InternalRow] {
      private val it = Journal.readFragmentSlice(p.fragment, p.from, p.to)
      private var cur: Journal.Envelope = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(cur.journal), cur.begin, cur.end,
        UTF8String.fromString(cur.payload))
      override def close(): Unit = ()
    }
  }
}

/** Stream offset = journal head byte offset. */
case class JournalOffset(head: Long) extends Offset {
  override def json(): String = s"""{"head":$head}"""
}

/** Admission-controlled byte read limit (the engine's
  * `maxOffsetsPerTrigger` analog — offsets ARE bytes here). Round-trips
  * through Spark's SupportsAdmissionControl contract untouched.
  */
case class ReadMaxJournalBytes(bytes: Long) extends ReadLimit {
  // 0 would make every micro-batch [s, s) — AvailableNow then never
  // reaches its drain target; negative would move offsets backward.
  require(bytes > 0, s"maxBytesPerTrigger must be positive, got $bytes")
}

class JournalMicroBatchStream(root: String, journal: String,
    maxBytesPerTrigger: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: pin the drain target at query start
  // so the paced (admission-controlled) batches stop at a fixed head
  // even while writers keep appending.
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(Journal.head(root, journal))

  private def currentHead(): Long =
    availableNowEnd.getOrElse(Journal.head(root, journal))

  // Progress events carry this as the source description — lets
  // ConsumerApp.readThrough target ONE journal in a multi-source query.
  override def toString: String = s"journal:$journal"

  override def initialOffset(): Offset = JournalOffset(0L)
  override def latestOffset(): Offset = JournalOffset(currentHead())

  /** Flow control (the reference's append/read flow-control knobs,
    * SURVEY §2.12): cap each micro-batch at `maxBytesPerTrigger`
    * journal bytes, so a backfill over a deep journal proceeds in
    * bounded, checkpointable steps instead of one giant batch.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxBytesPerTrigger.map(ReadMaxJournalBytes(_): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = currentHead()
    val s = start.asInstanceOf[JournalOffset].head
    limit match {
      case ReadMaxJournalBytes(b) => JournalOffset(math.min(head, s + b))
      case _ => JournalOffset(head)
    }
  }

  override def reportLatestOffset(): Offset =
    JournalOffset(Journal.head(root, journal))
  override def deserializeOffset(json: String): Offset = {
    val m = """\{"head":(\d+)\}""".r
    json.trim match {
      case m(h) => JournalOffset(h.toLong)
      case other => throw new IllegalArgumentException(s"bad journal offset: $other")
    }
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[JournalOffset].head, end.asInstanceOf[JournalOffset].head)
    Journal.coverSet(Journal.listFragments(root, journal))
      .flatMap { case (f, from) =>
        val lo = math.max(from, s)
        val hi = math.min(f.end, e)
        if (lo < hi) Some(FragmentPartition(f, lo, hi): InputPartition) else None
      }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new FragmentReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
