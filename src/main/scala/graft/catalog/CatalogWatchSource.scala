package graft.catalog

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Watch-mode catalog listing as a DSv2 micro-batch source (the List
  * RPC's watch flag, protocol.proto:662-701; clients re-list from a
  * revision and stream spec deltas).
  *
  *   spark.readStream.format("journal-catalog-watch")
  *     .option("catalog", cat.id).load()
  *
  * Offsets ARE catalog revisions: `latestOffset` is the catalog's
  * current revision, a batch is the watch-log slice in (start, end].
  * Starting at revision 0 replays the full history — an initial
  * snapshot expressed as upserts, then live deltas — matching the
  * reference's watch contract (snapshot, then notifications).
  *
  * Scale/placement: the catalog is driver-side control-plane state
  * (spec rows, not data). Each micro-batch ships its slice inside ONE
  * InputPartition — there is nothing to parallelize and no executor
  * ever needs the catalog object itself. The `catalog` handle resolves
  * through a JVM registry, so a checkpointed query only resumes
  * against a catalog constructed in the same driver JVM (the catalog
  * is in-memory state; persisting it is the deployment's concern).
  *
  * SCHEMA COMPATIBILITY: round 8 widened this schema by two columns
  * (`fragment_target_length`, `flush_interval_ms`). That is a BREAKING
  * change for a deployed streaming query whose sink (e.g. parquet)
  * pinned the old schema in its checkpoint — restarting such a query
  * requires a fresh checkpoint (and sink path, for schema-strict
  * sinks). Future spec-field additions carry the same cost; widen in
  * batches and call it out in release notes.
  */
class CatalogWatchSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "journal-catalog-watch"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CatalogWatchSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val id = Option(properties.get("catalog")).getOrElse(
      throw new IllegalArgumentException("option `catalog` (a JournalCatalog id) is required"))
    new CatalogWatchTable(id)
  }
}

object CatalogWatchSource {
  val schema: StructType = StructType(Seq(
    StructField("revision", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("replication", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("read_only", BooleanType, nullable = false),
    StructField("write_only", BooleanType, nullable = false),
    StructField("stores", StringType, nullable = false),
    StructField("labels", StringType, nullable = false),
    StructField("retention_ms", LongType, nullable = false),
    StructField("max_append_rate", LongType, nullable = false),
    // A mirror rebuilt from this stream must see EVERY spec field a
    // consumer of the catalog can observe — omitting one makes an
    // upsert that changes only it indistinguishable from a no-op, and
    // downstream mirrors silently drift.
    StructField("fragment_target_length", LongType, nullable = false),
    StructField("flush_interval_ms", LongType, nullable = false)))
}

class CatalogWatchTable(catalogId: String) extends Table with SupportsRead {
  override def name(): String = s"journal-catalog-watch:$catalogId"
  override def schema(): StructType = CatalogWatchSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = CatalogWatchSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CatalogWatchStream(catalogId)
    }
}

case class WatchOffset(revision: Long) extends Offset {
  override def json(): String = s"""{"revision":$revision}"""
}

/** One micro-batch's watch-log slice, carried in the partition itself
  * (serialized plain strings/longs — JournalSpec never crosses the
  * wire).
  */
case class WatchSlice(rows: Seq[(Long, String, String, Int, String,
    Boolean, Boolean, String, String, Long, Long, Long, Long)])
  extends InputPartition

class CatalogWatchStream(catalogId: String) extends MicroBatchStream {
  private def catalog: JournalCatalog =
    JournalCatalog.lookup(catalogId).getOrElse(throw new IllegalStateException(
      s"no JournalCatalog with id $catalogId in this JVM (watch streams " +
        "resume only against a catalog constructed in the same driver)"))

  override def initialOffset(): Offset = WatchOffset(0L)
  override def latestOffset(): Offset = WatchOffset(catalog.currentRevision)
  override def deserializeOffset(json: String): Offset = {
    val re = """\{"revision":(\d+)\}""".r
    json.trim match {
      case re(r) => WatchOffset(r.toLong)
      case other => throw new IllegalArgumentException(s"bad watch offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WatchOffset].revision
    val e = end.asInstanceOf[WatchOffset].revision
    val rows = catalog.changesBetween(s, e).map { ev =>
      val sp = ev.spec
      (ev.revision, ev.op, sp.name, sp.replication, sp.codec,
        sp.readOnly, sp.writeOnly, sp.stores.mkString(","),
        sp.labels.labels.map(l => s"${l.name}=${l.value}").mkString(","),
        sp.retentionMs, sp.maxAppendRate, sp.fragmentTargetLength,
        sp.flushIntervalMs)
    }
    Array(WatchSlice(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[WatchSlice].rows.iterator
      private var cur: (Long, String, String, Int, String, Boolean, Boolean,
        String, String, Long, Long, Long, Long) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow(
        cur._1, UTF8String.fromString(cur._2), UTF8String.fromString(cur._3),
        cur._4, UTF8String.fromString(cur._5), cur._6, cur._7,
        UTF8String.fromString(cur._8), UTF8String.fromString(cur._9),
        cur._10, cur._11, cur._12, cur._13)
      override def close(): Unit = ()
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
