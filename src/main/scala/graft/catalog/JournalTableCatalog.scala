package graft.catalog

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.labels.{Label, LabelSet}
import graft.sources.v2.{JournalDataSource, JournalTable}

/** DSv2 `TableCatalog` over [[JournalCatalog]] — journals addressable
  * as catalog tables (the SURVEY §1.1 mapping "JournalSpec = table
  * definition + properties in a catalog"): register with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.journals",
  *   classOf[graft.catalog.JournalTableCatalog].getName)
  * spark.sql("SELECT * FROM journals.topic.events")   // topic/events
  * df.writeTo("journals.topic.events").append()
  * }}}
  *
  * Identifier namespaces map to journal path segments (`topic.events`
  * ↔ `topic/events` — journal names are paths, protocol.proto:168).
  * Each table resolves through its spec: multi-store roots, codec, and
  * the RD/WR flags (a write-only journal loses its read capabilities,
  * a read-only one its write capabilities — Spark's analyzer then
  * rejects the op, the broker's flag enforcement re-expressed).
  *
  * Backing state: the control-plane [[JournalCatalog]] (driver-side,
  * revisioned CAS). A process-wide registry keys backing instances by
  * catalog name so application code and SQL share one control plane;
  * production deployments would initialize from an external metastore
  * here instead.
  */
class JournalTableCatalog extends TableCatalog {

  private var catalogName: String = _
  private var backing: JournalCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    backing = JournalTableCatalog.backingFor(name)
  }

  override def name(): String = catalogName

  /** The shared control plane behind this catalog name. */
  def journals: JournalCatalog = backing

  private def journalName(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString("", "/", "/")
    backing.list().map(_.name)
      .filter(_.startsWith(prefix))
      .map { n =>
        val segs = n.split('/')
        Identifier.of(segs.init, segs.last)
      }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val jname = journalName(ident)
    val spec = backing.get(jname)
      .getOrElse(throw new NoSuchTableException(ident))
    if (spec.stores.isEmpty)
      throw new IllegalStateException(s"journal $jname has no fragment stores")
    new JournalTableCatalog.FlaggedTable(spec)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val jname = journalName(ident)
    if (backing.get(jname).isDefined)
      throw new TableAlreadyExistsException(ident)
    if (schema.nonEmpty && schema != JournalDataSource.schema &&
        schema.fieldNames.toSeq != Seq("payload"))
      throw new IllegalArgumentException(
        "journal tables carry the fixed envelope schema " +
          "(journal, begin, end, payload); create with no schema")
    def opt(k: String): Option[String] = Option(properties.get(k))
    import scala.jdk.CollectionConverters._
    val labels = properties.asScala.toVector.collect {
      case (k, v) if k.startsWith("label.") => Label(k.stripPrefix("label."), v)
    }
    val spec = JournalSpec(
      name = jname,
      labels = LabelSet(labels),
      codec = opt("codec").getOrElse("gz"),
      readOnly = opt("readOnly").exists(_.toBoolean),
      writeOnly = opt("writeOnly").exists(_.toBoolean),
      stores = opt("stores").orElse(opt("root"))
        .map(_.split(',').toVector.map(_.trim)).getOrElse(Vector.empty),
      retentionMs = opt("retentionMs").map(_.toLong).getOrElse(0L),
      maxAppendRate = opt("maxAppendRate").map(_.toLong).getOrElse(0L),
      flushIntervalMs = opt("flushIntervalMs").map(_.toLong).getOrElse(0L))
    // Validate the loadTable invariant BEFORE registering: a failed
    // CREATE must not leave a phantom spec behind.
    if (spec.stores.isEmpty)
      throw new IllegalArgumentException(
        s"journal table $jname needs a 'stores' (or 'root') property")
    backing.upsert(spec, expectRevision = 0L) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_)  => new JournalTableCatalog.FlaggedTable(spec)
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val jname = journalName(ident)
    // Read-modify-write under CAS: carry the read revision into the
    // upsert so a concurrent programmatic update fails the swap
    // loudly instead of being silently overwritten.
    val (spec0, rev) = backing.getWithRevision(jname)
      .getOrElse(throw new NoSuchTableException(ident))
    val spec = changes.foldLeft(spec0) {
      case (s, set: TableChange.SetProperty) => set.property match {
        case "codec"     => s.copy(codec = set.value)
        case "readOnly"  => s.copy(readOnly = set.value.toBoolean)
        case "writeOnly" => s.copy(writeOnly = set.value.toBoolean)
        case "retentionMs"   => s.copy(retentionMs = set.value.toLong)
        case "maxAppendRate" => s.copy(maxAppendRate = set.value.toLong)
        case "flushIntervalMs" => s.copy(flushIntervalMs = set.value.toLong)
        case p if p.startsWith("label.") =>
          val l = Label(p.stripPrefix("label."), set.value)
          s.copy(labels = LabelSet(
            s.labels.labels.filterNot(_.name == l.name) :+ l))
        case p => throw new UnsupportedOperationException(s"property: $p")
      }
      case (s, rm: TableChange.RemoveProperty)
          if rm.property.startsWith("label.") =>
        s.copy(labels = LabelSet(s.labels.labels
          .filterNot(_.name == rm.property.stripPrefix("label."))))
      case (_, other) =>
        throw new UnsupportedOperationException(s"table change: $other")
    }
    backing.upsert(spec, expectRevision = rev) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_)  => new JournalTableCatalog.FlaggedTable(spec)
    }
  }

  override def dropTable(ident: Identifier): Boolean =
    backing.delete(journalName(ident)).isRight

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // Same CAS discipline as alterTable; the source is deleted with
    // its read revision so a concurrent update of the old name fails
    // the rename instead of vanishing. (The upsert-then-delete pair is
    // not atomic — during the window both names resolve, which is the
    // benign direction: readers never see NEITHER name.)
    val (spec, rev) = backing.getWithRevision(journalName(oldIdent))
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (backing.get(journalName(newIdent)).isDefined)
      throw new TableAlreadyExistsException(newIdent)
    backing.upsert(spec.copy(name = journalName(newIdent)),
        expectRevision = 0L) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_) =>
        backing.delete(journalName(oldIdent), expectRevision = rev) match {
          case Left(err) =>
            // Roll the copy back so a failed CAS leaves one name.
            backing.delete(journalName(newIdent))
            throw new IllegalStateException(err)
          case Right(_) => ()
        }
    }
  }
}

object JournalTableCatalog {
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, JournalCatalog]()

  /** Bind an existing control plane to a catalog name BEFORE the first
    * SQL reference instantiates the plugin; unbound names lazily get a
    * fresh catalog.
    */
  def register(name: String, catalog: JournalCatalog): Unit =
    registered.put(name, catalog)

  private[catalog] def backingFor(name: String): JournalCatalog =
    registered.computeIfAbsent(name, _ => new JournalCatalog)

  /** The spec-resolved DSv2 table with RD/WR flags enforced through
    * capability stripping.
    */
  private final class FlaggedTable(spec: JournalSpec)
      extends JournalTable(spec.stores, spec.name, codec = spec.codec,
        writeDefaults = graft.sources.v2.JournalWriteDefaults(
          maxFragmentBytes = spec.fragmentTargetLength,
          maxAppendRate = spec.maxAppendRate,
          flushIntervalMs = spec.flushIntervalMs)) {
    override def capabilities(): util.Set[TableCapability] = {
      val caps = util.EnumSet.copyOf(super.capabilities())
      if (spec.readOnly) {
        caps.remove(TableCapability.BATCH_WRITE)
        caps.remove(TableCapability.STREAMING_WRITE)
      }
      if (spec.writeOnly) {
        caps.remove(TableCapability.BATCH_READ)
        caps.remove(TableCapability.MICRO_BATCH_READ)
      }
      caps
    }
  }
}
