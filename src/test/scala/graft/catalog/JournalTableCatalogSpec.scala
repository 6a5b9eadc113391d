package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 catalog plugin: journals as named SQL tables, spec-resolved
  * stores/codec, RD/WR flags enforced via capability stripping.
  */
class JournalTableCatalogSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("jcat").toString

  private def ensureCatalog(): JournalCatalog = {
    val backing = JournalTableCatalog.backingFor("jcat")
    spark.conf.set("spark.sql.catalog.jcat",
      classOf[JournalTableCatalog].getName)
    backing
  }

  test("create, write, read, list, drop through SQL identifiers") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(
      s"CREATE TABLE jcat.topic.events TBLPROPERTIES(" +
        s"'stores'='$root', 'codec'='gz', 'label.app'='web')")
    // The spec landed in the backing control plane with meta-labels.
    val spec = JournalTableCatalog.backingFor("jcat").get("topic/events").get
    assert(spec.stores == Vector(root) && spec.codec == "gz")
    assert(spec.labels.labels.exists(l => l.name == "app" && l.value == "web"))

    Seq("a", "b", "c").toDF("payload")
      .writeTo("jcat.topic.events").append()
    val back = spark.read.table("jcat.topic.events")
    assert(back.count() == 3)
    assert(back.select("payload").as[String].collect().sorted.toSeq ==
      Seq("a", "b", "c"))

    val listed = spark.sql("SHOW TABLES IN jcat.topic").collect()
    assert(listed.exists(_.getString(1) == "events"))

    spark.sql("DROP TABLE jcat.topic.events")
    assert(JournalTableCatalog.backingFor("jcat").get("topic/events").isEmpty)
  }

  test("retention and append-rate set via CREATE and ALTER TABLE properties") {
    ensureCatalog()
    spark.sql(s"CREATE TABLE jcat.topic.gov TBLPROPERTIES(" +
      s"'stores'='$root', 'retentionMs'='3600000', 'maxAppendRate'='4096')")
    val backing = JournalTableCatalog.backingFor("jcat")
    val spec = backing.get("topic/gov").get
    assert(spec.retentionMs == 3600000L && spec.maxAppendRate == 4096L,
      "CREATE TABLE must not silently drop governance properties")
    spark.sql("ALTER TABLE jcat.topic.gov SET TBLPROPERTIES(" +
      "'retentionMs'='7200000', 'maxAppendRate'='0')")
    val altered = backing.get("topic/gov").get
    assert(altered.retentionMs == 7200000L && altered.maxAppendRate == 0L)
    spark.sql("DROP TABLE jcat.topic.gov")
  }

  test("spec write policies reach SQL writes (not just the programmatic path)") {
    import spark.implicits._
    val backing = ensureCatalog()
    // fragmentTargetLength has no CREATE property (it's a spec field);
    // set it programmatically and write through the SQL identifier —
    // the spool must roll at the spec's bound, proving the table hands
    // its spec-derived write defaults to the DSv2 write (a plain
    // writeTo passes no write options at all).
    backing.upsert(JournalSpec(name = "topic/rolled",
      stores = Vector(root), codec = "none",
      fragmentTargetLength = 64L))
    (1 to 40).map(i => f"payload-$i%04d").toDF("payload").coalesce(1)
      .writeTo("jcat.topic.rolled").append()
    val frags = graft.sources.Journal.listFragments(root, "topic/rolled")
    assert(frags.size > 1,
      s"spec fragmentTargetLength=64 must roll the spool via SQL writes, " +
        s"got ${frags.size} fragment(s)")
    spark.sql("DROP TABLE jcat.topic.rolled")
  }

  test("read-only flag strips write capabilities") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"CREATE TABLE jcat.topic.frozen " +
      s"TBLPROPERTIES('stores'='$root', 'readOnly'='true')")
    val e = intercept[Exception] {
      Seq("x").toDF("payload").writeTo("jcat.topic.frozen").append()
    }
    assert(e.getMessage.toLowerCase.contains("does not support append") ||
      e.getMessage.toLowerCase.contains("table does not support"),
      s"unexpected: ${e.getMessage}")
    spark.sql("DROP TABLE jcat.topic.frozen")
  }

  test("streaming read resolves through the catalog identifier") {
    import spark.implicits._
    ensureCatalog()
    spark.sql(s"CREATE TABLE jcat.topic.live TBLPROPERTIES('stores'='$root')")
    Seq("s1", "s2").toDF("payload").writeTo("jcat.topic.live").append()
    val q = spark.readStream.table("jcat.topic.live")
      .writeStream.format("memory").queryName("jcat_live")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(30000)
    assert(spark.table("jcat_live").count() == 2)
    spark.sql("DROP TABLE jcat.topic.live")
  }

  test("registered control plane is shared with programmatic API") {
    ensureCatalog()
    val backing = JournalTableCatalog.backingFor("jcat")
    backing.upsert(JournalSpec(name = "prog/made",
      stores = Vector(root))).toOption.get
    // Visible to SQL without any CREATE TABLE.
    assert(spark.read.table("jcat.prog.made").count() == 0)
    assert(backing.delete("prog/made").isRight)
  }
}
