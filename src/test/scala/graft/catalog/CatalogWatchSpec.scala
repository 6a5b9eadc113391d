package graft.catalog

import graft.SparkSpec
import graft.labels.LabelSet

class CatalogWatchSpec extends SparkSpec {

  test("watch stream: snapshot replay, then live upserts and deletes") {
    import spark.implicits._
    val c = new JournalCatalog
    // Mutations BEFORE the watch starts arrive as the initial snapshot.
    assert(c.upsert(JournalSpec("watch/pre", LabelSet("env", "prod"),
      stores = Vector("/tmp/w"), retentionMs = 1000L)).isRight)

    val q = c.watchStream(spark)
      .writeStream.format("memory").queryName("catalog_watch")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("watch-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val snap = spark.table("catalog_watch")
        .select($"op", $"name", $"labels", $"retention_ms")
        .as[(String, String, String, Long)].collect()
      assert(snap.toSeq == Seq(("upsert", "watch/pre", "env=prod", 1000L)))

      // A live upsert arrives as a new row in the running stream.
      assert(c.upsert(JournalSpec("watch/live", codec = "none",
        maxAppendRate = 4096L)).isRight)
      q.processAllAvailable()
      val afterUpsert = spark.table("catalog_watch")
        .select($"op", $"name", $"codec", $"max_append_rate")
        .as[(String, String, String, Long)].collect().toSet
      assert(afterUpsert.contains(("upsert", "watch/live", "none", 4096L)))

      // A spec edit and a delete both stream, in revision order.
      assert(c.upsert(JournalSpec("watch/live", codec = "gz")).isRight)
      assert(c.delete("watch/pre").isRight)
      q.processAllAvailable()
      val rows = spark.table("catalog_watch")
        .select($"revision", $"op", $"name")
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(rows.map(r => (r._2, r._3)).toSeq == Seq(
        ("upsert", "watch/pre"),
        ("upsert", "watch/live"),
        ("upsert", "watch/live"),
        ("delete", "watch/pre")))
      assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    } finally { q.stop(); c.close() }
  }

  test("watch stream resumes from its checkpoint (no replayed rows)") {
    import spark.implicits._
    val c = new JournalCatalog
    val ckpt = java.nio.file.Files.createTempDirectory("watch-ckpt2").toString
    val out = java.nio.file.Files.createTempDirectory("watch-out2").toString
    assert(c.upsert(JournalSpec("wres/aaa1")).isRight)
    def drain(): Unit = {
      // Parquet sink: the memory sink refuses checkpoint recovery.
      val q = c.watchStream(spark)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(spark.read.parquet(out).count() == 1L)
    // Restart against the same checkpoint: only the delta lands.
    assert(c.upsert(JournalSpec("wres/bbb2")).isRight)
    drain()
    val names = spark.read.parquet(out).select($"name").as[String].collect()
    assert(names.sorted.toSeq == Seq("wres/aaa1", "wres/bbb2"))
    c.close()
  }

  test("close() unregisters; unwatched catalogs never register") {
    val fresh = new JournalCatalog
    assert(JournalCatalog.lookup(fresh.id).isEmpty,
      "a catalog that is never watched must not pin itself in the registry")
    val watched = new JournalCatalog
    watched.watchStream(spark) // registration is lazy, on first watch
    assert(JournalCatalog.lookup(watched.id).contains(watched))
    watched.close()
    assert(JournalCatalog.lookup(watched.id).isEmpty)
    watched.close() // idempotent
  }
}
