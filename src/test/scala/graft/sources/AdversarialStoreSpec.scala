package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The storage boundary S8 had never crossed: the journal suite's core
  * write/read/stream/compact flows over [[LagFileSystem]] — local FS
  * with eventually-consistent LISTINGS (lag + reorder), the store
  * class the reference's fragment stores are built for
  * (broker/fragment/stores.go:38-105). Every test drives the REAL
  * paths with `lag:///` roots; nothing is mocked below the FileSystem
  * interface.
  */
class AdversarialStoreSpec extends SparkSpec {

  private def singleJvm: Boolean =
    !spark.sparkContext.master.startsWith("local-cluster")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration
      .set("fs.lag.impl", classOf[LagFileSystem].getName)
  }

  private def lagRoot(): String =
    "lag://" + Files.createTempDirectory("graft-lag").toString

  private def withWindow[T](ms: Long)(body: => T): T = {
    LagFileSystem.windowMs = ms
    try body finally LagFileSystem.windowMs = 0L
  }

  private def payloads(r: Range): DataFrame = {
    import spark.implicits._
    r.map(i => s"rec-$i").toDF("payload")
  }

  test("reordered listings: multi-fragment append reads back complete and in-span") {
    assume(singleJvm, "lag window statics live per JVM")
    val root = lagRoot()
    Journal.append(payloads(1 to 300).repartition(4), root, "adv/a")
    val envs = Journal.read(spark, root, "adv/a").collect()
    assert(envs.length == 300)
    assert(envs.map(_.payload).sorted.toSeq ==
      (1 to 300).map(i => s"rec-$i").sorted)
  }

  test("rapid double append under listing lag mints contiguous offsets (head floor)") {
    assume(singleJvm, "lag window statics live per JVM")
    val root = lagRoot()
    val j = "adv/b"
    withWindow(3600 * 1000L) {
      // Both appends run INSIDE the lag window: the second append's
      // LIST sees no fragments at all. Without the head floor it would
      // re-derive head 0 and mint offsets overlapping the first
      // append's — silent self-shadowing with a single writer.
      val f1 = Journal.append(payloads(1 to 100), root, j)
      val h1 = f1.map(_.end).max
      assert(Journal.listFragments(root, j).isEmpty, "listing must lag")
      assert(Journal.head(root, j) == h1, "floor must carry the head")
      val f2 = Journal.append(payloads(101 to 150), root, j)
      assert(f2.map(_.begin).min == h1,
        s"second append must continue at $h1, got ${f2.map(_.begin).min}")
    }
    // Window over: everything lists; the audit sees no overlap and the
    // read-back has every record exactly once.
    assert(Journal.overlappingFragments(Seq(root), "adv/b").isEmpty)
    val got = Journal.read(spark, root, j).collect().map(_.payload)
    assert(got.length == 150 && got.distinct.length == 150)
  }

  test("streaming over a lagging store: offsets clamp, never rewind, no duplicates") {
    assume(singleJvm, "lag window statics live per JVM")
    import org.apache.spark.sql.streaming.Trigger
    val root = lagRoot()
    val j = "adv/s"
    val ckpt = Files.createTempDirectory("graft-lag-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def drain(): Unit = {
      val q = spark.readStream.format("journal")
        .option("root", root).option("journal", j).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("payload").collect().foreach(r => seen.add(r.getString(0)))
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "drain timed out")
    }

    Journal.append(payloads(1 to 20), root, j)
    drain()
    assert(seen.size == 20)

    // Append while every fragment is list-hidden: the drain target
    // derives from the listing (0), the checkpoint holds head1 — the
    // clamp must hold the offset, deliver nothing, and NOT rewind.
    withWindow(3600 * 1000L) {
      Journal.append(payloads(21 to 30), root, j)
      drain()
      assert(seen.size == 20, "hidden append must deliver nothing yet")
    }
    // Listing converged: exactly the new records arrive, once.
    drain()
    val all = seen.toArray(Array.empty[String]).toSeq
    assert(all.length == 30 && all.distinct.length == 30)
  }

  test("EC-safe compaction: keep sources through the lag window, sweep shadowed later") {
    assume(singleJvm, "lag window statics live per JVM")
    val root = lagRoot()
    val j = "adv/c"
    (1 to 3).foreach(k => Journal.append(
      payloads(k * 100 - 99 to k * 100), root, j))
    val before = Journal.listFragments(root, j)
    assert(before.length >= 3)

    // Age the sources past the lag window we are about to set, so the
    // window splits the world the way a real store would: old sources
    // list, the seconds-old merged fragment does not.
    Thread.sleep(2500)
    val merged = Journal.compact(root, j, targetBytes = Long.MaxValue / 2,
      deleteSources = false)
    assert(merged.nonEmpty)
    withWindow(2000L) {
      // Inside the window the merged fragment is invisible; the
      // retained sources keep every byte readable. (Immediate-delete
      // compaction would leave a hole right here.)
      val visible = Journal.listFragments(root, j)
      assert(visible.map(_.path).toSet == before.map(_.path).toSet)
      // The sweep must refuse while the cover is younger than the
      // store's consistency bound.
      assert(Journal.sweepShadowed(root, j, minCoverAgeMs = 3600 * 1000L).isEmpty)
      assert(Journal.read(spark, root, j).count() == 300)
    }
    // Window over: the cover lists; age-gate satisfied at 0ms.
    val swept = Journal.sweepShadowed(root, j, minCoverAgeMs = 0L)
    assert(swept.map(_.path).toSet == before.map(_.path).toSet)
    val after = Journal.listFragments(root, j)
    assert(after.map(_.path).toSet == merged.map(_.path).toSet)
    assert(Journal.read(spark, root, j).count() == 300)
  }
}
