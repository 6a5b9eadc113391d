package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S8's second adversary: the journal's write/commit/compact protocol
  * over [[ObjectStoreFileSystem]] — rename as copy + EVENTUAL source
  * delete (the both-visible window) and stale delete listings (ghost
  * entries), the two commit-plane behaviors of real object stores that
  * `lag://` (listing plane only) could not exercise. Every test drives
  * the REAL journal paths with `obs:///` roots; nothing is mocked
  * below the FileSystem interface.
  */
class ObjectStoreSemanticsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  private def singleJvm: Boolean =
    !spark.sparkContext.master.startsWith("local-cluster")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration
      .set("fs.obs.impl", classOf[ObjectStoreFileSystem].getName)
  }

  override def afterEach(): Unit = {
    ObjectStoreFileSystem.renameDeleteLagMs = 0L
    ObjectStoreFileSystem.deleteListLagMs = 0L
    ObjectStoreFileSystem.reset()
    super.afterEach()
  }

  private def obsRoot(): String =
    "obs://" + Files.createTempDirectory("graft-obs").toString

  private def payloads(r: Range): DataFrame = {
    import spark.implicits._
    r.map(i => s"rec-$i").toDF("payload")
  }

  test("copy+delete rename: commit works inside the both-visible " +
    "window; lingering spool sources never enter the fragment index") {
    assume(singleJvm, "obs knobs are JVM statics")
    val root = obsRoot()
    val j = "obs/a"
    ObjectStoreFileSystem.renameDeleteLagMs = 3600 * 1000L // never, in-test
    Journal.append(payloads(1 to 200).repartition(3), root, j)
    // The spool sources of every committed fragment still exist —
    // rename's delete has not executed — and they LIST (spools stage
    // at the ROOT, the rename target is the journal dir). The fragment
    // index must be unpolluted (name-gated) and the read exact.
    val rootDir = new org.apache.hadoop.fs.Path(root)
    val dir = new org.apache.hadoop.fs.Path(root, j)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(rootDir).map(_.getPath.getName)
    assert(names.exists(_.startsWith(".spool-")),
      s"rename sources should linger, got ${names.mkString(",")}")
    val frags = Journal.listFragments(root, j)
    assert(frags.nonEmpty && frags.forall(!_.path.contains(".spool-")))
    assert(Journal.overlappingFragments(Seq(root), j).isEmpty)
    val got = Journal.read(spark, root, j).collect().map(_.payload)
    assert(got.length == 200 && got.distinct.length == 200)
    // Window over: the deferred deletes run on the next FS call.
    ObjectStoreFileSystem.renameDeleteLagMs = 0L
    fs.listStatus(rootDir)
    assert(!fs.listStatus(rootDir).map(_.getPath.getName)
      .exists(_.startsWith(".spool-")), "sources must eventually vanish")
    assert(Journal.read(spark, root, j).count() == 200)
  }

  test("batchSink two-phase commit: non-atomic manifest rename stays " +
    "exactly-once across replays inside the both-visible window") {
    assume(singleJvm, "obs knobs are JVM statics")
    val root = obsRoot()
    val j = "obs/b"
    ObjectStoreFileSystem.renameDeleteLagMs = 3600 * 1000L
    val df = payloads(1 to 50)
    Journal.batchSink(root, j)(df, batchId = 7L)
    // The .pending manifest still exists alongside .committed (the
    // rename's source delete is deferred). A replay of the same batch
    // must see the committed marker FIRST and deliver nothing twice.
    val dir = new org.apache.hadoop.fs.Path(root, j)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(dir).map(_.getPath.getName).toSet
    assert(names.contains(".batch-7.committed"))
    assert(names.contains(".batch-7.pending"),
      "manifest rename source should linger in the window")
    Journal.batchSink(root, j)(df, batchId = 7L) // replay
    Journal.batchSink(root, j)(df, batchId = 8L) // next batch proceeds
    val got = Journal.read(spark, root, j).collect().map(_.payload)
    assert(got.length == 100, s"exactly-once violated: ${got.length}")
    assert(got.distinct.length == 50)
    assert(got.groupBy(identity).values.forall(_.length == 2))
  }

  test("stale delete listings: age-gated sweep + cover-set resolution " +
    "keep reads off ghost fragments") {
    assume(singleJvm, "obs knobs are JVM statics")
    val root = obsRoot()
    val j = "obs/c"
    (1 to 3).foreach(k => Journal.append(
      payloads(k * 100 - 99 to k * 100), root, j))
    val before = Journal.listFragments(root, j)
    // Compact, age the cover past the consistency bound (the
    // operational contract: minCoverAgeMs >= the store's listing lag),
    // then sweep with stale delete listings ACTIVE.
    val merged = Journal.compact(root, j, targetBytes = Long.MaxValue / 2,
      deleteSources = false)
    assert(merged.nonEmpty)
    Thread.sleep(50)
    ObjectStoreFileSystem.deleteListLagMs = 3600 * 1000L
    val swept = Journal.sweepShadowed(root, j, minCoverAgeMs = 25L)
    assert(swept.map(_.path).toSet == before.map(_.path).toSet)
    // The swept sources are GONE (stat is strong) but still LIST as
    // ghosts: the listing shows old sources AND the live cover.
    val listed = Journal.listFragments(root, j)
    assert(listed.map(_.path).toSet ==
      (merged.map(_.path) ++ before.map(_.path)).toSet,
      "ghosts must keep listing inside the stale window")
    // Reads resolve through the cover set: same begin, longer span
    // wins, so every byte is served by the LIVE merged fragment and
    // no ghost is ever opened.
    val got = Journal.read(spark, root, j).collect().map(_.payload)
    assert(got.length == 300 && got.distinct.length == 300)
    assert(Journal.head(root, j) == before.map(_.end).max)
    // Stale window over: listings converge to exactly the cover.
    ObjectStoreFileSystem.deleteListLagMs = 0L
    assert(Journal.listFragments(root, j).map(_.path).toSet ==
      merged.map(_.path).toSet)
    assert(Journal.read(spark, root, j).count() == 300)
  }

  test("combined adversary: commit-plane lags plus listing-plane lag " +
    "(head floor) still mint contiguous offsets and read back complete") {
    assume(singleJvm, "obs knobs are JVM statics")
    val root = obsRoot()
    val j = "obs/d"
    ObjectStoreFileSystem.renameDeleteLagMs = 3600 * 1000L
    LagFileSystem.windowMs = 3600 * 1000L
    try {
      val f1 = Journal.append(payloads(1 to 100), root, j)
      val h1 = f1.map(_.end).max
      assert(Journal.listFragments(root, j).isEmpty, "listing must lag")
      assert(Journal.head(root, j) == h1, "floor must carry the head")
      val f2 = Journal.append(payloads(101 to 150), root, j)
      assert(f2.map(_.begin).min == h1)
    } finally LagFileSystem.windowMs = 0L
    assert(Journal.overlappingFragments(Seq(root), j).isEmpty)
    val got = Journal.read(spark, root, j).collect().map(_.payload)
    assert(got.length == 150 && got.distinct.length == 150)
  }
}
