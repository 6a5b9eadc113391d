package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A test-only Hadoop FileSystem (`lag://`) that wraps the local FS
  * with the adversarial behaviors of an eventually-consistent BLOB
  * store's LISTING plane — the store class the reference's fragment
  * stores are explicitly designed for (broker/fragment/stores.go:
  * 38-105, "listings are eventually consistent"):
  *
  *  - LISTING LAG: `listStatus` omits files whose modification time is
  *    within `fs.lag.window.ms` of now — a freshly committed fragment
  *    exists (GET is strong, like modern object stores) but does not
  *    LIST yet. Renames preserve mtime, so a committed spool stays
  *    invisible for the window after it was written.
  *  - LISTING REORDER: visible entries return in reverse-lexicographic
  *    order — nothing may assume a store lists in name order.
  *
  * `getFileStatus`/`open`/`exists` stay strong: read-after-write GET
  * consistency, list-after-write lag — the classic hazard split.
  * Register with `conf.set("fs.lag.impl", classOf[LagFileSystem]
  * .getName)`; paths are `lag:///abs/path` over the local filesystem.
  * The window lives in [[LagFileSystem.windowMs]] (a JVM static, so
  * tests can toggle it under Hadoop's FileSystem cache, which would
  * freeze a conf-carried value at first use).
  */
object LagFileSystem {
  @volatile var windowMs: Long = 0L
  // A constant (not an instance field): RawLocalFileSystem's
  // constructor calls getUri before subclass fields initialize.
  private[LagFileSystem] val LagUri: URI = URI.create("lag:///")
}

class LagFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "lag"
  override def getUri: URI = LagFileSystem.LagUri

  override def initialize(name: URI, conf: Configuration): Unit =
    super.initialize(name, conf)

  private def lagMs: Long = LagFileSystem.windowMs

  // Re-materialize as plain FileStatus: RawLocalFileSystem's deferred
  // permission loading does `new File(path.toUri)`, which rejects any
  // scheme but "file" — pre-populating the permission keeps the lag://
  // statuses inert.
  private def scrub(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.createImmutable(0x1ff.toShort),
      "graft", "graft", st.getPath)

  private def adversarial(sts: Array[FileStatus]): Array[FileStatus] = {
    val cut = System.currentTimeMillis() - lagMs
    sts.filter(st => st.isDirectory || st.getModificationTime <= cut)
      .map(scrub)
      .sortBy(_.getPath.getName)(Ordering[String].reverse)
  }

  // Every listing surface funnels here: FileSystem.listFiles /
  // listLocatedStatus / globStatus all bottom out in listStatus for a
  // RawLocalFileSystem subclass.
  override def listStatus(f: Path): Array[FileStatus] =
    adversarial(super.listStatus(f))
}
