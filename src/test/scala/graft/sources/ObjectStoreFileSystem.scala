package graft.sources

import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path}

/** A test-only Hadoop FileSystem (`obs://`) modeling the COMMIT-plane
  * semantics of a real object store, layered on [[LagFileSystem]]'s
  * listing-plane adversary (lag + reorder). Where `lag://` asked "what
  * breaks when new objects don't LIST yet?", `obs://` asks the two
  * questions the reference's s3/gcs/azure drivers are written around
  * (broker/stores/s3/store.go, gcs/store.go, azure/store.go):
  *
  *  - NON-ATOMIC RENAME: object stores have no rename; it is a
  *    server-side COPY followed by an eventual DELETE of the source.
  *    Here `rename` copies the bytes (the destination appears as a
  *    complete new object, subject to the listing-lag window like any
  *    PUT) and defers the source delete by `renameDeleteLagMs` — so
  *    there is a window where BOTH source and destination exist and
  *    list. Commit protocols that assume "rename success ⇒ source
  *    gone" double-count right here.
  *  - STALE DELETE LISTINGS: `delete` removes the object (GET/stat go
  *    strongly NotFound — read-after-delete consistency), but the
  *    entry keeps LISTING for `deleteListLagMs` as a ghost. A reader
  *    that opens whatever it lists throws FileNotFound right here;
  *    safe designs must resolve listings against a consistency-aged
  *    cover (the journal's age-gated sweep contract).
  *
  * Deferred source deletes execute lazily on the next FS call after
  * the window (`sweep()`), so tests control time ordering without
  * background threads. Knobs are JVM statics for the same reason as
  * [[LagFileSystem.windowMs]]: Hadoop caches FileSystem instances per
  * scheme, which would freeze conf-carried values at first use.
  */
object ObjectStoreFileSystem {
  @volatile var renameDeleteLagMs: Long = 0L
  @volatile var deleteListLagMs: Long = 0L
  private[ObjectStoreFileSystem] val ObsUri: URI = URI.create("obs:///")
  // (qualified path string) -> enqueue time of the pending source delete.
  private val pendingDeletes = new ConcurrentHashMap[String, java.lang.Long]()
  // (qualified path string) -> (ghost status snapshot, delete time).
  private val ghosts = new ConcurrentHashMap[String, (FileStatus, Long)]()

  /** Drop all deferred state (between tests). */
  def reset(): Unit = { pendingDeletes.clear(); ghosts.clear() }
}

class ObjectStoreFileSystem extends LagFileSystem {
  import ObjectStoreFileSystem._

  override def getScheme: String = "obs"
  override def getUri: URI = ObsUri

  private def qp(p: Path): String = makeQualified(p).toUri.getPath

  /** Execute deferred rename-source deletes and expire ghosts whose
    * stale-listing window has passed. The eventual source delete goes
    * through THIS filesystem's delete, not the raw one — a real
    * store's copy+eventual-delete source key is subject to the same
    * stale-listing window as any other delete, so with
    * `deleteListLagMs` set the vanished source still LISTS as a ghost
    * (the two knobs compose). Due entries are removed from the map
    * BEFORE acting so the delete's own re-entrant sweep() is a no-op.
    */
  private def sweep(): Unit = {
    val now = System.currentTimeMillis()
    val due = Vector.newBuilder[String]
    val pit = pendingDeletes.entrySet().iterator()
    while (pit.hasNext) {
      val e = pit.next()
      if (now - e.getValue >= renameDeleteLagMs) { due += e.getKey; pit.remove() }
    }
    due.result().foreach { k =>
      try delete(new Path("obs://" + k), false)
      catch { case _: Exception => () }
    }
    val git = ghosts.entrySet().iterator()
    while (git.hasNext) {
      val e = git.next()
      if (now - e.getValue._2 >= deleteListLagMs) git.remove()
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    sweep()
    if (renameDeleteLagMs <= 0) return super.rename(src, dst)
    val st = try super.getFileStatus(src)
      catch { case _: java.io.FileNotFoundException => return false }
    if (st.isDirectory) return super.rename(src, dst) // journal renames files
    if (exists(dst)) return false // Hadoop rename never overwrites
    // Server-side copy: the destination appears as a fresh PUT (new
    // mtime -> it obeys the listing-lag window like any new object).
    if (!FileUtil.copy(this, src, this, dst, false, getConf)) return false
    pendingDeletes.put(qp(src), System.currentTimeMillis())
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    sweep()
    if (deleteListLagMs <= 0) return super.delete(p, recursive)
    val st = try super.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return false }
    val ok = super.delete(p, recursive)
    if (ok && st.isFile)
      ghosts.put(qp(p), (new FileStatus(st.getLen, false, 1,
        st.getBlockSize, st.getModificationTime, st.getAccessTime,
        org.apache.hadoop.fs.permission.FsPermission
          .createImmutable(0x1ff.toShort),
        "graft", "graft", makeQualified(p)), System.currentTimeMillis()))
    ok
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    sweep()
    val live = super.listStatus(f) // LagFileSystem's lag + reorder
    if (ghosts.isEmpty) return live
    val dir = qp(f)
    val liveNames = live.map(_.getPath.getName).toSet
    val stale = ghosts.entrySet().iterator()
    val extra = Vector.newBuilder[FileStatus]
    while (stale.hasNext) {
      val e = stale.next()
      val gp = e.getValue._1.getPath
      if (qp(gp.getParent) == dir && !liveNames.contains(gp.getName))
        extra += e.getValue._1
    }
    live ++ extra.result()
  }

  // Stat/open stay strong: a ghost is a LISTING artifact only.
  override def getFileStatus(f: Path): FileStatus = { sweep(); super.getFileStatus(f) }
}
