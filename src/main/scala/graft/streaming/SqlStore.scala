package graft.streaming

import java.sql.{Connection, DriverManager}

/** ST1 — exactly-once materialization into a JDBC RDBMS, mirroring the
  * reference SQLStore's write-fence protocol
  * (`consumer/store_sql.go:29-145`):
  *
  *  - `open` runs RestoreCheckpoint: atomically increments the shard's
  *    `fence` column and reads back (fence, checkpoint). The checkpoint
  *    here is Spark's micro-batch id — the engine's analog of the
  *    reference's marshalled consumer Checkpoint.
  *  - `commitBatch` wraps application writes and the checkpoint update
  *    in ONE database transaction; the update is guarded by
  *    `WHERE fence = <restored fence>`. If a newer writer has re-opened
  *    the store (zombie fencing), the guard matches zero rows and the
  *    whole transaction rolls back — the stale writer can never commit.
  *  - Batch replays (Spark retrying a micro-batch after restart) are
  *    skipped idempotently when `batchId <=` the stored checkpoint.
  *
  * Use from `writeStream.foreachBatch { (df, id) =>
  * store.commitBatch(id) { conn => ...JDBC upserts... } }` — the
  * standard Spark exactly-once-to-RDBMS recipe, with the reference's
  * fence making concurrent zombie writers safe, not just retries.
  */
final class SqlStore(url: String, shard: String,
    table: String = "gazette_checkpoints") extends AutoCloseable {

  private val conn: Connection = DriverManager.getConnection(url)
  conn.setAutoCommit(false)

  private var fence: Long = 0L

  /** Last committed batch id (-1 when none). */
  var restoredBatchId: Long = -1L
  private var lastBatchId: Long = -1L

  /** RestoreCheckpoint: bump the fence, read (fence, batchId). */
  def open(): this.type = synchronized {
    ensureTable()
    val upd = conn.prepareStatement(
      s"UPDATE $table SET fence = fence + 1 WHERE shard_fqn = ?")
    upd.setString(1, shard)
    upd.executeUpdate()
    val q = conn.prepareStatement(
      s"SELECT fence, batch_id FROM $table WHERE shard_fqn = ?")
    q.setString(1, shard)
    val rs = q.executeQuery()
    if (rs.next()) { fence = rs.getLong(1); restoredBatchId = rs.getLong(2) }
    else { fence = 0L; restoredBatchId = -1L }
    rs.close()
    lastBatchId = restoredBatchId
    conn.commit()
    this
  }

  /** Commit `writes` and the batchId checkpoint atomically. Returns
    * Right(true) when committed, Right(false) for an idempotent replay
    * skip, Left on fence preemption (a newer writer owns the shard).
    */
  def commitBatch(batchId: Long)(writes: Connection => Unit): Either[String, Boolean] =
    synchronized {
      if (batchId <= lastBatchId) Right(false) // replay of a committed batch
      else {
        try {
          inCommit = true
          writes(conn)
          val affected =
            if (fence == 0L) {
              val ins = conn.prepareStatement(
                s"INSERT INTO $table (shard_fqn, batch_id, fence) VALUES (?, ?, 1)")
              ins.setString(1, shard); ins.setLong(2, batchId)
              val n = ins.executeUpdate()
              fence = 1L
              n
            } else {
              val upd = conn.prepareStatement(
                s"UPDATE $table SET batch_id = ? WHERE shard_fqn = ? AND fence = ?")
              upd.setLong(1, batchId); upd.setString(2, shard); upd.setLong(3, fence)
              upd.executeUpdate()
            }
          if (affected == 0) {
            conn.rollback()
            Left("checkpoint fence was updated (ie, by a new primary)")
          } else {
            conn.commit()
            lastBatchId = batchId
            Right(true)
          }
        } catch {
          case e: java.sql.SQLException =>
            conn.rollback()
            Left(e.getMessage)
          case e: Throwable =>
            // A non-SQL failure in the writes closure must ALSO roll
            // back: partial application writes left pending in the
            // shared connection would be committed together with a
            // later retry's writes — duplicate side effects under the
            // exactly-once fence. Rethrow so the caller sees the bug.
            conn.rollback()
            throw e
        } finally inCommit = false
      }
    }

  // True while commitBatch runs its writes-closure: `query` must not
  // commit the shared connection then, or it would flush half-done
  // application writes without the checkpoint row (breaking the atomic
  // write+checkpoint guarantee). `synchronized` is reentrant on the
  // same thread, so the closure CAN call query — it just reads inside
  // the open transaction and leaves the commit to commitBatch.
  private var inCommit = false

  /** Run read-only SQL against the store (the A4/A8 query surface).
    * Failure-safe on the SHARED connection: the statement closes on
    * every path, and a failed query rolls back (outside commitBatch)
    * so the connection doesn't sit in an aborted-transaction state —
    * on PostgreSQL that state fails the NEXT commitBatch's writes with
    * a spurious error, losing a micro-batch commit attempt.
    */
  def query[A](sql: String)(f: java.sql.ResultSet => A): Vector[A] = synchronized {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        val out = Vector.newBuilder[A]
        while (rs.next()) out += f(rs)
        if (!inCommit) conn.commit()
        out.result()
      } finally rs.close()
    } catch {
      case e: Throwable =>
        if (!inCommit)
          try conn.rollback() catch { case _: java.sql.SQLException => () }
        throw e
    } finally st.close()
  }

  /** Portable existence probe: DatabaseMetaData.getTables rather than a
    * vendor-specific "already exists" SQLState (the class is a generic
    * JDBC sink — Derby in tests, anything in production).
    */
  private def tableExists(): Boolean = {
    val md = conn.getMetaData
    // getTables takes LIKE patterns: escape '_'/'%' so
    // "gazette_checkpoints" doesn't match "gazetteXcheckpoints", and
    // scope to the connection's schema so a same-named table owned by
    // another schema (invisible to unqualified SQL) can't fake a hit.
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    def pat(s: String) = s.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
    val schema = try Option(conn.getSchema).map(pat).orNull
      catch { case _: Throwable => null } // drivers may not support getSchema
    // Unquoted identifiers fold per-vendor: probe as-is, upper, lower.
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
      val rs = md.getTables(null, schema, pat(t), Array("TABLE"))
      try rs.next() finally rs.close()
    }
  }

  private def ensureTable(): Unit = {
    if (tableExists()) return
    val st = conn.createStatement()
    try {
      st.executeUpdate(
        s"""CREATE TABLE $table (
           |  shard_fqn VARCHAR(512) PRIMARY KEY,
           |  batch_id BIGINT NOT NULL,
           |  fence BIGINT NOT NULL)""".stripMargin)
      conn.commit()
    } catch {
      // Lost a concurrent-create race: fine as long as it now exists.
      case e: java.sql.SQLException =>
        conn.rollback()
        if (!tableExists()) throw e
    } finally st.close()
  }

  override def close(): Unit = synchronized {
    try conn.rollback() finally conn.close()
  }
}
