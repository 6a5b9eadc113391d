package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ST1 fence semantics from consumer/store_sql.go:29-145, exercised
  * against embedded Derby: batch-retry idempotence, zombie fencing,
  * restart recovery.
  */
class SqlStoreSpec extends AnyFunSuite {

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("sqlstore").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  test("commits are transactional with the checkpoint; replays are skipped") {
    val url = freshUrl()
    val a = new SqlStore(url, "shard-1").open()
    a.commitBatch(0) { c =>
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE counts (k VARCHAR(64) PRIMARY KEY, n BIGINT)")
      st.executeUpdate("INSERT INTO counts VALUES ('a', 1)")
      st.close()
    } match { case Right(true) => case x => fail(x.toString) }

    assert(a.commitBatch(1) { c =>
      val st = c.createStatement()
      st.executeUpdate("UPDATE counts SET n = n + 1 WHERE k = 'a'")
      st.close()
    } == Right(true))

    // Retry of batch 1 (Spark re-running a committed micro-batch): the
    // writes closure must NOT run again.
    var ran = false
    assert(a.commitBatch(1) { _ => ran = true } == Right(false))
    assert(!ran)
    assert(a.query("SELECT n FROM counts WHERE k = 'a'")(_.getLong(1)) == Vector(2L))
    a.close()
  }

  test("a new writer's fence bump aborts the zombie's in-flight commit") {
    val url = freshUrl()
    val a = new SqlStore(url, "shard-1").open()
    assert(a.commitBatch(0) { c =>
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE kv (k VARCHAR(64) PRIMARY KEY, v BIGINT)")
      st.executeUpdate("INSERT INTO kv VALUES ('x', 10)")
      st.close()
    } == Right(true))

    val b = new SqlStore(url, "shard-1").open() // new primary bumps fence
    assert(b.restoredBatchId == 0L)             // resumes from a's checkpoint

    // Zombie a tries to commit batch 1: the guarded checkpoint UPDATE
    // matches zero rows and everything rolls back — kv keeps v=10.
    a.commitBatch(1) { c =>
      val st = c.createStatement()
      st.executeUpdate("UPDATE kv SET v = 99 WHERE k = 'x'")
      st.close()
    } match {
      case Left(msg) => assert(msg.contains("fence"))
      case x => fail(s"zombie commit should be fenced, got $x")
    }
    a.close()

    assert(b.query("SELECT v FROM kv WHERE k = 'x'")(_.getLong(1)) == Vector(10L))
    assert(b.commitBatch(1) { c =>
      val st = c.createStatement()
      st.executeUpdate("UPDATE kv SET v = 11 WHERE k = 'x'")
      st.close()
    } == Right(true))
    assert(b.query("SELECT v FROM kv WHERE k = 'x'")(_.getLong(1)) == Vector(11L))
    b.close()
  }

  test("query inside a commitBatch closure must not commit half-done writes") {
    val url = freshUrl()
    val a = new SqlStore(url, "s-q").open()
    assert(a.commitBatch(0) { c =>
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE t (k VARCHAR(8) PRIMARY KEY, v BIGINT)")
      st.executeUpdate("INSERT INTO t VALUES ('x', 1)")
      st.close()
    } == Right(true))

    // The writes closure reads its own uncommitted writes via query(),
    // then fails: the rollback must undo the write — query() must not
    // have committed the transaction mid-flight.
    a.commitBatch(1) { c =>
      val st = c.createStatement()
      st.executeUpdate("UPDATE t SET v = 99 WHERE k = 'x'")
      assert(a.query("SELECT v FROM t WHERE k = 'x'")(_.getLong(1)) == Vector(99L))
      try st.execute("boom -- not sql") // force SQLException → rollback
      finally st.close()
    } match {
      case Left(_) =>
      case x => fail(s"expected failed batch, got $x")
    }
    assert(a.query("SELECT v FROM t WHERE k = 'x'")(_.getLong(1)) == Vector(1L))
    a.close()
  }

  test("open() resumes against an existing checkpoint table (portable probe)") {
    val url = freshUrl()
    new SqlStore(url, "s1").open().close()
    // Second open in the same database: CREATE TABLE must not be
    // attempted again / must not throw on any RDBMS (metadata probe,
    // not a Derby-specific SQLState match).
    val b = new SqlStore(url, "s1").open()
    assert(b.restoredBatchId == -1L)
    b.close()
  }

  test("restart restores the committed checkpoint") {
    val url = freshUrl()
    val a = new SqlStore(url, "s").open()
    assert(a.restoredBatchId == -1L)
    assert(a.commitBatch(0) { _ => () } == Right(true))
    assert(a.commitBatch(1) { _ => () } == Right(true))
    a.close()

    val b = new SqlStore(url, "s").open()
    assert(b.restoredBatchId == 1L)      // resume point
    assert(b.commitBatch(1) { _ => () } == Right(false)) // replay skipped
    assert(b.commitBatch(2) { _ => () } == Right(true))
    b.close()
  }
}
