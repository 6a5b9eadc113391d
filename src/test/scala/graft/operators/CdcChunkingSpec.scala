package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunkingSpec extends SparkSpec {

  private def residue(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 16
  }

  /** Some lowercase token whose hash falls in the cut class. */
  private val cutTok: String =
    Iterator.from(0).map(i => s"w${('a' + i % 26).toChar}${i / 26}")
      .map(_.filter(_.isLetter)).filter(t => residue(t) == 0).next()

  /** Tokens that never cut (so chunk layout is fully controlled). */
  private def plain(n: Int): Seq[String] =
    Iterator.from(0).map(i => s"p${('a' + i % 26).toChar}x${i / 26}")
      .map(_.filter(_.isLetter)).filter(t => residue(t) != 0)
      .take(n).toSeq

  test("chunks partition the token stream exactly") {
    import spark.implicits._
    val p = plain(7)
    val text = (p.take(3) :+ cutTok) ++ p.slice(3, 7)
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val rows = CdcChunking.chunk(docs, $"doc_id", $"text")
      .orderBy($"chunk_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(1) == 0 && rows(0).getLong(2) == 0L
      && rows(0).getLong(3) == 4L) // 3 plain + the cut token
    assert(rows(1).getLong(2) == 4L && rows(1).getLong(3) == 4L)
    assert(rows.map(_.getLong(3)).sum == 8L)
  }

  test("a leading edit leaves downstream chunk hashes unchanged (CDC property)") {
    import spark.implicits._
    val p = plain(10)
    val body = (p.take(2) :+ cutTok) ++ p.slice(2, 6) :+ cutTok
    val tail = p.slice(6, 9)
    val orig = (body ++ tail).mkString(" ")
    val edited = (p(9) +: (body ++ tail)).mkString(" ") // insert one token
    val docs = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val hashes = CdcChunking.chunk(docs, $"doc_id", $"text")
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> rs.sortBy(_.getInt(1)).map(_.getString(4)).toSeq }
    val h1 = hashes(1L)
    val h2 = hashes(2L)
    // first chunk differs (it absorbed the edit); every later chunk
    // re-aligns because its boundaries are content-defined
    assert(h1.head != h2.head)
    assert(h1.tail == h2.tail, s"downstream chunks must re-align: $h1 vs $h2")
  }

  test("a doc with no cut tokens is one chunk; empty docs emit none") {
    import spark.implicits._
    val docs = Seq((1L, plain(5).mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val rows = CdcChunking.chunk(docs, $"doc_id", $"text").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(3) == 5L)
  }

  test("a trailing cut token does not open an empty chunk") {
    import spark.implicits._
    val docs = Seq((1L, (plain(3) :+ cutTok).mkString(" ")))
      .toDF("doc_id", "text")
    val rows = CdcChunking.chunk(docs, $"doc_id", $"text").collect()
    assert(rows.length == 1 && rows(0).getLong(3) == 4L)
  }
}
