package graft.operators

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  test("plain archive round-trips the record schedule") {
    val b = Warc.fixture(5)
    val rs = Warc.parse(b)
    assert(rs.length == 5)
    rs.zipWithIndex.foreach { case (r, i) =>
      assert(r.warcType == "response")
      assert(r.targetUri == s"http://example.com/doc/$i")
      assert(r.contentLength == Warc.payloadOf(i).length)
      val payload = new String(b, r.payloadFrom.toInt,
        r.contentLength.toInt, "UTF-8")
      assert(payload == Warc.payloadOf(i))
    }
    // Offsets tile the archive: each record starts where declared.
    rs.foreach(r => assert(new String(b, r.offset.toInt, 8, "UTF-8")
      .startsWith("WARC/")))
  }

  test("gzip archive inflates and parses identically") {
    val rs = Warc.parse(Warc.fixture(4, gz = true))
    assert(rs.length == 4)
    assert(rs.map(_.contentLength).sum ==
      (0 until 4).map(Warc.payloadOf(_).length).sum)
  }

  test("truncated tail keeps the good prefix; garbage refuses") {
    val b = Warc.fixture(3)
    // Cut mid-payload of the last record.
    val cut = java.util.Arrays.copyOf(b, b.length - 6)
    val rs = Warc.parse(cut)
    assert(rs.length == 2)
    assert(Warc.parse(null).isEmpty)
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    // Corrupt gzip yields nothing rather than throwing.
    val gz = Warc.fixture(2, gz = true)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    Warc.parse(gz) // must not throw
  }

  test("truncated .gz keeps the inflated prefix (review fix)") {
    val gz = Warc.fixture(4, gz = true)
    // Cut the compressed stream: the inflated prefix must survive.
    val cut = java.util.Arrays.copyOf(gz, gz.length - 8)
    val rs = Warc.parse(cut)
    assert(rs.nonEmpty, "good prefix of a truncated .warc.gz was dropped")
  }

  test("record length is the exact byte extent even when the trailer " +
    "is truncated (review fix)") {
    val b = Warc.fixture(2)
    val full = Warc.parse(b)
    // Every record's [offset, offset+length) stays inside the archive
    // and lengths tile it exactly.
    assert(full.forall(r => r.offset + r.length <= b.length))
    assert(full.map(_.length).sum == b.length)
    // Cut the final trailer to ONE CRLF: extent shrinks accordingly.
    val cut = java.util.Arrays.copyOf(b, b.length - 2)
    val rs = Warc.parse(cut)
    assert(rs.length == 2)
    assert(rs.forall(r => r.offset + r.length <= cut.length))
  }

  test("explodeRecords carries payload bytes and provenance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Warc.fixture(3)), (2L, Warc.fixture(2, gz = true)))
      .toDF("doc_id", "content")
    val recs = Warc.explodeRecords(df, keep = Seq("doc_id"))
      .select($"doc_id", $"target_uri", $"payload".cast("string"),
        $"compressed")
      .as[(Long, String, String, Boolean)].collect()
    assert(recs.length == 5)
    recs.foreach { case (_, uri, payload, _) =>
      val i = uri.substring(uri.lastIndexOf('/') + 1).toInt
      assert(payload == Warc.payloadOf(i))
    }
    assert(recs.filter(_._1 == 2L).forall(_._4 == true))
    assert(recs.filter(_._1 == 1L).forall(_._4 == false))
  }
}
