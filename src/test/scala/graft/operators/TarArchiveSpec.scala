package graft.operators

import graft.SparkSpec

class TarArchiveSpec extends SparkSpec {

  test("ustar shard round-trips entries and payload bytes") {
    val b = TarArchive.fixture(3)
    val es = TarArchive.entries(b)
    assert(es.length == 6) // txt + bin per sample
    assert(es.map(_.name).toSeq == Seq("00000.txt", "00000.bin",
      "00001.txt", "00001.bin", "00002.txt", "00002.bin"))
    es.grouped(2).zipWithIndex.foreach { case (pair, i) =>
      val Array(txt, bin) = pair
      val t = new String(b, txt.payloadFrom.toInt, txt.size.toInt, "UTF-8")
      assert(t == TarArchive.textOf(i))
      val bb = java.util.Arrays.copyOfRange(b, bin.payloadFrom.toInt,
        (bin.payloadFrom + bin.size).toInt)
      assert(java.util.Arrays.equals(bb, TarArchive.binOf(i)))
    }
  }

  test("the fixture is readable by the JDK-independent reference: " +
    "512-block layout and checksums verify") {
    val b = TarArchive.fixture(2)
    // Every header's stored checksum equals the sum with the checksum
    // field read as spaces (POSIX rule).
    TarArchive.entries(b).foreach { e =>
      val h = java.util.Arrays.copyOfRange(b, e.payloadFrom.toInt - 512,
        e.payloadFrom.toInt)
      val stored = Integer.parseInt(
        new String(h, 148, 6, "US-ASCII").trim, 8)
      val copy = h.clone()
      java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
      assert(copy.map(_ & 0xff).sum == stored)
    }
  }

  test("gzip shard, truncation, garbage") {
    assert(TarArchive.entries(TarArchive.fixture(4, gz = true)).length == 8)
    val b = TarArchive.fixture(3)
    // Cut mid-data of the last entry: good prefix kept.
    val cut = java.util.Arrays.copyOf(b, b.length - 1200)
    assert(TarArchive.entries(cut).length >= 4)
    assert(TarArchive.entries(null).isEmpty)
    assert(TarArchive.entries(new Array[Byte](100)).isEmpty)
  }

  test("explodeSamples groups by key with extension map") {
    import spark.implicits._
    val df = Seq((1L, TarArchive.fixture(2)),
      (2L, TarArchive.fixture(3, gz = true))).toDF("doc_id", "content")
    val rows = TarArchive.explodeSamples(df, keep = Seq("doc_id"))
      .selectExpr("doc_id", "sample_key",
        "cast(element_at(parts, 'txt') as string) as txt",
        "octet_length(element_at(parts, 'bin')) as bl")
      .as[(Long, String, String, Int)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, key, txt, bl) =>
      val i = key.toInt
      assert(txt == TarArchive.textOf(i))
      assert(bl == TarArchive.binOf(i).length)
    }
  }

  test("ustar prefix field joins onto the name (paths > 100 chars)") {
    // Two same-basename members under DIFFERENT directories carried in
    // the prefix field: without prefix handling they'd collapse into
    // one sample key (the r10 ADVICE finding).
    val out = new java.io.ByteArrayOutputStream()
    val dirA = "corpus/shard-a/" + ("x" * 90) // forces prefix usage
    val dirB = "corpus/shard-b/" + ("y" * 90)
    TarArchive.tarEntry(out, "0.txt", "alpha".getBytes("UTF-8"), dirA)
    TarArchive.tarEntry(out, "0.txt", "beta".getBytes("UTF-8"), dirB)
    out.write(new Array[Byte](1024))
    val b = out.toByteArray
    val es = TarArchive.entries(b)
    assert(es.map(_.name).toSeq == Seq(dirA + "/0.txt", dirB + "/0.txt"))
    import spark.implicits._
    val rows = TarArchive.explodeSamples(
      Seq((1L, b)).toDF("doc_id", "content"), keep = Seq("doc_id"))
      .selectExpr("sample_key",
        "cast(element_at(parts, 'txt') as string) as txt")
      .as[(String, String)].collect().sortBy(_._1)
    assert(rows.length == 2) // distinct keys, no merge
    assert(rows.map(_._2).toSeq == Seq("alpha", "beta"))
  }

  test("GNU-format magic ('ustar  ') does NOT read bytes 345+ as a " +
    "prefix (they are atime/ctime there)") {
    val out = new java.io.ByteArrayOutputStream()
    TarArchive.tarEntry(out, "0.txt", "data".getBytes("UTF-8"))
    out.write(new Array[Byte](1024))
    val b = out.toByteArray
    // Rewrite magic+version to GNU old-format ("ustar  \0") and put an
    // octal atime where POSIX keeps the prefix, then re-checksum.
    b(262) = ' '; b(263) = ' '; b(264) = 0
    System.arraycopy("14212053042 ".getBytes("US-ASCII"), 0, b, 345, 12)
    val h = java.util.Arrays.copyOfRange(b, 0, 512)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    val cs = java.lang.Long.toOctalString(sum.toLong)
    val csp = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csp.getBytes("US-ASCII"), 0, b, 148, 6)
    b(154) = 0; b(155) = ' '
    val es = TarArchive.entries(b)
    assert(es.map(_.name).toSeq == Seq("0.txt")) // no timestamp glued on
  }

  test("duplicate (key, ext) members keep the FIRST payload and count") {
    val out = new java.io.ByteArrayOutputStream()
    TarArchive.tarEntry(out, "00000.txt", "first".getBytes("UTF-8"))
    TarArchive.tarEntry(out, "00000.txt", "second".getBytes("UTF-8"))
    TarArchive.tarEntry(out, "00000.bin", Array[Byte](1, 2, 3))
    out.write(new Array[Byte](1024))
    import spark.implicits._
    val rows = TarArchive.explodeSamples(
      Seq((1L, out.toByteArray)).toDF("doc_id", "content"))
      .selectExpr("sample_key",
        "cast(element_at(parts, 'txt') as string) as txt", "n_dup_parts")
      .as[(String, String, Int)].collect()
    assert(rows.length == 1)
    assert(rows.head._2 == "first") // archive order wins
    assert(rows.head._3 == 1) // the malformed shard is distinguishable
  }

  test("multi-dot names group under the first-dot key (seg.png rule)") {
    // Hand-build a shard with dir/0.seg.png + dir/0.txt via the
    // fixture's own header writer is private; use entries() on a
    // renamed fixture instead: the grouping rule is pure string logic
    // exercised through explodeSamples on the standard fixture, and
    // the first-dot rule is pinned here on the key parser via a tiny
    // inline archive.
    val base = TarArchive.fixture(1)
    // Rename "00000.txt" -> "00000.a.b" in place (same length).
    val mod = base.clone()
    val idx = new String(mod, "ISO-8859-1").indexOf("00000.txt")
    System.arraycopy("00000.a.b".getBytes("US-ASCII"), 0, mod, idx, 9)
    // Fix the header checksum after the rename.
    val h = java.util.Arrays.copyOfRange(mod, idx, idx + 512)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    val cs = ("0" * (6 - java.lang.Long.toOctalString(sum).length)) +
      java.lang.Long.toOctalString(sum)
    System.arraycopy(cs.getBytes("US-ASCII"), 0, mod, idx + 148, 6)
    mod(idx + 154) = 0; mod(idx + 155) = ' '
    import spark.implicits._
    val rows = TarArchive.explodeSamples(
      Seq((1L, mod)).toDF("doc_id", "content"), keep = Seq("doc_id"))
      .selectExpr("sample_key", "map_keys(parts) as ks")
      .as[(String, Seq[String])].collect()
    assert(rows.map(_._1).toSet == Set("00000"))
    assert(rows.head._2.toSet == Set("a.b", "bin"))
  }
}
