package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  private def run(text: String, width: Int, stride: Int) = {
    import spark.implicits._
    Chunking.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        $"doc_id", $"text", width, stride)
      .select("chunk_id", "start_tok", "n_toks")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("short doc yields exactly one full-width-or-less chunk") {
    assert(run("a b c", 32, 24) == Seq((0, 0L, 3L)))
    assert(run(("x " * 32).trim, 32, 24) == Seq((0, 0L, 32L)))
  }

  test("overlapping chunks advance by stride and cover every token") {
    // 56 tokens, width 32, stride 24: starts 0 and 24, second chunk 32
    // toks (24+32=56 — exact cover, no third chunk).
    val out = run(("t " * 56).trim, 32, 24)
    assert(out == Seq((0, 0L, 32L), (1, 24L, 32L)))
    // 57 tokens: a third chunk of the 9-token tail (starts 48).
    val out2 = run(("t " * 57).trim, 32, 24)
    assert(out2 == Seq((0, 0L, 32L), (1, 24L, 32L), (2, 48L, 9L)))
  }

  test("consecutive chunks overlap by width - stride tokens") {
    import spark.implicits._
    // Letter-only words: wordTokens is [a-z]+, digits would be dropped.
    val words = (0 until 80).map(i => "w" + ('a' + i / 26).toChar + ('a' + i % 26).toChar).mkString(" ")
    val df = Chunking.chunkTokens(Seq((7L, words)).toDF("doc_id", "text"),
      $"doc_id", $"text", width = 32, stride = 24)
    val rows = df.collect().sortBy(_.getInt(1))
    // Recompute each chunk's hash from the source tokens.
    val toks = words.split(" ")
    for (r <- rows) {
      val start = r.getLong(2).toInt
      val n = r.getLong(3).toInt
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.slice(start, start + n).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(4) == expect, s"chunk at $start")
    }
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 24L, 48L))
  }

  test("empty and non-letter docs produce no chunks") {
    assert(run("", 32, 24).isEmpty)
    assert(run("123 456 !!!", 32, 24).isEmpty)
  }

  test("rejects stride > width") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(Seq((1L, "a")).toDF("doc_id", "text"),
        $"doc_id", $"text", width = 8, stride = 9)
    }
  }
}
