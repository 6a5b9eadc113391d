package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  private val W = 4

  private def stats(docs: Seq[(Long, String)]): Map[Long, Row] = {
    import spark.implicits._
    SpanDedup.spanStats(docs.toDF("doc_id", "text"), $"doc_id", $"text", W)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("cross-document duplicated phrase becomes one merged span in both docs") {
    // 6-token shared phrase -> windows at offsets 0..2 of the phrase
    // merge into a single 6-token span on each side.
    val shared = "one two three four five six"
    val out = stats(Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"epsilon $shared zeta eta theta iota")))
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      assert(r.getLong(2) == 1L, s"doc $id n_spans: $r")
      assert(r.getLong(3) == 6L, s"doc $id dup_tokens: $r")
    }
    assert(out(1L).getDouble(4) == 0.6) // 6 of 10 tokens
  }

  test("within-document repetition is self-duplication") {
    val out = stats(Seq(
      (1L, "red green blue cyan x y z red green blue cyan")))
    // both occurrences of the repeated 4-gram are marked; they are
    // > W apart so they stay two separate spans
    assert(out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 8L)
  }

  test("short and unique docs report zero spans") {
    val out = stats(Seq(
      (1L, "tiny doc"), // < W tokens
      (2L, "completely unique words nothing here repeats anywhere at all")))
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getDouble(4) == 0.0,
        s"doc $id: $r")
    }
  }

  test("adjacent marked windows chain into one maximal span") {
    // 8-token shared run: windows 0..4 (stride 1) all duplicated,
    // pairwise within W of each other -> single span of 8 tokens.
    val phrase = "alpha beta gamma delta epsilon zeta eta theta"
    val out = stats(Seq(
      (1L, s"pre $phrase post"),
      (2L, s"$phrase tail words here")))
    assert(out(1L).getLong(2) == 1L)
    assert(out(1L).getLong(3) == 8L)
    assert(out(2L).getLong(3) == 8L)
  }
}
