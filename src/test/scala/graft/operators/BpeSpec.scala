package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("trainMerges adopts the most frequent pair and stops when none repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat the cat"),
      (2L, "the cat runs")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, $"doc_id", $"text", rounds = 10)
      .collect()
    // (the, cat) occurs 3 times; after merging it no pair repeats
    assert(merges.length == 1)
    assert(merges(0).getInt(0) == 1)
    assert(merges(0).getString(1) == "the" && merges(0).getString(2) == "cat")
    assert(merges(0).getLong(3) == 3L)
  }

  test("greedy rewrite is left-to-right non-overlapping") {
    import spark.implicits._
    // (a, a) occurs twice in "a a a" (overlapping) + once in "a a":
    // corpus count 3; greedy rewrite of "a a a" -> ["a a", "a"]
    val docs = Seq((1L, "a a a"), (2L, "a a")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, $"doc_id", $"text", rounds = 10)
      .collect()
    assert(merges.length == 1) // round 2: ("a a", "a") count 1 -> stop
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "a")
    val enc = Bpe.encodeStats(docs, $"doc_id", $"text", Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(1L) == ((3L, 2L)))
    assert(enc(2L) == ((2L, 1L)))
  }

  test("merges chain across rounds (merged symbol joins later pairs)") {
    import spark.implicits._
    // (a,b) and (b,c) tie at 4 -> lexicographic tie-break picks (a,b);
    // round 2: ("a b", c) x4 -> trigram symbol
    val docs = Seq(
      (1L, "a b c x a b c"),
      (2L, "a b c y a b c")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, $"doc_id", $"text", rounds = 3)
      .orderBy($"r").collect()
    assert(merges.length >= 2)
    assert((merges(0).getString(1), merges(0).getString(2)) == (("a", "b")))
    assert((merges(1).getString(1), merges(1).getString(2)) == (("a b", "c")))
    val enc = Bpe.encodeStats(docs, $"doc_id", $"text",
      merges.map(m => (m.getString(1), m.getString(2))).toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // "a b c x a b c" -> ["a b c", "x", "a b c"]
    assert(enc(1L) == 3L)
  }

  test("encodeStats keeps empty and single-token docs intact") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val out = Bpe.encodeStats(docs, $"doc_id", $"text", Seq(("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set((1L, 0L, 0L, 1.0), (2L, 1L, 1L, 1.0)))
  }
}
