package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextAnalysis.surprisalBuckets + Dedup.ngramNovelty unit behavior. */
class SurprisalNoveltySpec extends SparkSpec {

  test("surprisal buckets: integer floor(log2) scoring, threshold thirds") {
    import spark.implicits._
    // Corpus: 8 'common' + 4 'mid' + 2 'rare' + 2 'rarer' = 16 tokens.
    // surprisal(common) = floor(log2(16/8)) = 1, mid = 2, rare = 3.
    val docs = Seq(
      (1L, "common common common common", "a"),
      (2L, "common common common common", "a"),
      (3L, "mid mid mid mid", "a"),
      (4L, "rare rare rarer rarer", "a"),
      (5L, "", "a") // token-less: excluded by contract
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis
      .surprisalBuckets(docs, $"doc_id", $"text", $"source")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5))).toMap
    assert(!out.contains(5L))
    // docs 1,2: 4 tokens × 1 bit; doc 3: 4 × 2; doc 4: rare=floor(log2(8))=3
    assert(out(1L) == ((4L, 4L, 1.0, "head")))
    assert(out(2L) == ((4L, 4L, 1.0, "head")))
    assert(out(3L) == ((4L, 8L, 2.0, "middle")))
    assert(out(4L)._3 == 3.0 && out(4L)._4 == "tail")
  }

  test("surprisal buckets: cuts are per source") {
    import spark.implicits._
    // Source b's docs all score identically -> every one lands in
    // 'head' (ties take the lower bucket at its own source's cuts).
    val docs = Seq(
      (1L, "x x x x x x x x", "a"),
      (2L, "y y", "a"),
      (3L, "z", "a"),
      (10L, "w w w w", "b"),
      (11L, "w w w w", "b"),
      (12L, "w w w w", "b")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis
      .surprisalBuckets(docs, $"doc_id", $"text", $"source")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(Seq(10L, 11L, 12L).forall(out(_) == "head"))
    // Source a spreads across all three buckets.
    assert(Seq(1L, 2L, 3L).map(out).toSet == Set("head", "middle", "tail"))
  }

  test("ngram novelty: originals score 1.0, exact dupes 0.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // dup of 1 -> novelty 0
      (3L, "zeta eta theta iota"),            // disjoint -> novelty 1
      (4L, "alpha beta gamma zeta eta theta"), // mixed
      (5L, "one two")                          // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs, $"doc_id", $"text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains(5L))
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)))
    // doc 4 trigrams: "alpha beta gamma" (first in doc 1) and
    // "zeta eta theta" (first in doc 3) are not novel;
    // "beta gamma zeta" and "gamma zeta eta" are.
    assert(out(4L)._1 == 4L && out(4L)._2 == 2L)
  }
}
