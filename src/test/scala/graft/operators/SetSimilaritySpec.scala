package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Prefix-filtered set-similarity join (q67): exactness vs the
  * exhaustive baseline, plus evidence the filter actually prunes.
  */
class SetSimilaritySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("da", "db", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6))
      .toSet

  test("matches the exhaustive Jaccard join exactly (sf0.001 documents)") {
    import spark.implicits._
    val docs = Dedup.docShingles(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      $"doc_id", $"text", 3)
    for (tau <- Seq(0.6, 0.8, 0.9)) {
      val exact = pairs(Dedup.jaccardPairsExact(docs, tau))
      val pref = pairs(SetSimilarity.prefixJaccardSelfJoin(docs, tau))
      assert(pref == exact, s"tau=$tau: prefix join diverged from baseline")
      assert(exact.nonEmpty || tau > 0.85, s"tau=$tau: vacuous test")
    }
  }

  test("handcrafted sets: boundary thresholds, identical docs, ties") {
    import spark.implicits._
    // Token sets as pre-hashed longs (the operator's input contract).
    val docs = Seq(
      (1L, Array(1L, 2L, 3L, 4L)),       // J(1,2)=3/5=0.6
      (2L, Array(1L, 2L, 3L, 5L)),
      (3L, Array(1L, 2L, 3L, 4L)),       // identical to 1: J=1.0
      (4L, Array(9L)),                   // singleton, rare token
      (5L, Array(9L)),                   // J(4,5)=1.0
      (6L, Array(7L, 8L))                // no qualifying partner
    ).toDF("doc_id", "sh")
    val got = pairs(SetSimilarity.prefixJaccardSelfJoin(docs, 0.6))
    assert(got == Set((1L, 2L, 0.6), (1L, 3L, 1.0), (2L, 3L, 0.6), (4L, 5L, 1.0)))
    // At tau just above a pair's jaccard the pair must vanish.
    val tight = pairs(SetSimilarity.prefixJaccardSelfJoin(docs, 0.61))
    assert(tight == Set((1L, 3L, 1.0), (4L, 5L, 1.0)))
  }

  test("ceil rounding hazard: threshold-exact pair survives (tau=0.56, n=25)") {
    import spark.implicits._
    // 0.56*25 = 14.000000000000002 in double: a naive ceil gives 15,
    // shortening a's prefix to 11 tokens — exactly its 11 unique
    // (rarest) tokens — so the shared token never posts and the pair
    // with Jaccard == tau exactly (14/25) is silently dropped. The
    // same product breaks the length filter (14.0000…2 > 14). The
    // epsilon-guarded ceil/filter must keep it.
    val shared = (1L to 14L).toArray
    val docs = Seq(
      (1L, shared ++ (101L to 111L)),    // n=25
      (2L, shared)                       // n=14, J(1,2) = 14/25 = 0.56
    ).toDF("doc_id", "sh")
    val got = pairs(SetSimilarity.prefixJaccardSelfJoin(docs, 0.56))
    assert(got == Set((1L, 2L, 0.56)))
  }

  test("prefix index is smaller than the full inverted index") {
    import spark.implicits._
    val docs = Dedup.docShingles(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      $"doc_id", $"text", 3)
    val fullPostings = docs.select(explode($"sh")).count()
    // Reproduce the operator's prefix length on the canonical ordering.
    val tau = 0.8
    val prefixPostings = docs
      .select((size($"sh") - ceil(lit(tau) * size($"sh")) + 1).cast("long").as("p"))
      .agg(sum($"p")).head().getLong(0)
    assert(prefixPostings * 3 < fullPostings,
      s"prefix index ($prefixPostings) should be ≲ a third of the full index ($fullPostings)")
  }
}
