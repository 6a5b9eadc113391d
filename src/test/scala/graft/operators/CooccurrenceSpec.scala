package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceLift ranks an always-together pair above independent ones") {
    // "alpha beta" always adjacent; filler tokens co-occur with everything.
    val docs = (0 until 30).map { i =>
      (i.toLong, s"alpha beta fill${('a' + i % 5).toChar} common common")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrenceLift(docs, $"text",
      window = 3, minPairCount = 5L, k = 10).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(Set(top.getString(0), top.getString(1)).subsetOf(
      Set("alpha", "beta", "common") + top.getString(0) + top.getString(1)))
    // the (alpha, beta) pair must score lift > 1 (over-represented)
    val ab = out.find(r => r.getString(0) == "alpha" && r.getString(1) == "beta")
    assert(ab.isDefined && ab.get.getAs[Double]("lift") > 1.0)
  }

  test("cooccurrenceLift pairs are unordered and the min-count filter applies") {
    val docs = Seq((1L, "x y x y x y x y x y"), (2L, "z q")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrenceLift(docs, $"text",
      window = 2, minPairCount = 5L, k = 10).collect()
    // (x, y) adjacent 9 times >= 5; (z, q) only once -> filtered.
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("x", "y")))
  }

  test("cooccurrenceLift is invariant to input partitioning") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"tok${('a' + i % 7).toChar} mid tok${('a' + (i + 3) % 7).toChar} end here"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cooccurrenceLift(df, $"text", window = 4, minPairCount = 2L, k = 20)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(run(docs.coalesce(1)) == run(docs.repartition(6)))
  }
}
