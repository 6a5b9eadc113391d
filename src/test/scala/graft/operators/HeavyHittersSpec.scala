package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Two-pass heavy hitters (q68): exactness vs the full groupBy, the
  * Misra-Gries superset guarantee, and the state bound.
  */
class HeavyHittersSpec extends SparkSpec {

  private def exact(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import spark.implicits._
    val tok = df.select(explode(expr(
      "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("token"))
    val n = tok.count()
    tok.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * k > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches full-vocabulary groupBy exactly on sf0.001 documents") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (k <- Seq(50, 500)) {
      val got = HeavyHitters.frequentTokens(docs, $"text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact(docs, k), s"k=$k diverged")
      assert(got.nonEmpty, s"k=$k: vacuous test")
    }
  }

  test("skewed stream: hot token survives tiny k across many partitions") {
    import spark.implicits._
    // 'hot' is 30% of tokens, spread across 64 partitions; everything
    // else is unique all-letter noise (the tokenizer is [a-z]+, so
    // digits would split into shared fragments). k=4 counters per
    // partition must keep 'hot'.
    def alpha(i0: Int): String = {
      var i = i0; val sb = new StringBuilder("n")
      while (i > 0) { sb += ('a' + i % 26).toChar; i /= 26 }
      sb.result()
    }
    val rows = (1 to 20000).map { i =>
      if (i % 10 < 3) "hot" else alpha(i)
    }
    val df = spark.createDataset(rows).repartition(64).toDF("text")
    val got = HeavyHitters.frequentTokens(df, $"text", k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 6000L))
  }

  test("degenerate inputs: empty corpus and all-identical tokens") {
    import spark.implicits._
    val empty = spark.createDataset(Seq.empty[String]).toDF("text")
    assert(HeavyHitters.frequentTokens(empty, $"text", 10).count() == 0)
    val same = spark.createDataset(Seq.fill(100)("word")).toDF("text")
    val got = HeavyHitters.frequentTokens(same, $"text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("word" -> 100L))
  }
}
