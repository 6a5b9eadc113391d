package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkSpec {

  private def score(rows: Seq[(Long, String, Boolean)], buckets: Int = 64) = {
    import spark.implicits._
    val df = rows.toDF("id", "text", "tgt")
    Dsir.weights(df, col("id"), col("text"), col("tgt"), buckets)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => id -> ((n, w)) }.toMap
  }

  test("target-lookalike docs score above off-distribution docs") {
    // Target speaks "alpha beta"; raw background speaks "zulu yankee".
    val corpus = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (3L, "alpha beta alpha", false),   // looks like target
      (4L, "zulu yankee zulu yankee", false),
      (5L, "zulu yankee zulu", false))
    val out = score(corpus)
    // Ordering is the invariant; absolute sign is not meaningful here
    // (the +1/+K Laplace smoothing dominates a 20-token toy corpus).
    assert(out(3)._2 > out(4)._2)
    // Same text => same weight, independent of the target flag.
    assert(out(1)._2 == out(2)._2)
  }

  test("n_toks counts occurrences, not distinct tokens; empty docs drop") {
    val out = score(Seq(
      (1L, "aa aa aa bb", true),
      (2L, "...!!!", false), // tokenizes to nothing
      (3L, "cc", false)))
    assert(out(1)._1 == 4L)
    assert(!out.contains(2L))
    assert(out(3)._1 == 1L)
  }

  test("weight is the sum of per-bucket LLR terms over token occurrences") {
    // One doc, one token type repeated k times: weight = k * (weight
    // of the single-occurrence doc sharing the same models) only if
    // models are identical — so build the model from a separate pair
    // and compare a 2x-token doc against the 1x doc: ratio exactly 2.
    val out = score(Seq(
      (1L, "mm", true), (2L, "mm mm", true),
      (3L, "nn nn nn nn", false)))
    assert(math.abs(out(2)._2 - 2 * out(1)._2) < 1e-9)
  }
}
