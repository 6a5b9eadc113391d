package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ScdSpec extends SparkSpec {

  private def build(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("k", "a", "t", "o")
    Scd.type2(df, col("k"), col("a"), col("t"), col("o"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
  }

  test("runs collapse to intervals; last run is open and current") {
    // key 1: A@10, A@20, B@30, A@40 — three runs (A, B, A).
    val out = build(Seq((1L, "A", 10L, 1L), (1L, "A", 20L, 2L),
      (1L, "B", 30L, 3L), (1L, "A", 40L, 4L)))
    assert(out == Set(
      (1L, "A", 10L, 30L, 2L, 0L),
      (1L, "B", 30L, 40L, 1L, 0L),
      (1L, "A", 40L, Scd.OpenEnd, 1L, 1L)))
  }

  test("single-run key: one open interval; keys are independent") {
    val out = build(Seq((1L, "X", 5L, 1L), (1L, "X", 9L, 2L),
      (2L, "Y", 7L, 3L)))
    assert(out == Set(
      (1L, "X", 5L, Scd.OpenEnd, 2L, 1L),
      (2L, "Y", 7L, Scd.OpenEnd, 1L, 1L)))
  }

  test("equal timestamps break ties on the tiebreaker column") {
    // Both rows at t=10: order o=1 (A) then o=2 (B) → two runs, and
    // the B interval starts at the same instant A's ends.
    val out = build(Seq((1L, "A", 10L, 1L), (1L, "B", 10L, 2L)))
    assert(out == Set(
      (1L, "A", 10L, 10L, 1L, 0L),
      (1L, "B", 10L, Scd.OpenEnd, 1L, 1L)))
  }

  test("NULL attr values form their own runs (null-safe change detection)") {
    import spark.implicits._
    // A -> NULL -> A must be THREE runs, not one folded 'A' interval;
    // consecutive NULLs collapse into one run.
    val df = Seq(
      (1L, Some("A"), 10L, 1L), (1L, None, 20L, 2L),
      (1L, None, 25L, 3L), (1L, Some("A"), 30L, 4L))
      .toDF("k", "a", "t", "o")
    val out = Scd.type2(df, col("k"), col("a"), col("t"), col("o"))
      .orderBy("valid_from")
      .select("attr", "valid_from", "valid_to", "n_obs")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      (Some("A"), 10L, 20L, 1L),
      (None, 20L, 30L, 2L),
      (Some("A"), 30L, Scd.OpenEnd, 1L)))
  }

  test("asOf returns the interval in force at the instant") {
    import spark.implicits._
    val dim = Scd.type2(
      Seq((1L, "A", 10L, 1L), (1L, "B", 30L, 2L)).toDF("k", "a", "t", "o"),
      col("k"), col("a"), col("t"), col("o"))
    def at(ts: Long) =
      Scd.asOf(dim, ts).select("attr").as[String].collect().toSeq
    assert(at(9L) == Seq.empty)        // before history starts
    assert(at(10L) == Seq("A"))        // inclusive start
    assert(at(29L) == Seq("A"))
    assert(at(30L) == Seq("B"))        // exclusive end / new start
    assert(at(1000L) == Seq("B"))      // open interval
  }
}
