package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental view maintenance (q73): maintained result == fresh
  * aggregation, group birth/death, empty delta.
  */
class IncrementalAggSpec extends SparkSpec {

  private def maintained(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val aggA = a.groupBy($"lang".as("g"))
      .agg(count(lit(1)).as("n"), sum(length($"text")).as("s"))
    val delta = IncrementalAgg.countSumDelta(
      a, b, "id", "lang", length($"text"), md5($"text"))
    IncrementalAgg.maintainCountSum(aggA, delta)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def fresh(b: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    b.groupBy($"lang".as("g"))
      .agg(count(lit(1)).as("n"), sum(length($"text")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("adds, removes, edits, group birth and group death") {
    import spark.implicits._
    val a = Seq(
      (1L, "en", "hello"), (2L, "en", "world"),
      (3L, "de", "hallo"), (4L, "fr", "salut")).toDF("id", "lang", "text")
    val b = Seq(
      (1L, "en", "hello"),            // unchanged
      (2L, "en", "worlds apart"),     // edited
      (3L, "de", "hallo"),            // unchanged
      // 4 removed → fr dies
      (5L, "it", "ciao")              // added → it born
    ).toDF("id", "lang", "text")
    assert(maintained(a, b) == fresh(b))
    assert(!maintained(a, b).exists(_._1 == "fr"))
  }

  test("NULL group keys merge with their delta instead of splitting") {
    import spark.implicits._
    val a = Seq((1L, null: String, "aa"), (2L, null: String, "bb"),
      (3L, "en", "cc")).toDF("id", "lang", "text")
    val b = Seq((1L, null: String, "aa"), (2L, null: String, "bbbb"),
      (3L, "en", "cc")).toDF("id", "lang", "text")
    val got = maintained(a, b)
    assert(got == fresh(b), s"got $got")
    assert(got.count(_._1 == null) == 1, "null group split into multiple rows")
  }

  test("identical snapshots produce the original aggregate unchanged") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"lang", $"text")
    assert(maintained(docs, docs) == fresh(docs))
  }
}
