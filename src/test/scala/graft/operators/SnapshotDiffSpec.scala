package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Snapshot diff (q69). */
class SnapshotDiffSpec extends SparkSpec {

  test("added/removed/changed/unchanged classification") {
    import spark.implicits._
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val b = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("id", "text")
    val got = SnapshotDiff.diff(a, b, "id", md5($"text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("NULL payloads: presence is not confused with fingerprint nullity") {
    import spark.implicits._
    val a = Seq((1L, null: String), (2L, "x"), (3L, null: String))
      .toDF("id", "text")
    val b = Seq((1L, null: String), (2L, null: String)).toDF("id", "text")
    val got = SnapshotDiff.diff(a, b, "id", md5($"text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: null→null is unchanged; 2: value→null is changed; 3: removed.
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed"))
  }

  test("diff of a snapshot with itself is all-unchanged") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val d = SnapshotDiff.diff(docs, docs, "doc_id", md5($"text"))
    assert(d.filter($"status" =!= "unchanged").count() == 0)
    assert(d.count() == docs.count())
  }
}
