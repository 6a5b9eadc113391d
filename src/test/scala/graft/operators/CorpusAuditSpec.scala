package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  test("diagMahalanobis: constant dims score 0, a planted outlier ranks first") {
    // dim0 constant; dim1 tight around 0 with one far point.
    val vs = ((0 until 20).map(i => (i.toLong, Array(5f, (i % 3 - 1) * 0.1f))) :+
      (99L, Array(5f, 50f))).toDF("vec_id", "embedding")
    val out = Decomposition.diagMahalanobis(vs, $"vec_id", $"embedding")
      .orderBy($"maha2".desc).collect()
    assert(out.head.getAs[Long]("id") == 99L)
    // All-constant corpus: every score is exactly 0.
    val const = (0 until 8).map(i => (i.toLong, Array(1f, 2f)))
      .toDF("vec_id", "embedding")
    val zeros = Decomposition.diagMahalanobis(const, $"vec_id", $"embedding")
      .agg(max($"maha2")).head().getDouble(0)
    assert(zeros == 0.0)
  }

  test("diagMahalanobis is invariant to input partitioning") {
    val vs = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(5)(d => ((i * 3 + d) % 7 - 3).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Decomposition.diagMahalanobis(vs.coalesce(1), $"vec_id", $"embedding")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    val b = Decomposition.diagMahalanobis(vs.repartition(7), $"vec_id", $"embedding")
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("crossSourceDupMatrix counts near-dup pairs per source pair") {
    def w(p: String, i: Int) = s"$p${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val base = (0 until 40).map(w("tok", _)).mkString(" ")
    val other = (0 until 40).map(w("oth", _)).mkString(" ")
    val docs = Seq(
      (1L, base, "crawl"), (2L, base, "books"),   // cross-source dup
      (3L, other, "crawl"), (4L, other, "crawl"), // within-source dup
      (5L, (0 until 40).map(w("uni", _)).mkString(" "), "books"))
      .toDF("doc_id", "text", "source")
    val out = Curation.crossSourceDupMatrix(docs, $"doc_id", $"text", $"source")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("books", "crawl") -> 1L, ("crawl", "crawl") -> 1L))
  }

  test("hellingerBySource: a source matching the blend scores near 0, disjoint vocab scores high") {
    val shared = (1 to 50).map(_ => "alpha beta gamma delta")
    val docs = (shared.map(t => (t, "main")) ++
      shared.map(t => (t, "copy")) :+ ("zeta eta theta iota kappa", "odd"))
      .zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val out = Curation.hellingerBySource(docs, $"source", $"text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("main") < 0.01 && out("copy") < 0.01)
    assert(out("odd") > 0.5 && out("odd") <= 1.0)
    // H^2 is bounded by 1 for all sources.
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0))
  }
}
