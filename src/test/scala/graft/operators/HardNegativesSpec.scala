package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def emb(id: Long, label: Int, v: Array[Float]) = (id, label, v)

  test("hardNegatives returns only different-label neighbors, ranked by cosine") {
    val vs = Seq(
      emb(0L, 0, Array(1f, 0f)),
      emb(1L, 0, Array(0.99f, 0.1f)),  // same label: excluded
      emb(2L, 1, Array(0.9f, 0.2f)),   // closest cross-label
      emb(3L, 1, Array(0f, 1f)),       // orthogonal cross-label
      emb(4L, 2, Array(0.8f, 0.3f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.hardNegatives(vs, vs.filter($"vec_id" === 0), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 4L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
    assert(out.forall(_.getAs[Long]("vec_id") != 1L))
  }

  test("hardNegatives agrees with the window-rank baseline under a label filter") {
    val vs = (0 until 40).map { i =>
      emb(i.toLong, i % 3, Array.tabulate(6)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val probes = vs.filter($"vec_id" < 4)
    val got = Similarity.hardNegatives(vs, probes, k = 3)
      .orderBy("probe_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // Baseline: bruteTopK on a corpus pre-filtered per probe label.
    val expect = (0 until 4).flatMap { p =>
      val pl = p % 3
      Similarity.bruteTopK(vs.filter($"label" =!= pl), probes.filter($"vec_id" === p), k = 3)
        .orderBy("rank")
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"),
          r.getAs[Int]("rank").toLong))
    }
    assert(got == expect.map { case (a, b, r) => (a, b, r) })
  }
}
