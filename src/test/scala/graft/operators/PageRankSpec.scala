package graft.operators

import graft.SparkSpec

/** Fixed-point PageRank (q71): hand-computed small graph, mass
  * conservation bound, and partition-count invariance (the property
  * the fixed-point arithmetic exists to guarantee).
  */
class PageRankSpec extends SparkSpec {

  test("hand-computed 3-node cycle plus spoke") {
    import spark.implicits._
    // 1→2→3→1 and 1→4, 4→1: deg(1)=2, deg(2)=1, deg(3)=1, deg(4)=1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = PageRank.ranksFixedPoint(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = PageRank.Scale; val r0 = s / 4; val base = 15 * r0 / 100
    // In-contributions at iter 1: v1 ← r0/1 (from 3) + r0/1 (from 4);
    // v2 ← r0/2; v3 ← r0/1; v4 ← r0/2.
    assert(got == Map(
      1L -> (base + 85 * (r0 + r0) / 100),
      2L -> (base + 85 * (r0 / 2) / 100),
      3L -> (base + 85 * r0 / 100),
      4L -> (base + 85 * (r0 / 2) / 100)))
  }

  test("rank mass stays within truncation loss of 1.0") {
    import spark.implicits._
    val pairs = for (c <- 1L to 40L; sIdx <- 1L to (c % 5 + 1))
      yield (c * 2, (c % 7 + sIdx) * 2 + 1)
    val p = pairs.distinct.toDF("src", "dst")
    val edges = p.union(p.selectExpr("dst as src", "src as dst"))
    val ranks = PageRank.ranksFixedPoint(edges, 3)
      .collect().map(_.getLong(1))
    val total = ranks.sum.toDouble / PageRank.Scale
    assert(total <= 1.0 && total > 0.93, s"mass $total out of bounds")
  }

  test("identical bits regardless of partitioning") {
    import spark.implicits._
    val pairs = (for (c <- 1L to 30L; sp <- 1L to 3L)
      yield (c * 2, ((c + sp) % 11) * 2 + 1)).distinct.toDF("src", "dst")
    val edges = pairs.union(pairs.selectExpr("dst as src", "src as dst"))
    def run(parts: Int) =
      PageRank.ranksFixedPoint(edges.repartition(parts), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }
}
