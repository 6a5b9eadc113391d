package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  /** O(n³) reference count from an explicit adjacency set. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = adj.map(_._1).toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if i < j && adj((i, j))
      k <- nodes if j < k && adj((j, k)) && adj((i, k))
    } yield (i, j, k)
    tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("matches brute force on a known graph with dup/reversed/self edges") {
    import spark.implicits._
    // K4 on 1-4 (four triangles), a pendant, plus noise: self-loop,
    // duplicate, and reversed-duplicate edges that dedup must absorb.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (2L, 2L), (1L, 2L), (3L, 1L))
    val out = Triangles.perNodeCounts(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(out == brute(edges))
  }

  test("celebrity-vertex graph: star core plus rim cycle, exact under skew") {
    import spark.implicits._
    // Hub 0 connects to every rim node; rim is a cycle. Every rim edge
    // closes a triangle through the hub: n triangles, hub on all of
    // them, each rim node on exactly two (its two cycle edges).
    val n = 60L
    val star = (1L to n).map(i => (0L, i))
    val rim = (1L to n).map(i => (i, if (i == n) 1L else i + 1))
    val out = Triangles.perNodeCounts((star ++ rim).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == n)
    assert((1L to n).forall(out(_) == 2L))
    assert(out == brute(star ++ rim))
  }

  test("deterministic under repartitioning; triangle-free graph is empty") {
    import spark.implicits._
    // Pseudorandom graph: edges (i, (i*7+3) % 97) over 0..96.
    val edges = (0L until 97L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 97), (i, (i * 31 + 11) % 97)))
    val a = Triangles.perNodeCounts(edges.toDF("u", "v"))
      .collect().map(_.toSeq).toSet
    val b = Triangles.perNodeCounts(edges.toDF("u", "v").repartition(13))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // Bipartite graph (all edges cross the parity cut) has no triangles.
    val bip = (0L until 50L).map(i => (i * 2, i * 2 + 1)) ++
      (0L until 49L).map(i => (i * 2, i * 2 + 3))
    assert(Triangles.perNodeCounts(bip.toDF("u", "v")).count() == 0)
  }
}
