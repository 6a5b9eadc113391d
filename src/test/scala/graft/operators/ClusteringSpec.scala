package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  /** Two well-separated blobs in 4-d plus planted near-dup twins. */
  private def blobs(): DataFrame = {
    import spark.implicits._
    val a = Seq.tabulate(20)(i =>
      (i.toLong, Array(10f + i * 0.01f, 10f, 0f, 0f)))
    val b = Seq.tabulate(20)(i =>
      (100L + i, Array(-10f - i * 0.01f, -10f, 0f, 0f)))
    // twins: 200 ≈ 201 (same direction, tiny perturbation)
    val twins = Seq(
      (200L, Array(10f, 10.2f, 0.3f, 0f)),
      (201L, Array(10.001f, 10.2f, 0.3f, 0f)))
    (a ++ b ++ twins).toDF("vec_id", "embedding")
  }

  test("kmeansAssign separates well-separated blobs (k=2)") {
    val out = Clustering.kmeansAssign(blobs(), k = 2, updates = 2)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellsA = (0L until 20L).map(out) ++ Seq(out(200L), out(201L))
    val cellsB = (100L until 120L).map(out)
    assert(cellsA.toSet.size == 1, s"blob A split: $cellsA")
    assert(cellsB.toSet.size == 1, s"blob B split: $cellsB")
    assert(cellsA.head != cellsB.head)
  }

  test("kmeansAssign updates=0 equals direct seed assignment") {
    val df = blobs()
    val zero = Clustering.kmeansAssign(df, k = 4, updates = 0)
    // determinism: same call twice is bit-identical
    val again = Clustering.kmeansAssign(df, k = 4, updates = 0)
    assert(zero.select("vec_id", "cell").collect().toSet ==
      again.select("vec_id", "cell").collect().toSet)
  }

  test("VecMean is exact and merge-order independent") {
    val agg = new Clustering.VecMean
    val vs = Seq(Seq(0.1, -0.25), Seq(0.2, 0.05), Seq(0.3, 0.2))
    val seq = vs.foldLeft(agg.zero)(agg.reduce)
    // split across "partitions" in a different grouping
    val p1 = vs.take(1).foldLeft(agg.zero)(agg.reduce)
    val p2 = vs.drop(1).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(p2, p1) // reversed merge order
    assert(agg.finish(seq) == agg.finish(merged))
    // sums are exact (0.6, 0.0 in micro-units); the single final
    // division is the only float op: 0.6/3 = 0.1999...8 (correctly
    // rounded), 0.0/3 = 0.0 — deterministic regardless of order.
    assert(agg.finish(seq) == Seq(0.6 / 3, 0.0))
  }

  test("semanticDupPairs finds within-cell twins only") {
    val assigned = Clustering.kmeansAssign(blobs(), k = 2, updates = 1)
    val pairs = Clustering.semanticDupPairs(assigned, threshold = 0.9999)
      .select(col("va"), col("vb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((200L, 201L)), s"missing twin pair in $pairs")
    // every reported pair is within one cell by construction
    val cells = assigned.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { case (a, b) => assert(cells(a) == cells(b)) }
  }

  test("FuzzyJoin.selfJoin matches the naive cross-join result") {
    import spark.implicits._
    val names = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "flour", "flower", "flowers", "zzz", "kitten" /* dup collapses */)
      .toDF("name")
    val got = FuzzyJoin.selfJoin(names, col("name"), maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // naive O(n²) reference
    val distinct = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "flour", "flower", "flowers", "zzz")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- distinct; b <- distinct if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd)).toSet
    assert(got == want)
  }

  test("FuzzyJoin maxDist=0 degenerates to exact-duplicate pairs of distinct values (none)") {
    import spark.implicits._
    val names = Seq("aa", "aa", "bb").toDF("name")
    assert(FuzzyJoin.selfJoin(names, col("name"), maxDist = 0).count() == 0)
  }

  test("kcenterGreedy seeds at the lowest id and jumps to the far blob") {
    val rows = Clustering.kcenterGreedy(blobs(), k = 4)
      .orderBy(col("r")).collect()
    assert(rows.length == 4)
    assert(rows(0).getLong(1) == 0L && rows(0).getDouble(2) == 2.0)
    // round 2: the farthest point from blob A is in blob B (cosine
    // distance ~2); ties below round(·,6) break to the lowest vec_id
    assert(rows(1).getLong(1) >= 100L && rows(1).getLong(1) < 120L)
    assert(rows(1).getDouble(2) > 1.9)
    // selection distances are non-increasing from round 2 on, ids unique
    val ds = rows.drop(1).map(_.getDouble(2))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getLong(1)).distinct.length == 4)
  }

  test("kcenterGreedy with k exceeding corpus size stops early") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val rows = Clustering.kcenterGreedy(tiny, k = 10).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
  }
}
