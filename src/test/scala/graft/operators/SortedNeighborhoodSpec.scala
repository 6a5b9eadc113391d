package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("window-3 pairs match the rank-offset definition exactly") {
    import spark.implicits._
    val keys = Seq("alpha", "alphb", "beta", "betaa", "gamma", "gamna")
    val df = (keys ++ keys).toDF("k") // duplicates must collapse
    val got = SortedNeighborhood.pairs(df, col("k"), window = 3, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val sorted = keys.sorted
    val want = (for {
      i <- sorted.indices; o <- 1 to 2 if i + o < sorted.length
      d = lev(sorted(i), sorted(i + o)) if d <= 2
    } yield (sorted(i), sorted(i + o), d.toLong)).toSet
    assert(got == want, s"got $got want $want")
  }

  test("global rank is correct across partition boundaries") {
    import spark.implicits._
    // 100 keys, window 2, unbounded distance -> exactly the 99
    // adjacent pairs in sort order; any rank gap or duplicate at a
    // partition boundary would drop or double a pair.
    val keys = (0 until 100).map(i => f"key$i%03d")
    val out = SortedNeighborhood.pairs(keys.toDF("k"), col("k"),
        window = 2, maxDist = 100)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = keys.sorted.sliding(2).map(s => (s(0), s(1))).toSet
    assert(out == want)
  }
}
