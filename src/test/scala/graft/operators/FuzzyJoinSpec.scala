package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  /** r11 regression pin: selfJoin moved to the THRESHOLD levenshtein
    * (banded DP, returns −1 past the band). The pair set AND the dist
    * values must match the naive full-DP + filter form exactly —
    * including distance-0 duplicates-by-value (impossible here: input
    * is distinct) and pairs at exactly maxDist.
    */
  test("threshold levenshtein selfJoin equals the full-DP reference") {
    import spark.implicits._
    val names = Seq("green", "greene", "grene", "greeny", "blue",
      "blues", "blau", "navy blue", "navy-blue", "navyblue",
      "olive drab", "olive  drab", "olivedrab", "x", "xy", "xyz")
      .toDF("name")
    val got = FuzzyJoin.selfJoin(names, col("name"), maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    // Naive reference: full cross product, full Levenshtein.
    val vals = names.as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- vals; b <- vals if a < b
      dist = lev(a, b) if dist <= 2
    } yield (a, b, dist)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("maxDist = 0 degenerates to exact-duplicate detection (none on distinct input)") {
    import spark.implicits._
    val names = Seq("a", "b", "ab").toDF("name")
    assert(FuzzyJoin.selfJoin(names, col("name"), maxDist = 0).count() == 0L)
  }
}
