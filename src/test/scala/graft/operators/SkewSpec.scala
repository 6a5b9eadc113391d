package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted join (q77): multiset equality with the plain join, including
  * duplicate rows (identical rows salt identically — still joined,
  * still present with the right multiplicity).
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join as a multiset") {
    import spark.implicits._
    // One scorching key ('a': 500 rows incl. duplicates), two cold ones.
    val big = ((1 to 500).map(i => ("a", i % 50)) ++
      Seq(("b", 1), ("b", 2), ("c", 9))).toDF("k", "v")
    val small = Seq(("a", 10), ("b", 20), ("d", 40)).toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"v", $"w").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = canon(big.join(small, Seq("k")))
    val salted = canon(Skew.saltedJoin(big, small, "k", salts = 8))
    assert(salted == plain)
    assert(plain.valuesIterator.sum == 502, "join should keep multiplicity")
  }

  test("salts=1 degenerates to the plain join") {
    import spark.implicits._
    val big = Seq(("x", 1), ("x", 1)).toDF("k", "v")
    val small = Seq(("x", 7)).toDF("k", "w")
    assert(Skew.saltedJoin(big, small, "k", 1).count() == 2)
  }
}
