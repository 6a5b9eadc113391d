package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvOverlapSpec extends SparkSpec {

  // Three sources; a/b share the "alpha beta gamma delta" run (2 shared
  // trigrams), c is disjoint.
  private def docs = {
    import spark.implicits._
    Seq(
      ("a", "alpha beta gamma delta one two three four"),
      ("a", "red green blue cyan"),
      ("b", "alpha beta gamma delta five six seven"),
      ("c", "omega psi chi phi")
    ).toDF("source", "text")
  }

  test("unsaturated sketches are exact: m = exact_inter, union_est = ku") {
    import spark.implicits._
    // k far above every set size -> the sketch IS the hash set.
    val out = KmvOverlap.sourceOverlap(docs, $"source", $"text", n = 3, k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a: 6+2=8 trigrams, b: 5, shared: "alpha beta gamma","beta gamma delta".
    val (m, ku, unionEst, interEst, exact) = out(("a", "b"))
    assert(exact == 2L && m == 2L)
    assert(ku == 11L && unionEst == 11.0) // |a ∪ b| = 8 + 5 - 2
    assert(interEst == 2.0)               // m/ku * ku = m below saturation
    // Disjoint pairs: everything zero except the union size.
    for (p <- Seq(("a", "c"), ("b", "c"))) {
      val (m2, ku2, u2, i2, e2) = out(p)
      assert(m2 == 0L && e2 == 0L && i2 == 0.0 && u2 == ku2.toDouble)
    }
  }

  test("saturated sketches stay k-bounded and estimates stay sane") {
    import spark.implicits._
    val k = 4
    val out = KmvOverlap.sourceOverlap(docs, $"source", $"text", n = 3, k = k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    val (m, ku, unionEst, _, exact) = out(("a", "b"))
    assert(ku == k.toLong, "merged k-min set must cap at k")
    assert(m <= k && exact == 2L)
    // (k-1)/u_k with u_k in (0,1]: positive, and at least the k
    // observed distinct hashes minus one.
    assert(unionEst >= (k - 1).toDouble)
  }
}
