package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DDSketchAggSpec extends SparkSpec {

  private val Gamma = 1.01 / 0.99 // alpha = 1%

  private def sketchOf(xs: Seq[Double], parts: Int = 4): DDSketchAgg.Sketch = {
    import spark.implicits._
    val dd = DDSketchAgg.ddsketch(Gamma)
    xs.toDF("v").repartition(parts)
      .agg(dd(col("v")).as("sk"))
      .select("sk.*").as[DDSketchAgg.Sketch].head()
  }

  test("quantile reads are within the relative-error guarantee") {
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(5000)(math.exp(rnd.nextGaussian() * 2)) // 4+ decades
    val sk = sketchOf(xs)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
      val exact = sorted(math.max(0, math.ceil(q * xs.size).toInt - 1))
      val est = DDSketchAgg.quantile(Gamma, sk, q)
      assert(math.abs(est - exact) <= 0.011 * exact,
        s"q=$q exact=$exact est=$est")
    }
  }

  test("partitioning does not change the sketch (mergeability)") {
    val rnd = new scala.util.Random(9)
    val xs = Seq.fill(2000)(rnd.nextDouble() * 1000 + 0.5)
    assert(sketchOf(xs, parts = 1) == sketchOf(xs, parts = 13))
  }

  test("negative and zero values walk in order") {
    val xs = Seq(-100.0, -10.0, 0.0, 0.0, 10.0, 100.0, 1000.0)
    val sk = sketchOf(xs)
    assert(sk.zero == 2L && sk.neg.values.sum == 2L && sk.pos.values.sum == 3L)
    // rank 1-2 are the negatives (most negative first), 3-4 the zeros.
    val q1 = DDSketchAgg.quantile(Gamma, sk, 0.01) // rank 1 → ~-100
    assert(math.abs(q1 + 100.0) <= 1.1)
    assert(DDSketchAgg.quantile(Gamma, sk, 0.5) == 0.0) // rank 4 → zero
    val q99 = DDSketchAgg.quantile(Gamma, sk, 0.99) // rank 7 → ~1000
    assert(math.abs(q99 - 1000.0) <= 11.0)
  }

  test("counts are exact: total matches input size") {
    val xs = Seq.fill(777)(42.0) ++ Seq(-1.0, 0.0)
    assert(sketchOf(xs).total == 779L)
  }
}
