package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private val D = 4
  private val W = 64

  test("estimates are never below true counts; exact when w >> vocabulary") {
    import spark.implicits._
    val items = Seq.tabulate(500)(i => s"k${i % 20}").toDF("x")
    val sk = CountMin.sketch(items, $"x", D, W)
    val truth = items.groupBy($"x").agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(sk, truth.select($"x"), $"x", D, W)
      .join(truth, $"item" === $"x")
    assert(est.filter($"est" < $"n").count() == 0)
    // 20 keys in 64 buckets × 4 rows: min over rows collides away —
    // with this vocabulary every estimate is exact.
    assert(est.filter($"est" =!= $"n").count() == 0)
    // Counter table is bounded by d·w however many items flow in.
    assert(sk.count() <= D.toLong * W)
  }

  test("sketches merge by counter addition") {
    import spark.implicits._
    val a = Seq.fill(30)("x").++(Seq.fill(10)("y")).toDF("x")
    val b = Seq.fill(5)("x").++(Seq.fill(20)("z")).toDF("x")
    val merged = CountMin.sketch(a, $"x", D, W)
      .unionAll(CountMin.sketch(b, $"x", D, W))
      .groupBy($"j", $"bucket").agg(sum($"c").as("c"))
    val whole = CountMin.sketch(a.unionAll(b), $"x", D, W)
    assert(merged.collect().map(_.toSeq).toSet ==
      whole.collect().map(_.toSeq).toSet)
  }
}
