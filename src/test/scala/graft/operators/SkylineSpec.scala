package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SkylineSpec extends SparkSpec {

  private def frontier(pts: Seq[(Long, Long, Double)]): Set[Long] = {
    import spark.implicits._
    Skyline.frontier2d(pts.toDF("id", "x", "y"), col("x"), col("y"))
      .select("id").as[Long].collect().toSet
  }

  private def brute(pts: Seq[(Long, Long, Double)]): Set[Long] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet

  test("staircase: dominated interior points drop, corners stay") {
    val pts = Seq(
      (1L, 1L, 10.0), (2L, 2L, 8.0), (3L, 3L, 5.0), // frontier staircase
      (4L, 1L, 9.0), (5L, 2L, 5.0), (6L, 1L, 1.0))  // dominated
    assert(frontier(pts) == Set(1L, 2L, 3L))
  }

  test("duplicate frontier coordinates are all kept (mutually non-dominated)") {
    val pts = Seq((1L, 5L, 5.0), (2L, 5L, 5.0), (3L, 1L, 1.0))
    assert(frontier(pts) == Set(1L, 2L))
  }

  test("same x, lower y is dominated; single point survives alone") {
    assert(frontier(Seq((1L, 3L, 7.0), (2L, 3L, 6.0))) == Set(1L))
    assert(frontier(Seq((9L, 0L, 0.0))) == Set(9L))
  }

  test("matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(17)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(100).toDouble))
    assert(frontier(pts) == brute(pts))
  }
}
