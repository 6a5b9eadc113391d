package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class WeightedSampleSpec extends SparkSpec {

  private def sample(rows: Seq[(String, Long, Long)], k: Int,
                     salt: String): Seq[(String, Long, Long)] = {
    import spark.implicits._
    Curation.weightedSample(rows.toDF("g", "id", "w"),
        col("g"), col("id"), col("w"), k, salt)
      .as[(String, Long, Long)].collect().toSeq
  }

  test("k >= group size returns every row, ranks contiguous from 1") {
    val out = sample(Seq(("a", 1L, 5L), ("a", 2L, 5L), ("b", 3L, 1L)), 5, "s1")
    assert(out.size == 3)
    assert(out.filter(_._1 == "a").map(_._2).sorted == Seq(1L, 2L))
    assert(out.filter(_._1 == "a").map(_._3).sorted == Seq(1L, 2L))
    assert(out.filter(_._1 == "b") == Seq(("b", 1L, 3L)))
  }

  test("without replacement: selected ids are distinct within a group") {
    val rows = (1L to 20L).map(i => ("g", i, i))
    val out = sample(rows, 8, "s2")
    assert(out.size == 8)
    assert(out.map(_._3).distinct.size == 8)
  }

  test("deterministic: same salt reproduces the exact sample") {
    val rows = (1L to 30L).map(i => ("g", i, 1L + i % 7))
    assert(sample(rows, 5, "s3") == sample(rows, 5, "s3"))
  }

  test("inclusion frequency tracks weight across salts") {
    // One group, item 1 carries 10x the weight of items 2..5. With
    // k=1 over many (fixed, deterministic) salts, item 1 must win far
    // more often than any individual light item: P(win) = 10/14 vs
    // 1/14 per trial.
    val rows = Seq(("g", 1L, 10L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 1L), ("g", 5L, 1L))
    val wins = (1 to 40).map { i =>
      sample(rows, 1, s"trial$i").head._3
    }.groupBy(identity).view.mapValues(_.size).toMap
    val heavy = wins.getOrElse(1L, 0)
    val lightMax = (2L to 5L).map(wins.getOrElse(_, 0)).max
    assert(heavy > 20, s"heavy item won only $heavy/40")
    assert(heavy > lightMax)
  }
}
