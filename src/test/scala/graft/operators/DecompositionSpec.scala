package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecompositionSpec extends SparkSpec {
  import spark.implicits._

  private def toDF(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  test("covariance matches the naive two-pass computation") {
    val vs = Seq(
      Array(1.0f, 2.0f, 0.5f),
      Array(0.0f, 1.0f, -0.5f),
      Array(2.0f, 0.0f, 1.5f),
      Array(1.0f, 1.0f, 0.0f))
    val got = Decomposition.covariance(toDF(vs), $"embedding", 3)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val n = vs.size.toDouble
    for (i <- 0 until 3; j <- i until 3) {
      val mi = vs.map(_(i).toDouble).sum / n
      val mj = vs.map(_(j).toDouble).sum / n
      val expect = vs.map(v => v(i).toDouble * v(j).toDouble).sum / n - mi * mj
      assert(math.abs(got((i + 1, j + 1)) - expect) < 1e-6,
        s"cell ($i,$j): ${got((i + 1, j + 1))} vs $expect")
    }
  }

  test("covariance buffer merges across partitions consistently") {
    val vs = (0 until 64).map(i =>
      Array.tabulate(4)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 4f))
    val one = Decomposition.covariance(toDF(vs).coalesce(1), $"embedding", 4)
      .orderBy("i", "j").collect().map(_.getDouble(2)).toSeq
    val many = Decomposition.covariance(toDF(vs).repartition(7), $"embedding", 4)
      .orderBy("i", "j").collect().map(_.getDouble(2)).toSeq
    assert(one == many) // exact long accumulation => bitwise equal
  }

  test("topEigen recovers the dominant eigenvector of a known matrix") {
    // diag(5, 2, 1) rotated by nothing: eigenvector = e1, eigenvalue 5.
    val cov = Seq((1, 1, 5.0), (1, 2, 0.0), (1, 3, 0.0),
      (2, 2, 2.0), (2, 3, 0.0), (3, 3, 1.0)).toDF("i", "j", "cov")
    val (lambda, v) = Decomposition.topEigen(cov, 3)
    assert(math.abs(lambda - 5.0) < 1e-9)
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-9)
    assert(math.abs(v(1)) < 1e-9 && math.abs(v(2)) < 1e-9)
  }

  test("project appends literal-component scores") {
    val df = toDF(Seq(Array(1.0f, 2.0f), Array(3.0f, -1.0f)))
    val out = Decomposition.project(df, $"embedding",
      Seq(Array(1.0, 0.0), Array(0.5, 0.5)))
    val rows = out.orderBy("vec_id").collect()
    assert(rows(0).getAs[Double]("pc1") == 1.0)
    assert(rows(0).getAs[Double]("pc2") == 1.5)
    assert(rows(1).getAs[Double]("pc1") == 3.0)
    assert(rows(1).getAs[Double]("pc2") == 1.0)
  }

  test("signProject emits outDim components per vector, norm-preserving on average") {
    val vs = (0 until 32).map(i =>
      Array.tabulate(8)(d => (((i + d) % 5) - 2).toFloat))
    val out = Decomposition.signProject(toDF(vs), $"vec_id", $"embedding", outDim = 4)
    val perVec = out.groupBy("id").agg(count(lit(1)).as("k")).collect()
    assert(perVec.length == 32 && perVec.forall(_.getLong(1) == 4L))
    // JL with the full +-1 matrix preserves squared norm in expectation:
    // the corpus-level ratio should land near 1 (loose bound, deterministic).
    val projSq = out.agg(sum($"proj" * $"proj")).head().getDouble(0)
    val origSq = vs.map(_.map(x => x.toDouble * x.toDouble).sum).sum
    assert(projSq > 0.2 * origSq && projSq < 5.0 * origSq)
  }

  test("empty input yields empty output, not NaNs or crashes") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Decomposition.covariance(empty, $"embedding", 4).count() == 0)
    assert(Decomposition.signProject(empty, $"vec_id", $"embedding", 4).count() == 0)
    assert(Decomposition.diagMahalanobis(empty, $"vec_id", $"embedding").count() == 0)
  }

  test("signProject is invariant to input partitioning") {
    val vs = (0 until 16).map(i => Array.tabulate(6)(d => (i * d % 7 - 3).toFloat))
    val a = Decomposition.signProject(toDF(vs).coalesce(1), $"vec_id", $"embedding", 3)
      .orderBy("id", "k").collect().map(_.getDouble(2)).toSeq
    val b = Decomposition.signProject(toDF(vs).repartition(5), $"vec_id", $"embedding", 3)
      .orderBy("id", "k").collect().map(_.getDouble(2)).toSeq
    assert(a == b)
  }
}
