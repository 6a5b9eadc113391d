package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Embedding-matrix decomposition: covariance / Gram statistics, PCA by
  * power iteration, and Johnson-Lindenstrauss sign projection — the
  * dimensionality-reduction toolkit a training-data pipeline runs before
  * ANN indexing or whitening (PQ codebooks train better on decorrelated
  * axes; JL projection shrinks vectors before LSH).
  *
  * Scale design: the covariance pass is ONE typed aggregation whose
  * buffer is the d(d+1)/2 upper-triangle of sufficient statistics —
  * map-side partial combine collapses each partition to a single ~17 KB
  * buffer, so the exchange carries P buffers regardless of corpus size
  * (the `RowMatrix.computeGramianMatrix` shape from Spark MLlib,
  * re-expressed on the Dataset aggregator surface). Power iteration then
  * runs driver-side on the d×d matrix — metadata-scale (d=64 → 32 KB),
  * never the corpus. The JL projection joins a BROADCAST d×k sign matrix
  * (1 024 rows, derived once) against the exploded vectors; the only
  * data-sized exchange carries the n·k output rows themselves.
  *
  * Determinism / oracle parity: float sums are order-dependent, so every
  * accumulated term is first scaled to a LONG — floor(x·1e9 + 0.5),
  * identical IEEE ops in Spark and DuckDB — and summed exactly; the
  * double epilogue (divide by n, subtract the mean product) runs in one
  * fixed operation order on both engines. The JL sign matrix derives
  * from md5("jl<seed>:j:k"), replayable in DuckDB as
  * `('0x' || substr(md5(...),1,8))::BIGINT`.
  */
object Decomposition {

  /** Fixed-point term: floor(c·1e9 + 0.5) clamped into Long range
    * BEFORE the cast — under Spark 4's default ANSI mode an unclamped
    * double→long cast THROWS for |c| ≳ 9.2e9 (e.g. one corrupt
    * embedding element from a bad ingest), killing the very anomaly
    * screen meant to flag that vector. Clamped terms keep the row and
    * score it at the scale ceiling instead; values this large never
    * occur in sane embeddings, so oracle parity is unaffected.
    */
  private def scaledLong(c: Column): Column =
    least(greatest(floor(c * 1e9 + 0.5), lit(-9.0e18)), lit(9.0e18))
      .cast("long")

  /** Scaled-long sufficient statistics for a d-dim covariance matrix:
    * n rows, per-dim sums, and the upper-triangle pair-product sums.
    * Longs make merge order irrelevant (exact integer addition); at
    * 1e9-scaling a billion rows of unit-scale products stay under 2^63.
    */
  case class CovBuf(var n: Long, s: Array[Long], p: Array[Long])

  /** One output cell of the covariance matrix (1-based dims, i <= j). */
  case class CovCell(i: Int, j: Int, cov: Double)

  private[operators] def scaled(x: Double): Long =
    math.floor(x * 1e9 + 0.5).toLong

  /** Typed aggregate producing the exact (scaled-long) covariance
    * upper triangle in one pass. The buffer is mutated in place: the
    * aggregation framework deserializes it once per update, so
    * reduce/merge run allocation-free over the ~2 100-long state.
    */
  class CovAgg(d: Int) extends Aggregator[Array[Float], CovBuf, Seq[CovCell]] {
    private val tri = d * (d + 1) / 2

    def zero: CovBuf = CovBuf(0L, new Array[Long](d), new Array[Long](tri))

    def reduce(b: CovBuf, v: Array[Float]): CovBuf = {
      require(v.length == d, s"dim mismatch: ${v.length} != $d")
      b.n += 1
      var i = 0
      var t = 0
      while (i < d) {
        val xi = v(i).toDouble
        b.s(i) += scaled(xi)
        var j = i
        while (j < d) {
          b.p(t) += scaled(xi * v(j).toDouble)
          j += 1; t += 1
        }
        i += 1
      }
      b
    }

    def merge(x: CovBuf, y: CovBuf): CovBuf = {
      x.n += y.n
      var i = 0
      while (i < d) { x.s(i) += y.s(i); i += 1 }
      var t = 0
      while (t < tri) { x.p(t) += y.p(t); t += 1 }
      x
    }

    /** cov(i,j) = E[xy] − E[x]E[y], formed in a fixed double-op order
      * from the exact longs so any engine replaying the same longs gets
      * the same cell bit-for-bit (callers round for display).
      */
    def finish(b: CovBuf): Seq[CovCell] = {
      if (b.n == 0) return Vector.empty // empty input: no cells, not NaNs
      val n = b.n.toDouble
      val out = Vector.newBuilder[CovCell]
      var i = 0
      var t = 0
      while (i < d) {
        val mi = b.s(i) / 1e9 / n
        var j = i
        while (j < d) {
          val mj = b.s(j) / 1e9 / n
          out += CovCell(i + 1, j + 1, b.p(t) / 1e9 / n - mi * mj)
          j += 1; t += 1
        }
        i += 1
      }
      out.result()
    }

    def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    def outputEncoder: Encoder[Seq[CovCell]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[CovCell]]()
  }

  /** Upper-triangle covariance matrix of a float-array column as rows
    * (i, j, cov) with 1-based dims (matching SQL `generate_subscripts`).
    */
  def covariance(embs: DataFrame, vec: Column, dim: Int): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs.select(vec.cast("array<float>")).as[Array[Float]]
      .select(new CovAgg(dim).toColumn.name("cells"))
      .select(explode($"cells").as("c"))
      .select($"c.i".as("i"), $"c.j".as("j"), $"c.cov".as("cov"))
  }

  /** Driver-side power iteration on the (i, j, cov) triangle — d×d is
    * metadata-scale, so the collect is a legitimate broadcast pattern
    * (same rationale as the k-means centroid pull). Deterministic:
    * fixed start vector (1/sqrt(d)), fixed iteration count, no
    * randomness. Returns (eigenvalue, eigenvector).
    */
  def topEigen(cov: DataFrame, dim: Int, iters: Int = 30): (Double, Array[Double]) = {
    val m = Array.ofDim[Double](dim, dim)
    cov.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      val i = r.getInt(0) - 1; val j = r.getInt(1) - 1; val c = r.getDouble(2)
      m(i)(j) = c; m(j)(i) = c
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += m(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      var sq = 0.0
      var i2 = 0
      while (i2 < dim) { sq += w(i2) * w(i2); i2 += 1 }
      val nrm = math.sqrt(sq)
      if (nrm > 0) { var i3 = 0; while (i3 < dim) { w(i3) /= nrm; i3 += 1 } }
      lambda = nrm
      v = w
      it += 1
    }
    (lambda, v)
  }

  /** Σ c(i)·vec[i] as a fixed-order codegen'd expression chain — the
    * component rides into the plan as literals, so projection is pure
    * per-row arithmetic (no broadcast variable, no UDF).
    */
  def dotLiteral(vec: Column, c: Array[Double]): Column =
    c.zipWithIndex.map { case (w, i) => vec.getItem(i) * lit(w) }
      .reduce(_ + _)

  /** Project a float-array column onto fixed component vectors (e.g.
    * the top eigenvectors from [[topEigen]]), appended as pc1..pcK.
    */
  def project(embs: DataFrame, vec: Column, components: Seq[Array[Double]]): DataFrame = {
    val cols = components.zipWithIndex.map { case (c, k) =>
      dotLiteral(vec, c).as(s"pc${k + 1}")
    }
    embs.select(embs.columns.map(col).toSeq ++ cols: _*)
  }

  /** Per-vector outlier score: the diagonal-Mahalanobis distance
    * Σ_j ((x_j − μ_j)/σ_j)² — the cheap embedding-anomaly screen a
    * pipeline runs before ANN indexing (degenerate/corrupt vectors
    * score far from every axis). Full Mahalanobis needs Σ⁻¹; the
    * diagonal form needs only the d-row per-dimension moment table,
    * which is one map-side-combined aggregate + a broadcast join.
    *
    * Determinism: moments accumulate as scaled longs (exact); each
    * per-dimension term is formed in a fixed double-op order and
    * rounded to 1e-6, and the per-vector sum runs in decimal — order-
    * independent on both engines. Zero-variance dimensions contribute
    * 0 (constant dimensions carry no outlier signal).
    */
  def diagMahalanobis(embs: DataFrame, id: Column, vec: Column): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val x = embs.select(id.as("id"), posexplode(vec.cast("array<float>")).as(Seq("j0", "x")))
      .select($"id", $"j0", $"x".cast("double").as("x"))
    val stats = x.groupBy($"j0").agg(
      sum(scaledLong($"x")).as("s"),
      sum(scaledLong($"x" * $"x")).as("p"),
      count(lit(1)).as("n"))
    val term = x.join(broadcast(stats), Seq("j0"))
      .select($"id", {
        val mu = $"s" / 1e9 / $"n"
        val variance = $"p" / 1e9 / $"n" - mu * mu
        val z = ($"x" - mu) / sqrt(variance)
        graft.operators.Curation.floorRound(when(variance <= 0, 0.0).otherwise(z * z), 6).as("t")
      })
    term.groupBy($"id")
      .agg(graft.operators.Curation.floorRound(sum($"t".cast("decimal(38,6)")).cast("double"), 6).as("maha2"))
  }

  /** The d×outDim JL sign matrix as a DataFrame (j0 0-based element
    * index, k 1-based component, sign ±1) — d·outDim rows derived from
    * md5, computed once and broadcast.
    */
  private def signMatrix(spark: org.apache.spark.sql.SparkSession,
                         dim: Int, outDim: Int, seed: Int): DataFrame = {
    import spark.implicits._
    val js = spark.range(0, dim).select($"id".cast("int").as("j0"))
    val ks = spark.range(1, outDim + 1).select($"id".cast("int").as("k"))
    js.crossJoin(ks).select($"j0", $"k",
      when(conv(substring(md5(concat(lit(s"jl$seed:"),
        ($"j0" + 1).cast("string"), lit(":"), $"k".cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long") % 2 === 0, 1.0)
        .otherwise(-1.0).as("sign"))
  }

  /** Johnson-Lindenstrauss sign projection: out_k = (Σ_j x_j·sign(j,k))
    * / sqrt(outDim), with sign(j,k) = ±1 from the low bit of
    * md5("jl<seed>:j:k") — a data-independent matrix both engines can
    * derive, so the oracle replays it exactly (Achlioptas 2003's
    * database-friendly random projection).
    *
    * Output rows (id, k, proj) with k 1-based; proj rounded to 1e-6.
    * Each term is scaled to a long (exact addition), making the result
    * independent of both partitioning and SQL aggregation order.
    *
    * Shape: `posexplode` of the vector (narrow), broadcast-join the
    * tiny sign matrix, then a partial→final aggregate keyed by (id, k)
    * — at 100 TB the exchange carries n·outDim small rows, the
    * unavoidable output size.
    */
  def signProject(embs: DataFrame, id: Column, vec: Column,
                  outDim: Int, seed: Int = 42): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    // Vector dimension from the first non-null row — the embedding
    // ops' homogeneous-dim corpus contract (CovAgg enforces it with an
    // explicit error; here rows of a DIFFERENT dim would silently
    // project only their first `dim` components, so hold the contract
    // upstream). The null filter keeps a null-first corpus from
    // throwing on size(null) under ANSI.
    val dim = embs.where(vec.isNotNull).select(size(vec)).head(1) match {
      case Array(r) => r.getInt(0)
      case _ => return embs.sparkSession.emptyDataFrame
        .select(lit(0L).as("id"), lit(0).as("k"), lit(0.0).as("proj"))
        .limit(0)
    }
    val m = signMatrix(spark, dim, outDim, seed)
    embs.select(id.as("id"), posexplode(vec.cast("array<float>")).as(Seq("j0", "x")))
      .join(broadcast(m), Seq("j0"))
      .select($"id", $"k",
        scaledLong($"x".cast("double") * $"sign").as("t"))
      .groupBy($"id", $"k")
      // floorRound6 (rule 9): plain round() split Spark/DuckDB on a
      // half-ulp boundary — observed live at sf1 on this epilogue.
      // (No -0.0 guard needed: floor's long result casts to +0.0.)
      .agg(Curation.floorRound6(sum($"t") / 1e9 / math.sqrt(outDim.toDouble))
        .as("proj"))
  }
}
