package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — multi-dimensional clustering
  * for scan pruning. Writing 100 TB sorted by ONE key gives perfect
  * pruning on that key and none on any other; interleaving the bits of
  * several keys gives every dimension ~1/d of the pruning power, which
  * is what lakehouse OPTIMIZE/CLUSTER BY layouts use. The operator is
  * pure arithmetic + one range exchange: quantize each dimension to
  * `bits` with exact integer min/max scaling, interleave bits, then
  * repartitionByRange + sortWithinPartitions on the z-value so each
  * output file covers a small hyper-box of the key space (file-level
  * min/max stats then prune multi-dimensionally).
  *
  * All arithmetic is integer-exact and generated once for BOTH
  * dialects (Spark SQL `div`/`shiftright`, DuckDB `//`/`>>`), so an
  * external SQL engine reproduces z-values bit-for-bit.
  */
object ZOrder {

  /** Quantize-and-interleave SQL for dimensions given as expression
    * strings (value, min, max) — min/max may be literals or references
    * to a stats subquery. rank_i = (x_i - mn_i)·(2^bits - 1) div
    * (mx_i - mn_i); z = Σ_b Σ_i bit_b(rank_i) << (b·d + i). Integer
    * division throughout: exact in both dialects.
    */
  def zSql(dims: Seq[(String, String, String)], bits: Int, duck: Boolean): String = {
    val d = dims.length
    val maxRank = (1L << bits) - 1
    require(bits * d <= 62, s"$d dims at $bits bits overflow a long")
    def idiv(a: String, b: String) = if (duck) s"(($a) // ($b))" else s"(($a) div ($b))"
    def shr(a: String, n: Int) = if (duck) s"(($a) >> $n)" else s"shiftright($a, $n)"
    def shl(a: String, n: Int) = if (duck) s"(($a) << $n)" else s"shiftleft($a, $n)"
    val ranks = dims.map { case (x, mn, mx) =>
      idiv(s"(($x) - ($mn)) * $maxRank", s"($mx) - ($mn)")
    }
    val terms = for (b <- 0 until bits; i <- 0 until d)
      yield shl(s"(${shr(ranks(i), b)} & 1)", b * d + i)
    terms.mkString("(", " + ", ")")
  }

  /** DataFrame with a `zv` column appended, dimensions scaled by
    * literal [min,max] bounds (Spark dialect; constant-folded). The
    * bounds must cover the data: values outside [min,max] produce
    * out-of-range ranks and a meaningless key (compute bounds from the
    * data, as q70 does, or clamp upstream).
    */
  def withZValue(df: DataFrame, dims: Seq[(String, Long, Long)], bits: Int): DataFrame = {
    dims.foreach { case (x, mn, mx) =>
      require(mx > mn, s"degenerate dimension range [$mn,$mx] for $x")
    }
    val dd = dims.map { case (x, mn, mx) => (x, mn.toString, mx.toString) }
    df.withColumn("zv", expr(zSql(dd, bits, duck = false)))
  }

  /** The layout op: cluster rows into `parts` z-contiguous partitions,
    * sorted within each — what a writer would emit as z-ordered files.
    */
  def layoutByZ(df: DataFrame, dims: Seq[(String, Long, Long)], bits: Int,
      parts: Int): DataFrame =
    withZValue(df, dims, bits)
      .repartitionByRange(parts, col("zv"))
      .sortWithinPartitions(col("zv"))
}
