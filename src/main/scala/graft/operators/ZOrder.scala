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
    // (x - mn) * maxRank must stay in Long for the integer-exact claim:
    // a wrapped product would bleed garbage bits into every dim's
    // interleave slots (and diverge from DuckDB's exact //). Literal
    // bounds are checked here; data-derived bounds at withZValue.
    for ((name, mn, mx) <- dims) {
      val (mnL, mxL) = (mn.toLongOption, mx.toLongOption)
      if (mnL.isDefined && mxL.isDefined)
        require(mxL.get - mnL.get <= Long.MaxValue / math.max(1L, maxRank),
          s"dim $name range ${mxL.get - mnL.get} overflows rank scaling at $bits bits")
    }
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

  /** Quantized rank of one dimension — the per-dimension scaling both
    * curve keys share: (x - mn)·(2^bits - 1) div (mx - mn), integer
    * division in either dialect.
    */
  def rankSql(x: String, mn: String, mx: String, bits: Int,
      duck: Boolean): String = {
    val maxRank = (1L << bits) - 1
    val div = if (duck) "//" else "div"
    s"(((($x) - ($mn)) * $maxRank) $div (($mx) - ($mn)))"
  }

  /** Hilbert (2-D) clustering key — same goal as the z-value, better
    * locality: consecutive key values are ALWAYS grid neighbors (the
    * Morton curve jumps across the space at bit boundaries), so a
    * range of files covers a tighter hyper-box and min/max pruning
    * discards more. This is the curve lakehouse OPTIMIZE layouts
    * prefer over Morton when two dimensions dominate query predicates.
    *
    * The per-row walk is a native codegen expression
    * ([[graft.functions.Curves.hilbert2]]) — its reflect/rotate state
    * updates would exponentially duplicate as nested SQL CASE
    * expressions, which is exactly what a fused JIT loop avoids — and
    * the oracle replays it as an unrolled CTE chain
    * ([[hilbertSqlDuck]]), one CTE per level, pure integer arithmetic.
    */
  def withHilbertValue(df: DataFrame, dims: Seq[(String, Long, Long)],
      bits: Int): DataFrame = {
    require(dims.length == 2, s"hilbert2 is 2-D, got ${dims.length} dims")
    dims.foreach { case (x, mn, mx) =>
      require(mx > mn, s"degenerate dimension range [$mn,$mx] for $x")
      require(mx - mn <= Long.MaxValue / math.max(1L, (1L << bits) - 1),
        s"dim $x range ${mx - mn} overflows rank scaling at $bits bits")
    }
    val ranks = dims.map { case (x, mn, mx) =>
      expr(rankSql(x, mn.toString, mx.toString, bits, duck = false))
    }
    df.withColumn("hv",
      graft.functions.F.hilbert2(ranks(0), ranks(1), bits))
  }

  /** The Hilbert layout op (see [[layoutByZ]]). */
  def layoutByHilbert(df: DataFrame, dims: Seq[(String, Long, Long)],
      bits: Int, parts: Int): DataFrame =
    withHilbertValue(df, dims, bits)
      .repartitionByRange(parts, col("hv"))
      .sortWithinPartitions(col("hv"))

  /** DuckDB CTE chain replaying [[graft.functions.Curves.hilbert2]]
    * step for step: `h0` holds the ranks and d=0; CTE `h{i+1}` applies
    * level `bits-1-i`'s quadrant accumulation and reflect/rotate with
    * uniquely-named columns per step (no same-SELECT alias shadowing).
    * Final index is `d$bits` in CTE `h$bits`.
    */
  def hilbertSqlDuck(carry: Seq[String], xRank: String, yRank: String,
      bits: Int, from: String): String = {
    val n1 = (1L << bits) - 1
    val cs = carry.mkString(", ")
    val steps = (0 until bits).map { i =>
      val sb = bits - 1 - i
      val ss = 1L << (2 * sb) // s·s for s = 2^sb
      val (px, py, pd) = (s"x$i", s"y$i", s"d$i")
      val rx = s"(($px >> $sb) & 1)"
      val ry = s"(($py >> $sb) & 1)"
      // (3·rx) XOR ry over rx,ry ∈ {0,1} = rx=1 ? 3-ry : ry (xor-free,
      // dialect-proof); rotation reflects with n-1 then transposes.
      s"""h${i + 1} AS (SELECT $cs,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $n1 - $py ELSE $py END) ELSE $px END AS x${i + 1},
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $n1 - $px ELSE $px END) ELSE $py END AS y${i + 1},
         |  $pd + $ss * (CASE WHEN $rx = 1 THEN 3 - $ry ELSE $ry END) AS d${i + 1}
         |  FROM h$i)""".stripMargin
    }
    s"""h0 AS (SELECT $cs, $xRank AS x0, $yRank AS y0, 0 AS d0 FROM $from),
       |${steps.mkString(",\n")}""".stripMargin
  }
}
