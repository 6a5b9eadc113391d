package graft.functions

/** Space-filling-curve kernels (static forwarders for generated code).
  *
  * [[hilbert2]] is the classic 2-D xy→d walk (quadrant accumulation +
  * reflect/rotate per level, as published on the Hilbert-curve
  * literature's standard C form): pure integer arithmetic, so the
  * DuckDB oracle reproduces it bit-for-bit from an unrolled CTE chain
  * (`ZOrder.hilbertSqlDuck`).
  */
object Curves {

  /** Hilbert index of grid cell (x, y), each in [0, 2^bits). */
  def hilbert2(xIn: Long, yIn: Long, bits: Int): Long = {
    // bits > 31 overflows the s·s·3 accumulator term (3·2^62 wraps
    // negative) — a curve key that silently DESTROYS clustering
    // instead of failing; out-of-range coordinates corrupt the walk
    // the same way. Callers quantize into [0, 2^bits) via rankSql.
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(xIn >= 0 && xIn < (1L << bits) && yIn >= 0 && yIn < (1L << bits),
      s"coordinates ($xIn, $yIn) outside [0, 2^$bits)")
    val n1 = (1L << bits) - 1L
    var x = xIn
    var y = yIn
    var d = 0L
    var sb = bits - 1
    while (sb >= 0) {
      val s = 1L << sb
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // reflect (rx=1) then transpose, the ry=0 rotation
      if (ry == 0) {
        if (rx == 1) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      sb -= 1
    }
    d
  }
}
