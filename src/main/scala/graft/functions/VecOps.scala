package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels over Catalyst `ArrayData` (`array<float>`),
  * called from whole-stage-generated code — the hot loops of the
  * similarity family (SURVEY.md §2.10 scalar surface; embedding ops).
  *
  * Reading `ArrayData` directly skips the per-call deserialization a
  * Scala UDF pays (UnsafeArrayData → ArraySeq[Float] + boxing per
  * element): on pair-verification workloads the conversion dominates
  * the arithmetic, so this is the difference between "UDF that happens
  * to loop primitives" and an actual codegen'd kernel.
  *
  * All accumulation is double, in index order — bit-identical to the
  * UDF forms in `graft.operators.Similarity` and to the DuckDB oracle's
  * `list_cosine_similarity`/`list_inner_product` over DOUBLE[].
  */
object VecOps {

  /** Mismatched lengths would read past the shorter buffer's
    * UnsafeArrayData region — silent garbage, never an exception —
    * so every two-vector kernel checks up front (two int loads; noise
    * next to the multiply loop). DuckDB's list_inner_product errors on
    * the same condition.
    */
  @inline private def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  // Element access is typed per kernel (getFloat reads 4 bytes of an
  // 8-byte slot on a double array — silently wrong, never an error),
  // so the expressions dispatch on each child's array element type:
  // suffix F = array<float>, D = array<double>, in argument order.

  /** Null ELEMENTS are the other silent-garbage hazard: the analysis
    * check must accept containsNull=true (parquet-read float arrays
    * carry it even when no null exists), and the typed getters read a
    * null slot as 0.0 — a silently-skewed dot/norm, never an error.
    * The Scala UDF forms these kernels are bit-identical to fail
    * loudly on a null element; so do we. The bitmap test is
    * never-taken-branch cheap next to the multiply.
    */
  @inline private def checkElem(a: ArrayData, b: ArrayData, i: Int): Unit =
    if (a.isNullAt(i) || b.isNullAt(i))
      throw new IllegalArgumentException(
        s"null vector element at index $i: embedding arrays must be dense")

  @inline private def checkElem1(a: ArrayData, i: Int): Unit =
    if (a.isNullAt(i))
      throw new IllegalArgumentException(
        s"null vector element at index $i: embedding arrays must be dense")

  /** Σ a_i·b_i in double, index order. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var d = 0.0
    var i = 0
    while (i < n) { checkElem(a, b, i); d += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    d
  }

  /** Float-vector · double-vector (embedding against a literal
    * hyperplane/centroid): each float widens to double before the
    * multiply — the bits DuckDB gets from `list_inner_product(
    * CAST(emb AS DOUBLE[]), plane)`. */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var d = 0.0
    var i = 0
    while (i < n) { checkElem(a, b, i); d += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    d
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var d = 0.0
    var i = 0
    while (i < n) { checkElem(a, b, i); d += a.getDouble(i) * b.getDouble(i); i += 1 }
    d
  }

  /** Fused cosine: dot and both norms in one pass (same accumulation
    * order as the three-loop form — the partial sums are independent).
    */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      checkElem(a, b, i)
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDD(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      checkElem(a, b, i)
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineFD(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      checkElem(a, b, i)
      val x = a.getFloat(i).toDouble
      val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDF(a: ArrayData, b: ArrayData): Double = cosineFD(b, a)

  /** L2 norm, double accumulation in index order. */
  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { checkElem1(a, i); val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def normD(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { checkElem1(a, i); val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }
}
