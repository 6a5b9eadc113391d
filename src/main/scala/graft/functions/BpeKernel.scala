package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE merge kernels (operators/Bpe.scala's hot path).
  *
  * The greedy left-to-right single-pair merge is intrinsically a
  * sequential scan with one token of lookahead — expressed over
  * Catalyst array HOFs it costs a `sequence` + `filter` + `transform`
  * allocation chain per document per merge, and the encode pass
  * (one projection layer per learned merge) compounds that into a
  * codegen unit big enough that its FIRST execution pays tens of
  * seconds of JIT (measured: 62 s cold / 4.3 s steady at sf0.1 for 10
  * merge rounds). Here each merge is one branch-per-token loop over
  * `UTF8String`s — no decode to java.lang.String, no intermediate
  * arrays — and the expressions stay inside whole-stage codegen as a
  * static kernel call, the family convention (Expressions.scala).
  *
  * Merge semantics (shared by both expressions, and replayed exactly
  * by the DuckDB oracle's `list_reduce` fold): scan left to right;
  * at a match of (l, r) emit the merged symbol and advance TWO
  * positions — so matches never overlap and, for l == r, a run
  * "a a a" merges its FIRST two symbols only. This is exactly the
  * fold/vectorized pair this kernel replaced (git: Bpe.scala
  * mergeFold/mergeVectorized) for both the l == r and l != r cases.
  */
object BpeKernel {

  /** One trained merge list, embedded into the expression tree as a
    * codegen reference object. Parallel arrays, adoption order.
    */
  final class Merges(val l: Array[UTF8String], val r: Array[UTF8String],
      val merged: Array[UTF8String]) extends Serializable {
    override def toString: String = s"Merges(${l.length})"
  }

  def merges(pairs: Seq[(String, String)]): Merges = new Merges(
    pairs.map(p => UTF8String.fromString(p._1)).toArray,
    pairs.map(p => UTF8String.fromString(p._2)).toArray,
    pairs.map(p => UTF8String.fromString(s"${p._1} ${p._2}")).toArray)

  /** One in-place greedy pass over `buf[0, n)`; returns the new length.
    * Null elements (impossible from wordTokens, tolerated defensively)
    * never match and copy through.
    */
  private def pass(buf: Array[UTF8String], n: Int, l: UTF8String,
      r: UTF8String, m: UTF8String): Int = {
    var i = 0
    var w = 0
    while (i < n) {
      if (i + 1 < n && l.equals(buf(i)) && r.equals(buf(i + 1))) {
        buf(w) = m; i += 2
      } else {
        buf(w) = buf(i); i += 1
      }
      w += 1
    }
    w
  }

  private def load(arr: ArrayData): Array[UTF8String] = {
    val n = arr.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      buf(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    buf
  }

  /** Apply ONE merge; returns the rewritten symbol array (the
    * training-round rewrite).
    */
  def mergeOne(arr: ArrayData, l: UTF8String, r: UTF8String,
      m: UTF8String): ArrayData = {
    val buf = load(arr)
    val w = pass(buf, buf.length, l, r, m)
    new GenericArrayData(java.util.Arrays.copyOf(
      buf.asInstanceOf[Array[AnyRef]], w))
  }

  /** Apply EVERY merge in adoption order; returns only the final
    * symbol count (all the encode report needs) — one buffer, zero
    * intermediate arrays across the merge layers.
    */
  def encodeLen(arr: ArrayData, ms: Merges): Int = {
    val buf = load(arr)
    var n = buf.length
    var k = 0
    while (k < ms.l.length && n >= 2) {
      n = pass(buf, n, ms.l(k), ms.r(k), ms.merged(k))
      k += 1
    }
    n
  }
}

/** Greedy single-merge rewrite of a symbol array (one BPE training
  * round). `l`/`r` are plan-time constants — the merge adopted by the
  * round's corpus-wide argmax.
  */
case class BpeMergeOne(child: Expression, l: String, r: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeMergeOne expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)
  @transient private lazy val mU = UTF8String.fromString(s"$l $r")
  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.mergeOne(v.asInstanceOf[ArrayData], lU, rU, mU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU, classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeR", rU, classOf[UTF8String].getName)
    val mRef = ctx.addReferenceObj("bpeM", mU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernel.mergeOne($c, $lRef, $rRef, $mRef)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMergeOne =
    copy(child = c)
}

/** Encoded symbol count after applying a full trained merge list in
  * adoption order (the BPE serving pass, fused: one kernel call per
  * document instead of one projection layer per merge).
  */
case class BpeEncodeLen(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeEncodeLen expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  @transient private lazy val ms = BpeKernel.merges(pairs)
  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.encodeLen(v.asInstanceOf[ArrayData], ms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msRef = ctx.addReferenceObj("bpeMerges", ms,
      classOf[BpeKernel.Merges].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernel.encodeLen($c, $msRef)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeLen =
    copy(child = c)
}
