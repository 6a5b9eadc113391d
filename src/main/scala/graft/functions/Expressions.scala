package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the engine's scalar family
  * (SURVEY.md §2.10). Each generates a call to a static forwarder on
  * [[GazetteUuid]]/[[Hashes]], so they stay inside whole-stage codegen
  * rather than falling back to interpreted eval.
  */
/** Analysis-time type gate for the scalar family: a wrong argument
  * type (e.g. a STRING where BINARY is required) must fail when the
  * query is analyzed, not as a per-row ClassCastException or a Janino
  * compile error mid-job — the SQL registration (SqlFunctions) makes
  * these reachable without the Column API's Scala types.
  * (ImplicitCastInputTypes would also coerce, but its inputTypes
  * signature uses the private[sql] AbstractDataType — cast explicitly.)
  */
private[functions] object ScalarChecks {
  def expect(name: String, children: Seq[Expression],
      types: Seq[DataType]): TypeCheckResult =
    children.zip(types).zipWithIndex.collectFirst {
      case ((c, t), i) if c.dataType != t =>
        TypeCheckResult.TypeCheckFailure(s"$name argument ${i + 1} expects " +
          s"${t.simpleString}, got ${c.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** Static kernel for [[FloorRound]] — one arithmetic expression, no
  * branches: NaN and ±Inf pass through `math.floor` unchanged (JLS
  * floor semantics), which is exactly the rule-9 non-finite
  * passthrough the Column-composite form needed an explicit `when`
  * guard for (Spark's floor(double) expression returns LONG).
  */
object RoundKernel {
  def floorRound(v: Double, scale: Double): Double =
    math.floor(v * scale + 0.5) / scale
}

/** Rule-9 floor-scaled rounding as ONE native expression: the Column
  * composite (`when(isnan(c)||c===±Inf, c).otherwise(floor(c·s+.5)/s)`)
  * references its child FIVE times, and when the child is itself an
  * expensive expression (the fused cosine in kcenterGreedy's distTo)
  * the generated code can evaluate it repeatedly — measured 1.25 s →
  * 0.78 s on q120 after this swap. Same value semantics, one child
  * evaluation, stays in whole-stage codegen.
  */
case class FloorRound(child: Expression, digits: Int)
    extends UnaryExpression {
  private val scale = math.pow(10.0, digits)
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("FloorRound", Seq(child), Seq(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    RoundKernel.floorRound(v.asInstanceOf[Double], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RoundKernel.floorRound($c, ${scale}D)")
  override protected def withNewChildInternal(c: Expression): FloorRound =
    copy(child = c)
}

case class UuidClock(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("UuidClock", Seq(child), Seq(BinaryType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    GazetteUuid.clockOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GazetteUuid.clockOf($c)")
  override protected def withNewChildInternal(c: Expression): UuidClock = copy(c)
}

case class UuidFlags(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("UuidFlags", Seq(child), Seq(BinaryType))
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    GazetteUuid.flagsOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GazetteUuid.flagsOf($c)")
  override protected def withNewChildInternal(c: Expression): UuidFlags = copy(c)
}

case class UuidProducer(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("UuidProducer", Seq(child), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    GazetteUuid.producerOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GazetteUuid.producerOf($c)")
  override protected def withNewChildInternal(c: Expression): UuidProducer = copy(c)
}

case class UuidBuild(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("UuidBuild", Seq(first, second, third),
      Seq(BinaryType, LongType, IntegerType))
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(p: Any, c: Any, f: Any): Any =
    GazetteUuid.build(p.asInstanceOf[Array[Byte]],
      c.asInstanceOf[Long], f.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, c, f) => s"graft.functions.GazetteUuid.build($p, $c, $f)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UuidBuild = copy(f, s, t)
}

case class ClockToMicros(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("ClockToMicros", Seq(child), Seq(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    GazetteUuid.clockToMicros(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GazetteUuid.clockToMicros($c)")
  override protected def withNewChildInternal(c: Expression): ClockToMicros = copy(c)
}

case class MicrosToClock(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("MicrosToClock", Seq(child), Seq(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    GazetteUuid.microsToClock(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GazetteUuid.microsToClock($c)")
  override protected def withNewChildInternal(c: Expression): MicrosToClock = copy(c)
}

case class Fnv1a32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("Fnv1a32", Seq(child), Seq(BinaryType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Hashes.fnv1a32(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashes.fnv1a32($c)")
  override protected def withNewChildInternal(c: Expression): Fnv1a32 = copy(c)
}

/** Unicode NFC normalization (the q162 hygiene pass): null-safe,
  * codegen'd via the [[UnicodeNorm.nfc]] static forwarder. No Spark
  * builtin performs canonical composition, so this is the one string
  * scalar the family adds rather than wraps.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("NfcNormalize", Seq(child), Seq(StringType))
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

case class Crc64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("Crc64", Seq(child), Seq(BinaryType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Hashes.crc64(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashes.crc64($c)")
  override protected def withNewChildInternal(c: Expression): Crc64 = copy(c)
}

case class Crc64Update(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("Crc64Update", Seq(left, right),
      Seq(LongType, BinaryType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(prev: Any, data: Any): Any =
    Hashes.crc64Update(prev.asInstanceOf[Long], data.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, d) => s"graft.functions.Hashes.crc64Update($p, $d)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Crc64Update = copy(l, r)
}

/** Element-type suffix for the [[VecOps]] kernel family: the kernels
  * read `ArrayData` with typed getters, so each child's array element
  * type picks the kernel at PLAN time (a wrong getter would corrupt
  * silently, never error).
  */
private[functions] object VecKernels {
  /** Analysis-time input check shared by the vec_* expressions: a bad
    * argument type should fail BEFORE the job launches, not as a
    * per-task exception from `suffix` on first evaluation.
    */
  def checkVecInputs(name: String, es: Expression*): TypeCheckResult = {
    val bad = es.find(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
      case _ => true
    })
    bad match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> or array<double> arguments, got ${e.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  def suffix(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "F"
    case ArrayType(DoubleType, _) => "D"
    case other => throw new IllegalArgumentException(
      s"vector kernel needs array<float> or array<double>, got $other")
  }
  def eval2(name: String): (ArrayData, ArrayData) => Double = name match {
    case "dotFF" => VecOps.dotFF
    case "dotFD" => VecOps.dotFD
    case "dotDF" => VecOps.dotDF
    case "dotDD" => VecOps.dotDD
    case "cosineFF" => VecOps.cosineFF
    case "cosineFD" => VecOps.cosineFD
    case "cosineDF" => VecOps.cosineDF
    case "cosineDD" => VecOps.cosineDD
  }
}

/** Dot product of two vector columns (see [[VecOps]]). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecKernels.checkVecInputs("vec_dot", left, right)
  private lazy val kernel =
    "dot" + VecKernels.suffix(left) + VecKernels.suffix(right)
  private lazy val evalFn = VecKernels.eval2(kernel)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalFn(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.$kernel($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
}

/** Fused cosine similarity of two vector columns. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecKernels.checkVecInputs("vec_cosine", left, right)
  private lazy val kernel =
    "cosine" + VecKernels.suffix(left) + VecKernels.suffix(right)
  private lazy val evalFn = VecKernels.eval2(kernel)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalFn(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.$kernel($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecCosine = copy(l, r)
}

/** 2-D Hilbert curve index of two long rank columns (see
  * [[Curves.hilbert2]]); `bits` is the per-dimension grid depth.
  */
case class Hilbert2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    ScalarChecks.expect("Hilbert2", Seq(left, right), Seq(LongType, LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Curves.hilbert2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Curves.hilbert2($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Hilbert2 = copy(left = l, right = r)
}

/** L2 norm of a vector column. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecKernels.checkVecInputs("vec_norm", child)
  override def dataType: DataType = DoubleType
  private lazy val kernel = "norm" + VecKernels.suffix(child)
  override protected def nullSafeEval(a: Any): Any =
    if (kernel == "normF") VecOps.normF(a.asInstanceOf[ArrayData])
    else VecOps.normD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.$kernel($a)")
  override protected def withNewChildInternal(c: Expression): VecNorm = copy(c)
}
