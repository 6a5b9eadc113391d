package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** SQL-name registration for the engine's native expression family, so
  * `spark.sql("SELECT graft_uuid_clock(uuid) …")` works the same as the
  * Column API (the reference exposes these through gazctl/SQL-facing
  * tooling; a SQL-first user should not need Scala). Names carry a
  * `graft_` prefix to stay clear of Spark builtins. Wired two ways:
  * [[graft.plans.SelectorExtension]] injects them at session BUILD time
  * (the `spark.sql.extensions` path, which `Engine.local` uses), and
  * [[registerAll]] adds them to an already-built session.
  */
object SqlFunctions {

  private def arity(n: String, want: Int, got: Seq[Expression]): Unit =
    if (got.length != want) throw new IllegalArgumentException(
      s"$n expects $want argument(s), got ${got.length}")

  /** The coercions every comparable builtin performs, applied centrally
    * at the SQL boundary (the family's expressions deliberately do no
    * implicit casting — ImplicitCastInputTypes is private[sql]-blocked
    * — and the Column API casts in F): a NullType child types as the
    * expected type (the expression then evaluates to NULL instead of
    * failing analysis with "expects binary, got void"); narrower
    * integrals widen to an expected LONG/INT via an explicit Cast.
    * Anything else — including STRING where BINARY is required —
    * passes through for the expression's analysis gate to REJECT:
    * hashing a string's bytes implicitly is exactly the silent
    * behavior the family refuses (SqlFunctionsSpec pins it).
    */
  private def coerce(e: Expression, want: DataType): Expression =
    (e.dataType, want) match {
      case (NullType, t) => Literal(null, t)
      case (ByteType | ShortType | IntegerType, LongType) => Cast(e, LongType)
      case (ByteType | ShortType, IntegerType) => Cast(e, IntegerType)
      case _ => e
    }

  private def litInt(n: String, e: Expression): Int = {
    val v = if (e.foldable && e.dataType ==
        org.apache.spark.sql.types.IntegerType) e.eval(null) else null
    // The null check matters: CAST(NULL AS INT) is a foldable INT whose
    // eval is null, and null.asInstanceOf[Int] would silently unbox to 0.
    if (v == null) throw new IllegalArgumentException(
      s"$n: last argument must be a non-null INT literal")
    v.asInstanceOf[Int]
  }

  /** name → expression builder, the single list both wiring paths use. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_uuid_clock" ->
      { a: Seq[Expression] =>
        arity("graft_uuid_clock", 1, a)
        UuidClock(coerce(a(0), BinaryType)) },
    "graft_uuid_flags" ->
      { a: Seq[Expression] =>
        arity("graft_uuid_flags", 1, a)
        UuidFlags(coerce(a(0), BinaryType)) },
    "graft_uuid_producer" ->
      { a: Seq[Expression] =>
        arity("graft_uuid_producer", 1, a)
        UuidProducer(coerce(a(0), BinaryType)) },
    "graft_uuid_build" ->
      { a: Seq[Expression] =>
        arity("graft_uuid_build", 3, a)
        UuidBuild(coerce(a(0), BinaryType), coerce(a(1), LongType),
          coerce(a(2), IntegerType)) },
    "graft_clock_micros" ->
      { a: Seq[Expression] =>
        arity("graft_clock_micros", 1, a)
        ClockToMicros(coerce(a(0), LongType)) },
    "graft_micros_clock" ->
      { a: Seq[Expression] =>
        arity("graft_micros_clock", 1, a)
        MicrosToClock(coerce(a(0), LongType)) },
    "graft_fnv1a32" ->
      { a: Seq[Expression] =>
        arity("graft_fnv1a32", 1, a)
        Fnv1a32(coerce(a(0), BinaryType)) },
    "graft_crc64" ->
      { a: Seq[Expression] =>
        arity("graft_crc64", 1, a)
        Crc64(coerce(a(0), BinaryType)) },
    "graft_nfc" ->
      { a: Seq[Expression] =>
        arity("graft_nfc", 1, a)
        NfcNormalize(coerce(a(0), StringType)) },
    "graft_crc64_update" ->
      { a: Seq[Expression] =>
        arity("graft_crc64_update", 2, a)
        Crc64Update(coerce(a(0), LongType), coerce(a(1), BinaryType)) },
    "graft_vec_dot" ->
      { a: Seq[Expression] => arity("graft_vec_dot", 2, a); VecDot(a(0), a(1)) },
    "graft_vec_cosine" ->
      { a: Seq[Expression] =>
        arity("graft_vec_cosine", 2, a); VecCosine(a(0), a(1)) },
    "graft_vec_norm" ->
      { a: Seq[Expression] => arity("graft_vec_norm", 1, a); VecNorm(a(0)) },
    "graft_hilbert2" ->
      { a: Seq[Expression] =>
        arity("graft_hilbert2", 3, a)
        Hilbert2(coerce(a(0), LongType), coerce(a(1), LongType),
          litInt("graft_hilbert2", a(2))) })

  /** Session-level registration (sessions built without the extension). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (n, b) => ColumnBridge.register(spark, n, b) }
}
