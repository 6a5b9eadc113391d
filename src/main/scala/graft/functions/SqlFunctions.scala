package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge

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
      { a: Seq[Expression] => arity("graft_uuid_clock", 1, a); UuidClock(a(0)) },
    "graft_uuid_flags" ->
      { a: Seq[Expression] => arity("graft_uuid_flags", 1, a); UuidFlags(a(0)) },
    "graft_uuid_producer" ->
      { a: Seq[Expression] =>
        arity("graft_uuid_producer", 1, a); UuidProducer(a(0)) },
    "graft_uuid_build" ->
      { a: Seq[Expression] =>
        arity("graft_uuid_build", 3, a); UuidBuild(a(0), a(1), a(2)) },
    "graft_clock_micros" ->
      { a: Seq[Expression] =>
        arity("graft_clock_micros", 1, a); ClockToMicros(a(0)) },
    "graft_micros_clock" ->
      { a: Seq[Expression] =>
        arity("graft_micros_clock", 1, a); MicrosToClock(a(0)) },
    "graft_fnv1a32" ->
      { a: Seq[Expression] => arity("graft_fnv1a32", 1, a); Fnv1a32(a(0)) },
    "graft_crc64" ->
      { a: Seq[Expression] => arity("graft_crc64", 1, a); Crc64(a(0)) },
    "graft_nfc" ->
      { a: Seq[Expression] => arity("graft_nfc", 1, a); NfcNormalize(a(0)) },
    "graft_crc64_update" ->
      { a: Seq[Expression] =>
        arity("graft_crc64_update", 2, a); Crc64Update(a(0), a(1)) },
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
        Hilbert2(a(0), a(1), litInt("graft_hilbert2", a(2))) })

  /** Session-level registration (sessions built without the extension). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (n, b) => ColumnBridge.register(spark, n, b) }
}
