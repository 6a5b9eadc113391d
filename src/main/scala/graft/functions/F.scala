package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

/** Public Column API for the engine's native expressions, plus SQL-name
  * registration. Usage:
  *
  * {{{
  *   import graft.functions.F._
  *   df.select(uuid_clock($"uuid"), uuid_flags($"uuid"))
  *   F.registerAll(spark)  // then: spark.sql("SELECT uuid_clock(uuid) ...")
  * }}}
  */
object F {
  private def e(c: Column) = ColumnBridge.expression(c)

  /** Pack (producer binary(6), clock long, flags int) into a v1 UUID. */
  def build_uuid(producer: Column, clock: Column, flags: Column): Column =
    ColumnBridge.column(UuidBuild(e(producer), e(clock), e(flags)))

  def uuid_clock(uuid: Column): Column = ColumnBridge.column(UuidClock(e(uuid)))
  def uuid_flags(uuid: Column): Column = ColumnBridge.column(UuidFlags(e(uuid)))
  def uuid_producer(uuid: Column): Column = ColumnBridge.column(UuidProducer(e(uuid)))

  /** Event-time extraction: UUID clock → microseconds since epoch. */
  def uuid_micros(uuid: Column): Column =
    ColumnBridge.column(ClockToMicros(UuidClock(e(uuid))))

  /** Event-time extraction as a timestamp column (µs precision). */
  def uuid_time(uuid: Column): Column = timestamp_micros(uuid_micros(uuid))

  def clock_to_micros(clock: Column): Column =
    ColumnBridge.column(ClockToMicros(e(clock)))
  def micros_to_clock(micros: Column): Column =
    ColumnBridge.column(MicrosToClock(e(micros)))

  /** FNV-1a 32 over the UTF-8 bytes / raw bytes of `c`, as unsigned long. */
  def fnv1a32(c: Column): Column =
    ColumnBridge.column(Fnv1a32(e(c.cast("binary"))))

  /** ModuloMapping: stable partition index fnv1a32(key) mod n. */
  def fnv_modulo(c: Column, n: Int): Column = fnv1a32(c) % n

  def crc64(c: Column): Column =
    ColumnBridge.column(Crc64(e(c.cast("binary"))))

  /** Unicode NFC normalization of a string column (null-safe). */
  def nfc(c: Column): Column = ColumnBridge.column(NfcNormalize(e(c)))

  /** Rule-9 floor-scaled round (native [[FloorRound]]): the gate-wide
    * double-rounding convention, one child evaluation.
    */
  def floor_round(c: Column, digits: Int): Column =
    ColumnBridge.column(FloorRound(e(c.cast("double")), digits))
  def crc64_update(prev: Column, data: Column): Column =
    ColumnBridge.column(Crc64Update(e(prev), e(data.cast("binary"))))

  /** Codegen'd vector kernels over `array<float>` (embedding columns);
    * double accumulation in index order — bit-identical to the UDF
    * forms they replace in hot paths, minus the per-call conversion.
    */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(e(a), e(b)))
  def vec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(VecCosine(e(a), e(b)))
  def vec_norm(a: Column): Column = ColumnBridge.column(VecNorm(e(a)))

  /** 2-D Hilbert index of two rank columns in [0, 2^bits). */
  def hilbert2(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(Hilbert2(e(x.cast("long")), e(y.cast("long")), bits))

  /** Register UNPREFIXED SQL names for every native expression —
    * DERIVED from [[SqlFunctions.all]] (same builders: arity checks,
    * null/widening coercions), so the two registries cannot drift: a
    * new expression added to the shared list is automatically exposed
    * here too. Historic aliases registered on top.
    */
  def registerAll(spark: SparkSession): Unit = {
    SqlFunctions.all.foreach { case (n, b) =>
      ColumnBridge.register(spark, n.stripPrefix("graft_"), b)
    }
    // Legacy naming kept working: build_uuid predates the shared list's
    // uuid_build; clock_to_micros/micros_to_clock predate the list's
    // clock_micros/micros_clock.
    val byName = SqlFunctions.all.toMap
    ColumnBridge.register(spark, "build_uuid", byName("graft_uuid_build"))
    ColumnBridge.register(spark, "clock_to_micros", byName("graft_clock_micros"))
    ColumnBridge.register(spark, "micros_to_clock", byName("graft_micros_clock"))
  }
}
