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

  /** Register SQL names for every native expression in this module. */
  def registerAll(spark: SparkSession): Unit = {
    ColumnBridge.register(spark, "build_uuid", a => UuidBuild(a(0), a(1), a(2)))
    ColumnBridge.register(spark, "uuid_clock", a => UuidClock(a.head))
    ColumnBridge.register(spark, "uuid_flags", a => UuidFlags(a.head))
    ColumnBridge.register(spark, "uuid_producer", a => UuidProducer(a.head))
    ColumnBridge.register(spark, "clock_to_micros", a => ClockToMicros(a.head))
    ColumnBridge.register(spark, "micros_to_clock", a => MicrosToClock(a.head))
    ColumnBridge.register(spark, "fnv1a32", a => Fnv1a32(a.head))
    ColumnBridge.register(spark, "crc64", a => Crc64(a.head))
    ColumnBridge.register(spark, "crc64_update", a => Crc64Update(a(0), a(1)))
    ColumnBridge.register(spark, "vec_dot", a => VecDot(a(0), a(1)))
    ColumnBridge.register(spark, "vec_cosine", a => VecCosine(a(0), a(1)))
    ColumnBridge.register(spark, "vec_norm", a => VecNorm(a.head))
  }
}
