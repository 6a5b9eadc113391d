package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file per scale-factor directory. At cluster
  * scale these would be multi-file datasets; `spark.read.parquet` handles
  * both identically, and all downstream operators are written against the
  * logical schema only.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** The `events` stream table, with `ts` normalized to epoch NANOS as a
    * LongType regardless of the parquet physical type. Generations of the
    * test data have shipped `ts` as TIMESTAMP(NANOS) (read as Long under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ); every downstream query and oracle is written
    * against the Long-nanos form, so pin it here. Sessions run with
    * `spark.sql.session.timeZone=UTC`, making the NTZ→TZ cast a no-op on
    * the underlying micros.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn(
        "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
