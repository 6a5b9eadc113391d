package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively: as-of join and interval
  * (range) join. Both are built from shuffle-friendly primitives — no
  * cross join, no per-row subquery — so they hold at 100 TB.
  */
object TemporalJoins {

  /** As-of join: for every left row, the newest right value whose time
    * is <= the left row's time, per key ("attribute each event to the
    * latest preceding purchase").
    *
    * Scale shape: union both sides into one keyed stream and take a
    * running `last(value, ignoreNulls)` over (key, time) — exactly ONE
    * hash shuffle on the key (the window sort), independent of how many
    * right rows precede each left row. The naive alternatives — a range
    * self-join (quadratic in rows per key) or per-key collect — die at
    * scale; this form is the standard distributed as-of.
    *
    * Tie semantics (deterministic): right rows at the same (key, time)
    * as a left row DO match (<=, right sorts first); among right-side
    * ties the largest `rightVal` wins.
    *
    * Returns the left rows (original columns) plus `outCol` (long,
    * null when no right row precedes).
    */
  def asOf(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightVal: Column, outCol: String): DataFrame = {
    // Fail fast on non-integral inputs: a silent cast("long") would
    // NULL string keys (collapsing every key into one window
    // partition) and truncate timestamps to SECONDS — both produce
    // quietly wrong attributions. Pre-convert timestamps to epoch
    // micros/nanos and hash string keys before calling.
    def requireIntegral(df: DataFrame, c: Column, role: String): Unit = {
      import org.apache.spark.sql.types._
      val dt = df.select(c).schema.head.dataType
      val ok = dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType
      require(ok,
        s"asOf $role must be an integral column, got $dt — " +
          "convert timestamps to epoch micros/nanos and hash non-numeric keys first")
    }
    requireIntegral(left, leftKey, "leftKey"); requireIntegral(left, leftTime, "leftTime")
    requireIntegral(right, rightKey, "rightKey"); requireIntegral(right, rightTime, "rightTime")
    requireIntegral(right, rightVal, "rightVal")
    val l = left.select(struct(col("*")).as("__row"),
      leftKey.cast("long").as("__k"), leftTime.cast("long").as("__t"),
      lit(1).as("__typ"), lit(null).cast("long").as("__v"))
    val r = right.select(lit(null).cast(l.schema("__row").dataType).as("__row"),
      rightKey.cast("long").as("__k"), rightTime.cast("long").as("__t"),
      lit(0).as("__typ"), rightVal.cast("long").as("__v"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__typ"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionAll(l)
      .withColumn(outCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__typ") === 1)
      .select(col("__row.*"), col(outCol))
  }

  /** Interval join, small-interval-set path: every (point, interval)
    * pair with t0 <= t < t1. The interval side is broadcast; the point
    * side streams past it with zero shuffle (repartitioned first —
    * broadcast-nested-loop streams the left side, and a single-file
    * scan would otherwise run the whole join on one core).
    */
  def rangeJoinBroadcast(points: DataFrame, t: Column,
      intervals: DataFrame, t0: Column, t1: Column): DataFrame =
    points.repartition(points.sparkSession.sparkContext.defaultParallelism)
      .join(broadcast(intervals), t >= t0 && t < t1)

  /** Interval join, large-interval-set path: quantize time into buckets
    * of `bucketNs`; each interval explodes to the buckets it covers, the
    * join becomes an equi-join on the bucket id, and the exact range
    * predicate filters within bucket-matched pairs. Cost is a hash join
    * over |points| + Σ interval-spans/bucketNs rows — no nested loop.
    * Choose bucketNs ≈ the median interval length (explosion factor
    * ~2×); each (point, interval) pair meets in exactly one bucket (the
    * point's), so no dedup is needed.
    */
  def rangeJoinBucketed(points: DataFrame, t: Column,
      intervals: DataFrame, t0: Column, t1: Column,
      bucketNs: Long): DataFrame = {
    // bucketNs = 0 would NULL every bucket (non-ANSI div-by-zero) and
    // the join would silently return empty; negative inverts sequence
    // bounds and drops coverage.
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    // Integer floor-div via decimal: `/` on long Columns is DOUBLE
    // division, and ns-scale epochs (~1.7e18) exceed a double's 2^53
    // exact-integer range — floor(double) would misbucket.
    def bucketOf(c: Column) =
      floor(c.cast("long").cast("decimal(38,0)") / bucketNs).cast("long")
    val pb = points.withColumn("__bucket", bucketOf(t))
    // Empty intervals (t1 <= t0) match nothing under `t0 <= t < t1`, but
    // sequence(start, stop) with start > stop generates a DESCENDING
    // sequence — a badly inverted interval (e.g. swapped columns) would
    // silently explode to millions of spurious bucket rows that the
    // exact filter then discards. Drop them before exploding.
    val ib = intervals.filter(t1 > t0).withColumn("__bucket",
      // end is exclusive: t1-1 is the last covered instant
      explode(sequence(bucketOf(t0), bucketOf(t1 - 1))))
    pb.join(ib, "__bucket").filter(t >= t0 && t < t1).drop("__bucket")
  }
}
