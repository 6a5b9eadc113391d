package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {

  test("asOf picks the newest right row at-or-before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10: after r1, r2 → r2
      (2L, 10L, 50L),  // key 10: after r1 only
      (3L, 10L, 5L),   // key 10: before everything → null
      (4L, 20L, 100L), // key 20: exactly at its right row's time → matches
      (5L, 30L, 100L)  // key 30: no right rows at all → null
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (101L, 10L, 10L), (102L, 10L, 60L),
      (201L, 20L, 100L)
    ).toDF("rid", "k", "t")

    val out = TemporalJoins.asOf(left, col("k"), col("t"),
        right, col("k"), col("t"), col("rid"), "asof_rid")
      .select($"event_id", $"asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 102L, 2L -> 101L, 3L -> -1L, 4L -> 201L, 5L -> -1L))
  }

  test("asOf tie-break: among right rows at the same time the largest value wins") {
    import spark.implicits._
    val left = Seq((1L, 7L, 100L)).toDF("event_id", "k", "t")
    val right = Seq((5L, 7L, 100L), (9L, 7L, 100L), (3L, 7L, 100L))
      .toDF("rid", "k", "t")
    val out = TemporalJoins.asOf(left, col("k"), col("t"),
      right, col("k"), col("t"), col("rid"), "asof_rid")
    assert(out.select($"asof_rid").as[Long].collect().toSeq == Seq(9L))
  }

  test("bucketed range join matches the broadcast form exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 2000).map(i => (i.toLong, rnd.nextLong(1000000L)))
      .toDF("pid", "t")
    val intervals = (1 to 50).map { i =>
      val t0 = rnd.nextLong(900000L)
      (i.toLong, t0, t0 + 1 + rnd.nextLong(150000L))
    }.toDF("iid", "t0", "t1")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"pid", $"iid").as[(Long, Long)].collect().toSet

    val broad = TemporalJoins.rangeJoinBroadcast(
      points, col("t"), intervals, col("t0"), col("t1"))
    val bucketed = TemporalJoins.rangeJoinBucketed(
      points, col("t"), intervals, col("t0"), col("t1"), bucketNs = 75000L)
    assert(key(broad).nonEmpty)
    assert(key(broad) == key(bucketed))
    // exactly-once per matching pair (no bucket-overlap duplicates)
    assert(bucketed.count() == bucketed.select($"pid", $"iid").distinct().count())
  }

  test("bucketed range join is exact at ns-scale epochs beyond double precision") {
    import spark.implicits._
    // 2^53-adjacent timestamps: floor(double-division) would misbucket.
    val base = 1700000000000000000L // ~2024 in ns, > 2^60
    val points = Seq((1L, base + 1L), (2L, base + 3600L * 1000000000L))
      .toDF("pid", "t")
    val intervals = Seq((10L, base, base + 2L)).toDF("iid", "t0", "t1")
    val out = TemporalJoins.rangeJoinBucketed(
        points, col("t"), intervals, col("t0"), col("t1"),
        bucketNs = 3600L * 1000000000L)
      .select($"pid").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("bucketed range join drops inverted intervals instead of exploding them") {
    import spark.implicits._
    val points = Seq((1L, 50L), (2L, 150L)).toDF("pid", "t")
    // iid=10 is valid; iid=20 is badly inverted (t1 << t0): a naive
    // sequence(bucketOf(t0), bucketOf(t1-1)) would generate a huge
    // DESCENDING bucket range for it.
    val intervals = Seq((10L, 0L, 100L), (20L, 100000000L, 0L)).toDF("iid", "t0", "t1")
    val out = TemporalJoins.rangeJoinBucketed(
      points, col("t"), intervals, col("t0"), col("t1"), bucketNs = 10L)
    assert(out.select($"pid", $"iid").as[(Long, Long)].collect().toSet == Set((1L, 10L)))
  }

  test("HLL sketch path: per-partition sketches union to the global estimate") {
    import spark.implicits._
    // The 100 TB distinct-count shape: sketch per partition slice,
    // union the (tiny, mergeable) sketches — never shuffle raw values.
    val df = (1 to 50000).map(i => (i % 10, (i % 4000).toLong)).toDF("g", "v")
    val perSlice = df.groupBy($"g").agg(hll_sketch_agg($"v").as("sk"))
    val merged = perSlice.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].head()
    val exact = 4000L
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
  }
}
