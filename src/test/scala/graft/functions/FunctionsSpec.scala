package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden vectors derived from the reference's own unit tests:
  * UUID layout from `/root/reference/message/uuid_test.go:53-90`,
  * CRC64 chaining from
  * `/root/reference/examples/stream-sum/stream_sum_test.go:21-44`.
  */
class FunctionsSpec extends SparkSpec {

  // --- pure-Scala core ------------------------------------------------

  test("clock construction mirrors NewClock/Tick semantics") {
    // Clock of time.Unix(12, 300): 100ns units truncate 300ns -> 3 ticks.
    val c12_300 = ((12L * 10000000L + 3L) + GazetteUuid.G1582NS100) << 4
    assert(GazetteUuid.nanosToClock(12L * 1000000000L + 300L) == c12_300)
    // Ticking adds 1µs = 160 units (10 ticks << 4).
    val ticked = c12_300 + 160L
    assert(GazetteUuid.clockToMicros(ticked) - GazetteUuid.clockToMicros(c12_300) == 1L)
  }

  test("uuid build/extract round-trip with full bit-range clock (uuid_test.go:53-90)") {
    val producer = Array[Byte](0x01, 0x22, 0x33, 0x44, 0x55, 0x66)
    // time.Unix(1567304621, 981273734) truncated to 100ns + 2 ticks.
    val clock = GazetteUuid.nanosToClock(1567304621L * 1000000000L + 981273734L) + 320L
    val flags = 682 // 0b1010101010
    val u = GazetteUuid.build(producer, clock, flags)
    assert(GazetteUuid.clockOf(u) == clock)
    assert(GazetteUuid.flagsOf(u) == flags)
    assert(GazetteUuid.producerOf(u).toSeq == producer.toSeq)
    // RFC-4122: version 1, variant 10.
    assert((u(6) & 0xf0) == 0x10)
    assert((u(8) & 0xc0) == 0x80)
    // Time round-trip: expect micros of the 2-tick-advanced clock.
    // 981273734ns -> truncated 981273700ns, +2000ns = 981275700ns.
    assert(GazetteUuid.clockToMicros(clock) ==
      1567304621L * 1000000L + 981275L)
  }

  test("uuid round-trip property (seeded random)") {
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val p = Array.fill[Byte](6)(rnd.nextInt().toByte)
      // any 64-bit value is a valid clock: 60-bit timestamp + 4-bit seq
      val clock = rnd.nextLong()
      val f = rnd.nextInt(0x400)
      val u = GazetteUuid.build(p, clock, f)
      assert(GazetteUuid.clockOf(u) == clock, s"clock mismatch for $clock")
      assert(GazetteUuid.flagsOf(u) == f)
      assert(GazetteUuid.producerOf(u).toSeq == p.toSeq)
    }
  }

  test("crc64-ECMA golden vectors and chaining (stream_sum_test.go:21-44)") {
    assert(Hashes.crc64("battery horse".getBytes("UTF-8")) == 0xae763109c1192ed6L)
    val part = Hashes.crc64("battery".getBytes("UTF-8"))
    assert(part == 0x2be55fc66a381c84L)
    assert(Hashes.crc64Update(part, " horse".getBytes("UTF-8")) == 0xae763109c1192ed6L)
  }

  test("fnv1a32 standard vectors") {
    // Standard FNV-1a test vectors (public): "" -> 2166136261, "a" -> 0xe40c292c
    assert(Hashes.fnv1a32(Array.empty[Byte]) == 2166136261L)
    assert(Hashes.fnv1a32("a".getBytes("UTF-8")) == 0xe40c292cL)
    assert(Hashes.fnv1a32("foobar".getBytes("UTF-8")) == 0xbf9cf968L)
  }

  // --- Catalyst expression layer -------------------------------------

  test("expressions evaluate through DataFrame plans and SQL") {
    import spark.implicits._
    import F._
    val df = Seq(
      ("alice", 1567304621000000L, 0),
      ("bob", 1567304622000000L, 2)
    ).toDF("name", "micros", "flags")
      .withColumn("producer", expr("CAST(concat(substring(name,1,1),'xxxxx') AS BINARY)"))

    val out = df
      .withColumn("uuid", build_uuid($"producer", micros_to_clock($"micros"), $"flags"))
      .select(
        clock_to_micros(uuid_clock($"uuid")).as("micros2"),
        uuid_flags($"uuid").as("flags2"),
        fnv1a32($"name").as("fnv"),
        crc64($"name").as("crc"))
      .collect()

    assert(out.map(_.getLong(0)).toSeq == Seq(1567304621000000L, 1567304622000000L))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(out(0).getLong(2) == Hashes.fnv1a32("alice".getBytes("UTF-8")))
    assert(out(0).getLong(3) == Hashes.crc64("alice".getBytes("UTF-8")))

    F.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT fnv1a32(CAST('alice' AS BINARY)) AS f, crc64(CAST('battery horse' AS BINARY)) AS c")
      .collect().head
    assert(viaSql.getLong(0) == Hashes.fnv1a32("alice".getBytes("UTF-8")))
    assert(viaSql.getLong(1) == 0xae763109c1192ed6L)
  }

  test("uuid_time yields usable event-time column") {
    import spark.implicits._
    import F._
    val micros = 1567304621981275L
    val df = Seq(1).toDF("x")
      .withColumn("uuid",
        build_uuid(lit(Array[Byte](1, 2, 3, 4, 5, 6)), micros_to_clock(lit(micros)), lit(0)))
      .select(uuid_time($"uuid").cast("string").as("t"))
    assert(df.collect().head.getString(0) == "2019-09-01 02:23:41.981275")
  }

  test("vec kernels: bit-identical to the interpreted column forms, all type mixes") {
    import spark.implicits._
    import F._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      val a = Seq.fill(64)(rnd.nextGaussian().toFloat)
      val b = Seq.fill(64)(rnd.nextGaussian().toFloat)
      (i.toLong, a, b, a.map(_.toDouble), b.map(_.toDouble))
    }.toDF("id", "fa", "fb", "da", "db")

    // Interpreted reference: cast-to-double, index-order accumulation.
    def refDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)

    val out = rows.select(
      vec_dot($"fa", $"fb").as("dff"), refDot($"fa", $"fb").as("rff"),
      vec_dot($"fa", $"db").as("dfd"), refDot($"fa", $"db").as("rfd"),
      vec_dot($"da", $"fb").as("ddf"), refDot($"da", $"fb").as("rdf"),
      vec_dot($"da", $"db").as("ddd"), refDot($"da", $"db").as("rdd"),
      vec_cosine($"fa", $"fb").as("cff"),
      (refDot($"fa", $"fb") / (sqrt(refDot($"fa", $"fa")) * sqrt(refDot($"fb", $"fb")))).as("cref"),
      vec_cosine($"da", $"fb").as("cdf"),
      vec_norm($"fa").as("nf"), sqrt(refDot($"fa", $"fa")).as("nref"),
      vec_norm($"da").as("nd")).collect()

    out.foreach { r =>
      for ((k, ref) <- Seq("dff" -> "rff", "dfd" -> "rfd", "ddf" -> "rdf",
          "ddd" -> "rdd", "cff" -> "cref", "cdf" -> "cref", "nf" -> "nref",
          "nd" -> "nref"))
        assert(r.getDouble(r.fieldIndex(k)) == r.getDouble(r.fieldIndex(ref)),
          s"$k != $ref")
    }

    F.registerAll(spark)
    rows.createOrReplaceTempView("veckernel_rows")
    val viaSql = spark.sql(
      "SELECT vec_cosine(fa, fb) AS c, vec_dot(fa, db) AS d, vec_norm(da) AS n FROM veckernel_rows LIMIT 1")
    assert(viaSql.collect().head.getDouble(0) ==
      rows.select(vec_cosine($"fa", $"fb")).collect().head.getDouble(0))

    // Unsupported element types fail at plan time, not silently.
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("x", "y")
    intercept[Exception] { ints.select(vec_dot($"x", $"y")).collect() }
  }
}
