package graft.functions

import graft.SparkSpec

/** The native expression family under its SQL names: values must match
  * the Scala kernels bit-for-bit, and misuse must fail at analysis
  * time, not first-row eval.
  */
class SqlFunctionsSpec extends SparkSpec {

  test("SQL names evaluate the same kernels as the Scala API") {
    SqlFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  graft_fnv1a32(CAST('hello' AS BINARY)) AS fnv,
        |  graft_crc64(CAST('hello' AS BINARY)) AS crc,
        |  graft_crc64_update(graft_crc64(CAST('he' AS BINARY)),
        |    CAST('llo' AS BINARY)) AS crc2,
        |  graft_uuid_clock(graft_uuid_build(X'001122334455', 12345L, 2)) AS ck,
        |  graft_uuid_flags(graft_uuid_build(X'001122334455', 12345L, 2)) AS fl,
        |  graft_uuid_producer(graft_uuid_build(X'001122334455', 12345L, 2)) AS pr,
        |  graft_clock_micros(graft_micros_clock(123456789L)) AS mc,
        |  graft_vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS vd,
        |  graft_vec_norm(array(3.0D, 4.0D)) AS vn,
        |  graft_hilbert2(3L, 5L, 4) AS h2
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) == Hashes.fnv1a32("hello".getBytes("UTF-8")))
    assert(row.getLong(1) == Hashes.crc64("hello".getBytes("UTF-8")))
    // CRC64 streams: update(crc("he"), "llo") == crc("hello").
    assert(row.getLong(2) == row.getLong(1))
    assert(row.getLong(3) == 12345L && row.getInt(4) == 2)
    assert(row.getAs[Array[Byte]](5).toSeq ==
      Array[Byte](0x00, 0x11, 0x22, 0x33, 0x44, 0x55).toSeq)
    // micros→clock→micros round-trips exactly (the clock side
    // quantizes, so only this direction is stable).
    assert(row.getLong(6) == 123456789L)
    assert(row.getDouble(7) == 32.0 && row.getDouble(8) == 5.0)
    assert(row.getLong(9) == Curves.hilbert2(3L, 5L, 4))
  }

  test("graft_nfc is bit-identical to the Normalizer UDF it replaced") {
    SqlFunctions.registerAll(spark)
    import org.apache.spark.sql.functions.{col, udf}
    import spark.implicits._
    // Decomposed e+combining-acute, composed é, Hangul jamo runs, pure
    // ASCII, empty, and a null — the q162 probe classes.
    val texts = Seq("ab cdéf", "café", "각",
      "plain ascii", "", null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val legacy = udf { t: String =>
      if (t == null) null
      else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC) }
    val out = df.select(col("id"), F.nfc(col("t")).as("e"),
        legacy(col("t")).as("u")).orderBy(col("id")).collect()
    out.foreach { r =>
      assert(r.getAs[String]("e") == r.getAs[String]("u"),
        s"row ${r.getLong(0)}: expression vs UDF diverge")
    }
    // Null stays null (null-safe expression, not a throw).
    assert(out.last.isNullAt(1) && out.last.isNullAt(2))
    // And the SQL name resolves to the same kernel.
    val viaSql = spark.sql(
      "SELECT graft_nfc('ab cdéf')").collect()(0).getString(0)
    assert(viaSql == java.text.Normalizer.normalize("ab cdéf",
      java.text.Normalizer.Form.NFC))
    // Analysis-time type gate: non-string input refuses.
    val eT = intercept[Exception] {
      spark.sql("SELECT graft_nfc(X'00')").collect()
    }
    assert(eT.getMessage.contains("string"), eT.getMessage)
  }

  test("misuse fails at analysis time") {
    SqlFunctions.registerAll(spark)
    // Non-literal bits for the curve index.
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_hilbert2(id, id, CAST(id AS INT)) FROM range(3)")
        .collect()
    }
    assert(e1.getMessage.contains("INT literal"), e1.getMessage)
    // Wrong arity.
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_crc64(X'00', X'01')").collect()
    }
    assert(e2.getMessage.contains("expects 1 argument"), e2.getMessage)
    // Wrong argument type: STRING where BINARY is required must fail
    // when analyzed, not as a per-row CCE / Janino error mid-job.
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_fnv1a32('hello')").collect()
    }
    assert(e3.getMessage.contains("binary"), e3.getMessage)
    // NULL literal curve depth must refuse, not unbox to bits = 0.
    val e4 = intercept[Exception] {
      spark.sql("SELECT graft_hilbert2(1L, 2L, CAST(NULL AS INT))").collect()
    }
    assert(e4.getMessage.contains("non-null INT literal"), e4.getMessage)
  }

  test("builtin-parity coercions: NULL literals type through, integrals widen") {
    SqlFunctions.registerAll(spark)
    // NULL argument = NULL result (every comparable builtin's shape) —
    // not an analysis failure "expects binary, got void", and never a
    // parse of the string "null".
    val r = spark.sql(
      "SELECT graft_crc64(NULL) AS a, graft_uuid_clock(NULL) AS b, " +
        "graft_nfc(NULL) AS c").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // INT literals widen to expected BIGINT via an inserted Cast: the
    // natural spellings work in SQL as they do in the Column API.
    val u = spark.sql(
      "SELECT graft_crc64_update(0, X'616263') AS c, " +
        "graft_hilbert2(3, 5, 4) AS h").collect().head
    assert(u.getLong(0) == Hashes.crc64("abc".getBytes("UTF-8")))
    assert(u.getLong(1) == Curves.hilbert2(3L, 5L, 4))
    // A non-integral wrong type still fails at analysis (Hilbert2 now
    // carries the family's gate — it used to CCE during optimization).
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hilbert2('x', 5L, 4)").collect()
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
  }
}
