package graft.operators

import graft.SparkSpec

class EncodingRepairSpec extends SparkSpec {

  import EncodingRepair.fixMojibake

  /** The mojibake form of `s`: encode UTF-8, mis-decode as CP1252
    * (Latin-1 for the bytes CP1252 leaves undefined) — the damage the
    * repair must invert.
    */
  private def damage(s: String): String = {
    val bytes = s.getBytes("UTF-8")
    val cs = java.nio.charset.Charset.forName("windows-1252")
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  test("classic artifacts repair exactly") {
    assert(fixMojibake("cafÃ©") == ("café", 1)) // Ã© -> é
    assert(fixMojibake("itâ€™s") == ("it’s", 1)) // â€™ -> ’
    assert(fixMojibake("Ã¼ber") == ("über", 1)) // Ã¼ -> ü
    // 3-byte and 4-byte sequences (em dash, emoji).
    assert(fixMojibake(damage("a—b")) == ("a—b", 1))
    assert(fixMojibake(damage("hi 😀")) == ("hi 😀", 1))
  }

  test("round-trip law: fix(damage(s)) == s for multi-artifact text") {
    // (No right-double-quote: its UTF-8 tail byte 0x9D has no CP1252
    // mapping, so whether damage() is invertible there depends on the
    // decoder's undefined-slot convention, not on the repair.)
    val cases = Seq("café über naïve — it’s ‘quoted’• done",
      "plain ascii stays", "mixed é and ascii", "€100 – ½ price")
    cases.foreach { s =>
      val (fixed, _) = fixMojibake(damage(s))
      assert(fixed == s, s"case: $s")
    }
  }

  test("clean text is a fixed point") {
    val cases = Seq("hello world", "café résumé (already correct)",
      "Âge d'or", // Â before ASCII: not a continuation, untouched
      "", "x")
    cases.foreach { s =>
      assert(fixMojibake(s) == ((s, 0)), s"case: $s")
    }
  }

  test("invalid sequences pass through: overlong, surrogate, truncated") {
    // ED A0 80 would decode to U+D800 (surrogate) — must refuse.
    assert(fixMojibake("í €")._2 == 0)
    // Truncated lead at end of string.
    assert(fixMojibake("abcÃ") == (("abcÃ", 0)))
    // C0/C1 leads are always overlong and never accepted.
    assert(fixMojibake("À¯")._2 == 0)
    assert(fixMojibake(null) == ((null, 0)))
  }

  test("column form counts and repairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "cafÃ© ok"), (2L, "clean"), (3L, null))
      .toDF("id", "text")
      .withColumn("r", EncodingRepair.mojibakeRepair(col("text")))
      .select($"id", $"r.fixed", $"r.n_fixed")
      .as[(Long, String, Option[Int])].collect().sortBy(_._1)
    assert(df(0) == ((1L, "café ok", Some(1))))
    assert(df(1) == ((2L, "clean", Some(0))))
    assert(df(2)._2 == null)
  }
}
