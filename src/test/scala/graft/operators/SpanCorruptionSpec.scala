package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptionSpec extends SparkSpec {

  test("input + target reconstruct the original token stream exactly") {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      (i, (1 to 80).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(docs, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(out.length == 50)
    val sent = "<X_(\\d+)>".r
    out.foreach { case (id, nTok, nSpans, nMasked, input, target) =>
      // Parse target into sentinel -> hidden tokens.
      val spans: Map[Int, Seq[String]] =
        if (target.isEmpty) Map.empty
        else {
          val parts = target.split("(?=<X_\\d+>)").toSeq.filter(_.nonEmpty)
          parts.map { p =>
            val toks = p.trim.split(' ').toSeq
            val k = sent.findFirstMatchIn(toks.head).get.group(1).toInt
            k -> toks.tail
          }.toMap
        }
      assert(spans.size == nSpans)
      assert(spans.values.map(_.size).sum == nMasked)
      // Sentinels appear in order 1..k in the input, once each.
      val ks = sent.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      assert(ks == (1 to nSpans.toInt))
      // Splice targets back into the input: must equal the original.
      val rebuilt = input.split(' ').toSeq.flatMap { t =>
        sent.findFirstMatchIn(t) match {
          case Some(m) => spans(m.group(1).toInt)
          case None    => Seq(t)
        }
      }
      val original = TextAnalysis.tokenize(
        docs.filter($"doc_id" === id).head().getString(1)).toSeq
      assert(rebuilt == original, s"doc $id does not reconstruct")
      assert(nTok == original.size.toLong)
    }
    // The md5 rates land near the design point across the corpus:
    // ~5% starts x mean 3 => 10-20% masked overall.
    val totTok = out.map(_._2).sum.toDouble
    val totMasked = out.map(_._4).sum.toDouble
    assert(totMasked / totTok > 0.08 && totMasked / totTok < 0.25,
      s"masked ratio ${totMasked / totTok} out of range")
  }

  test("fim: PSM sections reorder back to the original; half pass through") {
    import spark.implicits._
    val docs = (1L to 60L).map(i =>
      (i, (1 to 40).map(j => s"t${i}v$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SpanCorruption.fim(docs, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(out.length == 60)
    val (fimmed, plain) = out.partition(_._3)
    // md5 parity splits roughly in half.
    assert(fimmed.length > 15 && plain.length > 15)
    plain.foreach { case (id, n, _, lo, hi, psm) =>
      assert(lo == -1L && hi == -1L)
      assert(psm.split(' ').length == n)
    }
    fimmed.foreach { case (id, n, _, lo, hi, psm) =>
      assert(0 <= lo && lo <= hi && hi <= n)
      // Same tokenizer as the operator ([a-z]+ splits the digits out).
      val original = TextAnalysis.tokenize(
        (1 to 40).map(j => s"t${id}v$j").mkString(" ")).toSeq
      // Parse <PRE> p <SUF> s <MID> m and reorder to p ++ m ++ s.
      val pre = psm.indexOf("<PRE>"); val suf = psm.indexOf("<SUF>")
      val mid = psm.indexOf("<MID>")
      assert(pre == 0 && suf > pre && mid > suf)
      def toks(s: String) = s.trim.split(' ').toSeq.filter(_.nonEmpty)
      val p = toks(psm.substring(5, suf))
      val sfx = toks(psm.substring(suf + 5, mid))
      val m = toks(psm.substring(mid + 5))
      assert(p.size == lo && m.size == hi - lo && sfx.size == n - hi)
      assert(p ++ m ++ sfx == original, s"doc $id does not reorder back")
    }
  }

  test("token-less docs are excluded; masking is deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "123 456 !!"))
      .toDF("doc_id", "text")
    val a = SpanCorruption.corrupt(docs, $"doc_id", $"text").collect()
    assert(a.map(_.getLong(0)).toSet == Set(1L))
    val b = SpanCorruption.corrupt(docs, $"doc_id", $"text").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
