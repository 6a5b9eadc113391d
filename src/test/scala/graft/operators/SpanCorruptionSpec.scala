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
