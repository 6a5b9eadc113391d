package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  /** Scalar BM25 reference with the operator's log-free odds idf. */
  private def refBm25(corpus: Seq[(Long, String)], terms: Seq[String],
                      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
    }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfc = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    corpus.flatMap { case (id, _) =>
      val contribs = terms.distinct.flatMap { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0 || dfc(t) == 0) None
        else {
          val idf = (n - dfc(t) + 0.5) / (dfc(t) + 0.5)
          val tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * toks(id).size / avgdl))
          Some(BigDecimal(idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      if (contribs.isEmpty) None else Some(id -> contribs.sum.toDouble)
    }.toMap
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "quick quick quick brown",
    3L -> "a lazy afternoon with a lazy dog and a lazy cat",
    4L -> "nothing relevant here at all",
    5L -> "fox")

  test("bm25 matches the scalar reference on a hand corpus") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, $"doc_id", $"text", Seq("quick", "lazy", "fox"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ref = refBm25(corpus, Seq("quick", "lazy", "fox"))
    assert(out.keySet == ref.keySet)
    for ((id, s) <- ref) assert(math.abs(out(id) - s) < 1e-9, s"doc $id")
    // Doc 4 has no query term: absent, not zero-scored.
    assert(!out.contains(4L))
  }

  test("bm25 rewards tf but saturates, and rewards rarity") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val score = Retrieval.bm25(docs, $"doc_id", $"text", Seq("quick"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // tf=3 beats tf=1, by less than 3x (saturation).
    assert(score(2L) > score(1L))
    assert(score(2L) < 3 * score(1L))
    // 'fox' (df=2) outscores 'dog' (df=2)? equal df — instead compare
    // rare vs common: 'fox' in doc 5 (df=2) vs 'lazy' in doc 1 (df=2,
    // same df) is uninformative; use 'the' (df=1) vs 'quick' (df=2).
    val rare = Retrieval.bm25(docs, $"doc_id", $"text", Seq("jumps"))
      .collect().map(r => r.getDouble(2)).max
    val common = Retrieval.bm25(docs, $"doc_id", $"text", Seq("quick"))
      .collect().map(r => r.getDouble(2)).min
    assert(rare > common) // df=1 idf dominates df=2 with tf=1
  }

  test("bm25TopK ranks deterministically with doc_id tiebreak") {
    import spark.implicits._
    val docs = Seq(1L -> "same text", 2L -> "same text", 3L -> "same text")
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, $"doc_id", $"text", Seq("same"), k = 2)
      .orderBy("rank").select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (2L, 2)))
  }

  test("rrfFuse combines ranks, handles one-sided items, orders by id on ties") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "doc_id", k = 4)
      .orderBy($"rank").collect()
    // 10 and 20 both have 1/(60+1)+1/(60+2) = identical fused score →
    // id tiebreak puts 10 first.
    assert(out(0).getLong(0) == 10L && out(1).getLong(0) == 20L)
    assert(out(0).getDouble(3) == out(1).getDouble(3))
    // One-sided items score 1/(60+3) each; 30 beats 40 on id.
    assert(out(2).getLong(0) == 30L && out(3).getLong(0) == 40L)
    assert(out(2).getInt(4) == 3 && out(3).getInt(4) == 4)
  }

  test("at-rest index probe matches the batch bm25 on the same corpus") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    Retrieval.indexAtRest(docs, $"doc_id", $"text", idx, buckets = 8)

    val queries = Seq((100L, Seq("quick", "lazy", "fox")),
      (101L, Seq("jumps"))).toDF("query_id", "terms")
    val probed = Retrieval.bm25ProbeIndex(spark, idx, queries, k = 3, buckets = 8)
    val out =
      try probed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
        .toSet
      finally probed.unpersist()
    val expect = (Retrieval
        .bm25TopK(docs, $"doc_id", $"text", Seq("quick", "lazy", "fox"), k = 3)
        .collect().map(r => (100L, r.getLong(0), r.getDouble(2), r.getInt(3)))
      ++ Retrieval.bm25TopK(docs, $"doc_id", $"text", Seq("jumps"), k = 3)
        .collect().map(r => (101L, r.getLong(0), r.getDouble(2), r.getInt(3)))
      ).toSet
    assert(out == expect)
  }

  test("streaming serve: query stream answers match the batch probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = corpus.toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-bm25serve").toString
    Retrieval.indexAtRest(docs, $"doc_id", $"text", idx, buckets = 8)

    val queries = Seq((1L, Seq("lazy", "dog")), (2L, Seq("quick")))
    val probed = Retrieval.bm25ProbeIndex(spark, idx,
      queries.toDF("query_id", "terms"), k = 2, buckets = 8)
    val expected =
      try probed.collect().map(_.toSeq).toSet
      finally probed.unpersist()

    val input = MemoryStream[(Long, Seq[String])](spark)
    input.addData(queries: _*)
    val out = java.nio.file.Files.createTempDirectory("graft-bm25serve-out").toString
    val q = Retrieval.bm25StreamingServe(
      input.toDF.toDF("query_id", "terms"), idx, out,
      java.nio.file.Files.createTempDirectory("graft-bm25serve-ck").toString,
      k = 2, buckets = 8)
    q.processAllAvailable()
    q.stop()

    val served = spark.read.parquet(out)
      .select($"query_id", $"doc_id", $"n_terms_hit", $"score", $"rank")
      .collect().map(_.toSeq).toSet
    assert(served == expected)
  }

  test("fused score equals the sum of reciprocal ranks") {
    import spark.implicits._
    val a = Seq((1L, 1)).toDF("doc_id", "rank")
    val b = Seq((1L, 4)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "doc_id", k = 1).collect()(0)
    val expect = BigDecimal(1.0 / 61 + 1.0 / 64)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(3) == expect)
  }
}
