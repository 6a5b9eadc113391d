package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CanonicalDocsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalDocs keeps the highest-quality member of each cluster") {
    // letter-only words: the tokenizer is [a-z]+ (digits split tokens)
    def w(prefix: String, i: Int) =
      s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val base = (0 until 40).map(w("word", _)).mkString(" ")
    val docs = Seq(
      (10L, base),
      (11L, base + " the"), // near-dup of 10 (J = 38/39), one stopword richer
      (20L, "completely different text about other things entirely " +
        (0 until 30).map(w("other", _)).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.canonicalDocs(docs, $"doc_id", $"text", 0.85).collect()
    // Only the {10, 11} cluster exists; doc 20 survives trivially (absent).
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("cluster") == 10L)
    assert(row.getAs[Long]("n_members") == 2L)
    val q = docs.filter($"doc_id".isin(10L, 11L))
      .select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expectSurvivor = if (q(10L) >= q(11L)) 10L else 11L
    assert(row.getAs[Long]("survivor") == expectSurvivor)
    assert(row.getAs[Double]("best_quality") == q(expectSurvivor))
  }

  test("identical-quality ties break to the smaller doc_id") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((5L, base), (3L, base)).toDF("doc_id", "text")
    val out = Curation.canonicalDocs(docs, $"doc_id", $"text", 0.85).collect()
    assert(out.length == 1 && out.head.getAs[Long]("survivor") == 3L)
  }

  test("dedupSurvivors keeps unclustered docs and each cluster's winner only") {
    def w(prefix: String, i: Int) =
      s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val base = (0 until 40).map(w("word", _)).mkString(" ")
    val docs = Seq(
      (10L, base),
      (11L, base + " the"), // cluster with 10; higher quality (stopword)
      (20L, (0 until 35).map(w("solo", _)).mkString(" ")))
      .toDF("doc_id", "text")
    val kept = Curation.dedupSurvivors(docs, $"doc_id", $"text", 0.85)
      .select("doc_id").as[Long].collect().toSet
    val winner = Curation.canonicalDocs(docs, $"doc_id", $"text", 0.85)
      .head().getAs[Long]("survivor")
    assert(kept == Set(winner, 20L))
    // all original columns survive the filter
    assert(Curation.dedupSurvivors(docs, $"doc_id", $"text", 0.85)
      .columns.toSeq == Seq("doc_id", "text"))
  }
}
