package graft.operators

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {

  private def search(texts: Seq[String], phrase: Seq[String]): Map[Long, Long] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    InvertedIndex.phraseSearch(
      InvertedIndex.postings(docs, $"doc_id", $"text"), phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("finds consecutive phrases only, counting every start position") {
    val texts = Seq(
      "big data big data big",  // "big data" twice
      "data big",               // reversed: no hit
      "big cat data",           // gap: no hit
      "Big DATA!")              // case/punct-insensitive tokenizer: hit
    assert(search(texts, Seq("big", "data")) == Map(0L -> 2L, 3L -> 1L))
  }

  test("repeated-term phrase: overlapping occurrences each count") {
    // "a a a a" holds three starts of "a a" and two of "a a a".
    assert(search(Seq("a a a a"), Seq("a", "a")) == Map(0L -> 3L))
    assert(search(Seq("a a a a"), Seq("a", "a", "a")) == Map(0L -> 2L))
  }

  test("single-term phrase degenerates to term frequency; misses are empty") {
    assert(search(Seq("x y x", "y"), Seq("x")) == Map(0L -> 2L))
    assert(search(Seq("x y"), Seq("absent")).isEmpty)
  }
}
