package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index and exact phrase search.
  *
  * The index is the plain postings relation (term, doc_id, pos) — at
  * rest it would be written term-bucketed (partitioned/z-ordered by
  * term) so a query reads only its terms' posting lists; that layout
  * story is the same one the at-rest ANN family (q85-q87) demonstrates
  * with partition-pruned probes. Phrase matching is the classic
  * positional-join: anchor on the first term's postings and
  * equi-join each later term's postings at (doc_id, pos − offset).
  * Every join keys on (doc_id, pos) AFTER filtering both sides to one
  * term's list, so work is Σ|posting list| of the query's terms — never
  * corpus-sized — and the per-term filters push down to the scan.
  */
object InvertedIndex {

  /** Postings from raw documents: (term, doc_id, pos), pos 0-based in
    * the lowercase letter-run token stream (TextAnalysis.wordTokens).
    */
  def postings(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.cast("long").as("doc_id"),
        posexplode(TextAnalysis.wordTokens(text)))
      .select(col("col").as("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Documents containing the exact consecutive phrase: (doc_id,
    * n_hits) with n_hits = number of distinct start positions. The
    * postings input is filtered to the phrase's terms and persisted
    * once — k−1 self-joins then probe only those lists (Spark has no
    * cross-branch plan reuse; without the persist each join arm would
    * re-tokenize the corpus).
    */
  def phraseSearch(post: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val needed = post.filter(col("term").isin(phrase.distinct: _*)).persist()
    val anchor = needed.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(needed.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matches.groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
  }
}
