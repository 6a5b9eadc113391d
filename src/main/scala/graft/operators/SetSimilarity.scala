package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Prefix-filtered exact set-similarity self-join (the AllPairs/PPJoin
  * family of published algorithms).
  *
  * Third point in the near-dup design space: q24's exhaustive
  * shared-shingle join is exact but its inverted index includes every
  * stop-shingle (quadratic blowup on frequent tokens); q25's
  * MinHash-LSH scales but is probabilistic (recall < 1 with no
  * per-pair guarantee). Prefix filtering is BOTH exact and
  * sub-quadratic:
  *
  * Order every token set by ascending global document frequency
  * (rarest first; ties by token value — a canonical total order shared
  * by all documents). For Jaccard >= tau, |a∩b| >= tau·|a∪b| >=
  * tau·|a|. If a and b shared NO token in a's first
  * |a| - ceil(tau·|a|) + 1 tokens, every shared token would sit in
  * a's last ceil(tau·|a|) - 1 positions, so |a∩b| <= ceil(tau·|a|)-1
  * < tau·|a| — contradiction. Hence candidate generation only needs an
  * inverted index over PREFIX tokens, and because prefixes are
  * rare-first, posting lists are the shortest the corpus can offer:
  * the ubiquitous shingles that explode q24's index never enter this
  * one. A length filter (tau·|a| <= |b| <= |a|/tau, same bound
  * derivation) prunes candidates before verification.
  *
  * Scale (100 TB): three aggregation shuffles (document frequency,
  * per-doc canonical sort, per-token pair expansion) + one distinct +
  * two verification joins on doc_id — every one a hash exchange on
  * keys with bounded group sizes. No cross join, no LSH recall loss.
  */
object SetSimilarity {

  /** All pairs (da < db) with exact Jaccard(sh_a, sh_b) >= threshold.
    * Input: (doc_id, sh: array<long>) with distinct elements per row
    * (as produced by [[Dedup.docShingles]]). Output: (da, db, jaccard).
    *
    * Worst case: a boilerplate-heavy corpus (many near-identical docs)
    * puts the SAME rare-ish tokens in every prefix, so one posting
    * group carries all of them and its k·(k-1)/2 expansion is the true
    * near-dup pair count — unavoidable for an exact join whose OUTPUT
    * is that large. Run exact dedup (q22) first to collapse identical
    * documents before near-dup joining a 100 TB corpus.
    */
  def prefixJaccardSelfJoin(docs: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val d = docs.persist(StorageLevel.MEMORY_AND_DISK)

    // Global document frequency per token: one map-side-combined agg.
    val freq = d.select(explode(col("sh")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))

    // Canonical rare-first ordering per document. sort_array on
    // struct(df, tok) gives the (df, tok) lexicographic order — the
    // same total order in every document, which the prefix theorem
    // requires.
    val ordered = d.select(col("doc_id"), explode(col("sh")).as("tok"))
      .join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("doc_id"),
        transform(col("ts"), t => t.getField("tok")).as("ot"))

    // Prefix = first n - ceil(tau*n) + 1 tokens of the canonical order.
    // ceil is epsilon-guarded: the double product tau*n can land a hair
    // ABOVE an exact integer (0.85*20 = 17.000000000000004), and a
    // naive ceil would then shorten the prefix by one token, silently
    // dropping pairs whose Jaccard equals the threshold exactly —
    // false negatives in an operator documented as exact. Mirrors the
    // thr-1e-6 guard in Similarity.
    val n = size(col("ot"))
    val plen = (n - ceil(lit(threshold) * n - lit(1e-9)) + 1).cast("int")
    val pre = ordered.select(col("doc_id"), n.as("n"),
      explode(slice(col("ot"), lit(1), plen)).as("tok"))

    // Pair expansion per prefix token — one shuffle of prefix postings,
    // then a local k·(k-1)/2 expansion with the length filter applied
    // inside the loop (tau·max(na,nb) <= min(na,nb) is necessary for
    // Jaccard >= tau, so violating pairs can't be results).
    val tau = threshold
    val pairUdf = udf { ids: Seq[Row] =>
      val s = ids.map(r => (r.getLong(0), r.getInt(1))).sorted
      val out = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length) {
          val (na, nb) = (s(i)._2, s(j)._2)
          if (tau * math.max(na, nb) - 1e-9 <= math.min(na, nb))
            out += ((s(i)._1, s(j)._1))
          j += 1
        }
        i += 1
      }
      out.result()
    }
    val cand = pre.groupBy(col("tok"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairUdf(col("ids"))).as("p"))
      .select(col("p._1").as("da"), col("p._2").as("db"))
      .distinct()

    // Exact verification on candidates only.
    cand
      .join(d.select(col("doc_id"), col("sh").as("sha")), col("da") === col("doc_id")).drop("doc_id")
      .join(d.select(col("doc_id"), col("sh").as("shb")), col("db") === col("doc_id")).drop("doc_id")
      .select(col("da"), col("db"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
