package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-pass exact heavy hitters — the 100 TB recipe for "which tokens
  * appear more than N/k times" when the vocabulary itself doesn't fit
  * anywhere.
  *
  * Pass 1 streams each partition through a Misra-Gries summary of
  * k-1 counters (the classic published frequent-items algorithm):
  * increment a held counter, else decrement all, else adopt a freed
  * slot. A token with partition frequency > n_p/k always survives its
  * partition's summary, and a token with GLOBAL frequency > N/k must
  * exceed n_p/k in at least one partition (averaging argument) — so
  * the union of per-partition summaries is a guaranteed superset of
  * every global heavy hitter, at most (k-1)·partitions tokens, with no
  * cross-partition merge order to reason about.
  *
  * Pass 2 re-streams the corpus, keeps only candidate tokens (broadcast
  * hash set), and counts them exactly; the N/k threshold then discards
  * the false candidates. Output = exactly {token : freq(token) > N/k}
  * with exact counts — deterministic even though the candidate set
  * isn't — using O(k·partitions) state instead of O(vocabulary).
  */
object HeavyHitters {

  /** Exact tokens with frequency > N/k over `text`, k-bounded state.
    * Output: (token, cnt) with exact counts.
    */
  def frequentTokens(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val texts = df.select(text.cast("string").as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[String]

    // Pass 1: per-partition Misra-Gries; emit (candidate, -1) rows and
    // one (null, n_p) row carrying the partition's token count. Only
    // this small summary is persisted — never the exploded corpus.
    val summary = texts.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](k * 2)
      var np = 0L
      it.foreach { t =>
        val toks = TextAnalysis.tokenize(t)
        var i = 0
        while (i < toks.length) {
          val w = toks(i)
          np += 1
          // get on a missing key returns null, which unboxes to 0L
          // (BoxesRunTime.unboxToLong) — counters never store 0, so
          // 0 reliably means "absent".
          val c = counters.get(w)
          if (c != 0L) counters.put(w, c + 1)
          else if (counters.size < k - 1) counters.put(w, 1L)
          else { // decrement-all; drop zeros
            val e = counters.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
            }
          }
          i += 1
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      counters.keySet().forEach(w => out += ((w, -1L)))
      out += ((null, np))
      out.iterator
    }.toDF("token", "np").persist()

    // sum() over zero rows (an empty corpus has no partitions) is NULL.
    val totRow = summary.filter($"token".isNull).agg(sum($"np")).head()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    // Materialize the (tiny) candidate set before dropping the pass-1
    // cache, so pass 2's broadcast doesn't silently re-run pass 1. The
    // returned frame reads `cands` lazily, so its release belongs to
    // the caller / harness cache clear — same contract as bm25TopK's
    // scored table (≤ (k-1)·partitions rows held, not corpus-sized).
    val cands = summary.filter($"token".isNotNull).select($"token").distinct().persist()
    cands.count()
    summary.unpersist()

    // Pass 2: exact counts of candidates only. The candidate set is
    // <= (k-1)·partitions rows — always broadcastable.
    texts.flatMap(t => TextAnalysis.tokenize(t)).toDF("token")
      .join(broadcast(cands), "token")
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      // Integer-exact threshold: cnt > N/k  ⇔  cnt·k > N.
      .filter($"cnt" * k > total)
  }
}
