package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, HeavyHitters, SetSimilarity}

/** Round-3 scale surface (q67+): operators whose point is the 100 TB
  * execution shape — exact-but-sub-quadratic similarity join, two-pass
  * heavy hitters, snapshot diffing, space-filling-curve layout,
  * fixed-point iterative graph compute.
  */
object ScaleOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q67: prefix-filtered exact set-similarity self-join
    // (AllPairs/PPJoin family): same result set as the exhaustive q24
    // baseline — no LSH recall loss — but candidate generation only
    // inverts each document's rare-first prefix tokens, so the
    // stop-shingle posting lists that make q24 quadratic never enter
    // the index. Lower threshold than q24/q25 (0.80) both to
    // differentiate the checked surface and because exact methods are
    // what you reach for when tau drops and LSH recall decays.
    "q67_prefix_simjoin" -> { (s, d) =>
      import s.implicits._
      val docs = Dedup.docShingles(Tables.documents(s, d), $"doc_id", $"text", 3)
      SetSimilarity.prefixJaccardSelfJoin(docs, 0.80)
        .select($"da", $"db", round($"jaccard", 4).as("jaccard"))
    },

    // ---- q68: two-pass exact heavy hitters (Misra-Gries candidates →
    // exact recount of candidates only). Same answer as a full
    // vocabulary groupBy + HAVING, but with O(k·partitions) state —
    // the shape that still works when the vocabulary doesn't fit.
    "q68_heavy_hitters" -> { (s, d) =>
      import s.implicits._
      HeavyHitters.frequentTokens(Tables.documents(s, d), $"text", k = 500)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q67_prefix_simjoin" ->
      s"WITH ${PipelineOps.nearDupCtes("", 0.80)}\nSELECT da, db, jaccard FROM neardup",

    "q68_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS cnt FROM tok
        |GROUP BY token
        |HAVING count(*) * 500 > (SELECT count(*) FROM tok)""".stripMargin
  )
}
