package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join via lossless length blocking — the
  * record-linkage primitive.
  *
  * A pair within `maxDist` edits differs by at most `maxDist` in length,
  * so replicating each left string to the lengths
  * [len-maxDist, len+maxDist] and joining on the right's EXACT length is
  * a lossless blocking: every qualifying pair meets exactly once (at the
  * key equal to the right string's length), and no distinct-pass is
  * needed afterwards.
  *
  * Scale design (100 TB): the O(n²) naive join becomes Σ per-block
  * work — blocks are length buckets, so the candidate count is
  * Σ_L n_L · (n_{L-d..L+d}), and the expensive `levenshtein` runs only
  * on blocked candidates. For corpora where a single length bucket is
  * still huge, compose the block key with a cheap content key (first
  * q-gram, phonetic code) the same way — any key family where edit
  * distance <= d implies at least one shared key keeps the join exact.
  */
object FuzzyJoin {

  /** Distinct-value fuzzy self-join: (na < nb, dist) with
    * levenshtein(na, nb) <= maxDist.
    */
  def selfJoin(df: DataFrame, name: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val n = df.select(name.cast("string").as("name")).distinct()
    val left = n.select(col("name").as("na"),
      explode(sequence(length(col("name")) - maxDist,
        length(col("name")) + maxDist)).as("lb"))
    val right = n.select(col("name").as("nb"), length(col("name")).as("lb"))
    left.join(right, Seq("lb"))
      .filter(col("na") < col("nb"))
      // Materialize the edit-distance as a column FIRST: a
      // filter-then-reselect would evaluate levenshtein twice per
      // surviving pair (no cross-operator subexpression elimination).
      // r11: the THRESHOLD form (Spark 3.5+) runs the banded DP —
      // O(|na|·maxDist) instead of the full O(|na|·|nb|) table — and
      // returns −1 past the band; within the band it is the exact
      // distance, so the kept pairs and their dist values are
      // unchanged.
      .withColumn("dist", levenshtein(col("na"), col("nb"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("na"), col("nb"), col("dist"))
  }
}
