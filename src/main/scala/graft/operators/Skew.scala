package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at 100 TB scale.
  *
  * Spark's AQE rebalances skewed *joins* at runtime; skewed
  * *aggregations* with algebraic functions are handled here by salted
  * two-phase aggregation: key → (key, salt) partial agg → final agg.
  * The partial shuffle spreads a hot key over `salts` reducers; the
  * final shuffle only carries `salts` rows per key.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates expressed as
    * (partial, merge) pairs over the same column names, e.g.
    * partial: sum(x) as sx, count(1) as n → merge: sum(sx), sum(n).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      salts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // The salt MUST be deterministic per row content: partition-id +
    // monotonic-id change when a lost task recomputes with a different
    // upstream row order, so rows would re-shuffle to DIFFERENT
    // (key, salt) reduce partitions mid-stage and be double-counted or
    // lost (the SPARK-23207 failure class). Content hashing is stable
    // under recompute; identical duplicate rows sharing a salt only
    // skews the PARTIAL aggregation, which merge repairs.
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for hot keys: replicate the SMALL side across
    * `salts` copies and scatter the big side's rows uniformly over
    * those copies, joining on (key, salt). A hot key's rows then land
    * on `salts` reducers instead of one, at the cost of a small-side
    * blow-up of `salts`× — the manual form of AQE's skew-join split,
    * usable when AQE can't see the skew (e.g. non-shuffle inputs) or
    * as an explicit plan contract. Result set is identical to
    * `big.join(small, keys)`.
    *
    * The big side's salt only needs to be uniform — it is derived by
    * hashing the whole row (via all columns), so the operator needs no
    * unique-id column and stays deterministic per row content.
    *
    * Known limitation: EXACT duplicate rows share one salt, so a hot
    * key made of repeated identical rows still lands on one reducer.
    * A nondeterministic per-row salt is NOT a safe fix (recompute
    * would re-salt rows mid-stage — see saltedAgg); dedupe or add a
    * distinguishing column upstream instead.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted distinct-count: exact COUNT(DISTINCT v) per hot key without
    * a single-reducer hotspot — phase 1 dedups (key, v-hash-salt) pairs,
    * phase 2 sums partial distinct counts (v is salted by its own hash,
    * so each distinct value lands in exactly one salt bucket).
    */
  def saltedCountDistinct(
      df: DataFrame, keys: Seq[Column], value: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(value), lit(salts)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(countDistinct(value).as("__pc"))
      .groupBy(keys: _*)
      .agg(sum(col("__pc")).as("n_distinct"))
}
