package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) builder: collapse an ordered
  * attribute stream into validity intervals — one row per run of
  * equal attribute values, carrying `[valid_from, valid_to)` and a
  * current-row flag. The standard warehouse operator for turning an
  * event/CDC log into a versioned dimension table (reference analog:
  * materializing keyed register history from a journal of updates,
  * the bike-share "latest state per key with history" pattern).
  *
  * Scale design: ONE shuffle total. The change-flag lag, the running
  * run-id sum, and the interval lead all window over the same
  * `partitionBy(key)` — Catalyst plans a single Exchange + Sort and
  * evaluates the first two in one Window operator. The run collapse
  * is a `groupBy(key, run)` whose required clustering is already
  * satisfied by the hash partitioning on `key` (key ⊆ grouping keys),
  * so no second exchange; per-run state is O(1) and runs per key are
  * bounded by that key's row count — no skew beyond what the raw
  * stream already has.
  *
  * Open intervals use `valid_to = Long.MaxValue` rather than NULL so
  * the column stays non-nullable int64 end-to-end (a NULL would turn
  * the pandas-side dtype into float64 and break differential hashing;
  * the 9999-12-31 sentinel of classic SCD2, in microseconds).
  */
object Scd {

  val OpenEnd: Long = Long.MaxValue

  /** Build Type-2 intervals from `df`.
    *
    * @param key  dimension key column (e.g. user_id)
    * @param attr tracked attribute; a new interval starts whenever its
    *             value differs from the previous row's in `ts` order
    * @param ts   event-time column (long; microseconds by convention)
    * @param tie  unique tiebreaker for rows with equal `ts`
    * @return (key, attr, valid_from, valid_to, n_obs, is_current):
    *         valid_from = first ts of the run, valid_to = start of the
    *         next run (OpenEnd when none), n_obs = rows collapsed,
    *         is_current = 1 for each key's last run else 0.
    */
  def type2(df: DataFrame, key: Column, attr: Column, ts: Column,
            tie: Column): DataFrame = {
    val base = df.select(key.as("k"), attr.as("a"), ts.as("t"), tie.as("o"))
    val wo2 = Window.partitionBy(col("k")).orderBy(col("t").asc, col("o").asc)
    // Null-SAFE change detection (<=>): with =!= a NULL attr following
    // a value would fold into the previous run (NULL condition = no
    // change) and consecutive NULLs would each open a new run. The
    // first row of a partition still starts a run: NULL <=> value is
    // false, so the negation fires.
    val runs = base
      .withColumn("chg",
        when(!(lag(col("a"), 1).over(wo2) <=> col("a")), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(wo2))
      .groupBy(col("k"), col("run"))
      .agg(min(col("a")).as("attr"), // constant within a run
        min(col("t")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val wr = Window.partitionBy(col("k")).orderBy(col("run").asc)
    runs.select(col("k"), col("attr"), col("valid_from"),
        coalesce(lead(col("valid_from"), 1).over(wr), lit(OpenEnd))
          .as("valid_to"),
        col("n_obs"),
        when(lead(col("valid_from"), 1).over(wr).isNull, 1L).otherwise(0L)
          .as("is_current"))
      .withColumnRenamed("k", "key")
  }

  /** Point-in-time lookup against a Type-2 dimension: the attribute
    * value in force at `asOf` for each key (rows whose interval
    * contains the instant). A plain range filter — partition-prunable
    * when the dimension is stored sorted/bucketed by key.
    */
  def asOf(dim: DataFrame, asOfTs: Long): DataFrame =
    dim.filter(col("valid_from") <= asOfTs && col("valid_to") > asOfTs)
}
