package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join prefiltering — the runtime-filter pattern
  * Catalyst applies to shuffle joins (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`), exposed as an explicit operator for when the
  * planner can't see the opportunity (e.g. the dim side is the output of
  * an arbitrary computation, or the join happens in a later job).
  *
  * Why it matters at 100 TB: a broadcast hash of N dim keys costs
  * O(N·8B) exact; the Bloom filter costs ~1.2 bytes/key at 1% fpp — an
  * order of magnitude smaller broadcast — and discards non-matching
  * fact rows BEFORE the shuffle/join, so the exchange carries only
  * (matches + fpp·non-matches). The exact semi-join afterwards removes
  * false positives: the composed result is exactly the semi-join, the
  * filter only shrinks intermediate traffic.
  */
object Prefilter {

  /** `fact` rows whose `factKey` appears in `dim.dimKey`, computed as
    * Bloom prefilter → exact semi-join. `fpp` trades broadcast size for
    * post-filter traffic. Keys must be integral (cast to long).
    */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // Fail fast on non-integral keys: a string key would cast to NULL
    // row by row, the bloom filter would be built over nothing, and
    // the join would silently return empty (the trap TemporalJoins.asOf
    // guards with the same check).
    locally {
      import org.apache.spark.sql.types._
      for ((df, k, role) <- Seq((dim, dimKey, "dimKey"), (fact, factKey, "factKey"))) {
        val dt = df.select(k).schema.head.dataType
        require(dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType,
          s"bloomSemiJoin $role must be integral, got $dt — hash non-numeric keys first")
      }
    }
    // Persisted: the dim pipeline — "the output of an arbitrary
    // computation", the operator's stated motivation — is consumed by
    // THREE actions/plans (count, bloomFilter aggregate, semi-join);
    // unpersisted it would run three times.
    val keys = dim.select(dimKey.cast("long").as("__key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One pass over the dim side builds the filter; expectedNumItems
    // from a cheap count keeps the sizing honest as the dim side grows.
    val n = math.max(1L, keys.count())
    val bloom = keys.stat.bloomFilter("__key", n, fpp)
    val bloomB = fact.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: Long) => bloomB.value.mightContainLong(k))
    fact.filter(might(factKey.cast("long")))
      // leftsemi dedups the probe side itself — no distinct() needed.
      .join(keys, factKey.cast("long") === col("__key"), "leftsemi")
  }
}
