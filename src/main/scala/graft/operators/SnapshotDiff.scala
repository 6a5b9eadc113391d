package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the front door of every incremental
  * pipeline at 100 TB: refreshing a derived corpus should process
  * added ∪ changed documents, not re-run the world. Compare two
  * snapshots by key + content fingerprint in ONE full-outer hash join
  * (each side shuffled once on the key; fingerprints are computed in
  * the scan, so only (key, fp) ever crosses the wire — never payloads).
  */
object SnapshotDiff {

  /** (key, status) for every key in either snapshot, with status in
    * {added, removed, changed, unchanged} (relative to `a` → `b`).
    * `fp` is the content fingerprint expression, evaluated against
    * each snapshot's own columns.
    */
  def diff(a: DataFrame, b: DataFrame, key: String, fp: Column): DataFrame = {
    // Side presence is tracked by explicit markers, NOT by fingerprint
    // nullity — a row whose fingerprint expression evaluates to NULL
    // (e.g. md5 of a NULL payload) is still present, and two NULL
    // fingerprints compare as unchanged (null-safe equality).
    val fa = a.select(col(key).as("k"), fp.as("fpa"), lit(true).as("ina"))
    val fb = b.select(col(key).as("k"), fp.as("fpb"), lit(true).as("inb"))
    fa.join(fb, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("ina").isNull, "added")
          .when(col("inb").isNull, "removed")
          .when(!(col("fpa") <=> col("fpb")), "changed")
          .otherwise("unchanged").as("status"))
  }
}
