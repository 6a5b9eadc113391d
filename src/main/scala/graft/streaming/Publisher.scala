package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Publisher-side helpers: UUID stamping (E2) and partition mappings
  * (M1-M3, `/root/reference/message/routines.go:62-154`).
  *
  * Mappings return a journal-name column; the physical shuffle happens
  * when the caller repartitions / writes by that column — Spark's hash
  * shuffle subsumes the reference's "data shuffles" substrate.
  */
object Publisher {

  /** Stamp a v1 UUID column from producer/clock/flags columns (E2's
    * PublishCommitted stamping; clock monotonicity per producer is the
    * caller's ordering contract, e.g. an event-time column).
    */
  def stampUuids(df: DataFrame, producer: Column, clock: Column, flags: Column,
      uuidCol: String = "uuid"): DataFrame =
    df.withColumn(uuidCol, F.build_uuid(producer, clock, flags))

  /** M1 RandomMapping: uniform pseudo-random journal choice (seeded for
    * reproducibility; the reference uses a true PRNG).
    */
  def randomMapping(journals: Seq[String], seed: Long = 42L): Column = {
    // Fail at the driver, not per-row in tasks: an empty journal list
    // is a modulo-by-zero / empty element_at at runtime otherwise
    // (ANSI throw, or silent null routing with ANSI off).
    require(journals.nonEmpty, "randomMapping: journals must be non-empty")
    element_at(typedlit(journals), (floor(rand(seed) * journals.size) + 1).cast("int"))
  }

  /** M2 ModuloMapping: FNV-1a32(key) mod N — byte-compatible with the
    * reference's stable assignment.
    */
  def moduloMapping(key: Column, journals: Seq[String]): Column = {
    require(journals.nonEmpty, "moduloMapping: journals must be non-empty")
    element_at(typedlit(journals), (F.fnv1a32(key) % journals.size + 1).cast("int"))
  }

  /** M3 RendezvousMapping: highest-random-weight choice
    * w_i = fnv1a32(key) XOR fnv1a32(journal_i); minimal remapping as the
    * journal set changes.
    */
  def rendezvousMapping(key: Column, journals: Seq[String]): Column = {
    require(journals.nonEmpty, "rendezvousMapping: journals must be non-empty")
    val jHashes = journals.map(j =>
      graft.functions.Hashes.fnv1a32(j.getBytes("UTF-8")))
    val keyHash = F.fnv1a32(key)
    // Argmax as array_max over (weight, -index) structs — O(N) tree.
    // (A when-chain fold that threads the running best as a Column
    // embeds it TWICE per step: O(2^N) expression nodes, driver hang
    // at ~30 journals.) The negated index breaks weight ties toward
    // the FIRST journal in list order, the reference's strict->
    // comparison semantics.
    val entries = array(journals.zip(jHashes).zipWithIndex.map {
      case ((_, h), i) =>
        struct(keyHash.bitwiseXOR(lit(h)).as("w"), lit(-i).as("ni"))
    }: _*)
    val best = array_max(entries)
    element_at(array(journals.map(lit): _*),
      (-best.getField("ni")).cast("int") + 1)
  }
}
