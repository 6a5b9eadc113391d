package graft

import graft.SparkSpec

/** Every registered gate query must EXECUTE at sf0.001 — the smallest
  * driver scale — without throwing. Catches small-data assumptions
  * (empty groups, fewer rows than k, degenerate ranges) that the
  * sf0.01 oracle gate never exercises. Row counts aren't asserted
  * (that's the oracle's job); completing the action is the contract.
  */
class GateSmokeSpec extends SparkSpec {

  test("all queries execute at sf0.001; entry returns rows") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed at sf0.001:\n${failures.mkString("\n")}")
    assert(SparkEntry.entry(spark).count() > 0, "entry() must return rows")
  }

  test("every gate query has an oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
