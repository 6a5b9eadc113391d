package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The writer-race REMEDIATION contract (VERDICT r9 #3): dual-writer
  * fixture → audit → [[Journal.repairShadowed]] → read-back equals the
  * UNION of both appends with zero duplicates. Covers both race
  * shapes: a same-head race (losing fragment fully shadowed) and
  * diverged-head crossing spans (only the overlapped prefix lost — the
  * crossing fragment's tail is served, and re-appending it would
  * duplicate).
  */
class RepairShadowedSpec extends SparkSpec {

  test("audit -> repair -> read-back is the union of both appends, no duplicates") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-repair").toString
    val j = "race/r"
    Journal.append(Seq("seed").toDF("payload"), root, j, codec = "none")

    // Same-head race: A and B both stage from the current head; A's
    // longer fragment wins the cover, B is fully shadowed.
    val a = Journal.stage(Seq("A-1", "A-2").toDF("payload").coalesce(1),
      root, j, codec = "none")
    val b = Journal.stage(Seq("B-1").toDF("payload").coalesce(1),
      root, j, codec = "none")
    (a ++ b).foreach { case (frag, tmp) => Journal.commitFragment(frag, tmp) }

    // Diverged-head crossing span: C staged from the true head, then
    // re-planned 3 bytes back (its writer read a lagging store). Its
    // first record begins in the shadowed prefix (lost); the second
    // begins past the serving boundary (served from C itself).
    val headNow = Journal.head(root, j)
    val c = Journal.stage(Seq("C-one", "C-two").toDF("payload").coalesce(1),
      root, j, codec = "none")
    val cf = c.head._1
    val shifted = cf.copy(begin = cf.begin - 3, end = cf.end - 3,
      path = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, j),
        f"${cf.begin - 3}%016x-${cf.end - 3}%016x-${cf.sha1}.none").toString)
    Journal.commitFragment(shifted, c.head._2)

    val overlaps = Journal.overlappingFragments(Seq(root), j)
    assert(overlaps.size == 2, s"expected B-full + C-prefix: $overlaps")

    // Pre-repair: the lost records never surface.
    val before = Journal.read(spark, root, j).collect().map(_.payload).toSeq
    assert(before.sorted == Seq("seed", "A-1", "A-2", "C-two").sorted,
      s"pre-repair read: $before")

    val repaired = Journal.repairShadowed(spark, Seq(root), j, codec = "none")
    assert(repaired.nonEmpty)

    // Post-repair: the union of BOTH writers' records, each exactly
    // once. The shadowed spans stay served by the winners (audit trail
    // intact); the lost records live at fresh offsets.
    val after = Journal.read(spark, root, j).collect().map(_.payload).toSeq
    assert(after.sorted ==
      Seq("seed", "A-1", "A-2", "B-1", "C-one", "C-two").sorted,
      s"post-repair read: $after")
    assert(after.distinct.length == after.length, s"duplicates: $after")

    // A healthy journal repairs to a no-op.
    val clean = Files.createTempDirectory("graft-repair-clean").toString
    Journal.append(Seq("x", "y").toDF("payload"), clean, "ok/j")
    assert(Journal.repairShadowed(spark, Seq(clean), "ok/j").isEmpty)
  }
}
