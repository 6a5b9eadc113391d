package graft.tools

import graft.Engine

/** Scale probe for the banded hamming image near-dup kernel (q188):
  * measures, at a given SF, the three numbers that certify
  * corpus-linear candidate generation on a REALISTIC hash
  * distribution (real decode, few-bit variant flips, bounded cluster
  * sizes — the q188 corpus, uncapped):
  *
  *   docs        — corpus size N
  *   candidates  — distinct pairs agreeing on ≥1 join key BEFORE the
  *                 distance filter (the join's exchange width), for
  *                 BOTH kernels: single 16-bit bands (band16, q181's
  *                 gate shape) and Manku 3-of-6 block combinations
  *                 (combo6c3, the q188 scale path)
  *   pairs       — candidates with hamming ≤ maxDist (the answer)
  *
  * Linear means candidates/docs stays ~constant as N grows 10× —
  * i.e. the keyed join generates O(N) work, not O(N²)/k. The corpus
  * comes from the SAME builder the gate query runs
  * ([[graft.queries.MultimodalOps.neardupHashes]]), so the probe
  * certifies exactly the gate's distribution. Not part of the gate;
  * reproduces the PERF.md table.
  */
object NeardupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Engine.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val t0 = System.nanoTime()
    val hashed = graft.queries.MultimodalOps.neardupHashes(spark, sfDir)
      .select($"doc_id", $"h")
      .persist()
    val docs = hashed.count()
    val tHash = (System.nanoTime() - t0) / 1e9

    // Both kernels over the same hash set: single-band keys (the q181
    // gate shape) vs Manku block-combination keys (the scale path).
    Seq(("band16", 4, 1), ("combo6c3", 6, 3)).foreach {
      case (name, blocks, comboSize) =>
        val t1 = System.nanoTime()
        val cands = graft.operators.ImagePhash.hammingCandidates(
          hashed, "doc_id", "h", blocks, comboSize).persist()
        val nCand = cands.count()
        val nPairs = cands.where($"dist" <= 3).count()
        val tJoin = (System.nanoTime() - t1) / 1e9
        cands.unpersist()
        println(f"[probe] kernel=$name sf=$sfDir docs=$docs " +
          f"candidates=$nCand pairs=$nPairs " +
          f"cand_per_doc=${nCand.toDouble / docs}%.3f " +
          f"cand_to_pair=${nCand.toDouble / math.max(1, nPairs)}%.3f " +
          f"hash_s=$tHash%.2f join_s=$tJoin%.2f")
    }
    spark.stop()
  }
}
