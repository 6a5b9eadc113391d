package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Scale probe for the banded hamming image near-dup kernel (q188):
  * measures, at a given SF, the three numbers that certify
  * corpus-linear candidate generation on a REALISTIC hash
  * distribution (real decode, few-bit variant flips, bounded cluster
  * sizes — the q188 corpus, uncapped):
  *
  *   docs        — corpus size N
  *   candidates  — distinct pairs sharing ≥1 identical 16-bit band
  *                 slice (the join's exchange width, BEFORE the
  *                 distance filter)
  *   pairs       — candidates with hamming ≤ maxDist (the answer)
  *
  * Linear means candidates/docs stays ~constant as N grows 10× —
  * i.e. the (band, slice) join generates O(N) work, not O(N²)/k.
  * Not part of the gate; reproduces the PERF.md table.
  */
object NeardupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Engine.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val t0 = System.nanoTime()
    val params = Tables.documents(spark, sfDir)
      .select($"doc_id".cast("long").as("doc_id"))
      .withColumn("cluster", expr("doc_id div 4"))
      .withColumn("m", ($"doc_id" % 4).cast("int"))
      .withColumn("far", $"doc_id" % 4 === 3 &&
        expr("doc_id div 4") % 3 === 0)
    val build = udf { (c: Long, m: Int, far: Boolean) =>
      graft.operators.VideoFixtures.neardupJpeg(c, m, far)
    }
    val hashed = params
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("h", graft.operators.ImagePhash.imageDhash(
        build($"cluster", $"m", $"far")))
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
