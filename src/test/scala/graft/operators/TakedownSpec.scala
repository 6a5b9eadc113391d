package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TakedownSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 40L).map(i => (i, s"word$i " * (i % 7 + 1).toInt)).toDF("doc_id", "text")
  }

  private def embs = {
    import spark.implicits._
    (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 7) % 13).toFloat / 13f), 0))
      .toDF("vec_id", "embedding", "label")
  }

  test("empty deletion set touches nothing; full set rebuilds everything") {
    import spark.implicits._
    val none = Takedown.impactAudit(corpus, embs,
        spark.range(0).select($"id".as("doc_id")),
        shards = 4, budget = 16, kCells = 4)
      .select($"artifact", $"units_touched", $"rows_deleted", $"rebuild_frac")
      .as[(String, Long, Long, Double)].collect()
    assert(none.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0.0))

    val all = Takedown.impactAudit(corpus, embs,
        corpus.select($"doc_id"), shards = 4, budget = 16, kCells = 4)
      .select($"artifact", $"units_touched", $"units_total", $"rebuild_frac")
      .as[(String, Long, Long, Double)].collect()
    assert(all.forall(r => r._2 == r._3), s"full deletion must touch every unit: ${all.toSeq}")
    assert(all.forall(_._4 == 1.0))
  }

  test("single deletion: suffix semantics for the epoch artifact") {
    import spark.implicits._
    val one = corpus.filter($"doc_id" === 7L).select($"doc_id")
    val out = Takedown.impactAudit(corpus, embs, one,
        shards = 4, budget = 16, kCells = 4)
      .select($"artifact", $"units_touched", $"units_total",
        $"rows_deleted", $"rebuild_frac")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // Exactly one shard, one cell, >=1 pack sequence touched.
    assert(out("epoch_suffix")._2 == 1L && out("epoch_suffix")._4 == 1L)
    assert(out("ivf_cell")._2 == 1L && out("ivf_cell")._4 == 1L)
    assert(out("pack_seq")._2 >= 1L && out("pack_seq")._4 == 1L)
    // The epoch rebuild is a SUFFIX: strictly less than the corpus
    // unless doc 7 happens to be its shard's first position, and at
    // most the whole corpus either way.
    val frac = out("epoch_suffix")._5
    assert(frac > 0.0 && frac <= 1.0)
  }

  test("empty artifact families report 0.0, not NaN") {
    import spark.implicits._
    val emptyPacks = spark.range(0).select($"id".as("doc_id"),
      lit(0).as("shard"), lit(0L).as("seq_first"), lit(0L).as("seq_last"))
    val emptyOrd = spark.range(0).select(lit(0).as("shard"),
      $"id".as("pos"), $"id".as("doc_id"))
    val emptyCells = spark.range(0).select($"id".as("vec_id"),
      lit(0).as("cell"))
    val del = Seq(1L, 2L).toDF("doc_id")
    val out = Takedown.impactAuditPrebuilt(emptyPacks, emptyOrd,
        emptyCells, del)
      .select($"artifact", $"rebuild_frac").as[(String, Double)].collect()
    assert(out.length == 3)
    assert(out.forall(_._2 == 0.0), s"empty totals must yield 0.0: ${out.toSeq}")
  }

  test("prebuilt-artifact audit equals the rebuild form on the same inputs") {
    import spark.implicits._
    val del = corpus.filter($"doc_id" % 9 === 0).select($"doc_id")
    val rebuilt = Takedown.impactAudit(corpus, embs, del,
      shards = 4, budget = 16, kCells = 4).collect().map(_.toSeq).toSet
    // Materialize the same artifacts a deployment would read from disk.
    val packs = Packing.packSequences(corpus, $"doc_id", $"text", 16, 4)
    val ord = EpochShuffle.order(corpus, $"doc_id", seed = "ep7", shards = 4)
    val cells = Clustering.kmeansAssign(embs, k = 4, updates = 1)
      .select($"vec_id", $"cell")
    val pre = Takedown.impactAuditPrebuilt(packs, ord, cells, del)
      .collect().map(_.toSeq).toSet
    assert(pre == rebuilt, "prebuilt audit diverged from the rebuild form")
    ord.unpersist()
  }
}
