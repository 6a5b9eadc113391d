package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Cross-operator laws for the mixture-manifest family on real
  * testdata: plan → execute → extend → diff → audit must compose —
  * each operator's contract stated THROUGH the next operator, not just
  * its own unit test.
  */
class ManifestPipelineSpec extends SparkSpec {

  test("manifest family composes: extension is append-only through diff") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val tok = TextAnalysis.tokenCount($"text")
    val w = (src: org.apache.spark.sql.Column) =>
      lit(1) + substring(src, 4, 10).cast("int") % 5
    val base = docs.filter($"doc_id" % 4 =!= 0)
    val p1 = Curation.waterfillBudget(base, $"source", tok, w, budgetPct = 60)
    val m1 = Curation.executeMixturePlan(base, $"doc_id", $"source", tok,
      p1, seed = "s1")

    // Per-source spend never exceeds the plan.
    val alloc = p1.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    m1.groupBy($"source").agg(sum($"n_tokens").as("t")).collect()
      .foreach(r => assert(r.getLong(1) <= alloc(r.getString(0)),
        s"${r.getString(0)} overspent"))

    // Extend on corpus growth; the diff must see ONLY additions.
    val p2 = Curation.waterfillBudget(docs, $"source", tok, w, budgetPct = 60)
    val ext = Curation.extendManifest(m1, docs.filter($"doc_id" % 4 === 0),
      $"doc_id", $"source", tok, p2, seed = "s2")
    val d = Curation.manifestDiff(m1, ext).collect()
    d.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(4) == 0L,
        s"${r.getString(0)}: extension removed rows")
    }
    // Every base row survives verbatim: kept counts equal m1's.
    val m1Counts = m1.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    d.foreach { r =>
      assert(r.getLong(3) == m1Counts.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: kept != base")
    }

    // An empty growth batch is the identity extension.
    val extEmpty = Curation.extendManifest(m1, docs.limit(0), $"doc_id",
      $"source", tok, p2, seed = "s3")
    assert(extEmpty.collect().map(_.toSeq).toSet ==
      m1.collect().map(_.toSeq).toSet)

    // The extended manifest feeds the order/audit stage: batch counts
    // cover the manifest exactly and the integer TVD stays in range.
    val ord = EpochShuffle.order(ext, $"doc_id", seed = "s4", shards = 2)
    val audit = EpochShuffle.batchMixAudit(ord, ext, $"doc_id", $"source",
      batchSize = 16).collect()
    val n = ext.count()
    assert(audit.map(_.getLong(2)).sum == n, "batches must cover the manifest")
    audit.foreach { r =>
      val (nb, tvd) = (r.getLong(2), r.getLong(3))
      assert(tvd >= 0L && tvd <= 2L * n * nb, s"TVD numerator out of range")
    }
    ord.unpersist(); m1.unpersist(); ext.unpersist(); extEmpty.unpersist()
  }
}
