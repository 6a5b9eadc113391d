package graft.streaming

import graft.SparkSpec
import graft.operators.{Contamination, Dedup}
import graft.sources.Journal
import org.apache.spark.sql.functions._

/** Ingest-time contamination guard (the per-message Validator analog,
  * reference message/interfaces.go:143-145): docs stream through
  * [[Contamination.ingestGuardExact]] — a broadcast sorted array of the
  * eval set's distinct shingle hashes — and land in a journal ALREADY
  * tagged, across a kill/restart. The exact guard's tags and hit counts
  * equal the exact batch scan's ([[Contamination.ngramOverlap]], q57's
  * operator) BY CONSTRUCTION, so parity here is asserted exactly.
  *
  * The Bloom form ([[Contamination.ingestGuard]]) has one-sided error by
  * contract — false positives at the sketch's fpp, never false
  * negatives — so it gets the one-sided assertions only (containment +
  * hits ≥ exact): round 7 shipped an exact-parity assertion against the
  * Bloom and it failed deterministically on a cross-boundary shingle
  * collision (doc 13); never assert exactness against a sketch.
  */
class StreamingContaminationSpec extends SparkSpec {

  // Contaminating phrases: 6 tokens → two word-5-grams each.
  private val p1 = "quick brown foxes vault lazy hedges"
  private val p2 = "silver lining over distant mountain ridges"

  /** Eval docs: id % 17 == 0 (ids 0, 17, 34). Doc 17 carries p1,
    * doc 34 carries p2; train docs with id % 4 == 1 share p1, train
    * doc 2 shares p2; everything else is per-doc-unique filler.
    */
  private def textFor(i: Long): String = {
    // tokenize() keeps LETTER runs only (digits split tokens), so the
    // per-doc filler must be alphabetic to stay per-doc-unique.
    def alpha(v: Long) = v.toString.map(c => ('a' + (c - '0')).toChar).mkString
    val filler = (0 to 6).map(k => s"z${alpha(i)}q${alpha(k.toLong)}").mkString(" ")
    if (i == 17) s"$filler $p1"
    else if (i == 34) s"$filler $p2"
    else if (i == 0) filler
    else if (i % 4 == 1) s"$filler $p1"
    else if (i == 2) s"$filler $p2"
    else filler
  }

  test("stream-tagged docs land in the journal with batch-exact tags across a restart") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger

    val all = (0L until 40L).map(i => (i, textFor(i)))
    val docs = all.toDF("doc_id", "text")
    val isEval = (c: org.apache.spark.sql.Column) => c % 17 === 0

    // The exact batch authority (q57's operator) on the same fixture.
    val batchReport = Contamination.ngramOverlap(
      Dedup.docShingles(docs, $"doc_id", $"text", 5), isEval)
    val batchByDoc = batchReport.select($"doc_id", $"n_shared_shingles")
      .as[(Long, Long)].collect().toMap
    batchReport.unpersist()
    assert(batchByDoc.keySet ==
      (1L until 40L by 4).toSet - 17L + 2L,
      s"fixture self-check: got ${batchByDoc.keySet.toSeq.sorted}")

    // Exact ingest guard: broadcast distinct eval-shingle set. Hit
    // counts match the batch scan by construction, so the streamed
    // tags below are asserted with FULL exactness.
    val evalSet = Contamination.evalShingleSet(
      Dedup.docShingles(docs.filter(isEval($"doc_id")), $"doc_id", $"text", 5))

    val root = java.nio.file.Files
      .createTempDirectory("graft-contam-guard").toString
    val ckpt = s"$root/ckpt"
    val input = MemoryStream[(Long, String)](spark)
    def drain(): Unit = {
      val tagged = Contamination.ingestGuardExact(
        input.toDF().toDF("doc_id", "text"), evalSet, n = 5)
      val q = tagged.writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          Journal.batchSink(root, "guard/docs", codec = "none")(
            df.select(to_json(struct($"doc_id", $"n_eval_hits",
              $"contaminated")).as("payload")), batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "guard drain timed out")
    }

    // First half, kill (AvailableNow stop), second half on a NEW query
    // from the same checkpoint.
    input.addData(all.take(20))
    drain()
    input.addData(all.drop(20))
    drain()

    val landed = Journal.read(spark, root, "guard/docs").toDF()
      .select(from_json($"payload", org.apache.spark.sql.types.StructType
        .fromDDL("doc_id BIGINT, n_eval_hits INT, contaminated BOOLEAN"))
        .as("r"))
      .select($"r.doc_id", $"r.n_eval_hits", $"r.contaminated")
      .as[(Long, Int, Boolean)].collect()

    // Exactly-once across the restart: every doc landed, none twice.
    assert(landed.length == 40 &&
      landed.map(_._1).toSet == (0L until 40L).toSet,
      s"expected all 40 docs exactly once, got ${landed.length}")

    val trainTags = landed.filter { case (id, _, _) => id % 17 != 0 }
    // Exact guard: tag set AND per-doc distinct-hit counts equal the
    // batch authority's, exactly.
    val taggedIds = trainTags.filter(_._3).map(_._1).toSet
    assert(taggedIds == batchByDoc.keySet,
      s"tag set mismatch: extra=${taggedIds -- batchByDoc.keySet} " +
        s"missing=${batchByDoc.keySet -- taggedIds}")
    trainTags.filter(_._3).foreach { case (id, hits, _) =>
      assert(hits.toLong == batchByDoc(id),
        s"doc $id: ingest hits $hits != batch shared ${batchByDoc(id)}")
    }
    // Untagged train docs carry zero hits (the flag IS the count gate).
    trainTags.filterNot(_._3).foreach { case (id, hits, _) =>
      assert(hits == 0, s"doc $id untagged but hits=$hits")
    }
    // Eval docs themselves trivially self-hit — the deployment routes
    // them by stream, not by tag; here they just prove the guard sees
    // their shingles.
    landed.filter { case (id, _, _) => id == 17L || id == 34L }
      .foreach { case (id, _, c) => assert(c, s"eval doc $id untagged") }
  }

  test("Bloom ingest guard honors its one-sided contract vs the exact scan") {
    import spark.implicits._
    val all = (0L until 40L).map(i => (i, textFor(i)))
    val docs = all.toDF("doc_id", "text")
    val isEval = (c: org.apache.spark.sql.Column) => c % 17 === 0

    val shingles = Dedup.docShingles(docs, $"doc_id", $"text", 5)
    val batchReport = Contamination.ngramOverlap(shingles, isEval)
    val batchByDoc = batchReport.select($"doc_id", $"n_shared_shingles")
      .as[(Long, Long)].collect().toMap
    batchReport.unpersist()

    val bloom = Contamination.evalShingleBloom(
      Dedup.docShingles(docs.filter(isEval($"doc_id")), $"doc_id", $"text", 5))
    // Stateless projection: identical on batch and streaming frames.
    val tagged = Contamination.ingestGuard(docs, bloom, n = 5)
      .filter(!isEval($"doc_id"))
      .select($"doc_id", $"n_eval_hits", $"contaminated")
      .as[(Long, Int, Boolean)].collect()

    // One-sided error, both directions of the guarantee:
    // 1. No false negatives — every batch-reported doc is tagged, and
    //    its hit count is at least the true shared count.
    val byId = tagged.map(t => t._1 -> t).toMap
    batchByDoc.foreach { case (id, shared) =>
      val (_, hits, c) = byId(id)
      assert(c, s"batch-reported doc $id untagged (false negative)")
      assert(hits.toLong >= shared,
        s"doc $id: Bloom hits $hits < true shared $shared")
    }
    // 2. The flag is the count gate: contaminated <=> n_eval_hits > 0.
    tagged.foreach { case (id, hits, c) =>
      assert(c == (hits > 0), s"doc $id: flag/count disagree ($hits, $c)")
    }
  }
}
