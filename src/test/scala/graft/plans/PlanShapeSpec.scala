package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Plan-SHAPE regression suite: the scale properties PLANS.md audits by
  * hand, locked in as assertions so a refactor can't silently
  * reintroduce a driver-side collect shape, a cartesian product, or a
  * shuffle where a broadcast was the design.
  *
  * Planned (not executed) at sf0.001 — `executedPlan` gives the
  * pre-AQE physical plan; queries whose CONSTRUCTION runs driver
  * actions (stats heads, index builds, k-means rounds) run those at
  * the smallest scale.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("no gate query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val p = try plan(n) catch { case e: Throwable => s"ERROR ${e.getMessage}" }
      if (p.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("star join q04 broadcasts every dimension") {
    val p = plan("q04_region_revenue")
    assert(p.contains("BroadcastHashJoin"), "dimensions must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the fact table must not sort-merge against a dimension")
  }

  test("q37 candidates flow through equi-joins only") {
    val p = plan("q37_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "near-dup candidates must come from the banded equi-join, not a loop join")
    assert(!p.contains("CollectLimit"), "no driver-side corpus collect")
  }

  test("layout keys (q70/q91) derive with zero exchanges") {
    for (q <- Seq("q70_zorder_key", "q91_hilbert_key")) {
      val p = plan(q)
      assert(!p.contains("Exchange"),
        s"$q: key derivation is a narrow map over the scan, got:\n$p")
    }
  }

  test("q59 bloom prefilter keeps the fact side scan-shaped") {
    val p = plan("q59_bloom_semijoin")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "bloom semi-join must stay broadcast-shaped at this scale")
  }

  test("q98/q100 window analytics reuse ONE hash exchange") {
    for (q <- Seq("q98_cusum_changepoint", "q100_equidepth_hist")) {
      val p = plan(q)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(shuffles == 1,
        s"$q: all windows and aggregates must share one partitioning, got $shuffles:\n$p")
    }
  }

  test("q95/q99 graph plans cache their edge sets and stay equi-join-shaped") {
    for (q <- Seq("q95_triangle_counts", "q99_label_propagation")) {
      val p = plan(q)
      assert(p.contains("InMemoryTableScan"),
        s"$q: the edge set must be persisted, not recomputed per arm")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q: vertex joins must be equi-joins")
    }
  }

  test("q96/q97 probe a persisted token/posting cache, one corpus scan") {
    for (q <- Seq("q96_count_min", "q97_phrase_search")) {
      val p = plan(q)
      assert(p.contains("InMemoryTableScan"),
        s"$q: the exploded token stream must be cached once")
    }
  }

  test("q88 recall overlap joins two top-k tables, never the corpus") {
    // Window rank caps both inputs at k rows per probe BEFORE the
    // overlap join: the join inputs must sit above a rank filter.
    val p = plan("q88_ann_recall")
    assert(p.contains("row_number"), "ranked inputs expected")
    assert(!p.contains("CartesianProduct"))
  }

  test("q124 CDC chunking plans with zero exchanges") {
    val p = plan("q124_cdc_chunking")
    val exchanges = "Exchange".r.findAllIn(p).size
    // the single repartition after the one-file scan is the only one;
    // boundaries, spans, and hashes all derive in narrow projections
    assert(exchanges <= 1,
      s"q124: chunking must be shuffle-free past the scan, got:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "q124 must not join at all")
  }

  test("q119 dup spans marks duplicates with window counts, no self-join") {
    // occurrence counting is count() OVER (PARTITION BY hash) — one
    // hash exchange — not a groupBy + join-back (two exchanges + join)
    val p = plan("q119_dup_spans")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q123 BPE encode layers stay separate Projects (no expression blowup)") {
    // Folding the 10 merge layers into one nested Column would copy
    // each layer ~7x per reference — the plan string itself would be
    // megabytes. Keeping layers as attribute-referencing Projects
    // bounds the plan size.
    val p = plan("q123_bpe_encode")
    assert(p.length < 2000000, s"plan string blew up: ${p.length} chars")
  }

  test("q126 covariance is one partial->final aggregation, one exchange") {
    // The d(d+1)/2 buffer must combine map-side: exactly one
    // SinglePartition exchange carrying per-partition buffers, and the
    // d^2 cell Generate sits ABOVE the final aggregate.
    val p = plan("q126_embedding_covariance")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"q126: expected exactly 1 exchange, got:\n$p")
    assert(p.contains("ObjectHashAggregate"), "typed CovAgg must drive the plan")
    assert(!p.contains("SortAggregate"), "buffer combine must not sort")
  }

  test("q127 JL projection broadcasts the sign matrix") {
    val p = plan("q127_jl_projection")
    assert(p.contains("BroadcastHashJoin"),
      "the 64x16 sign matrix must broadcast against the exploded vectors")
    assert(!p.contains("SortMergeJoin"), "no vector-sized shuffle for the matrix join")
  }

  test("q129 hard negatives broadcast probes and heap-aggregate the top-k") {
    val p = plan("q129_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "probes must broadcast against the corpus scan")
    assert(p.contains("ObjectHashAggregate"),
      "per-probe top-k must be the mergeable TopKAgg, not a window sort")
    assert(!p.contains("Window"), "no per-probe window rank in the scale path")
  }

  test("q135 surprisal buckets broadcast the per-source cuts") {
    val p = plan("q135_surprisal_buckets")
    // The threshold table (per-source cuts off the score histogram)
    // must come back as a broadcast, never a corpus-keyed shuffle join.
    assert(p.contains("BroadcastHashJoin"), "cut join must broadcast")
    assert(!p.contains("CollectLimit"), "no driver-side corpus collect")
  }

  test("q136 epoch shuffle has no corpus-wide rank window") {
    val p = plan("q136_epoch_shuffle")
    assert(!p.contains("Window"),
      "per-shard positions must use the two-phase rank, not " +
        "row_number over a per-shard window")
  }

  test("q137 novelty attributes first occurrences via equi-joins only") {
    val p = plan("q137_ngram_novelty")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "the first-occurrence join must key on the shingle hash")
  }

  test("unpartitioned windows appear ONLY in whitelisted bounded-frame queries") {
    // A Window with no PARTITION BY single-threads its whole input —
    // fine over a |sources|/|bins|-row plan table, a scale killer over
    // a corpus. The whitelist enumerates every site where the input is
    // provably bounded (audited in PLANS.md); a NEW unpartitioned
    // window anywhere else fails here instead of hiding in the
    // "No Partition Defined" warning noise.
    // The OPTIMIZED LOGICAL plan: AQE wraps the physical tree in an
    // AdaptiveSparkPlanExec leaf that tree-collect does not descend
    // into, and the logical Window is the semantic fact anyway.
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val unpartitioned = try {
        SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.optimizedPlan.collect {
            case w: Window if w.partitionSpec.isEmpty => w
          }
      } catch { case _: Throwable => Nil }
      if (unpartitioned.nonEmpty) Some(n) else None
    }
    // Bounded inputs, by construction of each query:
    //  - waterfill/mixture plans: |sources| rows after a per-source agg
    //  - histogram/quantile cuts: |bins| rows
    //  - *_stats / audit tables: one row per source/cell/stage
    // Every other window in the gate suite is partitioned (or optimized
    // away); these four sit over aggregated tables bounded by
    // construction. The rest of the mixture/plan family's bounded
    // windows ARE partitioned (by source) and so never appear here.
    val allowed = Set(
      "q116_pareto_frontier", // sweep over the |distinct x| aggregate (Skyline scaladoc)
      "q149_token_waterfill", // |sources| plan rows after the per-source agg
      "q90_ivf_cell_stats",   // |cells| occupancy rows
      "q103_rrf_fusion")      // two k-bounded rank lists, full-outer joined
    val unexpected = offenders.filterNot(allowed)
    val stale = allowed -- offenders.toSet
    assert(unexpected.isEmpty,
      s"NEW unpartitioned window over a possibly-unbounded input in: " +
        s"${unexpected.mkString(", ")} — partition it or whitelist with a " +
        "bounded-input justification")
    assert(stale.isEmpty,
      s"whitelist entries no longer plan an unpartitioned window " +
        s"(remove them): ${stale.mkString(", ")}")
  }

  test("q184/q187 archive explodes run executor-side with one exchange " +
    "(the per-doc aggregate) and no join") {
    for (q <- Seq("q184_warc_ingest", "q187_webdataset",
        "q200_robots_compliance", "q201_sitemap")) {
      val p = plan(q)
      assert(p.contains("Generate"),
        s"$q: the archive explode must be a generator, not a join-back")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 1,
        s"$q: only the per-doc aggregate may shuffle, got $exchanges:\n$p")
      assert(!p.contains("Join"), s"$q must not join at all")
    }
  }

  test("q181/q188 hamming near-dup candidates come from the banded " +
    "equi-join (band keys explode executor-side, dedup aggregates)") {
    for (q <- Seq("q181_hamming_neardup", "q188_image_neardup_real")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q: candidates must come from the (table, key) equi-join")
      assert(p.contains("Generate"),
        s"$q: band/combination keys must explode executor-side")
      assert(p.contains("HashAggregate"),
        s"$q: multi-key candidate matches must dedup via aggregate")
    }
    // q188 hashes once: the expensive decode UDF feeds the join's two
    // sides and both rollups through ONE persisted set.
    assert(plan("q188_image_neardup_real").contains("InMemoryTableScan"),
      "q188: the hash set must be persisted, not re-decoded per arm")
  }

  test("streaming web/media triage (the q176/q189 in-flight stage) is " +
    "a stateless projection: zero exchanges before the sink") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // Pin the SAME batch composition the streams run per micro-batch.
    val web = Seq((1L, graft.operators.Warc.webFixture(1L, 3)))
      .toDF("doc_id", "content")
    val webTriage = graft.operators.Warc.explodeRecords(web,
        blobCol = "content", keep = Seq("doc_id"))
      .withColumn("url", graft.operators.UrlNorm.urlCanonical(
        $"target_uri"))
      .withColumn("h", graft.operators.HtmlExtract.htmlText(
        $"payload".cast("string")))
    assert(!webTriage.queryExecution.executedPlan.toString
      .contains("Exchange"), "q189 triage must not shuffle")
    val media = Seq((1L, "not media".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val mediaTriage = graft.operators.MediaRouter.route(media)
    assert(!mediaTriage.queryExecution.executedPlan.toString
      .contains("Exchange"), "q176 triage must not shuffle")
    // The q197 document triage: route + format-matched extraction is
    // the same stateless projection.
    val docs = Seq((1L, graft.operators.PdfFixtures.pdf(1L)))
      .toDF("doc_id", "blob")
    val docTriage = graft.operators.MediaRouter.route(docs, "blob")
      .withColumn("pdf", graft.operators.Pdf.pdfText($"blob"))
      .withColumn("dx", graft.operators.OfficeDoc.docx($"blob"))
    assert(!docTriage.queryExecution.executedPlan.toString
      .contains("Exchange"), "q197 triage must not shuffle")
  }

  test("q192/q194 codec round-trips are narrow per-row kernels: one " +
    "repartition exchange, no join, no generate") {
    for (q <- Seq("q192_flac_roundtrip", "q194_wav_codecs",
        "q195_pdf_text", "q196_docx_text", "q199_latex_clean")) {
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("Generate"),
        s"$q must be a pure per-row map:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 1,
        s"$q: only the pre-decode repartition may shuffle, got $exchanges")
    }
  }

  test("q193 video near-dup: keyframe hashes persist once, candidates " +
    "come from combination-key equi-joins, voting aggregates on pairs") {
    val p = plan("q193_video_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q193: candidates must come from the (table, key) equi-join")
    assert(p.contains("Generate"),
      "q193: keyframe explode + combination keys must generate executor-side")
    assert(p.contains("InMemoryTableScan"),
      "q193: the decoded keyframe hash set must be persisted, not " +
        "re-decoded per consumer (join sides + keyframe counts + rollups)")
    assert(p.contains("HashAggregate"),
      "q193: candidate dedup and offset voting must aggregate")
  }

  test("q149 waterfill shuffles the corpus exactly once (per-source agg)") {
    // Everything after the source-keyed aggregate runs on |sources|
    // rows: the windows sit over a SinglePartition exchange, never a
    // corpus-sized one.
    val p = plan("q149_token_waterfill")
    val corpusShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(corpusShuffles == 1,
      s"q149: expected one corpus-sized exchange, got $corpusShuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "q149 must not join at all")
  }
}
