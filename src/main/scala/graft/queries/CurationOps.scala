package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup, TextAnalysis}
import graft.functions.TopKAgg

/** Corpus-curation surface (round-3 north-star widening): near-dup
  * cluster resolution, deterministic splits/sampling, TF-IDF keywords,
  * rare-token scoring, text cleaning, and the bounded top-k aggregate.
  *
  * Oracle notes: every formula avoids trans-engine float hazards —
  * rational arithmetic instead of ln(), md5 instead of RNG, integer
  * ceil via (n·p+99) div 100 — so DuckDB reproduces each result
  * bit-for-bit (see Curation scaladoc).
  */
object CurationOps {

  /** The deterministic non-NFC injection q162 audits: decomposed
    * e + U+0301 (combining acute) appended for doc_id%5==0 — the gate
    * corpus is pure ASCII, so the audit needs text that actually
    * denormalizes (the q73 ' v2' injection convention). ONE definition
    * feeding both the Spark column and the oracle SQL.
    */
  private val nfcProbe =
    " caf" + "e\u0301" + " re" + "e\u0301" + "sume" // decomposed e + COMBINING ACUTE
  private val cyrProbe = " \u043f\u0440\u0438\u0432\u0435\u0442" // \u043f\u0440\u0438\u0432\u0435\u0442
  private val grkProbe = " \u03b1\u03b2\u03b3"                   // \u03b1\u03b2\u03b3

  /** DuckDB string literal for a probe: non-ASCII code points render
    * as chr(n) concatenations so the oracle file stays ASCII-safe and
    * byte-identical to the Scala constant.
    */
  private def sqlLit(s: String): String = {
    val sb = new StringBuilder("'")
    s.foreach { c =>
      if (c == '\'') sb.append("''")
      else if (c < 128) sb.append(c)
      else sb.append("' || chr(" + c.toInt + ") || '")
    }
    sb.append("'").toString
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q182: mojibake repair — the encoding-damage pass (UTF-8
    // mis-decoded as CP1252/Latin-1; the public ftfy idea) run over
    // deterministically damaged text: per doc, append m copies of a
    // known artifact (" Ã©" → " é", or the 3-char " â€™" → " ’");
    // EncodingRepair must count exactly m repairs and land on the
    // arithmetic post-repair length, and the clean shape must be a
    // FIXED POINT (documents.text is pure ASCII — n_fixed 0, length
    // unchanged). Narrow per-row map; no shuffle.
    "q182_mojibake_repair" -> { (s, d) =>
      import s.implicits._
      val damaged = Tables.documents(s, d)
        .select($"doc_id".cast("long").as("doc_id"), $"text")
        .withColumn("shape", ($"doc_id" % 3).cast("int"))
        .withColumn("m", ($"doc_id" % 5).cast("int"))
        .withColumn("corrupt", concat($"text",
          when($"shape" === 1, repeat(lit(" Ã©"), $"m"))
            .when($"shape" === 2,
              repeat(lit(" â€™"), $"m"))
            .otherwise(lit(""))))
      damaged
        .withColumn("r",
          graft.operators.EncodingRepair.mojibakeRepair($"corrupt"))
        .select($"doc_id",
          $"r.n_fixed".cast("long").as("n_fixed"),
          length($"r.fixed").cast("long").as("len_fixed"))
    },

    // ---- q186: URL canonicalization — the dedup KEY of a web corpus.
    // Per doc, a deliberately messy URL (case, default port,
    // dot-segments, %7E, tracking params, fragment) built from doc_id
    // arithmetic; UrlNorm must land on the RFC-3986-normalized form
    // the oracle constructs by concatenation, and the registrable
    // domain must cut subdomains under the multi-label suffix.
    "q186_url_canonical" -> { (s, d) =>
      import s.implicits._
      val params = Tables.documents(s, d)
        .select($"doc_id".cast("long").as("doc_id"))
        .withColumn("tls", ($"doc_id" % 2).cast("int"))
        .withColumn("h", ($"doc_id" % 7).cast("int"))
        .withColumn("dom", ($"doc_id" % 5).cast("int"))
        .withColumn("q", ($"doc_id" % 9).cast("int"))
      val raw = concat(
        when($"tls" === 1, lit("HTTPS://")).otherwise(lit("HTTP://")),
        lit("WWW"), $"h", lit(".Example"), $"dom", lit(".COM"),
        when($"tls" === 1, lit(":443")).otherwise(lit(":80")),
        lit("/a/b/../c/%7Euser"), $"doc_id",
        lit("/?utm_source=feed&z=2&a="), $"q", lit("#sec"))
      params
        .withColumn("canon", graft.operators.UrlNorm.urlCanonical(raw))
        .withColumn("domain", graft.operators.UrlNorm.urlDomain($"canon"))
        .select($"doc_id", $"canon", $"domain")
    },

    // ---- q162: NFC normalization audit — the Unicode-hygiene pass a
    // corpus runs BEFORE dedup/hashing (the same text in composed and
    // decomposed forms hashes differently; normalize first or every
    // downstream fingerprint silently misses those pairs). Per source:
    // docs count, docs not already in NFC, and the UTF-8 bytes saved by
    // normalizing. Byte counts (octet_length/strlen), never character
    // counts — grapheme-vs-codepoint semantics differ across engines,
    // bytes do not. Narrow map + one aggregate: scan-bound at any SF.
    "q162_nfc_audit" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"source",
          when($"doc_id" % 5 === 0, concat($"text", lit(nfcProbe)))
            .otherwise($"text").as("t"))
        .withColumn("n", graft.functions.F.nfc($"t"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"t" =!= $"n", 1L).otherwise(0L)).as("n_denorm"),
          sum((octet_length($"t") - octet_length($"n")).cast("long"))
            .as("bytes_saved"))
    },

    // ---- q163: Unicode-script mix — the mixed-script detector
    // (Cyrillic lookalikes inside Latin text are a classic spam/
    // homoglyph signal; script histograms also drive lang-id sanity
    // checks). Per lang: code points per script and docs carrying any
    // non-Latin letters. Both engines count single-code-point regex
    // class matches — Java \p{IsCyrillic} and RE2 \p{Cyrillic} follow
    // the same Unicode script assignments. Injection: Cyrillic /
    // Greek tokens for two doc_id classes (ASCII corpus otherwise).
    "q163_script_mix" -> { (s, d) =>
      import s.implicits._
      val t = when($"doc_id" % 7 === 0, concat($"text", lit(cyrProbe)))
        .when($"doc_id" % 7 === 1, concat($"text", lit(grkProbe)))
        .otherwise($"text")
      val cyr = regexp_count(col("t"), lit("\\p{IsCyrillic}"))
      val grk = regexp_count(col("t"), lit("\\p{IsGreek}"))
      Tables.documents(s, d)
        .select($"lang", t.as("t"))
        .select($"lang",
          regexp_count($"t", lit("\\p{IsLatin}")).cast("long").as("la"),
          cyr.cast("long").as("cy"), grk.cast("long").as("gr"))
        .groupBy($"lang")
        .agg(sum($"la").as("latin"), sum($"cy").as("cyrillic"),
          sum($"gr").as("greek"),
          sum(when($"cy" > 0 || $"gr" > 0, 1L).otherwise(0L)).as("mixed_docs"))
    },

    // ---- q47: near-dup CLUSTERS: MinHash-LSH pairs (q25) closed into
    // connected components by iterative min-label propagation; each
    // clustered doc maps to its cluster's smallest doc_id (the survivor
    // a dedup keeps). The pair table is tiny relative to the corpus, so
    // the per-round shuffles are off the critical path at 100 TB.
    "q47_dedup_clusters" -> { (s, d) =>
      import s.implicits._
      val docs = Dedup.docShingles(Tables.documents(s, d), $"doc_id", $"text", 3)
      Curation.dedupClusters(docs, 0.85)
    },

    // ---- q128: keep-best survivor per near-dup cluster — the dedup
    // epilogue that keeps the highest-quality member instead of the
    // smallest id. The argmax is max(struct(quality, -doc_id)) — a
    // mergeable aggregate, not a per-cluster sort.
    "q128_canonical_docs" -> { (s, d) =>
      import s.implicits._
      Curation.canonicalDocs(Tables.documents(s, d), $"doc_id", $"text", 0.85)
    },

    // ---- q131: cross-source duplication matrix — near-dup pair counts
    // per (source, source), the feed-overlap audit run before mixing
    // weights are chosen. LSH pair table + two doc-keyed source joins.
    "q131_cross_source_dups" -> { (s, d) =>
      import s.implicits._
      Curation.crossSourceDupMatrix(
        Tables.documents(s, d), $"doc_id", $"text", $"source", 0.85)
    },

    // ---- q132: per-source token-distribution drift vs the corpus
    // blend (squared Hellinger — log-free, so bit-reproducible by the
    // oracle). Vocabulary-bounded grid, never corpus-sized.
    "q132_source_drift" -> { (s, d) =>
      import s.implicits._
      Curation.hellingerBySource(Tables.documents(s, d), $"source", $"text")
    },

    // ---- q134: the end-to-end curation pipeline as ONE plan — dedup
    // survivors (keep-best per near-dup cluster) → quality floor →
    // deterministic hash split → per-(split, source) corpus stats.
    // The integration gate: every stage is an already-verified
    // operator, composed the way a user would compose them.
    "q134_curation_pipeline" -> { (s, d) =>
      import s.implicits._
      val kept = Curation.dedupSurvivors(
          Tables.documents(s, d), $"doc_id", $"text", 0.85)
        .withColumn("quality", TextAnalysis.qualityScore($"text"))
        .filter($"quality" >= 0.5)
      kept
        .withColumn("split", Curation.hashSplit($"doc_id", "split42", 80, 10))
        .groupBy($"split", $"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_chars"),
          graft.operators.Curation.floorRound(sum($"quality".cast("decimal(38,6)")).cast("double"), 4)
            .as("sum_quality"))
    },

    // ---- q48: top-3 TF-IDF keywords per document (log-free rational
    // idf — bit-identical across IEEE engines; see Curation scaladoc).
    "q48_tfidf_keywords" -> { (s, d) =>
      import s.implicits._
      Curation.tfidfKeywords(Tables.documents(s, d), $"doc_id", $"text", k = 3)
    },

    // ---- q49: deterministic hash split (80/10/10 by md5 of doc_id):
    // membership is a pure function of the id — stable under corpus
    // growth, reshuffling, and re-runs. Per-split corpus stats.
    "q49_hash_split" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("split", Curation.hashSplit($"doc_id", "split42", 80, 10))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_chars"))
    },

    // ---- q50: deterministic stratified sample — exactly ceil(10%) of
    // each language stratum, chosen by md5 rank (reproducible, exact
    // proportions; Bernoulli sampleBy gives neither).
    "q50_stratified_sample" -> { (s, d) =>
      import s.implicits._
      Curation.stratifiedSample(Tables.documents(s, d),
          $"lang", $"doc_id", "samp42", pct = 10)
        .select($"doc_id", $"lang")
    },

    // ---- q51: top-3 events by value per event_type through the
    // bounded top-k AGGREGATE (k-entry buffer, map-side partial agg)
    // instead of a window sort — see TopKAgg scaladoc for the scale
    // argument. Oracle = the window-rank formulation (same result).
    "q51_topk_per_group" -> { (s, d) =>
      import s.implicits._
      val tk = TopKAgg.topK(3)
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(tk($"value", $"event_id").as("top"))
        .select($"event_type", posexplode($"top"))
        .select($"event_type", (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("event_id"), graft.operators.Curation.floorRound(col("col.v"), 4).as("value"))
    },

    // ---- q112: weighted sampling without replacement — 5 docs per
    // language with inclusion probability ∝ n_chars (Efraimidis-
    // Spirakis exponential race on md5-derived uniforms; see
    // Curation.weightedSample). One map-side-combined TopKAgg per
    // group, no per-group sort; the oracle replays the identical race
    // formula with a window rank.
    "q112_weighted_sample" -> { (s, d) =>
      import s.implicits._
      Curation.weightedSample(Tables.documents(s, d), $"lang", $"doc_id",
          $"n_chars", k = 5, salt = "ws42")
        .select($"g".as("lang"), $"rank", $"id".as("doc_id"))
    },

    // ---- q52: text cleaning (HTML strip, URL/e-mail redaction,
    // whitespace collapse) — the dirty suffix is constructed from the
    // row so the cleaning path is actually exercised on every doc.
    "q52_text_clean" -> { (s, d) =>
      import s.implicits._
      val dirty = concat($"text",
        lit(" <p>See https://example.com/d?id="), $"doc_id",
        lit(" or mail user"), $"doc_id", lit("@example.com today</p>"))
      Tables.documents(s, d)
        .select($"doc_id", Curation.cleanText(dirty).as("clean"))
        .select($"doc_id", length($"clean").as("n_chars"), $"clean")
    },

    // ---- q53: rare-token ratio — fraction of a doc's tokens whose
    // global count <= 2 (high = OCR junk / random ids; a standard
    // curation signal).
    "q53_rare_token_ratio" -> { (s, d) =>
      import s.implicits._
      Curation.rareTokenRatio(Tables.documents(s, d), $"doc_id", $"text",
        maxCount = 2)
    },

    // ---- q136: deterministic epoch shuffle — (shard, pos, doc_id)
    // training order as a pure function of (seed, doc_id); per-shard
    // positions via the two-phase global rank, never a
    // one-reducer-per-shard row_number window (see EpochShuffle
    // scaladoc). The oracle IS that window — same result, the scale
    // difference is the plan.
    "q136_epoch_shuffle" -> { (s, d) =>
      import s.implicits._
      graft.operators.EpochShuffle.order(Tables.documents(s, d),
        $"doc_id", seed = "ep7", shards = 8)
    },

    // ---- q140: curriculum order — the q135 surprisal buckets drive
    // the q136 epoch shuffle: each shard streams head (0) before
    // middle (1) before tail (2), seeded-pseudo-random within a
    // class. The composition gate for the training-order surface.
    "q140_curriculum_order" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val brank = TextAnalysis
        .surprisalBuckets(docs, $"doc_id", $"text", $"source")
        .select($"doc_id",
          when($"bucket" === "head", 0).when($"bucket" === "middle", 1)
            .otherwise(2).as("brank"))
      val keyed = docs.select($"doc_id")
        .join(brank, Seq("doc_id"), "left")
        // Token-less docs carry no LM evidence: lowest priority.
        .select($"doc_id", coalesce($"brank", lit(2)).as("brank"))
      graft.operators.EpochShuffle.orderWithPriority(keyed,
        $"doc_id", $"brank", seed = "cur42", shards = 8)
    },

    // ---- q156: batch-mix audit — for each consecutive 32-doc batch
    // of the q136-style epoch order (per shard: what one data-parallel
    // worker reads per step), the integer-form total variation
    // distance between the batch's source histogram and the corpus
    // one, plus the most over-represented source. The "did my shuffle
    // actually mix" check behind loss-spike forensics.
    "q156_batch_mix_audit" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val ord = graft.operators.EpochShuffle.order(docs, $"doc_id",
        seed = "ba7", shards = 4)
      val out = graft.operators.EpochShuffle.batchMixAudit(ord, docs,
          $"doc_id", $"source", batchSize = 32)
        .persist()
      out.count() // pin the audit before releasing the epoch cache
      ord.unpersist()
      out
    },

    // ---- q144: per-source quality threshold for 80% retention — the
    // CCNet-style per-source knob: each source keeps its own top 80%
    // by quality; the cutoff comes from the per-source score HISTOGRAM
    // (q135's scale trick — no corpus sort per source).
    "q144_retention_threshold" -> { (s, d) =>
      import s.implicits._
      Curation.retentionThreshold(Tables.documents(s, d), $"doc_id",
        $"text", $"source", targetPct = 80)
    },

    // ---- q142: per-source curation funnel — survival counts through
    // dedup → quality floor → length floor, stages as flags in ONE
    // source-keyed aggregate (never a job per stage). The yield
    // dashboard behind corpus release notes.
    "q142_funnel_audit" -> { (s, d) =>
      import s.implicits._
      Curation.funnelAudit(Tables.documents(s, d), $"doc_id", $"text",
        $"source", threshold = 0.85, minQuality = 0.5, minTokens = 40)
    },

    // ---- q138: leakage-safe split — near-dup clusters assigned to
    // train/val/test ATOMICALLY (split key = cluster canonical id, own
    // id when unclustered), so no test doc has a near-dup in train.
    // The q47 cluster machinery + one doc-keyed join + the narrow
    // md5-band map.
    "q138_leak_safe_split" -> { (s, d) =>
      import s.implicits._
      Curation.leakSafeSplit(Tables.documents(s, d), $"doc_id", $"text",
        salt = "split42", trainPct = 80, valPct = 10)
    }
  )

  /** Shared recursive-closure CTEs over `neardup(da, db, ...)`:
    * `edges` (symmetric) and `reach(a, b)` (transitive neighbors,
    * self-loop-pruned). ONE definition — q47/q128/q134/q138/q142 all
    * assume the SAME cluster semantics, so the closure must not drift
    * between their oracles (nearDupCtes' rationale, extended).
    */
  private val closureCtes: String =
    """edges AS (SELECT da AS a, db AS b FROM neardup
      |          UNION SELECT db, da FROM neardup),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |    WHERE e.b <> r.a)""".stripMargin.replace("\n", "\n         |")

  def oracleSql: Map[String, String] = Map(
    // Each artifact replaces its 2/3-char run with ONE character and
    // adds the leading space, so len_fixed = len(text) + 2·m for the
    // damaged shapes; the clean shape is a fixed point. length() is
    // CHARACTER count on both engines (the artifact text is the only
    // non-ASCII and it never survives repair).
    "q182_mojibake_repair" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0
        |       ELSE doc_id % 5 END AS BIGINT) AS n_fixed,
        |  CAST(length(text) + CASE WHEN doc_id % 3 = 0 THEN 0
        |       ELSE (doc_id % 5) * 2 END AS BIGINT) AS len_fixed
        |FROM documents""".stripMargin,

    // The canonical form replayed by concatenation: scheme/host
    // lowercased, default port gone, /a/b/../c collapsed, %7E → ~,
    // tracking param dropped, query sorted, fragment gone.
    "q186_url_canonical" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 1 THEN 'https' ELSE 'http' END ||
        |    '://www' || (doc_id % 7) || '.example' || (doc_id % 5) ||
        |    '.com/a/c/~user' || doc_id || '/?a=' || (doc_id % 9) ||
        |    '&z=2' AS canon,
        |  'example' || (doc_id % 5) || '.com' AS domain
        |FROM documents""".stripMargin,

    "q162_nfc_audit" ->
      s"""WITH d AS (
         |  SELECT source,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ${sqlLit(nfcProbe)}
         |         ELSE text END AS t
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN t <> nfc_normalize(t) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_denorm,
         |  CAST(sum(strlen(t) - strlen(nfc_normalize(t))) AS BIGINT)
         |    AS bytes_saved
         |FROM d GROUP BY source""".stripMargin,

    // RE2 counts the same single-code-point script classes as the
    // Java regex on the Spark side.
    "q163_script_mix" ->
      s"""WITH d AS (
         |  SELECT lang, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ${sqlLit(cyrProbe)}
         |         WHEN doc_id % 7 = 1 THEN ${sqlLit(grkProbe)}
         |         ELSE '' END AS t
         |  FROM documents)
         |SELECT lang,
         |  CAST(sum(len(regexp_extract_all(t, '\\p{Latin}'))) AS BIGINT) AS latin,
         |  CAST(sum(len(regexp_extract_all(t, '\\p{Cyrillic}'))) AS BIGINT) AS cyrillic,
         |  CAST(sum(len(regexp_extract_all(t, '\\p{Greek}'))) AS BIGINT) AS greek,
         |  CAST(sum(CASE WHEN len(regexp_extract_all(t, '\\p{Cyrillic}')) > 0
         |    OR len(regexp_extract_all(t, '\\p{Greek}')) > 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS mixed_docs
         |FROM d GROUP BY lang""".stripMargin,

    // Recursive closure over the shared near-dup pair CTEs: reach(a,b)
    // = transitive neighbors; canonical = least(self, min reachable).
    "q47_dedup_clusters" ->
      s"""WITH RECURSIVE ${PipelineOps.nearDupCtes("")},
         |${closureCtes}
         |SELECT a AS doc_id, least(a, min(b)) AS canonical_id
         |FROM reach GROUP BY a""".stripMargin,

    // Same recursive closure, then the keep-best epilogue: per cluster,
    // the member with max quality (ties to the smaller doc_id).
    "q128_canonical_docs" ->
      s"""WITH RECURSIVE ${PipelineOps.nearDupCtes("")},
         |${closureCtes}
         |, cl AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster
         |  FROM reach GROUP BY a),
         |q AS (SELECT doc_id, ${PipelineOps.qualitySqlExpr} AS quality
         |      FROM documents),
         |r AS (
         |  SELECT cl.cluster, cl.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY cl.cluster
         |      ORDER BY q.quality DESC, cl.doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY cl.cluster) AS n_members
         |  FROM cl JOIN q USING (doc_id))
         |SELECT cluster, doc_id AS survivor, n_members,
         |  quality AS best_quality
         |FROM r WHERE rn = 1""".stripMargin,

    "q131_cross_source_dups" ->
      s"""WITH ${PipelineOps.nearDupCtes("")},
         |m AS (
         |  SELECT least(a.source, b.source) AS src_a,
         |         greatest(a.source, b.source) AS src_b
         |  FROM neardup n
         |  JOIN documents a ON n.da = a.doc_id
         |  JOIN documents b ON n.db = b.doc_id)
         |SELECT src_a, src_b, count(*) AS n_pairs
         |FROM m GROUP BY 1, 2""".stripMargin,

    // Full pipeline replay: the q128 cluster/winner CTEs, a quality
    // floor on the rounded score, the q49 split hash, and BIGINT-cast
    // integer sums (oracle rulebook #1).
    "q134_curation_pipeline" ->
      s"""WITH RECURSIVE ${PipelineOps.nearDupCtes("")},
         |${closureCtes}
         |, cl AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster
         |  FROM reach GROUP BY a),
         |q AS (SELECT doc_id, ${PipelineOps.qualitySqlExpr} AS quality
         |      FROM documents),
         |r AS (
         |  SELECT cl.doc_id,
         |    row_number() OVER (PARTITION BY cl.cluster
         |      ORDER BY q.quality DESC, cl.doc_id ASC) AS rn
         |  FROM cl JOIN q USING (doc_id)),
         |losers AS (SELECT doc_id FROM r WHERE rn > 1),
         |kept AS (
         |  SELECT d.doc_id, d.source, d.text, q.quality
         |  FROM documents d JOIN q USING (doc_id)
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
         |    AND q.quality >= 0.5)
         |SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  source, count(*) AS n_docs,
         |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
         |  floor((CAST(sum(CAST(quality AS DECIMAL(38,6))) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
         |    AS sum_quality
         |FROM (SELECT *,
         |        ('0x' || substr(md5('split42' || doc_id::VARCHAR), 1, 8))::UBIGINT
         |          % 100 AS h
         |      FROM kept) t
         |GROUP BY 1, 2""".stripMargin,

    "q132_source_drift" ->
      """WITH toks AS (
        |  SELECT source AS src,
        |         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents),
        |cst AS (SELECT src, w, count(*) AS c FROM toks GROUP BY 1, 2),
        |ct AS (SELECT w, sum(c) AS ctot FROM cst GROUP BY 1),
        |ts AS (SELECT src, sum(c) AS stot FROM cst GROUP BY 1),
        |tt AS (SELECT sum(c) AS ttot FROM cst),
        |grid AS (
        |  SELECT ts.src, ct.w, ct.ctot, ts.stot, coalesce(cst.c, 0) AS c
        |  FROM ct CROSS JOIN ts
        |  LEFT JOIN cst ON cst.src = ts.src AND cst.w = ct.w),
        |term AS (
        |  SELECT src,
        |    floor(((sqrt(CAST(c AS DOUBLE) / CAST(stot AS DOUBLE))
        |         - sqrt(CAST(ctot AS DOUBLE) / CAST(ttot AS DOUBLE)))
        |        * (sqrt(CAST(c AS DOUBLE) / CAST(stot AS DOUBLE))
        |         - sqrt(CAST(ctot AS DOUBLE) / CAST(ttot AS DOUBLE)))
        |        * 0.5) * 1000000000.0 + 0.5) / 1000000000.0 AS t
        |  FROM grid, tt)
        |SELECT src, floor((CAST(sum(CAST(t AS DECIMAL(38,9))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  AS hellinger2
        |FROM term GROUP BY src""".stripMargin,

    "q48_tfidf_keywords" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |tokens AS (
        |  SELECT doc_id, len(toks) AS len, unnest(toks) AS token FROM base),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS cnt, max(len) AS len
        |  FROM tokens GROUP BY 1, 2),
        |dft AS (SELECT token, count(*) AS dfc FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |    floor(CAST(tf.cnt * n.n AS DOUBLE) / (tf.len * dft.dfc)
        |      * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM tf CROSS JOIN n JOIN dft ON tf.token = dft.token)
        |SELECT doc_id, token, score, rank FROM (
        |  SELECT doc_id, token, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, token ASC) AS rank
        |  FROM scored) t
        |WHERE rank <= 3""".stripMargin,

    "q49_hash_split" ->
      """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM (SELECT ('0x' || substr(md5('split42' || doc_id::VARCHAR), 1, 8))::UBIGINT
        |        % 100 AS h, text
        |      FROM documents) t
        |GROUP BY 1""".stripMargin,

    "q50_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('samp42' || doc_id::VARCHAR) ASC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents) t
        |WHERE rn <= (n * 10 + 99) // 100""".stripMargin,

    "q51_topk_per_group" ->
      """SELECT event_type, rank, event_id, floor(("value") * 10000.0 + 0.5) / 10000.0 AS value FROM (
        |  SELECT event_type, event_id, "value",
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY "value" DESC, event_id ASC) AS rank
        |  FROM events) t
        |WHERE rank <= 3""".stripMargin,

    // Identical race formula: u from the same salted md5 prefix,
    // key = ln(u)/w, rank DESC with doc_id tiebreak.
    "q112_weighted_sample" ->
      """SELECT lang, rank, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ln(u) / w DESC, doc_id ASC) AS rank
        |  FROM (
        |    SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS w,
        |      (('0x' || substr(md5('ws42' || doc_id::VARCHAR), 1, 8))::UBIGINT
        |        + 1) / 4294967296.0 AS u
        |    -- weightedSample's w > 0 contract: a zero/NULL weight must
        |    -- not enter the race (ln(u)/0 is NULL here, which sorts
        |    -- LAST and could pad short groups with rows Spark drops)
        |    FROM documents WHERE n_chars > 0) t) r
        |WHERE rank <= 5""".stripMargin,

    "q52_text_clean" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' <p>See https://example.com/d?id=' || doc_id::VARCHAR
        |         || ' or mail user' || doc_id::VARCHAR || '@example.com today</p>'
        |      AS t
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id, trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(t, '<[^>]*>', ' ', 'g'),
        |        'https?://[^ \t\n\x0B\f\r]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean
        |  FROM dirty)
        |SELECT doc_id, length(clean) AS n_chars, clean FROM clean""".stripMargin,

    "q53_rare_token_ratio" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
        |  FROM documents),
        |g AS (SELECT token, count(*) AS gc FROM tokens GROUP BY 1)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor(CAST(sum(CASE WHEN g.gc <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS rare_ratio
        |FROM tokens JOIN g USING (token)
        |GROUP BY doc_id""".stripMargin,

    // Replays the q136 rank window, then all-integer mix math: the
    // TVD numerator sums |N·c − n_b·C_s| over present sources plus
    // n_b·(N − Σ_present C_s) for the absent ones.
    "q156_batch_mix_audit" ->
      """WITH keyed AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5('s:ba7:' || doc_id::VARCHAR), 1, 8))
        |      ::UBIGINT % 4 AS INT) AS shard,
        |    md5('o:ba7:' || doc_id::VARCHAR) AS okey
        |  FROM documents),
        |pos AS (
        |  SELECT shard, source,
        |    (row_number() OVER (PARTITION BY shard ORDER BY okey) - 1) // 32
        |      AS batch
        |  FROM keyed),
        |corpus AS (SELECT source, count(*) AS c_s FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM documents),
        |cbs AS (
        |  SELECT shard, batch, source, count(*) AS c FROM pos GROUP BY 1, 2, 3),
        |enr AS (
        |  SELECT cbs.shard, cbs.batch, cbs.source, cbs.c, corpus.c_s,
        |    tot.n_total,
        |    sum(cbs.c) OVER (PARTITION BY cbs.shard, cbs.batch) AS n_b,
        |    sum(corpus.c_s) OVER (PARTITION BY cbs.shard, cbs.batch)
        |      AS present_cs
        |  FROM cbs JOIN corpus USING (source) CROSS JOIN tot),
        |agg AS (
        |  SELECT shard, batch, n_b, source,
        |    n_total * c - n_b * c_s AS d,
        |    sum(abs(n_total * c - n_b * c_s))
        |      OVER (PARTITION BY shard, batch)
        |      + n_b * (n_total - present_cs) AS tvd,
        |    row_number() OVER (PARTITION BY shard, batch
        |      ORDER BY n_total * c - n_b * c_s DESC, source) AS rn
        |  FROM enr)
        |SELECT shard, batch, CAST(n_b AS BIGINT) AS n_docs,
        |  CAST(tvd AS BIGINT) AS tvd_num, source AS worst_source,
        |  CAST(d AS BIGINT) AS worst_dev
        |FROM agg WHERE rn = 1""".stripMargin,

    "q136_epoch_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('s:ep7:' || doc_id::VARCHAR), 1, 8))
        |      ::UBIGINT % 8 AS INT) AS shard,
        |    md5('o:ep7:' || doc_id::VARCHAR) AS okey
        |  FROM documents)
        |SELECT shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY okey) - 1 AS pos,
        |  doc_id
        |FROM keyed""".stripMargin,

    // The q135 bucket CTEs feed a priority column; the rank replays
    // q136's window form ordered by (priority, okey).
    "q140_curriculum_order" ->
      s"""WITH ${CorpusOps.surprisalCtes},
         |keyed AS (
         |  SELECT d.doc_id,
         |    CASE b.bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1
         |      ELSE 2 END AS priority,
         |    CAST(('0x' || substr(md5('s:cur42:' || d.doc_id::VARCHAR), 1, 8))
         |      ::UBIGINT % 8 AS INT) AS shard,
         |    md5('o:cur42:' || d.doc_id::VARCHAR) AS okey
         |  FROM documents d LEFT JOIN bucketed b USING (doc_id))
         |SELECT shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY priority, okey) - 1
         |    AS pos,
         |  doc_id, priority
         |FROM keyed""".stripMargin,

    // DESC-cumulative histogram walk; the qualifying row with max
    // quality is the cutoff (row_number replays the struct argmax).
    "q144_retention_threshold" ->
      s"""WITH q AS (
         |  SELECT source, ${PipelineOps.qualitySqlExpr} AS quality
         |  FROM documents),
         |hist AS (
         |  SELECT source, quality, count(*) AS k FROM q GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, quality,
         |    sum(k) OVER (PARTITION BY source ORDER BY quality DESC
         |                 ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(k) OVER (PARTITION BY source) AS n
         |  FROM hist),
         |sel AS (SELECT * FROM cum WHERE cum * 100 >= n * 80),
         |r AS (SELECT source, quality, cum, n,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY quality DESC) AS rn
         |      FROM sel)
         |SELECT source, quality AS threshold, CAST(n AS BIGINT) AS n_total,
         |  CAST(cum AS BIGINT) AS n_kept,
         |  floor(CAST(cum AS DOUBLE) / n * 10000.0 + 0.5) / 10000.0 AS keep_ratio
         |FROM r WHERE rn = 1""".stripMargin,

    // q134's loser CTEs (recursive closure + keep-best rank) feed the
    // cumulative-stage conditional counts.
    "q142_funnel_audit" ->
      s"""WITH RECURSIVE ${PipelineOps.nearDupCtes("")},
         |${closureCtes}
         |, cl AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster
         |  FROM reach GROUP BY a),
         |q AS (SELECT doc_id, ${PipelineOps.qualitySqlExpr} AS quality
         |      FROM documents),
         |r AS (
         |  SELECT cl.doc_id,
         |    row_number() OVER (PARTITION BY cl.cluster
         |      ORDER BY q.quality DESC, cl.doc_id ASC) AS rn
         |  FROM cl JOIN q USING (doc_id)),
         |losers AS (SELECT doc_id FROM r WHERE rn > 1),
         |base AS (
         |  SELECT d.source, q.quality,
         |    len(regexp_extract_all(lower(d.text), '[a-z]+')) AS n_tok,
         |    d.doc_id NOT IN (SELECT doc_id FROM losers) AS kept
         |  FROM documents d JOIN q USING (doc_id))
         |SELECT source, count(*) AS n_total,
         |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
         |  CAST(sum(CASE WHEN kept AND quality >= 0.5 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN kept AND quality >= 0.5 AND n_tok >= 40
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_final
         |FROM base GROUP BY source""".stripMargin,

    // q47's recursive closure supplies cluster canonicals; the split
    // band replays q49's md5 formula over the CLUSTER key.
    "q138_leak_safe_split" ->
      s"""WITH RECURSIVE ${PipelineOps.nearDupCtes("")},
         |${closureCtes},
         |cl AS (
         |  SELECT a AS doc_id, least(a, min(b)) AS cluster
         |  FROM reach GROUP BY a),
         |keyed AS (
         |  SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN cl USING (doc_id))
         |SELECT doc_id, split_key,
         |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, split_key,
         |        ('0x' || substr(md5('split42' || split_key::VARCHAR), 1, 8))
         |          ::UBIGINT % 100 AS h
         |      FROM keyed) t""".stripMargin
  )
}
