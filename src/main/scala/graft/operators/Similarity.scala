package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design (100 TB):
  *  - `bruteTopK` broadcast-joins the (small) probe set against the full
  *    corpus — one scan, no corpus shuffle, per-partition top-k via
  *    window rank. Correctness baseline.
  *  - `lshTopK` is the scale path: deterministic random hyperplanes
  *    hash each vector to a bucket; probes only compare within their
  *    bucket (expected corpus/2^planes of the data). Recall tunable
  *    via multi-probe (hamming-distance-1 buckets, `multiProbe`).
  *
  * All dot products accumulate in double in index order, matching the
  * DuckDB oracle bit-for-bit.
  */
object Similarity {

  /** Σ a_i·b_i in double, index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each probe (probes broadcast).
    * The pair cosine runs as the native codegen kernel (see
    * [[cosineFused]]); the math (index-order double accumulation) is
    * identical to the column form.
    */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").join(
        broadcast(probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"))),
        col("c.vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("c.vec_id").as("vec_id"),
        graft.operators.Curation.floorRound(graft.functions.F.vec_cosine(col("pe"), col("c.embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining for embedding-model training: for each probe,
    * the k most cosine-similar vectors whose LABEL DIFFERS from the
    * probe's — near-misses across the class boundary, the contrastive
    * negatives a retrieval/embedding trainer pairs with each anchor.
    *
    * Scale shape: probes broadcast against one corpus scan (like
    * [[bruteTopK]]) but the per-probe top-k is the MERGEABLE
    * [[graft.functions.TopKAgg]] — a k-bounded heap with map-side
    * partial combine, so only k rows per (partition, probe) reach the
    * exchange and no per-probe sort ever materializes. Ordering
    * (sim desc, vec_id asc) matches the window-rank baseline exactly.
    */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").join(
        broadcast(probes.select(col("vec_id").as("probe_id"),
          col("label").as("probe_label"), col("embedding").as("pe"))),
        col("c.vec_id") =!= col("probe_id") &&
          col("c.label") =!= col("probe_label"))
      .select(col("probe_id"), col("c.vec_id").as("vid"),
        graft.operators.Curation.floorRound(graft.functions.F.vec_cosine(col("pe"), col("c.embedding")), 6)
          .as("sim"))
    val tk = graft.functions.TopKAgg.topK(k)
    joined.groupBy(col("probe_id"))
      .agg(tk(col("sim"), col("vid")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), col("col.id").as("vec_id"),
        graft.operators.Curation.floorRound(col("col.v"), 6).as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Deterministic random hyperplanes (seeded), as literal arrays. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id from `numPlanes` hyperplanes. Each plane dot
    * is the codegen'd float×double kernel (`vec_dot`) against the
    * plane literal — same widen-then-accumulate math as the column
    * form, so bucket ids are unchanged; the interpreted
    * `aggregate(zip_with(...))` per plane per row it replaces was the
    * corpus-side cost of [[lshTopK]].
    */
  def lshBucket(embedding: Column, planes: Array[Array[Double]]): Column = {
    // Dim guard: vec_dot iterates to the EMBEDDING's length and indexes
    // the plane literal unchecked, so a longer embedding would read out
    // of bounds (or a shorter one silently use a plane prefix) and
    // produce garbage buckets with near-zero recall and no diagnostic.
    // lshNearDupPairs guards the same contract inside its fused UDF.
    val dim = planes.head.length
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(graft.functions.F.vec_dot(embedding, typedlit(p.toSeq)) > 0,
        shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    when(size(embedding) === dim, bucket)
      .otherwise(raise_error(concat(
        lit("lshBucket: embedding length "), size(embedding).cast("string"),
        lit(s" != plane dim $dim"))))
  }

  /** Embedding-cosine near-duplicate pairs: every (va < vb) pair with
    * cosine >= threshold. The corpus side is broadcast when it fits
    * (probes stream past it with zero shuffle); at 100 TB the same
    * verification runs only on LSH-bucket-equal candidates
    * ([[lshBucket]] self-join — identical shape to [[Dedup.minhashLshPairs]]'
    * band join), trading bounded recall for a linear-ish candidate set.
    */
  /** Hot-path cosine/dot/norm: the native codegen kernels
    * ([[graft.functions.VecOps]] via `F.vec_cosine`/`vec_dot`/
    * `vec_norm`) — they read Catalyst `ArrayData` in place, where a
    * Scala UDF deserializes both arrays per CALL (the conversion, not
    * the arithmetic, dominates pair-join workloads: swapping the UDF
    * for the kernel measured 2× on the q37 pipeline end-to-end). The
    * interpreted `aggregate(zip_with(...))` column form is another
    * ~10× behind the UDF. All three accumulate double in index order —
    * bit-identical across forms and to the DuckDB oracle.
    *
    * `dot/(nrmA·nrmB)` with a stored norm (the at-rest indexes) is
    * bit-identical to the fused cosine because the norm accumulations
    * run in the same index order; the inner loop shrinks from 3
    * multiply-adds per element to 1.
    */
  def cosineFused(a: Column, b: Column): Column =
    graft.functions.F.vec_cosine(a, b)

  def cosinePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    // Explicit broadcast-nested-loop: one corpus copy rides to every
    // task as primitive float arrays, and the streamed side flatMaps
    // over it with the fused dot/norm loop. Identical join semantics
    // (va < vb) and identical index-order double arithmetic to the
    // BroadcastNestedLoopJoin + UDF form, but ~6× faster: the UDF path
    // boxes both 64-float vectors per PAIR (n²·dim boxed floats);
    // here each vector is decoded once per row and the O(n²·dim) inner
    // loop runs entirely on primitives.
    // Same memory contract as broadcast(): one side must fit in RAM.
    // At corpus scale, near-dup verification runs on LSH-bucketed
    // candidates instead (lshBucket self-join, see scaladoc above).
    val spark = corpus.sparkSession
    import spark.implicits._
    // Pre-normalize once per vector (O(n·dim)) so the O(n²·dim) inner
    // loop is a pure dot product — 3 mul-adds per element become 1.
    // cos = Σ(x/|a|)(y/|b|) differs from Σxy/(|a||b|) only in final
    // rounding (~1 ulp); round(·,6) absorbs it.
    def normalize(e: Array[Float]): Array[Double] = {
      var na = 0.0; var k = 0
      while (k < e.length) { val x = e(k).toDouble; na += x * x; k += 1 }
      val inv = 1.0 / math.sqrt(na)
      val out = new Array[Double](e.length)
      k = 0
      while (k < e.length) { out(k) = e(k).toDouble * inv; k += 1 }
      out
    }
    val side = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, e) => (id, normalize(e)) }
    val bc = spark.sparkContext.broadcast(side)
    val thr = threshold - 1e-6 // margin > half-ulp of round(·,6)
    corpus.select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Float])]
      .flatMap { case (va, eaF) =>
        val ea = normalize(eaF)
        val others = bc.value
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = others.length - 1
        while (j >= 0 && others(j)._1 > va) {
          val eb = others(j)._2
          var dot = 0.0; var k = 0
          val n = ea.length
          while (k < n) { dot += ea(k) * eb(k); k += 1 }
          if (dot >= thr) out += ((va, others(j)._1, dot))
          j -= 1
        }
        out.result()
      }.toDF("va", "vb", "c")
      .select(col("va"), col("vb"), graft.operators.Curation.floorRound(col("c"), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** A chosen banded-LSH configuration: `recall` is the collision
    * probability 1-(1-p^rows)^bands for a pair AT the threshold;
    * `bgCandidateRate` the same for an unrelated pair (the candidate
    * volume a random corpus pays per pair).
    */
  final case class LshPlan(bands: Int, rowsPerBand: Int,
    recall: Double, bgCandidateRate: Double)

  /** Parameter planner for banded LSH: the cheapest (bands, rows per
    * band) whose recall at the threshold meets `targetRecall`, where
    * cost is the background candidate rate (what the pair join pays on
    * unrelated pairs), tie-broken by total hash count bands·rows.
    *
    * `pAt` maps a similarity to its per-hash collision probability —
    * sign-LSH: 1 - acos(c)/π; MinHash: the Jaccard value itself. The
    * search space is tiny (maxBands·maxRows grid), run it at plan
    * time, not per row. This is how q37's (8, 4) at τ=0.4 and the
    * production note (~0.95 ⇒ recall>0.999) in its comment were
    * derived.
    */
  def lshPlan(pAtThreshold: Double, pBackground: Double,
      targetRecall: Double, maxBands: Int = 64,
      maxRows: Int = 16): LshPlan = {
    require(pAtThreshold > 0 && pAtThreshold < 1,
      s"collision probability in (0,1), got $pAtThreshold")
    def hit(p: Double, b: Int, r: Int) =
      1.0 - math.pow(1.0 - math.pow(p, r), b)
    val ok = for {
      r <- 1 to maxRows
      b <- 1 to maxBands
      if hit(pAtThreshold, b, r) >= targetRecall
    } yield LshPlan(b, r, hit(pAtThreshold, b, r), hit(pBackground, b, r))
    require(ok.nonEmpty,
      s"no (bands<=$maxBands, rows<=$maxRows) reaches recall $targetRecall")
    ok.minBy(c => (c.bgCandidateRate, c.bands * c.rowsPerBand))
  }

  /** [[lshPlan]] for sign-LSH over cosine similarity: per-hyperplane
    * collision probability 1 - acos(c)/π; background pairs in a
    * random (zero-mean) corpus sit at cos≈0 ⇒ p=1/2.
    */
  def lshPlanCosine(threshold: Double, targetRecall: Double,
      maxBands: Int = 64, maxRows: Int = 16): LshPlan =
    lshPlan(1.0 - math.acos(threshold) / math.Pi, 0.5,
      targetRecall, maxBands, maxRows)

  /** [[lshPlan]] for MinHash over Jaccard: per-hash collision
    * probability IS the Jaccard value; `bgJaccard` is the typical
    * unrelated-pair similarity of the corpus (shingle overlap of
    * random documents — near 0 for long shingles).
    */
  def lshPlanJaccard(threshold: Double, targetRecall: Double,
      bgJaccard: Double = 0.05, maxBands: Int = 64,
      maxRows: Int = 16): LshPlan =
    lshPlan(threshold, bgJaccard, targetRecall, maxBands, maxRows)

  /** Embedding near-duplicate pairs at corpus scale: banded sign-LSH
    * candidate generation + exact cosine verification — the structure
    * of [[Dedup.minhashLshPairs]] with hyperplane buckets instead of
    * minhash bands.
    *
    * Each band hashes every vector with its own `planesPerBand` seeded
    * hyperplanes; candidates are pairs sharing a (band, bucket) slot in
    * ANY band (recall for pairs at cosine c: 1-(1-p^planes)^bands with
    * p = 1-acos(c)/π). Shape at 100 TB: one narrow (band, bucket,
    * vec_id) shuffle for the self-join — embeddings do NOT ride through
    * the candidate exchange — then two id-keyed joins fetch vectors for
    * verification of the (deduplicated) candidate set only. No
    * driver-side collect, no all-pairs scan; [[cosinePairs]] remains
    * the broadcast-scale exactness baseline.
    */
  /** Corpus-size-aware wrapper solving the two-knob LSH tuning problem
    * the fixed-parameter gate entry (q37: bands=8, planes=4, sized for
    * the tiny gate corpus) cannot:
    *
    *  - planes per band grow with `log2(n / targetBucket)` so expected
    *    band-bucket occupancy stays ~targetBucket — a FIXED plane count
    *    makes bucket density grow linearly with n and candidate
    *    verification QUADRATICALLY (measured 25× on a 10× corpus,
    *    PERF.md round-5 probe);
    *  - bands then grow to hold `recall` at the threshold — more
    *    planes alone collapse per-band match probability p^planes
    *    (p = 1 − acos(t)/π), silently dropping true pairs (measured
    *    73k → 8.4k pairs on the same corpus).
    *
    * Cost stays linear: bands × n bucket rows shuffle; low thresholds
    * are intrinsically band-hungry (p small ⇒ bands ~ ln(1/(1−R))/pᵏ —
    * LSH theory, not an implementation artifact); realistic near-dup
    * thresholds (≥0.8) keep bands modest at any n. One `count()` buys
    * the parameterization; pass `n` when the caller knows it.
    */
  def lshNearDupPairsAuto(corpus: DataFrame, threshold: Double,
      targetBucket: Int = 32, recall: Double = 0.9, dim: Int = 64,
      seed: Long = 42L, maxBucket: Option[Int] = None,
      n: Long = -1L): DataFrame = {
    val rows = if (n >= 0L) n else corpus.count()
    val planes = planesForCount(rows, targetBucket)
    lshNearDupPairs(corpus, threshold,
      bandsForRecall(threshold, planes, recall), planes, dim, seed, maxBucket)
  }

  /** ceil(log2(n / targetBucket)), floored at 4 planes and capped at 62
    * (bucket ids pack into a Long).
    */
  def planesForCount(n: Long, targetBucket: Int): Int = {
    require(targetBucket > 0, s"targetBucket must be positive, got $targetBucket")
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(62, math.max(4, needed))
  }

  /** Bands needed for `1-(1-p^planes)^bands >= recall` at cosine
    * `threshold` (p = 1 − acos(t)/π). THROWS when the target needs more
    * than `maxBands` — silently clamping would hand back a fraction of
    * the requested recall with no signal (at n=5M/thr=0.4 a clamp to
    * 128 bands delivers ~3% of the true pairs), the same refusal
    * contract as [[lshPlan]]. Low thresholds are intrinsically
    * band-hungry (bands ~ ln(1/(1−R))/p^planes): raise the threshold,
    * lower the recall target, or raise maxBands consciously (band cost
    * is linear, bands × n bucket rows).
    */
  def bandsForRecall(threshold: Double, planesPerBand: Int,
      recall: Double = 0.9, maxBands: Int = 512): Int = {
    require(recall > 0 && recall < 1, s"recall in (0,1), got $recall")
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    val pb = math.pow(p, planesPerBand.toDouble)
    val needed =
      if (pb <= 1e-12) Int.MaxValue
      else math.max(1, math.ceil(math.log1p(-recall) / math.log1p(-pb)).toInt)
    require(needed <= maxBands,
      s"recall $recall at threshold $threshold needs $needed bands with " +
        s"$planesPerBand planes/band (> maxBands=$maxBands): raise the " +
        "threshold, lower the recall target, or raise maxBands")
    needed
  }

  def lshNearDupPairs(corpus: DataFrame, threshold: Double,
      bands: Int = 8, planesPerBand: Int = 4, dim: Int = 64,
      seed: Long = 42L, maxBucket: Option[Int] = None): DataFrame = {
    // All band buckets in ONE fused primitive loop per row: the column
    // form ([[lshBucket]] per band) evaluates bands×planes interpreted
    // aggregate(zip_with) dots per row — measured ~10× slower on this
    // exact query. Math is identical: each dot accumulates in double in
    // index order, as the column form's foldLeft does.
    val planes: Array[Array[Array[Double]]] =
      (0 until bands).map(bi => hyperplanes(planesPerBand, dim, seed + bi)).toArray
    val bandBuckets = udf { e: Seq[Float] =>
      val n = e.length
      require(n == dim,
        s"lshNearDupPairs: embedding length $n != dim parameter $dim")
      val prim = new Array[Double](n)
      var i = 0
      while (i < n) { prim(i) = e(i).toDouble; i += 1 }
      planes.map { band =>
        var bucket = 0L
        var p = 0
        while (p < band.length) {
          val pl = band(p)
          var dot = 0.0
          var k = 0
          while (k < n) { dot += prim(k) * pl(k); k += 1 }
          if (dot > 0) bucket |= 1L << p
          p += 1
        }
        bucket
      }
    }
    // Persisted like Dedup.minhashLshPairs' twin shape: the bucket
    // frame feeds BOTH sides of the self-join and the embedding frame
    // both verification joins — Spark has no cross-branch plan reuse,
    // so unpersisted the dominant bands×planes×dim bucket UDF runs
    // twice and the upstream corpus pipeline three times.
    val eCached = corpus.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketed = Dedup.capBuckets(
      eCached
        .select(col("vec_id"), posexplode(bandBuckets(col("embedding"))))
        .select(col("pos").as("band"), col("col").as("bucket"), col("vec_id")),
      maxBucket, "band", "bucket") // skew guard — see Dedup.capBuckets
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Candidate dedup via distinct() on the NARROW (va, vb) pair — 16
    // bytes/row through the exchange. (Measured alternatives lost: a
    // first-collision-band filter needs the full bucket vector riding
    // the join plus a per-row array probe, and costs 2.4× this shape —
    // the wide join output dwarfs the exchange it deletes.)
    val cand = bucketed.as("l").join(bucketed.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("va"), col("r.vec_id").as("vb"))
      .distinct()
    val e = eCached
    // Materialize the pair-sized result and release the corpus-sized
    // caches HERE (the Contamination.report pattern): a bare lazy
    // return would pin eCached + bucketed for the session lifetime —
    // unpersist on a derived frame is a sameResult no-op, so only this
    // function can release them. The RETURNED frame is cached; callers
    // done with it unpersist() — the gate/bench/verify harnesses all
    // clearCache() between queries (their standing per-query hygiene),
    // so repeated gate runs do not accumulate pair frames; only a
    // long-lived interactive session that ignores the contract would.
    val out = cand
      .join(e.select(col("vec_id").as("va"), col("embedding").as("ea")), "va")
      .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb")), "vb")
      .select(col("va"), col("vb"),
        graft.operators.Curation.floorRound(graft.functions.F.vec_cosine(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    eCached.unpersist()
    bucketed.unpersist()
    out
  }

  /** ANN top-k within LSH bucket: corpus and probes are bucketed by the
    * same planes; candidates are bucket-equal pairs. Shuffle is a hash
    * join on the bucket id.
    *
    * `multiProbe = true` additionally probes every hamming-distance-1
    * bucket (each single plane-bit flipped): near-misses where one
    * marginal hyperplane put a true neighbor on the other side come
    * back into the candidate set, raising recall ~(numPlanes+1)× the
    * probe fan-out while the corpus side — the big side — is untouched.
    * A corpus row holds ONE bucket and the probe's bucket list is
    * distinct, so no candidate pair duplicates.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      numPlanes: Int = 12, dim: Int = 64, multiProbe: Boolean = false): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val cb = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val pbucket = lshBucket(col("embedding"), planes)
    val pbuckets =
      if (!multiProbe) array(pbucket)
      else array(pbucket +:
        (0 until numPlanes).map(i => pbucket.bitwiseXOR(lit(1L << i))): _*)
    val pb = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pe"),
      explode(pbuckets).as("bucket"))
    val joined = cb.join(broadcast(pb),
        cb("bucket") === pb("bucket") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.operators.Curation.floorRound(graft.functions.F.vec_cosine(col("pe"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Index-quality evaluation: recall@k of an approximate ranked result
    * against the exact one. Both inputs are ranked neighbor tables in
    * the family's common shape `(probe_id, vec_id, …, rank)` (what
    * [[bruteTopK]], [[lshTopK]], [[ivfTopK]], [[pqTopK]] and the
    * at-rest probes all return), so any index variant can be scored
    * against any ground truth without re-running either search.
    *
    * Scale shape: both sides are top-k tables — k rows per probe, never
    * corpus-sized — so the overlap join is a probe-keyed hash join over
    * O(|probes|·k) rows regardless of corpus size; the expensive part
    * is producing the inputs, which each have their own scale story.
    *
    * Returns one row per probe: `(probe_id, n_hits, recall)` where
    * n_hits = |exact top-k ∩ approx top-k| and recall = n_hits / k.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val e = exact.filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("probe_id").as("a_probe"), col("vec_id").as("a_vec"))
    e.join(a, e("probe_id") === col("a_probe") && e("vec_id") === col("a_vec"),
        "left")
      .groupBy(col("probe_id"))
      .agg(count(col("a_vec")).as("n_hits"),
        graft.operators.Curation.floorRound(count(col("a_vec")) / lit(k).cast("double"), 4).as("recall"))
  }

  /** Product-quantization ANN (PQ, Jégou et al. TPAMI'11 shape):
    * split each vector into `m` subvectors, quantize each against a
    * per-subvector codebook of `k` centroids, and answer queries with
    * asymmetric distance computation (ADC) — the probe's exact
    * subvectors against the corpus's quantized codes.
    *
    * Scale shape (100 TB): the corpus compresses from 64 floats to `m`
    * byte codes per vector (64× smaller scan), codebooks are tiny and
    * broadcast, and ADC is a table lookup per subvector. Codebooks here
    * are md5-ordered corpus samples (deterministic, SQL-replayable —
    * k-means iterations would only tighten cells). Per-(probe, corpus,
    * subvector) partial distances accumulate in decimal so the total is
    * float-order-independent, matching the oracle bit-for-bit.
    *
    * Returns (probe_id, vec_id, adc, rank): top-k smallest ADC per
    * probe, ties to the lower vec_id.
    */
  /** Deterministic PQ codebooks: md5-ordered corpus samples (k-means
    * iterations would only tighten cells). k full-dim rows — each
    * subvector mi uses its [mi·subDim, (mi+1)·subDim) slice. */
  def pqCodebooks(corpus: DataFrame, k: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("vec_id"), col("embedding"))
      .orderBy(md5(concat(lit("pq"), col("vec_id").cast("string"))).asc,
        col("vec_id").asc)
      .limit(k).as[(Long, Array[Float])].collect()
      .map(_._2.map(_.toDouble))
  }

  private def pqSqDist(a: Seq[Float], c: Array[Double], lo: Int, n: Int): Double = {
    var d = 0.0
    var i = 0
    while (i < n) {
      val x = a(lo + i).toDouble - c(lo + i)
      d += x * x
      i += 1
    }
    d
  }

  private def pqCodesUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]], m: Int) =
    udf { v: Seq[Float] =>
      val cs = bc.value
      // Loud contract (the lshNearDupPairs discipline): truncating
      // division would silently drop trailing dims from every distance,
      // and m > dim would make subDim 0 — ALL distances 0, "nearest
      // neighbors" just the lowest ids, no diagnostic.
      require(m > 0 && v.length % m == 0,
        s"pq: embedding dim ${v.length} not divisible by m=$m subvectors")
      val subDim = v.length / m
      (0 until m).map { mi =>
        var best = 0
        var bestD = Double.MaxValue
        var ci = 0
        while (ci < cs.length) {
          val d = pqSqDist(v, cs(ci), mi * subDim, subDim)
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        best
      }
    }

  // ADC: the m partial distances sum in DECIMAL so the total is
  // float-order-independent. Fused into one UDF — the explode +
  // decimal groupBy form shuffles m rows per (probe, corpus) pair
  // (m·n·|probes| rows through an exchange) to add FOUR numbers.
  // Each partial converts exactly as Spark's double→decimal(38,18)
  // cast does (shortest-repr string → BigDecimal, HALF_UP scale);
  // decimal addition is exact, so fusing preserves bit-equality with
  // the previous aggregate and the SQL oracle.
  private def pqAdcUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) =
    udf { (p: Seq[Float], codes: Seq[Int]) =>
      val cs = bc.value
      require(codes.nonEmpty && p.length % codes.length == 0,
        s"pq ADC: probe dim ${p.length} not divisible by ${codes.length} codes")
      val subDim = p.length / codes.length
      var acc = java.math.BigDecimal.ZERO
      var mi = 0
      while (mi < codes.length) {
        val d = pqSqDist(p, cs(codes(mi)), mi * subDim, subDim)
        acc = acc.add(new java.math.BigDecimal(java.lang.Double.toString(d))
          .setScale(18, java.math.RoundingMode.HALF_UP))
        mi += 1
      }
      acc.doubleValue
    }

  def pqTopK(corpus: DataFrame, probes: DataFrame, kTop: Int,
      m: Int = 4, k: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(pqCodebooks(corpus, k))
    val coded = corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), pqCodesUdf(bc, m)(col("embedding")).as("codes"))
    val pb = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val joined = coded.join(broadcast(pb), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.operators.Curation.floorRound(pqAdcUdf(bc)(col("pe"), col("codes")), 6).as("adc"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= kTop)
  }

  /** Materialize the PQ index: the corpus reduced to its code table
    * (vec_id, m byte-ish codes) plus the tiny codebooks. THIS is the
    * point of PQ at 100 TB — the search scan reads the codes parquet
    * only: 64 floats (256 B) become m=4 small ints (≈4 B compressed),
    * so a full-corpus ADC pass touches ~64× fewer bytes at rest than
    * the embedding table, and the embeddings themselves are never read
    * at query time.
    */
  def pqBuildIndex(corpus: DataFrame, path: String,
      m: Int = 4, k: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = pqCodebooks(corpus, k)
    val bc = spark.sparkContext.broadcast(cents)
    // The two component writes are independent once the codebooks are
    // sampled — overlap them (r12, guide §2.6 via DriverPar): the
    // 1-task codebook write rides inside the code-table write's tail
    // instead of adding a serial job. Committer safety: distinct
    // output directories, so the two FileOutputCommitter instances
    // never share staging paths.
    DriverPar.run(spark, "pq-build")(Seq(
      () => corpus
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"), pqCodesUdf(bc, m)(col("embedding")).as("codes"))
        .write.mode("overwrite").parquet(s"$path/codes"),
      () => cents.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("code", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/codebooks")))
    bc.destroy()
  }

  /** ADC search against a materialized PQ index: probes (exact
    * vectors, broadcast) scan the stored code table — no embedding
    * read, no shuffle of the corpus. Same quantizer and decimal ADC
    * accumulation as [[pqTopK]], so with equal (m, k) the results are
    * identical.
    */
  def pqProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, kTop: Int): DataFrame = {
    import spark.implicits._
    val cents: Array[Array[Double]] = spark.read.parquet(s"$path/codebooks")
      .orderBy(col("code").asc)
      .select(col("centroid")).as[Seq[Double]].collect()
      .map(_.toArray)
    val bc = spark.sparkContext.broadcast(cents)
    val coded = spark.read.parquet(s"$path/codes")
    val pb = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val joined = coded.join(broadcast(pb), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.operators.Curation.floorRound(pqAdcUdf(bc)(col("pe"), col("codes")), 6).as("adc"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= kTop)
  }

  /** Materialize an IVF+PQ index (the canonical large-scale ANN layout,
    * FAISS's IVFPQ shape): the code table is PARTITIONED by coarse IVF
    * cell AND holds PQ codes instead of embeddings. A probe batch then
    * combines both savings — it reads only its nprobe cell partitions
    * (partition pruning) and what it reads is the ~64×-compressed code
    * table, never the embeddings. Coarse centroids and PQ codebooks are
    * both deterministic md5-ordered samples (SQL-replayable).
    */
  def ivfPqBuildIndex(corpus: DataFrame, path: String,
      nlist: Int = 16, m: Int = 4, k: Int = 16, seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Both quantizer samples are independent collect jobs over the
    // corpus — overlap them (r12, guide §2.6 via DriverPar).
    val sampled = DriverPar.run(spark, "ivfpq-quantizers")(Seq(
      () => ivfCentroids(corpus, nlist, seed),
      () => pqCodebooks(corpus, k)))
    val cents = sampled(0)
    val books = sampled(1)
    val bcC = spark.sparkContext.broadcast(cents)
    val bcB = spark.sparkContext.broadcast(books)
    // The three component writes are independent once the quantizers
    // exist: the two 1-task quantizer-table writes ride inside the
    // code-table write's stage tail instead of adding two serial jobs
    // (distinct output directories — no committer staging overlap).
    DriverPar.run(spark, "ivfpq-build")(Seq(
      () => corpus
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"),
          pqCodesUdf(bcB, m)(col("embedding")).as("codes"),
          nearestCellUdf(bcC)(col("embedding")).as("cell"))
        // Cluster by cell before the partitioned write (guide §6, small
        // files): P map tasks × nlist dirs would write up to P·nlist
        // slivers, and every probe's pruned read pays the per-file open
        // cost nprobe·P times over. The encode UDFs still run across
        // the full-parallelism map stage above; only the write stage
        // narrows to one task (= one file) per cell.
        .repartition(nlist, col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$path/codes"),
      () => cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/centroids"),
      () => books.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("code", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/codebooks")))
    bcC.destroy(); bcB.destroy()
  }

  /** Continuously ingest vectors into an IVF+PQ index: micro-batches
    * are assigned a coarse cell and PQ codes against the index's FIXED
    * quantizers, then appended to a cell-partitioned `delta/` tier via
    * the exactly-once parquet file sink (same tiering as
    * [[ivfStreamingIngest]]); [[ivfPqProbeIndex]] reads base ∪ delta
    * and [[ivfPqCompactIndex]] folds the delta back.
    */
  def ivfPqStreamingIngest(stream: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(readCentroids(spark, path))
    val books: Array[Array[Double]] = spark.read.parquet(s"$path/codebooks")
      .orderBy(col("code").asc)
      .select(col("centroid")).as[Seq[Double]].collect().map(_.toArray)
    // headOption-style guard: an index built from an empty corpus has a
    // codes table with zero rows, and a bare head() would fail stream
    // setup with an opaque NoSuchElementException.
    val m = spark.read.parquet(s"$path/codes")
      .select(size(col("codes"))).as[Int].head(1) match {
        case Array(v) => v
        case _ => throw new IllegalStateException(
          s"ivfPqStreamingIngest: $path/codes is empty — cannot infer the " +
            "PQ segment count; build the index over a non-empty corpus first")
      }
    val bcB = spark.sparkContext.broadcast(books)
    stream
      .select(col("vec_id"),
        pqCodesUdf(bcB, m)(col("embedding")).as("codes"),
        nearestCellUdf(bcC)(col("embedding")).as("cell"))
      .writeStream
      .format("parquet")
      .option("path", s"$path/delta")
      .option("checkpointLocation", checkpoint)
      .partitionBy("cell")
      .start()
  }

  /** Serve a probe stream against the at-rest IVF+PQ index — the ADC
    * analog of [[ivfStreamingServe]] (same per-batch partition
    * pruning, same at-least-once append contract). */
  def ivfPqStreamingServe(probeStream: DataFrame, path: String,
      outPath: String, checkpoint: String, kTop: Int,
      nprobe: Int = 4): org.apache.spark.sql.streaming.StreamingQuery =
    probeStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ivfPqProbeIndex(batch.sparkSession, path, batch, kTop, nprobe)
            .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Fold the IVF+PQ streaming delta into the base code table (see
    * [[ivfCompactIndex]] — same offline rewrite-and-rename). */
  def ivfPqCompactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val delta = new Path(s"$path/delta")
    val fs = delta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delta)) return
    val merged = spark.read.parquet(s"$path/codes")
      .unionByName(spark.read.parquet(s"$path/delta"))
    merged.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes_compacting")
    // Same crash-safe aside-swap as ivfCompactIndex: the live code
    // table is never absent, only superseded.
    val codes = new Path(s"$path/codes")
    val old = new Path(s"$path/codes_old")
    fs.delete(old, true)
    require(fs.rename(codes, old), s"aside-rename of live code table failed under $path")
    require(fs.rename(new Path(s"$path/codes_compacting"), codes),
      s"rename of compacted IVFPQ index failed under $path")
    fs.delete(old, true)
    fs.delete(delta, true)
  }

  /** ADC search against an IVF+PQ index: probes route to their nprobe
    * cells, the scan reads ONLY those `cell=` partitions of the code
    * table (base ∪ any streaming delta), and distances are asymmetric
    * (exact probe vs stored codes) with the same decimal accumulation
    * as [[pqTopK]] — with nprobe = nlist the candidate set is the
    * whole corpus and results equal [[pqTopK]] exactly.
    */
  def ivfPqProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, kTop: Int, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(readCentroids(spark, path))
    val books: Array[Array[Double]] = spark.read.parquet(s"$path/codebooks")
      .orderBy(col("code").asc)
      .select(col("centroid")).as[Seq[Double]].collect()
      .map(_.toArray)
    val bcB = spark.sparkContext.broadcast(books)
    val nearestCells = nearestCellsUdf(bcC)
    val pb = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
      explode(nearestCells(col("embedding"), lit(nprobe))).as("cell"))
    val probedCells = pb.select(col("cell")).distinct().as[Int].collect().toSeq
    val codesBase = spark.read.parquet(s"$path/codes")
    val deltaPath = new org.apache.hadoop.fs.Path(s"$path/delta")
    val fs = deltaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val codesAll =
      if (fs.exists(deltaPath))
        codesBase.unionByName(spark.read.parquet(s"$path/delta")
          .select(codesBase.columns.map(col): _*))
      else codesBase
    val coded = codesAll.filter(col("cell").isin(probedCells: _*))
    val joined = coded.join(broadcast(pb),
        coded("cell") === pb("cell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.operators.Curation.floorRound(pqAdcUdf(bcB)(col("pe"), col("codes")), 6).as("adc"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= kTop)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nlist` centroids
    * (deterministically sampled corpus vectors, normalized) partitions
    * the corpus into cells; probes search their `nprobe` nearest cells.
    *
    * Scale shape (100 TB): the centroid table is tiny and broadcast
    * everywhere; the corpus is written bucketed/partitioned by `cell`
    * once at indexing time, so a probe batch shuffles only the probe
    * rows (fan-out × nprobe) and each cell scan is a partition-pruned
    * hash-join lookup, not a corpus scan. Recall rises with nprobe
    * (nprobe = nlist ⇒ exact brute force).
    */
  /** Coarse quantizer for IVF: sample `nlist` corpus vectors as
    * centroids (k-means init without iterations — deterministic, and
    * refinement only sharpens cell balance, not correctness).
    * TakeOrdered pulls only nlist rows to the driver. The sampling
    * order is md5('ivf<seed>' || vec_id) — a seeded uniform order that
    * an ANSI SQL oracle reproduces verbatim (unlike xxhash64).
    * Centroids are L2-normalized so a dot product ranks as cosine.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
      seed: Long = 42L): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampled = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(md5(concat(lit(s"ivf$seed"), col("vec_id").cast("string"))).asc,
        col("vec_id").asc)
      .limit(nlist).as[(Long, Array[Float])].collect()
    sampled.map { case (_, e) =>
      val n = math.sqrt(e.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      e.map(_.toDouble / (if (n == 0) 1.0 else n))
    }
  }

  /** Corpus-sized nlist: per probe, the centroid scan costs nlist and
    * the cell scans cost nprobe·n/nlist; √(nprobe·n) balances them —
    * the classic IVF sizing law. A FIXED nlist (the gate hardcodes 16)
    * makes cell scans degrade linearly with corpus growth. Capped at
    * 2^16 (the centroid table broadcasts).
    */
  def nlistForCount(n: Long, nprobe: Int = 4): Int = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    math.min(1 << 16, math.max(16,
      math.ceil(math.sqrt(nprobe.toDouble * math.max(0L, n))).toInt))
  }

  /** [[ivfTopK]] with the corpus-sized nlist; one `count()` buys the
    * parameterization (pass `n` when known).
    */
  def ivfTopKAuto(corpus: DataFrame, probes: DataFrame, k: Int,
      nprobe: Int = 4, seed: Long = 42L, n: Long = -1L): DataFrame = {
    val rows = if (n >= 0L) n else corpus.count()
    ivfTopK(corpus, probes, k, nlistForCount(rows, nprobe), nprobe, seed)
  }

  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val cents = ivfCentroids(corpus, nlist, seed)
    val bc = spark.sparkContext.broadcast(cents)
    val nearestCells = nearestCellsUdf(bc)
    val cb = corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("cell", element_at(nearestCells(col("embedding"), lit(1)), 1))
    val pb = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
      explode(nearestCells(col("embedding"), lit(nprobe))).as("cell"))
    val joined = cb.join(broadcast(pb),
        cb("cell") === pb("cell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.operators.Curation.floorRound(graft.functions.F.vec_cosine(col("pe"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- IVF index at rest ---------------------------------------------

  /** Materialize an IVF index: the corpus written as parquet
    * PARTITIONED BY the coarse cell (`cell=N/` Hive dirs) plus a tiny
    * `centroids/` table. This is the bucketed-at-rest layout the
    * inline [[ivfTopK]] notes assume: index once, then every probe
    * batch reads only its probed cells.
    *
    * Scale shape (100 TB): one corpus-wide shuffle-free pass assigns
    * cells (centroids broadcast) and the parquet writer splits by
    * partition column — work O(corpus), done once. At real scale
    * `nlist` grows with corpus size (cells of ~256 MB), so a probe
    * batch with nprobe=8 touches nprobe/nlist of the bytes at rest.
    */
  /** argmax-n cell routing against broadcast centroids: the n cells
    * with the highest dot product (centroids are unit vectors, so dot
    * ranks identically to cosine), ties to the lower cell id. ONE
    * shared implementation — the "results equal [[ivfTopK]] exactly"
    * contracts of the at-rest probes depend on every call site routing
    * identically. */
  private def nearestCellsUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) =
    udf { (e: Seq[Float], n: Int) =>
      val cs = bc.value
      cs.indices.map { ci =>
        val c = cs(ci)
        var dotv = 0.0; var i = 0
        while (i < c.length) { dotv += e(i).toDouble * c(i); i += 1 }
        (ci, dotv)
      }.sortBy { case (ci, d) => (-d, ci) }.take(n).map(_._1)
    }

  /** argmax-1 cell assignment against broadcast centroids; ties to the
    * lower cell id (matches [[ivfTopK]]'s `nearestCells(…, 1)`). */
  private def nearestCellUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) =
    udf { e: Seq[Float] =>
      val cs = bc.value
      var best = 0; var bestD = Double.MinValue
      var ci = 0
      while (ci < cs.length) {
        val c = cs(ci)
        var dotv = 0.0; var i = 0
        while (i < c.length) { dotv += e(i).toDouble * c(i); i += 1 }
        if (dotv > bestD) { bestD = dotv; best = ci }
        ci += 1
      }
      best
    }

  /** The index's fixed centroid table, cell-ordered. nlist rows. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell").asc)
      .select(col("centroid")).as[Seq[Double]].collect()
      .map(_.toArray)
  }

  def ivfBuildIndex(corpus: DataFrame, path: String,
      nlist: Int = 16, seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(corpus, nlist, seed)
    val bc = spark.sparkContext.broadcast(cents)
    // The two component writes are independent once the centroids are
    // sampled — overlap them (r12, guide §2.6 via DriverPar; distinct
    // output directories, so no committer staging overlap).
    //
    // `nrm` stored at rest: probes then verify candidates with ONE
    // fused dot per pair instead of the 3-accumulator cosine loop —
    // same bits (see dotUdf), a third of the verification FLOPs.
    DriverPar.run(spark, "ivf-build")(Seq(
      () => corpus
        .withColumn("cell", nearestCellUdf(bc)(col("embedding")))
        .withColumn("nrm", graft.functions.F.vec_norm(col("embedding")))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$path/cells"),
      () => cents.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/centroids")))
    bc.destroy()
  }

  /** Continuously ingest a vector stream into a materialized index:
    * each micro-batch assigns cells against the index's FIXED centroids
    * and appends to a cell-partitioned `delta/` tier through Spark's
    * exactly-once parquet file sink (its `_spark_metadata` commit log
    * makes replayed batches idempotent — the streaming analog of the
    * journal's spool→persist commit). [[ivfProbeIndex]] reads base ∪
    * delta, both partition-pruned; [[ivfCompactIndex]] folds the delta
    * back into the base offline.
    *
    * The delta is a SEPARATE directory because a file-sink commit log
    * in `cells/` would hide the batch-written base files from readers.
    * Centroids stay fixed — at 100 TB you re-train and rebuild when
    * cell balance drifts, you don't mutate a live quantizer.
    */
  def ivfStreamingIngest(stream: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    val bc = spark.sparkContext.broadcast(readCentroids(spark, path))
    stream
      .withColumn("cell", nearestCellUdf(bc)(col("embedding")))
      .withColumn("nrm", graft.functions.F.vec_norm(col("embedding")))
      .writeStream
      .format("parquet")
      .option("path", s"$path/delta")
      .option("checkpointLocation", checkpoint)
      .partitionBy("cell")
      .start()
  }

  /** Fold the streaming `delta/` tier into the base `cells/` tier:
    * one partitioned rewrite of base ∪ delta, committed by Hadoop FS
    * rename (the journal persister's pattern), then the delta and its
    * commit log are dropped. Run offline — stop the ingest query
    * first; on restart its checkpoint skips the already-folded batches.
    */
  def ivfCompactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val delta = new Path(s"$path/delta")
    val fs = delta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delta)) return
    val merged = spark.read.parquet(s"$path/cells")
      .unionByName(spark.read.parquet(s"$path/delta"))
    merged.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells_compacting")
    // Crash-safe swap: move the live dir ASIDE (not delete) before the
    // new one renames in, so no window exists where cells/ is gone and
    // unrecoverable — a crash leaves either the old index live or the
    // old index in _old with the compacted one live.
    val cells = new Path(s"$path/cells")
    val old = new Path(s"$path/cells_old")
    fs.delete(old, true)
    require(fs.rename(cells, old), s"aside-rename of live index failed under $path")
    require(fs.rename(new Path(s"$path/cells_compacting"), cells),
      s"rename of compacted index failed under $path")
    fs.delete(old, true)
    fs.delete(delta, true)
  }

  /** Probe a materialized IVF index: assign each probe its `nprobe`
    * nearest cells, then scan ONLY those `cell=` partitions — the
    * probed-cell filter is a partition filter, so unprobed cells are
    * pruned at planning time and never read from storage. Exact cosine
    * + window top-k over the candidates; same math as [[ivfTopK]], so
    * with equal (nlist, nprobe, seed) the results are identical.
    *
    * The distinct probed-cell set is collected to the driver — bounded
    * by nlist (the centroid table already lives there), never by the
    * corpus.
    */
  def ivfProbeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(readCentroids(spark, path))
    val nearestCells = nearestCellsUdf(bc)
    val pb = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
      graft.functions.F.vec_norm(col("embedding")).as("pnrm"),
      explode(nearestCells(col("embedding"), lit(nprobe))).as("cell"))
    // Bounded collect: ≤ nlist distinct cell ids, for the partition
    // filter. IN over partition values prunes the unprobed dirs.
    val probedCells = pb.select(col("cell")).distinct().as[Int].collect().toSeq
    // Base tier ∪ streaming delta tier (if an ingest has run), both
    // scans partition-pruned to the probed cells. The delta read goes
    // through the file sink's commit log, so only committed batches
    // are visible.
    val base = spark.read.parquet(s"$path/cells")
    val deltaPath = new org.apache.hadoop.fs.Path(s"$path/delta")
    val fs = deltaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tiers =
      if (fs.exists(deltaPath))
        base.unionByName(
          spark.read.parquet(s"$path/delta").select(base.columns.map(col): _*))
      else base
    val cb = tiers.filter(col("cell").isin(probedCells: _*))
    val joined = cb.join(broadcast(pb),
        cb("cell") === pb("cell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.operators.Curation.floorRound(graft.functions.F.vec_dot(col("pe"), col("embedding")) / (col("pnrm") * col("nrm")), 6).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Cell-occupancy audit of the IVF coarse quantizer: rows and
    * normalized load (n·nlist/total; 1.0 = perfectly even) per cell.
    * The operational skew check for the at-rest layout — a cell with
    * load ≫ 1 makes every probe of it scan-heavy and the partitioned
    * write skewed; the remedy is re-training with more lists (see
    * [[ivfBuildIndex]]'s scaladoc on quantizer lifecycle).
    *
    * One shuffle-free assignment pass (broadcast centroids) + one
    * nlist-row aggregation; the load epilogue is a window over the
    * nlist aggregated rows, not the corpus. For an index already at
    * rest the same report is `spark.read.parquet(s"$$path/cells")
    * .groupBy("cell")` — this form audits a PROSPECTIVE quantizer
    * before paying the index write.
    */
  def ivfCellStats(corpus: DataFrame, nlist: Int = 16,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(ivfCentroids(corpus, nlist, seed))
    val counts = corpus
      .withColumn("cell", nearestCellUdf(bc)(col("embedding")))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    counts.select(col("cell"), col("n"),
      graft.operators.Curation.floorRound(col("n") * lit(nlist.toDouble) / sum(col("n")).over(w).cast("double"), 4).as("load"))
  }

  /** Serve a PROBE stream against the at-rest IVF index: each
    * micro-batch of `(vec_id, embedding)` probes routes through
    * [[ivfProbeIndex]] — the per-batch probed-cell set is
    * data-dependent, so partition pruning can only be planned batch by
    * batch, which is exactly what `foreachBatch` is for — and appends
    * its top-k result rows to `outPath`. With [[ivfStreamingIngest]]
    * and [[ivfCompactIndex]] this completes the index lifecycle:
    * build at rest, ingest continuously, serve continuously, compact
    * offline.
    *
    * Delivery is at-least-once per batch (a crash between the parquet
    * append and the checkpoint commit replays the batch — unlike the
    * ingest tier's file sink there is no `_spark_metadata` log here);
    * replayed batches rewrite identical rows, so downstream readers
    * dedup on (probe_id, vec_id) or read the latest run.
    */
  def ivfStreamingServe(probeStream: DataFrame, path: String,
      outPath: String, checkpoint: String, k: Int,
      nprobe: Int = 4): org.apache.spark.sql.streaming.StreamingQuery =
    probeStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ivfProbeIndex(batch.sparkSession, path, batch, k, nprobe)
            .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998):
    * from each probe's top-`poolSize` cosine candidates, greedily pick
    * `k` maximizing `λ·rel − (1−λ)·max-sim-to-selected` — the
    * diversification pass a retrieval stack runs AFTER ANN candidate
    * generation, so near-duplicate hits don't crowd the context.
    *
    * Scale shape: candidate generation is whatever top-k source feeds
    * it (here [[bruteTopK]] for the labeled-exact gate; [[ivfProbeIndex]]
    * at corpus scale); the greedy step is poolSize²-bounded LOCAL work
    * per probe inside flatMapGroups — no shuffle beyond the candidate
    * top-k's own, state bounded by the pool.
    *
    * Determinism (oracle parity): rel sims arrive pre-rounded (6) from
    * bruteTopK; candidate-candidate sims and the emitted score use the
    * divergence-free floor-scaled form `floor(x·1e6 + 0.5) / 1e6` —
    * Spark's `round` (shortest-decimal BigDecimal) and DuckDB's
    * (exact-binary) disagree on x.xxxxx5-boundary doubles, while the
    * floor chain is the identical IEEE op sequence on both engines.
    * Ties break by vec_id.
    */
  def mmrRerank(corpus: DataFrame, probes: DataFrame, k: Int,
      poolSize: Int, lambda: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pool = bruteTopK(corpus, probes, poolSize)
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("probe_id"), col("vec_id"), col("sim"),
        col("embedding").cast("array<float>"))
      .as[(Long, Long, Double, Array[Float])]
    pool.groupByKey(_._1)
      .flatMapGroups { (probeId, it) =>
        mmrGreedy(it.map(c => (c._2, c._3, c._4)).toArray, k, lambda)
          .map { case (id, step, score) => (probeId, id, step, score) }
          .iterator
      }
      .toDF("probe_id", "vec_id", "mmr_rank", "score")
  }

  /** The pure MMR greedy kernel over one probe's candidate pool
    * (id, rel, vector): returns (id, step, score) picks. Extracted so
    * properties (distinct picks, size = min(k, n), step-1 = argmax rel,
    * input-order invariance) test without a SparkSession.
    */
  private[graft] def mmrGreedy(pool: Array[(Long, Double, Array[Float])],
      k: Int, lambda: Double): Vector[(Long, Long, Double)] = {
    val cands = pool.sortBy(c => (-c._2, c._1))
    // Same fused widen-then-accumulate chain as the vec_cosine
    // kernel (VecOps.cosineFF) so local sims match the column form.
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = Vector.newBuilder[(Long, Long, Double)]
    var step = 1
    while (step <= k && selected.length < cands.length) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < cands.length) {
        if (!selected.contains(i)) {
          // True max over selected (cosines may be negative); the
          // empty-set penalty is 0 by the MMR convention.
          val pen =
            if (selected.isEmpty) 0.0
            else selected.iterator
              .map(s => r6(cos(cands(i)._3, cands(s)._3))).max
          val score = lambda * cands(i)._2 - (1.0 - lambda) * pen
          // Ties resolve to the lower vec_id — the array is already
          // (rel desc, vec_id asc) sorted, so strict > suffices.
          if (score > bestScore) { bestScore = score; bestIdx = i }
        }
        i += 1
      }
      // All-NaN scores (zero-norm probe → NaN sims fill the pool) leave
      // bestIdx at -1: stop rather than index cands(-1).
      if (bestIdx < 0) return out.result()
      selected += bestIdx
      // floor-scaled emit; the -0.5 + 0.5 = +0.0 identity means the
      // chain never produces -0.0 (rule 8 satisfied by shape).
      out += ((cands(bestIdx)._1, step.toLong, r6(bestScore)))
      step += 1
    }
    out.result()
  }
}
