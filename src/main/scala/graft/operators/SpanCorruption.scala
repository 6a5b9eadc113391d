package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/** T5/UL2-style span corruption (Raffel et al. 2020 §3.1.4): mask
  * random token spans and emit (input, target) pairs — input has each
  * masked RUN collapsed to one `<X_k>` sentinel, target lists each
  * sentinel followed by the tokens it hides. The denoising-objective
  * preprocessing map of encoder-decoder and UL2-style pretraining.
  *
  * RNG-free (house rule): token i starts a span iff
  * md5(doc_id:i) % 20 == 0 (≈5% of positions), with span length
  * 2 + (h/20) % 3 ∈ {2,3,4} (mean 3 → ≈15% of tokens masked, the T5
  * default). Overlapping spans union; maximal masked runs become one
  * sentinel each (exactly T5's behavior when spans collide). Every
  * decision is a pure function of (doc_id, position), so the masking
  * is reproducible across re-runs, corpus growth, AND the DuckDB
  * oracle (which replays it with range joins + gaps-and-islands).
  *
  * Scale shape: ONE fused narrow map per document (tokenize → hash →
  * mask → build strings); no shuffle, no state. Documents with zero
  * word tokens carry nothing to mask and are excluded by contract.
  *
  * @return (doc_id, n_tok, n_spans, n_masked, input, target)
  */
object SpanCorruption {

  /** First 8 hex chars of md5(s) as an unsigned 32-bit value —
    * matches DuckDB's `('0x' || substr(md5(s), 1, 8))::UBIGINT`.
    */
  private def md5Head(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // First 4 bytes big-endian = first 8 hex chars.
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022): for a
    * deterministic half of the corpus, split the token stream at two
    * md5-derived cut points and emit the PSM reordering
    * `<PRE> prefix <SUF> suffix <MID> middle` — training on which
    * gives a left-to-right model infilling ability "for free". The
    * other half passes through untransformed (the paper's 50% FIM
    * rate), flagged `fim = false` with sentinel cuts (-1, -1).
    *
    * Unlike [[corrupt]]'s fused map, this stays in PURE COLUMN FORM —
    * array slices + concat_ws inside whole-stage codegen, no UDF, no
    * shuffle: the cut arithmetic is cheap enough that the interpreted-
    * vs-fused tradeoff flips. Cuts are uniform over [0, n] via md5
    * residues; lo = min, hi = max, so empty prefix/middle/suffix
    * sections are legal and collapse cleanly (concat of empty array).
    * Documents with zero word tokens are excluded by contract.
    *
    * @return (doc_id, n_tok, fim, cut_lo, cut_hi, psm)
    */
  def fim(docs: DataFrame, id: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.functions._
    def h(salt: String, docId: Column): Column =
      conv(substring(md5(concat(docId.cast("string"), lit(":" + salt))), 1, 8),
        16, 10).cast("long")
    val base = docs.select(id.cast("long").as("doc_id"),
        TextAnalysis.wordTokens(text).as("w"))
      .filter(size(col("w")) >= 1)
      .withColumn("n", size(col("w")).cast("long"))
    val keyed = base
      .withColumn("use_fim", h("fim0", col("doc_id")) % 2 === 0)
      .withColumn("a", h("fim1", col("doc_id")) % (col("n") + 1))
      .withColumn("b", h("fim2", col("doc_id")) % (col("n") + 1))
      .withColumn("lo", least(col("a"), col("b")))
      .withColumn("hi", greatest(col("a"), col("b")))
    keyed.select(col("doc_id"), col("n").as("n_tok"),
      col("use_fim").as("fim"),
      when(col("use_fim"), col("lo")).otherwise(lit(-1L)).as("cut_lo"),
      when(col("use_fim"), col("hi")).otherwise(lit(-1L)).as("cut_hi"),
      when(col("use_fim"),
        concat_ws(" ", concat(
          array(lit("<PRE>")), slice(col("w"), lit(1), col("lo").cast("int")),
          array(lit("<SUF>")),
          slice(col("w"), col("hi").cast("int") + 1,
            (col("n") - col("hi")).cast("int")),
          array(lit("<MID>")),
          slice(col("w"), col("lo").cast("int") + 1,
            (col("hi") - col("lo")).cast("int")))))
        .otherwise(concat_ws(" ", col("w"))).as("psm"))
  }

  def corrupt(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(id.cast("long").as("doc_id"), text.cast("string").as("text"))
      .repartition(spark.sparkContext.defaultParallelism) // CPU-bound map
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (docId, t) =>
          val w = TextAnalysis.tokenize(t)
          val n = w.length
          if (n == 0) None
          else {
            val masked = new Array[Boolean](n)
            var i = 0
            while (i < n) {
              val h = md5Head(md, s"$docId:${i + 1}")
              if (h % 20 == 0) {
                val len = (2 + (h / 20) % 3).toInt
                var j = i
                while (j < n && j < i + len) { masked(j) = true; j += 1 }
              }
              i += 1
            }
            val inp = new StringBuilder
            val tgt = new StringBuilder
            var k = 0
            var nMasked = 0
            i = 0
            while (i < n) {
              if (!masked(i)) {
                if (inp.nonEmpty) inp += ' '
                inp ++= w(i)
                i += 1
              } else {
                k += 1
                if (inp.nonEmpty) inp += ' '
                inp ++= s"<X_$k>"
                if (tgt.nonEmpty) tgt += ' '
                tgt ++= s"<X_$k>"
                while (i < n && masked(i)) {
                  tgt += ' '; tgt ++= w(i); nMasked += 1; i += 1
                }
              }
            }
            Some((docId, n.toLong, k.toLong, nMasked.toLong,
              inp.toString, tgt.toString))
          }
        }
      }.toDF("doc_id", "n_tok", "n_spans", "n_masked", "input", "target")
  }
}
