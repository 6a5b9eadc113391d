package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive a larger scale factor from an existing testdata
  * directory by writing `factor` structurally-disjoint replicas.
  *
  *   runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10
  *
  * Replica i offsets every join key by i × 10^12, so the relational
  * graph (customer→orders→lineitem, part/supplier) becomes `factor`
  * disjoint copies — joins, graph queries, and aggregations scale
  * linearly in input size, which is exactly what a scale-factor bump
  * of the generator would produce. Content columns are made
  * replica-disjoint too, to avoid manufacturing cross-replica
  * duplicate blowups the real generator would never emit:
  *  - document text tokens get a per-replica prefix (similarity and
  *    dedup universes stay within a replica),
  *  - customer/part/supplier names get a per-replica prefix,
  *  - embeddings are cyclically rotated by replica (norms and moment
  *    structure preserved; cross-replica cosine decorrelated).
  * Replica 0 is the original data, bit-for-bit.
  *
  * This derived data is for PERFORMANCE probes only — correctness
  * oracles always run on the driver-provided directories.
  *
  * Caveat at factor > 64: embedding rotation wraps (i % 64), so
  * replicas i and i+64 carry IDENTICAL vectors under different ids —
  * similarity/ANN probes above factor 64 would see a manufactured
  * duplicate tier; the text/key salting has no such wrap (2-digit
  * tags cover factor 676).
  */
object ScaleUp {
  private val K = 1000000000000L // replica key stride

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.Engine.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)

    def replicas(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out = (0 until factor).map(i => f(base, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$factor -> $dst/$t.parquet")
    }
    def off(c: String, i: Int) = (col(c) + lit(i.toLong * K)).as(c)
    // Token-level salt: replica i > 0 prefixes every token with a
    // LETTERS-ONLY tag ("za", "zb", …), keeping similarity/dedup
    // universes disjoint across replicas. The tag must survive
    // `[a-z]+` tokenization as part of its token: a digit-bearing tag
    // ("r3") would be split off, leaving replicas token-identical —
    // 9 exact copies of every document, which blows up any exact
    // near-dup join with a 45×-pairs data artifact the real generator
    // would never produce.
    // Letters-only tag for any factor ≤ 677: TWO base-26 digits of
    // (i-1), prefixed z — "zaa".."zzz". Fixed width, so no tag is a
    // prefix of another (variable-length tags would let
    // "zb"+"apple" == "zba"+"pple" leak cross-replica duplicate
    // tokens); the old single-letter scheme broke past factor 26,
    // which the sf10 derivation (factor 100) needs.
    def tag(i: Int): String = {
      val v = i - 1
      require(v < 26 * 26, s"factor ${i} exceeds the 2-digit tag space")
      s"z${('a' + v / 26).toChar}${('a' + v % 26).toChar}"
    }
    def saltedExpr(c: String, i: Int) =
      if (i == 0) col(c)
      else regexp_replace(col(c), "(\\S+)", s"${tag(i)}$$1")
    def salt(c: String, i: Int) = saltedExpr(c, i).as(c)

    replicas("region")((df, i) => if (i == 0) df else df.limit(0))
    replicas("nation")((df, i) => if (i == 0) df else df.limit(0))
    replicas("customer")((df, i) => df.select(
      off("c_custkey", i), salt("c_name", i), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))
    replicas("supplier")((df, i) => df.select(
      off("s_suppkey", i), salt("s_name", i), col("s_nationkey"),
      col("s_acctbal")))
    replicas("part")((df, i) => df.select(
      off("p_partkey", i), salt("p_name", i), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))
    replicas("orders")((df, i) => df.select(
      off("o_orderkey", i), off("o_custkey", i), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")))
    replicas("lineitem")((df, i) => df.select(
      off("l_orderkey", i), off("l_partkey", i), off("l_suppkey", i),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")))
    replicas("events")((df, i) => df.select(
      off("event_id", i), col("ts"), off("user_id", i),
      col("event_type"), col("value"), col("props")))
    // n_chars re-derives from the SALTED text (replica 0 keeps the
    // original column): carrying replica-0 lengths alongside longer
    // salted text would leave the two columns mutually inconsistent.
    replicas("documents")((df, i) => df.select(
      off("doc_id", i), salt("text", i), col("lang"), col("source"),
      (if (i == 0) col("n_chars")
       else length(saltedExpr("text", i)).cast("long")).as("n_chars")))
    // Rotation preserves each vector's norm and the corpus's moment
    // structure while decorrelating replicas (no cross-replica
    // near-dup pairs a real generator would not produce).
    replicas("embeddings")((df, i) => df.select(
      off("vec_id", i),
      (if (i == 0) col("embedding")
       else {
         val n = size(col("embedding"))
         val r = lit(i % 64)
         concat(slice(col("embedding"), r + lit(1), n - r),
           slice(col("embedding"), lit(1), r))
       }).as("embedding"),
      col("label")))
    spark.stop()
  }
}
