package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query-name prefixes]
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine.local carries the session conventions (UTC, ns-as-long —
    // events.parquet is TIMESTAMP(NANOS)) and the extension.
    val spark = Engine.local(cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // Dynamic oracles (q37b's LSH knob laws) parameterize on the corpus
    // size of THIS dump's SF: set it before queries run and before
    // oracleSql is rendered, from the same table the queries count.
    // Skipped when a query filter excludes q37b — a targeted dev run
    // (Verify dir out q54) shouldn't pay a corpus-sized count for a
    // property nothing compared will read (consumers default to the
    // gate-SF value).
    if (only.forall(_.exists("q37b_embedding_neardup_auto".startsWith)))
      System.setProperty("graft.oracle.embeddings_n",
        Tables.embeddings(spark, sfDir).count().toString)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Same per-query hygiene as Bench: operators whose results stay
      // cheap by persisting a bounded internal table (bm25's postings,
      // probe indexes) rely on the harness releasing it between
      // queries — without this, a 166-query dump accumulates every
      // such cache and later queries run under eviction pressure.
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
