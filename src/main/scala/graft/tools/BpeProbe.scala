package graft.tools

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/** Dev probe: where does a BPE training round's wall time go?
  * Not part of the gate; kept for reproducing the round-10 numbers.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    // Warm up scan + tokenizer codegen.
    t("warmup tokenize+count") {
      docs.select(graft.operators.TextAnalysis.wordTokens($"text").as("syms"))
        .select(sum(size($"syms"))).collect()
    }
    for (rep <- 1 to 2) {
      spark.catalog.clearCache()
      t(s"rep$rep trainMerges(10)") {
        graft.operators.Bpe.trainMerges(docs, $"doc_id", $"text", 10).collect()
      }
    }
    // Round anatomy: cached corpus, then isolate the count+argmax job
    // from the rewrite+persist job.
    spark.catalog.clearCache()
    val corpus = docs
      .select($"doc_id", graft.operators.TextAnalysis.wordTokens($"text").as("syms"))
      .filter(size($"syms") >= 2)
      .persist()
    t("corpus materialize")(corpus.count())
    def pairsOf(syms: org.apache.spark.sql.Column) =
      when(size(syms) >= 2,
        transform(sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("l"),
            element_at(syms, i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
    for (rep <- 1 to 3)
      t(s"argmax job (rep$rep)") {
        corpus.select(explode(pairsOf($"syms")).as("p"))
          .groupBy($"p.l".as("l"), $"p.r".as("r"))
          .agg(count(lit(1)).as("cnt"))
          .filter($"cnt" >= 2)
          .orderBy($"cnt".desc, $"l".asc, $"r".asc).limit(1)
          .collect()
      }
    for (rep <- 1 to 3) {
      import org.apache.spark.sql.graft.ColumnBridge
      val merged = corpus.withColumn("syms",
        ColumnBridge.column(graft.functions.BpeMergeOne(
          ColumnBridge.expression($"syms"), "x", "y"))).persist()
      t(s"rewrite+persist (rep$rep)")(merged.count())
      merged.unpersist()
    }
    def argmax() = corpus.select(explode(pairsOf($"syms")).as("p"))
      .groupBy($"p.l".as("l"), $"p.r".as("r"))
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= 2)
      .orderBy($"cnt".desc, $"l".asc, $"r".asc).limit(1)
      .collect()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (rep <- 1 to 3) t(s"argmax AQE off (rep$rep)")(argmax())
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    for (rep <- 1 to 3) t(s"argmax AQEoff sp=4 (rep$rep)")(argmax())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    for (rep <- 1 to 3) t(s"argmax AQE on sp=4 (rep$rep)")(argmax())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    println("[probe] distinct pairs: " + corpus
      .select(explode(pairsOf($"syms")).as("p")).select($"p.l", $"p.r")
      .distinct().count())
    spark.stop()
  }
}
