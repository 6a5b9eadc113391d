package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file per scale-factor directory. At cluster
  * scale these would be multi-file datasets; `spark.read.parquet` handles
  * both identically, and all downstream operators are written against the
  * logical schema only.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Number of data files backing a table — a cheap proxy for scan
    * parallelism (single-file local testdata scans are one task; real
    * tables have many part files). Filesystem-only: no plan compile.
    */
  def fileCount(dir: String, name: String): Int = {
    val p = Paths.get(s"$dir/$name.parquet")
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.count(f =>
        f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    } else if (Files.exists(p)) 1
    else 0
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
