package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the 100 TB fact-to-fact join strategy:
  * both tables pre-hashed into the same bucket count on the join key, so
  * the join runs with ZERO exchanges (each task joins bucket i against
  * bucket i). Own session: needs a warehouse dir + bucketing enabled.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketed")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.sources.bucketing.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("bucketed fact-fact join plans with zero exchanges") {
    import spark.implicits._
    val n = 10000
    val facts = (1 to n).map(i => (i.toLong % 500, s"o-$i", i * 1.5)).toDF("k", "tag", "v")
    val dims = (1 to n / 2).map(i => (i.toLong % 500, s"d-$i")).toDF("k", "name")

    // Both sides bucketed+sorted on the join key with the SAME bucket
    // count — the write-once cost that removes the per-query shuffle.
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("dims_b")

    val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    // row parity with the unbucketed join
    val expected = facts.join(dims, "k").count()
    assert(joined.count() == expected)

    // contrast: the same join over unbucketed parquet DOES exchange
    val dir = java.nio.file.Files.createTempDirectory("graft-unbucketed")
    facts.write.mode("overwrite").parquet(s"$dir/f")
    dims.write.mode("overwrite").parquet(s"$dir/d")
    val unbucketed = spark.read.parquet(s"$dir/f")
      .join(spark.read.parquet(s"$dir/d"), "k")
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
