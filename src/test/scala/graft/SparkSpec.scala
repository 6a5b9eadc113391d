package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared across suites
}

object SparkSpec {
  lazy val session: SparkSession = {
    // GRAFT_TEST_MASTER=local-cluster[2,2,2048] runs the whole suite
    // across real executor JVMs (multi-process certification); default
    // stays local[4]. Executor classpath/module plumbing comes from
    // Engine.forkedExecutors — sbt forks the test JVM, so
    // java.class.path is the genuine test classpath.
    val master = sys.env.getOrElse("GRAFT_TEST_MASTER", "local[4]")
    var b = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (master.startsWith("local-cluster")) b = Engine.forkedExecutors(b, master)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
