package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Engine.local: the library front door wires the extension and the
  * engine's session conventions. Same fresh-session discipline as
  * SelectorExtensionSpec: clear active/default so the builder makes a
  * new SparkSession over the shared context, and never stop() it.
  */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    Engine.local(2)
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("local session has AQE, UTC, and the selector extension") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    // matches_selector resolves as a SQL function (extension-injected,
    // not session-registered).
    import spark.implicits._
    val df = Seq(Map("app" -> "nginx", "env" -> "prod")).toDF("labels")
    val n = df
      .filter("matches_selector(labels, 'app=nginx, env in (prod, stage)')")
      .count()
    assert(n == 1)
  }
}
