package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Hive-style path-postfix partitioning of fragments
  * (path_postfix_template, protocol.proto:248-262).
  */
class JournalPartitionSpec extends SparkSpec {

  test("append with postfixCol lays fragments under date= subdirs; reads see all") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-part").toString
    val df = Seq(
      ("""{"v":1}""", "date=2024-01-01"),
      ("""{"v":2}""", "date=2024-01-01"),
      ("""{"v":3}""", "date=2024-01-02"))
      .toDF("payload", "postfix").coalesce(1)

    val frags = Journal.append(df, root, "pj", "none", postfixCol = Some("postfix"))
    assert(frags.size == 2)
    assert(frags.forall(f => f.path.contains("date=2024-01-0")))
    // offsets are journal-global and contiguous across postfix dirs
    assert(frags.sortBy(_.begin).sliding(2).forall {
      case Seq(a, b) => a.end == b.begin
      case _ => true
    })
    assert(Files.isDirectory(Paths.get(root, "pj", "date=2024-01-01")))

    // recursive listing + batch read sees every record exactly once
    val envs = Journal.read(spark, root, "pj").collect().sortBy(_.begin)
    assert(envs.map(_.payload).toSeq ==
      Seq("""{"v":1}""", """{"v":2}""", """{"v":3}"""))

    // a second append continues from the global head
    val frags2 = Journal.append(
      Seq(("""{"v":4}""", "date=2024-01-02")).toDF("payload", "postfix").coalesce(1),
      root, "pj", "none", postfixCol = Some("postfix"))
    assert(frags2.head.begin == frags.map(_.end).max)
    assert(Journal.read(spark, root, "pj").count() == 4)
  }
}
