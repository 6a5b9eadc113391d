package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** M1-M3 mapping + E2 stamping coverage (reference
  * message/routines.go:62-154): the mappings are pure columns, so each
  * property is checked against a driver-side Scala reference.
  */
class PublisherSpec extends SparkSpec {

  private val journals = (0 until 8).map(i => s"topic/part-$i")

  private def fnv(s: String): Long =
    graft.functions.Hashes.fnv1a32(s.getBytes("UTF-8"))

  test("moduloMapping matches the Scala FNV reference and is stable") {
    import spark.implicits._
    val keys = (1 to 200).map(i => s"key-$i")
    val out = keys.toDF("k")
      .select($"k", Publisher.moduloMapping($"k", journals).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      assert(out(k) == journals((fnv(k) % journals.size).toInt), s"key $k")
    }
  }

  test("rendezvousMapping = highest-random-weight, first-max tie rule") {
    import spark.implicits._
    val keys = (1 to 300).map(i => s"k$i")
    val out = keys.toDF("k")
      .select($"k", Publisher.rendezvousMapping($"k", journals).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      // Scala reference: strict > keeps the FIRST maximum in list order.
      val want = journals.maxBy(j => (fnv(k) ^ fnv(j), -journals.indexOf(j)))
      assert(out(k) == want, s"key $k")
    }
  }

  test("rendezvousMapping remaps ONLY the removed journal's keys") {
    import spark.implicits._
    val keys = (1 to 300).map(i => s"k$i")
    val before = keys.toDF("k")
      .select($"k", Publisher.rendezvousMapping($"k", journals).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val removed = journals.head
    val after = keys.toDF("k")
      .select($"k", Publisher.rendezvousMapping($"k", journals.tail).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    keys.foreach { k =>
      if (before(k) != removed)
        assert(after(k) == before(k), s"key $k moved needlessly")
      else assert(journals.tail.contains(after(k)))
    }
  }

  test("rendezvousMapping stays O(N): 64 journals plan and run") {
    // The previous when-chain fold built an O(2^N) expression tree —
    // 64 journals would hang the driver before any data moved.
    import spark.implicits._
    val many = (0 until 64).map(i => s"j$i")
    val n = Seq("a", "b", "c").toDF("k")
      .select(Publisher.rendezvousMapping($"k", many).as("j"))
      .collect().map(_.getString(0))
    assert(n.forall(many.contains))
  }

  test("randomMapping picks from the journal list, seeded-reproducibly") {
    import spark.implicits._
    val df = (1 to 50).toDF("i")
    val a = df.select(Publisher.randomMapping(journals).as("j")).collect().map(_.getString(0))
    val b = df.select(Publisher.randomMapping(journals).as("j")).collect().map(_.getString(0))
    assert(a.forall(journals.contains))
    assert(a.toSeq == b.toSeq, "same seed must reproduce the assignment")
  }

  test("stampUuids round-trips producer/clock/flags through the UUID family") {
    import spark.implicits._
    import graft.functions.F
    val rows = Seq((1L, 100L, 2), (2L, 200L, 0)).toDF("p", "c", "f")
      .withColumn("prod", lpad(hex($"p"), 12, "0"))
    val stamped = Publisher.stampUuids(rows, unhex($"prod"), $"c", $"f")
    val back = stamped.select(
        hex(F.uuid_producer($"uuid")).as("prod2"), $"prod",
        F.uuid_clock($"uuid").as("c2"), $"c",
        F.uuid_flags($"uuid").as("f2"), $"f")
      .collect()
    back.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getInt(4) == r.getInt(5))
    }
  }
}
