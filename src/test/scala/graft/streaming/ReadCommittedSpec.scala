package graft.streaming

import graft.SparkSpec
import graft.functions.GazetteUuid
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class ReadCommittedSpec extends SparkSpec {

  private def uuidHex(producer: Byte, clock: Long, flags: Int): String = {
    val p = Array[Byte](1, 2, 3, 4, 5, producer)
    GazetteUuid.build(p, clock, flags).map("%02X".format(_)).mkString
  }

  test("csv framing: column 0 carries the UUID (csv_framing.go:29-81)") {
    import spark.implicits._
    val rows = Seq(
      s"${uuidHex(9, 100, 0)},alpha,1",
      s"${uuidHex(9, 100, 0)},alpha-dup,1", // duplicate clock → dropped
      s"${uuidHex(9, 200, 0)},beta,2")
    val env = rows.zipWithIndex.map { case (p, i) =>
      ("j", i.toLong * 100, i.toLong * 100 + 100, p)
    }.toDF("journal", "begin", "end", "payload")
    val seq = ReadCommitted.fromCsvFraming(env)
    val committed = Sequencer.sequenceBatch(seq).collect().sortBy(_.begin)
    assert(committed.map(_.clock).toSeq == Seq(100L, 200L))
    assert(committed.map(_.payload.split(",")(1)).toSeq == Seq("alpha", "beta"))
  }

  test("malformed uuids drop instead of poison-pilling the decode") {
    import spark.implicits._
    // Missing uuid field, non-hex uuid, short uuid, and one valid row:
    // the first three must DROP (a null/undersized unhex would fail the
    // non-nullable SeqEnvelope.clock or the producer extraction, and a
    // streaming replay would fail identically forever).
    val rows = Seq(
      """{"v":"no-uuid"}""",
      """{"uuid":"zzzz","v":"non-hex"}""",
      """{"uuid":"aabb","v":"short"}""",
      s"""{"uuid":"${uuidHex(7, 50, 0)}","v":"good"}""")
    val env = rows.zipWithIndex.map { case (p, i) =>
      ("j", i.toLong * 10, i.toLong * 10 + 10, p)
    }.toDF("journal", "begin", "end", "payload")
    val out = ReadCommitted.fromJsonFraming(env).collect()
    assert(out.length == 1 && out(0).clock == 50L, out.mkString(","))
    // Fixed framing: a payload shorter than one UUID likewise drops.
    val binEnv = Seq(("j", 0L, 3L, "ab".getBytes("UTF-8")))
      .toDF("journal", "begin", "end", "payload")
    assert(ReadCommitted.fromFixedFraming(binEnv).collect().isEmpty)
  }

  test("fixed framing: committed bodies round-trip a binary journal") {
    import spark.implicits._
    import graft.sources.Journal
    val root = java.nio.file.Files.createTempDirectory("rc-fixed").toString
    def frame(producer: Byte, clock: Long, flags: Int, body: Array[Byte]): Array[Byte] = {
      val p = Array[Byte](1, 2, 3, 4, 5, producer)
      GazetteUuid.build(p, clock, flags) ++ body
    }
    // A txn span (CONTINUE, CONTINUE, ACK) then an uncommitted CONTINUE
    // and an OUTSIDE message from another producer — the reference's
    // ReadCommittedIter scenario (message/reader.go:126-162) over the
    // binary framing. Body bytes are non-UTF8 on purpose: the committed
    // path must be byte-lossless.
    val binBody = Array[Byte](0, -1, -128, 127, 0, 13, 10)
    val payloads: Seq[Array[Byte]] = Seq(
      frame(7, 10, Sequencer.ContinueTxn, "alpha".getBytes("UTF-8")),
      frame(7, 11, Sequencer.ContinueTxn, binBody),
      frame(7, 12, Sequencer.AckTxn, Array.empty[Byte]), // commits 10, 11
      frame(7, 13, Sequencer.ContinueTxn, "orphan".getBytes("UTF-8")),
      frame(9, 20, Sequencer.OutsideTxn, "solo".getBytes("UTF-8")))
    Journal.appendFramed(payloads.toDF("payload").coalesce(1), root, "rc/fx", "gz")
    val out = ReadCommitted.committedFramed(
        Journal.readFramed(spark, root, "rc/fx").toDF())
      .select($"begin", $"body").as[(Long, Array[Byte])]
      .collect().sortBy(_._1)
    assert(out.map(_._2.toSeq).toSeq ==
      Seq("alpha".getBytes("UTF-8").toSeq, binBody.toSeq,
        "solo".getBytes("UTF-8").toSeq))
  }

  test("committedJson: txn spans commit only on ACK, ACK rows carry no data") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("v", LongType)))
    def pay(producer: Byte, clock: Long, flags: Int, v: Long): String =
      s"""{"v":$v,"uuid":"${uuidHex(producer, clock, flags)}"}"""
    val rows = Seq(
      pay(1, 10, Sequencer.ContinueTxn, 100),
      pay(1, 11, Sequencer.ContinueTxn, 101),
      pay(1, 12, Sequencer.AckTxn, -1),       // commits 100, 101
      pay(1, 13, Sequencer.ContinueTxn, 102)) // uncommitted — dropped in batch
    val env = rows.zipWithIndex.map { case (p, i) =>
      ("j", i.toLong * 100, i.toLong * 100 + 100, p)
    }.toDF("journal", "begin", "end", "payload")
    val out = ReadCommitted.committedJson(env, schema)
    assert(out.select($"v").as[Long].collect().sorted.toSeq == Seq(100L, 101L))
  }
}
