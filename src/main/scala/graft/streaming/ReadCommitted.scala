package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.F

/** The read-committed message path end-to-end (SURVEY §3.2):
  * journal envelopes → framed payload decode → UUID metadata extraction →
  * Sequencer → committed, typed records.
  *
  * Framing follows the reference's content-type conventions (§1.2):
  *  - ndjson: payload is a JSON object with a `uuid` hex field
  *  - csv: column 0 is the UUID (message/csv_framing.go:29-81)
  */
object ReadCommitted {

  /** Decode envelope rows (journal, begin, end, payload) whose payload is
    * ndjson carrying a hex `uuid` field, into SeqEnvelopes for the
    * Sequencer. `unhex` recovers the 16 UUID bytes; producer id is the
    * hex of bytes [10,16).
    */
  def fromJsonFraming(envelopes: DataFrame): Dataset[Sequencer.SeqEnvelope] =
    toSeqEnvelopes(envelopes, get_json_object(col("payload"), "$.uuid"))

  /** CSV framing: column 0 is the hex UUID, the rest is the record. */
  def fromCsvFraming(envelopes: DataFrame): Dataset[Sequencer.SeqEnvelope] =
    toSeqEnvelopes(envelopes, split(col("payload"), ",").getItem(0))

  /** ONE copy of the envelope → SeqEnvelope metadata projection; the
    * framings differ only in how the UUID hex is extracted.
    *
    * Malformed rows DROP here rather than poison-pilling the query: a
    * payload with a missing / non-hex / short `uuid` yields a null or
    * undersized `unhex`, and downstream that is a null in SeqEnvelope's
    * primitive `clock` (deserialization throws) or an
    * out-of-range read in the producer extraction — either fails the
    * micro-batch, and every checkpoint-recovery replay fails the same
    * way (the [[StreamingOrder]] poison-pill lesson). A skipped row is
    * just a skipped row. (The reference's sequencer passes zero-UUID
    * messages straight through as untracked, message/sequencer.go —
    * also non-fatal; dropping keeps the committed view to rows that
    * actually carry the dedup metadata this path exists to read.)
    */
  private def toSeqEnvelopes(envelopes: DataFrame,
      uuidHex: org.apache.spark.sql.Column): Dataset[Sequencer.SeqEnvelope] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .withColumn("u", unhex(uuidHex))
      .filter($"u".isNotNull && length($"u") === 16)
      .select(
        $"journal", $"begin", $"end",
        hex(F.uuid_producer($"u")).as("producer"),
        F.uuid_clock($"u").as("clock"),
        F.uuid_flags($"u").as("flags"),
        $"payload")
      .as[Sequencer.SeqEnvelope]
  }

  /** Fixed binary framing (`application/x-protobuf-fixed`,
    * message/fixed_framing.go:26-148): the payload's first 16 bytes are
    * the message UUID — the binary analog of the reference's
    * `Message.GetUUID()` contract that lets `ReadCommittedIter` work
    * for any registered framing (message/reader.go:126-162) — and the
    * remainder is the opaque body. The body rides through the
    * String-typed sequencer state as base64 (lossless for arbitrary
    * bytes); `committedFramed` decodes it back.
    */
  def fromFixedFraming(envelopes: DataFrame): Dataset[Sequencer.SeqEnvelope] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .withColumn("u", substring(col("payload"), 1, 16))
      // Same malformed-row contract as toSeqEnvelopes: a payload
      // shorter than one UUID cannot be fixed-framed — drop, don't wedge.
      .filter(col("u").isNotNull && length(col("u")) === 16)
      .select(
        col("journal"), col("begin"), col("end"),
        hex(F.uuid_producer(col("u"))).as("producer"),
        F.uuid_clock(col("u")).as("clock"),
        F.uuid_flags(col("u")).as("flags"),
        base64(expr("substring(payload, 17, 2147483647)")).as("payload"))
      .as[Sequencer.SeqEnvelope]
  }

  /** Committed binary records over fixed-framed envelopes (the
    * protobuf-client path): sequence, drop ACK carriers, return
    * (journal, begin, end, body) with the body restored to binary.
    */
  def committedFramed(envelopes: DataFrame): DataFrame = {
    val seq = fromFixedFraming(envelopes)
    val committed =
      if (envelopes.isStreaming) Sequencer.sequenceStream(seq)
      else Sequencer.sequenceBatch(seq)
    committed.toDF()
      .filter(col("flags") =!= Sequencer.AckTxn) // ACKs carry no app data
      .select(col("journal"), col("begin"), col("end"),
        unbase64(col("payload")).as("body"))
  }

  /** Committed typed records: sequence, drop ACK carriers, decode the
    * JSON payload with `schema`. Batch or streaming by the input's mode.
    */
  def committedJson(envelopes: DataFrame, schema: StructType): DataFrame = {
    val seq = fromJsonFraming(envelopes)
    val committed =
      if (envelopes.isStreaming) Sequencer.sequenceStream(seq)
      else Sequencer.sequenceBatch(seq)
    committed.toDF()
      .filter(col("flags") =!= Sequencer.AckTxn) // ACKs carry no app data
      .select(col("journal"), col("begin"), col("end"),
        from_json(col("payload"), schema).as("record"))
      .select(col("journal"), col("begin"), col("end"), col("record.*"))
  }
}
