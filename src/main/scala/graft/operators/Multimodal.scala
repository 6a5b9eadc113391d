package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travels as an
  * opaque `binary` column plus typed metadata, processed in executor-side
  * batches.
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * codec libraries): `decodeStub` derives deterministic pseudo-features
  * from the raw bytes. Everything around it — the schema contract, the
  * per-partition batch iteration (the Scala analog of `mapInPandas`:
  * one buffer of `batchSize` rows at a time, amortizing per-batch setup
  * such as a model handle or codec context), partitioning, and the
  * frame-sampling layout — is real and tested.
  *
  * Scale notes: feature extraction is a narrow map (no shuffle); media
  * blobs should ride in their own column so Parquet column pruning skips
  * them when queries touch only metadata; `repartitionBySize` bounds
  * task payloads when blob sizes are skewed.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Deterministic fake media bytes derived from a text column — stands
    * in for real image/audio payloads in tests and the driver gate.
    */
  def synthesize(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("fake/raw").as("format"),
      (length(col(textCol)) % 640).cast("int").as("width"),
      (length(col(textCol)) % 480).cast("int").as("height"))

  /** STUB decoder: a real deployment replaces this with an image/audio
    * codec invocation (??? in spirit). Deterministic: features are pure
    * byte statistics so tests and the DuckDB oracle can mirror them.
    */
  private def decodeStub(media: Array[Byte]): (Long, Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < media.length) { sum += media(i) & 0xff; i += 1 }
    (media.length.toLong, sum, if (media.isEmpty) 0L else (media(0) & 0xff).toLong)
  }

  /** Size-aware repartitioning for blob columns: choose the partition
    * COUNT from the data (ceil(total blob bytes / targetBytes)) so each
    * task's expected payload is ~targetBytes regardless of corpus
    * growth — a fixed partition count silently fattens tasks at 100 TB
    * until executors OOM. One cheap agg (sum of lengths, pruned to the
    * blob column) + one round-robin exchange; indivisible oversized
    * blobs still travel whole, everything else balances.
    */
  def repartitionBySize(media: DataFrame, targetBytes: Long,
      blobCol: String = "media"): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // sum() over zero rows (or an all-NULL blob column) is NULL.
    val row = media.select(sum(length(col(blobCol)).cast("long"))).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    media.repartition(parts)
  }

  /** Batched feature extraction over the media column. Rows are buffered
    * into `batchSize` groups per partition — the seam where a real
    * implementation hands a whole batch to a codec/model runtime — then
    * flattened back to rows of (doc_id, n_bytes, byte_sum, first_byte,
    * n_frames).
    */
  def extractFeatures(media: DataFrame, frameBytes: Int = 256, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("byte_sum", LongType),
      StructField("first_byte", LongType),
      StructField("n_frames", LongType)))
    val rdd = media.select(col("doc_id"), col("media")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary: real codecs initialize once per batch here
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val (n, sum, first) = decodeStub(bytes)
            Row(id, n, sum, first, (n + frameBytes - 1) / frameBytes)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: slice the blob into fixed-size frames and keep every
    * `stride`-th one — the video-keyframe-sampling layout, as a generator
    * (one output row per sampled frame).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = media.select(col("doc_id"), col("media")).rdd.flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val nFrames = (bytes.length + frameBytes - 1) / frameBytes
      (0 until nFrames by stride).map { f =>
        val from = f * frameBytes
        Row(id, f, java.util.Arrays.copyOfRange(bytes, from, math.min(from + frameBytes, bytes.length)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
