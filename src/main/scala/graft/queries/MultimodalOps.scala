package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column pipeline queries: media synthesized deterministically
  * from document text (no codec libs in this container — see
  * operators.Multimodal scaladoc), batch feature extraction and frame
  * sampling with byte-exact DuckDB oracles.
  */
object MultimodalOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q32: batched feature extraction over binary media columns.
    "q32_multimodal_features" -> { (s, d) =>
      Multimodal.extractFeatures(
        Multimodal.synthesize(Tables.documents(s, d)))
    },

    // ---- q33: frame sampling (every 4th 256-byte frame), re-aggregated.
    "q33_frame_sample" -> { (s, d) =>
      import s.implicits._
      Multimodal.sampleFrames(
          Multimodal.synthesize(Tables.documents(s, d)), frameBytes = 256, stride = 4)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_sampled"),
          sum(octet_length($"frame")).as("bytes_sampled"))
    },

    // ---- q160: resize planning — shorter side to 224 px preserving
    // aspect, integer geometry + exact RGB buffer bytes (the pixel
    // resample is the decode-stub boundary; the plan is what batching
    // and size-aware repartitioning consume).
    "q160_resize_plan" -> { (s, d) =>
      Multimodal.resizePlan(
        Multimodal.synthesize(Tables.documents(s, d)), shorter = 224)
    }
  )

  def oracleSql: Map[String, String] = Map(
    // documents.text is pure ASCII here, so ascii(char) == byte value.
    "q32_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(list_aggregate(list_transform(range(1, length(text)+1),
        |    i -> ascii(text[i])), 'sum') AS BIGINT) AS byte_sum,
        |  CAST(ascii(text[1]) AS BIGINT) AS first_byte,
        |  (length(text) + 255) // 256 AS n_frames
        |FROM documents""".stripMargin,

    "q33_frame_sample" ->
      """SELECT doc_id,
        |  CAST(len(range(0, (length(text) + 255) // 256, 4)) AS BIGINT) AS n_sampled,
        |  CAST(list_aggregate(list_transform(range(0, (length(text) + 255) // 256, 4),
        |    f -> least(256, length(text) - f * 256)), 'sum') AS BIGINT) AS bytes_sampled
        |FROM documents""".stripMargin,

    "q160_resize_plan" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(length(text) % 640 AS BIGINT) AS w,
        |    CAST(length(text) % 480 AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, w, h,
        |  CAST((w * 224) // least(w, h) AS BIGINT) AS target_w,
        |  CAST((h * 224) // least(w, h) AS BIGINT) AS target_h,
        |  CAST(((w * 224) // least(w, h)) * ((h * 224) // least(w, h)) * 3
        |    AS BIGINT) AS out_bytes
        |FROM dims WHERE w > 0 AND h > 0""".stripMargin
  )
}
