package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column handling (north-star extension): media payloads as
  * opaque `binary` columns with typed metadata, and per-partition batched
  * decode / feature-extraction.
  *
  * Spark-side design (all real): schema (binary content + metadata struct),
  * partition-batched processing via `mapPartitions` over a typed Dataset
  * (the JVM analog of `mapInPandas` — one iterator per partition, so a real
  * decoder would amortize model/codec init per partition, not per row), and
  * deterministic output schema for downstream relational ops.
  *
  * The actual byte decode is a STUB — image/audio codecs are not in this
  * container. `FakeDecoder` derives deterministic pseudo-features from the
  * bytes; swap its body for a real codec without touching any plumbing.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                           feature: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long)

  /** STUB decoder — deterministic fake standing in for an image/audio codec.
    * Real implementation would parse `content` (e.g. JPEG/PNG headers for
    * width/height, pixel decode for features). */
  object FakeDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.content.length
      // ??? real codec goes here; deterministic stand-ins below
      val width = n % 640
      val height = (n * 7) % 480
      val feature = Array.tabulate(4) { i =>
        if (n == 0) 0f
        else r.content(i % n).toFloat / (i + 1).toFloat
      }
      MediaFeatures(r.doc_id, n, width, height, feature)
    }
  }

  /** Model a media table: text bytes stand in for image payloads; metadata
    * carried as a typed struct alongside the opaque binary. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Partition-batched decode: binary → features. One decoder instance per
    * partition (init cost amortized), streaming iterator (no partition
    * materialization), typed output schema. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real codec init would happen here, once per partition
        rows.map(FakeDecoder.decode)
      }
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          n_bytes_in: Int, checksum: Long)

  /** Partition-batched resize: binary → fixed-dims binary. The STUB
    * "resample" nearest-neighbor-samples source bytes onto a width x height
    * grid (`??? real pixel resample goes here`); the plumbing — typed
    * partition iterator, per-partition codec scope, fixed output schema
    * with a content checksum for verification — is the real part. */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int = 8, height: Int = 8): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real resampler init would happen here, once per partition
        rows.map { r =>
          val n = r.content.length
          val px = width * height
          // ??? real codec+resample; deterministic nearest-neighbor stand-in
          val stride = math.max(1, n / px)
          var checksum = 0L
          var i = 0
          while (i < px) {
            if (n > 0) checksum += (r.content((i * stride) % n) & 0xff).toLong
            i += 1
          }
          ResizedMedia(r.doc_id, width, height, n, checksum)
        }
      }
  }

  /** Frame sampling: one row per sampled frame (every `stride` bytes stands
    * in for every Nth video frame). Declarative explode — no UDF. */
  def sampleFrames(media: DataFrame, stride: Int = 100): DataFrame =
    media.select(col("doc_id"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), ((col("n_bytes") - 1) / stride).cast("int"))))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * stride).cast("bigint").as("byte_offset"))
      .orderBy(col("doc_id"), col("frame_idx"))

  // --------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_features" -> ((s, d) => {
      import s.implicits._
      extractFeatures(s, mediaTable(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"))
        .orderBy(col("doc_id"))
    }),
    "q41_media_frames" -> ((s, d) => sampleFrames(mediaTable(Tables.documents(s, d)))),
    "q93_media_resize" -> ((s, d) => {
      import s.implicits._
      resize(s, mediaTable(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_bytes_in"), col("checksum"))
        .orderBy(col("doc_id"))
    })
  )

  /** Oracles mirror the deterministic stub arithmetic (the plumbing — binary
    * length, partition-batched map, explode — is what's being verified;
    * feature vectors are stub-only and checked in the spec instead). */
  def oracles: Map[String, String] = Map(
    "q40_media_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_media_frames" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(f * 100 AS BIGINT) AS byte_offset
        |FROM documents, unnest(range(0, (octet_length(encode(text)) - 1) // 100 + 1)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // nearest-neighbor stub resample onto an 8x8 grid: byte at
    // (i*stride) % n for pixel i, stride = max(1, n div 64); ASCII corpus
    // so ord(char) == byte value
    "q93_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |    greatest(1, octet_length(encode(text)) // 64) AS stride
        |  FROM documents)
        |SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(n AS INT) AS n_bytes_in,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE
        |    list_sum([ord(substr(text, ((i * stride) % n) + 1, 1))
        |              for i in range(0, 64)]) END AS BIGINT) AS checksum
        |FROM m ORDER BY doc_id""".stripMargin
  )
}
