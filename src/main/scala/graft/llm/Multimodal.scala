package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode/feature-extraction runs as a batched per-partition pass over a typed
  * Dataset — the Scala analog of `mapInPandas` (iterator-of-batches in,
  * iterator-of-batches out), so a real decoder drops in without touching the
  * pipeline shape.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic pseudo-features from the
  * bytes. Everything around it — schema, batching, partition spread,
  * frame sampling, output contract — is real and tested.
  *
  * Scale notes: payload bytes never hit the driver; `repartitionForDecode`
  * spreads decode cost by doc-id hash so a skewed source file doesn't pin one
  * executor; features are narrow rows so the expensive binary column drops
  * out of the plan immediately after extraction (column pruning downstream).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
      content_md5: String, width: Int, height: Int, n_frames: Int)

  /** Batch size for the per-partition decode loop (the `mapInPandas` batch
    * shape: decoders amortize setup across a batch, not per record).
    */
  val DecodeBatchSize = 64

  /** Wrap a text corpus as fake media payloads (UTF-8 bytes as "image"). */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), lit("image").as("media_type"),
      encode(col("text"), "UTF-8").as("content")).as[MediaRow]
  }

  /** Spread decode work across executors by doc-id hash (decode cost is per
    * payload, not per byte-of-source-split).
    */
  def repartitionForDecode(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    media.repartition(partitions, col("doc_id"))

  /** STUB decoder: where a real implementation would call an image/audio
    * codec (`???` in spirit), this derives deterministic pseudo-dimensions
    * from the payload so the pipeline is testable end-to-end.
    */
  private def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val len = content.length
    val width = 16 + (len % 64)            // fake "decoded" width
    val height = 16 + ((len / 64) % 64)    // fake "decoded" height
    val frames = 1 + (len / 256)           // fake frame count (video-ish)
    (width, height, frames)
  }

  /** Batched per-partition feature extraction (the mapInPandas analog). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        // real decoders initialize per batch here (codec handles, buffers)
        batch.iterator.map { m =>
          val (w, h, frames) = decodeStub(m.content)
          val md5hex = java.security.MessageDigest.getInstance("MD5")
            .digest(m.content).map("%02x".format(_)).mkString
          MediaFeatures(m.doc_id, m.media_type, m.content.length.toLong, md5hex, w, h, frames)
        }
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload (the
    * video-frame-sampling shape; chunking is real, frame decode is the stub).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, math.ceil(m.content.length.toDouble / frameBytes).toInt)
      (0 until nFrames by stride).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, m.content.length)
        val frame = if (from >= m.content.length) Array.empty[Byte]
          else m.content.slice(from, until)
        (m.doc_id, i, frame.length.toLong)
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  val queries: Map[String, Q] = Map(
    // Decode pipeline end-to-end; md5/byte-length are DuckDB-checkable since
    // the payload is the UTF-8 text
    "mm_decode_features" -> ((s, dir) =>
      extractFeatures(repartitionForDecode(asMedia(Tables.documents(s, dir)), 8))
        .toDF()
        .select("doc_id", "media_type", "byte_len", "content_md5")
        .orderBy("doc_id")),

    // Frame sampling contract: per-doc sampled-frame count and bytes
    "mm_frame_sample" -> ((s, dir) =>
      sampleFrames(asMedia(Tables.documents(s, dir)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sampled_frames"), sum(col("frame_bytes")).as("sampled_bytes"))
        .orderBy("doc_id")),

    // Stub decoder output — the stub formula is plain arithmetic over byte
    // length, so even the fake dims are oracle-checkable
    "mm_decode_dims" -> ((s, dir) =>
      extractFeatures(asMedia(Tables.documents(s, dir)))
        .toDF().select("doc_id", "width", "height", "n_frames").orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "mm_decode_features" ->
      """SELECT doc_id, 'image' AS media_type, CAST(strlen(text) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",
    "mm_decode_dims" ->
      """SELECT doc_id,
           CAST(16 + strlen(text) % 64 AS INT) AS width,
           CAST(16 + (strlen(text) // 64) % 64 AS INT) AS height,
           CAST(1 + strlen(text) // 256 AS INT) AS n_frames
         FROM documents ORDER BY doc_id""",
    "mm_frame_sample" ->
      """WITH f AS (
           SELECT doc_id, strlen(text) AS len,
                  GREATEST(1, CAST(CEIL(strlen(text) / 256.0) AS INT)) AS n_frames
           FROM documents),
         idx AS (
           SELECT doc_id, len, UNNEST(range(0, n_frames, 4)) AS i FROM f)
         SELECT doc_id, COUNT(*) AS n_sampled_frames,
                CAST(SUM(LEAST(256, len - i * 256)) AS BIGINT) AS sampled_bytes
         FROM idx GROUP BY doc_id ORDER BY doc_id"""
  )
}
