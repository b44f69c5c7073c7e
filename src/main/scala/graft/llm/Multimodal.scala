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
  * The decoder is REAL for two public trivial containers — Windows BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER) and RIFF/WAVE PCM — parsed
  * header-level in pure JVM code (`decode` sniffs the container magic and
  * walks the actual byte layout). Payloads in any other format fall back to
  * `decodeFallback`, which derives deterministic pseudo-features from the
  * bytes (no codec libraries for richer formats exist in this environment;
  * the fallback is the documented honest simplification, confined to opaque
  * formats). Schema, batching, partition spread, frame sampling, and the
  * output contract are identical on both paths.
  *
  * Scale notes: payload bytes never hit the driver; `repartitionForDecode`
  * spreads decode cost by doc-id hash so a skewed source file doesn't pin one
  * executor; features are narrow rows so the expensive binary column drops
  * out of the plan immediately after extraction (column pruning downstream).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded features. For images: (width, height, n_frames=1). For audio the
    * same three slots carry (sample_rate, channels, n_samples) — one narrow
    * schema for every modality, the column meaning keyed by `media_type`.
    */
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

  /** Synthesize REAL container payloads from the documents corpus: even
    * doc_ids become 24-bpp BMPs, odd become PCM-16 WAVs, dimensions derived
    * deterministically from the text's byte length — so the bytes on the wire
    * are genuine containers the decoder must actually parse, while the
    * expected features remain oracle-computable from `strlen(text)` alone.
    * Generation runs on executors (flatMap over the distributed rows); payload
    * bytes never visit the driver.
    */
  def asRealMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs).map { m =>
      val len = m.content.length
      if (m.doc_id % 2 == 0)
        MediaRow(m.doc_id, "bmp", encodeBmp(4 + len % 32, 4 + (len / 32) % 32))
      else
        MediaRow(m.doc_id, "wav", encodeWavPcm16(8000, 1 + len % 2, 50 + len % 200))
    }
  }

  /** Spread decode work across executors by doc-id hash (decode cost is per
    * payload, not per byte-of-source-split).
    */
  def repartitionForDecode(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    media.repartition(partitions, col("doc_id"))

  // ---- real container codecs (public formats: Windows BMP, RIFF/WAVE) ----

  private def le(b: Array[Byte]) =
    java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  /** Synthesize a complete, valid 24-bpp BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + 4-byte-padded pixel rows) with a deterministic pixel
    * pattern. Public format; layout per the Windows bitmap spec.
    */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val bb = java.nio.ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)                    // reserved, pixel offset
    bb.putInt(40).putInt(width).putInt(height)               // BITMAPINFOHEADER
      .putShort(1).putShort(24)                              // planes, bpp
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)  // BI_RGB, size, 72 dpi
      .putInt(0).putInt(0)                                   // palette
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        bb.put(((x * 7 + y * 13) & 0xFF).toByte)
          .put(((x * 3 + y * 5) & 0xFF).toByte)
          .put(((x + y) & 0xFF).toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { bb.put(0.toByte); p += 1 }
      y += 1
    }
    bb.array()
  }

  /** Synthesize a complete, valid RIFF/WAVE PCM-16 payload with a
    * deterministic sample pattern. Public format; canonical 44-byte header.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0)
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)                // PCM, channels
      .putInt(sampleRate).putInt(sampleRate * blockAlign)    // rate, byte rate
      .putShort(blockAlign.toShort).putShort(16)             // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples * channels) {
      bb.putShort(((i * 2654435761L) & 0x7FFF).toShort)
      i += 1
    }
    bb.array()
  }

  /** Strict BMP sniff: magic bytes AND the header-declared file size must
    * equal the payload length — an arbitrary blob starting with "BM" cannot
    * satisfy both, so opaque payloads never mis-route into the BMP parser.
    */
  private[llm] def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte && le(b).getInt(2) == b.length

  private[llm] def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE"

  private def decodeBmp(b: Array[Byte]): (Int, Int, Int) = {
    val bb = le(b)
    val w = bb.getInt(18)
    val h = bb.getInt(22) // negative = top-down row order; magnitude is the height
    require(w > 0 && h != 0, s"corrupt BMP header: ${w}x$h")
    (w, math.abs(h), 1)
  }

  /** Walk RIFF chunks for `fmt ` and `data` — the format permits LIST/fact
    * chunks between them, so a fixed-offset read would be wrong on real files.
    */
  private def decodeWav(b: Array[Byte]): (Int, Int, Int) = {
    val bb = le(b)
    var off = 12
    var sampleRate = -1; var channels = -1; var blockAlign = -1; var dataSize = -1
    while (off + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= b.length, s"corrupt WAV chunk $id at $off")
      if (id == "fmt ") {
        channels = bb.getShort(off + 10).toInt
        sampleRate = bb.getInt(off + 12)
        blockAlign = bb.getShort(off + 20).toInt
      } else if (id == "data") dataSize = size
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0 && blockAlign > 0 && dataSize >= 0,
      "WAV missing fmt/data chunk")
    (sampleRate, channels, dataSize / blockAlign)
  }

  /** Fallback for opaque payloads (no codec in this environment):
    * deterministic pseudo-dimensions derived from the byte length.
    */
  private def decodeFallback(content: Array[Byte]): (Int, Int, Int) = {
    val len = content.length
    (16 + (len % 64), 16 + ((len / 64) % 64), 1 + (len / 256))
  }

  /** Container-sniffing decode: REAL header parse for BMP and WAV payloads,
    * deterministic fallback for anything else. A payload that sniffs as a
    * real container but is structurally corrupt FAILS (require), never
    * silently falls back — wrong features are worse than a loud error.
    */
  def decode(content: Array[Byte]): (Int, Int, Int) =
    if (isBmp(content)) decodeBmp(content)
    else if (isWav(content)) decodeWav(content)
    else decodeFallback(content)

  /** Batched per-partition feature extraction (the mapInPandas analog). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        // real decoders initialize per batch here (codec handles, buffers)
        batch.iterator.map { m =>
          val (w, h, frames) = decode(m.content)
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

    // Fallback-path decoder output for opaque payloads — the fallback formula
    // is plain arithmetic over byte length, so its dims are oracle-checkable
    "mm_decode_dims" -> ((s, dir) =>
      extractFeatures(asMedia(Tables.documents(s, dir)))
        .toDF().select("doc_id", "width", "height", "n_frames").orderBy("doc_id")),

    // REAL codec path: genuine BMP/WAV containers synthesized per doc, dims
    // parsed back from the actual byte layout (header fields, RIFF chunk
    // walk); the oracle recomputes the expected dims from strlen(text)
    "mm_decode_real" -> ((s, dir) =>
      extractFeatures(repartitionForDecode(asRealMedia(Tables.documents(s, dir)), 8))
        .toDF().select("doc_id", "media_type", "width", "height", "n_frames")
        .orderBy("doc_id"))
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
    "mm_decode_real" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + strlen(text) % 32
                     ELSE 8000 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + (strlen(text) // 32) % 32
                     ELSE 1 + strlen(text) % 2 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1
                     ELSE 50 + strlen(text) % 200 END AS INT) AS n_frames
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
