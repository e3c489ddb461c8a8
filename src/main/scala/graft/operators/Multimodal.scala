package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryDef
import graft.sources.Tables._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata,
  * with decode / feature-extraction as a typed `mapPartitions` stage.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this container); everything around it — schema, encoders,
  * partition-batched iteration, column pruning before the opaque stage —
  * is the real production shape. Swap `decodeStub` for a real codec and
  * nothing else changes.
  *
  * Scale notes: the binary column is projected as late as possible; the
  * mapPartitions stage is narrow (no shuffle) and batch-friendly; feature
  * rows (small, fixed-width) are what flows into downstream joins.
  */
object Multimodal {

  /** binary payload + typed metadata (the multimodal "asset" row) */
  final case class Asset(asset_id: Long, modality: String, data: Array[Byte])

  /** fixed-width features extracted from the payload */
  final case class MediaFeatures(asset_id: Long, modality: String,
      n_bytes: Int, checksum: Long, width: Int, height: Int, frame_hex: String)

  /** Build the asset table: documents' text bytes stand in for media blobs;
    * modality is derived deterministically so the oracle can reproduce it. */
  def assets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("modality"),
      encode(col("text"), "UTF-8").as("data"))

  /** STUB decode: a real implementation would parse the codec here. The
    * fake derives every feature from the raw bytes deterministically. */
  private def decodeStub(a: Asset): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < a.data.length) { sum += a.data(i) & 0xff; i += 1 }
    MediaFeatures(
      asset_id = a.asset_id,
      modality = a.modality,
      n_bytes = a.data.length,
      checksum = sum,
      width = (sum % 640).toInt + 1,
      height = (sum % 480).toInt + 1,
      // hex of raw bytes, not a decoded string: exact for ANY payload (a
      // multibyte char straddling the window has no charset-safe twin)
      frame_hex = a.data.take(8).map(b => f"${b & 0xff}%02X").mkString)
  }

  /** The typed decode stage: partition-batched, no shuffle. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].mapPartitions(_.map(decodeStub)).toDF()
  }

  /** a sampled "frame" (byte window) of an asset's payload, as hex */
  final case class Frame(asset_id: Long, frame_no: Int, frame_hex: String)

  /** Frame sampling: up to `maxFrames` fixed-stride byte windows per
    * asset — the video-frame / audio-chunk sampling shape. Row-multiplying
    * flatMap, still narrow (no shuffle); a real codec would emit decoded
    * frames here instead of byte windows. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 16, maxFrames: Int = 3): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].flatMap { a =>
      (1 to maxFrames).iterator
        .filter(i => (i - 1) * frameBytes < a.data.length)
        .map { i =>
          val from = (i - 1) * frameBytes
          val until = math.min(from + frameBytes, a.data.length)
          Frame(a.asset_id, i,
            a.data.slice(from, until).map(b => f"${b & 0xff}%02X").mkString)
        }
    }.toDF()
  }

  /** STUB resize: byte-stride downsampling stands in for image resize —
    * a real codec would decode, scale, re-encode. Keeps the byte-in/
    * byte-out narrow-transform shape. */
  def resizeStub(data: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((data.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = data(i * factor); i += 1 }
    out
  }

  /** Resize stage over the asset table (typed, narrow, no shuffle). */
  def resizeAssets(assets: DataFrame, factor: Int): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset]
      .mapPartitions(_.map(a => a.copy(data = resizeStub(a.data, factor))))
      .toDF()
  }

  val defs: Seq[QueryDef] = Seq(
    // Oracle is UTF-8 BYTE-based like the engine everywhere: strlen()
    // counts octets, the checksum expands each codepoint to its encoded
    // byte sum, and every byte-window output is HEX of the bytes — one
    // hex char pair per octet, so slicing the hex string with char
    // functions IS byte slicing. Exact for any input, ASCII or not.
    QueryDef(
      "q_multimodal_features",
      """SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  bsum AS checksum,
        |  CAST(bsum % 640 + 1 AS INT) AS width,
        |  CAST(bsum % 480 + 1 AS INT) AS height,
        |  substring(hex(encode(text)), 1, 16) AS frame_hex
        |FROM (
        |  SELECT *, CAST(list_sum(list_transform(split(text, ''), x -> CASE
        |    WHEN unicode(x) < 128 THEN unicode(x)
        |    WHEN unicode(x) < 2048 THEN 320 + (unicode(x) // 64) + (unicode(x) % 64)
        |    WHEN unicode(x) < 65536 THEN 480 + (unicode(x) // 4096) + ((unicode(x) // 64) % 64) + (unicode(x) % 64)
        |    ELSE 624 + (unicode(x) // 262144) + ((unicode(x) // 4096) % 64) + ((unicode(x) // 64) % 64) + (unicode(x) % 64)
        |  END)) AS BIGINT) AS bsum FROM documents) d
        |""".stripMargin) { (s, d) => extractFeatures(assets(s, d)) },

    // Resize stage surfaced as a query: stride-2 downsample of each
    // payload, reporting the output size and the strided bytes as hex
    // (byte 2i = hex chars 4i+1..4i+2 of the full hex string).
    QueryDef(
      "q_multimodal_resize",
      """SELECT doc_id AS asset_id,
        |  CAST((strlen(text) + 1) // 2 AS INT) AS n_out,
        |  array_to_string([substring(hex(encode(text)), i*4+1, 2) for i in range(0, CAST((strlen(text) + 1) // 2 AS BIGINT))], '') AS strided_hex
        |FROM documents
        |""".stripMargin) { (s, d) =>
      resizeAssets(assets(s, d), 2)
        .select(col("asset_id"), length(col("data")).as("n_out"),
          hex(col("data")).as("strided_hex"))
    },

    QueryDef(
      "q_multimodal_frames",
      """SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_no,
        |  substring(hex(encode(text)), (i - 1) * 32 + 1, 32) AS frame_hex
        |FROM documents, unnest([1, 2, 3]) AS t(i)
        |WHERE (i - 1) * 16 < strlen(text)
        |""".stripMargin) { (s, d) => sampleFrames(assets(s, d)) }
  )
}
