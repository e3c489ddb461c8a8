package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryDef
import graft.sources.Tables._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata,
  * with decode / feature-extraction as a typed `mapPartitions` stage.
  *
  * Image decode is REAL: image-modality payloads carry a well-formed PNG
  * signature + IHDR chunk, [[pngDims]] is a genuine PNG header parser
  * (checked against javax.imageio-written PNGs in the spec), and
  * [[pngRasterDecode]] is a full 8-bit PNG decoder — zlib IDAT inflate +
  * complete scanline-filter undo — so hand the resize path an arbitrary
  * compressed PNG and it decodes, pools, and re-encodes a real PNG
  * ([[pngEncode]], correct CRCs and deflated scanlines). Audio/video
  * decode remains a clearly-marked deterministic STUB (no codecs in this
  * container); everything around it — schema, encoders, partition-batched
  * iteration, column pruning before the opaque stage — is the real
  * production shape. Swap the stub branch for a codec and nothing else
  * changes.
  *
  * Scale notes: the binary column is projected as late as possible; the
  * mapPartitions stage is narrow (no shuffle) and batch-friendly; feature
  * rows (small, fixed-width) are what flows into downstream joins.
  */
object Multimodal {

  /** binary payload + typed metadata (the multimodal "asset" row) */
  final case class Asset(asset_id: Long, modality: String, data: Array[Byte])

  /** fixed-width features extracted from the payload; width/height are
    * image dims (PNG parse), sample_rate/channels are audio format (WAV
    * parse), duration_ms is video length (MP4 mvhd parse) — 0 where the
    * modality has no such notion */
  final case class MediaFeatures(asset_id: Long, modality: String,
      n_bytes: Int, checksum: Long, width: Int, height: Int,
      sample_rate: Int, channels: Int, duration_ms: Long, frame_hex: String)

  /** perceptual-hash row emitted by [[imageAHash]] */
  final case class AHashRow(asset_id: Long, width: Int, height: Int,
      ahash_bits: String, n_bright: Long)

  /** decoded-and-pooled per-frame stats emitted by [[videoFrameStats]] */
  final case class VideoFrame(asset_id: Long, frame_no: Int, width: Int,
      height: Int, px_sum: Long, pooled_w: Int, pooled_h: Int,
      pooled_sum: Long)

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a PNG header: signature + first chunk must be IHDR, whose data
    * starts with width and height as 4-byte big-endian ints (PNG spec
    * §11.2.2 — public, ubiquitous format). Returns None for non-PNG bytes.
    * This is a real decoder: any actual PNG file yields its dimensions. */
  def pngDims(d: Array[Byte]): Option[(Int, Int)] = {
    def be4(o: Int): Int =
      ((d(o) & 0xff) << 24) | ((d(o + 1) & 0xff) << 16) |
        ((d(o + 2) & 0xff) << 8) | (d(o + 3) & 0xff)
    if (d.length >= 24 && d.startsWith(PngSignature) &&
        d(12) == 'I' && d(13) == 'H' && d(14) == 'D' && d(15) == 'R')
      Some((be4(16), be4(20)))
    else None
  }

  /** Parse a WAV/RIFF header: `RIFF....WAVE` with an `fmt ` chunk whose
    * data starts at offset 20 — channels at 22 and sample rate at 24,
    * both little-endian (RIFF spec; public, ubiquitous). Returns
    * (sample_rate, channels), or None for non-WAV bytes. A real decoder:
    * any actual PCM WAV file yields its true format. */
  def wavMeta(d: Array[Byte]): Option[(Int, Int)] = {
    def le2(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def le4(o: Int): Int =
      (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
        ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)
    def tag(o: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, i) => d(o + i) == c.toByte }
    if (d.length >= 28 && tag(0, "RIFF") && tag(8, "WAVE") && tag(12, "fmt "))
      Some((le4(24), le2(22)))
    else None
  }

  /** Parse an MP4/ISO-BMFF header for the movie duration: walk the
    * top-level boxes ([4-byte BE size][4-byte type]...), descend into
    * `moov`, read `mvhd` — version 0 carries timescale/duration as
    * 32-bit at offsets 20/24 into the box, version 1 as 32/64-bit at
    * 28/32 (ISO 14496-12; public, ubiquitous). Returns duration in
    * MILLISECONDS (duration * 1000 / timescale, integer division), or
    * None for non-MP4 bytes. A real parser: it walks arbitrary box
    * layouts, not just the canonical header this engine synthesizes. */
  def mp4DurationMs(d: Array[Byte]): Option[Long] = {
    def be4(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    def be8(o: Int): Long = (be4(o) << 32) | be4(o + 4)
    def tag(o: Int): String = new String(d, o + 4, 4, "US-ASCII")
    var off = 0L
    var sawFtyp = false
    while (off + 8 <= d.length) {
      val o = off.toInt
      val size = be4(o)
      if (size < 8) return None // malformed / not a box stream
      tag(o) match {
        case "ftyp" => sawFtyp = true
        case "moov" if sawFtyp =>
          var c = o + 8L
          val end = math.min(off + size, d.length.toLong)
          while (c + 8 <= end) {
            val ci = c.toInt
            val csize = be4(ci)
            if (csize < 8) return None
            if (tag(ci) == "mvhd") {
              // version byte is the 9th of the box: a buffer truncated
              // exactly at the mvhd header must parse as None, not throw
              if (c + 9 > end) return None
              val ver = d(ci + 8) & 0xff
              if (ver == 1 && c + 40 <= end) {
                val ts = be4(ci + 28)
                return if (ts > 0) Some(be8(ci + 32) * 1000L / ts) else None
              } else if (ver == 0 && c + 28 <= end) {
                val ts = be4(ci + 20)
                return if (ts > 0) Some(be4(ci + 24) * 1000L / ts) else None
              } else return None
            }
            c += csize
          }
          return None
        case _ => ()
      }
      off += size
    }
    None
  }

  /** Walk an MP4/ISO-BMFF sample table to the per-sample byte ranges:
    * descend `moov` > first `trak` > `mdia` > `minf` > `stbl`, read
    * `stsz` (per-sample sizes, or the fixed-size shortcut), `stco`/`co64`
    * (absolute chunk offsets) and `stsc` (samples-per-chunk runs), then
    * lay samples into chunks exactly as ISO 14496-12 §8.7 prescribes:
    * sample i of chunk c starts at chunk_offset(c) plus the sizes of the
    * chunk's earlier samples. Returns `(offset, size)` per sample in
    * decode order, or None when any of the three boxes is absent or
    * malformed (including the 64-bit `size==1` largesize form, which
    * this engine's synthesizer never emits) — the caller falls back to
    * stride decimation. A real walker: arbitrary box order and run
    * layouts, not just the canonical header synthesized here. */
  def mp4SampleRanges(d: Array[Byte]): Option[Seq[(Long, Long)]] = {
    def be4(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    def be8(o: Int): Long = (be4(o) << 32) | be4(o + 4)
    def tag(o: Int): String = new String(d, o + 4, 4, "US-ASCII")
    // find the first child box with `t` inside [from, end); None if the
    // child stream is malformed or the type absent
    def child(from: Long, end: Long, t: String): Option[(Long, Long)] = {
      var c = from
      while (c + 8 <= end) {
        val ci = c.toInt
        val csize = be4(ci)
        if (csize < 8) return None
        if (tag(ci) == t) return Some((c, math.min(c + csize, end)))
        c += csize
      }
      None
    }
    var off = 0L
    var sawFtyp = false
    while (off + 8 <= d.length) {
      val o = off.toInt
      val size = be4(o)
      if (size < 8) return None
      if (tag(o) == "ftyp") sawFtyp = true
      else if (tag(o) == "moov" && sawFtyp) {
        val end = math.min(off + size, d.length.toLong)
        val stbl = for {
          trak <- child(off + 8, end, "trak")
          mdia <- child(trak._1 + 8, trak._2, "mdia")
          minf <- child(mdia._1 + 8, mdia._2, "minf")
          s <- child(minf._1 + 8, minf._2, "stbl")
        } yield s
        return stbl.flatMap { case (sb, se) =>
          def full(t: String): Option[Int] = // body offset past version/flags
            child(sb + 8, se, t).collect {
              case (b, e) if b + 12 <= e => b.toInt + 12 }
          val sizes: Option[IndexedSeq[Long]] = full("stsz").flatMap { b =>
            if (b + 8 > se) None
            else {
              val fixed = be4(b)
              val n = be4(b + 4)
              if (n < 0 || n > (se - b) / 4 + 1) None
              else if (fixed > 0) Some(IndexedSeq.fill(n.toInt)(fixed))
              else if (b + 8 + 4L * n <= se)
                Some((0 until n.toInt).map(i => be4(b + 8 + 4 * i)))
              else None
            }
          }
          val chunkOffs: Option[IndexedSeq[Long]] =
            full("stco").flatMap { b =>
              if (b + 4 > se) None
              else {
                val n = be4(b)
                if (n >= 0 && b + 4 + 4L * n <= se)
                  Some((0 until n.toInt).map(i => be4(b + 4 + 4 * i)))
                else None
              }
            }.orElse(full("co64").flatMap { b =>
              if (b + 4 > se) None
              else {
                val n = be4(b)
                if (n >= 0 && b + 4 + 8L * n <= se)
                  Some((0 until n.toInt).map(i => be8(b + 4 + 8 * i)))
                else None
              }
            })
          val runs: Option[IndexedSeq[(Long, Long)]] = full("stsc").flatMap { b =>
            if (b + 4 > se) None
            else {
              val n = be4(b)
              if (n >= 0 && b + 4 + 12L * n <= se)
                Some((0 until n.toInt).map(i =>
                  (be4(b + 4 + 12 * i), be4(b + 4 + 12 * i + 4))))
              else None
            }
          }
          for (sz <- sizes; co <- chunkOffs; rn <- runs; if rn.nonEmpty) yield {
            // samples-per-chunk for chunk c = the last run with
            // first_chunk <= c; chunks consume samples in order
            val out = IndexedSeq.newBuilder[(Long, Long)]
            var si = 0
            var c = 0
            while (c < co.length && si < sz.length) {
              val perChunk = rn.reverse.find(_._1 <= c + 1).map(_._2)
                .getOrElse(rn.head._2)
              var within = 0L
              var j = 0L
              while (j < perChunk && si < sz.length) {
                out += ((co(c) + within, sz(si)))
                within += sz(si)
                si += 1
                j += 1
              }
              c += 1
            }
            out.result()
          }
        }
      }
      off += size
    }
    None
  }

  /** 4-byte big-endian binary of an int column (chunk lengths, dims). */
  private def be4Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(lpad(hex(c), 8, "0"))

  /** little-endian twins (RIFF/WAV is LE throughout) */
  private def le4Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def le2Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** Build the asset table. Image-modality rows get a WELL-FORMED PNG
    * signature + IHDR chunk (width = doc_id%640+1, height = doc_id%480+1,
    * bit depth 8, color type 2 truecolor); audio-modality rows get a
    * WELL-FORMED 44-byte canonical PCM WAV header (sample rate =
    * 8000 + doc_id%8 * 1000, channels = 1 + doc_id%2, 16-bit, correct
    * chunk sizes for the trailing "sample data" = the documents' text
    * bytes). Both are prepended to the text bytes so the decode stage
    * exercises real header parses and the oracle can reproduce every
    * byte. Video-modality rows get a WELL-FORMED MP4 header — `ftyp` +
    * `moov`/`mvhd` (timescale 1000, duration_ms = doc_id%3600000+1000) —
    * so all three modalities exercise real header parses; the
    * byte-derived stub remains only as decode's fallback for payloads no
    * parser recognizes. */
  def assets(s: SparkSession, d: String): DataFrame = {
    val w = (col("doc_id") % 640 + 1).cast("int")
    val h = (col("doc_id") % 480 + 1).cast("int")
    val pngHeader = concat(
      lit(PngSignature),
      be4Col(lit(13)), lit("IHDR".getBytes("US-ASCII")),
      be4Col(w), be4Col(h),
      lit(Array[Byte](8, 2, 0, 0, 0)), // depth 8, truecolor, deflate, none, none
      be4Col(lit(0))) // CRC field present (zeroed; parse doesn't verify)
    val dataLen = length(encode(col("text"), "UTF-8")).cast("int")
    val rate = (col("doc_id") % 8 * 1000 + 8000).cast("int")
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val wavHeader = concat(
      lit("RIFF".getBytes("US-ASCII")), le4Col(dataLen + 36),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), le4Col(lit(16)),
      le2Col(lit(1)), le2Col(ch), le4Col(rate), // PCM, channels, rate
      le4Col(rate * ch * 2), le2Col(ch * 2), le2Col(lit(16)), // byteRate, align, bits
      lit("data".getBytes("US-ASCII")), le4Col(dataLen))
    val durMs = (col("doc_id") % 3600000 + 1000).cast("int")
    // sample table: 3 variable-size frames (sizes a function of doc_id so
    // a stride fallback CANNOT reproduce them), one chunk at offset 252
    val mp4Header = concat(
      unhex(lit(Mp4PrefixHex)), be4Col(durMs), unhex(lit(Mp4SuffixHex)),
      unhex(lit(Mp4TrakPrefixHex)),
      be4Col((col("doc_id") % 13 + 4).cast("int")),
      be4Col((col("doc_id") % 11 + 5).cast("int")),
      be4Col((col("doc_id") % 7 + 6).cast("int")),
      unhex(lit(Mp4StcoHex)),
      be4Col(dataLen + 8), lit("mdat".getBytes("US-ASCII")))
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("modality"),
      when(col("doc_id") % 3 === 0,
        concat(pngHeader, encode(col("text"), "UTF-8")))
        .when(col("doc_id") % 3 === 1,
          concat(wavHeader, encode(col("text"), "UTF-8")))
        .otherwise(concat(mp4Header, encode(col("text"), "UTF-8"))).as("data"))
  }

  /** Decode: REAL header parses for all three constructed modalities —
    * PNG IHDR (dims), WAV fmt (rate/channels), MP4 mvhd (duration).
    * Payloads no parser recognizes fall back to the deterministic
    * byte-derived STUB dims (documented; exercised by unit test, not by
    * the fixture). */
  private[operators] def decode(a: Asset): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < a.data.length) { sum += a.data(i) & 0xff; i += 1 }
    // one malformed payload must degrade to the stub features, never fail
    // the whole mapPartitions task — parsers are total over their own
    // checks, but a Try fence keeps the stage robust to adversarial bytes
    def safe[T](p: => Option[T]): Option[T] =
      try p catch { case scala.util.control.NonFatal(_) => None }
    val png = safe(pngDims(a.data))
    val wav = safe(wavMeta(a.data))
    val mp4 = safe(mp4DurationMs(a.data))
    val (w, h) = png.getOrElse(
      if (wav.isDefined || mp4.isDefined) (0, 0)
      else ((sum % 640).toInt + 1, (sum % 480).toInt + 1))
    val (rate, ch) = wav.getOrElse((0, 0))
    MediaFeatures(
      asset_id = a.asset_id,
      modality = a.modality,
      n_bytes = a.data.length,
      checksum = sum,
      width = w,
      height = h,
      sample_rate = rate,
      channels = ch,
      duration_ms = mp4.getOrElse(0L),
      // hex of raw bytes, not a decoded string: exact for ANY payload (a
      // multibyte char straddling the window has no charset-safe twin)
      frame_hex = a.data.take(8).map(b => f"${b & 0xff}%02X").mkString)
  }

  /** The typed decode stage: partition-batched, no shuffle. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].mapPartitions(_.map(decode)).toDF()
  }

  /** per-channel waveform statistics of a PCM payload */
  final case class ChannelStats(asset_id: Long, channel: Int, n_frames: Int,
      sum_sq: Long, sum_abs_delta: Long, peak_abs: Long)

  /** one LSH band of an audio fingerprint (see [[wavBandKeys]]) */
  final case class AudioBand(asset_id: Long, band_no: Int, band_key: String,
      n_bands: Int)

  /** Haitsma-Kalker-shaped audio fingerprint of a canonical 16-bit PCM
    * WAV: channel-0 samples group into `window`-frame FULL windows, each
    * window's integer energy is its abs-sum, fingerprint bit w is the
    * derivative sign energy(w) > energy(w+1) (strict), and consecutive
    * `bandBits`-bit groups become LSH band keys (the q_dedup_minhash /
    * q_dedup_video banding shape — partial trailing windows and bands
    * are DROPPED so both engines see the identical domain). All-integer,
    * so the oracle replays every sample from payload hex. A payload too
    * short for one full band emits nothing — out of fingerprint domain,
    * the ahash 8x8-floor precedent. Non-canonical payloads return None
    * (the [[wavResample]] posture). */
  private[graft] def wavBandKeys(d: Array[Byte], window: Int,
      bandBits: Int): Option[Seq[AudioBand]] = {
    def le2(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def le4(o: Int): Long =
      ((d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
        ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24))
    def tag(o: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, i) => d(o + i) == c.toByte }
    if (!(d.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && le4(16) == 16 && le2(20) == 1 &&
        le2(34) == 16 && tag(36, "data")))
      return None
    val ch = le2(22)
    if (ch < 1 || ch > 8) return None
    val align = ch * 2
    val avail = math.min(le4(40), (d.length - 44).toLong).toInt
    val nFrames = avail / align
    def sample(f: Int): Int = {
      val o = 44 + f * align
      ((d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)).toShort.toInt
    }
    val nw = nFrames / window
    val energies = Array.tabulate(nw) { w =>
      var e = 0L
      var f = w * window
      while (f < (w + 1) * window) { e += math.abs(sample(f).toLong); f += 1 }
      e
    }
    val nBits = math.max(nw - 1, 0)
    val nBands = nBits / bandBits
    Some((0 until nBands).map { b =>
      val key = (b * bandBits until (b + 1) * bandBits)
        .map(w => if (energies(w) > energies(w + 1)) '1' else '0').mkString
      AudioBand(0L, b, key, nBands)
    })
  }

  /** [[wavBandKeys]] over an asset table: narrow row-multiplying
    * flatMap (one row per band), payload bytes never shuffle — only
    * (id, band_no, 8-char key) rows reach the candidate join. */
  def audioFingerprint(assets: DataFrame, window: Int = 4,
      bandBits: Int = 8): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].flatMap { a =>
      def safe[T](p: => Option[T]): Option[T] =
        try p catch { case scala.util.control.NonFatal(_) => None }
      safe(wavBandKeys(a.data, window, bandBits)).getOrElse(Seq.empty)
        .map(bk => bk.copy(asset_id = a.asset_id))
    }.toDF()
  }

  /** the planted audio twin's id (base asset 4, payload truncated by
    * one frame — the "same recording, trimmed" near-dup) */
  val AudioTwinId = 1000004L

  /** audio assets + one planted near-dup: asset 4's payload minus its
    * final frame (align 2 -> 2 bytes). Truncation preserves alignment,
    * so every FULL window of the twin is sample-identical to the base —
    * the pair the fingerprint must recover. The stale RIFF size fields
    * are deliberate: decoders bound by actual length (as [[wavBandKeys]]
    * does) must not trust them. */
  def audioAssetsPlanted(s: SparkSession, d: String): DataFrame = {
    val aud = assets(s, d).filter(col("modality") === "audio")
    val twin = aud.filter(col("asset_id") === 4)
      .select(lit(AudioTwinId).as("asset_id"), col("modality"),
        expr("substring(data, 1, length(data) - 2)").as("data"))
    aud.unionByName(twin)
  }

  /** Per-channel waveform statistics of a canonical 16-bit PCM WAV —
    * the real DSP summary pass (loudness proxy = sum of squares,
    * roughness = first-difference energy, clipping check = peak), all
    * integer-exact so the oracle replays every sample from payload
    * hex. Non-canonical payloads return None (callers drop them, the
    * [[wavResample]] posture). */
  private[graft] def wavChannelStats(d: Array[Byte]): Option[Seq[ChannelStats]] = {
    def le2(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def le4(o: Int): Long =
      ((d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
        ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24))
    def tag(o: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, i) => d(o + i) == c.toByte }
    if (!(d.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && le4(16) == 16 && le2(20) == 1 &&
        le2(34) == 16 && tag(36, "data")))
      return None
    val ch = le2(22)
    if (ch < 1 || ch > 8) return None
    val align = ch * 2
    val avail = math.min(le4(40), (d.length - 44).toLong).toInt
    val nFrames = avail / align
    def sample(f: Int, c: Int): Int = {
      val o = 44 + f * align + c * 2
      ((d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)).toShort.toInt
    }
    Some((0 until ch).map { c =>
      var sumSq = 0L; var sumAbsDelta = 0L; var peak = 0L
      var f = 0
      var prev = 0
      while (f < nFrames) {
        val s = sample(f, c)
        sumSq += s.toLong * s
        if (f > 0) sumAbsDelta += math.abs(s.toLong - prev)
        if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
        prev = s
        f += 1
      }
      ChannelStats(0L, c, nFrames, sumSq, sumAbsDelta, peak)
    })
  }

  /** [[wavChannelStats]] over an asset table's audio rows: narrow
    * row-multiplying flatMap (one output row per channel), payload
    * bytes never shuffle. */
  def audioStats(assets: DataFrame): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].flatMap { a =>
      def safe[T](p: => Option[T]): Option[T] =
        try p catch { case scala.util.control.NonFatal(_) => None }
      safe(wavChannelStats(a.data)).getOrElse(Seq.empty)
        .map(cs => cs.copy(asset_id = a.asset_id))
    }.toDF()
  }

  /** a sampled "frame" (byte window) of an asset's payload, as hex */
  final case class Frame(asset_id: Long, frame_no: Int, frame_hex: String)

  /** Frame sampling: assets whose payload carries an MP4 sample table
    * get their TRUE per-frame byte ranges — [[mp4SampleRanges]] walks
    * `stsc`/`stsz`/`stco` and each frame is the exact `(offset, size)`
    * slice the container declares. Everything else (images, audio,
    * payloads no parser recognizes) falls back to up to `maxFrames`
    * fixed-stride byte windows — the audio-chunk sampling shape.
    * Row-multiplying flatMap, still narrow (no shuffle); a real codec
    * would decode the extracted sample bytes here. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 16, maxFrames: Int = 3): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].flatMap { a =>
      def safe[T](p: => Option[T]): Option[T] =
        try p catch { case scala.util.control.NonFatal(_) => None }
      safe(mp4SampleRanges(a.data)) match {
        case Some(ranges) =>
          ranges.iterator.take(maxFrames).zipWithIndex
            .filter { case ((off, _), _) => off >= 0 && off < a.data.length }
            .map { case ((off, size), i) =>
              val until = math.min(off + size, a.data.length.toLong).toInt
              Frame(a.asset_id, i + 1,
                a.data.slice(off.toInt, until)
                  .map(b => f"${b & 0xff}%02X").mkString)
            }
        case None =>
          (1 to maxFrames).iterator
            .filter(i => (i - 1) * frameBytes < a.data.length)
            .map { i =>
              val from = (i - 1) * frameBytes
              val until = math.min(from + frameBytes, a.data.length)
              Frame(a.asset_id, i,
                a.data.slice(from, until).map(b => f"${b & 0xff}%02X").mkString)
            }
      }
    }.toDF()
  }

  /** Average-pool resize of a row-major single-byte-per-pixel raster:
    * the REAL image-scaling kernel (box filter / area interpolation, what
    * OpenCV's INTER_AREA computes for integer factors). Output dims are
    * ceil(w/f) x ceil(h/f); each output pixel is the floor-mean of the
    * input pixels its f x f block covers (edge blocks are partial). A
    * trailing partial input row is dropped, as a decoder drops a
    * truncated scanline. Hand it any decoded raster and it scales it. */
  def avgPool(raster: Array[Byte], w: Int, f: Int): Array[Byte] = {
    require(f >= 1, s"pool factor must be >= 1, got $f")
    if (w <= 0) return Array.empty
    val h = raster.length / w
    if (h == 0) return Array.empty
    val wOut = (w + f - 1) / f
    val hOut = (h + f - 1) / f
    val out = new Array[Byte](wOut * hOut)
    var oy = 0
    while (oy < hOut) {
      val y0 = oy * f
      val y1 = math.min(y0 + f, h)
      var ox = 0
      while (ox < wOut) {
        val x0 = ox * f
        val x1 = math.min(x0 + f, w)
        var sum = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += raster(y * w + x) & 0xff; x += 1 }
          y += 1
        }
        out(oy * wOut + ox) = (sum / ((y1 - y0) * (x1 - x0))).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Full raster decode for REAL (zlib-compressed) PNGs: walk the chunk
    * stream, concatenate the IDAT payloads, inflate with
    * `java.util.zip.Inflater`, and undo the per-scanline filters — the
    * COMPLETE filter set (None/Sub/Up/Average/Paeth, PNG spec §9) — to
    * recover `(width, height, bytesPerPixel, raster)` where `raster` is
    * `h` rows of `w*bpp` unfiltered bytes in pixel order. Handles the
    * 8-bit non-interlaced color types (gray 0, truecolor 2, gray+alpha 4,
    * RGBA 6). Returns None for anything else — including this engine's
    * synthetic payloads, which carry no IDAT chunk at all and take the
    * raw-raster path in [[resizeAssets]]. Everything here is the public
    * PNG spec + java.util.zip; no image library. */
  def pngRasterDecode(d: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val dims = pngDims(d)
    if (dims.isEmpty || d.length < 33) return None
    val (w, h) = dims.get
    val depth = d(24) & 0xff
    val colorType = d(25) & 0xff
    val interlace = d(28) & 0xff
    val bpp = colorType match {
      case 0 => 1 case 2 => 3 case 4 => 2 case 6 => 4 case _ => return None
    }
    if (depth != 8 || interlace != 0 || w <= 0 || h <= 0) return None
    def be4(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    // chunk walk: [len][type][data][crc] from after the signature
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8L
    var done = false
    while (!done && off + 8 <= d.length) {
      val o = off.toInt
      val len = be4(o)
      if (len < 0 || o + 12 + len > d.length) return None // malformed
      new String(d, o + 4, 4, "US-ASCII") match {
        case "IDAT" => idat.write(d, o + 8, len.toInt)
        case "IEND" => done = true
        case _ => ()
      }
      off += 12 + len
    }
    if (idat.size() == 0) return None
    // inflate to exactly h filtered scanlines of (1 + w*bpp) bytes
    val rowBytes = w * bpp
    val filtered = new Array[Byte](h * (1 + rowBytes))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < filtered.length && !inf.finished()) {
        val n = inf.inflate(filtered, got, filtered.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < filtered.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter (PNG spec §9.2): left = x-bpp in this row, up = prior row
    val out = new Array[Byte](h * rowBytes)
    var y = 0
    while (y < h) {
      val f = filtered(y * (1 + rowBytes)) & 0xff
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val raw = filtered(src + x) & 0xff
        val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) out(dst - rowBytes + x - bpp) & 0xff else 0
        val recon = f match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None // not a defined filter type
        }
        out(dst + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, bpp, out))
  }

  /** [[avgPool]] generalized to an interleaved multi-channel raster:
    * each channel pools independently over its f x f block (edge blocks
    * partial) — the factor-f box filter on an RGB(A)/gray+alpha image. */
  def avgPoolInterleaved(raster: Array[Byte], w: Int, h: Int, bpp: Int, f: Int): Array[Byte] = {
    require(f >= 1 && bpp >= 1, s"pool factor/bpp must be >= 1, got $f/$bpp")
    if (w <= 0 || h <= 0) return Array.empty
    val wOut = (w + f - 1) / f
    val hOut = (h + f - 1) / f
    val out = new Array[Byte](wOut * hOut * bpp)
    var oy = 0
    while (oy < hOut) {
      val y0 = oy * f
      val y1 = math.min(y0 + f, h)
      var ox = 0
      while (ox < wOut) {
        val x0 = ox * f
        val x1 = math.min(x0 + f, w)
        var c = 0
        while (c < bpp) {
          var sum = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += raster((y * w + x) * bpp + c) & 0xff; x += 1 }
            y += 1
          }
          out((oy * wOut + ox) * bpp + c) =
            (sum / ((y1 - y0) * (x1 - x0))).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Encode a REAL standards-compliant PNG: IHDR/IDAT/IEND with correct
    * CRC32s and zlib-deflated filter-0 scanlines (public java.util.zip).
    * Any PNG reader decodes the output — the re-encode leg of the real
    * resize path, as [[pngHeaderBytes]] is of the synthetic leg. */
  def pngEncode(raster: Array[Byte], w: Int, h: Int, bpp: Int): Array[Byte] = {
    val colorType = bpp match {
      case 1 => 0 case 2 => 4 case 3 => 2 case 4 => 6
      case _ => throw new IllegalArgumentException(s"unsupported bpp $bpp")
    }
    require(raster.length == w * h * bpp, "raster/dim mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature, 0, PngSignature.length)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4 + 4 + data.length + 4)
      bb.putInt(data.length).put(tpe.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      out.write(bb.array(), 0, bb.capacity())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val rowBytes = w * bpp
    val filtered = new Array[Byte](h * (1 + rowBytes))
    var y = 0
    while (y < h) { // filter 0 per row: raw bytes behind a 0x00 tag
      System.arraycopy(raster, y * rowBytes, filtered, y * (1 + rowBytes) + 1, rowBytes)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    val dos = new java.io.ByteArrayOutputStream()
    val def2 = new java.util.zip.DeflaterOutputStream(dos, deflater)
    def2.write(filtered); def2.finish(); def2.close(); deflater.end()
    chunk("IDAT", dos.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** sig + IHDR chunk, 33 bytes — the same header shape [[assets]] emits,
    * with the given dims (re-encode step of the resize path) */
  private[operators] def pngHeaderBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(PngSignature)
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(Array[Byte](8, 2, 0, 0, 0))
    bb.putInt(0)
    bb.array()
  }

  /** Byte offset of the raster inside this engine's SYNTHETIC PNG
    * payloads: sig(8) + IHDR length/type/data/crc(4+4+13+4). The
    * synthetic payloads store the raster raw after IHDR (no zlib in the
    * oracle — DuckDB can't inflate); real compressed PNGs instead take
    * [[pngRasterDecode]]. The POOLING kernel is codec-independent. */
  private val PngRasterOffset = 33

  /** This engine's synthetic image payloads are distinguishable from any
    * real PNG by construction: the IHDR CRC field is ZEROED (bytes
    * 29..32) and no IDAT chunk follows — a real encoder always writes
    * the (nonzero) IHDR CRC. Gates the raw-raster-at-33 path so a real
    * PNG that fails full decode can never be "pooled" over its
    * compressed bytes. */
  private[graft] def isSyntheticPng(d: Array[Byte]): Boolean =
    d.length >= 33 && d(29) == 0 && d(30) == 0 && d(31) == 0 && d(32) == 0

  /** REAL audio resample for canonical 16-bit PCM WAV: average each
    * group of `factor` consecutive frames per channel (signed int16,
    * floor division — the box filter, audio's avg-pool twin), halve the
    * sample rate, and re-emit a well-formed WAV (RIFF/byteRate/data
    * sizes all updated). Strict layout gate — RIFF/WAVE, 16-byte `fmt `,
    * PCM format 1, 16-bit, `data` chunk at offset 36; anything else
    * (compressed audio, odd bit depths, extension chunks) returns None
    * and takes the honest stride fallback, never a garbage pool over
    * non-PCM bytes. A trailing partial frame (payload not frame-aligned)
    * is dropped — resampled audio has no tail bytes. */
  private[graft] def wavResample(d: Array[Byte], factor: Int): Option[Array[Byte]] = {
    def le2(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def le4(o: Int): Long =
      ((d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
        ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24))
    def tag(o: Int, t: String): Boolean =
      t.zipWithIndex.forall { case (c, i) => d(o + i) == c.toByte }
    if (!(d.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && le4(16) == 16 && le2(20) == 1 &&
        le2(34) == 16 && tag(36, "data") && factor >= 1))
      return None
    val ch = le2(22)
    val rate = le4(24).toInt
    if (ch < 1 || ch > 8 || rate < 1) return None
    val align = ch * 2
    val avail = math.min(le4(40), (d.length - 44).toLong).toInt
    val nFrames = avail / align
    val nOut = (nFrames + factor - 1) / factor
    val outRate = rate / factor
    val out = new Array[Byte](44 + nOut * align)
    def w2(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w4(o: Int, v: Int): Unit = { w2(o, v & 0xffff); w2(o + 2, v >>> 16) }
    System.arraycopy(d, 0, out, 0, 44) // copy tags/format, then fix fields
    w4(4, 36 + nOut * align)
    w4(24, outRate)
    w4(28, outRate * align)
    w4(40, nOut * align)
    var g = 0
    while (g < nOut) {
      val from = g * factor
      val until = math.min(from + factor, nFrames)
      var c = 0
      while (c < ch) {
        var sum = 0L
        var f = from
        while (f < until) {
          sum += le2(44 + f * align + c * 2).toShort.toLong // sign-extend
          f += 1
        }
        val avg = Math.floorDiv(sum, (until - from).toLong).toInt
        w2(44 + g * align + c * 2, avg & 0xffff)
        c += 1
      }
      g += 1
    }
    Some(out)
  }

  /** Non-image fallback: byte-stride decimation (audio sample-rate
    * halving shape for the WAV/MP4 payloads — a codec-aware pipeline
    * would resample; the stride keeps the byte-in/byte-out narrow
    * transform honest for modalities with no raster). */
  def strideDecimate(data: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((data.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = data(i * factor); i += 1 }
    out
  }

  /** Resize stage over the asset table (typed, narrow, no shuffle).
    * Three rungs, most-real first:
    *  1. a REAL compressed PNG (zlib IDAT) is fully decoded
    *     ([[pngRasterDecode]]: inflate + unfilter), per-channel
    *     average-pooled, and re-encoded as a REAL standards-compliant
    *     PNG ([[pngEncode]]) — decode -> pool -> re-encode holds for
    *     arbitrary PNGs from the outside world;
    *  2. this engine's SYNTHETIC image payloads (zeroed IHDR CRC, no
    *     IDAT — see [[isSyntheticPng]]) pool the raw raster stored after
    *     the 33-byte header, the byte-exact shape the DuckDB oracle
    *     recomputes (no zlib on the oracle side);
    *  3. canonical 16-bit PCM WAV gets a REAL resample
    *     ([[wavResample]]: per-channel frame-group averaging + rate/size
    *     header rewrite — holds for arbitrary PCM files, ImageIO-style
    *     round-trip proven in spec, and byte-exact in the oracle);
    *  4. everything else — MP4 and any payload no rung can honestly
    *     decode — takes stride decimation, never a garbage transform
    *     over compressed bytes. */
  def resizeAssets(assets: DataFrame, factor: Int): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val resized = pngRasterDecode(a.data) match {
        case Some((w, h, bpp, raster)) =>
          val pooled = avgPoolInterleaved(raster, w, h, bpp, factor)
          pngEncode(pooled, (w + factor - 1) / factor,
            (h + factor - 1) / factor, bpp)
        case None if pngDims(a.data).isDefined && isSyntheticPng(a.data) =>
          val w = pngDims(a.data).get._1
          val pooled = avgPool(a.data.drop(PngRasterOffset), w, factor)
          val h = (a.data.length - PngRasterOffset) / math.max(w, 1)
          val wOut = if (pooled.isEmpty) 0 else (w + factor - 1) / factor
          val hOut = if (pooled.isEmpty) 0 else (h + factor - 1) / factor
          pngHeaderBytes(wOut, hOut) ++ pooled
        case None =>
          wavResample(a.data, factor).getOrElse(strideDecimate(a.data, factor))
      }
      a.copy(data = resized)
    }).toDF()
  }

  /** 64-bit perceptual average-hash (aHash) per image asset — the image
    * near-dup primitive: the raster average-pools onto an 8x8 grid
    * (pixel (y, x) lands in block (y*8 div h, x*8 div w) — no bounds
    * arithmetic, every pixel assigned exactly once), block means floor-
    * divide, and each block turns on iff its mean exceeds the floor-mean
    * of the 64 block means. Emitted as a 64-char '0'/'1' string (no
    * sign-bit trap, trivially bandable into pigeonhole blocks for a
    * hamming join — the q_dedup_simhash pattern). Images must be at
    * least 8x8 (every block nonempty); real PNGs hash channel 0 of the
    * decoded raster, synthetic fixture payloads the raw stored raster.
    * All-integer arithmetic, so the oracle replays it exactly.
    *
    * Scale shape: narrow mapPartitions over the late-projected binary
    * column; constant 128 longs of state per image; output rows are
    * fixed-width — the dedup join downstream never touches payloads. */
  def imageAHash(assets: DataFrame): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.as[Asset].mapPartitions(_.flatMap { a =>
      val raster: Option[(Int, Int, Array[Byte])] = pngRasterDecode(a.data) match {
        case Some((w, h, bpp, r)) =>
          Some((w, h, Array.tabulate(w * h)(i => r(i * bpp))))
        case None if pngDims(a.data).isDefined && isSyntheticPng(a.data) =>
          val w = pngDims(a.data).get._1
          val body = a.data.drop(PngRasterOffset)
          val h = body.length / math.max(w, 1)
          Some((w, h, body.take(w * h)))
        case None => None
      }
      raster.filter { case (w, h, _) => w >= 8 && h >= 8 }
        .map { case (w, h, px) =>
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              val i = by * 8 + x * 8 / w
              sums(i) += px(y * w + x) & 0xff
              cnts(i) += 1
              x += 1
            }
            y += 1
          }
          val means = Array.tabulate(64)(i => sums(i) / cnts(i))
          val g = means.sum / 64
          val bits = means.map(m => if (m > g) '1' else '0').mkString
          AHashRow(a.asset_id, w, h, bits, bits.count(_ == '1').toLong)
        }
    }).toDF()
  }

  /** Canonical MP4 header, as hex, shared verbatim by the Spark
    * construction and the oracle: `ftyp`(isom) + `moov` containing a
    * version-0 `mvhd` with timescale 1000 — so duration IS
    * milliseconds — followed by a `trak`/`mdia`/`minf`/`stbl` chain
    * whose sample table ([[Mp4TrakPrefixHex]]..[[Mp4StcoHex]]) describes
    * 3 variable-size samples in one chunk of the trailing `mdat`. Split
    * around the variable fields (4-byte BE duration here; the three
    * stsz entries and the mdat size downstream). */
  private[operators] val Mp4PrefixHex: String =
    "00000010" + "66747970" + "69736F6D" + "00000000" + // ftyp 'isom'
      "000000E4" + "6D6F6F76" + // moov, size 228 (mvhd 108 + trak 112)
      "0000006C" + "6D766864" + "00000000" + // mvhd, size 108, version 0
      "00000000" + "00000000" + "000003E8" // ctime, mtime, timescale 1000
  private[operators] val Mp4SuffixHex: String =
    "00010000" + "0100" + "0000" + ("0" * 16) + // rate 1.0, volume, reserved(10)
      "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000" + // unity matrix
      ("0" * 48) + "00000001" // pre_defined(24), next_track_id

  /** `trak` > `mdia` > `minf` > `stbl` container headers, then a full
    * `stsc` (one run: chunk 1 carries 3 samples) and the `stsz` header
    * up to its per-sample size table — the three 4-byte BE entries
    * follow as the variable fields. */
  private[operators] val Mp4TrakPrefixHex: String =
    "00000070" + "7472616B" + // trak, size 112
      "00000068" + "6D646961" + // mdia, size 104
      "00000060" + "6D696E66" + // minf, size 96
      "00000058" + "7374626C" + // stbl, size 88
      "0000001C" + "73747363" + "00000000" + // stsc, size 28, version 0
      "00000001" + "00000001" + "00000003" + "00000001" + // 1 run: chunk 1, 3 samples
      "00000020" + "7374737A" + "00000000" + // stsz, size 32, version 0
      "00000000" + "00000003" // sample_size 0 (per-sample table), count 3

  /** `stco` with the single chunk at absolute file offset 252 =
    * ftyp(16) + moov(228) + mdat header(8) — where the payload begins. */
  private[operators] val Mp4StcoHex: String =
    "00000014" + "7374636F" + "00000000" + "00000001" + "000000FC"

  /** SQL for the little-endian hex of a 4-/2-byte int expression (RIFF is
    * LE throughout; the pairs-swap of the BE hex). */
  private def le4Sql(e: String): String = {
    val h = s"lpad(upper(to_hex(CAST($e AS BIGINT))), 8, '0')"
    s"(substring($h, 7, 2) || substring($h, 5, 2) || substring($h, 3, 2) || substring($h, 1, 2))"
  }
  private def le2Sql(e: String): String = {
    val h = s"lpad(upper(to_hex(CAST($e AS BIGINT))), 4, '0')"
    s"(substring($h, 3, 2) || substring($h, 1, 2))"
  }

  /** The oracle's byte-exact twin of [[assets]]'s payload, as a HEX
    * string: one char pair per octet, so slicing/summing the hex string
    * with char functions IS byte slicing/summing — exact for any input,
    * ASCII or not. Image rows prepend the same 33-byte PNG header; audio
    * rows the same 44-byte canonical WAV header ('RIFF' len+36 'WAVE'
    * 'fmt ' 16 PCM ch rate byteRate align 16 'data' len, all LE). */
  private val payloadHexCte: String =
    s"""p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      '89504E470D0A1A0A' || '0000000D' || '49484452' ||
      |      lpad(upper(to_hex(CAST(doc_id % 640 + 1 AS BIGINT))), 8, '0') ||
      |      lpad(upper(to_hex(CAST(doc_id % 480 + 1 AS BIGINT))), 8, '0') ||
      |      '0802000000' || '00000000' ||
      |      hex(encode(text))
      |    WHEN doc_id % 3 = 1 THEN
      |      '52494646' || ${le4Sql("strlen(text) + 36")} ||
      |      '57415645' || '666D7420' || '10000000' || '0100' ||
      |      ${le2Sql("doc_id % 2 + 1")} ||
      |      ${le4Sql("doc_id % 8 * 1000 + 8000")} ||
      |      ${le4Sql("(doc_id % 8 * 1000 + 8000) * (doc_id % 2 + 1) * 2")} ||
      |      ${le2Sql("(doc_id % 2 + 1) * 2")} || '1000' || '64617461' ||
      |      ${le4Sql("strlen(text)")} ||
      |      hex(encode(text))
      |    ELSE
      |      '$Mp4PrefixHex' ||
      |      lpad(upper(to_hex(CAST(doc_id % 3600000 + 1000 AS BIGINT))), 8, '0') ||
      |      '$Mp4SuffixHex' ||
      |      '$Mp4TrakPrefixHex' ||
      |      lpad(upper(to_hex(CAST(doc_id % 13 + 4 AS BIGINT))), 8, '0') ||
      |      lpad(upper(to_hex(CAST(doc_id % 11 + 5 AS BIGINT))), 8, '0') ||
      |      lpad(upper(to_hex(CAST(doc_id % 7 + 6 AS BIGINT))), 8, '0') ||
      |      '$Mp4StcoHex' ||
      |      lpad(upper(to_hex(CAST(strlen(text) + 8 AS BIGINT))), 8, '0') ||
      |      '6D646174' ||
      |      hex(encode(text)) END AS phex
      |  FROM documents)""".stripMargin

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Per-frame geometry of the MJPEG fixture, shared between the builder
    * and the oracle: frame j of video doc `id` is a w x h grayscale
    * image whose LEFT half is gray g1 and RIGHT half gray g2. w is a
    * multiple of 16 and h of 8, so every JPEG 8x8 block (and every 4x4
    * pool cell) lies wholly inside one half — uniform blocks are
    * DC-only, and a DC-only block survives quality-1.0 JPEG encode +
    * decode BIT-EXACTLY (quant step 1, zero ACs, no chroma transform on
    * grayscale), which is what lets integer pixel stats be
    * oracle-stated. Probed exhaustively over the gray grid before this
    * design was committed; re-pinned per-run by the spec. */
  private def frameGeom(id: Long, j: Int): (Int, Int, Int, Int) = (
    ((id % 4) * 16 + 16).toInt, ((id % 3) * 8 + 8).toInt,
    ((id * 7 + j * 13) % 256).toInt, ((id * 11 + j * 29) % 256).toInt)

  /** ImageIO's default stream cache is a TEMP FILE per decode
    * (`ImageIO.read(InputStream)` wraps the stream in a
    * FileCacheImageInputStream when useCache is on) — for the in-memory
    * byte-array frames every JPEG decode pays a disk round-trip.
    * One JVM-wide flip to the memory cache; referenced from every
    * decode closure so each executor JVM flips exactly once. */
  private[operators] lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Per-thread reused JPEG reader: `ImageIO.read` instantiates a fresh
    * reader (registry scan + plugin construction) PER FRAME, and at
    * ~1.5 KB frames that fixed cost dwarfs the pixel work. `setInput`
    * fully resets the reader between frames. */
  private val jpegReaderTl = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
  }

  /** Decode one JPEG byte range with the thread's reused reader; a
    * malformed payload throws (callers keep their Try fence — the same
    * contributes-nothing posture as `ImageIO.read` returning null). */
  private[operators] def decodeJpeg(bytes: Array[Byte], off: Int,
      len: Int): java.awt.image.BufferedImage = {
    imageIoMemCache
    val rd = jpegReaderTl.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes, off, len))
    try { rd.setInput(iis, true, true); rd.read(0) } finally iis.close()
  }

  /** Encode one half-and-half grayscale frame as a REAL baseline JPEG
    * via javax.imageio (quality 1.0, explicit mode). */
  private[operators] def jpegHalfFrame(w: Int, h: Int, g1: Int, g2: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, if (x < w / 2) g1 else g2)
        x += 1
      }
      y += 1
    }
    val wr = jpegWriterTl.get()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.flush()
    bos.toByteArray
  }

  /** Per-thread reused JPEG writer — the encode-side twin of
    * [[jpegReaderTl]] (a fresh writer per 1.5 KB frame was the fixed
    * cost, not the DCT). `setOutput` resets the writer per frame. */
  private val jpegWriterTl = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
  }

  /** MJPEG-grade video assets: the SAME canonical MP4 container as
    * [[assets]] (identical ftyp/moov/stbl hex, so [[mp4SampleRanges]]
    * walks the identical structure), but the mdat now carries three
    * REAL JPEG frames and the stsz table their REAL byte sizes —
    * bringing video to the PNG/WAV bar where the payload decodes to
    * pixels instead of stopping at byte ranges. Built by a narrow
    * `mapPartitions` over late-projected doc ids (the one place a
    * Catalyst expression genuinely can't encode a JPEG); no shuffle,
    * constant output width per row. */
  def videoAssets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).filter(col("doc_id") % 3 === 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, mp4Bytes(id, (1 to 3).map { j =>
            val (w, h, g1, g2) = frameGeom(id, j)
            jpegHalfFrame(w, h, g1, g2)
          }))
        }
      }.toDF("asset_id", "data")
  }

  /** The canonical MP4 container around a frame list — the byte layout
    * [[videoAssets]] and the planted twin share. */
  private def mp4Bytes(id: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def be4(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
    }
    bb.write(hexBytes(Mp4PrefixHex)); be4(id % 3600000 + 1000)
    bb.write(hexBytes(Mp4SuffixHex)); bb.write(hexBytes(Mp4TrakPrefixHex))
    frames.foreach(f => be4(f.length.toLong))
    bb.write(hexBytes(Mp4StcoHex))
    be4(frames.map(_.length).sum.toLong + 8L)
    bb.write("mdat".getBytes("US-ASCII"))
    frames.foreach(bb.write)
    bb.toByteArray
  }

  /** Asset id of the planted near-duplicate twin (no document carries
    * it — six zeros past the corpus). */
  private[graft] val VideoTwinId = 1000002L

  /** [[videoAssets]] plus ONE planted near-duplicate: asset
    * [[VideoTwinId]] re-encodes asset 2's first two frames verbatim
    * (same geometry -> bit-identical JPEG) and swaps frame 3 for its
    * own gray pair at asset 2's dimensions — the recall fixture the
    * video near-dup entry must recover (2 of 3 frames content-
    * identical, the third genuinely different). */
  def videoAssetsPlanted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val twin = s.range(0, 1).as[Long].mapPartitions(_.map { _ =>
      val frames = (1 to 3).map { j =>
        val (w, h, g1, g2) = frameGeom(2L, j)
        if (j < 3) jpegHalfFrame(w, h, g1, g2)
        else {
          val (_, _, tg1, tg2) = frameGeom(VideoTwinId, j)
          jpegHalfFrame(w, h, tg1, tg2)
        }
      }
      (VideoTwinId, mp4Bytes(VideoTwinId, frames))
    }).toDF("asset_id", "data")
    videoAssets(s, d).unionByName(twin)
  }

  /** Decode-pool-verify over [[videoAssets]]: walk the REAL
    * stsc/stsz/stco sample table for the frame byte ranges, decode each
    * range as a JPEG with javax.imageio, average-pool the raster by 4
    * ([[avgPool]] — the same box filter the image path uses), and emit
    * integer pixel stats the oracle states from the construction. A
    * range that fails to parse or decode contributes NOTHING (the Try
    * fence the other modalities keep): one adversarial payload degrades
    * one asset, never the stage. */
  def videoFrameStats(va: DataFrame): DataFrame = {
    val s = va.sparkSession
    import s.implicits._
    va.as[(Long, Array[Byte])].flatMap { case (id, data) =>
      imageIoMemCache
      def safe[T](p: => Option[T]): Option[T] =
        try p catch { case scala.util.control.NonFatal(_) => None }
      safe(mp4SampleRanges(data)).getOrElse(Seq.empty)
        .iterator.zipWithIndex.flatMap { case ((off, size), i) =>
          safe {
            if (off < 0 || off + size > data.length) None
            else {
              val img = decodeJpeg(data, off.toInt, size.toInt)
              if (img == null) None
              else {
                val (w, h) = (img.getWidth, img.getHeight)
                val raster = new Array[Byte](w * h)
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val v = img.getRaster.getSample(x, y, 0)
                    raster(y * w + x) = v.toByte
                    sum += v
                    x += 1
                  }
                  y += 1
                }
                val pooled = avgPool(raster, w, 4)
                val pw = (w + 3) / 4
                val ph = if (pw == 0) 0 else pooled.length / pw
                var psum = 0L
                var k = 0
                while (k < pooled.length) { psum += pooled(k) & 0xff; k += 1 }
                Some(VideoFrame(id, i + 1, w, h, sum, pw, ph, psum))
              }
            }
          }
        }
    }.toDF()
  }

  final case class VideoSig(asset_id: Long, frame_no: Int, width: Int,
    height: Int, ahash_bits: String, sig: String)

  /** Per-frame near-dup signatures over decoded video: the
    * [[videoFrameStats]] sample-table walk and JPEG decode, then each
    * frame's 64-bit aHash ([[imageAHash]]'s 8x8 block rule on the
    * decoded channel-0 raster) as the LSH BAND key, plus a content
    * digest (md5 of "w:h:" + the raster's lowercase hex) as the verify
    * key. Same Try fence: a corrupt frame contributes nothing. */
  def videoFrameSig(va: DataFrame): DataFrame = {
    val s = va.sparkSession
    import s.implicits._
    va.as[(Long, Array[Byte])].flatMap { case (id, data) =>
      imageIoMemCache
      def safe[T](p: => Option[T]): Option[T] =
        try p catch { case scala.util.control.NonFatal(_) => None }
      safe(mp4SampleRanges(data)).getOrElse(Seq.empty)
        .iterator.zipWithIndex.flatMap { case ((off, size), i) =>
          safe {
            if (off < 0 || off + size > data.length) None
            else {
              val img = decodeJpeg(data, off.toInt, size.toInt)
              if (img == null || img.getWidth < 8 || img.getHeight < 8) None
              else {
                val (w, h) = (img.getWidth, img.getHeight)
                val sums = new Array[Long](64)
                val cnts = new Array[Long](64)
                val hex = new StringBuilder(w * h * 2)
                var y = 0
                while (y < h) {
                  val by = y * 8 / h
                  var x = 0
                  while (x < w) {
                    val v = img.getRaster.getSample(x, y, 0) & 0xff
                    val k = by * 8 + x * 8 / w
                    sums(k) += v
                    cnts(k) += 1
                    hex.append(f"$v%02x")
                    x += 1
                  }
                  y += 1
                }
                val means = Array.tabulate(64)(k => sums(k) / cnts(k))
                val g = means.sum / 64
                val bits = means.map(m => if (m > g) '1' else '0').mkString
                Some(VideoSig(id, i + 1, w, h, bits,
                  graft.Exact.md5Hex(s"$w:$h:" + hex)))
              }
            }
          }
        }
    }.toDF()
  }

  val defs: Seq[QueryDef] = Seq(
    // The oracle reconstructs the payload bytes as hex (shared CTE) and
    // derives every feature from them; width/height state the IHDR
    // construction for image rows — which is exactly what the Spark-side
    // PNG parse must read back — and the stub arithmetic for the rest.
    QueryDef(
      "q_multimodal_features",
      s"""WITH $payloadHexCte,
        |f AS (
        |  SELECT doc_id, phex,
        |    CAST(strlen(phex) // 2 AS INT) AS n_bytes,
        |    CAST(coalesce(list_sum(list_transform(range(strlen(phex) // 2),
        |      i -> ('0x' || substring(phex, CAST(i*2+1 AS INT), 2))::BIGINT)), 0) AS BIGINT) AS checksum
        |  FROM p)
        |SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  n_bytes, checksum,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 640 + 1 ELSE 0 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 480 + 1 ELSE 0 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 8 * 1000 + 8000 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN doc_id % 2 + 1 ELSE 0 END AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 3600000 + 1000 ELSE 0 END AS BIGINT) AS duration_ms,
        |  substring(phex, 1, 16) AS frame_hex
        |FROM f
        |""".stripMargin) { (s, d) => extractFeatures(assets(s, d)) },

    // Per-channel waveform statistics of the audio assets — the real
    // DSP summary pass over decoded PCM samples (not header fields):
    // loudness proxy = integer sum of squares, roughness = first-
    // difference energy (zero crossings would be degenerate here — the
    // fixture's ASCII payload keeps every sample positive, so the
    // non-trivial signal statistic is the delta energy; sign handling
    // is unit-tested on synthetic negative samples instead), clipping
    // check = peak amplitude. All-integer arithmetic, so the oracle
    // recomputes every signed 16-bit LE sample from payload hex and
    // the replay is bit-exact. Narrow flatMap, one row per channel;
    // payload bytes never shuffle.
    QueryDef(
      "q_multimodal_audio_stats", {
        def samp(f: String, c: String): String =
          s"""((('0x' || substring(phex, CAST(2 * (44 + ($f) * align + ($c) * 2) + 3 AS INT), 2) || substring(phex, CAST(2 * (44 + ($f) * align + ($c) * 2) + 1 AS INT), 2))::INT + 32768) % 65536 - 32768)"""
        s"""WITH $payloadHexCte,
          |aud AS (
          |  SELECT doc_id, phex,
          |    CAST((1 + doc_id % 2) * 2 AS INT) AS align,
          |    CAST((strlen(phex) // 2 - 44) // ((1 + doc_id % 2) * 2) AS INT) AS nf,
          |    CAST(1 + doc_id % 2 AS INT) AS ch
          |  FROM p WHERE doc_id % 3 = 1)
          |SELECT doc_id AS asset_id, CAST(c AS INT) AS channel,
          |  nf AS n_frames,
          |  CAST(coalesce(list_sum(list_transform(range(0, nf), f ->
          |    CAST(${samp("f", "c")} AS BIGINT) * ${samp("f", "c")})), 0) AS BIGINT) AS sum_sq,
          |  CAST(coalesce(list_sum(list_transform(range(1, nf), f ->
          |    abs(CAST(${samp("f", "c")} AS BIGINT) - ${samp("f-1", "c")}))), 0) AS BIGINT) AS sum_abs_delta,
          |  CAST(coalesce(list_max(list_transform(range(0, nf), f ->
          |    abs(${samp("f", "c")}))), 0) AS BIGINT) AS peak_abs
          |FROM aud, UNNEST(range(0, CAST(ch AS BIGINT))) AS u(c)
          |""".stripMargin
      }) { (s, d) =>
      audioStats(assets(s, d))
        .select(col("asset_id"), col("channel"), col("n_frames"),
          col("sum_sq"), col("sum_abs_delta"), col("peak_abs"))
    },

    // Resize stage surfaced as a query. Image rows take the REAL path —
    // factor-2 average-pool of the post-IHDR raster at the parsed width,
    // re-encoded under an updated header — and the oracle recomputes every
    // pooled pixel from the same hex string: pixel (y,x) is hex chars
    // 67+(y*w+x)*2 .. +2 (raster starts at byte 33), each output pixel the
    // floor-mean of its 2x2 block (edge blocks partial, trailing partial
    // row dropped). Non-raster modalities report the stride-2 decimation.
    QueryDef(
      "q_multimodal_resize",
      s"""WITH $payloadHexCte,
        |img AS (
        |  SELECT doc_id, phex, CAST(doc_id % 640 + 1 AS INT) AS w,
        |    CAST((strlen(phex) // 2 - 33) // (doc_id % 640 + 1) AS INT) AS h
        |  FROM p WHERE doc_id % 3 = 0),
        |img2 AS (
        |  SELECT doc_id, phex, w, h,
        |    CAST(CASE WHEN h = 0 THEN 0 ELSE (w + 1) // 2 END AS INT) AS wout,
        |    CAST(CASE WHEN h = 0 THEN 0 ELSE (h + 1) // 2 END AS INT) AS hout
        |  FROM img),
        |aud AS (
        |  SELECT doc_id, phex, CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(8000 + doc_id % 8 * 1000 AS INT) AS rate,
        |    CAST((1 + doc_id % 2) * 2 AS INT) AS align,
        |    CAST((strlen(phex) // 2 - 44) // ((1 + doc_id % 2) * 2) AS INT) AS nf,
        |    CAST(((strlen(phex) // 2 - 44) // ((1 + doc_id % 2) * 2) + 1) // 2 AS INT) AS nout
        |  FROM p WHERE doc_id % 3 = 1)
        |SELECT doc_id AS asset_id, CAST(33 + wout * hout AS INT) AS n_out,
        |  '89504E470D0A1A0A' || '0000000D' || '49484452' ||
        |  lpad(upper(to_hex(CAST(wout AS BIGINT))), 8, '0') ||
        |  lpad(upper(to_hex(CAST(hout AS BIGINT))), 8, '0') ||
        |  '0802000000' || '00000000' ||
        |  coalesce(array_to_string([lpad(upper(to_hex(CAST(
        |      list_sum(flatten([[('0x' || substring(phex, CAST(67 + (y * w + x) * 2 AS INT), 2))::INT
        |        for x in range(CAST((i % wout) * 2 AS INT), CAST(least((i % wout) * 2 + 2, w) AS INT))]
        |        for y in range(CAST((i // wout) * 2 AS INT), CAST(least((i // wout) * 2 + 2, h) AS INT))]))
        |      // ((least((i // wout) * 2 + 2, h) - (i // wout) * 2)
        |         * (least((i % wout) * 2 + 2, w) - (i % wout) * 2))
        |    AS BIGINT))), 2, '0')
        |    for i in range(0, wout * hout)], ''), '') AS out_hex
        |FROM img2
        |UNION ALL
        |SELECT doc_id AS asset_id,
        |  CAST(44 + nout * align AS INT) AS n_out,
        |  '52494646' || ${le4Sql("36 + nout * align")} || '57415645' ||
        |  '666D7420' || '10000000' || '0100' || ${le2Sql("ch")} ||
        |  ${le4Sql("rate // 2")} || ${le4Sql("(rate // 2) * align")} ||
        |  ${le2Sql("align")} || '1000' || '64617461' || ${le4Sql("nout * align")} ||
        |  coalesce(array_to_string(list_transform(
        |    flatten(list_transform(range(0, nout), g ->
        |      list_transform(range(0, ch), c ->
        |        ((list_sum(list_transform(range(g * 2, least(g * 2 + 2, nf)), f ->
        |            (('0x' || substring(phex, CAST(2 * (44 + f * align + c * 2) + 3 AS INT), 2)
        |                   || substring(phex, CAST(2 * (44 + f * align + c * 2) + 1 AS INT), 2))::INT
        |             + 32768) % 65536 - 32768))
        |          // (least(g * 2 + 2, nf) - g * 2)
        |         ) % 65536 + 65536) % 65536))),
        |    uv -> lpad(upper(to_hex(uv % 256)), 2, '0') ||
        |          lpad(upper(to_hex(uv // 256)), 2, '0')), ''), '') AS out_hex
        |FROM aud
        |UNION ALL
        |SELECT doc_id AS asset_id,
        |  CAST((strlen(phex) // 2 + 1) // 2 AS INT) AS n_out,
        |  array_to_string([substring(phex, CAST(i * 4 + 1 AS INT), 2)
        |    for i in range(0, (strlen(phex) // 2 + 1) // 2)], '') AS out_hex
        |FROM p WHERE doc_id % 3 = 2
        |""".stripMargin) { (s, d) =>
      resizeAssets(assets(s, d), 2)
        .select(col("asset_id"), length(col("data")).as("n_out"),
          hex(col("data")).as("out_hex"))
    },

    // Video rows: the oracle PARSES the sample table back out of the
    // payload hex — it locates the stsz/stco boxes by their type tags,
    // reads the per-sample sizes and the chunk offset from the hex
    // itself (not from the doc_id arithmetic that constructed them), and
    // slices each declared (offset, size) range. Frame sizes vary per
    // document, so a stride decimation CANNOT reproduce these rows — the
    // walk is what's checked. Image/audio rows keep the stride contract.
    QueryDef(
      "q_multimodal_frames",
      s"""WITH $payloadHexCte,
        |vid AS (
        |  SELECT doc_id, phex,
        |    CAST(strlen(phex) // 2 AS BIGINT) AS flen,
        |    position('7374737A' IN phex) AS szp,
        |    position('7374636F' IN phex) AS cop
        |  FROM p WHERE doc_id % 3 = 2),
        |vid2 AS (
        |  SELECT doc_id, phex, flen,
        |    ('0x' || substring(phex, CAST(szp + 24 AS INT), 8))::BIGINT AS cnt,
        |    [('0x' || substring(phex, CAST(szp + 32 + i * 8 AS INT), 8))::BIGINT
        |      for i in range(0, 3)] AS sizes,
        |    ('0x' || substring(phex, CAST(cop + 24 AS INT), 8))::BIGINT AS choff
        |  FROM vid WHERE szp > 0 AND cop > 0)
        |SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_no,
        |  substring(phex, CAST((i - 1) * 32 + 1 AS INT), 32) AS frame_hex
        |FROM p, unnest([1, 2, 3]) AS t(i)
        |WHERE doc_id % 3 <> 2 AND (i - 1) * 16 < strlen(phex) // 2
        |UNION ALL
        |SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_no,
        |  substring(phex,
        |    CAST(2 * (choff + coalesce(list_sum(sizes[1:CAST(i - 1 AS INT)]), 0)) + 1 AS INT),
        |    CAST(2 * sizes[CAST(i AS INT)] AS INT)) AS frame_hex
        |FROM vid2, unnest([1, 2, 3]) AS t(i)
        |WHERE i <= cnt
        |  AND choff + coalesce(list_sum(sizes[1:CAST(i - 1 AS INT)]), 0) < flen
        |""".stripMargin) { (s, d) => sampleFrames(assets(s, d)) },

    // MJPEG-grade video decode: the sample-table walk now feeds REAL
    // JPEG frames (q_multimodal_frames stops at byte ranges; this
    // decodes them to pixels via javax.imageio, pools, and verifies) —
    // video at the PNG/WAV decode bar. The oracle states every integer
    // stat from the shared frame geometry (half-gray frames aligned to
    // JPEG block and pool-cell boundaries decode bit-exactly at
    // quality 1.0 — see frameGeom), so a frame the walk mis-slices, a
    // decode that drifts by one gray level, or a pool cell off by one
    // pixel each break the hash. Scale shape: one narrow mapPartitions
    // over late-projected binary per stage (build, then decode);
    // constant-width output; zero shuffles.
    QueryDef(
      "q_multimodal_video_decode",
      """WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
        |g AS (
        |  SELECT doc_id, j,
        |    (doc_id % 4) * 16 + 16 AS w, (doc_id % 3) * 8 + 8 AS h,
        |    (doc_id * 7 + j * 13) % 256 AS g1,
        |    (doc_id * 11 + j * 29) % 256 AS g2
        |  FROM v, UNNEST([1, 2, 3]) t(j))
        |SELECT doc_id AS asset_id, CAST(j AS INT) AS frame_no,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  (g1 + g2) * (w // 2) * h AS px_sum,
        |  CAST(w // 4 AS INT) AS pooled_w, CAST(h // 4 AS INT) AS pooled_h,
        |  (g1 + g2) * (w // 8) * (h // 4) AS pooled_sum
        |FROM g
        |""".stripMargin) { (s, d) => videoFrameStats(videoAssets(s, d)) },

    // Perceptual average-hash per image asset — the image near-dup
    // primitive (the pHash family's simplest member): 8x8 block means
    // thresholded at their own floor-mean, emitted as a 64-char
    // bitstring. All-integer (floor divisions only), so the oracle
    // recomputes every block from the raster hex — pixel i lands in
    // block ((i div w)*8 div h)*8 + (i mod w)*8 div w, the same
    // assignment the Scala loop makes — and the hash matches bit for
    // bit. Images below 8x8 (some block empty) are out of hash domain
    // in both engines.
    QueryDef(
      "q_multimodal_ahash",
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS rhex
        |  FROM documents WHERE doc_id % 3 = 0),
        |img AS (
        |  SELECT doc_id, rhex, CAST(doc_id % 640 + 1 AS INT) AS w,
        |    CAST((strlen(rhex) // 2) // (doc_id % 640 + 1) AS INT) AS h
        |  FROM p),
        |pix AS (
        |  SELECT doc_id,
        |    ((i // w) * 8) // h * 8 + ((i % w) * 8) // w AS blk,
        |    ('0x' || substring(rhex, CAST(1 + i * 2 AS INT), 2))::BIGINT AS v
        |  FROM img, UNNEST(range(0, CAST(w AS BIGINT) * h)) AS t(i)
        |  WHERE w >= 8 AND h >= 8),
        |b AS (SELECT doc_id, blk, CAST(sum(v) // count(*) AS BIGINT) AS m
        |      FROM pix GROUP BY 1, 2),
        |g AS (SELECT doc_id, CAST(sum(m) // 64 AS BIGINT) AS g FROM b GROUP BY 1),
        |hsh AS (
        |  SELECT b.doc_id,
        |    string_agg(CASE WHEN m > g THEN '1' ELSE '0' END, '' ORDER BY blk) AS ahash_bits,
        |    sum(CASE WHEN m > g THEN 1 ELSE 0 END)::BIGINT AS n_bright
        |  FROM b JOIN g USING (doc_id) GROUP BY b.doc_id)
        |SELECT i.doc_id AS asset_id, i.w AS width, i.h AS height,
        |  ahash_bits, n_bright
        |FROM hsh JOIN img i USING (doc_id)
        |""".stripMargin) { (s, d) => imageAHash(assets(s, d)) },

    // Video near-dup (r11) — the multimodal -> dedup loop closed for
    // the third modality: every decoded frame's aHash is an LSH BAND
    // key (frames are the bands, the q_dedup_minhash banding shape),
    // candidate videos come from the band equi-join only, and the
    // verify key is the frame's decoded-content digest; a pair is a
    // near-dup when >= 2 of its 3 frames are content-identical. The
    // fixture plants one twin (videoAssetsPlanted: asset 2's first two
    // frames re-encoded verbatim, frame 3 swapped) that the entry must
    // recover; at sf0.1 the id-arithmetic also yields genuine stride-
    // 768 exact triples (w,h repeat mod 12 and both grays mod 256).
    // The oracle states hash and digest analytically from the frame
    // construction — legal because aligned half-uniform JPEG frames
    // decode bit-exactly (the q_multimodal_video_decode pin).
    //
    // Scale shape: decode is the narrow mapPartitions pass (payloads
    // never shuffle); everything after moves (asset, frame, 64-char
    // hash, 32-char digest) rows — the band join is an equi-join whose
    // key includes dims + hash, and the verify is a residual on the
    // matched rows, never a second decode.
    QueryDef(
      "q_dedup_video",
      """WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
        |geo AS (
        |  SELECT doc_id AS id, j,
        |    CAST((doc_id % 4) * 16 + 16 AS INT) AS w,
        |    CAST((doc_id % 3) * 8 + 8 AS INT) AS h,
        |    (doc_id * 7 + j * 13) % 256 AS g1, (doc_id * 11 + j * 29) % 256 AS g2
        |  FROM v, UNNEST([1, 2, 3]) t(j)
        |  UNION ALL
        |  SELECT 1000002 AS id, j,
        |    CAST((2 % 4) * 16 + 16 AS INT) AS w, CAST((2 % 3) * 8 + 8 AS INT) AS h,
        |    CASE WHEN j < 3 THEN (2 * 7 + j * 13) % 256
        |         ELSE (1000002 * 7 + 3 * 13) % 256 END AS g1,
        |    CASE WHEN j < 3 THEN (2 * 11 + j * 29) % 256
        |         ELSE (1000002 * 11 + 3 * 29) % 256 END AS g2
        |  FROM UNNEST([1, 2, 3]) t(j)),
        |f AS MATERIALIZED (
        |  SELECT id, j AS frame_no, w, h,
        |    repeat(repeat(CASE WHEN g1 > (g1 + g2) // 2 THEN '1' ELSE '0' END, 4)
        |        || repeat(CASE WHEN g2 > (g1 + g2) // 2 THEN '1' ELSE '0' END, 4), 8) AS ahash,
        |    md5(w::VARCHAR || ':' || h::VARCHAR || ':' ||
        |        repeat(repeat(lpad(format('{:x}', g1), 2, '0'), w // 2)
        |            || repeat(lpad(format('{:x}', g2), 2, '0'), w // 2), h)) AS sig
        |  FROM geo),
        |cand AS (
        |  SELECT a.id AS i, b.id AS j, count(*)::BIGINT AS n_band_frames,
        |    sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END)::BIGINT AS n_exact_frames
        |  FROM f a JOIN f b ON b.frame_no = a.frame_no AND b.w = a.w AND b.h = a.h
        |    AND b.ahash = a.ahash AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT i, j, n_band_frames, n_exact_frames
        |FROM cand WHERE n_exact_frames >= 2
        |""".stripMargin) { (s, d) =>
      val f = videoFrameSig(videoAssetsPlanted(s, d)).localCheckpoint()
      val a = f.select(col("asset_id").as("i"), col("frame_no"), col("width"),
        col("height"), col("ahash_bits"), col("sig").as("sig_a"))
      val b = f.select(col("asset_id").as("j"), col("frame_no"), col("width"),
        col("height"), col("ahash_bits"), col("sig").as("sig_b"))
      a.join(b, Seq("frame_no", "width", "height", "ahash_bits"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("n_band_frames"),
          sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L))
            .as("n_exact_frames"))
        .filter(col("n_exact_frames") >= 2)
    },

    // Audio near-dup (r13) — the modality x dedup matrix completed
    // (image aHash, video frame bands, now audio): Haitsma-Kalker-shaped
    // fingerprint bands over DECODED channel-0 PCM (4-frame window
    // abs-sum energies, derivative-sign bits, 8-bit band keys — all
    // integer), candidates from the (band_no, key) equi-join only, a
    // pair near-dup when >= 60% of the smaller fingerprint's bands match
    // in place. Assets too short for two full bands are out of domain
    // (the ahash 8x8-floor precedent — a 1-band fingerprint would call
    // random pairs dups). The fixture plants one twin (asset 4's payload
    // minus its final frame — same recording, trimmed; truncation
    // preserves alignment so every full window is sample-identical) that
    // the entry must recover; the oracle replays every sample from
    // payload hex, windows, bits, bands, and the verify rule.
    //
    // Scale shape: decode is the narrow flatMap pass (payloads never
    // shuffle); only (id, band_no, 8-char key) rows reach the band
    // equi-join, and the verify is arithmetic on the grouped counts —
    // never a second decode.
    QueryDef(
      "q_dedup_audio", {
        val samp = "((('0x' || substring(phex, CAST(2 * (44 + f * align) + 3 AS INT), 2) || substring(phex, CAST(2 * (44 + f * align) + 1 AS INT), 2))::INT + 32768) % 65536 - 32768)"
        s"""WITH $payloadHexCte,
          |a2 AS (
          |  SELECT doc_id AS id, doc_id AS base, phex FROM p WHERE doc_id % 3 = 1
          |  UNION ALL
          |  SELECT 1000004 AS id, 4 AS base,
          |    substring(phex, 1, CAST(strlen(phex) - 4 AS INT)) AS phex
          |  FROM p WHERE doc_id = 4),
          |m AS (
          |  SELECT id, phex, CAST((1 + base % 2) * 2 AS INT) AS align,
          |    CAST((strlen(phex) // 2 - 44) // ((1 + base % 2) * 2) AS INT) AS nf
          |  FROM a2),
          |e AS (
          |  SELECT id, w,
          |    list_sum(list_transform(range(w * 4, w * 4 + 4), f -> abs(CAST($samp AS BIGINT)))) AS en
          |  FROM m, UNNEST(range(0, CAST(nf // 4 AS BIGINT))) t(w)),
          |b AS (
          |  SELECT a.id, a.w AS bitno, CASE WHEN a.en > c.en THEN '1' ELSE '0' END AS bit
          |  FROM e a JOIN e c ON c.id = a.id AND c.w = a.w + 1),
          |bd AS (
          |  SELECT id, bitno // 8 AS band_no, string_agg(bit, '' ORDER BY bitno) AS band_key,
          |    count(*) AS nb
          |  FROM b GROUP BY 1, 2),
          |f AS MATERIALIZED (SELECT id, band_no, band_key FROM bd WHERE nb = 8),
          |nb AS (SELECT id, CAST(count(*) AS INT) AS n_bands FROM f GROUP BY 1),
          |cand AS (
          |  SELECT a.id AS i, b2.id AS j, count(*)::BIGINT AS n_shared_bands
          |  FROM f a JOIN f b2 ON b2.band_no = a.band_no AND b2.band_key = a.band_key
          |    AND a.id < b2.id
          |  GROUP BY 1, 2)
          |SELECT c.i, c.j, c.n_shared_bands,
          |  least(ni.n_bands, nj.n_bands) AS n_bands_min
          |FROM cand c JOIN nb ni ON ni.id = c.i JOIN nb nj ON nj.id = c.j
          |WHERE least(ni.n_bands, nj.n_bands) >= 2
          |  AND c.n_shared_bands * 5 >= 3 * least(ni.n_bands, nj.n_bands)
          |""".stripMargin
      }) { (s, d) =>
      val f = audioFingerprint(audioAssetsPlanted(s, d)).localCheckpoint()
      val a = f.select(col("asset_id").as("i"), col("band_no"),
        col("band_key"), col("n_bands").as("nb_i"))
      val b = f.select(col("asset_id").as("j"), col("band_no"),
        col("band_key"), col("n_bands").as("nb_j"))
      a.join(b, Seq("band_no", "band_key"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("n_shared_bands"),
          least(first(col("nb_i")), first(col("nb_j"))).as("n_bands_min"))
        .filter(col("n_bands_min") >= 2 &&
          col("n_shared_bands") * 5 >= col("n_bands_min") * 3)
        .select("i", "j", "n_shared_bands", "n_bands_min")
    }
  )
}
