package graft

import graft.operators.Multimodal
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Multimodal plumbing + batch/stream agreement. */
class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  /** the 33-byte PNG header assets() prepends to image-modality payloads */
  private def pngHeader(id: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33) // big-endian by default
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13)
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt((id % 640 + 1).toInt)
    bb.putInt((id % 480 + 1).toInt)
    bb.put(Array[Byte](8, 2, 0, 0, 0))
    bb.putInt(0)
    bb.array()
  }

  /** the 44-byte canonical PCM WAV header assets() prepends to
    * audio-modality payloads */
  private def wavHeader(id: Long, dataLen: Int): Array[Byte] = {
    val rate = (id % 8 * 1000 + 8000).toInt
    val ch = (id % 2 + 1).toInt
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(dataLen + 36)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(ch.toShort).putInt(rate)
    bb.putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** the 252-byte canonical MP4 header assets() prepends to
    * video-modality payloads: ftyp + moov(mvhd v0 timescale 1000 +
    * trak/mdia/minf/stbl with a 3-sample stsc/stsz/stco table) + the
    * mdat box header */
  private def mp4Header(id: Long, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(252) // big-endian by default
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(228).put("moov".getBytes)
    bb.putInt(108).put("mvhd".getBytes).putInt(0) // v0 + flags
    bb.putInt(0).putInt(0) // ctime, mtime
    bb.putInt(1000).putInt((id % 3600000 + 1000).toInt) // timescale, duration
    bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, res
    bb.putLong(0L) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (1 to 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(1) // next_track_id
    bb.putInt(112).put("trak".getBytes)
    bb.putInt(104).put("mdia".getBytes)
    bb.putInt(96).put("minf".getBytes)
    bb.putInt(88).put("stbl".getBytes)
    bb.putInt(28).put("stsc".getBytes).putInt(0)
    bb.putInt(1).putInt(1).putInt(3).putInt(1) // one run: chunk 1, 3 samples
    bb.putInt(32).put("stsz".getBytes).putInt(0).putInt(0).putInt(3)
    bb.putInt((id % 13 + 4).toInt).putInt((id % 11 + 5).toInt)
    bb.putInt((id % 7 + 6).toInt)
    bb.putInt(20).put("stco".getBytes).putInt(0).putInt(1).putInt(252)
    bb.putInt(dataLen + 8).put("mdat".getBytes)
    bb.array()
  }

  private def payloadOf(id: Long, text: String): Array[Byte] = {
    val t = text.getBytes("UTF-8")
    if (id % 3 == 0) pngHeader(id) ++ t
    else if (id % 3 == 1) wavHeader(id, t.length) ++ t
    else mp4Header(id, t.length) ++ t
  }

  test("videoFrameStats: genuine JPEG frames decode bit-exactly; garbage degrades one asset") {
    // One real MJPEG asset (doc 2's geometry) + one asset whose mdat is
    // noise: the real one must emit all 3 frames with the constructed
    // stats, the corrupt one must contribute NOTHING (Try fence) — and
    // the stage must survive both in one pass.
    val real = Multimodal.videoAssets(spark, sf).filter(col("asset_id") === 2L)
    val corrupt = real.select(col("asset_id") + 1000,
      // keep the container header (sample table parses, ranges stay in
      // bounds) but overwrite every frame byte with 'A' — ImageIO finds
      // no image and each frame must degrade to nothing
      concat(expr("substring(data, 1, 252)"),
        expr("cast(repeat('A', length(data) - 252) as binary)")))
      .toDF("asset_id", "data")
    val rows = Multimodal.videoFrameStats(real.unionByName(corrupt))
      .orderBy("frame_no").collect()
    assert(rows.length == 3, s"expected 3 decoded frames, got ${rows.length}")
    rows.zipWithIndex.foreach { case (r, i) =>
      val j = i + 1
      val (w, h) = ((2 % 4) * 16 + 16, (2 % 3) * 8 + 8) // 48 x 24
      val (g1, g2) = (((2 * 7 + j * 13) % 256).toLong, ((2 * 11 + j * 29) % 256).toLong)
      assert(r.getAs[Long]("asset_id") == 2L)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("px_sum") == (g1 + g2) * (w / 2) * h,
        s"frame $j decode drifted")
      assert(r.getAs[Long]("pooled_sum") == (g1 + g2) * (w / 8) * (h / 4))
    }
  }

  test("multimodal features are deterministic byte-derived values") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    val byId = feats.collect().map(r => r.getLong(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    docs.take(20).foreach { case (id, text) =>
      val r = byId(id)
      val payload = payloadOf(id, text)
      val sum = payload.map(_ & 0xff).map(_.toLong).sum
      assert(r.getInt(2) == payload.length)                           // n_bytes
      assert(r.getLong(3) == sum)                                     // checksum
      // every modality exercises a REAL header parse: PNG IHDR dims,
      // WAV fmt rate/channels, MP4 mvhd duration
      if (id % 3 == 0) {
        assert(r.getInt(4) == (id % 640 + 1).toInt, s"width of image $id")
        assert(r.getInt(5) == (id % 480 + 1).toInt, s"height of image $id")
        assert(r.getInt(6) == 0 && r.getInt(7) == 0 && r.getLong(8) == 0L)
      } else if (id % 3 == 1) {
        assert(r.getInt(4) == 0 && r.getInt(5) == 0 && r.getLong(8) == 0L)
        assert(r.getInt(6) == (id % 8 * 1000 + 8000).toInt, s"rate of audio $id")
        assert(r.getInt(7) == (id % 2 + 1).toInt, s"channels of audio $id")
      } else {
        assert(r.getInt(4) == 0 && r.getInt(5) == 0)
        assert(r.getInt(6) == 0 && r.getInt(7) == 0)
        assert(r.getLong(8) == id % 3600000 + 1000, s"duration of video $id")
      }
      assert(r.getString(9) == payload.take(8)
        .map(b => f"${b & 0xff}%02X").mkString)                       // frame_hex
    }
    // modality partitioning is total
    assert(feats.select("modality").distinct().count() == 3)
  }

  test("mp4DurationMs walks real-world box layouts (leading box, v1 mvhd, siblings)") {
    // not the canonical header assets() writes: a free box BEFORE ftyp's
    // moov, a sibling child before mvhd, and a VERSION 1 (64-bit) mvhd
    // with a non-trivial timescale — the layouts real muxers emit
    val bb = java.nio.ByteBuffer.allocate(16 + 16 + 8 + 16 + 120)
    bb.putInt(16).put("ftyp".getBytes).put("mp42".getBytes).putInt(0)
    bb.putInt(16).put("free".getBytes).putLong(0L)
    bb.putInt(8 + 16 + 120).put("moov".getBytes)
    bb.putInt(16).put("udta".getBytes).putLong(0L) // sibling before mvhd
    bb.putInt(120).put("mvhd".getBytes).put(1.toByte).put(Array[Byte](0, 0, 0))
    bb.putLong(0L).putLong(0L) // ctime, mtime (64-bit in v1)
    bb.putInt(90000).putLong(90000L * 7 + 45000) // timescale, duration -> 7500 ms
    while (bb.hasRemaining) bb.put(0.toByte)
    assert(Multimodal.mp4DurationMs(bb.array()).contains(7500L))
    assert(Multimodal.mp4DurationMs("not an mp4 either".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.mp4DurationMs(Array.emptyByteArray).isEmpty)
  }

  test("mp4SampleRanges walks stsc/stsz/stco across chunks, runs, and co64") {
    def box(t: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(t.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    def full(t: String, body: Array[Byte]): Array[Byte] =
      box(t, Array[Byte](0, 0, 0, 0) ++ body)
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ ints(0))
    def movie(stbl: Array[Byte]): Array[Byte] =
      ftyp ++ box("moov", box("trak", box("mdia", box("minf", box("stbl", stbl)))))

    // two chunks, two stsc runs (chunk 1 takes 2 samples, chunk 2 one),
    // per-sample sizes — the layout real muxers emit
    val multi = movie(
      full("stsc", ints(2, 1, 2, 1, 2, 1, 1)) ++
        full("stsz", ints(0, 3, 3, 4, 5)) ++
        full("stco", ints(2, 100, 200)))
    assert(Multimodal.mp4SampleRanges(multi)
      .contains(Seq((100L, 3L), (103L, 4L), (200L, 5L))))

    // fixed-size stsz shortcut + 64-bit co64 chunk offsets
    val longOff = java.nio.ByteBuffer.allocate(8).putLong(50L).array()
    val fixed = movie(
      full("stsc", ints(1, 1, 2, 1)) ++
        full("stsz", ints(7, 2)) ++
        full("co64", ints(1) ++ longOff))
    assert(Multimodal.mp4SampleRanges(fixed)
      .contains(Seq((50L, 7L), (57L, 7L))))

    // any missing table, truncation, or garbage degrades to None (stride
    // fallback), never a throw
    val noStco = movie(
      full("stsc", ints(1, 1, 1, 1)) ++ full("stsz", ints(0, 1, 9)))
    assert(Multimodal.mp4SampleRanges(noStco).isEmpty)
    assert(Multimodal.mp4SampleRanges(multi.dropRight(6)).isEmpty)
    assert(Multimodal.mp4SampleRanges("plain bytes".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.mp4SampleRanges(Array.emptyByteArray).isEmpty)
  }

  test("decode falls back to the documented stub for unrecognized payloads") {
    val junk = "no header of any kind".getBytes("UTF-8")
    val df = Seq((7L, "blob", junk)).toDF("asset_id", "modality", "data")
    val r = Multimodal.extractFeatures(df).collect().head
    val sum = junk.map(_ & 0xff).map(_.toLong).sum
    assert(r.getInt(4) == (sum % 640).toInt + 1)
    assert(r.getInt(5) == (sum % 480).toInt + 1)
    assert(r.getInt(6) == 0 && r.getInt(7) == 0 && r.getLong(8) == 0L)
  }

  test("wavMeta reads genuine WAV files (javax.sound round-trip)") {
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 2, true, false)
    val pcm = new Array[Byte](1764) // ~10ms of silence, 2ch 16-bit
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    assert(Multimodal.wavMeta(baos.toByteArray).contains((44100, 2)),
      "a real AudioSystem-written WAV must parse to its true format")
    assert(Multimodal.wavMeta("definitely not RIFF".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.wavMeta(Array.emptyByteArray).isEmpty)
  }

  test("wavResample halves a genuine WAV: rate, frames, floor-averaged samples") {
    val samples = Array[Short](1000, 2000, -3, -4, 7, 8, 9) // 7 mono frames
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val out = Multimodal.wavResample(baos.toByteArray, 2)
      .getOrElse(fail("AudioSystem-written PCM WAV must take the resample path"))
    assert(Multimodal.wavMeta(out).contains((22050, 1)), "halved rate in header")
    // floor averages incl. the negative-odd case: floor(-7/2) = -4, and
    // the odd trailing frame passes through alone
    val got = (0 until 4).map(i =>
      ((out(44 + 2 * i) & 0xff) | (out(45 + 2 * i) << 8)).toShort)
    assert(got == Seq[Short](1500, -4, 7, 9), s"got $got")
    // ...and the output is a genuine WAV a real decoder accepts
    val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out))
    assert(back.getFormat.getSampleRate == 22050f && back.getFrameLength == 4)
    // non-PCM / malformed payloads refuse the rung
    assert(Multimodal.wavResample("RIFFnope".getBytes("US-ASCII"), 2).isEmpty)
  }

  test("wavChannelStats: exact per-channel stats on a genuine WAV with negative samples") {
    // 2 channels, 3 frames: L = (100, -200, 300), R = (-1, 2, -3)
    val inter = Array[Short](100, -1, -200, 2, 300, -3)
    val pcm = new Array[Byte](inter.length * 2)
    inter.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 3)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val st = Multimodal.wavChannelStats(baos.toByteArray)
      .getOrElse(fail("AudioSystem-written PCM WAV must take the stats path"))
    assert(st.length == 2)
    val l = st(0); val r = st(1)
    assert(l.n_frames == 3 && r.n_frames == 3)
    assert(l.sum_sq == 100L * 100 + 200L * 200 + 300L * 300)
    assert(l.sum_abs_delta == 300L + 500L) // |(-200)-100| + |300-(-200)|
    assert(l.peak_abs == 300L)
    assert(r.sum_sq == 1L + 4 + 9)
    assert(r.sum_abs_delta == 3L + 5L)
    assert(r.peak_abs == 3L)
    // malformed payloads refuse the rung
    assert(Multimodal.wavChannelStats("RIFFnope".getBytes("US-ASCII")).isEmpty)
  }

  test("pngDims reads genuine PNG files (javax.imageio round-trip)") {
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    assert(Multimodal.pngDims(baos.toByteArray).contains((7, 5)),
      "a real ImageIO-written PNG must parse to its true dimensions")
    assert(Multimodal.pngDims("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.pngDims(Array.emptyByteArray).isEmpty)
  }

  test("avgPool is a correct box-filter: floor-means, partial edge blocks, dropped partial row") {
    // 4-wide raster, bytes 0..11 = 3 full rows; byte 12 is a truncated
    // scanline and must be dropped
    val raster = (0 to 12).map(_.toByte).toArray
    val out = Multimodal.avgPool(raster, w = 4, f = 2)
    // blocks: {0,1,4,5}->2  {2,3,6,7}->4  {8,9}->8  {10,11}->10
    assert(out.toSeq == Seq[Byte](2, 4, 8, 10))
    assert(Multimodal.avgPool(Array.emptyByteArray, 4, 2).isEmpty)
    assert(Multimodal.avgPool(Array[Byte](1, 2), 4, 2).isEmpty) // < one row
    // factor 1 is identity on full rows
    assert(Multimodal.avgPool(raster, 4, 1).toSeq == raster.take(12).toSeq)
  }

  test("real compressed PNGs decode, pool, and re-encode as real PNGs (javax.imageio round-trip)") {
    // a REAL zlib-compressed truecolor PNG with encoder-chosen filters
    val (w, h) = (9, 7)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31 + y * 7) % 256 << 16) |
        ((x * 13 + y * 3) % 256 << 8) | (x * 5 + y * 11) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    // decode: inflate + unfilter recovers every pixel
    val Some((dw, dh, bpp, raster)) = Multimodal.pngRasterDecode(png)
    assert((dw, dh, bpp) == (w, h, 3))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((raster(o) & 0xff, raster(o + 1) & 0xff, raster(o + 2) & 0xff) ==
        ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff),
        s"pixel ($x,$y) wrong after inflate+unfilter")
    }

    // resize end-to-end: the output is a REAL PNG any reader decodes,
    // with per-channel box-filtered pixels
    import spark.implicits._
    val out = Multimodal.resizeAssets(
      Seq(Multimodal.Asset(1L, "image", png)).toDF(), 2)
      .as[Multimodal.Asset].head().data
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back != null && back.getWidth == 5 && back.getHeight == 4,
      "resized real PNG must be ImageIO-decodable at pooled dims")
    val pooled = Multimodal.avgPoolInterleaved(raster, w, h, 3, 2)
    for (y <- 0 until 4; x <- 0 until 5) {
      val rgb = back.getRGB(x, y)
      val o = (y * 5 + x) * 3
      assert((pooled(o) & 0xff, pooled(o + 1) & 0xff, pooled(o + 2) & 0xff) ==
        ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff),
        s"pooled pixel ($x,$y) wrong after re-encode round-trip")
    }

    // grayscale: color type 0, one channel
    val gimg = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 6)
      gimg.getRaster.setSample(x, y, 0, (x * 40 + y * 9) % 256)
    val gbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gimg, "png", gbaos)
    val Some((gw, gh, gbpp, graster)) = Multimodal.pngRasterDecode(gbaos.toByteArray)
    assert((gw, gh, gbpp) == (6, 4, 1))
    for (y <- 0 until 4; x <- 0 until 6)
      assert((graster(y * 6 + x) & 0xff) == (x * 40 + y * 9) % 256)
  }

  test("imageAHash: real PNG hashes match the reference block loop; sub-8x8 out of domain") {
    // a real compressed PNG with a deterministic gradient; reference
    // aHash computed by an independent per-block double loop
    val (w, h) = (13, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 17) % 256) << 16)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    // reference: channel 0 of the decoded raster, pixel->block assignment
    val Some((dw, dh, bpp, raster)) = Multimodal.pngRasterDecode(png)
    val sums = Array.fill(64)(0L); val cnts = Array.fill(64)(0L)
    for (y <- 0 until dh; x <- 0 until dw) {
      val i = (y * 8 / dh) * 8 + (x * 8 / dw)
      sums(i) += raster((y * dw + x) * bpp) & 0xff; cnts(i) += 1
    }
    val means = (0 until 64).map(i => sums(i) / cnts(i))
    val g = means.sum / 64
    val want = means.map(m => if (m > g) '1' else '0').mkString
    import spark.implicits._
    val tiny = { // 7x5 < 8x8: out of hash domain
      val im = new java.awt.image.BufferedImage(7, 5,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", b); b.toByteArray
    }
    val out = Multimodal.imageAHash(
      Seq(Multimodal.Asset(1L, "image", png),
        Multimodal.Asset(2L, "image", tiny)).toDF())
      .as[Multimodal.AHashRow].collect()
    assert(out.map(_.asset_id).toSeq == Seq(1L), "tiny image must be skipped")
    assert(out.head.ahash_bits == want, s"got ${out.head.ahash_bits}, want $want")
    assert(out.head.n_bright == want.count(_ == '1').toLong)
  }

  test("pngRasterDecode undoes every scanline filter type (hand-filtered stream)") {
    // 4x5 grayscale raster; one row per filter type 1..4 plus a None row
    val w = 4
    val raster = Array(
      10, 60, 110, 160,
      20, 70, 120, 170,
      35, 85, 135, 185,
      55, 105, 155, 205,
      80, 13, 190, 240).map(_.toByte)
    def px(y: Int, x: Int): Int =
      if (y < 0 || x < 0) 0 else raster(y * w + x) & 0xff
    val filters = Seq(0, 1, 2, 3, 4)
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until 5) {
      filtered.write(filters(y))
      for (x <- 0 until w) {
        val raw = px(y, x); val left = px(y, x - 1)
        val up = px(y - 1, x); val ul = px(y - 1, x - 1)
        val predictor = filters(y) match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        filtered.write((raw - predictor) & 0xff)
      }
    }
    // wrap in real chunks (correct CRCs) around the deflated scanlines
    val dos = new java.io.ByteArrayOutputStream()
    val defl = new java.util.zip.DeflaterOutputStream(dos)
    defl.write(filtered.toByteArray); defl.finish(); defl.close()
    val png = new java.io.ByteArrayOutputStream()
    png.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + 4)
      bb.putInt(data.length).put(tpe.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      png.write(bb.array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(5)
      .put(Array[Byte](8, 0, 0, 0, 0)).array())
    chunk("IDAT", dos.toByteArray)
    chunk("IEND", Array.empty)
    val decoded = Multimodal.pngRasterDecode(png.toByteArray)
    assert(decoded.map(_._4.toSeq).contains(raster.toSeq),
      s"all five filter types must reconstruct exactly, got $decoded")
  }

  test("resize gating: synthetic rasters pool at 33, undecodable real PNGs stride-decimate") {
    // the synthetic fixture layout is detected by its zeroed IHDR CRC
    val synth = Multimodal.assets(spark, sf).limit(50)
      .as[Multimodal.Asset](org.apache.spark.sql.Encoders.product[Multimodal.Asset])
      .collect().filter(_.modality == "image")
    assert(synth.nonEmpty && synth.forall(a => Multimodal.isSyntheticPng(a.data)))
    // a 16-bit PNG parses dims but NOT the 8-bit raster path: it must
    // take stride decimation, never a garbage pool over compressed bytes
    val img16 = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", baos)
    val bytes16 = baos.toByteArray
    assert(Multimodal.pngDims(bytes16).contains((5, 4)))
    assert(!Multimodal.isSyntheticPng(bytes16), "a real encoder writes a nonzero IHDR CRC")
    assert(Multimodal.pngRasterDecode(bytes16).isEmpty, "depth-16 is outside the 8-bit decode")
    import spark.implicits._
    val out = Multimodal.resizeAssets(
      Seq(Multimodal.Asset(9L, "image", bytes16)).toDF(), 2)
      .as[Multimodal.Asset].head().data
    assert(out.length == (bytes16.length + 1) / 2, "fallback must be the honest stride path")
  }

  test("resize: image payloads are re-encoded PNGs with pooled dims; others stride-decimate") {
    val resized = Multimodal.resizeAssets(Multimodal.assets(spark, sf), 2)
      .select(col("asset_id"), col("modality"), col("data")).as[(Long, String, Array[Byte])]
      .collect()
    val orig = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("n")).as[(Long, Int)]
      .collect().toMap
    resized.foreach { case (id, modality, data) =>
      val n = orig(id)
      if (modality == "image") {
        val w = (id % 640 + 1).toInt
        val h = n / w
        val (wOut, hOut) = if (h == 0) (0, 0) else ((w + 1) / 2, (h + 1) / 2)
        assert(Multimodal.pngDims(data).contains((wOut, hOut)),
          s"asset $id: resized payload must be a parseable PNG with pooled dims")
        assert(data.length == 33 + wOut * hOut)
      } else if (modality == "audio") {
        // r7: canonical PCM payloads take the REAL resample — halved
        // rate in a well-formed header, ceil(nf/2) frames, partial
        // trailing frame dropped
        val ch = (id % 2 + 1).toInt
        val align = ch * 2
        val nOut = (n / align + 1) / 2
        assert(data.length == 44 + nOut * align,
          s"asset $id: resampled WAV length")
        assert(Multimodal.wavMeta(data)
          .contains(((8000 + (id % 8) * 1000).toInt / 2, ch)),
          s"asset $id: resampled WAV must carry the halved rate")
      } else {
        assert(data.length == (n + 252 + 1) / 2)
      }
    }
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf))
    assert(frames.groupBy("asset_id").count().agg(max("count")).as[Long].head() <= 3)
  }

  test("sampleFrames: video frames are the stsz/stco-declared slices, clamped at EOF") {
    val text = "0123456789abcdefghijklmnopqrstuvwxyz"
    val id = 5L // id%3==2 (video); sizes 9, 10, 11 from the doc_id arithmetic
    val payload = payloadOf(id, text)
    val df = Seq((id, "video", payload)).toDF("asset_id", "modality", "data")
    val got = Multimodal.sampleFrames(df).orderBy("frame_no")
      .as[(Long, Int, String)].collect()
    val sizes = Seq((id % 13 + 4).toInt, (id % 11 + 5).toInt, (id % 7 + 6).toInt)
    val offs = sizes.scanLeft(252)(_ + _)
    val want = sizes.indices.filter(i => offs(i) < payload.length).map { i =>
      (id, i + 1, payload.slice(offs(i), math.min(offs(i) + sizes(i), payload.length))
        .map(b => f"${b & 0xff}%02X").mkString)
    }
    assert(got.toSeq == want)
    assert(want.nonEmpty && want.head._3 != payload.take(16)
      .map(b => f"${b & 0xff}%02X").mkString, "table walk must differ from stride")
    // a short payload truncates the tail frame and drops past-EOF frames
    val shortP = payloadOf(id, text.take(10))
    val shortGot = Multimodal.sampleFrames(
      Seq((id, "video", shortP)).toDF("asset_id", "modality", "data"))
      .as[(Long, Int, String)].collect()
    assert(shortGot.map(_._2).toSeq == Seq(1, 2) &&
      shortGot.last._3.length == 2 * (shortP.length - 252 - sizes.head))
  }

  test("streaming tumbling agg equals batch tumbling agg") {
    val stream = Streaming.tumblingStream(spark, sf)
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = q("q_events_tumbling")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("registry sanity: unique names, oracles subset of queries, entry>0") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == names.size)
  }

  test("video near-dup recovers EXACTLY the planted 2-of-3-frame twin at this sf") {
    val rows = q("q_dedup_video").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("n_band_frames"), r.getAs[Long]("n_exact_frames")))
    // doc ids at the spec sf stay far below the first natural stride-768
    // collision, so the planted twin must be the ONLY pair — recall and
    // precision in one assertion
    assert(rows.toSeq == Seq((2L, graft.operators.Multimodal.VideoTwinId, 2L, 2L)),
      s"got ${rows.toSeq}")
  }

  test("audio near-dup recovers the trimmed twin with every band shared, no false pairs") {
    import graft.operators.Multimodal
    val rows = q("q_dedup_audio").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Long]("n_shared_bands"), r.getAs[Int]("n_bands_min")))
    // the trimmed twin preserves alignment, so every FULL window is
    // sample-identical and ALL of the smaller fingerprint's bands match
    val twin = rows.find(p => p._1 == 4L && p._2 == Multimodal.AudioTwinId)
    assert(twin.isDefined, s"planted twin missing from ${rows.toSeq}")
    assert(twin.get._3 == twin.get._4.toLong,
      s"twin must share all min-side bands: $twin")
    // precision on this fixture: no pair of DISTINCT base recordings
    // passes the 60% in-place band rule
    val falsePairs = rows.filterNot(p => p._1 == 4L && p._2 == Multimodal.AudioTwinId)
    assert(falsePairs.isEmpty, s"unexpected near-dup pairs: ${falsePairs.toSeq}")
    // and the fingerprint degrades, never fails, on non-audio payloads
    val nonAudio = Multimodal.audioFingerprint(
      Multimodal.assets(spark, sf).filter(col("modality") =!= "audio"))
    assert(nonAudio.count() == 0)
  }

  test("planted twin frames 1-2 decode bit-identical to asset 2, frame 3 differs") {
    val sigs = graft.operators.Multimodal.videoFrameSig(
        graft.operators.Multimodal.videoAssetsPlanted(spark, sf))
      .filter(col("asset_id").isin(2L, graft.operators.Multimodal.VideoTwinId))
      .collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("frame_no")) ->
        r.getAs[String]("sig")).toMap
    assert(sigs((2L, 1)) == sigs((graft.operators.Multimodal.VideoTwinId, 1)))
    assert(sigs((2L, 2)) == sigs((graft.operators.Multimodal.VideoTwinId, 2)))
    assert(sigs((2L, 3)) != sigs((graft.operators.Multimodal.VideoTwinId, 3)))
  }
}
