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

  private def payloadOf(id: Long, text: String): Array[Byte] = {
    val t = text.getBytes("UTF-8")
    if (id % 3 == 0) pngHeader(id) ++ t
    else if (id % 3 == 1) wavHeader(id, t.length) ++ t
    else t
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
      // image rows: REAL IHDR parse recovers the constructed dims;
      // audio rows: REAL WAV fmt parse recovers rate/channels;
      // video: the documented stub arithmetic
      if (id % 3 == 0) {
        assert(r.getInt(4) == (id % 640 + 1).toInt, s"width of image $id")
        assert(r.getInt(5) == (id % 480 + 1).toInt, s"height of image $id")
        assert(r.getInt(6) == 0 && r.getInt(7) == 0)
      } else if (id % 3 == 1) {
        assert(r.getInt(4) == 0 && r.getInt(5) == 0)
        assert(r.getInt(6) == (id % 8 * 1000 + 8000).toInt, s"rate of audio $id")
        assert(r.getInt(7) == (id % 2 + 1).toInt, s"channels of audio $id")
      } else {
        assert(r.getInt(4) == (sum % 640).toInt + 1)
        assert(r.getInt(5) == (sum % 480).toInt + 1)
        assert(r.getInt(6) == 0 && r.getInt(7) == 0)
      }
      assert(r.getString(8) == payload.take(8)
        .map(b => f"${b & 0xff}%02X").mkString)                       // frame_hex
    }
    // modality partitioning is total
    assert(feats.select("modality").distinct().count() == 3)
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

  test("resize stub halves payloads; frames cover payload prefixes") {
    val resized = Multimodal.resizeAssets(Multimodal.assets(spark, sf), 2)
    val lens = resized.select(length(col("data")).as("n")).as[Int].collect()
    val orig = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("n")).as[(Long, Int)].collect()
    val expected = orig.map { case (id, n) =>
      val full = if (id % 3 == 0) n + 33 else if (id % 3 == 1) n + 44 else n
      (full + 1) / 2
    }
    assert(lens.sorted.toSeq == expected.sorted.toSeq)
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf))
    assert(frames.groupBy("asset_id").count().agg(max("count")).as[Long].head() <= 3)
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
}
