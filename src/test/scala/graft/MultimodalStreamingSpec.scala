package graft

import graft.operators.Multimodal
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Multimodal plumbing + batch/stream agreement. */
class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal features are deterministic byte-derived values") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sf))
    val byId = feats.collect().map(r => r.getLong(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    docs.take(20).foreach { case (id, text) =>
      val r = byId(id)
      assert(r.getInt(2) == text.getBytes("UTF-8").length)           // n_bytes
      assert(r.getLong(3) == text.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum) // checksum
      assert(r.getString(6) == text.getBytes("UTF-8").take(8)
        .map(b => f"${b & 0xff}%02X").mkString)                       // frame_hex
    }
    // modality partitioning is total
    assert(feats.select("modality").distinct().count() == 3)
  }

  test("resize stub halves payloads; frames cover payload prefixes") {
    val resized = Multimodal.resizeAssets(Multimodal.assets(spark, sf), 2)
    val lens = resized.select(length(col("data")).as("n")).as[Int].collect()
    val orig = graft.sources.Tables.documents(spark, sf)
      .select(length(col("text"))).as[Int].collect()
    assert(lens.sorted.toSeq == orig.map(n => (n + 1) / 2).sorted.toSeq)
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
