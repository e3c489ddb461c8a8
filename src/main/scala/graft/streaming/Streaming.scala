package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryDef

/** Structured Streaming layer. The reference is strictly batch with
  * blocking phase barriers (`namenode.py:425-440`); here the same tumbling
  * aggregation runs through `readStream` -> windowed agg -> memory sink,
  * and must agree exactly with the batch twin (`q_events_tumbling` shares
  * the oracle SQL).
  *
  * In production this is `readStream.format("kafka"/"parquet")` with a
  * watermark bounding state; for the bounded-replay check we use complete
  * mode so the full result is observable. State is keyed by
  * (window, event_type) — partitioned by the shuffle like any groupBy.
  */
object Streaming {

  def tumblingStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val name = "stream_tumbling_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // the file-stream source wants a directory: stream the sf dir, glob
    // down to the events table
    val agg = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.decOut(sum(col("value").cast("decimal(38,10)"))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_events_tumbling_stream",
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |""".stripMargin) { (s, d) => tumblingStream(s, d) }
  )
}
