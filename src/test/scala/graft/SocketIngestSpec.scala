package graft

import graft.streaming.Streaming

/** Live external ingestion: a real ServerSocket feeds Spark's socket
  * source and the windowed aggregation must land the exact counts/sums —
  * the one streaming path that exercises an actual network feed instead
  * of a file replay. */
class SocketIngestSpec extends SparkSpec {

  test("socket ingestion: live TCP lines land in exact windowed aggregates") {
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    // two 1h windows: 3 clicks + 1 purchase in hour 0, 2 clicks in hour 1
    val h0 = 0L
    val h1 = 3600L * 1000000L
    val lines = Seq(
      s"$h0,click,1.5", s"${h0 + 60000000L},click,2.0",
      s"${h0 + 120000000L},click,2.5", s"${h0 + 180000000L},purchase,10.0",
      s"$h1,click,4.0", s"${h1 + 60000000L},click,5.0")
    @volatile var writerErr: Throwable = null
    val writer = new Thread(() =>
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        // keep the connection open until the stream has drained; closing
        // early makes the source error the query
        Thread.sleep(30000)
        sock.close()
      } catch { case e: Throwable => writerErr = e })
    writer.setDaemon(true)
    writer.start()

    val name = "sock_agg_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = Streaming.socketIngest(spark, "localhost", port)
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      // poll: socket delivery is asynchronous, so wait for the expected
      // aggregate rather than processAllAvailable (which only covers data
      // the source has already RECEIVED)
      val deadline = System.nanoTime() + 60L * 1000000000L
      var rows = Set.empty[(java.sql.Timestamp, String, Long, Double)]
      val expected = Set(
        (new java.sql.Timestamp(0L), "click", 3L, 6.0),
        (new java.sql.Timestamp(0L), "purchase", 1L, 10.0),
        (new java.sql.Timestamp(3600L * 1000L), "click", 2L, 9.0))
      while (rows != expected && System.nanoTime() < deadline) {
        Thread.sleep(250)
        rows = spark.table(name).collect().map(r =>
          (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      }
      assert(writerErr == null, s"feed thread failed: $writerErr")
      assert(rows == expected,
        s"socket-fed windowed agg mismatch after 60s:\n got $rows\n want $expected")
    } finally {
      q.stop()
      server.close()
    }
  }
}
