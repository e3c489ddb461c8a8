package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR. Each query is forced through the `noop` sink so the
  * full output (including projections a bare count() would prune) is
  * materialized. An untimed warm-up touches every table first so
  * page-cache/codegen cold cost doesn't land on whichever query runs
  * first. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warm-up: one scan per table (page cache + footers)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try graft.sources.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    // untimed warm-up: JIT/codegen for agg + window + join shapes, so the
    // first timed query doesn't absorb ~10 s of compiler cold start
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = spark.range(200000)
        .select(col("id"), (col("id") % 7).as("k"), (col("id") % 1000).cast("double").as("v"))
      r.groupBy("k").agg(sum(col("v").cast("decimal(38,10)")), count(lit(1)),
        countDistinct(col("v"))).collect()
      r.select(col("k"), row_number().over(
        Window.partitionBy("k").orderBy(col("id"))).as("rn"))
        .agg(max("rn")).collect()
      r.join(broadcast(r.limit(100).withColumnRenamed("id", "id2")),
        col("k") === col("id2") % 7).count()
    } catch { case _: Throwable => () }

    // Two timed passes, min per query: pass 1 absorbs per-query codegen/
    // JIT cold cost (observed 1.5-10x run-to-run swings on identical
    // plans), pass 2 measures warm throughput — the number comparable
    // across rounds. A failed query records -1 (visible breakage), never
    // a phantom ~0s.
    val benchDefs = SparkEntry.defs.filter(_.bench)
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    // pass 2 is skipped if pass 1 already burned the time budget — a
    // slammed box must still emit the JSON line, never time out silently
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "240").toDouble
    val tStart = System.nanoTime()
    def elapsedS = (System.nanoTime() - tStart) / 1e9
    for (pass <- 1 to 2; qd <- benchDefs; if pass == 1 || elapsedS < budgetS) {
      val t0 = System.nanoTime()
      val t =
        try { SparkEntry.queries(qd.name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${qd.name} FAILED: ${e.getMessage}"); -1.0 }
      val prev = best.getOrElse(qd.name, Double.MaxValue)
      best(qd.name) = if (t < 0 || prev < 0) -1.0 else math.min(prev, t)
    }
    val results = best.toSeq
    def r3(v: Double): String = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$nFail,"queries":$qs,"sf":"$sfDir"}"""
    // the driver parses this from the tail of captured stdout: keep the
    // line compact (2-decimal times) and emit it LAST, after spark.stop()'s
    // shutdown logging, so nothing can push it out of the tail window
    spark.stop()
    println(line)
    Console.flush()
  }
}
