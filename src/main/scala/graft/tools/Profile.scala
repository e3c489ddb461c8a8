package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE registered query repeatedly (same session config as
  * graft.Bench) and optionally dump its formatted plan — the feedback loop
  * for "is this the plan I'd want at 100 TB", per query instead of per
  * bench run.
  *
  * Usage: runMain graft.tools.Profile <queryName> [reps] [explain]
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    // both optionals work alone: "Profile q_x explain" must not NPE on
    // args(1).toInt — take the first arg that parses as an int
    val reps = args.drop(1).flatMap(_.toIntOption).headOption.getOrElse(3)
    val doExplain = args.contains("explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions()(_))
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.stopTimeout", "30s")
      .config("spark.ui.enabled", "false")
    // A/B harness: semicolon-separated k=v pairs, e.g.
    // SPARK_GRAFT_CONF_EXTRA='spark.sql.join.preferSortMergeJoin=false'
    sys.env.get("SPARK_GRAFT_CONF_EXTRA").foreach(
      _.split(';').filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    if (doExplain) graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
