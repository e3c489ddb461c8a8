package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer: the driver's parquet star schema (TESTDATA.md) plus the
  * reference's text-directory input convention.
  *
  * Reference equivalent: the flat input directory of plain-text files at
  * `fs/input/<job>/` listed by `tools.py:147-154` and read line-by-line at
  * `datanode.py:598-603`. Here every durable dataset is columnar parquet so
  * scans get predicate pushdown + column pruning for free.
  */
object Tables {

  /** Recover scan parallelism lost to UNSPLITTABLE inputs (optimization
    * guide §2.5, "input skew ... one huge unsplittable file: repartition
    * immediately after the read"). The driver's fixture tables are
    * single-row-group parquet files, and a parquet row group is the
    * reader's minimum split — so a bare scan plans ONE input partition
    * and every pipelined map-side step (tokenize, explode, hashing,
    * partial aggregation) runs on ONE core at any local[N] (measured
    * r18: the 15-sum decimal aggregate of q_quality_corr saturated a
    * single task while 31 cores idled).
    *
    * Posture (r19, reversing r18): OPT-IN PER CALL SITE, default OFF.
    * r18 shipped this on-by-default for every read ≥256 KiB and the
    * blanket round-robin exchange taxed ~50 cheap single-pass queries
    * (+17 s beyond box weather in the driver's own low-load run —
    * q_sort_limit shuffled all of orders before a top-10, q_scalar_math
    * paid +0.6 s to project lineitem). The exchange only pays for
    * itself where the map side above the scan is measurably CPU-bound;
    * those call sites pass `fanOut = true` (each cites its A/B). The
    * `spark.graft.scan.parallelize` conf remains as a global override
    * for experiments (unset → call-site choice; true/false → force).
    *
    * Scale posture: at production scale inputs carry many row groups,
    * `parts * 2 > cores` holds, and even opted-in reads stay
    * zero-shuffle — the heuristic only fires where the alternative is
    * a serial map side. `spark.graft.scan.parallelizeMinBytes`
    * (default 256 KiB) keeps broadcast-sized tables out.
    *
    * Determinism: every registry query is partition-layout-independent
    * by repo discipline (portable h60 hashing, exact decimal sums,
    * fully tie-broken windows), so round-robin placement cannot perturb
    * any result — re-verified against the full DuckDB oracle. */
  private def scanParallel(spark: SparkSession, df: DataFrame,
      sizeBytes: Long, fanOut: Boolean): DataFrame = {
    val on = spark.conf.getOption("spark.graft.scan.parallelize")
      .flatMap(_.toBooleanOption).getOrElse(fanOut)
    val minBytes = spark.conf.getOption("spark.graft.scan.parallelizeMinBytes")
      .map(_.toLong).getOrElse(256L << 10)
    if (!on || sizeBytes < minBytes) df
    else {
      val cores = spark.sparkContext.defaultParallelism
      val parts = df.rdd.getNumPartitions
      if (parts * 2 > cores) df else df.repartition(cores)
    }
  }

  /** On-disk bytes of a parquet path: file length, or the sum of
    * part-file lengths when the path is a directory (the standard
    * Spark-written layout — a bare File.length() there reads ~4 KiB
    * and would silently disable the fan-out heuristic). */
  private def parquetBytes(path: String): Long =
    try {
      val f = new java.io.File(path)
      if (f.isDirectory)
        f.listFiles().iterator.filter(_.isFile)
          .filterNot(_.getName.startsWith("_")).map(_.length()).sum
      else f.length()
    } catch { case _: Throwable => 0L }

  def table(spark: SparkSession, dir: String, name: String,
      fanOut: Boolean = false): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    if (!fanOut &&
        spark.conf.getOption("spark.graft.scan.parallelize").isEmpty) df
    else scanParallel(spark, df, parquetBytes(path), fanOut)
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The driver's `events.ts` storage type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark reads as a nanos-since-
    * epoch BIGINT under the legacy flag set in [[events]]) vs plain
    * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ). Normalize either encoding of a `ts` column to the
    * session-zone TimestampType — every engine session pins the session
    * zone to UTC, so all three paths denote the same microsecond instant
    * and match DuckDB's `CAST(ts AS TIMESTAMP)` (naive micros) exactly.
    * Works on batch and streaming frames alike (schema-only dispatch). */
  def withEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Reference-style source: directory of plain text files, one row per line
    * (`spark.read.text`), mirroring `datanode.py:598-603`'s file reader. */
  def textDir(s: SparkSession, dir: String): DataFrame = s.read.text(dir)
}
