package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink layer. The reference writes per-(datanode, partition) `repr` text
  * files (`utilities.py:164-167`, `datanode.py:105-106`); the engine's
  * durable format is Parquet, partitioned by a semantic column when the
  * downstream reads are partition-pruned.
  *
  * Scale notes: `partitionBy` on a low-cardinality column gives pruned
  * reads at 100 TB; `maxRecordsPerFile` caps file sizes; writers are
  * task-parallel (one file per task per partition value).
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout, the engine's analog of the
    * reference's `partition_<id>` output dirs. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Compact a small-files directory into ~`targetBytesPerFile` files —
    * the maintenance pass every long-lived 100 TB table needs (streaming
    * sinks and over-parallel writers accrete tiny files; scan cost then
    * goes per-file, not per-byte). The output file count comes from the
    * SOURCE FILE LISTING (metadata only), so the data is read exactly
    * once — a count()-based sizing would scan the table twice. Coalesce
    * when shrinking (shuffle-free), repartition when growing. Writes to
    * a new path: compaction must never destroy its input on failure. */
  def compactTo(spark: org.apache.spark.sql.SparkSession, src: String,
      dst: String, targetBytesPerFile: Long = 128L * 1024 * 1024): Unit = {
    val path = new org.apache.hadoop.fs.Path(src)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(path).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val files = math.max(1L,
      (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
    val df = spark.read.parquet(src)
    val sized = if (files < df.rdd.getNumPartitions) df.coalesce(files)
      else df.repartition(files)
    sized.write.mode(SaveMode.Overwrite).parquet(dst)
  }
}
