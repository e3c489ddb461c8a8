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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default. Read it as nanos-since-epoch long and floor-divide to a
    * microsecond timestamp — identical to DuckDB's `CAST(ts AS TIMESTAMP)`
    * (TIMESTAMP_NS -> TIMESTAMP truncation), so oracle time comparisons
    * agree exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Reference-style source: directory of plain text files, one row per line
    * (`spark.read.text`), mirroring `datanode.py:598-603`'s file reader. */
  def textDir(s: SparkSession, dir: String): DataFrame = s.read.text(dir)
}
