package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout co-located joins — the 100 TB answer to "this join
  * shuffles the fact table every single run".
  *
  * Writing both sides bucketed (and sorted) by the join key fixes their
  * physical partitioning at WRITE time: a later equi-join on that key
  * reads matching buckets pairwise, so the sort-merge join needs NO
  * Exchange on either side (asserted in PlanShapeSpec, with broadcast
  * disabled so the shuffle-free shape is proven, not lucky). At scale the
  * shuffle this removes is the dominant cost of every fact-to-fact join
  * on the same key — pay it once at ingest, never again per query.
  *
  * The reference pins partition count at config level
  * (`config.py:25-27`, 100 partitions) and co-locates reduces with map
  * output via its schedule plans (`namenode.py:176-341`); bucketing is
  * the declarative Spark equivalent: layout carries the partitioning,
  * the optimizer proves it, no scheduler logic required.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted by `key` —
    * one shuffle now, zero on every future join/agg on `key`.
    *
    * Drops any previous incarnation first, INCLUDING an orphan warehouse
    * directory a killed JVM's in-memory catalog left behind (saveAsTable
    * refuses to create over an unregistered location). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, table)
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
    }
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Equi-join two tables previously written with [[writeBucketed]] on the
    * same key and bucket count. Spark's bucketing rules line the buckets
    * up — the plan is a zip of per-bucket sort-merge joins. The join
    * condition is built from the SAME Dataset instances that become the
    * join children (fresh `s.table()` lookups only resolve while the
    * relation cache returns identical attribute ids); a self-join gets
    * aliases so Spark's ambiguity detection can tell the sides apart. */
  def colocatedJoin(s: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val (l, r) =
      if (left == right)
        (s.table(left).alias("l"), s.table(right).alias("r"))
      else (s.table(left), s.table(right))
    l.join(r, l(leftKey) === r(rightKey))
  }
}
