package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** The SQL surface of the [[Snapshots]] table format — a DataSource
  * registration so `VERSION AS OF` reads run as plain SQL text like
  * every other capability, instead of Scala-API-only:
  *
  * {{{
  * CREATE TEMPORARY VIEW orders_v3
  * USING graft_snapshot
  * OPTIONS (path '/tables/orders', partCol 'region', versionAsOf '3');
  * SELECT region, count(*) FROM orders_v3 GROUP BY region;
  * }}}
  *
  * Options:
  *  - `path` (required): the table directory
  *  - `partCol` (required): the format's partition column
  *  - `versionAsOf` (optional): pin the read to a version number
  *  - `timestampAsOf` (optional): pin to the latest version committed at
  *    or before this time — epoch millis, or `yyyy-MM-dd HH:mm:ss[.SSS]`
  *    UTC (Delta's TIMESTAMP AS OF rule, resolved by
  *    [[Snapshots.versionAt]] from each manifest's recorded commit time)
  *  - neither: the view tracks... nothing — the LATEST version is
  *    resolved ONCE, at view creation, which is exactly the snapshot-
  *    isolation semantics a pinned reader wants (re-create the view, or
  *    use the Scala API, to see later commits)
  *
  * Deliberately a DataSource V1 [[RelationProvider]], not a V2
  * TableProvider: V1's contract returns a [[BaseRelation]], so this can
  * hand Spark the SAME `HadoopFsRelation` over the manifest-served file
  * index that [[Snapshots.read]] plans — the planner sees one
  * FileSourceScan with PartitionFilters, column pruning, parquet
  * pushdown, and per-file bounds skipping, identical to the Scala API's
  * plan (PlanShapeSpec pins this). A V2 TableProvider would interpose a
  * custom Batch/PartitionReader and re-implement parquet reading for
  * strictly less plan integration. (The format's STREAMING surface, where
  * V1's getBatch-as-DataFrame is likewise the Delta-precedented shape, is
  * [[SnapshotChangeFeedSource]].)
  */
class SnapshotSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft_snapshot"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    def opt(k: String): Option[String] =
      parameters.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
    def req(k: String): String = opt(k).getOrElse(throw new IllegalArgumentException(
      s"graft_snapshot: option '$k' is required"))
    val dir = req("path")
    // `history 'true'`: the DESCRIBE HISTORY audit view as a relation —
    // (version, ts_millis, op, n_partitions, n_files, bytes), manifests
    // only, resolved at view creation like a version pin
    if (opt("history").exists(_.equalsIgnoreCase("true"))) {
      val df = Snapshots.history(spark, dir)
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema = df.schema
        private val rows = df.collect() // O(live versions) tiny rows
        override def buildScan() = ctx.sparkContext.parallelize(rows.toSeq)
      }
    }
    val partCol = req("partCol")
    val version = (opt("versionAsOf"), opt("timestampAsOf")) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "graft_snapshot: versionAsOf and timestampAsOf are mutually exclusive")
      case (Some(v), None) => v.toLong
      case (None, Some(ts)) =>
        Snapshots.versionAt(spark, dir, SnapshotSource.parseTs(ts))
      case (None, None) => Snapshots.currentVersion(spark, dir)
    }
    Snapshots.relationAt(spark, dir, partCol, version)
  }
}

object SnapshotSource {
  /** epoch millis, or a `yyyy-MM-dd HH:mm:ss[.SSS]` / ISO-8601 instant
    * read as UTC — the session-timezone-free forms a reproducible
    * time-travel pin wants */
  private[sources] def parseTs(ts: String): Long = {
    val t = ts.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
    else try java.time.Instant.parse(t).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime
          .parse(t.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
  }
}
