package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Or, Predicate}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One file the snapshot manifest serves to the planner: partition value,
  * absolute path, exact byte length (recorded when the immutable file was
  * written — never re-listed), and optional per-column [lo, hi] bounds in
  * CATALYST internal representation (UTF8String for strings, Long micros
  * for timestamps, ...). A bound of None means "unknown on that side" —
  * skipping is always conservative. */
final case class ManifestFile(value: String, path: String, bytes: Long,
    stats: Map[String, (Option[Any], Option[Any])])

/** The log-served [[FileIndex]] a table format plugs into Spark: the
  * manifest's file list IS the index, so a read performs ZERO filesystem
  * listings (contrast [[org.apache.spark.sql.execution.datasources.InMemoryFileIndex]],
  * which lists every root on construction — O(partitions) metadata calls
  * the manifest already paid for at commit time). This is the Delta/Iceberg
  * read shape: plan from the transaction log, trust its recorded sizes.
  *
  * Three pruning layers, all before any data byte is read:
  *  1. the caller can pre-filter entries (manifest-level pruning);
  *  2. `partitionFilters` prune partition groups here (the planner pushes
  *     filters on `partCol` — shown as PartitionFilters in the plan);
  *  3. `dataFilters` prune individual FILES against the manifest's
  *     recorded per-file [lo, hi] column bounds (the zonemap/data-skipping
  *     layer real formats call file skipping — what makes OPTIMIZE
  *     CLUSTER-BY pay: clustered files have narrow disjoint ranges, so a
  *     range predicate selects few files, observable as the scan's
  *     numFiles metric). Unknown filter shapes, missing stats, and any
  *     literal/column type disagreement always fall back to "may match" —
  *     skipping can hide a file only when the recorded bounds PROVE it
  *     irrelevant.
  *
  * `types` records the data type each column's bounds were serialized
  * under (the manifest's schema header); bounds are consulted only when
  * the plan-side attribute agrees, so a stale or evolved column can never
  * cause a miscomparison — just a conservative non-skip. */
final class ManifestFileIndex(
    partCol: String,
    files: Seq[ManifestFile],
    types: Map[String, DataType]) extends FileIndex {

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partCol, StringType, nullable = true)))

  private val groups: Seq[(String, Seq[ManifestFile])] =
    files.groupBy(_.value).toSeq.sortBy(_._1)

  override def rootPaths: Seq[Path] =
    files.map(f => new Path(f.path).getParent).distinct

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val picked =
      if (partitionFilters.isEmpty) groups
      else {
        // exactly one partition column: every attribute in a pushed
        // partition filter is it, bound at ordinal 0
        val pred = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case _: AttributeReference =>
              BoundReference(0, StringType, nullable = true)
          })
        pred.initialize(0)
        groups.filter { case (v, _) =>
          pred.eval(InternalRow(UTF8String.fromString(v)))
        }
      }
    picked.map { case (v, fs) =>
      val kept = if (dataFilters.isEmpty) fs
      else fs.filter(f =>
        dataFilters.forall(ManifestFileIndex.couldMatch(_, f.stats, types)))
      PartitionDirectory(InternalRow(UTF8String.fromString(v)),
        kept.map(f => new FileStatus(f.bytes, false, 1, 128L << 20, 0L,
          new Path(f.path))).toArray)
    }
  }

  override def inputFiles: Array[String] = files.map(_.path).toArray
  override def refresh(): Unit = () // immutable: the manifest never changes
  override def sizeInBytes: Long = files.map(_.bytes).sum
  override def toString: String =
    s"ManifestFileIndex[${files.size} files, ${groups.size} partitions]"
}

object ManifestFileIndex {

  /** bounds are usable only when plan attribute, recorded type, and the
    * literal agree — any disagreement degrades to "no bounds" (never a
    * cross-type comparison) */
  private def boundsOk(a: AttributeReference, litType: DataType,
      types: Map[String, DataType]): Boolean =
    types.get(a.name).contains(a.dataType) && litType == a.dataType

  /** conservative three-valued "could this file hold a matching row":
    * false ONLY when the recorded bounds prove emptiness. NULL semantics:
    * bounds say nothing about nulls, so IsNull/IsNotNull (and any
    * unrecognized shape) return true. Shared by the scan's file skipping
    * (above) and the format's DELETE/UPDATE rewrite-set selection — ONE
    * source of truth for what the recorded bounds can prove. */
  def couldMatch(e: Expression,
      stats: Map[String, (Option[Any], Option[Any])],
      types: Map[String, DataType]): Boolean = {
    def mayMatch(e: Expression,
        stats: Map[String, (Option[Any], Option[Any])]): Boolean = {
    def ord(a: AttributeReference) =
      TypeUtils.getInterpretedOrdering(a.dataType)
    def lo(a: AttributeReference) = stats.get(a.name).flatMap(_._1)
    def hi(a: AttributeReference) = stats.get(a.name).flatMap(_._2)
    // value v can equal some row: lo <= v && v <= hi (unknown side = true)
    def canEq(a: AttributeReference, v: Any): Boolean =
      v != null &&
        lo(a).forall(l => ord(a).lteq(l, v)) &&
        hi(a).forall(h => ord(a).lteq(v, h))
    e match {
      case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
      case Or(l, r) => mayMatch(l, stats) || mayMatch(r, stats)
      case EqualTo(a: AttributeReference, Literal(v, t)) if boundsOk(a, t, types) =>
        canEq(a, v)
      case EqualTo(Literal(v, t), a: AttributeReference) if boundsOk(a, t, types) =>
        canEq(a, v)
      case EqualNullSafe(a: AttributeReference, Literal(v, t)) if boundsOk(a, t, types) =>
        v == null || canEq(a, v)
      case EqualNullSafe(Literal(v, t), a: AttributeReference) if boundsOk(a, t, types) =>
        v == null || canEq(a, v)
      case GreaterThan(a: AttributeReference, Literal(v, t)) if boundsOk(a, t, types) =>
        v != null && hi(a).forall(h => ord(a).gt(h, v))
      case GreaterThan(Literal(v, t), a: AttributeReference) if boundsOk(a, t, types) =>
        v != null && lo(a).forall(l => ord(a).lt(l, v))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, t)) if boundsOk(a, t, types) =>
        v != null && hi(a).forall(h => ord(a).gteq(h, v))
      case GreaterThanOrEqual(Literal(v, t), a: AttributeReference) if boundsOk(a, t, types) =>
        v != null && lo(a).forall(l => ord(a).lteq(l, v))
      case LessThan(a: AttributeReference, Literal(v, t)) if boundsOk(a, t, types) =>
        v != null && lo(a).forall(l => ord(a).lt(l, v))
      case LessThan(Literal(v, t), a: AttributeReference) if boundsOk(a, t, types) =>
        v != null && hi(a).forall(h => ord(a).gt(h, v))
      case LessThanOrEqual(a: AttributeReference, Literal(v, t)) if boundsOk(a, t, types) =>
        v != null && lo(a).forall(l => ord(a).lteq(l, v))
      case LessThanOrEqual(Literal(v, t), a: AttributeReference) if boundsOk(a, t, types) =>
        v != null && hi(a).forall(h => ord(a).gteq(h, v))
      case In(a: AttributeReference, vs)
          if vs.forall(v => v.isInstanceOf[Literal] &&
            boundsOk(a, v.dataType, types)) =>
        vs.exists { case Literal(v, _) => canEq(a, v); case _ => true }
      case InSet(a: AttributeReference, vs)
          if types.get(a.name).contains(a.dataType) =>
        vs.exists(canEq(a, _))
      case _ => true
    }
    }
    mayMatch(e, stats)
  }
}
