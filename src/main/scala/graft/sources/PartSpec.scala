package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The table's PARTITION IDENTITY: an ordered list of typed columns —
  * the generalization (r18) of the format's original one-lifetime
  * StringType partition column. Everywhere the public API says
  * `partCol: String` it now accepts a SPEC STRING:
  *
  *   "region"                       one StringType column (the legacy
  *                                  form — byte-identical manifests)
  *   "day:date"                     one typed column
  *   "day:date,region"              ordered multi-column identity
  *                                  (untyped parts default to string)
  *
  * Supported types are the ones whose external string form round-trips
  * exactly through a directory name and back through a CAST: string,
  * date, int, bigint, smallint, tinyint, boolean. (Timestamps, floats
  * and decimals are deliberately out: their string forms are
  * zone/precision-dependent, the classic partition-value corruption
  * trap real formats also sidestep by restricting identity-partition
  * types.)
  *
  * VALUE ENCODING (what [[Snapshots]] records as each manifest entry's
  * `value` field, grouping key of the whole format):
  *  - single column: the raw external string, exactly as before (a
  *    legacy table's manifests stay byte-identical);
  *  - multi column: each column's external string URL-encoded, joined
  *    with '/'. URL-encoding makes the join unambiguous ('/' itself
  *    encodes as %2F) and starts no value with '#' (header ambiguity)
  *    nor lets one carry a tab into the line-oriented manifest.
  * [[valueExpr]] computes the SAME encoding as a Column (codegen'd
  * `url_encode`/`concat_ws`, no UDF), which is what lets DML span
  * pruning and merge group BY PARTITION without collecting rows.
  *
  * The spec string is recorded verbatim in the manifest's `partCol=`
  * header; non-legacy specs stamp `minReader=3` so a pre-r18 reader
  * fails with a pointed upgrade error instead of resolving a column
  * literally named "day:date,region". */
private[graft] final case class PartSpec(cols: Seq[StructField]) {
  require(cols.nonEmpty, "PartSpec: at least one partition column")
  require(cols.map(_.name).distinct.size == cols.size,
    s"PartSpec: duplicate partition column in ${cols.map(_.name)}")

  val names: Seq[String] = cols.map(_.name)

  /** the pre-r18 shape: one StringType column, bare-name encode,
    * reader version 1 manifests */
  def isLegacy: Boolean =
    cols.size == 1 && cols.head.dataType == StringType

  /** the spec string as recorded in the `partCol=` manifest header —
    * bare name for the legacy shape (byte-compat), `name:type` list
    * otherwise */
  def encode: String =
    if (isLegacy) names.head
    else cols.map(f => s"${f.name}:${f.dataType.typeName}").mkString(",")

  /** the scan-side partition schema (nullable — parquet partition
    * columns are nullable in Spark's HadoopFsRelation contract) */
  def struct: StructType =
    StructType(cols.map(f => StructField(f.name, f.dataType, nullable = true)))

  /** the ENCODED compound partition value of a row, as a codegen'd
    * Column — must agree byte-for-byte with [[Snapshots]]' entry-value
    * assembly from directory names (single: raw cast-to-string; multi:
    * URL-encoded '/'-join; `url_encode` is java.net.URLEncoder
    * semantics, the same encoder the driver-side assembly uses) */
  def valueExpr: Column =
    if (cols.size == 1) col(names.head).cast("string")
    else concat_ws("/",
      cols.map(f => url_encode(col(f.name).cast("string"))): _*)

  /** decode an entry's encoded value back into per-column external
    * strings, in spec order */
  def split(value: String): Seq[String] =
    if (cols.size == 1) Seq(value)
    else value.split("/", -1).toSeq
      .map(java.net.URLDecoder.decode(_, "UTF-8"))

  /** re-encode per-column external strings into the entry-value form —
    * the exact inverse of [[split]] */
  def join(values: Seq[String]): String = {
    require(values.size == cols.size,
      s"PartSpec: ${cols.size} partition columns, got ${values.size} values")
    if (cols.size == 1) values.head
    else values.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("/")
  }
}

private[graft] object PartSpec {

  /** external type names accepted in a spec string (SQL simple names) */
  private val typeFor: Map[String, DataType] = Map(
    "string" -> StringType, "date" -> DateType,
    "int" -> IntegerType, "integer" -> IntegerType,
    "bigint" -> LongType, "long" -> LongType,
    "smallint" -> ShortType, "short" -> ShortType,
    "tinyint" -> ByteType, "byte" -> ByteType,
    "boolean" -> BooleanType)

  def supported(dt: DataType): Boolean = typeFor.values.exists(_ == dt)

  def supportedTypeNames: String =
    "string, date, int, bigint, smallint, tinyint, boolean"

  /** parse a spec string (see class doc). A bare name is one StringType
    * column — the legacy form every pre-r18 call site already passes. */
  def parse(spec: String): PartSpec = {
    require(spec != null && spec.trim.nonEmpty,
      "PartSpec: empty partition spec")
    // split with -1 so a TRAILING separator surfaces as an empty
    // component and refuses loudly — String.split's default drops
    // trailing empties, which silently parsed the typo "day:" as an
    // untyped StringType column (and "a,,b" as a column named "")
    PartSpec(spec.split(",", -1).toSeq.map(_.trim).map { part =>
      part.split(":", -1).toSeq.map(_.trim) match {
        case Seq(name) if name.nonEmpty =>
          StructField(name, StringType, nullable = false)
        case Seq(name, tpe) if name.nonEmpty && tpe.nonEmpty =>
          val dt = typeFor.getOrElse(tpe.toLowerCase(java.util.Locale.ROOT),
            throw new IllegalArgumentException(
              s"PartSpec: unsupported partition type '$tpe' for '$name' — " +
                s"supported: $supportedTypeNames"))
          StructField(name, dt, nullable = false)
        case _ => throw new IllegalArgumentException(
          s"PartSpec: malformed component '$part' in '$spec' " +
            "(want name or name:type)")
      }
    })
  }

  /** a spec from already-typed fields (the catalog's CREATE TABLE path) */
  def fromFields(fields: Seq[StructField]): PartSpec = {
    fields.foreach { f =>
      require(supported(f.dataType),
        s"PartSpec: partition column '${f.name}' has unsupported type " +
          s"${f.dataType.simpleString} — supported: $supportedTypeNames")
    }
    PartSpec(fields.map(f => StructField(f.name, f.dataType, nullable = false)))
  }

  /** a raw external string -> the CATALYST internal value of `dt`
    * (UTF8String / days-int / int / ...), via the real Cast so the
    * conversion can never drift from the engine's own — what binds
    * partition values into [[org.apache.spark.sql.graftbridge.ManifestFileIndex]]
    * rows and per-file pseudo-bounds */
  def castInternal(dt: DataType, s: String): Any =
    org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType),
      dt, Some("UTC")).eval(null)
}
