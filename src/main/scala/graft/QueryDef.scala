package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Column names/aliases MUST
  * match between `fn`'s output and `oracle`'s projection — the driver
  * sorts columns by name before hash-comparing values.
  *
  * Oracle-exactness rules used throughout this codebase:
  *  - sums over `double` columns are computed as `sum(cast(x as decimal(38,10)))`
  *    in BOTH engines: double->decimal rounding is identical (no exact decimal
  *    ties exist for binary doubles) and decimal addition is exact and
  *    order-independent — so shuffle/aggregation order can't perturb results;
  *  - averages are expressed as `cast(decimal_sum as double) / count` in both;
  *  - raw double columns pass through untouched (bit-identical storage);
  *  - every window/top-k ordering carries a full unique tie-break key.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are timed by graft.Bench */
    bench: Boolean = true)

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** non-SQL-expressible op: driver records a weaker rows-only check */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
