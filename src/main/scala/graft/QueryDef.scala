package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Column names/aliases MUST
  * match between `fn`'s output and `oracle`'s projection — the driver
  * sorts columns by name before hash-comparing values.
  *
  * Oracle-exactness rules used throughout this codebase (the full
  * rationale lives on graft.Exact):
  *  - sums over `double` columns accumulate as `decimal(38,10)` in BOTH
  *    engines (exact, order-independent addition), and a decimal NEVER
  *    leaves a query: the final projection is `Exact.decOut` ==
  *    `CAST(round(x, 4) AS DOUBLE)` (DuckDB's pandas path renders
  *    decimals as float64 and its decimal->double cast mis-rounds above
  *    2^52 unscaled; DuckDB's decimal CAST also truncates, so scale
  *    changes go through round());
  *  - averages are `decOut(decimal_sum) / count` in both engines;
  *  - raw double columns pass through untouched (bit-identical storage);
  *    double folds mirror DuckDB's list_reduce left-fold order;
  *  - sketches/samplers hash with `Exact.h60` (md5-prefix 60-bit), which
  *    the oracle states verbatim — candidate generation matches exactly;
  *  - approximate operators are checked via CONTRACT (exact value + a
  *    tolerance/recall assertion the oracle states as a constant);
  *  - every window/top-k ordering carries a full unique tie-break key;
  *    no array columns and no libm functions (pow/exp/ln) in outputs.
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

  def apply(name: String, oracle: String, bench: Boolean)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), bench)

  /** non-SQL-expressible op: driver records a weaker rows-only check */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
