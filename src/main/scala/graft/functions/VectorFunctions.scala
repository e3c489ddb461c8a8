package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (no UDFs). All arithmetic is promoted to double
  * before accumulating, left-to-right — matching DuckDB's
  * `list_cosine_similarity(CAST(... AS DOUBLE[]), ...)` evaluation.
  */
object VectorFunctions {

  def toDoubleArr(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArr(a), toDoubleArr(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(toDoubleArr(a), lit(0.0), (acc, v) => acc + v * v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Deterministic pseudo-random hyperplane dot product for sign-LSH:
    * plane j's component i is derived from the portable md5-60 hash of
    * "j_i", uniform in [-1, 1]. No stored model, reproducible on any
    * cluster — and exactly mirrorable in the DuckDB oracle
    * (`('0x'||substr(md5(j||'_'||i),1,15))::BIGINT % 1001`). */
  def planeDot(v: Column, j: Int): Column =
    aggregate(
      zip_with(toDoubleArr(v), sequence(lit(0), size(v) - 1),
        (x, i) => x * ((graft.Exact.h60(concat(lit(j.toString), lit("_"), i.cast("string")))
          % 1001 - 500).cast("double") / 500.0)),
      lit(0.0), (acc, x) => acc + x)

  /** sign-LSH bucket id from `bits` hyperplanes (bit j = sign(v . plane_j));
    * `seedBase` shifts the plane family so several independent hash tables
    * can be built (multi-table LSH = the recall lever). */
  def lshBucket(v: Column, bits: Int, seedBase: Int = 0): Column =
    (0 until bits).map(j => when(planeDot(v, seedBase + j) > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)

  /** One row per (table, bucket) membership: multi-table sign-LSH.
    * Candidates = rows sharing (table, bucket) in ANY of the `tables`
    * independent tables; P(candidate) = 1 - (1 - p^bits)^tables. */
  def lshTables(v: Column, bits: Int, tables: Int): Column =
    explode(array((0 until tables).map(t =>
      struct(lit(t).as("t"), lshBucket(v, bits, t * bits).as("b"))): _*))
}
