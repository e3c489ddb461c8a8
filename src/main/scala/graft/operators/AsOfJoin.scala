package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of join: for each left row, the single most recent right row with
  * `right.ts <= left.ts` within the same key.
  *
  * Spark-first formulation: instead of a range join (which explodes to
  * |L|x|R| per key before picking the max) we UNION the two sides, tag them,
  * and take a running `last(right_value, ignoreNulls)` over a window ordered
  * by (ts, side, id). Cost at scale: ONE shuffle on the key + a sort within
  * partitions — linear in |L|+|R|, no pair blow-up, skew handled by AQE.
  * Ties on ts are broken right-before-left (so an equal-timestamp right row
  * is visible, matching <=), then by id (largest id wins).
  */
object AsOfJoin {

  /** @param left   (key, ts, leftId) rows
    * @param right  (key, ts, rightId) rows
    * @return left rows + `asof_id` = matching rightId (null if no prior row)
    *
    * Column requirements: both frames expose `key` and `ts`; `left` has
    * `left_id`, `right` has `right_id`.
    */
  private def tag(left: DataFrame, right: DataFrame): DataFrame =
    right.select(col("key"), col("ts"), lit(null).cast("long").as("left_id"),
        col("right_id"), lit(0).as("side"))
      .unionByName(
        left.select(col("key"), col("ts"), col("left_id"),
          lit(null).cast("long").as("right_id"), lit(1).as("side")))

  /** Backward (asc) and forward (desc) share one directional kernel: the
    * running last-right-row over a (ts, side, id) sort; equal-ts right
    * rows sort before left either way so <= / >= semantics hold. */
  private def asOfDirectional(left: DataFrame, right: DataFrame,
      backward: Boolean): DataFrame = {
    val idOrd = coalesce(col("right_id"), col("left_id"))
    val w = Window.partitionBy("key")
      .orderBy(
        (if (backward) col("ts").asc else col("ts").desc) +:
          col("side").asc +:
          Seq(if (backward) idOrd.asc else idOrd.desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tag(left, right)
      .withColumn("asof_id", last(col("right_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("key"), col("ts"), col("left_id"), col("asof_id"))
  }

  def asOf(left: DataFrame, right: DataFrame): DataFrame =
    asOfDirectional(left, right, backward = true)

  /** Forward as-of: the single EARLIEST right row with `right.ts >=
    * left.ts` per key — the same union+window shape over a descending
    * sort. Equal-ts right rows are visible (matching >=); ties pick the
    * smallest right id. */
  def asOfForward(left: DataFrame, right: DataFrame): DataFrame =
    asOfDirectional(left, right, backward = false)

  /** Nearest as-of: whichever of the backward/forward matches is closer
    * in time (ties -> backward). Two window passes over the SAME
    * key-partitioning — Catalyst reuses one exchange and sorts twice;
    * still no pair blow-up, still linear. `ts` must be a timestamp. */
  def asOfNearest(left: DataFrame, right: DataFrame): DataFrame = {
    val rightTs = when(col("side") === 0, unix_micros(col("ts")))
    val idOrd = coalesce(col("right_id"), col("left_id"))
    val wB = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("side").asc, idOrd.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("key")
      .orderBy(col("ts").desc, col("side").asc, idOrd.desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tag(left, right)
      .withColumn("b_id", last(col("right_id"), ignoreNulls = true).over(wB))
      .withColumn("b_ts", last(rightTs, ignoreNulls = true).over(wB))
      .withColumn("f_id", last(col("right_id"), ignoreNulls = true).over(wF))
      .withColumn("f_ts", last(rightTs, ignoreNulls = true).over(wF))
      .filter(col("side") === 1)
      .withColumn("asof_id",
        when(col("b_id").isNull, col("f_id"))
          .when(col("f_id").isNull, col("b_id"))
          .when(unix_micros(col("ts")) - col("b_ts")
            <= col("f_ts") - unix_micros(col("ts")), col("b_id"))
          .otherwise(col("f_id")))
      .select(col("key"), col("ts"), col("left_id"), col("asof_id"))
  }
}
