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
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val tagged =
      right.select(col("key"), col("ts"), lit(null).cast("long").as("left_id"),
          col("right_id"), lit(0).as("side"))
        .unionByName(
          left.select(col("key"), col("ts"), col("left_id"),
            lit(null).cast("long").as("right_id"), lit(1).as("side")))
    val w = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("side").asc, coalesce(col("right_id"), col("left_id")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_id", last(col("right_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("key"), col("ts"), col("left_id"), col("asof_id"))
  }
}
