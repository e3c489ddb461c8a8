package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.LogicalRDD

/** Column <-> Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so this
  * object lives inside the sql package tree — the standard pattern used by
  * Spark extension libraries to expose native Catalyst expressions as
  * `Column`s. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Clamp the carried `originStats` of a checkpointed frame.
    *
    * `Dataset.localCheckpoint` wraps the materialized RDD in a
    * [[LogicalRDD]] that REMEMBERS the origin plan's estimated
    * statistics. Useful for one-shot checkpoints — but in an iterative
    * join loop those estimates compound multiplicatively round over
    * round (round r's sizeInBytes is a product of round r-1 frames), so
    * by a dozen rounds the driver is multiplying million-bit BigInts
    * inside every stats visit and planning takes minutes (measured:
    * communityMerge rounds=12 never finished; clamped it's seconds).
    * Clamping at Long.MaxValue (== defaultSizeInBytes's ceiling) keeps
    * SMALL frames' real estimates — auto-broadcast still fires for
    * genuinely-small sides — while bounding the compounding: every
    * round's products are over <= 2^63 leaves, then re-clamped here, so
    * stats stay a few hundred bits at ANY round count. rowCount and
    * attribute stats are dropped (they compound the same way and AQE
    * re-derives real sizes at runtime anyway). */
  def statsClamp(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.logical match {
      case lr @ LogicalRDD(output, rdd, part, ord, streaming, stream) =>
        val clamped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = lr.stats.sizeInBytes.min(BigInt(Long.MaxValue)))
        Dataset.ofRows(ds.sparkSession,
          LogicalRDD(output, rdd, part, ord, streaming, stream)(
            ds.sparkSession, Some(clamped), None))
      case _ => df
    }
  }
}
