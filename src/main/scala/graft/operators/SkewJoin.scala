package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles most skew automatically; salting is the
  * explicit fallback when one key dominates so heavily that even split
  * partitions bottleneck (classic at 100 TB: a null/default key holding
  * 10% of the table). The left (large, skewed) side gets a deterministic
  * salt in [0, salts); the right side is replicated `salts` times; the
  * join key becomes (key, salt), spreading each hot key over `salts`
  * reducers. Result is row-identical to the unsalted join.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    // deterministic salt: spread rows by a hash of the whole left row
    val leftCols = left.columns.map(col)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftCols: _*), lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey)
          && salted("__salt") === replicated("__salt"), joinType)
      .drop("__salt")
  }
}
