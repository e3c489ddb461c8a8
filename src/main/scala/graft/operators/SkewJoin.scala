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
  * reducers. Result is row-identical to the unsalted join for inner and
  * left-side join types ONLY: replicating the right side would emit each
  * unmatched right row once per salt under right/full outer, so those
  * types are rejected.
  */
object SkewJoin {

  private val supportedTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(supportedTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left-side join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows per salt)")
    // salt = hash of the whole left row + the row's physical position
    // (monotonically_increasing_id = partition id << 33 | record index):
    // byte-identical duplicate rows — the pathological hot key — still
    // spread across salts instead of collapsing onto one reducer. The
    // salt never reaches the output, and every salt value meets the same
    // replicated right rows, so ANY assignment (including a different
    // one after a task retry) yields the identical join result.
    val leftCols = left.columns.toIndexedSeq.map(col)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftCols: _*) + monotonically_increasing_id(),
        lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey)
          && salted("__salt") === replicated("__salt"), joinType)
      .drop("__salt")
  }
}
