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

  /** @param uniqueKeys columns that together uniquely identify a left row
    *   (e.g. the table's primary key). When supplied, the salt is a pure
    *   deterministic function of them — stable under task retries and
    *   partial stage regeneration, no materialization, the 100 TB path.
    *   When absent, the salt mixes in the row's physical position
    *   (`monotonically_increasing_id`) so byte-identical duplicate rows
    *   still spread, and the salted side is localCheckpoint'ed to FREEZE
    *   the assignment: position is not stable across recomputation, so an
    *   unfrozen partially regenerated map stage could re-salt rows that
    *   reducers already fetched (SPARK-23207-shaped duplicate/lost rows).
    *   Prefer passing `uniqueKeys` when the left side is large. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, joinType: String = "inner",
      uniqueKeys: Seq[Column] = Nil): DataFrame = {
    require(supportedTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left-side join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows per salt)")
    // The salt never reaches the output, and every salt value meets the
    // same replicated right rows, so any FIXED assignment yields the
    // identical join result; the two branches differ only in how the
    // assignment is kept fixed on a real cluster (see @param above).
    val leftCols = left.columns.toIndexedSeq.map(col)
    val salted =
      if (uniqueKeys.nonEmpty)
        left.withColumn("__salt",
          pmod(xxhash64(uniqueKeys: _*), lit(salts)).cast("int"))
      else
        left.withColumn("__salt",
          pmod(xxhash64(leftCols: _*) + monotonically_increasing_id(),
            lit(salts)).cast("int"))
          .localCheckpoint()
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey)
          && salted("__salt") === replicated("__salt"), joinType)
      .drop("__salt")
  }
}
