package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join semantics on literal frames: latest right row with
  * ts <= left.ts per key; equal-ts right rows visible; null when none. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("asOf picks latest prior right row, sees equal ts, nulls when none") {
    val left = Seq(
      (1L, ts(100), 10L), // after r1(50), r2(90) -> 92
      (1L, ts(95), 11L),  // after r1(50), r2(90) -> 92
      (1L, ts(50), 12L),  // equal ts to r1 -> 91
      (1L, ts(10), 13L),  // before everything -> null
      (2L, ts(100), 20L)  // other key, no right rows -> null
    ).toDF("key", "ts", "left_id")
    val right = Seq(
      (1L, ts(50), 91L),
      (1L, ts(90), 92L)
    ).toDF("key", "ts", "right_id")

    val got = AsOfJoin.asOf(left, right)
      .select("left_id", "asof_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      10L -> Some(92L), 11L -> Some(92L), 12L -> Some(91L),
      13L -> None, 20L -> None))
  }

  test("ties on ts at same side resolve to the largest right_id") {
    val left = Seq((1L, ts(100), 1L)).toDF("key", "ts", "left_id")
    val right = Seq((1L, ts(100), 7L), (1L, ts(100), 9L)).toDF("key", "ts", "right_id")
    val got = AsOfJoin.asOf(left, right).select("asof_id").as[Long].head()
    assert(got == 9L)
  }
}
