package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column
import graft.QueryDef
import graft.sources.Tables._

/** Window-function suite (absent from the reference — SURVEY.md §2.2).
  * Every ordering carries a full unique tie-break key so results are
  * deterministic across engines and across partitionings. Window state is
  * partitioned by the window key — at scale the shuffle is one exchange on
  * the partition key, identical to a groupBy.
  */
object Windows {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 10))

  val defs: Seq[QueryDef] = Seq(

    // Top-3 lineitems per supplier by price; row_number with unique
    // tie-break (orderkey, linenumber).
    QueryDef(
      "q_window_topk",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INT) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    },

    QueryDef(
      "q_window_rank",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
    },

    // lag/lead analytics over the event stream, per user ordered by time.
    QueryDef(
      "q_window_lag_lead",
      """SELECT event_id, user_id, value,
        |  value - lag(value) OVER w AS delta,
        |  lead(event_type) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          lead(col("event_type"), 1).over(w).as("next_type"))
    },

    // Running (prefix) sum with an explicit ROWS frame; decimal keeps the
    // cumulative sum exact under any evaluation order.
    QueryDef(
      "q_window_running_sum",
      """SELECT event_id, user_id,
        |  CAST(round(sum(CAST(value AS DECIMAL(38,10))) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_value
        |FROM events
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          graft.Exact.decOut(sum(dec(col("value"))).over(w)).as("running_value"))
    },

    // RANGE frame over event-time micros (value-based, peer-inclusive),
    // ntile quartiles, first/nth value — the remaining window surface.
    QueryDef(
      "q_window_advanced",
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour,
        |  CAST(ntile(4) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS INT) AS qtile,
        |  first_value(event_id) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_id,
        |  nth_value(event_id, 2) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_id
        |FROM events
        |""".stripMargin) { (s, d) =>
      val byTime = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val rowsAll = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rangeHour = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0)
      events(s, d).select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(rangeHour).as("n_last_hour"),
        ntile(4).over(byTime).as("qtile"),
        first(col("event_id")).over(rowsAll).as("first_id"),
        nth_value(col("event_id"), 2).over(rowsAll).as("second_id"))
    },

    // Distribution functions: percent_rank ((rank-1)/(n-1)) and cume_dist
    // (peers-inclusive rank / n) — both integer-derived double divisions,
    // engine-exact. Unique tie-break on the rank ordering NOT needed:
    // ties share the same rank value by definition.
    QueryDef(
      "q_window_distribution",
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC)
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").asc)
      orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },

    // Sliding ROWS frame: 3-event moving count per user (exact, bounded).
    QueryDef(
      "q_window_moving_frame",
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_frame,
        |  min(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min_in_frame
        |FROM events
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-2, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_in_frame"),
          min(col("value")).over(w).as("min_in_frame"))
    }
  )
}
