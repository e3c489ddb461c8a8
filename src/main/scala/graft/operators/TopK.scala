package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.TopKAggregator
import graft.sources.Tables._

/** record flowing through the typed top-k aggregation */
final case class LiRec(l_suppkey: Long, l_orderkey: Long,
    l_linenumber: Int, l_extendedprice: Double)

/** Top-k per group via the typed bounded-buffer Aggregator — same result
  * (and same oracle) as the window formulation `q_window_topk`, but the
  * shuffle carries at most k rows per group instead of the whole group.
  * The two formulations cross-check each other in the oracle gate.
  */
object TopK {

  private val k = 3

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_topk_aggregator",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INT) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |""".stripMargin) { (s, d) =>
      import s.implicits._
      val ord = Ordering.by((r: LiRec) =>
        (-r.l_extendedprice, r.l_orderkey, r.l_linenumber))
      val agg = new TopKAggregator[LiRec](k, ord)
      lineitem(s, d)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .as[LiRec]
        .groupByKey(_.l_suppkey)
        .agg(agg.toColumn.name("top"))
        .toDF("l_suppkey", "top")
        .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("l_suppkey"), col("r.l_orderkey"), col("r.l_linenumber"),
          col("r.l_extendedprice"), (col("pos") + 1).cast("int").as("rn"))
    }
  )
}
