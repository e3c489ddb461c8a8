package graft.operators

import graft.QueryDef
import graft.sources.Tables

/** The engine's SQL entry point: the same plans are reachable through
  * `spark.sql` over registered views — demonstrating that every operator
  * family is SQL-surfaced, not only DataFrame-surfaced. */
object SqlSurface {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_sql_revenue_by_nation",
      """SELECT n_name, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |""".stripMargin) { (s, d) =>
      Seq("lineitem", "orders", "customer", "nation").foreach { t =>
        Tables.table(s, d, t).createOrReplaceTempView(t)
      }
      s.sql(
        """SELECT n_name,
          |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name
          |""".stripMargin)
    }
  )
}
