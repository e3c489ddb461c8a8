package graft.operators

import graft.QueryDef
import graft.sources.Tables

/** The engine's SQL entry point: the same plans are reachable through
  * `spark.sql` over registered views — demonstrating that every operator
  * family is SQL-surfaced, not only DataFrame-surfaced. Thresholds built
  * from averages use `decimal_sum :: double / count` so both engines
  * compute the identical double (a bare avg() can differ in the last ulp
  * and flip boundary rows). */
object SqlSurface {

  private def views(s: org.apache.spark.sql.SparkSession, d: String, ts: String*): Unit =
    ts.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_sql_revenue_by_nation",
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 4) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |""".stripMargin) { (s, d) =>
      views(s, d, "lineitem", "orders", "customer", "nation")
      s.sql(
        """SELECT n_name,
          |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 4) AS DOUBLE) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name
          |""".stripMargin)
    },

    // Recursive CTE (Spark 4 WITH RECURSIVE): per nation, the smallest
    // nationkey reachable by walking consecutive keys within its region,
    // plus the walk length. Edges form chains (each node has at most one
    // predecessor), so UNION ALL derivations are unique and both engines
    // terminate at the same fixpoint with identical counts.
    // TPC-H Q3 shape (shipping priority): segment-filtered customer x
    // date-bracketed orders x lineitem, revenue per open order, top 10.
    // The filters sit on three different tables, so this is the plan-
    // quality probe for pushdown-through-join: both predicates reach
    // their scans, customer (segment-pruned, ~300 rows) broadcasts, and
    // the ORDER BY ... LIMIT becomes TakeOrderedAndProject — no global
    // sort. Revenue is the exact-decimal sum; doubles leave via round().
    QueryDef(
      "q_sql_shipping_priority",
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 4) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND l_shipdate > TIMESTAMP '1997-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10
        |""".stripMargin) { (s, d) =>
      views(s, d, "customer", "orders", "lineitem")
      s.sql(
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 4) AS DOUBLE) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1997-07-01'
          |  AND l_shipdate > TIMESTAMP '1997-07-01'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey LIMIT 10
          |""".stripMargin)
    },

    // TPC-H Q10 shape (returned items): per-customer lost revenue from
    // returned lineitems, nation attached, top 20 accounts. The return-
    // flag filter prunes lineitem at the scan to a third; nation is a
    // broadcast dim; the two fact joins shuffle on their keys and the
    // revenue tie-breaks by unique custkey so the LIMIT is stable in
    // both engines.
    QueryDef(
      "q_sql_returned_items",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 4) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20
        |""".stripMargin) { (s, d) =>
      views(s, d, "customer", "orders", "lineitem", "nation")
      s.sql(
        """SELECT c_custkey, c_name, n_name,
          |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 4) AS DOUBLE) AS revenue,
          |  count(*) AS n_items
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |GROUP BY c_custkey, c_name, n_name
          |ORDER BY revenue DESC, c_custkey LIMIT 20
          |""".stripMargin)
    },

    QueryDef(
      "q_sql_recursive",
      """WITH RECURSIVE ed AS (
        |  SELECT a.n_nationkey AS i, b.n_nationkey AS j
        |  FROM nation a JOIN nation b
        |    ON b.n_nationkey = a.n_nationkey + 1 AND b.n_regionkey = a.n_regionkey),
        |walk(id, lbl) AS (
        |  SELECT n_nationkey, n_nationkey FROM nation
        |  UNION ALL
        |  SELECT e.j, w.lbl FROM walk w JOIN ed e ON e.i = w.id)
        |SELECT id AS n_nationkey, min(lbl) AS chain_root,
        |  count(*) AS chain_len
        |FROM walk GROUP BY id
        |""".stripMargin) { (s, d) =>
      views(s, d, "nation")
      s.sql(
        """WITH RECURSIVE ed AS (
          |  SELECT a.n_nationkey AS i, b.n_nationkey AS j
          |  FROM nation a JOIN nation b
          |    ON b.n_nationkey = a.n_nationkey + 1 AND b.n_regionkey = a.n_regionkey),
          |walk(id, lbl) AS (
          |  SELECT n_nationkey, n_nationkey FROM nation
          |  UNION ALL
          |  SELECT e.j, w.lbl FROM walk w JOIN ed e ON e.i = w.id)
          |SELECT id AS n_nationkey, min(lbl) AS chain_root,
          |  count(*) AS chain_len
          |FROM walk GROUP BY id
          |""".stripMargin)
    },

    // Scalar subquery: Catalyst evaluates the uncorrelated subquery once
    // and broadcasts the scalar — no per-row re-evaluation.
    QueryDef(
      "q_sql_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
        |                                 / count(*) FROM orders)
        |""".stripMargin) { (s, d) =>
      views(s, d, "orders")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
          |                                 / count(*) FROM orders)
          |""".stripMargin)
    },

    // Correlated subquery: decorrelated by Catalyst into aggregate + join
    // (no nested-loop re-execution per outer row).
    QueryDef(
      "q_sql_correlated_subquery",
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > 2 * (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(38,10))) AS DOUBLE)
        |                              / count(*)
        |                       FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |""".stripMargin) { (s, d) =>
      views(s, d, "customer")
      s.sql(
        """SELECT c_custkey, c_acctbal FROM customer c
          |WHERE c_acctbal > 2 * (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(38,10))) AS DOUBLE)
          |                              / count(*)
          |                       FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          |""".stripMargin)
    }
  )
}
