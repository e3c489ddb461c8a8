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
