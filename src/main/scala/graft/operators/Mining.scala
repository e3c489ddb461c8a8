package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables._

/** Pattern-mining operators: market-basket co-occurrence (frequent item
  * pairs), association rules derived from those pairs, and sequential
  * transition mining over the event stream — the classic trio a curation
  * pipeline runs to understand co-consumption before building mixtures.
  * (No reference analog — `/root/reference` stops at the WordCount fold,
  * `app.py:13-14`; these are the aggregation patterns that fold
  * generalizes to at engine grade.)
  *
  * Scale design: pair generation is a SELF-EQUI-JOIN on the basket key
  * (l_orderkey), never a cross join — baskets are bounded (TPC-H ≤ 7
  * lines/order), so candidate pairs are O(rows · basket) and AQE's skew
  * split covers a pathological basket. Rule scoring joins the pair table
  * against the per-item support aggregate (items ≪ pairs, broadcast).
  * Transition mining is one lag-window per user partition — state is a
  * user's own history, the standard sessionize shape.
  */
object Mining {

  /** Minimum pair support: at sf0.01 this keeps the frequent-pair table
    * at ~63 rows (support ≥ 3 over ~116k candidate pairs). */
  private val MinSupport = 3L

  /** Distinct (order, part) pairs — multiplicity inside one basket must
    * not inflate support. */
  private def baskets(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_orderkey", "l_partkey").distinct()

  /** Frequent part pairs with support ≥ [[MinSupport]]. The basket
    * relation feeds BOTH sides of the self-join — checkpointed so the
    * scan+distinct runs once, not once per side. */
  private def copairs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val ip = baskets(s, d).localCheckpoint()
    ip.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(ip.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinSupport)
  }

  val defs: Seq[QueryDef] = Seq(

    // Frequent item pairs (market-basket co-occurrence): parts bought
    // together in the same order, support = number of co-containing
    // orders, thresholded. The A-priori base case — and the candidate
    // generator every higher-order itemset pass would build on.
    QueryDef(
      "q_mine_copairs",
      s"""WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (
         |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |    count(*) AS support
         |  FROM ip a JOIN ip b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2)
         |SELECT part_a, part_b, support FROM p WHERE support >= $MinSupport
         |""".stripMargin) { (s, d) => copairs(s, d) },

    // Association rules over the frequent pairs: each surviving pair
    // emits both directions a -> b with
    //   confidence = support(a,b) / support(a)        (one double divide)
    //   lift = support(a,b) * N / (support(a) * support(b))
    // computed as ONE double division of exact 64-bit integer products —
    // both engines replay the identical float op. Item supports join in
    // from the per-part aggregate (items ≪ pairs — broadcast); N is the
    // scalar basket count.
    QueryDef(
      "q_mine_assoc",
      s"""WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ip),
         |item AS (SELECT l_partkey, count(*) AS sup FROM ip GROUP BY 1),
         |p AS (
         |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |    count(*) AS support
         |  FROM ip a JOIN ip b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2),
         |f AS (SELECT * FROM p WHERE support >= $MinSupport),
         |rules AS (
         |  SELECT part_a AS antecedent, part_b AS consequent, support FROM f
         |  UNION ALL
         |  SELECT part_b AS antecedent, part_a AS consequent, support FROM f)
         |SELECT r.antecedent, r.consequent, r.support,
         |  CAST(r.support AS DOUBLE) / ia.sup AS confidence,
         |  CAST(r.support * n.n_orders AS DOUBLE) / (ia.sup * ic.sup) AS lift
         |FROM rules r
         |JOIN item ia ON ia.l_partkey = r.antecedent
         |JOIN item ic ON ic.l_partkey = r.consequent
         |CROSS JOIN n
         |""".stripMargin) { (s, d) =>
      val ip = baskets(s, d).localCheckpoint() // scanned by pairs + supports + N
      val item = ip.groupBy(col("l_partkey")).agg(count(lit(1)).as("sup"))
      val nOrders = ip.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val f = ip.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        .join(ip.select(col("l_orderkey"), col("l_partkey").as("part_b")),
          Seq("l_orderkey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("support"))
        .filter(col("support") >= MinSupport)
      val rules = f.select(col("part_a").as("antecedent"),
          col("part_b").as("consequent"), col("support"))
        .unionByName(f.select(col("part_b").as("antecedent"),
          col("part_a").as("consequent"), col("support")))
      rules
        .join(broadcast(item.select(col("l_partkey").as("antecedent"),
          col("sup").as("sup_a"))), Seq("antecedent"))
        .join(broadcast(item.select(col("l_partkey").as("consequent"),
          col("sup").as("sup_c"))), Seq("consequent"))
        .crossJoin(broadcast(nOrders))
        .select(col("antecedent"), col("consequent"), col("support"),
          (col("support").cast("double") / col("sup_a")).as("confidence"),
          ((col("support") * col("n_orders")).cast("double") /
            (col("sup_a") * col("sup_c"))).as("lift"))
    },

    // Sequential transition mining: the event-type Markov matrix — for
    // each user's time-ordered stream, count consecutive (from, to)
    // transitions and normalize per source state. One lag window per
    // user partition (bounded state), then a 5x5 count table with the
    // per-source totals broadcast back in; probability is one double
    // division of two longs.
    QueryDef(
      "q_mine_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n) AS tot FROM t GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n,
        |  CAST(t.n AS DOUBLE) / tot.tot AS prob
        |FROM t JOIN tot USING (from_type)
        |""".stripMargin) { (s, d) =>
      val seq = events(s, d).select(col("event_type"),
        lead(col("event_type"), 1).over(
          Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
          .as("next_type"))
      // 25-cell table checkpointed: the totals derive from it without
      // re-running the window pass over the events
      val t = seq.filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tot = t.groupBy("from_type").agg(sum("n").as("tot"))
      t.join(broadcast(tot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("tot")).as("prob"))
    },

    // Sequential pattern mining (GSP's contiguous base case): the 20
    // most common 3-step behavioural motifs across users, support
    // counted ONCE per user (the sequence-mining convention — a user
    // either exhibits the motif or doesn't) beside the raw occurrence
    // count. Extends q_mine_transitions' bigram chain one step: the
    // same per-user lag window emits (e1, e2, e3) windows of the
    // ts-ordered event sequence; relative support is the integer ppm
    // share of the user base (one broadcast scalar).
    //
    // Scale shape: the window partitions on user_id (millions of small
    // partitions — the sessionize shape, never a global sort); the
    // motif aggregate shuffles |user x motif| rows with map-side
    // combine into at most |types|^3 groups; top-20 is TakeOrdered
    // (per-partition heaps), full (support, n_occ, motif) tie-break.
    QueryDef(
      "q_mine_seqpat",
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events),
        |m AS (
        |  SELECT e1, e2, e3, count(*)::BIGINT AS n_occ,
        |    count(DISTINCT user_id)::BIGINT AS support
        |  FROM seq WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
        |u AS (SELECT count(DISTINCT user_id)::BIGINT AS nu FROM events)
        |SELECT e1, e2, e3, n_occ, support,
        |  (support * 1000000) // nu AS support_ppm
        |FROM m, u
        |ORDER BY support DESC, n_occ DESC, e1 ASC, e2 ASC, e3 ASC
        |LIMIT 20
        |""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = events(s, d)
      val seq = ev.select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(byUser).as("e2"),
        lead(col("event_type"), 2).over(byUser).as("e3"))
      val m = seq.filter(col("e3").isNotNull)
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("user_id")).as("support"))
      val nu = ev.agg(countDistinct(col("user_id")).as("nu"))
      m.crossJoin(broadcast(nu))
        .select(col("e1"), col("e2"), col("e3"), col("n_occ"), col("support"),
          expr("(support * 1000000L) div nu").as("support_ppm"))
        .orderBy(col("support").desc, col("n_occ").desc,
          col("e1").asc, col("e2").asc, col("e3").asc)
        .limit(20)
    },

    // 2-D skyline (Pareto frontier): the orders no other order beats on
    // BOTH recency and value — the multi-objective "best offers" shape.
    // Graft.skyline2d avoids every pairwise comparison: grain-reduce to
    // per-day maxima (a skyline row must hold its day's max), then "max
    // over strictly-later days" via the two-level suffix max (bucket-
    // partitioned window + a constant-size cross-bucket carry) — no
    // global sort, no cartesian, input scanned twice. The oracle states
    // dominance directly as NOT EXISTS over the day-max grain (the
    // grain reduction is semantics-preserving: a dominated day-max is
    // dominated by a later day-max) — agreement of the scan-based and
    // the quantified formulations is the check.
    QueryDef(
      "q_mine_skyline",
      """WITH dm AS (
        |  SELECT o_orderdate AS dt, max(o_totalprice) AS mp
        |  FROM orders GROUP BY 1),
        |sky AS (
        |  SELECT dt, mp FROM dm d1
        |  WHERE NOT EXISTS (SELECT 1 FROM dm d2
        |                    WHERE d2.dt > d1.dt AND d2.mp >= d1.mp))
        |SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders JOIN sky ON o_orderdate = sky.dt AND o_totalprice = sky.mp
        |""".stripMargin) { (s, d) =>
      graft.api.Graft.skyline2d(
        orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice"),
        "o_orderdate", "o_totalprice")
    }
  )
}
