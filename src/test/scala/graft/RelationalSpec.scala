package graft

import org.apache.spark.sql.functions._

/** Cross-query invariants on sf0.001 — independent of the DuckDB oracle. */
class RelationalSpec extends SparkSpec {

  test("entry (flagship wordcount) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("semi + anti partition the customer set") {
    val semi = q("q_join_semi").count()
    val anti = q("q_join_anti").count()
    val all = graft.sources.Tables.customer(spark, sf).count()
    assert(semi + anti == all)
  }

  test("rollup = grouped + per-flag subtotals + grand total") {
    val grouped = q("q_agg_pricing_summary").count()         // 6 groups
    val flags = q("q_agg_pricing_summary").select("l_returnflag").distinct().count()
    assert(q("q_agg_rollup").count() == grouped + flags + 1)
  }

  test("cube row count = groups + both margins + total") {
    val o = graft.sources.Tables.orders(spark, sf)
    val st = o.select("o_orderstatus").distinct().count()
    val pr = o.select("o_orderpriority").distinct().count()
    val both = o.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert(q("q_agg_cube").count() == both + st + pr + 1)
  }

  test("set identities: |union| >= |intersect|; except disjoint from semi") {
    assert(q("q_set_union").count() >= q("q_set_intersect").count())
    val exceptKeys = q("q_set_except").collect().map(_.getLong(0)).toSet
    val semiKeys = q("q_join_semi").collect().map(_.getLong(0)).toSet
    assert(exceptKeys.intersect(semiKeys).isEmpty)
  }

  test("window top-k: rn bounded and per-group ordered") {
    val rows = q("q_window_topk")
      .select("l_suppkey", "rn", "l_extendedprice").collect()
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sort_limit is the true global top-10 by price") {
    val got = q("q_sort_limit").collect().map(_.getDouble(1))
    val want = graft.sources.Tables.orders(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse).take(10)
    assert(got.toSeq == want.toSeq)
  }

  test("bucketed range join equals the naive theta join") {
    // the manufactured-equi-key plan must reproduce the bare range
    // predicate exactly: compute the naive pair counts directly and
    // compare cell by cell
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val a = ev.select(col("us").as("a_us"), col("event_type").as("a_type"))
    val b = ev.select(col("us").as("b_us"), col("event_type").as("b_type"))
    val naive = a.join(b, col("b_us") > col("a_us") &&
        col("b_us") <= col("a_us") + 60000000L)
      .groupBy("a_type", "b_type").agg(count(lit(1)).as("n_pairs"))
    val bucketed = q("q_join_range_bucket")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed range join diverged from the naive theta join")
    assert(bucketed.agg(sum("n_pairs")).head.getLong(0) > 0)
  }

  test("interval join rows all satisfy the 5-minute bound") {
    // re-derive bound satisfaction from the ids by joining back to events
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"))
    val pairs = q("q_join_interval")
      .join(ev.withColumnRenamed("event_id", "a_id").withColumnRenamed("ts", "ta"), "a_id")
      .join(ev.withColumnRenamed("event_id", "b_id").withColumnRenamed("ts", "tb"), "b_id")
      .select(unix_micros(col("tb")) - unix_micros(col("ta")))
      .collect().map(_.getLong(0))
    assert(pairs.nonEmpty && pairs.forall(dt => dt > 0 && dt <= 300000000L))
  }

  test("retention: offset-0 rows equal cohort sizes; counts never exceed them") {
    val rows = q("q_events_retention").collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("offset_weeks")) ->
        r.getAs[Long]("n_users")).toMap
    assert(rows.nonEmpty)
    val cohortSizes = rows.collect { case ((c, 0L), n) => c -> n }
    assert(cohortSizes.nonEmpty, "every cohort must have its offset-0 row")
    rows.foreach { case ((c, off), n) =>
      assert(off >= 0, s"negative offset: cohort $c offset $off")
      // a later week can never retain more users than the cohort holds
      assert(n <= rows((c, 0L)), s"retention above cohort size: ($c, $off) -> $n")
    }
  }

  test("SCD2 as-of read at the latest version equals the MERGE fixpoint") {
    // the write/read pair closes: reconstructing "now" from full history
    // (q_pipeline_scd2's apply) must agree row-for-row with the fixpoint
    // MERGE keeps (q_pipeline_upsert's shape on the same 4-col payload)
    val hist = q("q_pipeline_scd2")
    val asOfLatest = graft.api.Graft.scdAsOf(hist, 1L)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    val cust = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val k = col("c_custkey")
    val batch = cust.filter(k % 17 === 3).select(k.as("c_custkey"),
        lit(null).cast("string").as("c_name"),
        lit(null).cast("double").as("c_acctbal"),
        lit(null).cast("string").as("c_mktsegment"), lit("D").as("op"))
      .unionByName(cust.filter(k % 10 === 0 && k % 17 =!= 3)
        .select(k.as("c_custkey"), col("c_name"),
          (col("c_acctbal") + 100.0).as("c_acctbal"),
          lit("RESEGMENTED").as("c_mktsegment"), lit("U").as("op")))
      .unionByName(cust.filter(k % 25 === 7)
        .select((-k).as("c_custkey"),
          concat(col("c_name"), lit(" (copy)")).as("c_name"),
          col("c_acctbal"), col("c_mktsegment"), lit("I").as("op")))
    val fixpoint = graft.api.Graft.merge(cust, batch, "c_custkey")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .collect().map(_.toSeq).toSet
    assert(asOfLatest.nonEmpty && asOfLatest == fixpoint)
    // and every as-of row at the latest version is flagged current
    assert(graft.api.Graft.scdAsOf(hist, 1L)
      .filter(!col("is_current")).isEmpty)
  }
}
