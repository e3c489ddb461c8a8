package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** The plans we'd want at 100 TB, asserted — not eyeballed.
  * (Pushdown/pruning/broadcast/partial-agg shapes from the builder spec.) */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planString(name: String): String =
    executedPlan(q(name)).toString

  test("scan query pushes filters and prunes columns at the parquet scan") {
    val p = planString("q_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)")
      || p.contains("PushedFilters: ["), p)
    assert(!p.contains("l_tax"), "unused column not pruned:\n" + p)
  }

  test("dim-dim join is a broadcast hash join") {
    val p = planString("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("aggregations run partial before the exchange") {
    // AQE query-stage wrappers hide children from collect(); assert on the
    // rendered plan: a partial_sum below the Exchange, a final agg above
    val p = planString("q_agg_pricing_summary")
    assert(p.contains("partial_sum"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.indexOf("partial_sum") > p.indexOf("Exchange"),
      "partial agg should be below the exchange:\n" + p)
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = planString("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("hash samplers are scan + filter only — no shuffle, no RNG") {
    val p = planString("q_sample_systematic")
    assert(!p.contains("Exchange"), "sampler must not shuffle:\n" + p)
    assert(!p.toLowerCase.contains("rand"), "sampler must be RNG-free:\n" + p)
  }

  test("train/val/test split shuffles only for the final count aggregate") {
    val p = planString("q_split_train")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count") || p.contains("partial"),
      "split counts need map-side partial agg:\n" + p)
  }

  test("simhash builds votes in ONE aggregation — no 60x row explosion") {
    val p = planString("q_dedup_simhash")
    // the 60 bit-votes are aggregate columns over (doc, tok) rows; an
    // Expand/explode of 60 rows per token would be a 60x shuffle at scale
    assert(!p.contains("Expand"), "bit votes must not Expand rows:\n" + p)
  }

  test("approx profile has NO Expand — the exact profile's multi-distinct does") {
    val approx = planString("q_quality_profile_approx")
    assert(!approx.contains("Expand"),
      "approx profile must stay all-algebraic (no multi-distinct Expand):\n" + approx)
    // and the exact twin genuinely pays the Expand this query avoids
    assert(planString("q_quality_profile").contains("Expand"))
  }

  test("tf-idf: corpus size N is a broadcast, not a shuffle key") {
    val p = planString("q_text_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("minhash verify intersects per-doc shingle arrays in-row") {
    // the exact-Jaccard verify must not re-shuffle the exploded shingle
    // relation against the candidate pairs — the intersection happens in
    // a projection over per-doc arrays
    val p = planString("q_dedup_minhash")
    assert(p.contains("array_intersect"), p)
  }

  test("knn probes broadcast the query set against the corpus") {
    val p = planString("q_knn_ivf")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bpe encode broadcasts the VOCAB side, never the corpus token stream") {
    // At fixture scale Catalyst would broadcast the (locally tiny)
    // corpus explode — the side that is 100 TB in production. The query
    // forces the build side; this pins it.
    val p = planString("q_text_bpe_encode")
    assert(p.contains("BroadcastHashJoin") && p.contains("BuildRight")
        && !p.contains("BuildLeft"),
      "vocab must be the broadcast build side:\n" + p)
  }

  test("bloom join: sketch is broadcast, probe side never shuffles before the agg") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = executedPlan(q("q_join_bloom"))
    val p = plan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the one-row bloom array must broadcast:\n" + p)
    // probe pass is narrow: the only SHUFFLES allowed are the bloom
    // build (word agg + single-partition array assembly, both over <=512
    // rows) and the final per-flag agg — never the lineitem probe scan
    // (walk query-stage subtrees too: AQE hides materialized stages from
    // a plain collect)
    def shuffles(sp: org.apache.spark.sql.execution.SparkPlan): Int =
      (sp match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }) + sp.children.map(shuffles).sum + (sp match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shuffles(q.plan)
        case _ => 0
      })
    assert(shuffles(plan) <= 3,
      "only build-side (2) + final agg (1) may shuffle:\n" + p)
    // ...and the probe path itself: the BNLJ's streamed (left) side is
    // the lineitem scan with NO exchange in between
    def findBnlj(sp: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] =
      sp match {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => Some(b)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findBnlj(q.plan)
        case other => other.children.view.flatMap(findBnlj).headOption
      }
    val bnlj = findBnlj(plan)
    assert(bnlj.nonEmpty, "bloom probe BNLJ missing:\n" + p)
    assert(shuffles(bnlj.get.left) == 0,
      "probe scan must feed the bloom BNLJ with no shuffle:\n" + p)
  }

  test("bucketed co-located join needs no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previous JVM's in-memory catalog leaves orphan dirs behind
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "o_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => p.toFile.delete())
      }
    }
    operators.Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_b", "l_orderkey", buckets = 8)
    operators.Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "o_b", "o_orderkey", buckets = 8)
    val joined = operators.Bucketing.colocatedJoin(
      spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
    val plan = executedPlan(joined)
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      "bucketed join should not shuffle:\n" + plan)
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("bucketed CDC merge: base side feeds the full-outer join with no shuffle") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = executedPlan(q("q_pipeline_upsert_bucketed"))
    def findSmj(sp: SparkPlan): Option[SortMergeJoinExec] = sp match {
      case s: SortMergeJoinExec => Some(s)
      case qs: QueryStageExec => findSmj(qs.plan)
      case other => other.children.view.flatMap(findSmj).headOption
    }
    def shuffles(sp: SparkPlan): Int =
      (sp match { case _: ShuffleExchangeLike => 1; case _ => 0 }) +
        sp.children.map(shuffles).sum + (sp match {
          case qs: QueryStageExec => shuffles(qs.plan)
          case _ => 0
        })
    val smj = findSmj(plan)
    assert(smj.nonEmpty, "full-outer merge should be a sort-merge join:\n" + plan)
    assert(shuffles(smj.get.left) == 0,
      "bucketed base must reach the merge join without an Exchange — " +
        "only the change batch may move:\n" + plan)
    assert(shuffles(smj.get.right) >= 1,
      "change batch shuffles into the base's bucket layout:\n" + plan)
  }

  test("partitioned layout read prunes partition directories at the scan") {
    val p = planString("q_layout_partition_prune")
    assert(p.contains("PartitionFilters: ") &&
      """PartitionFilters: \[[^\]]*o_orderstatus""".r.findFirstIn(p).isDefined,
      "status filter must prune at the DIRECTORY level, not post-scan:\n" + p)
  }

  test("dim filter prunes fact partitions at RUNTIME (dynamic partition pruning)") {
    // the filter lives on the JOINED dim column, so plan-time
    // PartitionFilters can't know the surviving event_type values — the
    // fact scan must instead carry a dynamicpruning expression fed by
    // the broadcast dim (the star-schema prune at 100 TB)
    val p = planString("q_layout_dpp")
    assert(p.contains("dynamicpruning"),
      "fact scan must be dynamically pruned by the dim filter:\n" + p)
  }

  test("snapshot reads plan ONE scan per version read, never one per manifest entry") {
    // Snapshots.read serves the manifest's FILE LIST as the scan's file
    // index (Bridge.manifestFileScan), so the timetravel query — two
    // version reads, each over a multi-partition multi-file manifest —
    // must hold exactly TWO FileScan nodes. A per-entry union fold would
    // show one scan per entry, the plan shape that explodes at 10^3-10^4
    // partitions. (The 120-partition single-scan case, the partition-
    // filter prune, and the per-file bounds skip live in SnapshotsSpec.)
    val p = planString("q_layout_timetravel")
    assert("FileScan parquet".r.findAllIn(p).size == 2,
      "expected exactly 2 scan nodes (one per version read):\n" + p)
    // the SQL surface (USING graft_snapshot temp views, VERSION AS OF)
    // must plan IDENTICALLY — same relation, same index, no wrapper cost
    val sqlP = planString("q_layout_sql_timetravel")
    assert("FileScan parquet".r.findAllIn(sqlP).size == 2,
      "SQL VERSION AS OF reads must plan the same two scans:\n" + sqlP)
  }

  test("registry invariant: no unpartitioned Window or CartesianProduct in any query plan") {
    // A Window with an empty partitionSpec funnels its entire input through
    // ONE task — the canonical single-node scale-killer. Sweep every
    // registered query's optimized logical plan. The plan WALK itself needs
    // no execution, but CONSTRUCTION is not free for every query: the
    // iterative dedup queries run eager localCheckpoint jobs and the
    // bucketed-upsert query writes its base table while building — this
    // sweep deliberately pays that (~tens of seconds at sf0.001) to keep
    // the invariant registry-wide rather than allowlist a moving subset.
    //
    // Allowlist = windows whose input is provably bounded by the PARTITION
    // COUNT, not the data size (the ranged-ranking pattern):
    val allow = Map(
      // prefix offsets: one row per range partition (<= 32 rows at any SF)
      "q_parity_sort" -> "offsets window over one row per range partition"
    )
    // Streaming-replay queries are excluded: building their DataFrame RUNS
    // the whole micro-batch replay (minutes of wall clock), and the value
    // they return is a memory-sink table scan in which a Window cannot
    // appear; their internal plans are pinned by WatermarkSpec /
    // StreamingRobustnessSpec.
    val isStreamReplay = (n: String) => n.endsWith("_stream") ||
      n.startsWith("q_stream_") || n == "q_join_stream_left"
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allow.contains).filterNot(isStreamReplay)
      .flatMap { name =>
        val t0 = System.nanoTime()
        val df = q(name)
        val badWin = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        // physical INITIAL plan (no execution): a CartesianProductExec is
        // the non-broadcast NxM join — never acceptable; a cross of a
        // genuinely tiny side must plan as BroadcastNestedLoopJoin
        def cartesians(sp: org.apache.spark.sql.execution.SparkPlan): Int =
          (sp match {
            case _: org.apache.spark.sql.execution.joins.CartesianProductExec => 1
            case _ => 0
          }) + sp.children.map(cartesians).sum
        val physical = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case p => p
        }
        val nCart = cartesians(physical)
        val ms = (System.nanoTime() - t0) / 1000000
        if (ms > 2000) info(s"slow plan build: $name ${ms}ms")
        (if (badWin.nonEmpty)
           Seq(s"$name (${badWin.size} unpartitioned Window)") else Nil) ++
          (if (nCart > 0) Seq(s"$name ($nCart CartesianProduct)") else Nil)
      }
    assert(offenders.isEmpty,
      "single-task sorts / NxM joins — scale-killers:\n  "
        + offenders.mkString("\n  "))
  }
}
