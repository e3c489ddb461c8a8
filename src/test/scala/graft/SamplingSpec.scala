package graft

import org.apache.spark.sql.functions._

/** Functional properties of the sampling/split/tf-idf operators (their
  * value-level correctness is oracle-checked by Verify; these pin the
  * pipeline-level contracts a training-data build relies on). */
class SamplingSpec extends SparkSpec {

  test("zone-map skipping is sound and actually prunes") {
    val r = q("q_layout_zonemap").collect().head
    val (chunks, kept) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_chunks_kept"))
    assert(kept < chunks, "zone map pruned nothing — clustering or zones broken")
    assert(r.getAs[Long]("n_rows_scanned") < r.getAs[Long]("n_rows"))
    // soundness: the matched count found inside kept chunks must equal
    // the true predicate count over the whole table (a matching row
    // outside a kept chunk would have widened its chunk's zones)
    val truth = graft.sources.Tables.lineitem(spark, sf)
      .filter((col("l_partkey") % 1024).between(96, 159) &&
        (col("l_suppkey") % 1024).between(2, 5))
      .count()
    assert(r.getAs[Long]("n_rows_matched") == truth,
      s"zone-kept matches ${r.getAs[Long]("n_rows_matched")} != truth $truth")
  }

  test("bloom skipping never misses a true chunk and actually prunes") {
    val probes = Seq(7L, 501L, 1203L, 1999L)
    val rows = q("q_layout_bloomskip").collect()
      .map(r => r.getAs[Long]("probe_key") -> r).toMap
    assert(rows.nonEmpty)
    // truth computed independently: the chunks really containing each key
    // (at the small test sf some probe keys don't occur at all)
    val truthChunks = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_partkey").isin(probes: _*))
      .select(col("l_partkey"), expr("l_orderkey div 64").as("chunk"))
      .distinct().groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("c")).toMap
    probes.foreach { pk =>
      rows.get(pk) match {
        case Some(r) =>
          // no false negatives: every chunk that truly holds the key is a
          // candidate, so the true-chunk count inside candidates equals
          // the independent truth (a bloom can't clear a bit it set)
          assert(r.getAs[Long]("n_true_chunks") == truthChunks.getOrElse(pk, 0L),
            s"bloom missed a true chunk for $pk")
          // and it prunes: candidates are a strict subset of all chunks
          assert(r.getAs[Long]("n_cand_chunks") < r.getAs[Long]("n_chunks"),
            s"bloom pruned nothing for $pk")
        case None =>
          // a key with no candidate chunks anywhere must truly be absent
          assert(!truthChunks.contains(pk),
            s"bloom dropped present key $pk entirely")
      }
    }
  }

  test("encoding advisor: totals reconcile and the clustered column picks RLE") {
    val rows = q("q_layout_encoding_advisor").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 5)
    val n = graft.sources.Tables.lineitem(spark, sf).count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      // runs are bounded by rows and can't undercut the distinct count
      // spread across chunks; plain is the ceiling by construction
      assert(r.getAs[Long]("n_runs") <= n)
      assert(r.getAs[Long]("est_dict_bits") > 0L)
    }
    // the column clustered by the natural order compresses as RLE; the
    // scattered high-cardinality column stays dict
    assert(rows("l_orderkey").getAs[String]("recommended") == "rle_dict")
    assert(rows("l_partkey").getAs[String]("recommended") == "dict")
  }

  test("in-degree distribution accounts for every node and every edge") {
    val rows = q("q_graph_degrees").collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == n, "nodes dropped from the histogram")
    // the derived graph has exactly 4 out-edges per node, so the
    // in-degree mass must be 4N
    val mass = rows.map(r => r.getAs[Long]("in_deg") * r.getAs[Long]("n_nodes")).sum
    assert(mass == 4 * n, s"in-degree mass $mass != ${4 * n}")
  }

  test("table diff recovers exactly the planted divergence with the right verdicts") {
    val report = q("q_pipeline_tablediff").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("status")).toMap
    val keys = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val wantMissing = keys.filter(_ % 997 == 0).toSet
    val wantModified = keys.filter(k => k % 991 == 0 && k % 997 != 0).toSet
    assert(report.filter(_._2 == "missing_in_replica").keySet == wantMissing,
      "missing-key set diverged from the planted drops")
    assert(report.filter(_._2 == "modified").keySet == wantModified,
      "modified-key set diverged from the planted flips")
    assert(report.size == wantMissing.size + wantModified.size)
  }

  test("systematic sample is deterministic and a subset of the corpus") {
    val s1 = q("q_sample_systematic").collect().map(_.getLong(0)).sorted
    val s2 = q("q_sample_systematic").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "same rows on every run")
    val all = sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.forall(all.contains))
    assert(s1.nonEmpty && s1.length < all.size)
  }

  test("stratified sample caps every class at 20") {
    val byLang = q("q_sample_stratified").groupBy("lang").count().collect()
    assert(byLang.nonEmpty)
    byLang.foreach(r => assert(r.getLong(1) <= 20, r.toString))
  }

  test("every document lands in exactly one split, roughly 80/10/10") {
    val splits = q("q_split_train").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = splits.values.sum
    val n = sources.Tables.documents(spark, sf).count()
    assert(total == n, s"split counts $splits must cover all $n docs once")
    val trainFrac = splits.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.65 && trainFrac < 0.92, s"train fraction $trainFrac")
  }

  test("tf-idf emits ranks 1..3 per document with no duplicate terms") {
    val rows = q("q_text_tfidf").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val rnks = rs.map(_.getInt(2)).sorted
      assert(rnks.sameElements(1 to rnks.length), s"doc $doc ranks $rnks")
      assert(rnks.length <= 3)
      val terms = rs.map(_.getString(1))
      assert(terms.distinct.length == terms.length, s"doc $doc dup terms")
    }
  }

  test("streaming sessions equal batch sessions minus each user's tail") {
    val streamed = streaming.Streaming.sessionStream(spark, sf)
      .select("user_id", "session_id", "n_events", "session_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: q_events_sessionize without the max session per user
    val batch = q("q_events_sessionize")
      .withColumn("max_sid", max(col("session_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("session_id") < col("max_sid"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_micros(col("session_start")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("corpus pipeline: the composite honors each stage's contract") {
    val out = q("q_pipeline_corpus").localCheckpoint()
    assert(out.count() > 0)
    // decontamination: the eval split (doc_id % 50 == 0) never leaks
    assert(out.filter(col("doc_id") % 50 === 0).count() == 0)
    // budget: the copy=1 base stream respects the 20k per-lang cap
    out.filter(col("copy") === 1).groupBy("lang")
      .agg(sum("n_tokens").as("t")).collect()
      .foreach(r => assert(r.getAs[Long]("t") <= 20000L,
        s"lang ${r.getAs[String]("lang")} blew the token budget"))
    // mixture: only rated languages enter, and copy counts stay <= 2
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
    assert(out.agg(max("copy")).collect().head.getInt(0) <= 2)
    // packing: offsets stay inside the 256-token bin
    assert(out.filter(col("bin_offset") < 0 || col("bin_offset") >= 256).count() == 0)
    // dedup: a surviving doc appears once per copy, never more
    assert(out.groupBy("doc_id", "copy").count().filter(col("count") > 1).count() == 0)
  }

  test("curriculum: stages are monotone difficulty bands, positions dense per (stage, bucket)") {
    val rows = q("q_pipeline_curriculum").collect()
    assert(rows.nonEmpty)
    val byStage = rows.groupBy(_.getAs[Int]("stage"))
    assert(byStage.keySet.subsetOf(Set(1, 2, 3, 4)))
    assert(byStage.size >= 3, s"sketch cuts collapsed: ${byStage.keySet}")
    // a harder stage never contains an easier doc than a softer stage
    val bands = byStage.toSeq.sortBy(_._1).map { case (st, rs) =>
      (st, rs.map(_.getAs[Long]("avgq")).min, rs.map(_.getAs[Long]("avgq")).max)
    }
    bands.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 <= b._2, s"stages interleave: $a vs $b")
      case _ =>
    }
    // pos is a dense 1..n ranking inside every (stage, bucket)
    rows.groupBy(r => (r.getAs[Int]("stage"), r.getAs[Int]("bucket")))
      .foreach { case (k, rs) =>
        val ps = rs.map(_.getAs[Int]("pos")).sorted
        assert(ps.toSeq == (1 to rs.length).toSeq, s"gap in $k")
      }
  }
}
