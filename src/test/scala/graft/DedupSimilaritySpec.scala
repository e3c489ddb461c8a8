package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Dedup + similarity: sketch-based candidates vs exact ground truth. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("minhash-verified pairs are exactly the high-jaccard pairs it can see") {
    // every pair minhash reports passed an EXACT jaccard >= 0.5 verify, so
    // it must be a subset of the exhaustive jaccard query's pairs ignoring
    // the latter's lang/band candidate restriction — and the reported jac
    // VALUE must equal the driver-side set-arithmetic truth bit-for-bit
    // (guards the in-row array_intersect verify path)
    val mh = q("q_dedup_minhash").select("i", "j", "jac")
      .as[(Long, Long, Double)].collect()
    assert(mh.nonEmpty, "fixture should contain at least one near-dup pair")
    val shingleSets = graft.operators.Dedup.shingles(spark, sf)
      .select("doc_id", "shingle").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    mh.foreach { case (i, j, jac) =>
      val (a, b) = (shingleSets(i), shingleSets(j))
      val truth = a.intersect(b).size.toDouble / a.union(b).size
      assert(jac == truth, s"pair ($i,$j) jac=$jac, brute-force=$truth")
      assert(jac >= 0.5, s"pair ($i,$j) jac=$jac below verify bar")
    }
  }

  test("exact-jaccard query pairs are symmetric-free and above threshold") {
    val rows = q("q_dedup_ngram_jaccard").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("simhash pairs have hamming <= 3 and i < j") {
    q("q_dedup_simhash").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 3)
    }
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Array(0.5f, -0.25f, 0.125f))).toDF("id", "v")
    val c = df.select(VectorFunctions.cosine(col("v"), col("v"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("native CosineSim is bit-identical to the HOF fold on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val pairs = a.join(b, col("i") < col("j")).limit(2000)
    val diffs = pairs.select(
        VectorFunctions.cosine(col("va"), col("vb")).as("native"),
        VectorFunctions.cosineHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact double comparison
      .count()
    assert(diffs == 0, s"$diffs pairs differ between native and HOF cosine")
  }

  test("native SrpBuckets equals the HOF bucket array on real embeddings (both SRP configs)") {
    // the embedding-dedup index build rides this expression; a single
    // flipped sign bit re-buckets a vector and silently changes recall,
    // so the native/HOF twins must agree EXACTLY on every table bucket
    // of every fixture vector, in both registry configs
    val e = graft.sources.Tables.embeddings(spark, sf)
    for ((bits, tables) <- Seq((6, 16), (12, 8))) {
      val diffs = e.select(
          VectorFunctions.lshBucketArr(col("embedding"), bits, tables).as("native"),
          VectorFunctions.lshBucketArrHof(col("embedding"), bits, tables).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diffs == 0, s"$diffs vectors bucket differently at ${tables}x$bits")
    }
  }

  test("SrpBuckets interpreted eval equals its codegen path") {
    // the expression has two execution paths (nullSafeEval for
    // interpreted/fallback contexts, doGenCode inside whole-stage
    // codegen); a drift between them would re-bucket vectors depending
    // on which plan shape runs. Force the interpreted path by calling
    // eval() directly on literal input and compare against the
    // DataFrame (codegen) result.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().take(50)
    val viaDf = vecs.toSeq.toDF("id", "v")
      .select(col("id"),
        graft.functions.SrpBuckets.srpBuckets(col("v"), 12, 8).as("bks"))
      .as[(Long, Array[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      val lit = Literal.create(v, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
      val interpreted = graft.functions.SrpBuckets(lit, 12, 8)
        .eval(null).asInstanceOf[ArrayData].toLongArray()
      assert(interpreted.sameElements(viaDf(id)),
        s"vector $id buckets differ between interpreted and codegen paths")
    }
  }

  test("SrpBuckets fails loudly on a null embedding element (both paths)") {
    // parquet list elements read as containsNull=true, and the fused
    // loops read slots positionally — a null element must THROW (with
    // the element index), never silently read an undefined slot and
    // diverge from the HOF twin's null-propagation
    import org.apache.spark.sql.catalyst.expressions.Literal
    val withNull: Array[java.lang.Float] =
      Array[java.lang.Float](1.0f, null, 3.0f)
    // interpreted path
    val lit = Literal.create(withNull, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = true))
    val e = intercept[IllegalArgumentException] {
      graft.functions.SrpBuckets(lit, 12, 8).eval(null)
    }
    assert(e.getMessage.contains("null element at index 1"), e.getMessage)
    // codegen path (through a DataFrame over a nullable-element array)
    val df = Seq((1L, withNull)).toDF("id", "v")
    val err = intercept[Exception] {
      df.select(graft.functions.SrpBuckets.srpBuckets(col("v"), 12, 8))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("null element at index 1")),
      messages(err).mkString(" | "))
    // and a null-free nullable-typed array still buckets identically to
    // the containsNull=false literal path
    val clean = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
      .select(graft.functions.SrpBuckets.srpBuckets(col("v"), 12, 8))
      .as[Array[Long]].collect().head
    val cleanLit = Literal.create(Array(1.0f, 2.0f, 3.0f),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val viaEval = graft.functions.SrpBuckets(cleanLit, 12, 8).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(clean.sameElements(viaEval))
  }

  test("LSH ANN hits a positive recall vs brute force") {
    val brute = q("q_knn_brute").select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lsh = q("q_knn_lsh").select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall $recall")
  }

  test("dedupClusters: length-k chain converges in ~log2(k) rounds, exact labels") {
    // the log-diameter claim on Graft.dedupClusters, proven: a chain
    // 0-1-2-...-k is the worst case for min-label propagation (diameter
    // k); plain propagation needs k rounds, pointer jumping needs O(log k)
    val k = 256
    val pairs = (0L until k).map(i => (i, i + 1)).toDF("i", "j")
    val (out, rounds) = graft.api.Graft.dedupClustersCounted(pairs)
    val labels = out.as[(Long, Long)].collect()
    assert(labels.length == k + 1)
    assert(labels.forall(_._2 == 0L),
      s"every chain node must label to min id 0: ${labels.filter(_._2 != 0L).take(5).toSeq}")
    val bound = 2 * (math.log(k.toDouble) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound,
      s"chain of $k took $rounds rounds — not logarithmic (bound $bound)")
    assert(rounds < k / 4, s"rounds=$rounds looks linear in diameter")
  }

  test("dedupClusters: star converges in O(1) rounds; disjoint components stay disjoint") {
    // star: hub 0 with 100 leaves (diameter 2), plus a far-away triangle
    val star = (1L to 100L).map(l => (0L, l))
    val tri = Seq((1000L, 1001L), (1001L, 1002L), (1000L, 1002L))
    val (out, rounds) = graft.api.Graft.dedupClustersCounted(
      (star ++ tri).toDF("i", "j"))
    val byCluster = out.as[(Long, Long)].collect().groupBy(_._2)
    assert(byCluster.keySet == Set(0L, 1000L))
    assert(byCluster(0L).length == 101 && byCluster(1000L).length == 3)
    assert(rounds <= 4, s"star+triangle took $rounds rounds")
  }

  test("dedupClusters: high-degree star dragged through a long chain stays logarithmic") {
    // adversarial mix for pointer jumping: the min id (0) sits at one end
    // of a length-k chain; a high-degree star hangs off the FAR end (hub
    // k, leaves k+1..k+m) and another off the middle — every leaf's label
    // must be rewritten each time its hub's label improves, and the hub's
    // label improves only as the chain's min-propagation front reaches it.
    // Plain propagation would need ~k rounds and rewrite the big star's m
    // leaves repeatedly; pointer jumping must stay ~log2(k+2).
    val k = 128L
    val m = 256L
    val chain = (0L until k).map(i => (i, i + 1))
    val endStar = (1L to m).map(l => (k, k + l))
    val midStar = (1L to m).map(l => (k / 2, k + m + l))
    // far-away disjoint pair guards against label bleed across components
    val far = Seq((900000L, 900001L))
    val pairs = (chain ++ endStar ++ midStar ++ far).toDF("i", "j")
    val (out, rounds) = graft.api.Graft.dedupClustersCounted(pairs)
    val byCluster = out.as[(Long, Long)].collect().groupBy(_._2)
    assert(byCluster.keySet == Set(0L, 900000L), s"clusters: ${byCluster.keySet}")
    assert(byCluster(0L).length == (k + 1 + 2 * m).toInt,
      s"connected component size ${byCluster(0L).length}")
    assert(byCluster(900000L).length == 2)
    val diameter = k + 2 // chain + one star hop
    val bound = 2 * (math.log(diameter.toDouble) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound,
      s"star-chain mix took $rounds rounds — not logarithmic (bound $bound)")
    assert(rounds < diameter / 4, s"rounds=$rounds looks linear in diameter")
  }

  test("exact dedup: sum of copies = total docs") {
    val total = q("q_dedup_exact").agg(sum("n_copies")).as[Long].head()
    assert(total == graft.sources.Tables.documents(spark, sf).count())
  }

  test("PQ two-stage search: positive recall vs brute force, exact shortlist rerank") {
    val brute = q("q_knn_brute").select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    val pq = q("q_knn_pq").select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    assert(pq.nonEmpty && pq.map(_._1) == brute.map(_._1),
      "every query must get PQ neighbors")
    val recall = brute.intersect(pq).size.toDouble / brute.size
    // 32 codewords x 4 subspaces + exact rerank of a 100-candidate
    // shortlist: measured 0.8 at sf0.01 on structureless synthetic
    // vectors (the ANN worst case); floor leaves noise margin
    assert(recall >= 0.5, s"PQ recall@5 collapsed: $recall")
  }

  test("IVF+PQ two-stage search: positive recall, shortlist confined to probed cells") {
    val brute = q("q_knn_brute").select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    val got = q("q_knn_ivfpq").select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got.map(_._1) == brute.map(_._1),
      "every query must get IVF+PQ neighbors")
    // every returned neighbor must come from a probed cell: results are
    // a subset of the plain IVF-probe candidate set at the same nprobe
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").as("cell"))
    val ivfCand = graft.api.Graft.ivfProbe(emb, emb.filter(col("id") < 5),
        k = Int.MaxValue - 1, nprobe = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(ivfCand),
      s"neighbors outside probed cells: ${got.diff(ivfCand).take(3)}")
    // on the structureless synthetic vectors the nprobe=3-of-10 coarse
    // restriction is the CEILING (true neighbors spread uniformly over
    // cells; clustered real embeddings put them IN the probed cells,
    // which is the whole IVF bet) — so the meaningful contract is
    // relative: the PQ shortlist + exact rerank must recover most of
    // what the probed cells actually contain (measured: 0.44/0.44 at
    // sf0.01, i.e. the full ceiling)
    val ceiling = brute.intersect(ivfCand)
    assert(ceiling.nonEmpty, "probed cells hold none of the true top-5 — fixture degenerate")
    val withinCells = got.intersect(ceiling).size.toDouble / ceiling.size
    assert(withinCells >= 0.6,
      s"PQ stage loses probed-cell neighbors: $withinCells of ${ceiling.size}")
  }

  test("kmeans: total assignment, <= k live cells, cells are seed ids, deterministic") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = emb.count()
    val out = graft.api.Graft.kmeans(emb, k = 8, iters = 2)
      .as[(Long, Long)].collect()
    assert(out.length == n, "every vector assigned exactly once")
    val cells = out.map(_._2).toSet
    assert(cells.size <= 8 && cells.size > 1, s"degenerate clustering: $cells")
    val ids = emb.select("id").as[Long].collect().toSet
    assert(cells.subsetOf(ids), "cell labels must be seed vector ids")
    // pure function of the input — a re-run must agree exactly
    val again = graft.api.Graft.kmeans(emb, k = 8, iters = 2)
      .as[(Long, Long)].collect()
    assert(out.sorted.sameElements(again.sorted), "kmeans must be deterministic")
  }

  test("semanticDedup: identical vectors collapse to one per cell; tau above max keeps all") {
    // two groups of 3 identical vectors along orthogonal axes: identical
    // vectors always share a cell (same cosine profile -> same argmax),
    // pairwise cos = 1 within a group and 0 across, so at tau = 0.9
    // exactly one representative per group survives — regardless of
    // which ids the hash-seeding picks
    val vecs = Seq(
      1L -> Array(1f, 0f), 2L -> Array(1f, 0f), 3L -> Array(1f, 0f),
      10L -> Array(0f, 1f), 11L -> Array(0f, 1f), 12L -> Array(0f, 1f)
    ).toDF("id", "vec")
    val kept = graft.api.Graft.semanticDedup(vecs, k = 2, iters = 1, tau = 0.9)
      .select("id").as[Long].collect().toSet
    assert(kept.size == 2, s"one survivor per identical group, got $kept")
    assert(kept.count(_ < 10) == 1 && kept.count(_ >= 10) == 1,
      s"one survivor from EACH group, got $kept")
    // an unreachable threshold must drop nothing
    val all = graft.api.Graft.semanticDedup(vecs, k = 2, iters = 1, tau = 1.1)
      .count()
    assert(all == 6, "tau above max cosine must keep every vector")
  }

  test("semantic decontamination: both branches fire, hits imply bucket collision + threshold") {
    val rows = q("q_dedup_decontaminate_semantic").collect()
    assert(rows.nonEmpty)
    val hit = rows.filter(_.getAs[Boolean]("contaminated"))
    val clean = rows.filterNot(_.getAs[Boolean]("contaminated"))
    assert(hit.nonEmpty, "tau never fired — the positive branch is untested")
    assert(clean.nonEmpty, "everything contaminated — the filter is vacuous")
    hit.foreach { r =>
      assert(r.getAs[Long]("n_hits") > 0L)
      assert(r.getAs[Double]("max_cos") >= 0.2)
    }
    clean.foreach(r => assert(r.getAs[Long]("n_hits") == 0L && r.isNullAt(r.fieldIndex("max_cos"))))
    // eval vectors themselves never appear in the train-side report
    assert(rows.forall(_.getAs[Long]("vec_id") % 50 != 0))
  }

  test("sketch-derived equi-depth histogram: monotone non-overlapping buckets, mass ~ n") {
    val rows = q("q_agg_histogram_eqdepth_approx").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    rows.foreach { case (g, rs) =>
      val byTile = rs.sortBy(_.getAs[Int]("tile"))
      assert(byTile.nonEmpty && byTile.length <= 8)
      byTile.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
            s"$g: buckets overlap")
        case _ =>
      }
      // estimated total mass sits within one weight-granularity band
      // of W*m (the sketch's own mass), which itself tracks n
      val w = byTile.head.getAs[Long]("w_final")
      val m = byTile.head.getAs[Long]("m_sketch")
      assert(byTile.map(_.getAs[Long]("cnt_est")).sum == w * m)
    }
  }
}
