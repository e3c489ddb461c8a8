package graft

import graft.api.Graft
import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => ScTest}

/** ScalaCheck properties of the curation operators — the invariants a
  * training-data build depends on, over generated corpora. */
class GraftPropertySpec extends SparkSpec {
  import spark.implicits._

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    texts <- Gen.listOfN(n,
      Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "the", "Ω"))
        .map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def check(p: org.scalacheck.Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("property: exactDedup copy counts always sum to the corpus size") {
    check(forAll(docGen) { docs =>
      val df = docs.toDF("id", "body")
      Graft.exactDedup(df, "id", "body")
        .agg(sum("n_copies")).as[Long].head() == docs.size.toLong
    })
  }

  test("property: trainValTestSplit is a partition of the ids") {
    check(forAll(docGen) { docs =>
      val out = Graft.trainValTestSplit(docs.toDF("id", "body"), "id")
        .select("id", "split").as[(Long, String)].collect()
      out.length == docs.size && out.map(_._1).distinct.length == docs.size &&
        out.forall(r => Set("train", "val", "test")(r._2))
    })
  }

  test("property: systematicSample keeps a deterministic subset") {
    check(forAll(docGen, Gen.choose(2, 10)) { (docs, rate) =>
      val df = docs.toDF("id", "body")
      val a = Graft.systematicSample(df, "id", rate).select("id").as[Long].collect().toSet
      val b = Graft.systematicSample(df, "id", rate).select("id").as[Long].collect().toSet
      a == b && a.subsetOf(docs.map(_._1).toSet)
    })
  }

  test("property: dedupClusters == union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 25)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    check(forAll(edgeGen) { es =>
      es.isEmpty || {
        val got = Graft.dedupClusters(es.toDF("i", "j"))
          .as[(Long, Long)].collect().toMap
        // reference union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        got == want
      }
    })
  }

  test("property: chunkTokens n_tokens sums to the doc's token count") {
    check(forAll(docGen, Gen.oneOf(2, 3, 5)) { (docs, w) =>
      val got = Graft.chunkTokens(docs.toDF("id", "body"), "id", "body", w)
        .groupBy("doc_id").agg(sum("n_tokens").as("s"))
        .as[(Long, Long)].collect().toMap
      docs.forall { case (id, body) =>
        val n = body.split("\\s+").count(_.nonEmpty).toLong
        got.getOrElse(id, 0L) == n
      }
    })
  }

  test("property: mixtureResample copy counts bracket the rate for every class") {
    val rateGen = Gen.choose(0, 300)
    check(forAll(docGen, rateGen) { (docs, rate) =>
      val df = docs.toDF("id", "body")
        .withColumn("cls", (col("id") % 2).cast("string"))
      val out = Graft.mixtureResample(df, "id", "cls",
        Map("0" -> rate, "1" -> 100))
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      docs.forall { case (id, _) =>
        val copies = out.getOrElse(id, 0L)
        if (id % 2 == 1) copies == 1L
        else copies == rate / 100 || copies == rate / 100 + 1
      }
    })
  }

  test("property: merge with an empty change batch is the identity (op '=')") {
    check(forAll(docGen) { docs =>
      val base = docs.toDF("k", "body")
      val changes = Seq.empty[(Long, String, String)].toDF("k", "body", "op")
      val out = Graft.merge(base, changes, "k")
        .select("k", "body", "op").as[(Long, String, String)].collect()
      out.length == docs.size && out.forall(_._3 == "=") &&
        out.map(r => (r._1, r._2)).toSet == docs.toSet
    })
  }

  test("property: merge deletes+inserts preserve count; keys stay unique") {
    check(forAll(docGen) { docs =>
      val base = docs.toDF("k", "body")
      // delete every even key, re-insert it under key+10000
      val del = docs.filter(_._1 % 2 == 0)
        .map { case (k, _) => (k, null.asInstanceOf[String], "D") }
      val ins = docs.filter(_._1 % 2 == 0)
        .map { case (k, b) => (k + 10000L, b, "I") }
      val out = Graft.merge(base, (del ++ ins).toDF("k", "body", "op"), "k")
        .select("k").as[Long].collect()
      out.length == docs.size && out.distinct.length == out.length &&
        docs.filter(_._1 % 2 == 0).forall(d => out.contains(d._1 + 10000L))
    })
  }

  test("property: ppsSample picks exactly total-div-step per bucket (weights < step)") {
    check(forAll(docGen, Gen.choose(5L, 40L)) { (docs, step) =>
      val df = docs.toDF("id", "body")
        .withColumn("wt", length(col("body")).cast("long") % (step - 1) + 1)
      val out = Graft.ppsSample(df, "id", "wt", buckets = 4, step = step)
        .select("id", "wt", "bucket", "cum_before", "picked")
        .as[(Long, Long, Long, Long, Boolean)].collect()
      out.length == docs.size && out.groupBy(_._3).values.forall { grp =>
        val total = grp.map(_._2).sum
        grp.count(_._5) == total / step &&
          grp.forall(r => r._5 == ((r._4 + r._2) / step > r._4 / step))
      }
    })
  }

  test("property: budgetCap keeps an order-prefix per class and never overflows") {
    check(forAll(docGen, Gen.choose(1L, 30L)) { (docs, budget) =>
      val df = docs.toDF("id", "body")
        .withColumn("cls", (col("id") % 3).cast("string"))
        .withColumn("wt", length(col("body")).cast("long") % 7 + 1)
      val out = Graft.budgetCap(df, "id", "cls", "wt", budget)
        .select("id", "cls", "wt", "cum_before", "kept")
        .as[(Long, String, Long, Long, Boolean)].collect()
      out.length == docs.size && out.groupBy(_._2).values.forall { grp =>
        val kept = grp.filter(_._5)
        // kept weight fits the budget, and the kept set is exactly the
        // longest admissible prefix of the deterministic order
        kept.map(_._3).sum <= budget &&
          grp.forall(r => r._5 == (r._4 + r._3 <= budget)) &&
          kept.forall(r => r._4 == grp.filter(_._4 < r._4).map(_._3).sum)
      }
    })
  }

  test("property: BPE fold merge equals the greedy left-to-right scan") {
    // Reference: the scan bpeMergeOnce's fold must equal. The generator
    // draws from a 3-symbol alphabet that includes the rule's own sides
    // and multi-char symbols, so runs of equal symbols (the only
    // overlapping-match case) and already-merged symbols both occur.
    def greedy(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val ruleGen = Gen.oneOf(("a", "a"), ("a", "b"), ("ab", "a"), ("a", "ab"))
    val wordGen = Gen.listOf(Gen.oneOf("a", "b", "ab"))
    check(forAll(Gen.listOfN(8, wordGen), ruleGen) { (words, rule) =>
      val df = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "syms")
      val got = Graft.bpeMergeOnce(df, rule._1, rule._2)
        .select("id", "syms").as[(Long, Seq[String])].collect()
        .sortBy(_._1).map(_._2.toList).toList
      got == words.map(greedy(_, rule._1, rule._2))
    })
  }

  test("property: shuffleOrder is a permutation with dense per-bucket ranks") {
    check(forAll(docGen, Gen.oneOf(2, 7, 64)) { (docs, b) =>
      val out = Graft.shuffleOrder(docs.toDF("id", "body"), "id", buckets = b)
        .select("id", "bucket", "pos").as[(Long, Int, Int)].collect()
      out.length == docs.size &&
        out.map(_._1).distinct.length == docs.size &&
        out.groupBy(_._2).values.forall { grp =>
          grp.map(_._3).sorted.toSeq == (1 to grp.length) }
    })
  }

  private val wEdgeGen: Gen[(Int, List[(Long, Long, Long)])] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 24)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
      w <- Gen.choose(1L, 9L)
    } yield (a, b, w))
  } yield (n, es)

  /** reference: driver-side bounded Bellman-Ford over the same rounds */
  private def refSssp(n: Int, es: List[(Long, Long, Long)], seeds: Set[Long],
      rounds: Int): Map[Long, Long] = {
    var d: Map[Long, Long] = seeds.map(_ -> 0L).toMap
    (1 to rounds).foreach { _ =>
      val relax = es.flatMap { case (a, b, w) => d.get(a).map(da => b -> (da + w)) }
      d = (d.toSeq ++ relax).groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2).min }
    }
    d
  }

  test("property: sssp == driver-side Bellman-Ford on random weighted graphs") {
    check(forAll(wEdgeGen) { case (n, es) =>
      val seeds = Set(0L, (n - 1).toLong)
      val nodes = (0 until n).map(v => (v.toLong, seeds(v.toLong)))
        .toDF("v", "seed")
      val got =
        if (es.isEmpty) seeds.map(_ -> 0L).toMap
        else Graft.sssp(nodes, es.toDF("src", "dst", "w"), rounds = 3)
          .as[(Long, Long)].collect().toMap
      got == refSssp(n, es, seeds, rounds = 3)
    })
  }

  test("property: ssspConverged == exact Bellman-Ford fixpoint on random graphs") {
    check(forAll(wEdgeGen) { case (n, es) =>
      val seeds = Set(0L, (n - 1).toLong)
      val nodes = (0 until n).map(v => (v.toLong, seeds(v.toLong)))
        .toDF("v", "seed")
      val got =
        if (es.isEmpty) seeds.map(_ -> 0L).toMap
        else Graft.ssspConverged(nodes, es.toDF("src", "dst", "w"))
          .as[(Long, Long)].collect().toMap
      // n rounds of the reference reach the fixpoint: weights are
      // positive, so shortest paths have at most n-1 edges
      got == refSssp(n, es, seeds, rounds = n)
    })
  }

  /** reference: driver-side synchronous k-core peel (bounded or, with
    * rounds >= n, the exact fixpoint — a converged round is a no-op, so
    * early termination is equivalent). */
  private def refKcore(n: Int, es: List[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    val und = es.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    def degs(s: Set[Long]): Map[Long, Long] =
      und.filter { case (a, b) => s(a) && s(b) }
        .flatMap { case (a, b) => List(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    var alive = (0 until n).map(_.toLong).toSet
    (1 to rounds).foreach { _ =>
      val d = degs(alive)
      alive = alive.filter(v => d.getOrElse(v, 0L) >= k)
    }
    val fd = degs(alive)
    alive.map(v => v -> fd.getOrElse(v, 0L)).toMap
  }

  test("property: kcorePeel == driver-side synchronous peel on random graphs") {
    check(forAll(wEdgeGen) { case (n, es) =>
      val nodes = (0 until n).map(_.toLong).toDF("v")
      val raw = es.map { case (a, b, _) => (a, b) }
      val got = Graft.kcorePeel(nodes, raw.toDF("a", "b"), k = 2, rounds = 2)
        .as[(Long, Long)].collect().toMap
      got == refKcore(n, raw, k = 2, rounds = 2)
    })
  }

  test("property: kcore == the peel fixpoint, and every survivor keeps >= k neighbors") {
    check(forAll(wEdgeGen) { case (n, es) =>
      val nodes = (0 until n).map(_.toLong).toDF("v")
      val raw = es.map { case (a, b, _) => (a, b) }
      val got = Graft.kcore(nodes, raw.toDF("a", "b"), k = 2)
        .as[(Long, Long)].collect().toMap
      // n rounds of the reference reach the fixpoint: each non-converged
      // round drops at least one node
      got == refKcore(n, raw, k = 2, rounds = n) &&
        got.values.forall(_ >= 2L)
    })
  }

  test("property: bfs == sssp under unit weights") {
    check(forAll(wEdgeGen) { case (n, es) =>
      val nodes = (0 until n).map(v => (v.toLong, v == 0)).toDF("v", "seed")
      val unit = es.map { case (a, b, _) => (a, b, 1L) }.distinct
      val viaBfs =
        if (unit.isEmpty) Map(0L -> 0L)
        else Graft.bfs(nodes, unit.map(e => (e._1, e._2)).toDF("src", "dst"),
          maxDepth = 3).as[(Long, Long)].collect().toMap
      val viaSssp =
        if (unit.isEmpty) Map(0L -> 0L)
        else Graft.sssp(nodes, unit.toDF("src", "dst", "w"), rounds = 3)
          .as[(Long, Long)].collect().toMap
      viaBfs == viaSssp
    })
  }

  test("property: linkPredict == brute-force common-neighbor scan") {
    val edgeGen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 20)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es)
    check(forAll(edgeGen) { case (n, es) =>
      val got = Graft.linkPredict(es.toDF("a", "b"), minCommon = 1)
        .select("node_a", "node_b", "common")
        .as[(Long, Long, Long)].collect().toSet
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct.toSet
      val nbrs = (0L until n.toLong).map(v =>
        v -> und.collect { case (a, b) if a == v => b
                           case (a, b) if b == v => a }).toMap
      val ref = (for {
        x <- 0L until n.toLong; y <- (x + 1) until n.toLong
        if !und((x, y))
        common = (nbrs(x) intersect nbrs(y)).size
        if common >= 1
      } yield (x, y, common.toLong)).toSet
      got == ref
    })
  }

  test("property: linkPredict maxDegree is the identity when every degree sits under the cap") {
    // Random graphs of <= 12 nodes: no degree can exceed 11, so any cap
    // >= 11 must leave BOTH the candidate pairs and their scores
    // bit-identical to the uncapped run — the cap may only ever touch
    // nodes above it.
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 20)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es
    check(forAll(edgeGen) { es =>
      val df = es.toDF("a", "b")
      def run(cap: Int) = Graft.linkPredict(df, minCommon = 1, maxDegree = cap)
        .as[(Long, Long, Long, Double)].collect().toSet
      run(11) == run(Int.MaxValue) && run(20) == run(Int.MaxValue)
    })
  }

  test("linkPredict maxDegree bounds hub wedges; low-degree side stays exact") {
    // A 60-leaf star (hub 0) disjoint-union a 4-cycle {100..103}. With
    // maxDegree = 8 the hub contributes at most C(8,2) = 28 leaf pairs
    // (vs C(60,2) = 1770 uncapped — the quadratic blow-up the cap
    // exists to bound), while the cycle's two diagonal pairs — every
    // degree there is 2 — are identical with and without the cap.
    val star = (1L to 60L).map(l => (0L, l))
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L))
    val edges = (star ++ cycle).toDF("a", "b")
    def pairs(cap: Int) = Graft.linkPredict(edges, minCommon = 1, maxDegree = cap)
      .as[(Long, Long, Long, Double)].collect().toSet
    val capped = pairs(8)
    val full = pairs(Int.MaxValue)
    val starSide = capped.filter(_._1 < 100L)
    assert(starSide.size == 28, s"expected C(8,2)=28 hub pairs, got ${starSide.size}")
    assert(full.count(_._1 < 100L) == 1770)
    // capped hub pairs are a SUBSET of the exact ones, scores untouched
    assert(starSide.subsetOf(full.filter(_._1 < 100L)))
    // each diagonal pair shares BOTH its neighbors: jaccard 2/(2+2-2)=1
    val diagonals = Set((100L, 102L, 2L, 1.0), (101L, 103L, 2L, 1.0))
    assert(capped.filter(_._1 >= 100L) == diagonals)
    assert(full.filter(_._1 >= 100L) == diagonals)
  }

  test("property: modularity == brute-force Newman score on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 20)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es
    check(forAll(edgeGen) { es =>
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val labels = verts.map(v => (v, v % 3)).toDF("v", "lbl")
      val got = Graft.modularity(labels, es.toDF("a", "b"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      val m = und.size.toLong
      val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size.toLong }
      val perc = verts.groupBy(_ % 3).map { case (lbl, vs) =>
        (lbl, vs.size.toLong,
          und.count(e => e._1 % 3 == lbl && e._2 % 3 == lbl).toLong,
          vs.map(v => deg.getOrElse(v, 0L)).sum)
      }.toSeq
      val qNum = perc.map { case (_, _, e, d) => 4 * m * e - d * d }.sum
      val ref = perc.filter(_._2 >= 2).map { case (lbl, nm, e, d) =>
        (lbl, nm, e, d, perc.size.toLong, m, qNum, 4 * m * m)
      }.toSet
      (m == 0L) || got == ref // an edgeless graph has q_den 0; skip
    })
  }

  test("property: louvainMove and communityMerge never lower Q on random graphs") {
    // Both refinements claim Q-monotonicity BY CONSTRUCTION (the accept
    // gate / the disjoint-matching theorem) — so it must hold on ANY
    // graph with ANY seed labeling, not just the fixture.
    val caseGen: Gen[(List[(Long, Long)], Int)] = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(1, 16)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
      k <- Gen.choose(1, 4) // seed community count
    } yield (es, k)
    def qNum(labels: Map[Long, Long], es: List[(Long, Long)]): Long = {
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      val m = und.size.toLong
      val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size.toLong }
      labels.values.toSeq.distinct.map { lbl =>
        val vs = labels.filter(_._2 == lbl).keys.toSet
        val e = und.count(x => vs(x._1) && vs(x._2)).toLong
        val d = vs.toSeq.map(v => deg.getOrElse(v, 0L)).sum
        4 * m * e - d * d
      }.sum
    }
    check(forAll(caseGen) { case (es, k) =>
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val edges = es.toDF("a", "b")
      val seed = verts.map(v => (v, v % k)).toDF("v", "lbl")
      val seedMap = verts.map(v => v -> (v % k)).toMap
      val q0 = qNum(seedMap, es)
      val lv = Graft.louvainMove(seed, edges, rounds = 2)
        .as[(Long, Long)].collect().toMap
      val cm = Graft.communityMerge(seed, edges, rounds = 2)
        .as[(Long, Long)].collect().toMap
      qNum(lv, es) >= q0 && qNum(cm, es) >= q0
    })
  }

  test("property: labelProp labels stay inside the node's own component") {
    val edgeGen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(0, 15)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es)
    check(forAll(edgeGen) { case (n, es) =>
      val nodes = (0L until n.toLong).toDF("v")
      val got = Graft.labelProp(nodes, es.toDF("a", "b"), rounds = 3)
        .as[(Long, Long)].collect().toMap
      // union-find reference components
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        if (a != b) parent(find(a.toInt)) = find(b.toInt) }
      got.size == n && got.forall { case (v, l) =>
        find(v.toInt) == find(l.toInt) } // label reachable from its node
    })
  }

  test("property: skyline2d == brute-force dominance filter") {
    val ptsGen: Gen[List[(Long, Long, Double)]] = for {
      n <- Gen.choose(1, 60)
      xs <- Gen.listOfN(n, Gen.choose(0L, 20L))
      ys <- Gen.listOfN(n, Gen.choose(0, 9).map(_.toDouble))
    } yield xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    check(forAll(ptsGen) { pts =>
      val df = pts.toDF("id", "x", "y")
      val got = Graft.skyline2d(df, "x", "y", buckets = 4)
        .as[(Long, Long, Double)].collect().toSet
      val ref = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, qx, qy) =>
          qx >= x && qy >= y && (qx > x || qy > y)
        }
      }.toSet
      got == ref
    })
  }

  test("property: editNeighbors == brute-force levenshtein<=1 pairs") {
    // short strings over a 2-letter alphabet force dense near-neighbor
    // structure (equal, substitution, insert/delete all arise)
    val strGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 25)
      ss <- Gen.listOfN(n,
        Gen.choose(1, 4).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString)))
    } yield ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    check(forAll(strGen) { ss =>
      val got = Graft.editNeighbors(ss.toDF("id", "s"), "id", "s")
        .as[(Long, Long, Long)].collect().toSet
      val ref = (for {
        (ia, sa) <- ss; (ib, sb) <- ss
        if ia < ib && lev(sa, sb) <= 1
      } yield (ia, ib, lev(sa, sb).toLong)).toSet
      got == ref
    })
  }
}
