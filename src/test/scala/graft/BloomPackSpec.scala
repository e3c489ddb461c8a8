package graft

import graft.operators.BloomJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-3 operators: bloom-filter join (no false negatives, exact FP
  * accounting), sequence packing (bin invariants), PII redaction
  * (clean output), stream left-outer join (superset of inner + sentinel
  * rows only below the watermark cutoff). */
class BloomPackSpec extends SparkSpec {

  test("bloom join: zero false negatives, candidates = true ∪ false-pos") {
    val rows = q("q_join_bloom").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cand, tru, fp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cand >= tru, "bloom must never drop a true match (no false negatives)")
      assert(cand - tru == fp, "candidate set must be exactly true matches + false positives")
      assert(cand <= n)
    }
  }

  test("bloom mightContain: every inserted key probes true") {
    val dim = Tables.supplier(spark, sf).filter(col("s_nationkey") < 5)
      .select(col("s_suppkey").cast("string").as("k"))
    val bloom = BloomJoin.build(dim, "k")
    val probed = dim.crossJoin(broadcast(bloom))
      .withColumn("hit", BloomJoin.mightContain(col("k"), col("bloom")))
    assert(probed.filter(!col("hit")).isEmpty)
  }

  test("sequence packing: offsets stay in [0, 256) and bins fill contiguously per bucket") {
    val rows = q("q_text_pack")
      .select("bucket", "bin", "bin_offset", "n_tokens", "doc_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 0 && r.getInt(2) < 256)
      assert(r.getInt(1) >= 0)
    }
    // within a bucket, docs ordered by doc_id have non-decreasing bins
    rows.groupBy(_.getInt(0)).values.foreach { grp =>
      val bins = grp.sortBy(_.getLong(4)).map(_.getInt(1)).toSeq
      assert(bins == bins.sorted, "next-fit packing must fill bins in order")
    }
  }

  test("perplexity: q16 cost is a true quantized log2, scores rank sanely") {
    // q16(x)/16 must sit within (log2(x) - 0.15, log2(x) + 1/16] — the
    // documented quantization band — for x across several magnitudes
    def q16(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      ((x * 16) >> e) + 16L * e - 16L
    }
    Seq(1L, 2L, 3L, 7L, 100L, 12345L, 1000000L).foreach { x =>
      val approx = q16(x) / 16.0
      val exact = math.log(x.toDouble) / math.log(2.0)
      assert(approx <= exact + 1.0 / 16 + 1e-9 && approx > exact - 0.15,
        s"q16($x)/16 = $approx vs log2 = $exact")
    }
    val rows = q("q_text_perplexity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every bigram costs at least log2(V+...) - log2(c12+1) > 0:
      // smoothing guarantees den > num, so the summed cost is positive
      assert(r.getAs[Long]("score_q16") > 0L)
      assert(r.getAs[Long]("n_bigrams") > 0L)
      assert(r.getAs[Double]("avg_bits") > 0.0)
    }
  }

  test("pii redact: redacted text has no residual email/phone; counts match injection rule") {
    val rows = q("q_text_pii_redact").collect()
    val emailRe = graft.functions.TextAnalysis.PiiEmailRe.r
    val phoneRe = graft.functions.TextAnalysis.PiiPhoneRe.r
    rows.foreach { r =>
      val (id, red, ne, np) = (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))
      assert(emailRe.findFirstIn(red).isEmpty, s"doc $id still has an email")
      assert(phoneRe.findFirstIn(red).isEmpty, s"doc $id still has a phone")
      assert(ne == (if (id % 5 == 0) 1 else 0))
      assert(np == (if (id % 7 == 0) 1 else 0))
    }
    assert(rows.exists(_.getInt(2) == 1) && rows.exists(_.getInt(3) == 1))
  }

  test("mixture resample: copy counts follow the per-class rate contract") {
    val rows = q("q_sample_mixture").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // pass-through class: exactly one copy per doc
    val base = Tables.documents(spark, sf)
    val deDocs = base.filter(col("lang") === "de").count()
    assert(rows.count(_._2 == "de") == deDocs)
    // oversampled class emits at least one copy per doc, max 2
    val enDocs = base.filter(col("lang") === "en").count()
    val enCopies = rows.count(_._2 == "en")
    assert(enCopies >= enDocs && enCopies <= 2 * enDocs)
    assert(rows.filter(_._2 == "en").forall(r => r._3 == 1 || r._3 == 2))
    // downsampled class emits at most one copy per doc, fewer docs than base
    val zhDocs = base.filter(col("lang") === "zh").count()
    assert(rows.count(_._2 == "zh") <= zhDocs)
    assert(rows.filter(_._2 == "zh").forall(_._3 == 1))
  }

  test("temperature mixture: largest lang runs 1.0x, spread flattens, rates derive from counts") {
    val rows = q("q_sample_mixture_temp").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) =>
      (l, rs.head.getAs[Long]("n_lang"), rs.head.getAs[Long]("rate_pct"),
        rs.length.toLong)
    }.toSeq
    val largest = byLang.maxBy(_._2)
    assert(largest._3 == 100L, s"largest language must run at 1.0x: $byLang")
    byLang.foreach { case (l, n, rate, copies) =>
      // rate = floor(100 * sqrt(nmax/n)) recomputed
      val expect = math.floor(100.0 * math.sqrt(largest._2.toDouble) /
        math.sqrt(n.toDouble)).toLong
      assert(rate == expect, s"$l: rate $rate != derived $expect")
      assert(copies >= n, s"$l: alpha < 1 never downsamples")
    }
    // flattening: max/min copy ratio strictly tighter than raw count ratio
    val rawSpread = byLang.map(_._2).max.toDouble / byLang.map(_._2).min
    val mixSpread = byLang.map(_._4).max.toDouble / byLang.map(_._4).min
    assert(mixSpread < rawSpread, s"mix spread $mixSpread vs raw $rawSpread")
  }

  test("shuffle order: (bucket, pos) is a permutation — dense ranks, no duplicates") {
    val rows = q("q_sample_shuffle").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.map(_._1).distinct.length == rows.length, "each doc appears once")
    rows.groupBy(_._2).values.foreach { grp =>
      assert(grp.map(_._3).sorted.toSeq == (1 to grp.length),
        "in-bucket positions must be dense 1..n")
    }
  }

  test("misra-gries: heavy keys always survive, any merge order; bound holds") {
    val mg = new graft.functions.HeavyHitters(2)
    // 100 items: 60x a, 25x b, 15 singletons — a (60%) and b (25%) vs
    // threshold 100/3: only a is guaranteed, b may or may not survive
    val stream = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (1 to 15).map(i => s"x$i")
    // three different groupings/orders of the same multiset
    val perms = Seq(stream, stream.reverse,
      new scala.util.Random(42).shuffle(stream))
    perms.foreach { p =>
      val chunks = p.grouped(7).toSeq
      val sketch = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      assert(sketch.contains("a"), s"guaranteed heavy hitter lost: $sketch")
      assert(sketch.size <= 2)
      // undercount bound: est >= exact - n/(cap+1)
      assert(sketch.getOrElse("a", 0L) >= 60L - 100L / 3)
    }
  }

  test("stream left-outer join ⊇ stream inner join; sentinel rows are pre-cutoff only") {
    val inner = q("q_join_stream_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val left = q("q_join_stream_left").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inner.subsetOf(left), "left-outer must contain every inner match")
    val extras = left -- inner
    assert(extras.nonEmpty,
      "watermark expiry must emit sentinel rows (no-data batch ran)")
    assert(extras.forall(_._2 == -1L), "extra rows must be watermark-expired non-matches")
    // an expired unmatched purchase appears exactly once, and never ALSO
    // with a real match
    val matchedIds = inner.map(_._1)
    assert(extras.forall { case (pid, _) => !matchedIds.contains(pid) })
  }
}
