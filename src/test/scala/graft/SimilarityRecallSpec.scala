package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Retrieval-quality gate for the multi-probe SRP index (r12 rebuild of
  * the embedding-space candidate generators). The DuckDB oracle proves
  * plan-equivalence, not recall — an index that restates its own bucket
  * restriction can silently under-detect — so this spec measures recall
  * against the brute-force kernel directly, in BOTH regimes:
  *
  *  - the fixture regime (near-orthogonal vectors, tau at the random-pair
  *    cosine level): the 16x6-bit flip-1 config must find >= 95% of the
  *    true pairs. Here no LSH can be selective (collision probability is
  *    a monotone function of cosine and tau-pairs are barely above
  *    random), so the config leans exhaustive by design — the r11 single
  *    6-bit bucket found 63% / 3% of the tau=0.4 / tau=0.2 pairs.
  *  - the production regime (planted near-duplicates at cos ~0.95 over
  *    the same corpus): a 8x12-bit flip-1 member of the SAME family must
  *    keep recall >= 95% while admitting <= 5% of random pairs — the
  *    selectivity that makes the index an index at 100 TB.
  */
class SimilarityRecallSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.sources.Tables.embeddings(spark, sf)

  test("q_dedup_embedding_exhaustive finds >= 95% of brute-force pairs at tau = 0.4") {
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val brute = a.join(b, col("i") < col("j"))
      .filter(cosine(col("va"), col("vb")) >= 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain pairs above tau")
    val found = q("q_dedup_embedding_exhaustive")
      .select("i", "j").as[(Long, Long)].collect().toSet
    // every reported pair passed the exact-cosine verify, so found is a
    // subset of brute; recall is the only free variable
    assert(found.subsetOf(brute), s"false positives: ${found.diff(brute).take(3)}")
    val recall = found.size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall (${found.size}/${brute.size})")
  }

  test("benched q_dedup_embedding (selective): exact subset, guard holds, finds pairs") {
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val brute = a.join(b, col("i") < col("j"))
      .filter(cosine(col("va"), col("vb")) >= 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // the candidate-fraction guard runs inside the query: completing at
    // all proves the 8x12-bit index admitted <= 5% of pairs on this data
    val found = q("q_dedup_embedding")
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(brute), s"false positives: ${found.diff(brute).take(3)}")
    // on THIS geometry (tau at the random-pair cosine) the selective
    // index surfaces a deterministic subset — its recall CONTRACT is the
    // planted-near-dup branch below; here we pin that it still finds a
    // nontrivial share rather than degenerating to empty
    assert(found.nonEmpty, s"selective index found none of ${brute.size} pairs")
  }

  test("semantic decontamination finds >= 95% of true tau = 0.2 leaks") {
    val ev = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("j"), col("embedding").as("vb"))
    val tr = emb.filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("i"), col("embedding").as("va"))
    val brute = tr.join(broadcast(ev))
      .filter(cosine(col("va"), col("vb")) >= 0.2)
      .count()
    assert(brute > 0, "fixture must contain contaminated pairs")
    // each n_hits counts distinct eval neighbors above tau, so the sum
    // is exactly the number of (train, eval) pairs the index surfaced
    val found = q("q_dedup_decontaminate_semantic")
      .agg(sum("n_hits")).as[Long].head()
    val recall = found.toDouble / brute
    assert(recall >= 0.95, s"pair recall $recall ($found/$brute)")
  }

  test("q_dedup_semantic: within-cell candidate recall of true tau-pairs is measured and pinned") {
    // SemDeDup prunes WITHIN k-means cells only — cross-cell near-dups
    // are invisible by construction. The oracle proves plan-equivalence
    // (it restates the same cell restriction), so like the SRP family
    // this needs a measured-recall contract against brute force: of the
    // true cos >= 0.35 pairs, how many have both endpoints in the same
    // cell (= are candidates the drop rule can see)?
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val brute = a.join(b, col("i") < col("j"))
      .filter(cosine(col("va"), col("vb")) >= 0.35)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain pairs above tau")
    // the SAME clustering q_dedup_semantic runs (k = 8, iters = 2)
    val cells = graft.api.Graft.kmeans(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 8, iters = 2)
      .as[(Long, Long)].collect().toMap
    val sameCell = brute.count { case (i, j) => cells(i) == cells(j) }
    val recall = sameCell.toDouble / brute.size
    // measured 2026-08 at sf0.01: 0.338 (87/257). At tau = 0.35 — barely
    // above the random-pair cosine on this near-orthogonal geometry —
    // direction correlation is too weak for a nearest-centroid cell to
    // capture both endpoints, so within-cell pruning sees only a THIRD
    // of the true pairs. That is the honest fixture-regime statement
    // (the API doc states it); the regime where SemDeDup earns its keep
    // is the planted-near-dup branch below. The floor pins today's
    // number so a k bump (SemDeDup scales k with the corpus; more,
    // smaller cells split MORE tau-pairs) fails here, not silently.
    assert(recall >= 0.3, s"within-cell recall $recall ($sameCell/${brute.size})")
  }

  test("q_dedup_semantic planted regime: near-dups at cos ~0.95 land in one cell") {
    // the production regime (same construction as the SRP selective
    // branch): true near-MEANING duplicates sit at cos ~0.95, far above
    // random — a pair that similar must share its nearest centroid for
    // within-cell pruning to see it. Plant 50, retrain the SAME k-means
    // the query uses over corpus + plants, require >= 0.9 of planted
    // pairs within-cell.
    val base = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val rnd = new scala.util.Random(43)
    val alpha = 0.95
    val planted = base.take(50).map { case (id, v) =>
      val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
      val noise = Array.fill(v.length)(rnd.nextGaussian())
      val nn = math.sqrt(noise.map(x => x * x).sum)
      val dup = v.indices.map { k =>
        (alpha * v(k) / vn + math.sqrt(1 - alpha * alpha) * noise(k) / nn).toFloat
      }.toArray
      (id + 100000L, dup)
    }
    val all = (base ++ planted).toSeq.toDF("id", "vec")
    val cells = graft.api.Graft.kmeans(all, k = 8, iters = 2)
      .as[(Long, Long)].collect().toMap
    val within = base.take(50).count { case (id, _) =>
      cells(id) == cells(id + 100000L) }
    val recall = within.toDouble / 50
    assert(recall >= 0.9, s"planted within-cell recall $recall ($within/50)")
  }

  test("selective regime: planted near-dups, 8x12-bit flip-1 — recall >= 0.95, candidates <= 5%") {
    // the BENCHED q_dedup_embedding's own constants — this branch IS its
    // recall contract (the fixture regime above is the exhaustive entry's)
    val (bits, tables) =
      (graft.operators.Similarity.selBits, graft.operators.Similarity.selTables)
    val base = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    // plant 50 near-duplicates at cosine ~0.95: dup = normalize(alpha*v +
    // sqrt(1-alpha^2)*unit_noise), fixed seed — deterministic test data
    val rnd = new scala.util.Random(42)
    val alpha = 0.95
    val planted = base.take(50).map { case (id, v) =>
      val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
      val noise = Array.fill(v.length)(rnd.nextGaussian())
      val nn = math.sqrt(noise.map(x => x * x).sum)
      val dup = v.indices.map { k =>
        (alpha * v(k) / vn + math.sqrt(1 - alpha * alpha) * noise(k) / nn).toFloat
      }.toArray
      (id + 100000L, dup)
    }
    val all = (base ++ planted).toSeq.toDF("id", "vec")
    val bk = all.select(col("id"),
      lshBucketArr(col("vec"), bits, tables).as("bks")).localCheckpoint()
    val cand = bk.select(col("id").as("i"), lshTableKeys(col("bks")).as("tb"))
      .join(bk.select(col("id").as("j"), lshProbeKeys(col("bks"), bits).as("tb")),
        Seq("tb"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
      .as[(Long, Long)].collect().toSet
    val truth = base.take(50).map { case (id, _) => (id, id + 100000L) }.toSet
    val recall = truth.intersect(cand).size.toDouble / truth.size
    assert(recall >= 0.95, s"planted recall $recall")
    val n = all.count()
    val candFrac = cand.size.toDouble / (n * (n - 1) / 2)
    assert(candFrac <= graft.operators.Similarity.candFracBudget,
      s"candidate fraction $candFrac — index not selective")
  }
}
