package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.VectorFunctions._
import graft.sources.Tables._

/** Similarity search over the embedding column.
  *
  *  - brute-force top-k cosine: broadcast the (small) query set against the
  *    corpus — one scan, no shuffle of the corpus; ranks are oracle-checked
  *    (ranks, not float scores, so last-ulp engine differences can't bite).
  *  - LSH-bucketed ANN: sign-LSH bucket equi-join — the 100 TB path, where
  *    only same-bucket pairs are scored. The md5-60-derived planes let the
  *    oracle replicate bucketing bit-for-bit (hash-checked), and recall is
  *    additionally tested against brute force in ScalaTest.
  *  - IVF: cell probe and multi-probe over a computed codebook.
  *  - embedding near-dup: same buckets, cosine-threshold pair filter.
  */
object Similarity {

  private val kNeighbors = 5
  private val nQueries = 5 // query set: vec_id < 5

  /** EXHAUSTIVE multi-probe SRP config (q_dedup_embedding_exhaustive,
    * q_dedup_decontaminate_semantic): 16 independent 6-bit hyperplane
    * tables (plane family t*6..t*6+5), flip-1 probing. Chosen by
    * MEASURED recall vs brute force on the sf0.01 fixture (pinned in
    * SimilarityRecallSpec): 1.00 at tau=0.4, 0.99 at tau=0.2, where the
    * r11 single 6-bit bucket scored 0.63 / 0.03. On THIS geometry
    * (near-orthogonal vectors, tau at the random-pair cosine) that
    * recall is information-theoretically brute force — cand_frac ~0.82,
    * measured quadratic at the 10x stretch — which is why it is NOT the
    * benched config. */
  private[graft] val srpBits = 6
  private[graft] val srpTables = 16

  /** SELECTIVE multi-probe SRP config — the benched q_dedup_embedding
    * and the production shape: 8 independent 12-bit tables, flip-1
    * probing. Same 96-plane budget as the exhaustive config, spent on
    * selectivity instead of recall-at-random-tau: the random-pair
    * candidate floor is 8 * 13/2^12 ~ 2.5% of pairs (vs 82%), and on
    * planted near-duplicates at cos ~0.95 the spec pins recall >= 0.95
    * with candidates <= 5% (SimilarityRecallSpec's selective branch). */
  private[graft] val selBits = 12
  private[graft] val selTables = 8

  /** Loud ceiling on the candidate fraction the selective index may
    * admit: above this the verify stage is drifting toward all-pairs
    * (wrong bits/tables for the data's geometry, or a corpus whose
    * near-dup rate genuinely demands a different index) and the job
    * FAILS with the stated remedy instead of silently going quadratic
    * (the q_join_bloom mixed-geometry precedent). */
  private[graft] val candFracBudget = 0.05

  /** DuckDB mirror of the multi-probe SRP index: `bk` = (vec_id, t, b)
    * exact memberships over tables*bits planes (same
    * Kirsch-Mitzenmacher md5-60 formula as [[VectorFunctions.planeDot]]),
    * `pr` = (vec_id, t, pb) flip-1 probes (own bucket + each 1-bit
    * flip). Expects a CTE `e(vec_id, v DOUBLE[])` in scope; emits two
    * comma-joined CTEs WITHOUT trailing comma. */
  private def srpIndexSql(bits: Int, tables: Int): String =
    s"""dots AS (
       |  SELECT vec_id, p,
       |    list_reduce([v[i+1] * ((((('0x' || substr(md5('plane_a_' || p::VARCHAR), 1, 15))::BIGINT
       |                             + (i+1) * (('0x' || substr(md5('plane_b_' || p::VARCHAR), 1, 15))::BIGINT % 281474976710656))
       |                            % 1152921504606846976) % 1001 - 500) / 500.0)
       |                 for i in range(0, len(v))], (acc, x) -> acc + x) AS dp
       |  FROM e, range(${bits * tables}) r(p)),
       |bk AS (
       |  SELECT vec_id, p // $bits AS t,
       |    sum(CASE WHEN dp > 0 THEN 1::BIGINT << (p % $bits) ELSE 0::BIGINT END) AS b
       |  FROM dots GROUP BY 1, 2),
       |pr AS (
       |  SELECT vec_id, t, CASE WHEN f = $bits THEN b ELSE xor(b, 1::BIGINT << f) END AS pb
       |  FROM bk, range(${bits + 1}) rf(f))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_knn_brute",
      s"""SELECT q_id, n_id, rnk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
         |      e.vec_id ASC) AS INT) AS rnk
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $nQueries) t
         |WHERE rnk <= $kNeighbors
         |""".stripMargin) { (s, d) =>
      val emb = embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.api.Graft.knnBrute(emb, emb.filter(col("id") < nQueries), kNeighbors)
    },

    // ANN: multi-table sign-LSH (4 tables x 3 bits — coarse buckets since
    // the synthetic vectors are near-random; clustered real embeddings
    // would support more bits per table). Candidates = same
    // (table, bucket) in any table — P(hit) = 1-(1-p^3)^4 per neighbor.
    // At 100 TB the (table, bucket) pair is the shuffle key; each bucket
    // holds ~corpus/2^bits rows and only candidates get scored.
    // The md5-60-derived planes let the oracle replicate bucketing
    // bit-for-bit, so even this approximate operator is hash-checked.
    QueryDef(
      "q_knn_lsh",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |dots AS (
         |  SELECT vec_id, p,
         |    list_reduce([v[i+1] * ((((('0x' || substr(md5('plane_a_' || p::VARCHAR), 1, 15))::BIGINT
         |                             + (i+1) * (('0x' || substr(md5('plane_b_' || p::VARCHAR), 1, 15))::BIGINT % 281474976710656))
         |                            % 1152921504606846976) % 1001 - 500) / 500.0)
         |                 for i in range(0, len(v))], (acc, x) -> acc + x) AS dp
         |  FROM e, range(12) r(p)),
         |bk AS (
         |  SELECT vec_id, p // 3 AS t,
         |    sum(CASE WHEN dp > 0 THEN 1::BIGINT << (p % 3) ELSE 0::BIGINT END) AS b
         |  FROM dots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
         |  FROM bk q JOIN bk n ON q.t = n.t AND q.b = n.b AND n.vec_id <> q.vec_id
         |  WHERE q.vec_id < $nQueries)
         |SELECT q_id, n_id, rnk FROM (
         |  SELECT c.q_id, c.n_id,
         |    CAST(row_number() OVER (PARTITION BY c.q_id ORDER BY
         |      list_cosine_similarity(eq.v, en.v) DESC, c.n_id ASC) AS INT) AS rnk
         |  FROM cand c JOIN e eq ON eq.vec_id = c.q_id JOIN e en ON en.vec_id = c.n_id) t
         |WHERE rnk <= $kNeighbors
         |""".stripMargin) { (s, d) =>
      val (bits, tables) = (3, 4)
      val emb = embeddings(s, d)
        .withColumn("tb", lshTables(col("embedding"), bits, tables))
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("tb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      emb.select(col("vec_id").as("n_id"), col("embedding"), col("tb"))
        .join(broadcast(queries), Seq("tb"))
        .filter(col("n_id") =!= col("q_id"))
        .dropDuplicates("q_id", "n_id")
        .withColumn("cos", cosine(col("q_emb"), col("embedding")))
        .select(col("q_id"), col("n_id"), row_number().over(w).as("rnk"))
        .filter(col("rnk") <= kNeighbors)
    },

    // IVF-style ANN: the label column is the coarse-quantizer cell (in a
    // real IVF the cell comes from a k-means codebook; the synthetic data
    // ships cluster ids). Search only the query's cell — the inverted-list
    // shape: shuffle key = cell id, each probe scans corpus/cells rows.
    // The probe set is deterministic (the data's own cell id), so the
    // oracle is the same label-restricted rank query.
    QueryDef(
      "q_knn_ivf",
      s"""SELECT q_id, n_id, rnk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC,
         |      e.vec_id ASC) AS INT) AS rnk
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id AND e.label = q.label
         |  WHERE q.vec_id < $nQueries) t
         |WHERE rnk <= $kNeighbors
         |""".stripMargin) { (s, d) =>
      val emb = embeddings(s, d)
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("label"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      emb.select(col("vec_id").as("n_id"), col("embedding"), col("label"))
        .join(broadcast(queries), Seq("label"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cos", cosine(col("q_emb"), col("embedding")))
        .select(col("q_id"), col("n_id"), row_number().over(w).as("rnk"))
        .filter(col("rnk") <= kNeighbors)
    },

    // IVF multi-probe: a computed codebook (per-cell, per-dimension
    // decimal-exact means — both engines build the identical centroids),
    // nprobe=3 nearest cells per query, candidates ranked only inside
    // probed cells. The full production IVF shape: codebook broadcasts,
    // candidates shuffle on the cell key, each query scores ~nprobe/cells
    // of the corpus.
    QueryDef(
      "q_knn_ivf_probe",
      s"""WITH e AS (SELECT vec_id, label AS cell, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ex AS (SELECT cell, unnest([{'i': i, 'x': v[i+1]} for i in range(0, len(v))]) AS st FROM e),
         |comp AS (
         |  SELECT cell, st.i AS i,
         |    CAST(round(sum(CAST(st.x AS DECIMAL(38,10))), 4) AS DOUBLE) / count(*) AS c
         |  FROM ex GROUP BY cell, st.i),
         |cent AS (SELECT cell, list(c ORDER BY i) AS cvec FROM comp GROUP BY cell),
         |qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $nQueries),
         |probe AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, c.cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC, c.cell ASC) AS pr
         |    FROM qs q CROSS JOIN cent c) t
         |  WHERE pr <= 3)
         |SELECT q_id, n_id, rnk FROM (
         |  SELECT p.q_id, n.vec_id AS n_id,
         |    CAST(row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY list_cosine_similarity(q.qv, n.v) DESC, n.vec_id ASC) AS INT) AS rnk
         |  FROM probe p JOIN qs q ON q.q_id = p.q_id JOIN e n ON n.cell = p.cell
         |  WHERE n.vec_id <> p.q_id) t
         |WHERE rnk <= $kNeighbors
         |""".stripMargin) { (s, d) =>
      val emb = embeddings(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"), col("label").as("cell"))
      graft.api.Graft.ivfProbe(emb, emb.filter(col("id") < nQueries),
        k = kNeighbors, nprobe = 3)
    },

    // Embedding-cosine near-dup — the BENCHED entry runs the SELECTIVE
    // index (8 independent 12-bit tables, flip-1 probing): candidates =
    // pairs within Hamming distance 1 in ANY table, then exact-cosine
    // verify at 0.4, with a LOUD candidate-fraction guard (<= 5%, the
    // spec's selectivity bar) so a geometry drifting toward all-pairs
    // fails with a remedy instead of silently going quadratic. This is
    // the production shape: the random-pair candidate floor is
    // 8 * 13/2^12 ~ 2.5% of pairs, recall >= 0.95 on planted near-dups
    // at cos ~0.95 is spec-pinned (SimilarityRecallSpec selective
    // branch), and only (id, t, b) keys shuffle through the candidate
    // join + distinct — vectors join back BY ID for the verify.
    // On THIS fixture's adversarial geometry (tau = 0.4 sits at the
    // random-pair cosine, where no LSH separates) the selective index
    // finds a deterministic SUBSET of the true pairs — achieving
    // >= 0.95 recall there is information-theoretically brute force
    // and lives in q_dedup_embedding_exhaustive (correctness-only,
    // measured quadratic at the 10x stretch: BASELINE.md §2). The
    // oracle mirrors the index AND the cosine fold exactly (same
    // multiply/add sequence, dot/(sqrt*sqrt)) so every emitted double
    // is bit-identical.
    QueryDef(
      "q_dedup_embedding",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${srpIndexSql(selBits, selTables)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS i, p.vec_id AS j
         |  FROM bk a JOIN pr p ON p.t = a.t AND p.pb = a.b AND a.vec_id < p.vec_id),
         |scored AS (
         |  SELECT i, j,
         |    list_reduce([ea.v[k+1] * eb.v[k+1] for k in range(0, len(ea.v))], (acc, x) -> acc + x)
         |      / (sqrt(list_reduce([x * x for x in ea.v], (acc, y) -> acc + y))
         |         * sqrt(list_reduce([x * x for x in eb.v], (acc, y) -> acc + y))) AS cos
         |  FROM cand JOIN e ea ON ea.vec_id = i JOIN e eb ON eb.vec_id = j)
         |SELECT i, j, cos FROM scored WHERE cos >= 0.4
         |""".stripMargin) { (s, d) =>
      embeddingNearDupPairs(s, d, selBits, selTables,
        guardFrac = Some(candFracBudget))
    },

    // The EXHAUSTIVE config (16 x 6-bit, flip-1) as a correctness-only
    // breadth entry: >= 0.95 measured recall of the true tau = 0.4
    // pairs on the fixture's near-orthogonal vectors (pinned in
    // SimilarityRecallSpec) — a bar that, with tau at the random-pair
    // cosine level, NO selective index can meet (collision probability
    // is monotone in cosine, and tau-pairs sit barely above random), so
    // its cand_frac ~0.82 all-pairs cost is the geometry's, not the
    // operator's: measured 585.9 s at the 10x stretch vs 7.4 s at
    // sf0.1 (BASELINE.md §2). Excluded from the bench BY DESIGN — a
    // user copying the benched q_dedup_embedding gets the selective
    // production config; this entry exists for geometry-adversarial
    // recall coverage. No guard: exhaustive is its point.
    QueryDef(
      "q_dedup_embedding_exhaustive",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${srpIndexSql(srpBits, srpTables)},
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS i, p.vec_id AS j
         |  FROM bk a JOIN pr p ON p.t = a.t AND p.pb = a.b AND a.vec_id < p.vec_id),
         |scored AS (
         |  SELECT i, j,
         |    list_reduce([ea.v[k+1] * eb.v[k+1] for k in range(0, len(ea.v))], (acc, x) -> acc + x)
         |      / (sqrt(list_reduce([x * x for x in ea.v], (acc, y) -> acc + y))
         |         * sqrt(list_reduce([x * x for x in eb.v], (acc, y) -> acc + y))) AS cos
         |  FROM cand JOIN e ea ON ea.vec_id = i JOIN e eb ON eb.vec_id = j)
         |SELECT i, j, cos FROM scored WHERE cos >= 0.4
         |""".stripMargin,
      bench = false) { (s, d) =>
      embeddingNearDupPairs(s, d, srpBits, srpTables, guardFrac = None)
    },

    // SEMANTIC decontamination — the embedding-space member of the
    // decontamination family (digest + 13-gram + stream twins exist):
    // a train vector is contaminated when its cosine to ANY eval-split
    // vector (vec_id % 50 = 0) reaches tau = 0.2 (the fixture's
    // embeddings are near-orthogonal random vectors, so 0.2 marks the
    // top decile of proximity; a real embedding space would sit tau at
    // ~0.9) — paraphrase-level eval leakage the n-gram check cannot see.
    // r12 REBUILD: candidates now come from the OR-amplified multi-probe
    // SRP index (16 independent 6-bit tables, eval side probes its
    // bucket + every 1-bit flip) instead of r11's single 6-bit bucket —
    // measured recall of true tau-pairs vs brute force at sf0.01 rose
    // 0.03 -> 0.99 (SimilarityRecallSpec pins >= 0.95). For
    // decontamination every missed neighbor is eval leakage, so the
    // fixture config leans exhaustive (its tau sits at the random-pair
    // cosine, where no LSH separates); the same family at 12 bits is
    // selective on clustered data — both regimes spec-pinned.
    // Scale shape unchanged: the tiny eval side fans out (bits+1 probe
    // keys x tables, still broadcast), the corpus never shuffles —
    // candidate keys flow through one distinct, vectors join back BY ID.
    // Per train vector: hit count, max cosine (NULL when clean —
    // identically absent both engines), verdict.
    QueryDef(
      "q_dedup_decontaminate_semantic",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${srpIndexSql(srpBits, srpTables)},
         |evp AS (SELECT vec_id, t, pb FROM pr WHERE vec_id % 50 = 0),
         |tr AS (SELECT vec_id, t, b FROM bk WHERE vec_id % 50 <> 0),
         |cand AS (
         |  SELECT DISTINCT t.vec_id AS i, e2.vec_id AS j
         |  FROM tr t JOIN evp e2 ON e2.t = t.t AND e2.pb = t.b),
         |scored AS (
         |  SELECT i,
         |    list_reduce([ea.v[k+1] * eb.v[k+1] for k in range(0, len(ea.v))], (acc, x) -> acc + x)
         |      / (sqrt(list_reduce([x * x for x in ea.v], (acc, y) -> acc + y))
         |         * sqrt(list_reduce([x * x for x in eb.v], (acc, y) -> acc + y))) AS cos
         |  FROM cand JOIN e ea ON ea.vec_id = i JOIN e eb ON eb.vec_id = j),
         |hits AS (
         |  SELECT i, count(*)::BIGINT AS n_hits, max(cos) AS max_cos
         |  FROM scored WHERE cos >= 0.2 GROUP BY 1)
         |SELECT b.vec_id, coalesce(h.n_hits, 0) AS n_hits, h.max_cos,
         |  coalesce(h.n_hits, 0) > 0 AS contaminated
         |FROM (SELECT vec_id FROM e WHERE vec_id % 50 <> 0) b
         |LEFT JOIN hits h ON h.i = b.vec_id
         |""".stripMargin) { (s, d) =>
      val bk = embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          lshBucketArr(col("embedding"), srpBits, srpTables).as("bks"))
        .localCheckpoint() // sketch built once; eval + train sides read it
      val ev = bk.filter(col("vec_id") % 50 === 0)
      val tr = bk.filter(col("vec_id") % 50 =!= 0)
      val cand = tr
        .select(col("vec_id").as("i"), lshTableKeys(col("bks")).as("tb"))
        .join(broadcast(ev.select(col("vec_id").as("j"),
          lshProbeKeys(col("bks"), srpBits).as("tb"))), Seq("tb"))
        .select("i", "j").distinct()
      val hits = cand
        .join(tr.select(col("vec_id").as("i"), col("embedding").as("emb_i")), Seq("i"))
        .join(broadcast(ev.select(col("vec_id").as("j"),
          col("embedding").as("emb_j"))), Seq("j"))
        .withColumn("cos", cosine(col("emb_i"), col("emb_j")))
        .filter(col("cos") >= 0.2)
        .groupBy("i").agg(count(lit(1)).as("n_hits"), max("cos").as("max_cos"))
      tr.select(col("vec_id"))
        .join(hits, col("vec_id") === col("i"), "left")
        .select(col("vec_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("max_cos"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
    },

    // Product-quantization ANN, two-stage: 4 subspaces x 16 dims, 32
    // codewords each, trained by the grouped spherical k-means — a
    // 64-float embedding compresses to 4 codes (the memory lever that
    // fits a 100 TB corpus's index in RAM). Search = broadcast-LUT
    // lookups + fixed-order adds over the WHOLE corpus (never per-row
    // vector math), then exact-cosine rerank of a constant 100-candidate
    // shortlist per query (measured recall@5 0.8 vs brute force at
    // sf0.01, pinned in spec). The oracle replays the entire pipeline —
    // per-subspace seeds, 2 Lloyd rounds, encoding, LUT, ADC shortlist,
    // exact rerank — and the ranks match hash-exact.
    QueryDef(
      "q_knn_pq",
      pqOracle(subspaces = 4, subDim = 16, k = 32, iters = 2,
        topK = kNeighbors, nQ = nQueries, shortlist = 100)) { (s, d) =>
      val emb = embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.api.Graft.pqSearch(emb, emb.filter(col("id") < nQueries),
        subspaces = 4, subDim = 16, k = 32, iters = 2, topK = kNeighbors,
        shortlist = 100)
    },

    // IVF+PQ (r12) — the production ANN architecture, composing the two
    // halves already proven separately: coarse probe of nprobe=3
    // inverted-file cells (q_knn_ivf_probe's decimal-exact centroids),
    // then ADC scoring of ONLY the probed cells' members against the
    // broadcast PQ lookup tables (q_knn_pq's trained codebooks), exact
    // rerank of a 50-candidate shortlist. The memory story at 100 TB:
    // centroids broadcast, codes are subspaces bytes per vector, each
    // query touches ~nprobe/cells of the CODES — raw vectors are read
    // only for the shortlist rerank. The oracle replays codebook
    // training, probing, candidate restriction, LUT build, and the
    // fixed-order ADC sums stage by stage — ranks hash-exact.
    QueryDef(
      "q_knn_ivfpq",
      ivfPqOracle(subspaces = 4, subDim = 16, k = 32, iters = 2,
        nprobe = 3, topK = kNeighbors, nQ = nQueries, shortlist = 50)) { (s, d) =>
      val emb = embeddings(s, d).select(col("vec_id").as("id"),
        col("embedding").as("vec"), col("label").as("cell"))
      graft.api.Graft.ivfPqSearch(emb, emb.filter(col("id") < nQueries),
        subspaces = 4, subDim = 16, k = 32, iters = 2, nprobe = 3,
        topK = kNeighbors, shortlist = 50)
    },

    // Distributed spherical k-means (Lloyd, 3 rounds, k=8): the codebook
    // trainer for IVF and the clustering a curation pipeline balances
    // mixtures with. Fully deterministic (h60 seeds, decimal-exact
    // centroid means, full tie-breaks), so the oracle replays EVERY round
    // as materialized CTE stages — seeds, assign, re-center, assign... —
    // and the final assignment must match hash-exactly. Scale: per round
    // one k-row broadcast + one (cell, dim, x) shuffle; never pairwise.
    QueryDef(
      "q_cluster_kmeans",
      kmeansOracle(k = 8, iters = 3)) { (s, d) =>
      graft.api.Graft.kmeans(
        embeddings(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 8, iters = 3)
    },

    // Semantic dedup (the SemDeDup shape): k-means cells, then within
    // each cell drop every member that has a strictly more-central
    // neighbor (cosine-to-centroid rank, id tie-break) with pairwise
    // cosine >= tau — near-MEANING duplicates collapse to their most
    // central representative with zero text-overlap signal. tau = 0.35:
    // the synthetic embeddings are near-random (pairwise cosine tops out
    // ~0.51), so a production-style 0.95 bar would be vacuous; 0.35
    // drops a measured ~100 of 500 docs at sf0.01. Candidate pairs come
    // from the cell equi-join only; k scales with the corpus so cells
    // stay constant-size (the SemDeDup recipe), keeping within-cell
    // pairs linear overall. The oracle replays the training rounds as
    // materialized stages, then states the same EXISTS drop rule.
    QueryDef(
      "q_dedup_semantic",
      semanticOracle(k = 8, iters = 2, tau = 0.35)) { (s, d) =>
      graft.api.Graft.semanticDedup(
        embeddings(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 8, iters = 2, tau = 0.35)
    }
  )

  /** Shared kernel of the embedding near-dup family: build the
    * multi-probe SRP index once (checkpointed — exact + probe sides
    * read it), equi-join exact memberships against flip-1 probes on
    * (t, b), distinct the (i, j) keys, then exact-cosine verify at
    * tau = 0.4 with vectors joined back BY ID. With `guardFrac`, the
    * checkpointed candidate set is counted (two driver-side reads of
    * already-materialized frames — the documented loop-break pattern)
    * and the job fails loudly when candidates exceed that fraction of
    * all pairs: the stated budget that keeps the benched config from
    * silently drifting into the all-pairs regime. */
  private def embeddingNearDupPairs(s: org.apache.spark.sql.SparkSession,
      d: String, bits: Int, tables: Int,
      guardFrac: Option[Double]): org.apache.spark.sql.DataFrame = {
    val bk = embeddings(s, d)
      .select(col("vec_id"),
        lshBucketArr(col("embedding"), bits, tables).as("bks"))
      .localCheckpoint() // sketch built once; exact + probe sides read it
    val ex = bk.select(col("vec_id").as("i"), lshTableKeys(col("bks")).as("tb"))
    val pr = bk.select(col("vec_id").as("j"), lshProbeKeys(col("bks"), bits).as("tb"))
    var cand = ex.join(pr, Seq("tb"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    guardFrac.foreach { budget =>
      val c = cand.localCheckpoint()
      val (n, nCand) = (bk.count(), c.count())
      val frac = if (n < 2) 0.0 else nCand.toDouble / (n.toDouble * (n - 1) / 2.0)
      if (frac > budget)
        throw new IllegalStateException(
          f"q_dedup_embedding: candidate fraction $frac%.3f ($nCand pairs over " +
            f"$n vectors) exceeds the $budget%.2f budget — the ${tables}x$bits-bit " +
            "index is not selective on this data's geometry. Raise bits per " +
            "table (the floor falls ~2x per bit), or use the exhaustive " +
            "variant knowingly: at this fraction the verify stage is " +
            "effectively all-pairs (quadratic).")
      cand = c
    }
    val e = embeddings(s, d)
    cand
      .join(e.select(col("vec_id").as("i"), col("embedding").as("emb_i")), Seq("i"))
      .join(e.select(col("vec_id").as("j"), col("embedding").as("emb_j")), Seq("j"))
      .withColumn("cos", cosine(col("emb_i"), col("emb_j")))
      .filter(col("cos") >= 0.4)
      .select("i", "j", "cos")
  }

  /** Shared CTE prefix of the PQ family: slice, per-subspace seeds (same
    * md5-60 order), `iters` grouped Lloyd rounds as materialized stages,
    * codebooks with norms, the query set, and the per-(query, m,
    * codeword) LUT. Leaves `e` (with the coarse `cell` column), `sub`,
    * `a$iters`, `books`, `qs`, `lut` defined; ends WITHOUT a trailing
    * comma. */
  private def pqStages(subspaces: Int, subDim: Int, k: Int, iters: Int,
      nQ: Int): String = {
    def assign(t: Int, cents: String): String =
      s"""a$t AS MATERIALIZED (
         |  SELECT m, id, cell FROM (
         |    SELECT s.m, s.id, c.cell, row_number() OVER (PARTITION BY s.m, s.id
         |      ORDER BY list_cosine_similarity(s.sv, c.cvec) DESC, c.cell ASC) AS rn
         |    FROM sub s JOIN $cents c ON c.m = s.m) t WHERE rn = 1)""".stripMargin
    def center(t: Int): String =
      s"""ex$t AS (
         |  SELECT a.m, a.cell, unnest([{'i': i, 'x': s.sv[i+1]} for i in range(0, len(s.sv))]) AS st
         |  FROM a${t - 1} a JOIN sub s ON s.m = a.m AND s.id = a.id),
         |comp$t AS (
         |  SELECT m, cell, st.i AS i,
         |    CAST(round(sum(CAST(st.x AS DECIMAL(38,10))), 4) AS DOUBLE) / count(*) AS c
         |  FROM ex$t GROUP BY m, cell, st.i),
         |c$t AS MATERIALIZED (SELECT m, cell, list(c ORDER BY i) AS cvec FROM comp$t GROUP BY m, cell)""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, label AS cell, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sub AS (SELECT id, m, v[m*$subDim+1:(m+1)*$subDim] AS sv FROM e, range($subspaces) r(m)),
       |seeds AS (
       |  SELECT m, id AS cell, sv AS cvec FROM (
       |    SELECT m, id, sv, row_number() OVER (PARTITION BY m ORDER BY
       |      ('0x' || substr(md5('pq:' || m::VARCHAR || ':' || id::VARCHAR), 1, 15))::BIGINT ASC,
       |      id ASC) AS rn
       |    FROM sub) t WHERE rn <= $k),
       |""".stripMargin +
      assign(0, "seeds") + ",\n" +
      (1 to iters).map(t => center(t) + ",\n" + assign(t, s"c$t"))
        .mkString(",\n") + ",\n" +
      s"""books AS (
         |  SELECT m, cell, cvec,
         |    list_reduce([x * x for x in cvec], (acc, y) -> acc + y) AS cn2
         |  FROM c$iters),
         |qs AS (
         |  SELECT id AS q_id, v,
         |    sqrt(list_reduce([x * x for x in v], (acc, y) -> acc + y)) AS qn
         |  FROM e WHERE id < $nQ),
         |qsub AS (SELECT q_id, m, v[m*$subDim+1:(m+1)*$subDim] AS sv FROM qs, range($subspaces) r(m)),
         |lut AS (
         |  SELECT q.q_id, b.m, b.cell,
         |    list_reduce([q.sv[i+1] * b.cvec[i+1] for i in range(0, len(q.sv))],
         |      (acc, x) -> acc + x) AS dotv,
         |    b.cn2
         |  FROM qsub q JOIN books b ON b.m = q.m)""".stripMargin
  }

  private def adcSums(subspaces: Int): (String, String, String, String) = (
    (0 until subspaces).map(m => s"d$m").reduce((a, b) => s"($a + $b)"),
    (0 until subspaces).map(m => s"n$m").reduce((a, b) => s"($a + $b)"),
    (0 until subspaces).map(m =>
      s"max(CASE WHEN a.m = $m THEN l.dotv END) AS d$m").mkString(",\n    "),
    (0 until subspaces).map(m =>
      s"max(CASE WHEN a.m = $m THEN l.cn2 END) AS n$m").mkString(",\n    "))

  /** DuckDB mirror of [[graft.api.Graft.pqSearch]]: the shared PQ stages,
    * then the ADC score over the WHOLE corpus with the SAME fixed-order
    * M-term sums — ranks must match hash-exactly. */
  private def pqOracle(subspaces: Int, subDim: Int, k: Int, iters: Int,
      topK: Int, nQ: Int, shortlist: Int): String = {
    val (dsum, nsum, dcases, ncases) = adcSums(subspaces)
    pqStages(subspaces, subDim, k, iters, nQ) + ",\n" +
      s"""parts AS (
         |  SELECT l.q_id, a.id AS n_id,
         |    $dcases,
         |    $ncases
         |  FROM a$iters a JOIN lut l ON l.m = a.m AND l.cell = a.cell
         |  GROUP BY l.q_id, a.id),
         |scored AS (
         |  SELECT p.q_id, p.n_id, $dsum / (q.qn * sqrt($nsum)) AS score
         |  FROM parts p JOIN qs q ON q.q_id = p.q_id),
         |short AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id ASC) AS prnk
         |    FROM scored WHERE n_id <> q_id) t
         |  WHERE prnk <= $shortlist)
         |SELECT q_id, n_id, rnk FROM (
         |  SELECT s.q_id, s.n_id, CAST(row_number() OVER (PARTITION BY s.q_id
         |    ORDER BY list_cosine_similarity(q.v, n.v) DESC, s.n_id ASC) AS INT) AS rnk
         |  FROM short s JOIN qs q ON q.q_id = s.q_id JOIN e n ON n.id = s.n_id) t
         |WHERE rnk <= $topK
         |""".stripMargin
  }

  /** DuckDB mirror of [[graft.api.Graft.ivfPqSearch]]: the shared PQ
    * stages, the coarse centroid/probe CTEs (q_knn_ivf_probe's own
    * derivation), candidates restricted to probed cells, then the SAME
    * ADC + exact-rerank tail over candidates only. */
  private def ivfPqOracle(subspaces: Int, subDim: Int, k: Int, iters: Int,
      nprobe: Int, topK: Int, nQ: Int, shortlist: Int): String = {
    val (dsum, nsum, dcases, ncases) = adcSums(subspaces)
    pqStages(subspaces, subDim, k, iters, nQ) + ",\n" +
      s"""ccomp AS (
         |  SELECT cell, st.i AS i,
         |    CAST(round(sum(CAST(st.x AS DECIMAL(38,10))), 4) AS DOUBLE) / count(*) AS c
         |  FROM (SELECT cell, unnest([{'i': i, 'x': v[i+1]} for i in range(0, len(v))]) AS st FROM e) u
         |  GROUP BY cell, st.i),
         |ccent AS (SELECT cell, list(c ORDER BY i) AS cvec FROM ccomp GROUP BY cell),
         |probe AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, c.cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY list_cosine_similarity(q.v, c.cvec) DESC, c.cell ASC) AS pr
         |    FROM qs q CROSS JOIN ccent c) t
         |  WHERE pr <= $nprobe),
         |cand AS (
         |  SELECT p.q_id, n.id AS n_id
         |  FROM probe p JOIN e n ON n.cell = p.cell
         |  WHERE n.id <> p.q_id),
         |parts AS (
         |  SELECT c.q_id, a.id AS n_id,
         |    $dcases,
         |    $ncases
         |  FROM a$iters a JOIN cand c ON c.n_id = a.id
         |  JOIN lut l ON l.q_id = c.q_id AND l.m = a.m AND l.cell = a.cell
         |  GROUP BY c.q_id, a.id),
         |scored AS (
         |  SELECT p.q_id, p.n_id, $dsum / (q.qn * sqrt($nsum)) AS score
         |  FROM parts p JOIN qs q ON q.q_id = p.q_id),
         |short AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, n_id ASC) AS prnk
         |    FROM scored) t
         |  WHERE prnk <= $shortlist)
         |SELECT q_id, n_id, rnk FROM (
         |  SELECT s.q_id, s.n_id, CAST(row_number() OVER (PARTITION BY s.q_id
         |    ORDER BY list_cosine_similarity(q.v, n.v) DESC, s.n_id ASC) AS INT) AS rnk
         |  FROM short s JOIN qs q ON q.q_id = s.q_id JOIN e n ON n.id = s.n_id) t
         |WHERE rnk <= $topK
         |""".stripMargin
  }

  /** The WITH-chain replaying [[graft.api.Graft.kmeansFit]] round by
    * round: seeds by md5-60 of the id, then `iters` rounds of
    * (decimal-exact per-(cell, dim) means -> max-cosine re-assignment),
    * each stage MATERIALIZED. Same cosine (list_cosine_similarity == the
    * codegen'd CosineSim fold), same rounding, same tie-breaks. Leaves
    * `a$iters` (id, cell) and `c$iters` (cell, cvec) defined for the
    * caller's tail; ends WITHOUT a trailing comma. */
  private def kmeansStages(k: Int, iters: Int): String = {
    def assign(t: Int, cents: String): String =
      s"""a$t AS MATERIALIZED (
         |  SELECT id, cell FROM (
         |    SELECT e.id, c.cell, row_number() OVER (PARTITION BY e.id
         |      ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.cell ASC) AS rn
         |    FROM e CROSS JOIN $cents c) t WHERE rn = 1)""".stripMargin
    def center(t: Int): String =
      s"""ex$t AS (
         |  SELECT a.cell, unnest([{'i': i, 'x': e.v[i+1]} for i in range(0, len(e.v))]) AS st
         |  FROM a${t - 1} a JOIN e ON e.id = a.id),
         |comp$t AS (
         |  SELECT cell, st.i AS i,
         |    CAST(round(sum(CAST(st.x AS DECIMAL(38,10))), 4) AS DOUBLE) / count(*) AS c
         |  FROM ex$t GROUP BY cell, st.i),
         |c$t AS MATERIALIZED (SELECT cell, list(c ORDER BY i) AS cvec FROM comp$t GROUP BY cell)""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |seeds AS (
       |  SELECT id AS cell, v AS cvec FROM e
       |  ORDER BY ('0x' || substr(md5('km:' || id::VARCHAR), 1, 15))::BIGINT ASC, id ASC
       |  LIMIT $k),
       |""".stripMargin +
      assign(0, "seeds") + ",\n" +
      (1 to iters).map(t => center(t) + ",\n" + assign(t, s"c$t"))
        .mkString(",\n")
  }

  /** DuckDB mirror of [[graft.api.Graft.kmeans]]. */
  private def kmeansOracle(k: Int, iters: Int): String =
    kmeansStages(k, iters) + s"\nSELECT id, cell FROM a$iters\n"

  /** DuckDB mirror of [[graft.api.Graft.semanticDedup]]: the kmeans
    * stage replay, then centrality ranks against the final centroids and
    * the same EXISTS drop rule over within-cell ranked pairs. `rk` is
    * referenced twice -> MATERIALIZED. */
  private def semanticOracle(k: Int, iters: Int, tau: Double): String =
    kmeansStages(k, iters) + ",\n" +
      s"""mem AS (
         |  SELECT a.id, a.cell, e.v,
         |    list_cosine_similarity(e.v, c.cvec) AS central
         |  FROM a$iters a JOIN e ON e.id = a.id JOIN c$iters c ON c.cell = a.cell),
         |rk AS MATERIALIZED (
         |  SELECT id, cell, v, row_number() OVER (PARTITION BY cell
         |    ORDER BY central DESC, id ASC) AS kr
         |  FROM mem)
         |SELECT id, cell FROM rk r
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM rk a
         |  WHERE a.cell = r.cell AND a.kr < r.kr
         |    AND list_cosine_similarity(a.v, r.v) >= $tau)
         |""".stripMargin
}
