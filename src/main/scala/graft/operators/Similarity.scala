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
  *    only same-bucket pairs are scored. Checked rows-only (bucketing has
  *    no SQL twin) + recall-tested against brute force in ScalaTest.
  *  - embedding near-dup: same buckets, cosine >= 0.95 pair filter.
  */
object Similarity {

  private val kNeighbors = 5
  private val nQueries = 5 // query set: vec_id < 5

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
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      emb.select(col("vec_id").as("n_id"), col("embedding"))
        .join(broadcast(queries), col("n_id") =!= col("q_id"))
        .withColumn("cos", cosine(col("q_emb"), col("embedding")))
        .select(col("q_id"), col("n_id"), row_number().over(w).as("rnk"))
        .filter(col("rnk") <= kNeighbors)
    },

    // ANN: multi-table sign-LSH (4 tables x 3 bits — coarse buckets since
    // the synthetic vectors are near-random; clustered real embeddings
    // would support more bits per table). Candidates = same
    // (table, bucket) in any table — P(hit) = 1-(1-p^4)^3 per neighbor.
    // At 100 TB the (table, bucket) pair is the shuffle key; each bucket
    // holds ~corpus/2^bits rows and only candidates get scored.
    QueryDef.noOracle("q_knn_lsh") { (s, d) =>
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
    QueryDef.noOracle("q_knn_ivf") { (s, d) =>
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

    // Embedding-cosine near-dup: same-bucket pairs above a cosine bar.
    // (Threshold 0.4 — the synthetic vectors top out near 0.51 pairwise,
    // so a production-style 0.95 bar would make the operator vacuous.)
    QueryDef.noOracle("q_dedup_embedding") { (s, d) =>
      val bits = 6
      val emb = embeddings(s, d)
        .withColumn("bucket", lshBucket(col("embedding"), bits))
      val a = emb.select(col("vec_id").as("i"), col("embedding").as("emb_i"), col("bucket"))
      val b = emb.select(col("vec_id").as("j"), col("embedding").as("emb_j"), col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("i") < col("j"))
        .withColumn("cos", cosine(col("emb_i"), col("emb_j")))
        .filter(col("cos") >= 0.4)
        .select("i", "j", "cos")
    }
  )
}
