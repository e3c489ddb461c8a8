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

    // ANN: score only same-bucket candidates. 6 hyperplane bits -> 64
    // buckets; at 100 TB the bucket id is the shuffle key and each bucket
    // is a small fraction of the corpus.
    QueryDef.noOracle("q_knn_lsh") { (s, d) =>
      val bits = 6
      val emb = embeddings(s, d)
        .withColumn("bucket", lshBucket(col("embedding"), bits))
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      emb.select(col("vec_id").as("n_id"), col("embedding"), col("bucket"))
        .join(broadcast(queries), Seq("bucket"))
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
