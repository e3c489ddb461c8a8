package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.Exact.h60
import graft.sources.Tables._

/** Mergeable-sketch operators beyond HLL (q_agg_approx_distinct) and
  * Misra-Gries (q_agg_heavy_hitters): a count-min frequency sketch, a
  * KMV (k-minimum-values) theta sketch for distinct counting, and exact
  * distinct counting via 64-bit bitmap segments — the three remaining
  * classic shapes of distributed cardinality/frequency summarization.
  * All hashes are Exact.h60 so the DuckDB oracle replays the sketch
  * construction bit-for-bit (the repo-wide sketch discipline); the
  * reference has no sketches at all — its only aggregate is the pairwise
  * WordCount fold (`app.py:13-14`).
  *
  * Scale design: a count-min sketch is a CONSTANT 4x1024 cell table built
  * by partial+final aggregation over (row, bucket) keys derived from the
  * per-token count aggregate (distinct tokens shuffle, never token
  * instances); KMV shuffles one 60-bit hash per distinct key and keeps k
  * per group; bitmap segments cap state at one long per 63-key range per
  * group (63, not 64 — the sign bit stays untouched, see the query note) — all three are algebraic, so map-side combine does the heavy
  * lifting and the final reduce sees bounded state.
  */
object Sketches {

  /** Count-min width (buckets per hash row) and depth (hash rows). */
  private val CmW = 1024
  private val CmD = 4

  /** KMV sketch size: the 8th-smallest hash bounds the estimate;
    * (k-1) * 2^60 stays inside a signed 64-bit long only for k <= 8. */
  private val KmvK = 8
  private val KmvNum = 7L * 1152921504606846976L // (k-1) * 2^60

  val defs: Seq[QueryDef] = Seq(

    // Count-min sketch over the wordcount token stream: depth 4, width
    // 1024, cell(j, b) = total count of tokens hashing to b under row
    // j's hash. The estimate for a token is min over rows of its cell —
    // always >= the true count (collisions only ever inflate). Output
    // compares est vs truth for the 20 most frequent tokens; the
    // one-sided error contract est >= cnt is asserted in SketchesQualitySpec.
    QueryDef(
      "q_agg_countmin",
      s"""WITH tok AS (
         |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word FROM documents),
         |cnts AS (
         |  SELECT word, count(*)::BIGINT AS cnt FROM tok WHERE word <> '' GROUP BY word),
         |cells AS (
         |  SELECT j, ('0x' || substr(md5('cm' || j::VARCHAR || ':' || word), 1, 15))::BIGINT % $CmW AS b,
         |    sum(cnt)::BIGINT AS c
         |  FROM cnts, UNNEST([0, 1, 2, 3]) u(j) GROUP BY 1, 2),
         |top AS (SELECT word, cnt FROM cnts ORDER BY cnt DESC, word LIMIT 20)
         |SELECT t.word, t.cnt, min(cl.c) AS est
         |FROM top t, UNNEST([0, 1, 2, 3]) u(j)
         |JOIN cells cl ON cl.j = u.j
         |  AND cl.b = ('0x' || substr(md5('cm' || u.j::VARCHAR || ':' || t.word), 1, 15))::BIGINT % $CmW
         |GROUP BY t.word, t.cnt
         |""".stripMargin) { (s, d) =>
      val cnts = documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      // sketch built from the count aggregate: per distinct token, one
      // (row, bucket, cnt) triple per hash row — token INSTANCES never
      // shuffle twice
      val cells = cnts
        .select(col("cnt"), explode(sequence(lit(0), lit(CmD - 1))).as("j"),
          col("word"))
        .select(col("j"),
          (h60(concat(lit("cm"), col("j"), lit(":"), col("word"))) % CmW).as("b"),
          col("cnt"))
        .groupBy("j", "b").agg(sum("cnt").as("c"))
      // top-20 via orderBy+limit = TakeOrderedAndProject (no global window)
      val top = cnts.orderBy(col("cnt").desc, col("word").asc).limit(20)
      top.select(col("word"), col("cnt"),
          explode(sequence(lit(0), lit(CmD - 1))).as("j"))
        .withColumn("b",
          h60(concat(lit("cm"), col("j"), lit(":"), col("word"))) % CmW)
        .join(cells, Seq("j", "b"))
        .groupBy("word", "cnt").agg(min("c").as("est"))
        .select("word", "cnt", "est")
    },

    // KMV (theta) sketch: distinct users per event type estimated from
    // the k smallest h60 hashes of the key universe seen by the group.
    // theta = the k-th smallest hash; est = (k-1) * 2^60 / theta (floor).
    // Groups with fewer than k distinct keys report the exact count.
    // Integer-exact: the oracle replays hash, rank, and floor division.
    QueryDef(
      "q_agg_kmv",
      s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT event_type, user_id,
         |  ('0x' || substr(md5('kmv:' || user_id::VARCHAR), 1, 15))::BIGINT AS h FROM du),
         |r AS (SELECT event_type, h,
         |  row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn FROM h),
         |theta AS (SELECT event_type, h AS th FROM r WHERE rn = $KmvK),
         |ex AS (SELECT event_type, count(*)::BIGINT AS n_exact FROM du GROUP BY 1)
         |SELECT ex.event_type, ex.n_exact,
         |  CASE WHEN t.th IS NULL THEN ex.n_exact ELSE $KmvNum // t.th END AS est
         |FROM ex LEFT JOIN theta t USING (event_type)
         |""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val du = events(s, d).select("event_type", "user_id").distinct()
      val h = du.select(col("event_type"), col("user_id"),
        h60(concat(lit("kmv:"), col("user_id"))).as("h"))
      // per-group rank window (PARTITIONED — the k-th smallest hash per
      // group; state per partition is the group's distinct keys)
      val rn = row_number().over(
        Window.partitionBy("event_type").orderBy(col("h"), col("user_id")))
      val theta = h.withColumn("rn", rn).filter(col("rn") === KmvK)
        .select(col("event_type"), col("h").as("th"))
      val ex = du.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      ex.join(theta, Seq("event_type"), "left")
        .select(col("event_type"), col("n_exact"),
          when(col("th").isNull, col("n_exact"))
            .otherwise(expr(s"$KmvNum div th")).as("est"))
    },

    // Exact distinct counting via bitmap segments: users bucketed into
    // 64-wide ranges, each range's presence OR-ed into one long, distinct
    // count = sum of popcounts. The roaring-bitmap shape: mergeable,
    // constant per-segment state, exact — the middle ground between
    // count_distinct's full shuffle of keys and HLL's approximation.
    // Output carries the count_distinct twin; equality proves exactness.
    // Segments are 63 keys wide, not 64: bit 63 is the sign bit, and the
    // overflow-checked oracle rejects 1::BIGINT << 63 (Spark's shiftleft
    // would wrap silently — staying off the sign bit keeps both engines
    // on defined, identical arithmetic).
    QueryDef(
      "q_agg_bitmap",
      """WITH b AS (
        |  SELECT event_type, user_id // 63 AS seg,
        |    bit_or(1::BIGINT << (user_id % 63)::INTEGER) AS bits
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, sum(bit_count(bits))::BIGINT AS n_bitmap FROM b GROUP BY 1),
        |e AS (SELECT event_type, count(DISTINCT user_id) AS n_distinct FROM events GROUP BY 1)
        |SELECT e.event_type, e.n_distinct, c.n_bitmap FROM e JOIN c USING (event_type)
        |""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val bits = ev
        .select(col("event_type"), expr("user_id div 63").as("seg"),
          expr("shiftleft(1L, cast(user_id % 63 as int))").as("m"))
        .groupBy("event_type", "seg").agg(expr("bit_or(m)").as("bits"))
      val viaBitmap = bits.groupBy("event_type")
        .agg(sum(bit_count(col("bits"))).as("n_bitmap"))
      val exact = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_distinct"))
      exact.join(viaBitmap, Seq("event_type"))
        .select("event_type", "n_distinct", "n_bitmap")
    }
  )
}
