package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.QueryDef
import graft.sources.Tables._

/** Bloom-filter pre-filtered join — the runtime-filter pattern that makes
  * 100 TB fact-to-dim joins cheap: build a tiny bloom sketch of the dim
  * keys, broadcast it, and drop non-matching fact rows at the SCAN (no
  * shuffle, no join state for the dropped rows). Spark 4 injects this
  * automatically for some shapes (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`); this operator makes the sketch an explicit, oracle-checkable
  * value so the false-positive behavior itself is pinned.
  *
  * Portability: k=3 hash positions over m=4096 bits come from the md5-60
  * split (Kirsch-Mitzenmacher, [[graft.Exact.h60]]), so the DuckDB oracle
  * reproduces the EXACT same bloom words and the exact same false
  * positives — the approximate structure is deterministic, making an
  * exact hash-match oracle possible. Bits pack 8-per-word (512 smallint
  * words) so no shift ever touches a sign bit in either engine.
  *
  * Reference tie-in: the reference has no joins at all (SURVEY.md §2.2);
  * this belongs to the scale layer, like `SkewJoin`.
  */
object BloomJoin {

  val Bits = 4096 // m
  val WordBits = 8 // bits per packed word => 512 words
  val K = 3 // hash functions

  /** k=3 bit positions in [0, Bits) for a string key, via one md5. */
  def positions(key: Column): Seq[Column] = {
    val hx = md5(key)
    val ha = conv(substring(hx, 1, 15), 16, 10).cast("long")
    val hb = conv(substring(hx, 16, 15), 16, 10).cast("long") % lit(1L << 56)
    (0 until K).map(i => (ha + lit(i.toLong) * hb) % lit(Bits.toLong))
  }

  /** One-row DataFrame with column `bloom`: array of 512 words (0-255),
    * the OR of all keys' bits. Build side is one narrow pass + a 512-row
    * aggregate — negligible at any scale. */
  def build(keys: DataFrame, keyCol: String): DataFrame = {
    val pos = positions(col(keyCol))
    keys
      .select(explode(array(pos: _*)).as("pos"))
      .select((col("pos") / WordBits).cast("int").as("word"),
        // functions.shiftleft only takes a literal Int bit count — go
        // through the SQL function for a column-valued shift
        call_function("shiftleft", lit(1L),
          (col("pos") % WordBits).cast("int")).as("bit"))
      .groupBy("word").agg(bit_or(col("bit")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("m"))
      // try_element_at pins null-on-missing-key semantics: plain
      // element_at on a map is error-raising under some ANSI configs
      .select(transform(sequence(lit(0), lit(Bits / WordBits - 1)),
        i => coalesce(try_element_at(col("m"), i), lit(0L))).as("bloom"))
  }

  /** True iff all K positions of `key` are set in the broadcast `bloom`
    * array column (element_at is 1-based). */
  def mightContain(key: Column, bloom: Column): Column =
    positions(key).map { p =>
      call_function("shiftright",
        element_at(bloom, (p / WordBits).cast("int") + 1),
        (p % WordBits).cast("int")).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** DuckDB twin of [[positions]]/[[mightContain]]/[[build]] as SQL text,
    * parameterized on the key expression. */
  private def sqlPositions(keyExpr: String): Seq[String] = (0 until K).map { i =>
    s"((('0x' || substr(md5($keyExpr), 1, 15))::BIGINT + $i * (('0x' || substr(md5($keyExpr), 16, 15))::BIGINT % ${1L << 56})) % $Bits)"
  }

  val defs: Seq[QueryDef] = Seq(
    // Fact-side pre-filter: bloom of the suppliers in nations 0-4, probed
    // by every lineitem. Output: per return-flag candidate/true/false-
    // positive counts — the false positives are part of the checked
    // contract (same hashes => same FPs in both engines).
    QueryDef(
      "q_join_bloom", {
        val p = sqlPositions("CAST(s_suppkey AS VARCHAR)")
        val q = sqlPositions("CAST(l_suppkey AS VARCHAR)")
        s"""WITH dim AS (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5),
           |bits AS (
           |  SELECT pos // $WordBits AS word, bit_or(1::BIGINT << CAST(pos % $WordBits AS INT)) AS bits
           |  FROM (SELECT unnest([${p.mkString(",")}]) AS pos FROM dim) t GROUP BY 1),
           |bloom AS (
           |  SELECT list(coalesce(bits, 0) ORDER BY w) AS bloom
           |  FROM range(${Bits / WordBits}) r(w) LEFT JOIN bits ON bits.word = r.w),
           |probe AS (
           |  SELECT l.l_returnflag, l.l_suppkey,
           |    ${q.map(e => s"((bloom[CAST($e // $WordBits AS INT) + 1] >> CAST($e % $WordBits AS INT)) & 1) = 1")
              .mkString(" AND ")} AS cand,
           |    l.l_suppkey IN (SELECT s_suppkey FROM dim) AS truth
           |  FROM lineitem l CROSS JOIN bloom)
           |SELECT l_returnflag, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           |  CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           |  CAST(sum(CASE WHEN cand AND NOT truth THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
           |FROM probe GROUP BY 1
           |""".stripMargin
      }) { (s, d) =>
      val dim = supplier(s, d).filter(col("s_nationkey") < 5).select("s_suppkey")
      val bloom = build(dim.select(col("s_suppkey").cast("string").as("k")), "k")
      val probed = lineitem(s, d)
        .select(col("l_returnflag"), col("l_suppkey"))
        .crossJoin(broadcast(bloom))
        .withColumn("cand", mightContain(col("l_suppkey").cast("string"), col("bloom")))
        .join(broadcast(dim.withColumn("truth_flag", lit(1))),
          col("l_suppkey") === col("s_suppkey"), "left")
        .withColumn("truth", col("truth_flag").isNotNull)
      probed.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("cand"), 1L).otherwise(0L)).as("n_candidates"),
          sum(when(col("truth"), 1L).otherwise(0L)).as("n_true"),
          sum(when(col("cand") && !col("truth"), 1L).otherwise(0L)).as("n_false_pos"))
    }
  )
}
