package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.AsciiSum
import graft.sources.Tables._

/** Parity layer — the reference's actual capability surface as engine
  * queries over the driver's `documents` table (SURVEY.md §7.2-7.3).
  */
object Parity {

  val defs: Seq[QueryDef] = Seq(

    // WordCount, the reference's one registered app (`app_route.py:4-6`):
    // tokenize -> map -> shuffle on key -> partial+final count. This single
    // query exercises the reference's entire dataflow O1-O12.
    QueryDef(
      "q_wordcount",
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents
        |) t WHERE word <> '' GROUP BY word
        |""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
    },

    // The reference's hash partitioner (`utilities.py:59-61`): UTF-8 byte
    // sum mod 100, via the native codegen AsciiSum expression. Exposed as a
    // query so the oracle pins the exact partition-id semantics. The oracle
    // sums UTF-8 OCTETS (each codepoint expanded to its encoded byte sum),
    // matching the reference's sum(bytearray(key.encode())) for non-ASCII
    // tokens too — not codepoints, which would diverge outside ASCII.
    QueryDef(
      "q_parity_partition",
      """SELECT word, CAST(list_sum(list_transform(split(word, ''), x -> CASE
        |    WHEN unicode(x) < 128 THEN unicode(x)
        |    WHEN unicode(x) < 2048 THEN 320 + (unicode(x) // 64) + (unicode(x) % 64)
        |    WHEN unicode(x) < 65536 THEN 480 + (unicode(x) // 4096) + ((unicode(x) // 64) % 64) + (unicode(x) % 64)
        |    ELSE 624 + (unicode(x) // 262144) + ((unicode(x) // 4096) % 64) + ((unicode(x) // 64) % 64) + (unicode(x) % 64)
        |  END)) % 100 AS INT) AS partition_id,
        |  count(*) AS cnt
        |FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents
        |) t WHERE word <> '' GROUP BY word
        |""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("partition_id", AsciiSum.parityPartition(col("word"), 100))
        .select("word", "partition_id", "cnt")
    },

    // MergeSort replacement (`app.py:17-43`): total order over the token
    // stream = range-partitioned sort. Output is the distinct-token rank so
    // the total order is visible to a row-order-insensitive comparator.
    QueryDef(
      "q_parity_sort",
      """SELECT word, CAST(row_number() OVER (ORDER BY word ASC) AS INT) AS pos FROM (
        |  SELECT DISTINCT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents
        |) t WHERE word <> ''
        |""".stripMargin) { (s, d) =>
      // distinct first (vocabulary is small); the global row_number window
      // then runs over the reduced set — not over raw tokens.
      documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .distinct()
        .withColumn("pos", row_number().over(Window.orderBy(col("word").asc)))
    }
  )
}
