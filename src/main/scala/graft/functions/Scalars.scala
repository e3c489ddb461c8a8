package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables._

/** Scalar-function suite (string / date / math / array / json / case).
  * The reference's only scalar computation is whitespace split + int()
  * coercion (`datanode.py:601`, `app.py:14`); everything here is Spark
  * built-ins, staying inside whole-stage codegen.
  *
  * Oracle-exactness notes: only IEEE-exact math (abs/floor/ceil/sqrt/%)
  * is used — libm-dependent fns (pow/exp/ln) differ across engines in the
  * last ulp and are avoided in oracled queries.
  */
object Scalars {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_scalar_string",
      """SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
        |  CAST(substring(c_name, 10, 9) AS BIGINT) AS cust_num,
        |  concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
        |  replace(c_name, 'Customer', 'C') AS short_name
        |FROM customer
        |""".stripMargin) { (s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 10, 9).cast("long").as("cust_num"),
        concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast("string")).as("seg_nat"),
        regexp_replace(col("c_name"), "Customer", "C").as("short_name"))
    },

    QueryDef(
      "q_scalar_date",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom, CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002
        |FROM orders
        |""".stripMargin) { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"))
    },

    QueryDef(
      "q_scalar_math",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_extendedprice - 50000) AS abs_diff,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod
        |FROM lineitem
        |""".stripMargin) { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 50000).as("abs_diff"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_discount") * 100).as("disc_pct"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_orderkey") % 7).as("key_mod"))
    },

    // Array ops over the embedding column; only order-independent exact
    // reductions (len / first / min / max) so float results are bit-equal.
    QueryDef(
      "q_scalar_array",
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] AS first_val,
        |  list_aggregate(embedding, 'min') AS min_val,
        |  list_aggregate(embedding, 'max') AS max_val
        |FROM embeddings
        |""".stripMargin) { (s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        array_min(col("embedding")).as("min_val"),
        array_max(col("embedding")).as("max_val"))
    },

    QueryDef(
      "q_scalar_json",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"),
          graft.Exact.decOut(sum(col("value").cast("decimal(38,10)"))).as("sum_value"))
    },

    // Bitwise surface: and/or/xor/shifts/popcount on integer keys —
    // exact in both engines by construction.
    QueryDef(
      "q_scalar_bitwise",
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS lo_byte,
        |  l_orderkey | 4096 AS with_flag,
        |  xor(l_orderkey, l_partkey) AS key_mix,
        |  l_linenumber << 4 AS shifted,
        |  l_orderkey >> 2 AS quartered,
        |  CAST(bit_count(l_orderkey) AS INT) AS popcount
        |FROM lineitem
        |""".stripMargin) { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("lo_byte"),
        col("l_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("key_mix"),
        shiftleft(col("l_linenumber"), 4).as("shifted"),
        shiftright(col("l_orderkey"), 2).as("quartered"),
        bit_count(col("l_orderkey")).cast("int").as("popcount"))
    },

    // Fuzzy matching: Levenshtein edit distance over the (tiny) nation x
    // region name grid, with a best-match rank per nation — the
    // string-similarity primitive of fuzzy record linkage. Both engines
    // implement classic Wagner-Fischer, so distances are identical ints.
    QueryDef(
      "q_scalar_editdist",
      """SELECT n_name, r_name, CAST(levenshtein(n_name, r_name) AS INT) AS dist,
        |  CAST(row_number() OVER (PARTITION BY n_name
        |    ORDER BY levenshtein(n_name, r_name) ASC, r_name ASC) AS INT) AS rnk
        |FROM nation CROSS JOIN region
        |""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("n_name").orderBy(col("dist").asc, col("r_name").asc)
      nation(s, d).select("n_name")
        .crossJoin(broadcast(region(s, d).select("r_name")))
        .withColumn("dist", levenshtein(col("n_name"), col("r_name")))
        .select(col("n_name"), col("r_name"), col("dist"),
          row_number().over(w).as("rnk"))
    },

    // Null semantics: nullif/coalesce/null-safe equality/IS NULL.
    QueryDef(
      "q_scalar_nulls",
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        |  (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open_nullsafe,
        |  (nullif(o_orderstatus, 'O') IS NULL) AS is_open_isnull
        |FROM orders
        |""".stripMargin) { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
        (nullif(col("o_orderstatus"), lit("O")) <=> lit(null)).as("is_open_nullsafe"),
        nullif(col("o_orderstatus"), lit("O")).isNull.as("is_open_isnull"))
    },

    // Map construction + access: per-user event-type -> count map built
    // from sorted entries (deterministic), then key lookup + cardinality.
    QueryDef(
      "q_scalar_map",
      """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(cardinality(map(list(event_type ORDER BY event_type),
        |                       list(n ORDER BY event_type))) AS INT) AS n_types,
        |  map(list(event_type ORDER BY event_type),
        |      list(n ORDER BY event_type))['click'][1] AS clicks
        |FROM c GROUP BY user_id
        |""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("n")))))
          .as("m"))
        .select(col("user_id"), size(col("m")).as("n_types"),
          element_at(col("m"), "click").as("clicks"))
    },

    QueryDef(
      "q_scalar_case",
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1
        |""".stripMargin) { (s, d) =>
      orders(s, d)
        .select(
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
    }
  )
}
