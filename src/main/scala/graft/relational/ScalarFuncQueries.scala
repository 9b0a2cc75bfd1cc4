package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Scalar-function surface (SURVEY.md §2.6): string, date/time, math, JSON
  * and array functions — all codegen'd built-ins, each oracle-checked.
  * Math functions whose libm results can differ by 1 ulp across engines
  * (sqrt/ln/exp) are rounded on both sides.
  */
object ScalarFuncQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_string_funcs" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          lpad(col("p_brand"), 12, "_").as("brand_padded"),
          reverse(col("p_brand")).as("brand_rev"),
          trim(col("p_name")).as("name_trim"),
          (instr(col("p_type"), "a") > 0).as("type_has_a"))),

    "q_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"))),

    "q_json_funcs" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_int"),
          get_json_object(col("props"), "$.missing").as("k_missing"))),

    // Spark 4's VARIANT type (the open binary-JSON encoding semi-
    // structured pipelines ingest once and shred lazily): parse_json ->
    // typed variant_get extraction + schema_of_variant inference, with
    // a missing-path probe returning NULL. At 100 TB the point of
    // VARIANT over repeated get_json_object is parse-once: the string
    // is decoded a single time per row, every later extraction is a
    // binary field walk. The oracle reproduces the typed extraction via
    // DuckDB's JSON functions and pins the inferred schema literal.
    "q_json_variant" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"),
          expr("schema_of_variant(v)").as("vschema"),
          expr("variant_get(v, '$.missing', 'bigint')").as("k_missing"))),

    "q_math_funcs" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
          round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
          pmod(col("l_linenumber"), lit(3)).as("ln_mod"),
          signum(col("l_discount") - 0.05).as("disc_sign"))),

    "q_string_funcs2" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          levenshtein(col("p_brand"), lit("Brand#1")).as("brand_lev"),
          element_at(split(col("p_type"), " "), 1).as("type_word1"),
          repeat(substring(col("p_brand"), 7, 2), 2).as("brand_rep"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_caps_vowels"),
          (instr(col("p_name"), " ") > 0).as("name_has_space"),
          rpad(col("p_brand"), 10, "."). as("brand_rpad"))),

    "q_date_funcs2" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
          dayofweek(col("o_orderdate")).as("dow_sun1"),
          add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3mo"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          dayofyear(col("o_orderdate")).as("doy"))),

    // scalar-valued outputs only: list-typed result columns would make the
    // cross-engine compare depend on float FORMATTING, not float values
    "q_array_funcs2" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          element_at(sort_array(slice(col("embedding"), 1, 4)), 2)
            .as("first4_sorted_2nd"),
          array_position(col("embedding"), array_max(col("embedding")))
            .cast("int").as("argmax_pos"),
          array_min(slice(col("embedding"), 1, 8)).as("min_first8"),
          array_contains(col("embedding"), element_at(col("embedding"), 5))
            .as("has_elem5"))),

    "q_array_funcs" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_elem"),
          element_at(col("embedding"), -1).as("last_elem"),
          array_max(col("embedding")).as("max_elem"),
          array_min(col("embedding")).as("min_elem"))),

    // Map-typed columns: construct, probe, enumerate — projected back to
    // scalars so the cross-engine compare stays on flat columns (map
    // column equality is representation-sensitive in parquet/pandas).
    "q_map_funcs" -> ((s, d) => {
      val m = map(
        lit("brand"), col("p_brand"),
        lit("type"), col("p_type"),
        lit("name"), col("p_name"))
      t(s, d, "part")
        .select(
          col("p_partkey"),
          element_at(m, "brand").as("brand_v"),
          element_at(m, "missing").as("missing_v"),
          size(map_keys(m)).as("n_keys"),
          array_join(map_keys(m), ",").as("keys_csv"),
          array_join(map_values(m), "|").as("vals_csv"))
    })
  )

  override val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
        |       upper(p_name) AS name_upper,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       substring(p_type, 1, 5) AS type_prefix,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |       lpad(p_brand, 12, '_') AS brand_padded,
        |       reverse(p_brand) AS brand_rev,
        |       trim(p_name) AS name_trim,
        |       (strpos(p_type, 'a') > 0) AS type_has_a
        |FROM part""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(extract(year FROM o_orderdate) AS INT) AS yr,
        |       CAST(extract(month FROM o_orderdate) AS INT) AS mo,
        |       CAST(extract(day FROM o_orderdate) AS INT) AS dom,
        |       CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
        |FROM orders""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |       json_extract_string(props, '$.missing') AS k_missing
        |FROM events""".stripMargin,

    "q_json_variant" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       'OBJECT<k: BIGINT>' AS vschema,
        |       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
        |FROM events""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_quantity - 25) AS qty_dev,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       round(sqrt(l_extendedprice), 6) AS price_sqrt,
        |       round(ln(l_extendedprice + 1), 6) AS price_ln,
        |       l_linenumber % 3 AS ln_mod,
        |       CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |            WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign
        |FROM lineitem""".stripMargin,

    "q_string_funcs2" ->
      """SELECT p_partkey,
        |       CAST(levenshtein(p_brand, 'Brand#1') AS INT) AS brand_lev,
        |       split_part(p_type, ' ', 1) AS type_word1,
        |       repeat(substring(p_brand, 7, 2), 2) AS brand_rep,
        |       translate(p_name, 'aeiou', 'AEIOU') AS name_caps_vowels,
        |       (strpos(p_name, ' ') > 0) AS name_has_space,
        |       rpad(p_brand, 10, '.') AS brand_rpad
        |FROM part""".stripMargin,

    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
        |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
        |       o_orderdate + INTERVAL '3 months' AS plus3mo,
        |       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |       CAST(dayofyear(o_orderdate) AS INT) AS doy
        |FROM orders""".stripMargin,

    "q_array_funcs2" ->
      """SELECT vec_id,
        |       list_sort(embedding[1:4])[2] AS first4_sorted_2nd,
        |       CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_pos,
        |       list_min(embedding[1:8]) AS min_first8,
        |       list_contains(embedding, embedding[5]) AS has_elem5
        |FROM embeddings""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS dim,
        |       embedding[1] AS first_elem,
        |       embedding[-1] AS last_elem,
        |       list_max(embedding) AS max_elem,
        |       list_min(embedding) AS min_elem
        |FROM embeddings""".stripMargin,

    "q_map_funcs" ->
      """WITH mm AS (
        |  SELECT p_partkey,
        |         MAP(['brand','type','name'], [p_brand, p_type, p_name]) AS m
        |  FROM part
        |)
        |SELECT p_partkey,
        |       map_extract(m, 'brand')[1] AS brand_v,
        |       map_extract(m, 'missing')[1] AS missing_v,
        |       CAST(len(map_keys(m)) AS INT) AS n_keys,
        |       array_to_string(map_keys(m), ',') AS keys_csv,
        |       array_to_string(map_values(m), '|') AS vals_csv
        |FROM mm""".stripMargin
  )
}
