package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables => T}

/** SURVEY §2.8: scalar function surface (string/date/math/array/map/json).
  *
  * Determinism notes: transcendental results (ln, sqrt-of-products) are
  * rounded at 6dp — JVM Math vs libm can differ in the last ulp; 6dp is far
  * inside both. Day-of-week uses ISO numbering in both engines (Spark
  * weekday()+1 == DuckDB isodow). All functions here are codegen'd Spark
  * built-ins — no UDFs on the hot path.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame
  import Det.tbl

  /** Sequential left-fold sum of a float array in double domain — the
    * exact shape DuckDB's list_aggregate(l,'sum') computes, so both
    * engines reduce in identical order. */
  private def arraySumDouble(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))

  val queries: Map[String, Q] = Map(
    "q_str" -> ((s, d) =>
      T.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 4).as("sub4"),
        length(col("p_name")).as("len"),
        trim(col("p_name")).as("trimmed"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        col("p_name").startsWith("red").as("is_red"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
        .orderBy(col("p_partkey"))),

    "q_date" -> ((s, d) =>
      T.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        (weekday(col("o_orderdate")) + 1).as("isodow"))
        .orderBy(col("o_orderkey"))),

    "q_math" -> ((s, d) =>
      T.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        ceil(col("l_quantity") / 7).as("ceil7"),
        floor(col("l_extendedprice") / 1000).as("price_k"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        signum(col("l_discount") - 0.05).as("disc_sign"))
        // (okey, lineno) is not unique in this data; every output column is
        // a function of (okey, lineno, qty, price, disc), so ordering by
        // these derived columns makes any remaining ties identical rows.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("sqrt_qty"),
          col("ln_price"), col("disc_sign"))),

    // Array surface over the 64-dim embedding column (the "multimodal"
    // vector column). All reductions are sequential folds in double.
    "q_array" -> ((s, d) =>
      T.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("n_dims"),
        element_at(col("embedding"), 1).cast("double").as("e0"),
        round(arraySumDouble(col("embedding")), 4).as("esum"),
        array_max(col("embedding")).cast("double").as("emax"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 6).as("l2"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"))
        .orderBy(col("vec_id"))),

    // Map construction + extraction; per SURVEY §2.8 the oracle checks the
    // extracted values (plain columns), keeping DuckDB MAP quirks out.
    "q_map" -> ((s, d) =>
      T.documents(s, d)
        .withColumn("meta", map(lit("lang"), col("lang"), lit("source"), col("source")))
        .select(
          col("doc_id"),
          element_at(col("meta"), "lang").as("m_lang"),
          element_at(col("meta"), "source").as("m_source"),
          size(map_keys(col("meta"))).as("n_keys"))
        .orderBy(col("doc_id"))),

    "q_json" -> ((s, d) =>
      T.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          count(lit(1)).as("n"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")))
  )

  private val prt = tbl("part"); private val ords = tbl("orders")
  private val li = tbl("lineitem"); private val emb = tbl("embeddings")
  private val doc = tbl("documents"); private val evt = tbl("events")

  val oracle: Map[String, String] = Map(
    "q_str" ->
      s"""SELECT p_partkey,
            lower(p_name) AS lo, upper(p_name) AS up,
            substring(p_name, 1, 4) AS sub4,
            length(p_name) AS len, trim(p_name) AS trimmed,
            concat_ws('|', p_brand, p_type) AS brand_type,
            replace(p_name, ' ', '_') AS snake,
            lpad(p_brand, 12, '*') AS padded,
            starts_with(p_name, 'red') AS is_red,
            regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
          FROM $prt ORDER BY p_partkey""",
    "q_date" ->
      s"""SELECT o_orderkey,
            CAST(year(o_orderdate) AS INTEGER) AS y,
            CAST(month(o_orderdate) AS INTEGER) AS m,
            CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
            CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
            last_day(CAST(o_orderdate AS DATE)) AS month_end,
            CAST(isodow(o_orderdate) AS INTEGER) AS isodow
          FROM $ords ORDER BY o_orderkey""",
    "q_math" ->
      s"""SELECT l_orderkey, l_linenumber,
            abs(l_quantity - 25) AS abs_dev,
            CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil7,
            CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
            round(sqrt(l_quantity), 6) AS sqrt_qty,
            round(ln(l_extendedprice), 6) AS ln_price,
            pow(l_quantity, 2) AS qty_sq,
            l_orderkey % 7 AS mod7,
            CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
          FROM $li ORDER BY l_orderkey, l_linenumber, sqrt_qty, ln_price, disc_sign""",
    "q_array" ->
      s"""SELECT vec_id,
            CAST(len(embedding) AS INTEGER) AS n_dims,
            CAST(embedding[1] AS DOUBLE) AS e0,
            round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS esum,
            CAST(list_max(embedding) AS DOUBLE) AS emax,
            round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS l2,
            CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
          FROM $emb ORDER BY vec_id""",
    "q_map" ->
      s"""SELECT doc_id, lang AS m_lang, source AS m_source, 2 AS n_keys
          FROM $doc ORDER BY doc_id""",
    "q_json" ->
      s"""SELECT event_type,
            CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
            COUNT(*) AS n,
            MIN(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS min_k,
            MAX(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS max_k
          FROM $evt GROUP BY event_type ORDER BY event_type"""
  )
}
