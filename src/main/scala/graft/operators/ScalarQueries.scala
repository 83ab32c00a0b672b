package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

import graft.Tables._

/** Scalar function library (SURVEY §2.7): string / date / math / JSON /
  * array / map functions — all built-in Catalyst expressions, fully inside
  * whole-stage codegen (no UDFs, per the §2.10 preference order).
  *
  * `q_json_extract` mirrors the reference's single act of parsing —
  * `json.loads(get_secret())` at /root/reference/main.py:71 — as columnar
  * JSON extraction over the `events.props` JSON-string column.
  *
  * Type parity with the DuckDB oracle is explicit: Spark int-typed results
  * are cast to long where DuckDB returns BIGINT, and float arithmetic is
  * promoted to double *before* any rounding on both sides (SURVEY §7.5).
  */
object ScalarQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> stringFuncs _,
    "q_date_funcs"   -> dateFuncs _,
    "q_math_funcs"   -> mathFuncs _,
    "q_json_extract" -> jsonExtract _,
    "q_array_funcs"  -> arrayFuncs _,
    "q_map_funcs"    -> mapFuncs _,
    "q_regex_funcs"  -> regexFuncs _,
    "q_null_funcs"   -> nullFuncs _,
    "q_date_arith"   -> dateArith _,
    "q_try_funcs"    -> tryFuncs _,
    "q_array_hof"    -> arrayHof _,
    "q_explode_outer" -> explodeOuter _,
    "q_json_variant" -> jsonVariant _
  )

  /** The Spark 4 VariantType path over `events.props`: `parse_json` to an
    * open-schema binary variant once at the scan, typed `variant_get`
    * extraction after — the semi-structured pattern that replaces
    * repeated string re-parsing (q_json_extract's shape) when a column's
    * schema drifts; `schema_of_variant` surfaces the inferred shape per
    * row, aggregated here to prove uniformity. Oracle extracts the same
    * values straight from the JSON text. */
  def jsonVariant(s: SparkSession, d: String): DataFrame = {
    val v = parse_json(col("props"))
    graft.Tables.events(s, d)
      .select(col("event_type"),
        variant_get(v, "$.k", "long").as("k"),
        schema_of_variant(v).as("vschema"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        count_distinct(col("vschema")).as("n_schemas"))
      .orderBy("event_type")
  }

  val oracle: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  substr(p_name, 1, 5) AS prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  (p_name LIKE '%re%') AS has_re,
        |  replace(p_type, 'ECONOMY', 'ECO') AS typ,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_str
        |FROM part ORDER BY p_partkey""".stripMargin,
    // Patterns restricted to syntax RE2 (DuckDB) and java.util.regex
    // (Spark) interpret identically: literal classes, anchors, groups —
    // no backrefs, no lookaround. DuckDB regexp_replace needs the 'g'
    // flag to match Spark's replace-all semantics.
    "q_regex_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
        |  regexp_matches(p_name, '^(red|blue|small)') AS flagged,
        |  CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1
        |    AS INT) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    // nvl2 has no DuckDB twin — expressed as the CASE it desugars to.
    "q_null_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.0) AS disc_or_null,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1,
        |  CASE WHEN nullif(l_discount, 0.0) IS NOT NULL
        |       THEN 'discounted' ELSE 'full-price' END AS disc_label,
        |  (nullif(l_tax, 0.0) IS NULL) AS tax_free
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Spark HOFs ↔ DuckDB list functions; exists/forall desugar to
    // list_filter cardinality tests. Float elements cast to double
    // BEFORE comparison/arithmetic on both sides.
    "q_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x::DOUBLE > 0)) AS BIGINT)
        |    AS n_pos,
        |  len(list_filter(embedding, x -> x::DOUBLE > 0.25)) > 0
        |    AS any_big,
        |  len(list_filter(embedding, x -> abs(x::DOUBLE) >= 10)) = 0
        |    AS all_small,
        |  round(list_transform(embedding, x -> x::DOUBLE * 2)[1], 4)
        |    AS first_x2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // explode_outer: rows with an empty array survive with a null token —
    // DuckDB's unnest drops them, so the twin substitutes [NULL] for
    // empty lists before unnesting (the standard outer-unnest emulation).
    "q_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 6)
        |      AS longs
        |  FROM documents)
        |SELECT doc_id,
        |  unnest(CASE WHEN len(longs) = 0 THEN [NULL] ELSE longs END)
        |    AS long_tok
        |FROM t ORDER BY doc_id, long_tok""".stripMargin,
    // try_* desugars to the CASE/TRY_CAST forms DuckDB evaluates
    // identically: null on division-by-zero and on a failed cast, instead
    // of Infinity / an error — the ingest-pipeline posture for dirty data.
    "q_try_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount = 0 THEN NULL
        |       ELSE l_extendedprice / l_discount END AS price_per_disc,
        |  TRY_CAST(l_returnflag AS DOUBLE) AS flag_num,
        |  TRY_CAST(substr(l_returnflag, 1, 1) || l_linenumber AS VARCHAR)
        |    AS flag_line
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Spark add_months/date_add/last_day return DATE; the DuckDB interval
    // arithmetic is cast to DATE to agree. dayofweek: DuckDB is 0-based
    // Sunday, Spark 1-based — Spark side subtracts 1.
    "q_date_arith" ->
      """SELECT o_orderkey,
        |  (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus_3m,
        |  (o_orderdate + INTERVAL 45 DAY)::DATE AS plus_45d,
        |  last_day(o_orderdate::DATE) AS month_end,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |       DATE '2002-01-01') AS INT) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_1dp,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  round(sqrt(l_quantity), 4) AS qty_sqrt,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  round(abs(l_extendedprice - 30000), 2) AS dist_30k,
        |  round(ln(l_extendedprice), 4) AS price_ln
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    // The oracle needs no variant machinery: the same values come straight
    // off the JSON text, and every props row carries one BIGINT field so
    // the per-type schema count is the constant 1.
    "q_json_variant" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(1 AS BIGINT) AS n_schemas
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS e_first,
        |  round(CAST(embedding[64] AS DOUBLE), 4) AS e_last,
        |  round(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
        |  round(list_sum(list_transform(embedding[1:8],
        |    x -> CAST(x AS DOUBLE))), 4) AS head_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin
  )

  def stringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        col("p_name").like("%re%").as("has_re"),
        regexp_replace(col("p_type"), "ECONOMY", "ECO").as("typ"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_str"))
      .orderBy("p_partkey")

  def dateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"))
      .orderBy("o_orderkey")

  def mathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_1dp"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        round(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        round(abs(col("l_extendedprice") - 30000), 2).as("dist_30k"),
        round(log(col("l_extendedprice")), 4).as("price_ln"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Columnar JSON scalar extraction over `events.props`. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Higher-order array functions over the embedding column — element
    * access, slicing, and a sequential double fold (same accumulation
    * order as DuckDB's list_sum, so results agree pre-rounding). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4)
          .as("e_first"),
        round(element_at(col("embedding"), 64).cast("double"), 4)
          .as("e_last"),
        round(
          aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x), 4)
          .as("vec_sum"),
        round(
          aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, x) => acc + x), 4).as("head_sum"))
      .orderBy("vec_id")

  /** JSON string → MapType, then map functions (sorted keys CSV + lookup);
    * maps are never emitted raw (unordered — SURVEY §7.5). */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"))
      .select(
        col("event_id"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"),
        element_at(col("m"), "k").as("k_val"))
      .orderBy("event_id")

  /** Null-handling functions over a nullable-by-construction column
    * (nullif turns zero discounts into nulls, then coalesce/nvl2/IS NULL
    * consume them). The testdata has no physical nulls; this manufactures
    * and then handles them, exercising null propagation through codegen. */
  def nullFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0))
          .as("disc_or_neg1"),
        nvl2(nullif(col("l_discount"), lit(0.0)),
          lit("discounted"), lit("full-price")).as("disc_label"),
        nullif(col("l_tax"), lit(0.0)).isNull.as("tax_free"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Calendar arithmetic: month/day offsets with end-of-month clamping,
    * last_day, ISO week, day-of-week (normalized to DuckDB's 0=Sunday). */
  def dateArith(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("plus_3m"),
        date_add(col("o_orderdate"), 45).as("plus_45d"),
        last_day(col("o_orderdate")).as("month_end"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        (dayofweek(col("o_orderdate")) - 1).as("dow_sun0"))
      .orderBy("o_orderkey")

  /** Higher-order array functions — filter/exists/forall/transform — all
    * codegen-free lambda evaluation over the embedding arrays (the §2.10
    * tier-2 path: no serialization wall, no UDF). */
  def arrayHof(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x.cast("double") > 0))
          .cast("long").as("n_pos"),
        exists(col("embedding"), x => x.cast("double") > 0.25)
          .as("any_big"),
        forall(col("embedding"), x => abs(x.cast("double")) < 10)
          .as("all_small"),
        round(element_at(
          transform(col("embedding"), x => x.cast("double") * 2), 1), 4)
          .as("first_x2"))
      .orderBy("vec_id")

  /** Outer explode: documents with NO long tokens survive as one
    * null-token row (explode would drop them — the silent-row-loss trap
    * in fan-out pipelines). */
  def explodeOuter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > 6).as("longs"))
      .select(col("doc_id"), explode_outer(col("longs")).as("long_tok"))
      .orderBy("doc_id", "long_tok")

  /** Error-safe (`try_*`) evaluation: null on division-by-zero and failed
    * casts instead of Infinity or a task-killing exception — the right
    * posture for ingest over dirty data at scale (one bad record must not
    * fail a 100 TB job). */
  def tryFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_discount"))
          .as("price_per_disc"),
        col("l_returnflag").try_cast("double").as("flag_num"),
        concat(substring(col("l_returnflag"), 1, 1),
          col("l_linenumber").cast("string")).as("flag_line"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Regex surface over part names: group extraction, replace-all, match
    * test, and a regex-derived word count — patterns kept inside the
    * RE2 ∩ java.util.regex common dialect (see oracle note). */
  def regexFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
        col("p_name").rlike("^(red|blue|small)").as("flagged"),
        (length(regexp_replace(col("p_name"), "[^ ]", "")) + 1)
          .as("n_words"))
      .orderBy("p_partkey")
}
