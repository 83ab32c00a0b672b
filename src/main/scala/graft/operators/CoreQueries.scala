package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Scan / projection / filter / sort / limit / set operations (SURVEY §2.1,
  * §2.2, §2.6).
  *
  * The reference's only element-wise transform is `beam.Map(print)`
  * (/root/reference/main.py:109) and its implied `beam.Filter` capability;
  * here those become declarative `select`/`filter` so Catalyst pushes
  * predicates and projections into the Parquet scan (row-group skip + column
  * prune) — essential at 100 TB, where a scan that reads all columns for a
  * 3-column projection is already the bottleneck.
  *
  * Determinism contract (SURVEY §7.5): every query ends with ORDER BY on a
  * unique key set; doubles surfaced through arithmetic are rounded identically
  * to the DuckDB oracle twin.
  */
object CoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet"      -> scanParquet _,
    "q_project_expr"      -> projectExpr _,
    "q_filter_predicate"  -> filterPredicate _,
    "q_case_when"         -> caseWhen _,
    "q_sort_multi"        -> sortMulti _,
    "q_topk"              -> topK _,
    "q_union_all"         -> unionAll _,
    "q_union_distinct"    -> unionDistinct _,
    "q_intersect"         -> intersectQ _,
    "q_except"            -> exceptQ _,
    "q_except_all"        -> exceptAllQ _,
    "q_intersect_all"     -> intersectAllQ _,
    "q_merge_upsert"      -> mergeUpsert _
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Per-row double arithmetic is bit-identical across engines when the op
    // order matches, so the products are emitted UNROUNDED: rounding here
    // would reintroduce engine-specific half-at-boundary behavior (Spark
    // rounds the shortest decimal repr, DuckDB scales in binary). Rounding
    // is reserved for aggregates, where accumulation order differs.
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_case_when" ->
      """SELECT
        |  CASE WHEN o_totalprice < 100000 THEN 'small'
        |       WHEN o_totalprice < 250000 THEN 'medium'
        |       ELSE 'large' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders
        |ORDER BY o_orderpriority DESC, o_totalprice ASC, o_orderkey ASC""".stripMargin,
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q_union_all" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey, o_orderpriority""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,
    // Multiset difference: each orderkey keeps (copies in lineitem −
    // copies in orders) rows — duplicate-count semantics the DISTINCT
    // set ops above erase. The fixture's duplicated line keys make the
    // counts non-trivial.
    "q_except_all" ->
      """SELECT l_orderkey FROM lineitem
        |EXCEPT ALL
        |SELECT o_orderkey FROM orders
        |ORDER BY l_orderkey""".stripMargin,
    // Multiset intersection: per nation min(#customers, #suppliers)
    // copies — the matched-cardinality count per key.
    "q_intersect_all" ->
      """SELECT c_nationkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey FROM supplier
        |ORDER BY c_nationkey""".stripMargin,
    // Same deterministic change-set construction: updates double n_chars
    // for doc_id % 10 = 0, inserts clone doc_id % 50 = 0 re-keyed past
    // max(doc_id) — collision-free at any scale factor.
    "q_merge_upsert" ->
      """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
        |off AS (SELECT max(doc_id) + 1 AS o FROM base),
        |changes AS (
        |  SELECT doc_id, lang, n_chars * 2 AS n_chars FROM base
        |  WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + (SELECT o FROM off), lang, n_chars FROM base
        |  WHERE doc_id % 50 = 0)
        |SELECT coalesce(c.doc_id, b.doc_id) AS doc_id,
        |  coalesce(c.lang, b.lang) AS lang,
        |  CAST(coalesce(c.n_chars, b.n_chars) AS BIGINT) AS n_chars,
        |  CASE WHEN b.doc_id IS NULL THEN 'inserted'
        |       WHEN c.doc_id IS NULL THEN 'base'
        |       ELSE 'updated' END AS src
        |FROM base b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
        |ORDER BY doc_id""".stripMargin
  )

  /** Full scan + projection; Catalyst prunes the read schema to 4 columns. */
  def scanParquet(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Computed projection — per-row double arithmetic in the same op order as
    * the oracle, emitted unrounded so results are bit-identical. */
  def projectExpr(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("charge"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Conjunctive range + equality predicate; all four conjuncts are
    * Parquet-pushable (verified by the plan-shape spec). */
  def filterPredicate(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  /** Conditional projection folded into an aggregation. */
  def caseWhen(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 250000, "medium")
          .otherwise("large")
          .as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("bucket")

  /** Multi-key sort, mixed directions; o_orderkey makes the order total. */
  def sortMulti(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(
        col("o_orderpriority").desc,
        col("o_totalprice").asc,
        col("o_orderkey").asc)

  /** Global top-k — planned as TakeOrderedAndProject (per-partition heaps,
    * no full sort/shuffle of the fact table). */
  def topK(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)

  /** Bag union of two filtered subsets (no dedup shuffle). */
  def unionAll(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val b = o.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderpriority")
    a.unionByName(b).orderBy("o_orderkey", "o_orderpriority")
  }

  /** Set union — union + distinct (hash-agg dedup). */
  def unionDistinct(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_nationkey").as("nk"))
      .union(supplier(s, d).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  /** Customers that placed both an open and a finished order. */
  def intersectQ(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Customers that never placed an urgent order. */
  def exceptQ(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select("c_custkey")
      .except(
        orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Multiset (bag) difference — `EXCEPT ALL`: subtracts COPIES, not
    * values. Each l_orderkey survives (lineitem copies − orders copies)
    * times, so the fixture's duplicated line keys stay visible where the
    * DISTINCT set ops erase them. Spark plans this as one count
    * aggregation per side + a replicate generate — a keyed shuffle pair,
    * no join fan-out, linear at any scale. */
  def exceptAllQ(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_orderkey")
      .exceptAll(orders(s, d).select(col("o_orderkey").as("l_orderkey")))
      .orderBy("l_orderkey")

  /** Multiset (bag) intersection — `INTERSECT ALL`: per nation
    * min(#customers, #suppliers) copies, the matched-cardinality count
    * per key. Same two-sided count-aggregate shape as [[exceptAllQ]]. */
  def intersectAllQ(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_nationkey")
      .intersectAll(supplier(s, d).select(col("s_nationkey").as("c_nationkey")))
      .orderBy("c_nationkey")

  /** MERGE / upsert without a table format: full-outer join of the base
    * table against a change set, change-side columns taking precedence —
    * the incremental-corpus-update pattern (Delta/Iceberg MERGE INTO
    * compiles to exactly this plan). One shuffle on the merge key; at
    * 100 TB the base side's shuffle is avoided entirely when base is
    * bucketed on the key (q_join_bucketed's layout) — then only the
    * (small) change set moves. The change set here is derived
    * deterministically from the base: doubled n_chars for doc_id % 10 = 0
    * (updates), clones of doc_id % 50 = 0 re-keyed past max(doc_id)
    * (inserts — the offset comes from the data, so an insert key can
    * never collide with a live base key at any scale factor). */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select("doc_id", "lang", "n_chars")
    // max() is NULL on an empty base — degrade to offset 1, not an NPE
    // (EmptyInputSpec); the merge below is already empty-safe.
    val maxRow = base.agg(max("doc_id")).head()
    val offset = (if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)) + 1
    val changes = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("lang"), (col("n_chars") * 2).as("n_chars"))
      .unionAll(base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + offset).as("doc_id"), col("lang"),
          col("n_chars")))
      .toDF("c_doc_id", "c_lang", "c_n_chars")
    base.join(changes, col("doc_id") === col("c_doc_id"), "full_outer")
      .select(
        coalesce(col("c_doc_id"), col("doc_id")).as("m_doc_id"),
        coalesce(col("c_lang"), col("lang")).as("lang"),
        coalesce(col("c_n_chars"), col("n_chars")).as("n_chars"),
        when(col("doc_id").isNull, "inserted")
          .when(col("c_doc_id").isNull, "base")
          .otherwise("updated").as("src"))
      .withColumnRenamed("m_doc_id", "doc_id")
      .orderBy("doc_id")
  }
}
