package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The SQL-string entry path (SURVEY §3.2 P2): `spark.sql(text)` → ANTLR
  * parse → UnresolvedPlan → the same Catalyst pipeline as the DataFrame
  * API. These queries are authored once in portable ANSI SQL and executed
  * verbatim by BOTH engines — the Spark side runs the exact string the
  * DuckDB oracle runs, so this path also proves dialect-portability of
  * the engine's SQL surface (subqueries, EXISTS, CTEs).
  */
object SqlQueries {

  /** Portable ANSI text, shared verbatim between Spark and DuckDB. */
  private val sqlTexts: Map[String, String] = Map(
    // TPC-H Q3 shape: 3-way join + filtered agg + top-k.
    "q_sql_topn_revenue" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    // GROUP BY ALL — the modern-ANSI ergonomics both engines implement:
    // every non-aggregate select item becomes a grouping key, so adding
    // a dimension cannot silently desynchronize SELECT and GROUP BY.
    // Shared verbatim, proving the dialect surface matches.
    "q_sql_group_by_all" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    // Explicit GROUPING SETS — the general lattice ROLLUP/CUBE are
    // sugar for. The CASTs on GROUPING() are part of the portable
    // text: Spark returns TINYINT, DuckDB BIGINT, and the level
    // column must be the same BIGINT on both reads.
    "q_sql_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(GROUPING(l_returnflag) AS BIGINT)
        |    + CAST(GROUPING(l_linestatus) AS BIGINT) AS lvl,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())
        |ORDER BY lvl, flag, status""".stripMargin,
    // TPC-H Q17 shape: per-part correlated SCALAR subquery — the
    // decorrelation stress test. Catalyst must rewrite the correlated
    // aggregate into a grouped aggregate + join (PlanShapeSpec pins no
    // nested-loop); an engine that re-executes the subquery per outer
    // row dies at scale. Boundary determinism: l_quantity is whole
    // numbers carried in doubles, so avg = exact-integer-sum / count is
    // the same double in both engines and the 0.2·avg threshold
    // comparison cannot diverge.
    "q_sql_decorrelate" ->
      """SELECT p_brand,
        |  CAST(count(*) AS BIGINT) AS n_small,
        |  round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_size <= 5
        |  AND l_quantity < (
        |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    // Correlated EXISTS / NOT EXISTS pair.
    "q_sql_exists" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderstatus = 'O')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    // CTE + integer scalar subquery (integer logic only — no float
    // boundary risk in the correlation).
    "q_sql_cte_scalar" ->
      """WITH nation_size AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_custkey, c_name, c_nationkey
        |FROM customer
        |WHERE c_nationkey IN (
        |  SELECT c_nationkey FROM nation_size
        |  WHERE n_cust = (SELECT max(n_cust) FROM nation_size))
        |ORDER BY c_custkey""".stripMargin,
    // Recursive CTE (Spark 4 WITH RECURSIVE): a 31-day date spine
    // left-joined against sparse per-day event counts — the standard
    // gap-filling pattern for dense time series.
    "q_sql_recursive" ->
      """WITH RECURSIVE spine(i) AS (
        |  SELECT 0
        |  UNION ALL SELECT i + 1 FROM spine WHERE i < 30)
        |SELECT DATE '2024-01-01' + i AS day,
        |  coalesce(n, CAST(0 AS BIGINT)) AS n_events
        |FROM spine
        |LEFT JOIN (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1) e
        |  ON e.day = DATE '2024-01-01' + i
        |ORDER BY day""".stripMargin,
    // Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 rows per
    // driving row — the standard SQL spelling of grouped top-k (the
    // DataFrame twins are q_topk_grouped / q_window_rank).
    "q_sql_lateral" ->
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_orderpriority = p.o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |ORDER BY p.o_orderpriority, t.o_orderkey""".stripMargin,
    // Inline VALUES table (literal dimension decode) joined against a
    // fact — the portable spelling of a code→label lookup that needs no
    // physical dimension table. Money summed in exact integer cents
    // (double sums accumulate in partition order — not portable).
    "q_sql_values" ->
      """SELECT m.label, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS total_cents
        |FROM orders
        |JOIN (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'))
        |  AS m(code, label)
        |  ON o_orderstatus = m.code
        |GROUP BY m.label
        |ORDER BY m.label""".stripMargin,
    // Window functions through the shared-text path: per-customer order
    // sequencing, running total, and previous-order lookback — the
    // portable spelling of the §2.5 window family (row_number / framed
    // sum / lag over one PARTITION BY). Money in exact integer cents;
    // row_number CAST to INT and window sums back to BIGINT because the
    // two engines' native widths differ (Spark INT/BIGINT vs DuckDB
    // BIGINT/HUGEINT) — the CASTs make the shared text width-exact.
    "q_sql_window" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate, o_orderkey
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
        |    CAST(lag(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate, o_orderkey) AS BIGINT)
        |      AS prev_cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, cents, order_seq, cum_cents,
        |  prev_cents
        |FROM seq WHERE order_seq <= 3
        |ORDER BY o_custkey, order_seq""".stripMargin,
    // ROLLUP + GROUPING() through the shared-text path: the subtotal
    // lattice with the ANSI disambiguation function (a rollup NULL and
    // a data NULL are different things; GROUPING() is how portable SQL
    // tells them apart — the label build would be wrong without it).
    // The DataFrame twin q_agg_rollup proves the API; THIS proves the
    // dialect surface is portable verbatim.
    "q_sql_rollup" ->
      """SELECT CAST(grouping(o_orderpriority) AS BIGINT) AS g_pri,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_st,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  coalesce(o_orderstatus, '(all)') AS status,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY g_pri, g_st, priority, status""".stripMargin,
    // Ordered-set aggregates (ANSI WITHIN GROUP): interpolated and
    // discrete percentiles through the shared-text path. Quantities are
    // whole numbers in doubles, so the interpolation a + f·(b−a) runs
    // on exact operands at exact dyadic fractions — identical in both
    // engines; rounded 4 regardless.
    "q_sql_percentile" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity),
        |    4) AS median_qty,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity),
        |    4) AS p90_qty,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity),
        |    4) AS median_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlTexts.map { case (name, text) =>
      name -> ((s: SparkSession, d: String) => run(s, d, text))
    }

  val oracle: Map[String, String] = sqlTexts

  /** Register the tables the SQL texts reference as temp views over the
    * scale-factor dir, then execute the shared ANSI text. */
  private def run(s: SparkSession, d: String, text: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(text)
  }
}
