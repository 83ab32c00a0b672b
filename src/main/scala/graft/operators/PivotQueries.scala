package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Pivot / unpivot / exact percentiles (SURVEY §2.4 extensions — the
  * reshaping + distribution-summary surface of an OLAP engine).
  *
  * Scale notes: `pivot` with an EXPLICIT value list compiles to one
  * aggregation with a fixed output schema (no extra pass to discover
  * values — at 100 TB the two-pass implicit form is a full extra scan).
  * `unpivot` is a generator (row fan-out in the scan stage, no shuffle).
  * Exact `percentile` needs a per-group sort of values; it is the honest
  * baseline for `approx_percentile`-based variants at scale. */
object PivotQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pivot"    -> aggPivot _,
    "q_unpivot"      -> unpivotQ _,
    "q_percentiles"  -> percentiles _
  )

  val oracle: Map[String, String] = Map(
    // Pivot spelled as conditional aggregation — the portable form.
    "q_agg_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS st_open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS st_finished,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS st_pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_unpivot" ->
      """SELECT c_custkey, metric, val FROM (
        |  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nationkey' AS metric,
        |    CAST(c_nationkey AS DOUBLE) AS val
        |  FROM customer)
        |ORDER BY c_custkey, metric""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.50), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )

  /** Pivot with an explicit value list (single-pass, fixed schema);
    * missing (priority, status) combinations surface as 0 like the
    * conditional-aggregation oracle. */
  def aggPivot(s: SparkSession, d: String): DataFrame = {
    val p = orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
    p.select(col("o_orderpriority"),
      coalesce(col("O"), lit(0L)).as("st_open"),
      coalesce(col("F"), lit(0L)).as("st_finished"),
      coalesce(col("P"), lit(0L)).as("st_pending"))
      .orderBy("o_orderpriority")
  }

  /** Wide→long reshape via the native unpivot operator (generator — no
    * shuffle; the ORDER BY is the only exchange). */
  def unpivotQ(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double"))
      .unpivot(
        ids = Array(col("c_custkey")),
        values = Array(col("c_acctbal"), col("c_nationkey")),
        variableColumnName = "metric",
        valueColumnName = "val")
      .withColumn("metric",
        when(col("metric") === "c_acctbal", "acctbal")
          .otherwise("nationkey"))
      .orderBy("c_custkey", "metric")

  /** Exact linear-interpolation percentiles per group (same definition as
    * DuckDB's quantile_cont). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_quantity"), lit(0.50)), 4).as("p50"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("p75"))
      .orderBy("l_returnflag")
}
