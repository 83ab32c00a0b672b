package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Window-function surface (SURVEY §2.5): ranking, running analytic frames,
  * lag/lead, ntile and RANGE frames.
  *
  * Extension surface (the reference's Beam SDK carries windowing as a model
  * concept, /root/reference/main.py:8, but the pipeline itself never uses
  * it). All partitions here are keyed (customer / user / priority) so state
  * distributes; the one global window (`ntile`) is documented as a
  * single-partition operation you only run on pre-aggregated data at scale.
  */
object WindowQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_rank"        -> windowRank _,
    "q_window_running"     -> windowRunning _,
    "q_window_lag"         -> windowLag _,
    "q_window_ntile_range" -> windowNtileRange _,
    "q_window_first_last"  -> windowFirstLast _,
    "q_window_trailing"    -> windowTrailing _,
    "q_window_pct"         -> windowPct _
  )

  val oracle: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(rank() OVER w AS BIGINT) AS rk,
        |    CAST(dense_rank() OVER w AS BIGINT) AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |  lead(event_id, 1) OVER w AS next_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_ntile_range" ->
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
        |    AS quartile,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_in_band
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // Trailing event-time window on integer microseconds: RANGE frames
    // include all peers of the boundary values identically in both
    // engines, so equal timestamps cannot diverge.
    "q_window_trailing" ->
      """SELECT user_id, event_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_last_hour,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2)
        |    AS v_last_hour
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    // percent_rank/cume_dist have identical definitions in both engines;
    // the (o_totalprice, o_orderkey) ordering is total so no peer-group
    // ambiguity survives into the hash.
    "q_window_pct" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin
  )

  /** Top-3 orders per customer with all three ranking flavors; the ordering
    * (o_totalprice DESC, o_orderkey) is total, so row_number is stable. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running revenue per customer — a sequential fold within each partition,
    * identical accumulation order to the oracle, so the doubles agree. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Inter-event gap per user in exact integer microseconds (no float
    * drift), plus a lead() column. */
  def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select(
        col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_us"),
        lead(col("event_id"), 1).over(w).as("next_event"))
      .orderBy("user_id", "event_id")
  }

  /** first/last/nth order per customer over the full-partition frame
    * (UNBOUNDED..UNBOUNDED — last_value's default CURRENT ROW frame is the
    * classic trap; nth_value is null for 1-order customers). */
  def windowFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Trailing 1-hour event-time window per user (count + running spend):
    * the "activity in the last hour" analytic, as a RANGE frame over
    * integer epoch-microseconds — exact arithmetic, identical peer
    * semantics on ties in both engines. */
  def windowTrailing(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, Window.currentRow)
    events(s, d)
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        round(sum("value").over(w), 2).as("v_last_hour"))
      .orderBy("user_id", "event_id")
  }

  /** Relative-position analytics per priority band: percent_rank and
    * cume_dist over a total ordering. */
  def windowPct(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy("o_totalprice", "o_orderkey")
    orders(s, d)
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** ntile quartiles (global — run on pre-aggregated data at scale) and a
    * value-RANGE frame count per priority band. */
  def windowNtileRange(s: SparkSession, d: String): DataFrame = {
    val wq = Window.orderBy("o_totalprice", "o_orderkey")
    val wr = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"))
      .rangeBetween(-10000, Window.currentRow)
    orders(s, d)
      .select(
        col("o_orderkey"),
        ntile(4).over(wq).cast("long").as("quartile"),
        count(lit(1)).over(wr).as("n_in_band"))
      .orderBy("o_orderkey")
  }
}
