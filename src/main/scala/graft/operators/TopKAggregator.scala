package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A customer's order as seen by the top-k aggregator. */
case class CustOrder(o_custkey: Long, o_orderkey: Long, o_totalprice: Double)

/** Bounded top-k as a typed `Aggregator` (SURVEY §7.2's optional
  * Aggregator, §2.10 tier 3): per-group top-k with O(k) state per group.
  *
  * Why this exists when `row_number().over(Window)` works: the window
  * formulation shuffles and SORTS every row of every group; this
  * aggregator keeps a k-element buffer, merges map-side partials, and
  * ships only k rows per group per partition across the wire. At 100 TB,
  * per-customer top-k over lineitem-scale data is the difference between
  * a full sort of the fact table and a partial-aggregate pass. The same
  * Aggregator drops into streaming Complete-mode aggregations, where a
  * window sort cannot apply at all.
  *
  * Determinism: ordering is (totalprice DESC, orderkey ASC) — a total
  * order, so merge order cannot change the result.
  */
class TopKOrders(k: Int)
    extends Aggregator[CustOrder, Seq[CustOrder], Seq[CustOrder]] {

  private def lt(a: CustOrder, b: CustOrder): Boolean =
    a.o_totalprice > b.o_totalprice ||
      (a.o_totalprice == b.o_totalprice && a.o_orderkey < b.o_orderkey)

  private def top(s: Seq[CustOrder]): Seq[CustOrder] =
    s.sortWith(lt).take(k)

  override def zero: Seq[CustOrder] = Vector.empty
  override def reduce(buf: Seq[CustOrder], o: CustOrder): Seq[CustOrder] =
    top(buf :+ o)
  override def merge(a: Seq[CustOrder], b: Seq[CustOrder]): Seq[CustOrder] =
    top(a ++ b)
  override def finish(r: Seq[CustOrder]): Seq[CustOrder] = r
  override def bufferEncoder: Encoder[Seq[CustOrder]] =
    ExpressionEncoder[Seq[CustOrder]]()
  override def outputEncoder: Encoder[Seq[CustOrder]] =
    ExpressionEncoder[Seq[CustOrder]]()
}

object TopKQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_grouped" -> topkGrouped _
  )

  val oracle: Map[String, String] = Map(
    // The window formulation IS the oracle: same rows, computed the
    // expensive way.
    "q_topk_grouped" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin
  )

  /** Top-3 orders per customer via the bounded-state aggregator. */
  def topkGrouped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new TopKOrders(3).toColumn
    graft.Tables.orders(s, d)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[CustOrder]
      .groupByKey(_.o_custkey)
      .agg(agg.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "o")))
      .select(col("o_custkey"), col("o.o_orderkey").as("o_orderkey"),
        col("o.o_totalprice").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("o_custkey", "rnk")
  }
}

// The batch-ANN bounded top-k (formerly a typed `TopKSims` Aggregator
// here) moved down the §2.10 ladder to the native Catalyst aggregate
// `graft_topk_by` (graft.functions.TopKByAgg): at q_embed_knn's pair-
// feed volume the typed path's per-row case-class decode dominated the
// query. TopKOrders above stays as the documented typed-Aggregator
// tier — its input is dimension-scale, where the ergonomics win.
