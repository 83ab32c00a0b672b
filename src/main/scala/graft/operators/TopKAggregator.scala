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

/** One scored (probe, candidate) pair in the batch-ANN pipeline. */
case class ProbeSim(probe_id: Long, vec_id: Long, cos_sim: Double)

/** Bounded top-k per probe for the batch-ANN serving query
  * ([[SimilarityQueries.simBatchTopK]]): same O(k)-state design as
  * [[TopKOrders]] (map-side partials, only k rows per probe per
  * partition cross the wire), ordered on (cos_sim DESC, vec_id ASC) — a
  * total order over pre-ROUNDED scores, so merge order cannot change the
  * result and the window-function oracle breaks ties identically. */
class TopKSims(k: Int)
    extends Aggregator[ProbeSim, Seq[ProbeSim], Seq[ProbeSim]] {

  private def lt(a: ProbeSim, b: ProbeSim): Boolean =
    a.cos_sim > b.cos_sim ||
      (a.cos_sim == b.cos_sim && a.vec_id < b.vec_id)

  private def top(s: Seq[ProbeSim]): Seq[ProbeSim] =
    s.sortWith(lt).take(k)

  override def zero: Seq[ProbeSim] = Vector.empty
  override def reduce(buf: Seq[ProbeSim], o: ProbeSim): Seq[ProbeSim] =
    top(buf :+ o)
  override def merge(a: Seq[ProbeSim], b: Seq[ProbeSim]): Seq[ProbeSim] =
    top(a ++ b)
  override def finish(r: Seq[ProbeSim]): Seq[ProbeSim] = r
  override def bufferEncoder: Encoder[Seq[ProbeSim]] =
    ExpressionEncoder[Seq[ProbeSim]]()
  override def outputEncoder: Encoder[Seq[ProbeSim]] =
    ExpressionEncoder[Seq[ProbeSim]]()
}
