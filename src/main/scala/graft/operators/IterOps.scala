package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** Bounded-frame iteration primitive (round 13 — BASELINE.md's declared
  * iteration-family fix): run an N-round recurrence whose EVERY frame is
  * dimension-bounded ON THE DRIVER, instead of paying per-round
  * tiny-frame join + localCheckpoint job overhead (~0.6-0.8 s/round of
  * pure scheduling measured locally; `q_eval_bradley_terry`'s five MM
  * rounds made it the suite's most expensive query at ~3.9 s while
  * iterating 25-brand frames).
  *
  * THE PRECONDITION IS LOAD-BEARING (the RankOps driver-census rule,
  * RankOps.scala:41-55): the collected frame must be bounded by CONFIG
  * or DOMAIN (a brand catalog, a k×dim centroid matrix, a band count) —
  * never by the corpus. [[collectBounded]] enforces the bound at
  * runtime: a caller whose "bounded" frame grows with data gets a loud
  * precondition failure, not a silent driver OOM at 100 TB. Recurrences
  * whose rounds rescan the corpus (k-means assignment, PageRank edge
  * walks) DO NOT BELONG HERE — their per-round cost is the corpus pass
  * itself, and they stay distributed.
  *
  * EXACTNESS CONTRACT: a driver fold must replay the distributed plan's
  * arithmetic bit for bit, or the DuckDB twin (written against the
  * distributed tree) silently diverges. Long sums are order-independent
  * (exact); double expression trees must be transcribed in evaluation
  * order; and Catalyst `round()` is NOT `math.round` — [[sparkRound]]
  * reproduces Spark's `Round` expression (scala BigDecimal HALF_UP on
  * the double's shortest decimal form, NaN/Inf passthrough) so folds
  * can quantize exactly like the plans they replace. PropertySpec pins
  * fold ≡ distributed form per consumer.
  */
object IterOps {

  /** Materialize a dimension-bounded frame on the driver, enforcing the
    * bound. `what` names the caller and its declared bound in the error
    * message — the bound is part of the operator's contract, not an
    * implementation detail. */
  def collectBounded(df: DataFrame, maxRows: Int, what: String): Array[Row] = {
    // limit(maxRows + 1) caps the transfer: if the precondition is
    // violated we learn so from ONE extra row, not a corpus download.
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: bounded-frame precondition violated — frame exceeds " +
        s"$maxRows rows; this recurrence must run distributed")
    rows
  }

  /** Catalyst `Round(child, scale)` semantics for DoubleType, HALF_UP:
    * `BigDecimal(x).setScale(scale, HALF_UP).toDouble` over the
    * double's shortest decimal rendering (scala.math.BigDecimal(Double)
    * goes through `java.math.BigDecimal.valueOf`, exactly as Spark's
    * expression does), with the NaN/Infinity passthrough guard. Using
    * anything else (math.rint, printf-style rounding) diverges from the
    * plan being replaced at half-way values. */
  def sparkRound(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** `round(x, 0).cast("long")` — quantize-to-unit then the Catalyst
    * double→long cast (truncation; the value is already integral). */
  def roundUnits(x: Double): Long = sparkRound(x, 0).toLong

  /** Re-attach a driver-folded result as a LocalRelation: builds no
    * job, and (as a broadcast side) can never receive a growing input —
    * the same guarantee RankOps' census offsets ride. */
  def localRelation(s: SparkSession, schema: StructType,
      rows: Seq[Row]): DataFrame =
    s.createDataFrame(rows.asJava, schema)
}
