package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi joins (SURVEY §4 "AQE skew-join split" row;
  * this is the manual path for when AQE's post-shuffle splitting isn't
  * enough — e.g. a single hot key on the BUILD side of a shuffled hash
  * join, or a streaming stateful join where AQE is disabled).
  *
  * Standard salting: the skewed (large, hot-key) side gets a
  * deterministic salt in [0, n); the dimension side is replicated n ways;
  * the join key becomes (key, salt), spreading each hot key over n
  * reducers. Join OUTPUT is identical to the unsalted join (property-
  * tested in SkewSpec) — only the partitioning changes.
  *
  * The salt is derived from stable row content (xxhash64 of the fact
  * side's columns) PLUS a partition-local row counter, not `rand()`:
  * deterministic replay matters both for the oracle harness and for
  * streaming recovery. The counter term matters because skew often comes
  * from fully identical duplicate rows — a pure content hash would give
  * them all the same salt and leave the hot key unspread; the
  * monotonically-increasing id disambiguates equal rows while staying
  * deterministic for a fixed input partitioning (e.g. a parquet scan).
  */
object SkewOps {

  /** Inner equi join with an n-way salted key.
    *
    * @param fact skewed side (many rows per key)
    * @param dim  replicated side (few rows per key — replicated n×)
    */
  /** The n-way salt for `fact`: content hash + partition-local counter,
    * so even fully identical duplicate rows spread over all n salts. */
  def saltColumn(fact: DataFrame, n: Int): Column =
    pmod(
      xxhash64(fact.columns.map(col).toIndexedSeq: _*) +
        monotonically_increasing_id(),
      lit(n))

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val salted = fact.withColumn("__salt", saltColumn(fact, n))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<bigint>")))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
