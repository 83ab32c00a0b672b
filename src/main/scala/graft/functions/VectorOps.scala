package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns using Spark's
  * higher-order functions — `zip_with`/`transform`/`aggregate` are Catalyst
  * expressions that stay inside whole-stage codegen, so there is no
  * serialization wall and no UDF call per row (SURVEY §2.10 preference
  * order: built-ins > HOFs > Aggregator > udf).
  *
  * All accumulation is in DOUBLE (float32 inputs cast exactly), folding
  * left-to-right — the same sequential order DuckDB's `list_sum` uses, so
  * oracle twins agree to the last ulp in practice and certainly at the
  * 4-decimal rounding every query applies (SURVEY §7.5).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ in double precision. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; caller guarantees non-zero vectors (embeddings are
    * dense Gaussian draws — zero norm cannot occur). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
