package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Backed by the codegen'd [[FloatVecDot]] Catalyst expression (SURVEY
  * §2.10 preference order: a native Expression with `doGenCode` beats the
  * interpreted `zip_with`/`aggregate` higher-order functions, which
  * dominated the O(n²) similarity joins). Callers must have the function
  * registered in their session — `graft.Tables.embeddings` does this, as
  * does `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * All accumulation is in DOUBLE (float32 inputs cast exactly), folding
  * left-to-right — the same sequential order DuckDB's `list_sum` uses, so
  * oracle twins agree to the last ulp in practice and certainly at the
  * 4-decimal rounding every query applies (SURVEY §7.5).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_vec_dot", a, b)

  /** ‖a‖₂ in double precision. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — fused single-pass expression (dot + both norms
    * in one loop, bit-identical to the composed form). Caller guarantees
    * non-zero vectors (embeddings are dense Gaussian draws — zero norm
    * cannot occur). */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_vec_cosine", a, b)
}
