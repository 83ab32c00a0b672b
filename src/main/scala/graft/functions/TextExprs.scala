package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash signature values of one element-hash array in a single
  * codegen'd pass.
  *
  * The HOF formulation — k × (`transform(harr, h => pmod(h*aᵢ+bᵢ, p))` →
  * `array_min`) — evaluates interpreted: k passes over the array, a lambda
  * frame per element per hash function (k·n allocations per row). This
  * expression runs ONE loop over the array updating k running minima in a
  * local long[] — no allocation beyond the output array, fused into
  * whole-stage codegen. Arithmetic is identical ((h·aᵢ+bᵢ) mod p on
  * non-negative inputs bounded so h·a+b < 2⁵², hence no overflow and
  * `pmod` ≡ Java `%`), so signatures are bit-identical to the HOF form.
  *
  * Empty input arrays yield `p` in every slot (the neutral "minimum of
  * nothing" sentinel callers filter out); null input yields null.
  */
case class MinHashSigs(child: Expression, a: Seq[Long], b: Seq[Long],
    prime: Long) extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length,
    "coefficient vectors must be non-empty and equal-length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = a.length
    val mins = Array.fill(k)(prime)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoef", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("bCoef", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val k = a.length
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${prime}L);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSigs = copy(child = newChild)
}
