package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `ArrayType(FloatType)` columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) have no
  * `doGenCode` — they evaluate interpreted, allocating a lambda frame per
  * element. For the O(n²) similarity joins (SURVEY §2.8) that interpreted
  * inner loop dominated the benchmark (q_dedup_embed: 72 s of a 120 s
  * total at sf0.1). This expression is the SURVEY §7.2 "optional custom
  * Expression" path: a tight primitive loop over the two float arrays,
  * fused into whole-stage codegen with no per-element boxing.
  *
  * Accumulation is sequential left-to-right in double (float casts exact),
  * the same order as the HOF formulation and DuckDB's `list_sum`, so oracle
  * hashes are unchanged.
  *
  * Null semantics: null array → null (nullIntolerant); null *elements*
  * cannot occur in the embeddings data (dense Gaussian draws) and are not
  * supported.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = VecExprs.checkedLength(prettyName, x, y)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(v: String, t: DataType) =
        if (isFloat(t)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = graft.functions.VecExprs.checkedLength("$prettyName", $a, $b);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDot = copy(newLeft, newRight)
}

/** Fused cosine similarity: dot(a,b), ‖a‖² and ‖b‖² accumulated in ONE
  * loop over the arrays (vs three separate FloatVecDot passes — 3× the
  * array reads). Each accumulator folds sequentially left-to-right
  * exactly as its standalone formulation would, so the result is
  * bit-identical to dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) and the
  * DuckDB oracle twins are unaffected.
  *
  * Zero-norm inputs yield NaN (0/0) — embeddings are dense Gaussian
  * draws, zero vectors cannot occur; callers that cannot guarantee this
  * must filter first.
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = VecExprs.checkedLength(prettyName, x, y)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      def get(v: String, t: DataType) =
        if (isFloat(t)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = graft.functions.VecExprs.checkedLength("$prettyName", $a, $b);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${get(a, left.dataType)};
         |  double $yv = ${get(b, right.dataType)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecCosine = copy(newLeft, newRight)
}

/** Complete power iteration over a row-major dim×dim matrix in ONE
  * compiled call: `rounds` × (matvec → L2-normalize) from the uniform
  * start vector, then the Rayleigh quotient and trace — the driver-scale
  * tail of `q_embed_pca_power` once the corpus pass has reduced the
  * problem to a 4096-cell array.
  *
  * Why an Expression and not the `aggregate`/`transform` HOF fold: HOFs
  * have no `doGenCode` — the ~300k double ops evaluated interpreted, a
  * lambda frame per element (measured ~1.3 s of the query's 2.5 s at
  * sf0.1), and the HOF form needed localCheckpoint barriers to stop
  * CollapseProject from inlining the 24-round fold into every element_at
  * reference of the next stage. One opaque compiled call removes both:
  * the loop is a JIT'd primitive nest, and there is nothing for the
  * optimizer to inline.
  *
  * Arithmetic is the HOF fold's exact sequence (row-major matvec
  * accumulated left-to-right, normalize = x/√Σx², Rayleigh Σvᵢ·(Av)ᵢ in
  * index order), so results are bit-identical to the fold formulation —
  * deterministic run to run, layout to layout (the q_ts_ewma rule).
  *
  * Output: array<double> of dim+2 slots — [v₀..v_{dim−1}, λ, trace]. */
case class PowerIterTop(child: Expression, dim: Int, rounds: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_power_iter"

  override protected def nullSafeEval(a: Any): Any =
    VecExprs.powerIter(a.asInstanceOf[ArrayData], dim, rounds)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecExprs.powerIter($c, $dim, $rounds)")

  override protected def withNewChildInternal(newChild: Expression)
      : PowerIterTop = copy(child = newChild)
}

/** Shared runtime helpers for the vector expressions; methods here are
  * called from generated Java (static forwarders), so they must stay
  * object-level and JVM-primitive-typed. */
object VecExprs {
  /** Equal-dimension check: mismatched lengths are malformed data (the
    * declared semantics are equal-dimension vectors), so fail loudly
    * instead of silently truncating to the shorter array. */
  def checkedLength(fn: String, x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx != ny) throw new IllegalArgumentException(
      s"$fn requires equal-length arrays, got lengths $nx and $ny")
    nx
  }

  /** [[PowerIterTop]] kernel (also called from generated Java). */
  def powerIter(am: ArrayData, dim: Int, rounds: Int): ArrayData = {
    val n = am.numElements()
    if (n != dim * dim) throw new IllegalArgumentException(
      s"graft_power_iter requires a $dim x $dim row-major matrix " +
        s"(${dim * dim} cells), got $n")
    val a = am.toDoubleArray()
    val v = new Array[Double](dim)
    val w = new Array[Double](dim)
    java.util.Arrays.fill(v, 1.0 / math.sqrt(dim.toDouble))
    var r = 0
    while (r < rounds) {
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += a(i * dim + j) * v(j); j += 1 }
        w(i) = s; i += 1
      }
      var ss = 0.0; i = 0
      while (i < dim) { ss += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(ss)
      i = 0
      while (i < dim) { v(i) = w(i) / nrm; i += 1 }
      r += 1
    }
    val out = new Array[Double](dim + 2)
    var lambda = 0.0
    var i = 0
    while (i < dim) {
      var s = 0.0; var j = 0
      while (j < dim) { s += a(i * dim + j) * v(j); j += 1 }
      lambda += v(i) * s
      out(i) = v(i)
      i += 1
    }
    var tr = 0.0; i = 0
    while (i < dim) { tr += a(i * dim + i); i += 1 }
    out(dim) = lambda
    out(dim + 1) = tr
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Registration of graft's native expressions.
  *
  * Two paths, same registry entries:
  *   - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (cluster deployment: every session gets the functions);
  *   - `GraftFunctions.register(spark)` for sessions we did not build
  *     (the driver hands us its own session), idempotent.
  */
object GraftFunctions {
  /** Build-time extraction of a foldable integral-array coefficient
    * argument (`graft_minhash_sigs` takes its hash family as literals —
    * constants of the index definition, folded into the generated code).
    * SQL integer literals parse as INT and arrays as array<int>, so both
    * widths are accepted and widened. */
  private def foldedLongs(e: Expression): Seq[Long] = (e.dataType, e.eval(null)) match {
    case (ArrayType(org.apache.spark.sql.types.LongType, _), ad: ArrayData) =>
      ad.toLongArray.toSeq
    case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ad: ArrayData) =>
      ad.toIntArray.toSeq.map(_.toLong)
    case (t, other) => throw new IllegalArgumentException(
      s"expected a foldable array<int>/array<bigint> literal, got $other: $t")
  }

  /** Widen a foldable INT or BIGINT literal to Long. */
  private def foldedLong(e: Expression): Long = e.eval(null) match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case other => throw new IllegalArgumentException(
      s"expected a foldable integral literal, got $other")
  }

  private val fns: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    (FunctionIdentifier("graft_vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName,
        "graft_vec_cosine"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))),
    (FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName,
        "graft_minhash_sigs"),
      (args: Seq[Expression]) => MinHashSigs(args(0),
        foldedLongs(args(1)), foldedLongs(args(2)),
        foldedLong(args(3)))),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),
    (FunctionIdentifier("graft_power_iter"),
      new ExpressionInfo(classOf[PowerIterTop].getName,
        "graft_power_iter"),
      (args: Seq[Expression]) => PowerIterTop(args(0),
        foldedLong(args(1)).toInt, foldedLong(args(2)).toInt)),
    (FunctionIdentifier("graft_maxcover_greedy"),
      new ExpressionInfo(classOf[MaxCoverGreedy].getName,
        "graft_maxcover_greedy"),
      (args: Seq[Expression]) => MaxCoverGreedy(args(0),
        foldedLong(args(1)).toInt)),
    (FunctionIdentifier("graft_topk_by"),
      new ExpressionInfo(classOf[TopKByAgg].getName, "graft_topk_by"),
      (args: Seq[Expression]) => TopKByAgg(args(0), args(1),
        foldedLong(args(2)).toInt)),
    // Spark ships codegen'd bloom expressions (the runtime-row-filter
    // machinery: BloomFilterAggregate builds the sketch as a typed
    // imperative aggregate, BloomFilterMightContain probes it inside
    // whole-stage codegen) but leaves them OFF the public registry.
    // Exposing them under graft names keeps q_dedup_bloom's probe in
    // Tungsten — no typed mapPartitions boundary, no DeserializeToObject
    // (the round-7 verdict's "Catalyst form would codegen" nit). Args:
    // agg(xxhash64-of-value LONG, est items LONG, num bits LONG);
    // probe(sketch BINARY literal, xxhash64-of-value LONG).
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "graft_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }

  def install(ext: SparkSessionExtensions): Unit =
    fns.foreach(ext.injectFunction)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.install(ext)
}
