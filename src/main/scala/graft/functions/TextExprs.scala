package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers callable from generated Java (static forwarders). */
object TextExprs {
  /** [[MinHashSigs]] precondition: element hashes must already be reduced
    * into [0, prime) — see the class doc for why violations cannot be
    * silently absorbed. */
  def checkHashRange(fn: String, h: Long, prime: Long): Unit =
    if (h < 0 || h >= prime) throw new IllegalArgumentException(
      s"$fn requires element hashes in [0, $prime), got $h " +
        "(reduce with pmod before hashing)")

  /** [[NfcNormalize]] kernel (also the static forwarder generated code
    * calls): already-normalized text — the overwhelming common case —
    * returns the INPUT object unchanged (the JDK's `isNormalized` scan
    * allocates nothing), so only rows that actually decompose pay. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  /** [[MaxCoverGreedy]] kernel (also called from generated code): the
    * complete k-round greedy max-coverage selection over a POOL-sized
    * candidate array — gains exact integers, argmax by (gain DESC,
    * doc_id ASC), covered set a token hash set, identical decisions to
    * the per-round DataFrame formulation it replaced (q_select_maxcover,
    * round 10) and to the unrolled CTE oracle. Input structs:
    * (doc_id BIGINT, n_tokens BIGINT, toks ARRAY<STRING>); output
    * structs: (rank, doc_id, n_tokens, gain, covered_total), one per
    * pick, ≤ min(k, |candidates|) rows. */
  def maxcoverGreedy(cands: ArrayData, k: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val nToks = new Array[Long](n)
    val toks = new Array[Array[UTF8String]](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      nToks(i) = row.getLong(1)
      val ta = row.getArray(2)
      val m = ta.numElements()
      val ts = new Array[UTF8String](m)
      var j = 0
      while (j < m) { ts(j) = ta.getUTF8String(j); j += 1 }
      toks(i) = ts
      i += 1
    }
    val covered = new java.util.HashSet[UTF8String]()
    val taken = new Array[Boolean](n)
    val out = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.catalyst.InternalRow](k.min(n))
    var r = 1
    while (r <= k) {
      var best = -1
      var bestGain = -1L
      var idx = 0
      while (idx < n) {
        if (!taken(idx)) {
          var g = 0L
          var j = 0
          val ts = toks(idx)
          while (j < ts.length) {
            if (ts(j) != null && !covered.contains(ts(j))) g += 1
            j += 1
          }
          if (g > bestGain ||
              (g == bestGain && best >= 0 && ids(idx) < ids(best))) {
            best = idx; bestGain = g
          }
        }
        idx += 1
      }
      if (best >= 0) {
        taken(best) = true
        val ts = toks(best)
        var j = 0
        while (j < ts.length) {
          if (ts(j) != null) covered.add(ts(j))
          j += 1
        }
        out += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](r.toLong, ids(best),
            nToks(best), bestGain, covered.size.toLong))
      }
      r += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** All k MinHash signature values of one element-hash array in a single
  * codegen'd pass.
  *
  * The HOF formulation — k × (`transform(harr, h => pmod(h*aᵢ+bᵢ, p))` →
  * `array_min`) — evaluates interpreted: k passes over the array, a lambda
  * frame per element per hash function (k·n allocations per row). This
  * expression runs ONE loop over the array updating k running minima in a
  * local long[] — no allocation beyond the output array, fused into
  * whole-stage codegen. Arithmetic is identical ((h·aᵢ+bᵢ) mod p on
  * non-negative inputs; the constructor enforces
  * (prime−1)·max(a)+max(b) < 2⁶², hence no Long overflow and
  * `pmod` ≡ Java `%`), so signatures are bit-identical to the HOF form.
  * (The default family in SimilarityQueries sits far below the bound,
  * near 2⁵².)
  *
  * Empty input arrays yield `p` in every slot (the neutral "minimum of
  * nothing" sentinel callers filter out); null input yields null; null
  * ELEMENTS are skipped (the behavior `array_min` gives the HOF form).
  * Element hashes outside [0, prime) are rejected loudly — the
  * pmod ≡ `%` equivalence and the no-overflow bound both depend on that
  * range, and accepting raw (negative) xxhash64 values would silently
  * produce signatures that are not MinHash values of any permutation.
  */
case class MinHashSigs(child: Expression, a: Seq[Long], b: Seq[Long],
    prime: Long) extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length,
    "coefficient vectors must be non-empty and equal-length")
  // The no-overflow claim (h·aᵢ+bᵢ computed in Long, then `%`) holds only
  // for bounded non-negative coefficients: h ≤ prime-1, so the worst-case
  // intermediate is (prime-1)·max(a)+max(b). A SQL caller passing large
  // literals would otherwise silently wrap negative and emit values that
  // are not MinHash signatures of any permutation. Checked with BigInt so
  // the bound test itself cannot overflow.
  require(prime > 1, s"prime must be > 1, got $prime")
  require(a.forall(_ > 0) && b.forall(_ >= 0),
    "multipliers must be positive and offsets non-negative")
  require(
    BigInt(prime - 1) * BigInt(a.max) + BigInt(b.max) <
      (BigInt(1) << 62),
    s"coefficients too large: (prime-1)*max(a)+max(b) must stay below " +
      s"2^62 to rule out Long overflow (prime=$prime, max(a)=${a.max}, " +
      s"max(b)=${b.max})")

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
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        TextExprs.checkHashRange(prettyName, h, prime)
        var j = 0
        while (j < k) {
          val v = (h * a(j) + b(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
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
         |  if ($c.isNullAt($i)) continue;
         |  long $h = $c.getLong($i);
         |  graft.functions.TextExprs.checkHashRange("$prettyName", $h, ${prime}L);
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

/** 64-bit SimHash of a token-hash array in one codegen'd pass.
  *
  * Each array element (one token OCCURRENCE — duplicates vote again, so
  * tf-weighting is implicit) votes ±1 per bit of its 64-bit hash; sign of
  * the per-bit sum sets the signature bit. Replaces the explode →
  * 64-conditional-sum aggregation formulation: the signature becomes a
  * row-local map-stage expression — no exploded rows, no 64-column agg
  * state through the shuffle. Vote math is identical (bit b of sig set
  * iff Σ votes > 0), so signatures match the aggregation form bit for
  * bit. Empty arrays yield signature 0 (all votes 0, no bit set); null
  * elements are skipped (they vote for nothing).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

/** Unicode NFC normalization as a codegen'd scalar expression.
  *
  * Spark ships no normalization function (SPARK-32833 territory), yet
  * canonical equivalence is the FIRST text-canonicalization step of any
  * multilingual corpus pipeline: "é" as U+00E9 and as e+U+0301 are the
  * same grapheme but different byte strings, so every downstream
  * fingerprint/dedup/tokenize pass sees phantom differences until
  * normalization collapses them. Per the §2.10 ladder this is a native
  * `Expression` (b): a Scala UDF would serialize through an encoder per
  * row and fall out of whole-stage codegen; here the generated code is
  * one static `java.text.Normalizer` call (ICU-equivalent for the
  * canonical forms), staying inside the codegen'd scan stage.
  *
  * The JDK fast-paths latin-ASCII input (`Normalizer.isNormalized` is
  * O(n) with no allocation for already-NFC text), so the common case —
  * an overwhelmingly-ASCII crawl — pays almost nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    TextExprs.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

/** The complete greedy max-coverage selection in ONE compiled call —
  * the driver-scale tail of `q_select_maxcover` once the corpus pass
  * has reduced the problem to the declared top-8 candidate pool (the
  * [[graft.functions.PowerIterTop]] shape applied to a combinatorial
  * loop: the per-round DataFrame formulation it replaces ran 4 rounds ×
  * 3 localCheckpoints of KB-sized frames — 13 materializations of pure
  * scheduling overhead, measured 2.3 s at sf0.1 for ~250 rows of actual
  * data).
  *
  * Decisions are identical to the round-by-round formulation and the
  * unrolled CTE oracle: exact integer gains, argmax by (gain DESC,
  * doc_id ASC), covered set accumulated as a union — all inside one
  * projection, so the optimizer has nothing to inline and the plan has
  * no per-round job at all. Fewer than k remaining candidates end the
  * selection early (each pick must be an actual candidate), matching
  * the empty-gains fixpoint of the old loop.
  *
  * Input: array<struct<doc_id BIGINT, n_tokens BIGINT,
  * toks ARRAY<STRING>>>; output: array<struct<rank, doc_id, n_tokens,
  * gain, covered_total>> in pick order. */
case class MaxCoverGreedy(child: Expression, k: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.StructType

  private def okStruct(st: StructType): Boolean =
    st.fields.length == 3 &&
      st.fields(0).dataType == LongType &&
      st.fields(1).dataType == LongType &&
      (st.fields(2).dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if okStruct(st) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, bigint, " +
        s"array<string>>>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      org.apache.spark.sql.types.StructField("rank", LongType, false),
      org.apache.spark.sql.types.StructField("doc_id", LongType, false),
      org.apache.spark.sql.types.StructField("n_tokens", LongType, false),
      org.apache.spark.sql.types.StructField("gain", LongType, false),
      org.apache.spark.sql.types.StructField("covered_total", LongType,
        false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_maxcover_greedy"

  override protected def nullSafeEval(input: Any): Any =
    TextExprs.maxcoverGreedy(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExprs.maxcoverGreedy($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : MaxCoverGreedy = copy(child = newChild)
}
