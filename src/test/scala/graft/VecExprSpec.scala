package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FloatVecDot

/** FloatVecDot: interpreted path vs codegen path vs the HOF formulation it
  * replaced — all three must agree bit-for-bit (same sequential double
  * accumulation), or oracle hashes would drift. */
class VecExprSpec extends AnyFunSuite with SparkFixture {

  private val rng = new scala.util.Random(42)
  private def vec(n: Int): Array[Float] =
    Array.fill(n)(rng.nextFloat() * 2 - 1)

  test("interpreted eval matches hand computation") {
    val a = vec(64); val b = vec(64)
    val expr = FloatVecDot(
      Literal(ArrayData.toArrayData(a), ArrayType(FloatType)),
      Literal(ArrayData.toArrayData(b), ArrayType(FloatType)))
    val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
      s + x.toDouble * y.toDouble
    }
    assert(expr.eval(null) === expected)
  }

  test("codegen result equals the zip_with/aggregate HOF formulation") {
    import spark.implicits._
    Tables.embeddings(spark, sfDir) // registers the function
    val df = Seq.fill(50)((vec(64), vec(64))).toDF("a", "b")
    val out = df.select(
      call_function("graft_vec_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1),
        "codegen and HOF accumulation diverged")
    }
  }

  test("fused cosine equals the composed dot/norm form bit-for-bit") {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
    val df = Seq.fill(50)((vec(64), vec(64))).toDF("a", "b")
    val out = df.select(
      call_function("graft_vec_cosine", col("a"), col("b")).as("fused"),
      (call_function("graft_vec_dot", col("a"), col("b")) /
        (sqrt(call_function("graft_vec_dot", col("a"), col("a"))) *
          sqrt(call_function("graft_vec_dot", col("b"), col("b")))))
        .as("composed"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("mixed float/double arrays are accepted (IVF centroid path)") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f), Array(0.5, 0.25))).toDF("f", "d")
    val out = df.select(
      call_function("graft_vec_dot", col("f"), col("d"))).collect()
    assert(out.head.getDouble(0) === 1.0)
  }

  test("non-array input fails analysis with a typed error") {
    import spark.implicits._
    val df = Seq((1, Array(1f))).toDF("i", "a")
    val e = intercept[Exception] {
      df.select(call_function("graft_vec_dot", col("i"), col("a")))
        .collect()
    }
    assert(e.getMessage.contains("graft_vec_dot"))
  }

  test("mismatched array lengths fail loudly instead of truncating") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(call_function("graft_vec_dot", col("a"), col("b")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("equal-length")), msgs(e).mkString("; "))
  }

  test("null array yields null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(
      call_function("graft_vec_dot", col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("graft_minhash_sigs equals the transform/array_min HOF form") {
    import spark.implicits._
    Tables.documents(spark, sfDir) // registers the function
    val prime = 2147483647L
    val as = Seq(1001L, 1003L, 1005L)
    val bs = Seq(131L, 8050L, 15969L)
    val df = Seq.fill(40)(Array.fill(20)(math.abs(rng.nextLong()) % prime))
      .toDF("harr")
    val viaExpr = df.select(call_function("graft_minhash_sigs",
      col("harr"), typedlit(as), typedlit(bs), lit(prime)).as("m"))
    val viaHof = df.select(array(
      as.zip(bs).map { case (a, b) =>
        array_min(transform(col("harr"), h => pmod(h * a + b, lit(prime))))
      }: _*).as("m"))
    assert(viaExpr.collect().map(_.getSeq[Long](0)).toSeq ===
      viaHof.collect().map(_.getSeq[Long](0)).toSeq)
  }

  test("graft_simhash64 equals the 64-conditional-sum aggregation form") {
    import spark.implicits._
    Tables.documents(spark, sfDir) // registers the function
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "lorem ipsum dolor sit amet"),
      (3L, "single"),
      (4L, "the the the the")).toDF("doc_id", "text")
    val viaExpr = docs.select(col("doc_id"),
      call_function("graft_simhash64",
        transform(split(col("text"), " "), t => xxhash64(t))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val th = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val voteCols = (0 until 64).map { b =>
      sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), 1L).otherwise(-1L))
        .as(s"v$b")
    }
    val sigExpr = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    val viaAgg = th.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), sigExpr.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
  }

  test("graft_minhash_sigs rejects coefficients that could overflow Long") {
    // The no-overflow claim is (prime-1)*max(a)+max(b) < 2^62; a SQL
    // caller passing huge literals must fail construction loudly, not
    // silently wrap negative inside the codegen'd loop.
    import spark.implicits._
    Tables.documents(spark, sfDir)
    val prime = 2147483647L
    val df = Seq(Array(42L)).toDF("harr")
    val e = intercept[Exception] {
      df.select(call_function("graft_minhash_sigs", col("harr"),
        typedlit(Seq(Long.MaxValue / 2)), typedlit(Seq(0L)),
        lit(prime))).collect()
    }
    assert(e.getMessage.contains("coefficients too large"))
    val neg = intercept[Exception] {
      df.select(call_function("graft_minhash_sigs", col("harr"),
        typedlit(Seq(-3L)), typedlit(Seq(0L)), lit(prime))).collect()
    }
    assert(neg.getMessage.contains("multipliers must be positive"))
  }

  test("graft_minhash_sigs: empty array yields the prime sentinel") {
    import spark.implicits._
    Tables.documents(spark, sfDir)
    val prime = 2147483647L
    val df = Seq(Array.empty[Long]).toDF("harr")
    val out = df.select(call_function("graft_minhash_sigs",
      col("harr"), typedlit(Seq(3L, 5L)), typedlit(Seq(7L, 11L)),
      lit(prime))).collect()
    assert(out.head.getSeq[Long](0) === Seq(prime, prime))
  }

  test("graft_power_iter finds the dominant eigenpair of a known matrix") {
    import spark.implicits._
    // Symmetric 2×2 [[2,1],[1,2]]: eigenvalues 3 and 1, dominant
    // eigenvector (1,1)/√2. Trace = 4. 24 rounds from the uniform start
    // (already the exact eigenvector here) must return it unchanged.
    val out = Seq(Seq(2.0, 1.0, 1.0, 2.0)).toDF("am")
      .select(call_function("graft_power_iter", col("am"), lit(2),
        lit(24)).as("o"))
      .collect().head.getSeq[Double](0)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(out(0) - s) < 1e-12 && math.abs(out(1) - s) < 1e-12,
      s"loading: ${out.take(2)}")
    assert(math.abs(out(2) - 3.0) < 1e-12, s"lambda: ${out(2)}")
    assert(out(3) === 4.0, s"trace: ${out(3)}")
  }

  test("graft_power_iter interpreted eval matches the codegen path") {
    val am = Array.tabulate(16)(i => rng.nextDouble())
    // Symmetrize so the iteration is well-posed.
    val sym = Array.tabulate(16) { k =>
      val (i, j) = (k / 4, k % 4); (am(i * 4 + j) + am(j * 4 + i)) / 2
    }
    val interp = graft.functions.PowerIterTop(
      Literal(ArrayData.toArrayData(sym), ArrayType(DoubleType)), 4, 24)
      .eval(null).asInstanceOf[ArrayData].toDoubleArray()
    import spark.implicits._
    val codegen = Seq(sym.toSeq).toDF("am")
      .select(call_function("graft_power_iter", col("am"), lit(4),
        lit(24)))
      .collect().head.getSeq[Double](0).toArray
    assert(interp === codegen, "interpreted and codegen paths must agree")
  }

  test("graft_power_iter rejects a non-square cell count") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0, 3.0)).toDF("am")
        .select(call_function("graft_power_iter", col("am"), lit(2),
          lit(4))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("graft_nfc composes decomposed sequences; identity on NFC text") {
    import spark.implicits._
    val rows = Seq(
      "Café",          // e + combining acute -> é
      "Café",           // already composed - identity
      "plain ascii",         // fast path
      "Å",             // A + ring -> Å
      ""                     // empty
    ).toDF("s").select(call_function("graft_nfc", col("s")).as("n"),
      length(col("s")).as("lr"),
      length(call_function("graft_nfc", col("s"))).as("ln"))
      .collect()
    assert(rows(0).getAs[String]("n") === "Café")
    assert(rows(0).getAs[Int]("lr") === 5 && rows(0).getAs[Int]("ln") === 4)
    assert(rows(1).getAs[String]("n") === "Café")
    assert(rows(2).getAs[String]("n") === "plain ascii")
    assert(rows(3).getAs[String]("n") === "Å")
    assert(rows(4).getAs[String]("n") === "")
    // JDK reference replay.
    assert(rows(0).getAs[String]("n") ===
      java.text.Normalizer.normalize("Café",
        java.text.Normalizer.Form.NFC))
  }

  test("graft_nfc null yields null; non-string input fails analysis") {
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("s")
      .select(call_function("graft_nfc", col("s"))).collect()
    assert(out.head.isNullAt(0))
    val ex = intercept[Exception] {
      Seq(1L).toDF("x").select(call_function("graft_nfc", col("x")))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string")
      || ex.getMessage != null)
  }

  test("graft_topk_by: SQL-path registration, order, ties, k-bound, " +
      "type check") {
    import spark.implicits._
    Seq((1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.5),
        (1L, 13L, 0.95), (2L, 20L, 0.1))
      .toDF("g", "id", "score").createOrReplaceTempView("topk_in")
    // (score DESC, id ASC): the 0.9 tie resolves 10 before 11; k=2
    // cuts 12; group 2 keeps its single row.
    val out = spark.sql(
      """SELECT g, graft_topk_by(score, id, 2) AS top
        |FROM topk_in GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getLong(0),
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getLong(0), t.getDouble(1)))))
    assert(out.toSeq === Seq(
      (1L, Seq((13L, 0.95), (10L, 0.9))),
      (2L, Seq((20L, 0.1)))), s"got ${out.toSeq}")
    // Wrong input types fail analysis, not execution.
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_topk_by(CAST(1 AS INT), 2, 3)").collect()
    }
    assert(ex.getMessage != null)
  }

  test("graft_maxcover_greedy: greedy decisions, ties, early exhaustion") {
    import spark.implicits._
    // Candidates: doc 1 covers {a,b,c}, doc 2 {a,b} (subset — gain 0
    // after 1), doc 3 {d,e}, doc 5 {d,e} (tie with 3 → smaller id wins
    // round 2 only via gain; after 3 is taken, 5 gains 0).
    def run(rows: Seq[(Long, Long, Seq[String])], k: Int) = {
      val df = rows.toDF("doc_id", "n_tokens", "toks")
        .agg(sort_array(collect_list(struct(col("doc_id"),
          col("n_tokens"), col("toks")))).as("cands"))
        .select(explode(call_function("graft_maxcover_greedy",
          col("cands"), lit(k))).as("p"))
        .select("p.rank", "p.doc_id", "p.gain", "p.covered_total")
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    }
    val picks = run(Seq(
      (1L, 3L, Seq("a", "b", "c")), (2L, 2L, Seq("a", "b")),
      (3L, 2L, Seq("d", "e")), (5L, 2L, Seq("d", "e"))), 4)
    assert(picks === Seq((1L, 1L, 3L, 3L), (2L, 3L, 2L, 5L),
      (3L, 2L, 0L, 5L), (4L, 5L, 0L, 5L)),
      s"greedy trace diverged: $picks")
    // Fewer candidates than k: selection ends when the pool runs dry.
    val short = run(Seq((7L, 1L, Seq("x"))), 4)
    assert(short === Seq((1L, 7L, 1L, 1L)))
    // Empty candidate array: no picks, no rows.
    assert(run(Seq.empty, 4).isEmpty)
  }
}
