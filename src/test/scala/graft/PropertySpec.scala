package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphQueries, SimilarityQueries, StatsQueries, TextQueries}

/** Algebraic laws (SURVEY §5.3) + the LSH recall contract. Spark-backed
  * properties sample a few generated cases per law (each sample is a
  * distributed job); deterministic seeds keep runs reproducible. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  /** Deterministic scalacheck sampling without the scalatestplus bridge
    * (not in the offline cache). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(40), Seed(42L + i)))

  private val intList = Gen.listOf(Gen.chooseNum(-50, 50))

  test("union-all count additivity") {
    import spark.implicits._
    for ((xs, ys) <- samples(Gen.zip(intList, intList), 5)) {
      val a = xs.toDF("v"); val b = ys.toDF("v")
      assert(a.unionByName(b).count() === xs.length + ys.length)
    }
  }

  test("except/intersect partition the left multiset's distinct values") {
    import spark.implicits._
    for ((xs, ys) <- samples(Gen.zip(intList, intList), 5)) {
      val a = xs.toDF("v"); val b = ys.toDF("v")
      val n = a.except(b).count() + a.intersect(b).count()
      assert(n === xs.distinct.length)
    }
  }

  test("approx_count_distinct within 5% of exact (SURVEY §2.4 contract)") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val rows = events.groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx"),
        countDistinct("user_id").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap, ex) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(ap - ex) / ex <= 0.05,
        s"${r.getString(0)}: approx $ap vs exact $ex")
    }
  }

  test("bag identity: |A except-all B| + |A intersect-all B| = |A|") {
    // The multiset ops must partition A's copies exactly — the bag
    // analogue of the distinct-set partition test below.
    val a = Tables.lineitem(spark, sfDir).select("l_orderkey")
    val b = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"))
    val kept = a.exceptAll(b).count()
    val matched = a.intersectAll(b).count()
    assert(kept + matched === a.count())
    assert(matched > 0L && kept > 0L)
  }

  test("windowed tumbling counts sum to the global count") {
    val events = Tables.events(spark, sfDir)
    val windowed = events
      .groupBy(window(col("ts"), "10 minutes")).count()
      .agg(sum("count")).collect().head.getLong(0)
    assert(windowed === events.count())
  }

  test("LSH recall: every exact-Jaccard ≥ 0.8 pair is recovered") {
    val exact = TextQueries.dedupNgram(spark, sfDir)
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.simPairsLsh(spark, sfDir)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    val missed = exact -- lsh
    assert(missed.isEmpty,
      s"high-similarity pairs missed by LSH banding: $missed")
  }

  test("CC-over-LSH recall: every exact ≥0.9 pair lands same-component") {
    // The q_dedup_cc_lsh contract (SURVEY §2.8): at the ≥0.9 threshold,
    // banded-MinHash recall is high enough (per-pair ≈ 0.986 for 4×4
    // bands, plus transitive-closure repair inside clusters) that the
    // production LSH feed must cluster every exact-Jaccard ≥0.9 pair
    // together. The exact side is dedupNgram (full-set-verified Jaccard);
    // 27 such pairs exist at sf0.001 — non-vacuous, and `assert(nonEmpty)`
    // pins that against fixture drift.
    val exact = TextQueries.dedupNgram(spark, sfDir)
      .filter(col("jaccard") >= 0.9)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "fixture should contain exact ≥0.9 pairs")
    // One execution serves both assertions — each dedupCcLsh call runs
    // the LSH candidate join + Pregel eagerly (localCheckpoints in
    // construction), so calling it twice would double the test's cost.
    val rows = GraphQueries.dedupCcLsh(spark, sfDir)
      .select("doc_id", "component", "keep").collect()
    val comp = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val split = exact.filter { case (a, b) => comp(a) != comp(b) }
    assert(split.isEmpty,
      s"exact ≥0.9 pairs split across components: ${split.toSeq}")
    // And exactly one keep-representative per component.
    val badComponents = rows.groupBy(_.getLong(1))
      .filter { case (_, rs) => rs.count(_.getBoolean(2)) != 1 }
    assert(badComponents.isEmpty,
      s"components without exactly one keep: ${badComponents.keys.take(5)}")
  }

  test("incremental LSH gate matches brute-force delta-base near-dups") {
    // Exact truth from dedupNgram (full-set-verified Jaccard), restricted
    // to pairs spanning the delta/base split in either orientation.
    val exact = TextQueries.dedupNgram(spark, sfDir)
      .filter(col("jaccard") >= 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val db = exact.flatMap { case (a, b, j) =>
      if (a % 4 == 0 && b % 4 != 0) Some((a, b, j))
      else if (b % 4 == 0 && a % 4 != 0) Some((b, a, j)) else None
    }
    assert(db.nonEmpty, "fixture should contain delta-base ≥0.9 pairs")
    val byDelta = db.groupBy(_._1)
    val out = SimilarityQueries.dedupIncrementalLsh(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    byDelta.foreach { case (did, ms) =>
      val r = out(did)
      assert(r.getBoolean(4), s"delta doc $did not flagged")
      assert(r.getLong(1) === ms.size.toLong, s"match count for $did")
      val bestJ = ms.map(_._3).max
      assert(r.getDouble(3) === bestJ, s"best jaccard for $did")
      assert(r.getLong(2) === ms.filter(_._3 == bestJ).map(_._2).min,
        s"best-base tiebreak for $did")
    }
    // Precision 1 by construction (exact verify): every flagged doc must
    // have a true ≥0.9 base match.
    out.values.filter(_.getBoolean(4)).foreach { r =>
      assert(byDelta.contains(r.getLong(0)),
        s"false positive ${r.getLong(0)}")
    }
    // Unflagged docs report the empty-match shape.
    out.values.filterNot(_.getBoolean(4)).foreach { r =>
      assert(r.getLong(1) === 0L && r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("LSH precision: every reported pair meets the Jaccard threshold") {
    val bad = SimilarityQueries.simPairsLsh(spark, sfDir)
      .filter(col("jaccard") < 0.5).count()
    assert(bad === 0L)
  }

  test("ANN-IVF finds true near neighbors (recall vs exact top-k)") {
    val e = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    // Exact top-5 per probe by brute force.
    val probes = e.filter(col("vec_id") < 5).toDF("probe_id", "pv")
    val exact = probes.crossJoin(e)
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.cosine(col("pv"), col("embedding"))
          .as("c"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(col("c").desc, col("vec_id"))))
      .filter(col("rnk") <= 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityQueries.annIvf(spark, sfDir)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // This testdata's cluster labels are uncorrelated with cosine
    // geometry (see annIvf scaladoc), so IVF recall here is the pruning
    // fraction: nprobe/k = 4/10. Assert the pruning math holds (with
    // sampling slack); real embeddings would score far higher.
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.25, f"IVF recall@5 below pruning bound: $recall%.2f")
  }

  test("dedup_ngram recovers a mass-duplicated cluster despite the df-cut") {
    import spark.implicits._
    // 60 identical 3-token docs share ONE shingle with df = 60 — above
    // the max(50, ceil(0.1 × 62)) = 50 threshold, so the cut removes it
    // from candidate generation (the unbounded posting-list blowup the
    // cut exists to stop). The exact-set group path must still recover
    // all C(60,2) = 1770 Jaccard-1.0 pairs — mass-duplicated boilerplate
    // is the heart of the dedup use case, so the cut may bound WORK but
    // not this answer. Two extra docs share rare (cold) shingles at
    // Jaccard 0.75 — the candidate-path positive control.
    val hotDocs = (0L until 60L).map(i => (i, "the quick fox"))
    val rare = Seq(
      (200L, "alpha beta gamma delta epsilon"),
      (201L, "alpha beta gamma delta epsilon eta"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dfcut").toString
    (hotDocs ++ rare).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextQueries.dedupNgram(spark, dir)
      .select("d1", "d2", "jaccard").collect()
    assert(pairs.length === 1771,
      s"expected 1770 identical-set pairs + 1 cold pair, got ${pairs.length}")
    val ones = pairs.filter(_.getDouble(2) == 1.0)
    assert(ones.length === 1770)
    assert(ones.forall(r => r.getLong(0) < 60 && r.getLong(1) < 60))
    val cold = pairs.filter(_.getDouble(2) != 1.0)
    assert((cold.head.getLong(0), cold.head.getLong(1)) === ((200L, 201L)))
    assert(cold.head.getDouble(2) === 0.75)
  }

  test("dedup_ngram declared recall hole: near-identical all-hot pairs") {
    import spark.implicits._
    // The one recall limit the df-cut semantics DECLARE (and the regime
    // q_sim_pairs_lsh / q_dedup_cc_lsh exist for): a pair whose shared
    // shingles are all hot and whose cold shingles are disjoint. 60
    // identical 5-token docs make shingles s1..s3 hot (df 62 > 50); docs
    // 200/201 append one unique token each — true Jaccard vs any
    // boilerplate doc is 3/4 = 0.75 and vs each other 3/5 = 0.6, but
    // their sets are not identical (no group path) and their cold
    // shingles are disjoint (no candidate path). This test PINS the
    // declared semantics: exactly the 1770 identical-set pairs emit.
    val hotDocs = (0L until 60L).map(i => (i, "w1 w2 w3 w4 w5"))
    val near = Seq(
      (200L, "w1 w2 w3 w4 w5 x1"),
      (201L, "w1 w2 w3 w4 w5 y1"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dfcut-hole").toString
    (hotDocs ++ near).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextQueries.dedupNgram(spark, dir)
      .select("d1", "d2", "jaccard").collect()
    assert(pairs.length === 1770)
    assert(pairs.forall(r => r.getDouble(2) == 1.0 &&
      r.getLong(0) < 60 && r.getLong(1) < 60))
  }

  test("dedup_ngram df-cut is invisible below the document floor") {
    import spark.implicits._
    // 40 identical docs: df = 40 ≤ max(50, ceil(0.1 × 40)) = 50 — under
    // the floor the semantics are the exact inverted-index join, so all
    // C(40,2) Jaccard-1.0 pairs must survive.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dfcut-floor").toString
    (0L until 40L).map(i => (i, "the quick fox")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val n = TextQueries.dedupNgram(spark, dir).count()
    assert(n === 40L * 39 / 2)
  }

  test("bounded-heap top-k is merge-order-independent (scalacheck)") {
    // The 100 TB contract for graft_topk_by's buffer: any partitioning
    // of the input into map-side partials, merged in any order (with a
    // serialize/deserialize round-trip on one side — the shuffle path),
    // equals the global sort's top-k. Ties included deliberately
    // (cos_sim rounded to 4dp upstream makes ties common) — the
    // (score DESC, id ASC) total order must resolve them identically
    // everywhere.
    import graft.functions.{TopKByAgg, TopKByBuf}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val agg = TopKByAgg(BoundReference(0, DoubleType, nullable = false),
      BoundReference(1, LongType, nullable = false), 5)
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 99L)
        s <- Gen.chooseNum(0, 20)
      } yield (id, s / 20.0))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, math.max(n, 1)))
    } yield (rows.distinct, cuts)
    val seed0 = Seed(42L)
    (0 until 200).foldLeft(seed0) { (seed, _) =>
      val (params, next) = gen.pureApply(Gen.Parameters.default, seed) ->
        seed.next
      val (rows, cuts) = params
      val expected = rows
        .sortBy { case (id, s) => (-s, id) }.take(5)
      // split at the generated cut points into up to 4 partials
      val pts = (cuts :+ 0 :+ rows.length).distinct.sorted
      val partials = pts.zip(pts.tail).map { case (a, b) =>
        val buf = agg.createAggregationBuffer()
        rows.slice(a, b).foreach { case (id, s) => buf.insert(s, id) }
        buf
      }
      def drain(bufs: Seq[TopKByBuf]): Seq[(Long, Double)] = {
        // round-trip every partial through the wire format, as the
        // shuffle does, before merging
        val m = bufs.map(b => agg.deserialize(agg.serialize(b)))
          .foldLeft(agg.createAggregationBuffer())(agg.merge)
        (0 until m.n).map(j => (m.ids(j), m.scores(j)))
      }
      assert(drain(partials) === expected)
      assert(drain(partials.reverse) === expected)
      next
    }
  }

  test("minhash signature similarity tracks exact Jaccard (bound check)") {
    // Pure-JVM property: the (a*h+b) mod p family used by simPairsLsh,
    // evaluated directly on generated shingle sets.
    val params = (0 until 64).map(i => (2L * i + 1001L, 7919L * i + 131L))
    val p = 2147483647L
    def minhash(s: Set[Long]): Seq[Long] =
      params.map { case (a, b) => s.map(h => (a * h + b) % p).min }
    // Scramble raw ids across the full [0, p) range first — exactly what
    // the Spark pipeline's xxhash64(shingle) step does. Without it,
    // a*h+b never wraps mod p and the family degenerates to a monotonic
    // map (every set with the same minimum id would collide).
    // fmix64-style scramble (offset first: fmix(0) = 0, and scalacheck's
    // chooseNum loves emitting 0). A tiny scrambled value would dominate
    // the argmin of every (a*h+b) mod p — the one degenerate point of the
    // family, which xxhash64 in the real pipeline avoids the same way.
    def scramble(x: Long): Long = {
      var h = x + 0x9e3779b97f4a7c15L
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      Math.floorMod(h, p - 1) + 1
    }
    val setGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L))
    for ((xs, ys) <- samples(Gen.zip(setGen, setGen), 20)) {
      val (sa, sb) = (xs.map(scramble).toSet, ys.map(scramble).toSet)
      val jac = (sa & sb).size.toDouble / (sa | sb).size
      val est = minhash(sa).zip(minhash(sb))
        .count { case (x, y) => x == y }.toDouble / params.size
      assert(math.abs(est - jac) <= 0.35,
        f"minhash estimate $est%.2f far from jaccard $jac%.2f")
    }
  }

  test("int8 quantization: error ≤ half a step, absmax element saturates") {
    // q = floor(x·127/scale + 0.5) is nearest-int, so per-element
    // reconstruction error is bounded by step/2 = scale/254; the element
    // whose |x| equals scale maps to exactly ±127, so n_sat ≥ 1 always.
    val rows = SimilarityQueries.embedQuantize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(r.getAs[Long]("n_sat") >= 1L,
        s"vec ${r.get(0)}: absmax element must saturate")
      // +5e-7: max_err is surfaced rounded to 6dp, which can round UP
      // across the analytic bound by up to half the last decimal place.
      assert(r.getAs[Double]("max_err") <= scale / 254 + 5e-7 + 1e-9,
        s"vec ${r.get(0)}: max_err ${r.getAs[Double]("max_err")} " +
          s"exceeds half-step ${scale / 254}")
      assert(r.getAs[Double]("mean_err") <= r.getAs[Double]("max_err"))
    }
  }

  /** The R-vs-N per-quantity counts both two-sample tests run on,
    * collected once (the support is ~50 values at any SF). */
  private lazy val rnCounts: Seq[(Long, Long, Long)] =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isin("R", "N"))
      .groupBy(round(col("l_quantity"), 0).cast("long").as("q"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c1"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("c2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("KS statistic equals the direct max-ECDF-gap computation") {
    // Independent recomputation from first principles over the collected
    // value support: D = max |cum1·n2 − cum2·n1| / (n1·n2), all exact
    // BigInt until the one closing division — the same arithmetic the
    // query and its oracle both declare, derived a third way.
    val n1 = rnCounts.map(_._2).sum
    val n2 = rnCounts.map(_._3).sum
    var (cum1, cum2) = (BigInt(0), BigInt(0))
    var best = BigInt(-1); var bestQ = Long.MinValue
    rnCounts.foreach { case (q, c1, c2) =>
      cum1 += c1; cum2 += c2
      val diff = (cum1 * n2 - cum2 * n1).abs
      if (diff > best) { best = diff; bestQ = q }
    }
    val row = StatsQueries.aggKs(spark, sfDir).collect().head
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(row.getAs[Long]("ks_at") === bestQ)
    val direct = best.toDouble / (n1.toDouble * n2.toDouble)
    assert(math.abs(row.getAs[Double]("ks") - direct) <= 1e-15,
      s"ks ${row.getAs[Double]("ks")} vs direct $direct")
  }

  test("Mann-Whitney U equals the direct dominance-pair count") {
    // U₁ = #(x₁ > x₂ pairs) + ½·#ties — counted directly over the
    // value-support cross product in BigInt (2U₁ stays integral), the
    // definitional form the rank-sum derivation must reproduce.
    val n1 = rnCounts.map(_._2).sum
    val n2 = rnCounts.map(_._3).sum
    var u1two = BigInt(0)
    for ((qa, c1, _) <- rnCounts; (qb, _, c2) <- rnCounts) {
      if (qa > qb) u1two += 2 * BigInt(c1) * c2
      else if (qa == qb) u1two += BigInt(c1) * c2
    }
    val row = StatsQueries.aggMannWhitney(spark, sfDir).collect().head
    val u1 = row.getAs[Double]("u1")
    assert(u1 * 2 === u1two.toDouble, s"2·U1 ${u1 * 2} vs $u1two")
    assert(u1 >= 0 && u1 <= n1.toDouble * n2, "U out of [0, n1·n2]")
    val rRb = row.getAs[Double]("r_rb")
    val direct = (BigInt(n1) * n2 - u1two).toDouble / (n1.toDouble * n2)
    assert(math.abs(rRb - direct) <= 1e-12, s"r_rb $rRb vs $direct")
    assert(!row.getAs[Double]("z").isNaN, "z must be defined")
  }

  test("Gini equals the direct mean-absolute-difference identity") {
    // G = Σᵢⱼ|xᵢ−xⱼ| / (2n·S): the O(n²) definitional form, exact in
    // BigInt, against the query's sorted-rank identity — algebraically
    // equal, so the doubles may differ only in the final rounding.
    val cents = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)) }
    val rows = StatsQueries.aggGini(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === cents.keySet)
    rows.foreach { r =>
      val xs = cents(r.getString(0))
      val n = BigInt(xs.length)
      val s = xs.foldLeft(BigInt(0))(_ + _)
      var num = BigInt(0)
      for (i <- xs.indices; j <- xs.indices if j > i)
        num += BigInt(math.abs(xs(i) - xs(j)))
      val direct = (2 * num).toDouble / (2 * n * s).toDouble
      val gini = r.getAs[Double]("gini")
      assert(math.abs(gini - direct) <= 1e-12,
        s"${r.getString(0)}: gini $gini vs direct $direct")
      assert(gini >= 0.0 && gini < 1.0)
      val t10 = r.getAs[Double]("top10_share")
      if (xs.length >= 10)
        assert(t10 >= 0.1 - 1e-9 && t10 <= 1.0,
          s"top-decile share $t10 below proportional floor")
    }
  }

  test("count-min sketch never undercounts (one-sided error contract)") {
    // CMS cells only ever ADD colliding mass, so min-over-rows is ≥ the
    // true count for every item — the defining one-sided guarantee.
    val rows = TextQueries.freqCms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_true"),
        s"token ${r.getString(0)} undercounted")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("n_est") - r.getAs[Long]("n_true"))
    }
  }

  test("heavy hitters: MG + exact recount equals brute force on a " +
      "skewed corpus") {
    import spark.implicits._
    // Zipf-ish adversarial corpus far outside the fixture's shape: one
    // token at ~30% mass, two at ~5%, a 900-token cold tail spread so
    // thin the 64-slot summary must evict constantly. The guarantee
    // under test: whatever MG's merge-order-dependent innards do, the
    // verified output must equal the brute-force {term : 64·cnt > n}
    // set with exact counts.
    val words = Seq.fill(3000)("hot") ++ Seq.fill(500)("warm1") ++
      Seq.fill(500)("warm2") ++
      (0 until 6000).map(i => s"cold${i % 900}")
    // 8 docs so several partitions/partials exercise MG merge.
    val docs = words.grouped(1250).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mg").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.AggQueries.aggHeavyHitters(spark, dir)
      .select("term", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = words.size.toLong
    val brute = words.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 64L > n }.toMap
    assert(got === brute,
      s"verified MG set diverged from brute force: got=$got brute=$brute")
    assert(got.contains("hot") && got.size >= 3,
      s"planted hitters missing: $got")
  }

  test("winnowing guarantee: a shared w+k-1 token run shares a fingerprint") {
    import spark.implicits._
    // MOSS's selection guarantee (k=4-token grams, window w=4): any run
    // of w+k−1 = 7 shared tokens yields w consecutive shared grams, so
    // BOTH docs contain the identical 4-gram window and select the same
    // min hash — regardless of where the run sits in each doc (doc B
    // shifts it by a 2-token prefix, the displacement that breaks
    // fixed-stride sampling). Unshared filler tokens are disjoint, so
    // any shared selected fingerprint must come from the planted run.
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 u1 u2 u3 u4 u5"),
      (2L, "p1 p2 s1 s2 s3 s4 s5 s6 s7 q1 q2"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-winnow").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.textWinnowing(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_shared") >= 1,
      "doc 1 must share a selected fingerprint with doc 2")
    assert(out(2L).getAs[Long]("n_shared") >= 1,
      "doc 2 must share a selected fingerprint with doc 1")
    assert(out(3L).getAs[Long]("n_shared") === 0,
      "the disjoint doc must share nothing")
    // Selection bounds: ≥1 per w-window span (a gram can be the min of
    // at most w windows), ≤ the gram count.
    out.values.foreach { r =>
      val (g, sel) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_selected"))
      assert(sel >= (g + 3) / 4 && sel <= g,
        s"selection density out of winnowing bounds: grams=$g sel=$sel")
    }
  }

  test("winnowing HOF minima ≡ window-frame reference (incl. trailing)") {
    import spark.implicits._
    // The round-14 rewrite computes each position's w=4 window min with
    // array_min(slice(hs, i, 4)) instead of a doc-keyed WindowExec with
    // ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING. The two must agree
    // EVERYWHERE, including the last w−1 positions whose frames are
    // shorter than w (slice truncates at the array end exactly like the
    // window frame) — randomized docs with token counts 4..30 hit every
    // trailing-window length, and repeated tokens exercise duplicate
    // gram hashes inside one window.
    val rnd = new scala.util.Random(1314)
    val docs = (1L to 60L).map { id =>
      val n = 4 + rnd.nextInt(27)
      (id, (1 to n).map(_ => s"t${rnd.nextInt(8)}").mkString(" "))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-winnow-eq").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Reference: the pre-rewrite formulation, explode + window frame.
    val g = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("toks")) - 3), i =>
          concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3))))
        .as(Seq("p", "gram")))
      .select(col("doc_id"), col("p"),
        md5(col("gram").cast("binary")).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, 3)
    val ref = g.select(col("doc_id"), min("h").over(win).as("wmin"))
      .distinct().groupBy("doc_id")
      .agg(count(lit(1)).as("n_selected"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.operators.TextQueries.textWinnowing(spark, dir)
      .select("doc_id", "n_selected", "n_grams")
      .collect()
    assert(got.length === docs.length)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === ref(id),
        s"doc $id: HOF selection count ${r.getLong(1)} != window " +
          s"reference ${ref(id)}")
      val nToks = docs(id.toInt - 1)._2.split(" ").length
      assert(r.getLong(2) === nToks - 3L,
        s"doc $id: n_grams ${r.getLong(2)} != |toks|-3 ${nToks - 3}")
    }
  }

  test("two-phase global rank ≡ single-partition window (scalacheck)") {
    // RankOps is the machinery behind every global ntile/rank in the
    // repo — its contract is EXACT equivalence with the unpartitioned
    // window it replaces, for any row count (including n < k, n = 0,
    // n ≪ partitions) and any bucket count. Randomized sizes + values
    // with duplicates on the value column (the unique id is the
    // tiebreak, as every call site declares).
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.oneOf(0, 1, 2, 3, 5, 17, 101, 1000)
      k <- Gen.oneOf(2, 4, 5, 7, 10)
      seed <- Gen.choose(0L, 1000000L)
    } yield (n, k, seed)
    Gen.listOfN(12, gen).apply(Gen.Parameters.default, Seed(7L)).get
      .foreach { case (n, k, seed) =>
        val rng = new scala.util.Random(seed)
        val df = (0 until n).map(i => (i.toLong, rng.nextInt(20).toLong))
          .toDF("id", "v")
        val got = graft.operators.RankOps
          .withGlobalRank(df, "rk", "n", col("v").desc, col("id"))
          .withColumn("nt", graft.operators.RankOps
            .ntileFromRank(col("rk"), col("n"), k))
          .select("id", "rk", "nt").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val w = Window.orderBy(col("v").desc, col("id"))
        val exp = df.select(col("id"),
            row_number().over(w).cast("long").as("rk"),
            ntile(k).over(w).cast("long").as("nt")).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got === exp, s"n=$n k=$k seed=$seed: two-phase rank " +
          "diverged from the window definition")
      }
  }

  test("keyed two-phase rank ≡ per-key window row_number (scalacheck)") {
    // withKeyedRank (q_search_rrf's single-pass double ranking) must
    // equal the PARTITION BY key window for any key skew — including
    // keys whose runs straddle range-partition boundaries, absent keys,
    // and n = 0 (the same exactness contract as the global law above).
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.oneOf(0, 1, 3, 17, 101, 1000)
      nKeys <- Gen.oneOf(1, 2, 3, 5)
      seed <- Gen.choose(0L, 1000000L)
    } yield (n, nKeys, seed)
    Gen.listOfN(10, gen).apply(Gen.Parameters.default, Seed(11L)).get
      .foreach { case (n, nKeys, seed) =>
        val rng = new scala.util.Random(seed)
        val df = (0 until n).map(i => (i.toLong,
            s"k${rng.nextInt(nKeys)}", rng.nextInt(20).toLong))
          .toDF("id", "src", "v")
        // The AndTotal form must agree with the plain form on the rank
        // AND emit the per-key row count the window's COUNT(*) OVER
        // (PARTITION BY key) would — one law pins both public faces of
        // the shared census (q_rfm/q_window_pct ride the totals).
        val got = graft.operators.RankOps
          .withKeyedRankAndTotal(df, "src", "rk", "kn",
            col("v").desc, col("id"))
          .select("id", "rk", "kn").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
        val w = Window.partitionBy("src")
          .orderBy(col("v").desc, col("id"))
        val exp = df.select(col("id"),
            row_number().over(w).cast("long").as("rk"),
            count(lit(1)).over(Window.partitionBy("src")).as("kn"))
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
        assert(got === exp, s"n=$n keys=$nKeys seed=$seed: keyed " +
          "two-phase rank diverged from the per-key window definition")
        val plain = graft.operators.RankOps
          .withKeyedRank(df, "src", "rk", col("v").desc, col("id"))
          .select("id", "rk").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(plain === exp.map { case (k, (rk, _)) => k -> rk },
          s"n=$n keys=$nKeys seed=$seed: plain keyed rank diverged " +
            "from the AndTotal form")
      }
  }

  test("keyed two-phase prefix sum ≡ per-key running-sum window " +
      "(scalacheck)") {
    // withKeyedPrefixSum (q_select_head's round-11 swap) must equal the
    // PARTITION BY key running-sum window — same exactness contract as
    // the keyed rank law above, over the same adversarial shapes (key
    // runs straddling range-partition boundaries, single-key skew,
    // n = 0), for both the running total and the key grand total.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.oneOf(0, 1, 3, 17, 101, 1000)
      nKeys <- Gen.oneOf(1, 2, 3, 5)
      seed <- Gen.choose(0L, 1000000L)
    } yield (n, nKeys, seed)
    Gen.listOfN(10, gen).apply(Gen.Parameters.default, Seed(13L)).get
      .foreach { case (n, nKeys, seed) =>
        val rng = new scala.util.Random(seed)
        val df = (0 until n).map(i => (i.toLong,
            s"k${rng.nextInt(nKeys)}", rng.nextInt(20).toLong,
            rng.nextInt(500).toLong))
          .toDF("id", "src", "v", "chars")
        val got = graft.operators.RankOps
          .withKeyedPrefixSum(df, "src", "chars", "cum", "tot",
            col("v").desc, col("id"))
          .select("id", "cum", "tot").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
        val w = Window.partitionBy("src")
          .orderBy(col("v").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val exp = df.select(col("id"),
            sum("chars").over(w).as("cum"),
            sum("chars").over(Window.partitionBy("src")).as("tot"))
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
        assert(got === exp, s"n=$n keys=$nKeys seed=$seed: keyed " +
          "two-phase prefix sum diverged from the window definition")
      }
  }

  test("dedup_spans: reconstruction identity + independent full replay") {
    import spark.implicits._
    val out = graft.operators.TextQueries.dedupSpans(spark, sfDir)
      .collect()
    // Identity: the surviving text has exactly n_tokens − n_removed
    // tokens (array_join of an empty keep-list is '', which splits to
    // [""], hence the special case).
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val rm = r.getAs[Long]("n_removed")
      val txt = r.getAs[String]("dedup_text")
      val kept = if (txt.isEmpty) 0L else txt.split(" ", -1).length.toLong
      assert(kept === n - rm,
        s"doc ${r.getLong(0)}: kept $kept != $n - $rm")
      assert(rm <= n)
      val hits = r.getAs[Long]("n_dup_spans")
      assert((hits == 0L) === (rm == 0L),
        s"doc ${r.getLong(0)}: hits $hits vs removed $rm")
    }
    // Independent replay: recompute the whole operator from the raw
    // fixture in plain Scala (grams → first-owner → position-set
    // subtraction) and pin full equality per doc.
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = docs.map { case (d, t) => d -> t.split(" ", -1) }.toMap
    val occ = toks.toSeq.flatMap { case (d, tl) =>
      if (tl.length >= 8)
        (0 to tl.length - 8).map(p => (d, p, tl.slice(p, p + 8)
          .mkString(" ")))
      else Seq.empty
    }
    val owners = occ.groupBy(_._3).collect {
      case (g, os) if os.map(_._1).distinct.size >= 2 =>
        g -> os.map(_._1).min
    }
    val expect = docs.map { case (d, _) =>
      val tl = toks(d)
      val markedP = occ.filter(o => o._1 == d &&
        owners.get(o._3).exists(_ != d)).map(_._2)
      val rp = markedP.flatMap(p => (p + 1) to (p + 8)).toSet
      val kept = tl.zipWithIndex.collect {
        case (tok, i) if !rp.contains(i + 1) => tok }
      d -> ((tl.length.toLong, markedP.size.toLong, rp.size.toLong,
        kept.mkString(" ")))
    }.toMap
    out.foreach { r =>
      val d = r.getLong(0)
      val got = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
        r.getAs[Long]("n_removed"), r.getAs[String]("dedup_text"))
      assert(got === expect(d), s"doc $d diverged from replay")
    }
    assert(out.exists(_.getAs[Long]("n_removed") > 0L),
      "fixture has no cross-doc shared 8-token span — every assertion " +
        "above was vacuously clean; lower w or pick another fixture")
  }

  test("bpe_train: independent replay of the 10-round merge selection") {
    // Re-derive the merge list with a from-scratch implementation over
    // the same top-1000 vocabulary and pin full equality — the fold's
    // census/argmax/merge loop verified against an independent coding.
    val vocab = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        split(col("text"), " ")).as("word"))
      .filter(org.apache.spark.sql.functions.length(col("word")) >= 1)
      .groupBy("word")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(1000)
      .collect()
    var state = vocab.map(r =>
      (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    val exp = scala.collection.mutable.ArrayBuffer[(Long, String, String,
      String, Long)]()
    for (round <- 1 to 10) {
      val cnt = scala.collection.mutable.HashMap[(String, String), Long]()
      state.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(x, y) =>
            cnt((x, y)) = cnt.getOrElse((x, y), 0L) + f
          case _ => ()
        }
      }
      if (cnt.nonEmpty) {
        val ((a, b), n) = cnt.toSeq.sortBy { case ((x, y), m) =>
          (-m, x, y) }.head
        exp += ((round.toLong, a, b, a + b, n))
        state = state.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var pending = syms.head
          syms.tail.foreach { x =>
            if (pending == a && x == b) pending = pending + x
            else { out += pending; pending = x }
          }
          out += pending
          (out.toVector, f)
        }
      }
    }
    val got = graft.operators.TextQueries.bpeTrain(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === exp.toSeq, "bpe_train diverged from independent replay")
    assert(got.nonEmpty, "fixture produced no merges — vacuous")
  }

  test("bpe_train: merge list is prefix-stable in the round count") {
    // Each round's argmax is a pure function of the working vocabulary
    // after the previous merges, so training deeper can only APPEND:
    // merges 1..k of any deeper run equal the k-round run's list
    // (round-14 law backing the configurable trainer depth — a
    // production run can extend a shallow vocabulary without
    // invalidating it).
    def merges(rounds: Int) = graft.operators.TextQueries
      .bpeTrainConfigured(spark, sfDir, rounds, 1000)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val deep = merges(14)
    val mid = merges(10)
    val shallow = merges(4)
    assert(deep.take(mid.size) === mid,
      "10-round merge list is not a prefix of the 14-round list")
    assert(mid.take(shallow.size) === shallow,
      "4-round merge list is not a prefix of the 10-round list")
    assert(shallow.size === 4 && mid.size === 10,
      "fixture exhausted pairs before the declared depth — vacuous")
  }

  test("eval_rouge: LCS fold replays an independent memoized LCS") {
    // Different algorithm (top-down memoized recursion) against the
    // operator's bottom-up DP — catches transcription slips in either.
    def lcsMemo(a: Array[String], b: Array[String]): Int = {
      val memo = scala.collection.mutable.HashMap[(Int, Int), Int]()
      def go(i: Int, j: Int): Int =
        if (i == 0 || j == 0) 0
        else memo.getOrElseUpdate((i, j),
          if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
          else math.max(go(i - 1, j), go(i, j - 1)))
      go(a.length, b.length)
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.TextQueries.evalRouge(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val a = docs(d).split(" ", -1).take(40)
      val b = docs(d + 1).split(" ", -1).take(40)
      val l = lcsMemo(a, b).toLong
      assert(r.getAs[Long]("lcs") === l, s"doc $d LCS")
      assert(r.getAs[Long]("n_cand") === a.length.toLong)
      assert(r.getAs[Long]("n_ref") === b.length.toLong)
      val f1 = r.getAs[Double]("rouge_f1")
      assert(f1 === graft.operators.IterOps.sparkRound(
        2.0 * l / (a.length + b.length), 6), s"doc $d F1")
      assert(f1 >= 0.0 && f1 <= 1.0)
    }
  }

  test("IterOps fold law: Bradley-Terry driver fold ≡ distributed MM") {
    // The round-13 bounded-frame iteration primitive's exactness
    // contract: the driver fold must transcribe the distributed
    // expression tree bit for bit (IterOps.sparkRound = Catalyst Round,
    // long sums order-independent). Full-row equality, not approximate.
    val fold = graft.operators.FeatureQueries
      .evalBradleyTerry(spark, sfDir).collect().toSeq
    val dist = graft.operators.FeatureQueries
      .evalBradleyTerryDistributed(spark, sfDir).collect().toSeq
    assert(fold === dist,
      "driver fold diverged from the distributed MM reference")
  }

  test("IterOps.sparkRound matches Catalyst round() on adversarial values") {
    import spark.implicits._
    // Half-way values, values whose shortest-decimal form differs from
    // their binary expansion, and the scales the fold uses (0, 9, 6).
    val xs = Seq(0.5, 1.5, 2.5, -0.5, -1.5, 0.285, 1.0050000000000001,
      12345.6789012345, 1e-9, 123456789.4999999, 0.0405, 2.675,
      5e-10, 1.0 / 3.0, 0.1 + 0.2)
    for (scale <- Seq(0, 4, 6, 9)) {
      val got = xs.map(graft.operators.IterOps.sparkRound(_, scale))
      val exp = xs.toDF("x")
        .select(round(col("x"), scale)).collect().map(_.getDouble(0)).toSeq
      assert(got === exp, s"scale=$scale: sparkRound diverged from " +
        "Catalyst Round")
    }
  }

  test("IterOps.collectBounded enforces the dimension bound loudly") {
    val big = Tables.lineitem(spark, sfDir).select("l_orderkey")
    val e = intercept[IllegalArgumentException] {
      graft.operators.IterOps.collectBounded(big, 10, "test frame")
    }
    assert(e.getMessage.contains("bounded-frame precondition violated"))
    // In-bounds frames come back whole.
    val ok = graft.operators.IterOps.collectBounded(
      Tables.nation(spark, sfDir), 100, "nation")
    assert(ok.length === 25)
  }

  test("align_margin: brute-force margin replay picks the same matches") {
    // From-scratch replay on collected embeddings: fused-loop cosine
    // (dot + both norms per index, the FloatVecCosine order), 4dp
    // rounding via sparkRound, top-4 best-first averages, ratio margin,
    // (margin DESC, id) argmax — the full pipeline re-derived without
    // Spark aggregates.
    import graft.operators.IterOps.sparkRound
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeIds = vecs.keys.filter(_ < 50).toSeq.sorted
    val candIds = vecs.keys.filter(_ >= 50).toSeq.sorted
    val score = (for (p <- probeIds; c <- candIds)
      yield (p, c) -> sparkRound(cos(vecs(p), vecs(c)), 4)).toMap
    def top4Units(ss: Seq[Double]): Long =
      ss.sorted(Ordering[Double].reverse).take(4)
        .map(v => sparkRound(v * 10000, 0).toLong).sum
    val fu = probeIds.map(p =>
      p -> top4Units(candIds.map(c => score((p, c))))).toMap
    val bu = candIds.map(c =>
      c -> top4Units(probeIds.map(p => score((p, c))))).toMap
    val exp = probeIds.map { p =>
      val best = candIds.map { c =>
        (sparkRound(score((p, c)) * 2
          / ((fu(p) + bu(c)).toDouble / 40000.0), 4), c)
      }.minBy { case (m, c) => (-m, c) }
      (p, best._2, best._1)
    }
    val got = SimilarityQueries.alignMargin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("margin")))
      .toSeq.sortBy(_._1)
    assert(got === exp, "align_margin diverged from brute-force replay")
    assert(got.size === probeIds.size, "one row per probe")
  }

  test("eval_chrf: independent char-ngram clipped-count replay") {
    import graft.operators.IterOps.sparkRound
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).replace(" ", "").take(200))
      .toMap
    val prs = docs.keys.filter(k => k < 50 && docs.contains(k + 1))
      .toSeq.sorted.map(k => (docs(k), docs(k + 1)))
    def cnt(s: String, n: Int): Map[String, Long] =
      if (s.length < n) Map.empty
      else s.sliding(n).toSeq.groupBy(identity)
        .map { case (g, o) => g -> o.size.toLong }
    val (ms, cs, rs) = (1 to 3).map { n =>
      val per = prs.map { case (c, r) =>
        val (cc, rc) = (cnt(c, n), cnt(r, n))
        val m = cc.keysIterator
          .map(g => math.min(cc(g), rc.getOrElse(g, 0L))).sum
        (m, cc.values.sum, rc.values.sum)
      }
      (per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum)
    }.unzip3
    val p = ((ms(0).toDouble / cs(0) + ms(1).toDouble / cs(1))
      + ms(2).toDouble / cs(2)) / 3
    val r = ((ms(0).toDouble / rs(0) + ms(1).toDouble / rs(1))
      + ms(2).toDouble / rs(2)) / 3
    val f = if (p + r > 0) 5.0 * p * r / (4.0 * p + r) else 0.0
    val row = TextQueries.evalChrf(spark, sfDir).collect().head
    assert(row.getLong(0) === prs.size.toLong)
    assert((3 to 5).map(row.getLong) === ms, "clipped matches")
    assert((6 to 8).map(row.getLong) === cs, "cand totals")
    assert((9 to 11).map(row.getLong) === rs, "ref totals")
    assert(row.getDouble(12) === sparkRound(p, 6), "chrp")
    assert(row.getDouble(13) === sparkRound(r, 6), "chrr")
    assert(row.getDouble(14) === sparkRound(f, 6), "chrf2")
  }

  test("eval_distinct_n: sliding-window replay and the de Bruijn bound") {
    import graft.operators.IterOps.sparkRound
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val got = TextQueries.evalDistinctN(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet === docs.keySet)
    got.foreach { r =>
      val tk = docs(r.getLong(0))
      def uniq(n: Int): Option[Long] =
        if (tk.size >= n)
          Some(tk.sliding(n).map(_.mkString(" ")).toSet.size.toLong)
        else None
      assert(r.getLong(1) === tk.size.toLong)
      for ((i, n) <- Seq(2 -> 1, 3 -> 2, 4 -> 3)) {
        val u = if (r.isNullAt(i)) None else Some(r.getLong(i))
        assert(u === uniq(n), s"doc ${r.getLong(0)} u$n")
        val ratio = if (r.isNullAt(i + 3)) None
          else Some(r.getDouble(i + 3))
        assert(ratio === uniq(n).map(x =>
          sparkRound(x.toDouble / (tk.size - (n - 1)), 4)),
          s"doc ${r.getLong(0)} distinct$n")
      }
      // A sequence visiting k distinct unigrams walks >= k-1 distinct
      // de Bruijn edges (bigrams).
      for ((u1, u2) <- uniq(1).zip(uniq(2)))
        assert(u2 >= u1 - 1, s"doc ${r.getLong(0)} de Bruijn bound")
    }
  }

}
