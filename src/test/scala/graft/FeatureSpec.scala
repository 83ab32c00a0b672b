package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FeatureQueries

/** Semantic invariants for the feature-engineering / eval / DP-release
  * family (SURVEY §2.8) beyond the DuckDB hash oracle: shrinkage
  * direction, indicator exclusivity, bin containment, curriculum
  * density, and noise reproducibility.
  */
class FeatureSpec extends AnyFunSuite with SparkFixture {

  test("q_feature_target_encode shrinks every cell TOWARD the prior") {
    val cells = FeatureQueries.featureTargetEncode(spark, sfDir).collect()
    assert(cells.nonEmpty)
    // Recompute the prior from the output itself: weighted mean of cells.
    val gsum = cells.map(r => r.getAs[Double]("mean_cents")
      * r.getAs[Long]("n")).sum
    val gn = cells.map(_.getAs[Long]("n")).sum
    val prior = gsum / gn
    cells.foreach { r =>
      val (mean, enc) =
        (r.getAs[Double]("mean_cents"), r.getAs[Double]("enc_cents"))
      // enc lies strictly between the raw mean and the prior (or equals
      // both when they coincide), and never overshoots either bound.
      val (lo, hi) = (math.min(mean, prior), math.max(mean, prior))
      assert(enc >= lo - 1e-6 && enc <= hi + 1e-6,
        s"enc $enc escaped [$lo, $hi] (mean=$mean prior=$prior)")
      // Smaller cells shrink harder: weight on the prior is m/(n+m).
      val n = r.getAs[Long]("n")
      val expected = (n * mean + 10.0 * prior) / (n + 10.0)
      assert(math.abs(enc - expected) < 0.01,
        s"enc $enc != closed form $expected")
    }
  }

  test("q_feature_onehot: exactly one indicator fires; freq sums to 1") {
    val out = FeatureQueries.featureOnehot(spark, sfDir).collect()
    assert(out.length === Tables.customer(spark, sfDir).count())
    val indCols = Seq("is_automobile", "is_building", "is_furniture",
      "is_household", "is_machinery", "is_other")
    out.foreach { r =>
      val hot = indCols.map(c => r.getAs[Int](c)).sum
      assert(hot === 1, s"one-hot row fired $hot indicators")
    }
    // seg_freq is constant per segment and the per-SEGMENT values sum
    // to 1 (two segments may share a frequency — key by the indicator
    // that fired, not by the value).
    val bySeg = out.groupBy(r => indCols.find(c => r.getAs[Int](c) == 1).get)
    bySeg.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("seg_freq")).distinct.length === 1,
        "frequency must be constant within a segment")
    }
    val sum = bySeg.map(_._2.head.getAs[Double]("seg_freq")).sum
    assert(math.abs(sum - 1.0) < 1e-4,
      s"segment frequencies must partition unity: $sum")
  }

  test("q_eval_calibration: mean_pred inside its own bin; gap replays") {
    val out = FeatureQueries.evalCalibration(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (bin, mp, rate, gap) = (r.getAs[Long]("bin"),
        r.getAs[Double]("mean_pred"), r.getAs[Double]("rate"),
        r.getAs[Double]("gap"))
      assert(bin >= 0 && bin <= 9)
      // The basis-point floor can sit up to 1e-4 under the bin floor.
      assert(mp >= bin / 10.0 - 1e-4 && mp < (bin + 1) / 10.0 + 1e-4,
        s"bin $bin mean_pred $mp outside its bin")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(gap - math.abs(mp - rate)) < 2e-6)
    }
  }

  test("q_curriculum_order: dense 1..100 positions, stages monotone") {
    val out = FeatureQueries.curriculumOrder(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("pos"))
    val total = Tables.documents(spark, sfDir).count()
    assert(out.length === math.min(100L, total).toInt)
    assert(out.map(_.getAs[Long]("pos")).toSeq ===
      (1L to out.length).toSeq, "positions must be dense from 1")
    val stages = out.map(_.getAs[Int]("stage"))
    assert(stages.zip(stages.tail).forall { case (a, b) => b >= a },
      "curriculum must never regress to an earlier stage")
    // Stage assignment honors the declared thresholds.
    out.foreach { r =>
      val (st, nc) = (r.getAs[Int]("stage"), r.getAs[Long]("n_chars"))
      val want = if (nc < 150) 1 else if (nc < 300) 2 else 3
      assert(st === want)
    }
  }

  test("q_dp_laplace: reproducible noise; released = count + noise") {
    val a = FeatureQueries.dpLaplace(spark, sfDir).collect()
    val b = FeatureQueries.dpLaplace(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "the RNG-free mechanism must reproduce bit-identically")
    assert(a.nonEmpty)
    a.foreach { r =>
      val (n, noise, rel) = (r.getAs[Long]("n"),
        r.getAs[Double]("noise"), r.getAs[Double]("released"))
      assert(math.abs(rel - n - noise) < 2e-4,
        "released must be the true count plus the declared noise")
      assert(!noise.isNaN && !noise.isInfinite)
    }
    // Laplace(1) noise: most draws are small, none should be wild at
    // the md5-uniform's resolution (|u-1/2| >= 2^-33 => |noise| <= 23).
    assert(a.forall(r => math.abs(r.getAs[Double]("noise")) < 23.0))
  }

  test("q_feature_woe: counts conserve, WOE sign tracks share ratio") {
    val out = graft.operators.FeatureQueries.featureWoe(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val nCust = Tables.customer(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_cust")).sum == nCust)
    val tp = out.map(_.getAs[Long]("pos")).sum.toDouble
    val tn = out.map(_.getAs[Long]("neg")).sum.toDouble
    val ivTotals = out.map(_.getAs[Double]("iv_total")).distinct
    assert(ivTotals.length == 1, "iv_total is one global number")
    assert(ivTotals.head >= -1e-9)
    var ivSum = 0.0
    for (r <- out) {
      val (pos, neg) = (r.getAs[Long]("pos"), r.getAs[Long]("neg"))
      val woe = r.getAs[Double]("woe")
      val expect = math.log(((pos + 0.5) / tp) / ((neg + 0.5) / tn))
      assert(math.abs(woe - expect) < 1e-5, s"woe of ${r.getString(0)}")
      // IV contributions are products of same-sign factors.
      assert(r.getAs[Double]("iv_term") >= -1e-4)
      ivSum += r.getAs[Double]("iv_term")
    }
    assert(math.abs(ivSum - ivTotals.head) < 1e-4)
  }

  test("q_eval_brier: decomposition is coherent and replays exactly") {
    val r = graft.operators.FeatureQueries.evalBrier(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n")
    val brier = r.getAs[Double]("brier")
    val unc = r.getAs[Double]("uncertainty")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    assert(brier >= 0 && brier <= 1)
    assert(rel >= 0 && res >= -1e-9)
    assert(res <= unc + 1e-6, "resolution cannot exceed uncertainty")
    assert(math.abs(r.getAs[Double]("brier_decomp") - (unc - res + rel))
      < 2e-6)
    assert(math.abs(r.getAs[Double]("decomp_gap")
      - (brier - (unc - res + rel))) < 2e-6)
    // Row-level Brier replay from the raw scorer.
    val raw = Tables.embeddings(spark, sfDir)
      .select("embedding", "label").collect()
    val terms = raw.map { row =>
      val x = row.getSeq[Float](0).head.toDouble
      val p = (x / (1.0 + math.abs(x)) + 1.0) / 2.0
      val y = if (row.getInt(1) % 2 == 1) 1L else 0L
      val bp = math.floor(p * 10000).toLong
      val diff = bp - y * 10000L
      diff * diff
    }
    assert(n == raw.length)
    assert(math.abs(brier - terms.sum.toDouble / (n * 1.0e8)) < 1e-6)
  }
}
