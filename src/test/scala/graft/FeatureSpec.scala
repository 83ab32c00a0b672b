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
}
