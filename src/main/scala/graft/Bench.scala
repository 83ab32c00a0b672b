package graft

/** Benchmark main: times every declared query (count-materialized) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Two untimed warmup passes run first. (1) sf0.001: JVM JIT,
  * whole-stage-codegen compilation, and Catalyst caches warm up on tiny
  * data. (2) The TARGET sf dir itself: OS page cache for the sf0.1
  * parquet, staged fixtures (bucketed/shingle layouts), and stream
  * checkpoints all reach steady state BEFORE the first timed pass.
  * Without (2), round 5/6 pass totals slid 176 -> 153 -> 118 s — the
  * first timed pass paid cold file cache + one-time staging, so
  * per-query medians carried first-pass noise and round-over-round
  * deltas on ~1 s queries were unreadable. Steady-state is the regime
  * that matters for the 100 TB mandate (on a long-lived cluster, codegen
  * and the working set are always warm).
  *
  * The timed phase runs SPARK_GRAFT_BENCH_PASSES (default 3) full sweeps
  * and reports the per-query MEDIAN: single-shot timings on a shared box
  * are dominated by run-to-run variance (measured repeatedly across
  * rounds — untouched queries swinging ±0.5 s), so round-over-round
  * deltas gate on medians, with the raw per-pass times kept in the
  * artifact for spread inspection. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val passes =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val spark = Harness.session()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      Harness.releaseTransient(spark)
    }
    // Warmup (2): one untimed sweep at the TARGET scale factor.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      Harness.releaseTransient(spark)
    }
    // Per-query successful times across passes. A crashed run must not
    // masquerade as a (misleadingly fast) timing — it is simply absent.
    // A query with zero successful runs reports null and lands in
    // "errors"; one that failed SOME passes still reports its median but
    // is called out in "flaky" — intermittent failures must not hide
    // behind a clean artifact.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val passTotals = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (name, fn) =>
        val q0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times(name) = times(name) :+ (System.nanoTime() - q0) / 1e9
        } catch { case t: Throwable =>
          System.err.println(s"[bench] $name failed: ${t.getMessage}")
        }
        // Outside the per-query timer: each invocation's dead
        // localCheckpoint blocks must not become the NEXT query's
        // memory pressure (the round-7 drift — see releaseTransient).
        Harness.releaseTransient(spark)
      }
      (System.nanoTime() - t0) / 1e9
    }
    val qs = names.map { k =>
      val v = times(k)
      s"\"" + k + "\":" +
        (if (v.nonEmpty) Harness.median(v).toString else "null")
    }.mkString("{", ",", "}")
    val runs = names.map { k =>
      s"\"" + k + "\":" + times(k).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errors = names.filter(times(_).isEmpty).map(k => s"\"$k\"")
      .mkString("[", ",", "]")
    val flaky = names
      .filter(k => times(k).nonEmpty && times(k).size < passes)
      .map(k => s"\"$k\"").mkString("[", ",", "]")
    val total = names.flatMap(k =>
      if (times(k).nonEmpty) Some(Harness.median(times(k))) else None).sum
    // Drift verdict (round-10 ask 2): BASELINE.md's rule says pass
    // totals spreading >2 % mean a noisy box whose medians should not
    // be trusted as a baseline — BENCH_r10's official artifact spread
    // 15 % and needed the builder's clean runs cross-referenced to
    // read. Stamp the verdict INTO the artifact so a bad box is
    // self-evident: spread = (max − min)/min over pass totals.
    // Verdict from the UNROUNDED spread (rounding first misclassified
    // the [1.95, 2.0)% band — round-11 review), strict-> per the rule's
    // wording ("spread >2% means noisy"); round only for display. A
    // non-positive pass total with ≥2 passes means every query errored
    // (a degenerate run, not a quiet box) — stamp "degenerate", never
    // the healthiest verdict (round-11 advice).
    val degenerate = passTotals.size >= 2 && passTotals.min <= 0
    val spreadRaw =
      if (passTotals.size < 2 || passTotals.min <= 0) 0.0
      else (passTotals.max - passTotals.min) / passTotals.min * 100
    val spreadPct = math.rint(spreadRaw * 10) / 10
    val drift =
      if (degenerate) "degenerate"
      else if (spreadRaw <= 2.0) "ok"
      else "noisy_box"
    val driftJson = s""""pass_spread_pct":$spreadPct,"drift":"$drift""""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""passes":$passes,"runs":$runs,""" +
        s""""pass_totals":${passTotals.mkString("[", ",", "]")},""" +
        s"""$driftJson,""" +
        s""""errors":$errors,"flaky":$flaky,"sf":"$sfDir"}"""
    // The per-query maps make the full line long enough that a tail-only
    // stdout capture can cut off its head (where the headline total
    // lives). Persist the full line to an SF-KEYED file (concurrent or
    // consecutive runs at different scale factors must not clobber each
    // other), print it, and end stdout with a SHORT self-contained total
    // line — marked "abridged" so a consumer grepping for the metric
    // never double-counts or mistakes it for the full record.
    val sfKey = new java.io.File(sfDir).getName
    try {
      val w = new java.io.PrintWriter(s"/tmp/graft-bench-$sfKey.json")
      try w.println(full) finally w.close()
    } catch { case _: java.io.IOException => () }
    println(full)
    println(s"""{"metric":"total","value":$total,"unit":"sec","abridged":true,"passes":$passes,"n_queries":${names.size},$driftJson,"errors":$errors,"flaky":$flaky,"sf":"$sfDir"}""")
    spark.stop()
  }
}
