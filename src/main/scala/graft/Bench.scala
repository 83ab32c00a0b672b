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
  * The timed phase runs SPARK_GRAFT_BENCH_PASSES (default 5) full sweeps
  * and reports per-query MEDIANS over the min-spread CONSECUTIVE TRIPLE
  * of passes (round 12 — the round-11 verdict's fallback after three
  * rounds of official artifacts failed their own drift rule): on a
  * shared box a single multi-minute load event poisons one pass, and
  * with only 3 passes that poisoned pass sits inside every median. Five
  * passes give three consecutive windows; picking the one with the
  * smallest total spread drops up to two box events while keeping the
  * windows CONSECUTIVE (cherry-picking the 3 fastest of 5 would bias
  * low; a consecutive window is the same quiet-box regime the old
  * 3-pass run hoped to land in). The artifact stays self-auditing:
  * `pass_totals` lists ALL passes, `window` names the selected triple,
  * `pass_spread_pct`/`drift` describe the SELECTED window (what the
  * medians are computed from — the ≤2 % trust rule reads unchanged),
  * and `full_spread_pct` keeps the whole-run spread visible.
  *
  * LOAD-GATED ADMISSION (round 13 — all thirteen round-12 runs were
  * poisoned by an external tenant; passive windowing is exhausted):
  * each timed pass is ADMITTED only when the box is quiet. Passive
  * stage, both paths logged and stamped: (a) 1-min /proc/loadavg <
  * SPARK_GRAFT_BENCH_LOAD_GATE (default 1.5) — the direct "nobody
  * else is running on this VM" read; (b) five consecutive 1-second
  * /proc/stat samples whose NON-SELF busy-CPU count is under the same
  * gate — this admits while our OWN previous pass's load contribution
  * is still decaying (1-min load has a 60 s time constant; waiting
  * out our own decay would burn ~3 min per gate for no information).
  * ACTIVE stage: the passive gates CANNOT see a hypervisor neighbor —
  * steal time is only charged while our vCPUs are runnable, so an
  * idle-box probe reads quiet no matter how loaded the host is (the
  * two first round-13 runs: admission clean, then 370-650 CPU-s of
  * steal inside the pass). A 2 s all-core busy-spin [[stealProbe]]
  * demands the cpus and measures what the host actually delivers;
  * admission additionally requires steal < gate/2 (quiet-slot floor
  * measured ~0.3-0.4 stolen cpus, noisy slot 1.0-2.3). The spin-wait
  * is bounded (SPARK_GRAFT_BENCH_GATE_TIMEOUT_S, default 600 s/pass)
  * and a timeout admission is stamped as such — the artifact never
  * hides that a pass started dirty. Set SPARK_GRAFT_BENCH_LOAD_GATE=
  * off to disable (dev runs on a box you are deliberately sharing
  * with a compile).
  *
  * RETRY-ON-CONTAMINATION: admission probing is necessary but not
  * sufficient — the neighbor bursts MID-pass (run 3: every admission
  * probed 0.01-0.07 stolen cpus, then passes 3-5 lost 258-683 CPU-s
  * while the clean passes measured ~12). A pass whose steal RATE
  * exceeds gate/6 (default 0.25 stolen cpus; clean floor ~0.05,
  * poisoned ≥ ~1 — two orders apart) is discarded and re-run, bounded
  * by a GLOBAL retry budget of SPARK_GRAFT_BENCH_PASS_RETRIES
  * (default 2) × passes, shared across passes (a quiet-then-noisy run
  * spends it where the noise is; once exhausted, passes record
  * as-measured and the artifact self-flags). Every discarded attempt
  * is stamped in `pass_discarded` (total, steal) — contamination
  * control with the exclusion criterion external, objective, and
  * auditable.
  *
  * PER-PASS TENANT ATTRIBUTION: around each timed pass the harness
  * reads aggregate /proc/stat busy jiffies and /proc/self/stat
  * utime+stime; `pass_ext_cpu_s[i]` = (Δbusy_total − Δself) / HZ is
  * the CPU-seconds an external tenant burned DURING pass i, and
  * `pass_steal_s` / `pass_iowait_s` split the diagnosis: steal ≈ ext
  * means a host-level neighbor (unfixable from here — wait for a
  * quiet slot), process-busy means something on this VM, iowait means
  * shared-disk contention. The difference between "self-flagged,
  * cause unknown" and "self-flagged, neighbor VM stole 559 CPU-s in
  * pass 2". */
object Bench {
  /** 1-minute load average; −1.0 when /proc is unreadable (non-Linux
    * dev box) — gating degrades to immediate admission, stamped. */
  private def load1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** First-line /proc/stat fields (user nice system idle iowait irq
    * softirq steal …); empty when unreadable. */
  private def statFields(): Array[Long] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val line = try src.getLines().next() finally src.close()
      line.trim.split("\\s+").drop(1).map(_.toLong)
    } catch { case _: Throwable => Array.empty[Long] }

  /** Aggregate busy jiffies (all CPUs): total minus idle minus iowait —
    * NOTE this includes STEAL (field 8), so ext-CPU attribution catches
    * hypervisor neighbors as well as same-VM processes; [[stealJiffies]]
    * and [[iowaitJiffies]] split the diagnosis (round 13: the 11:00-slot
    * run measured idle-box steal ~0.6 CPUs — a host-level tenant that
    * same-VM process accounting would never see). −1 when unreadable. */
  private def busyJiffies(): Long = {
    val f = statFields()
    if (f.isEmpty) -1L
    else f.sum - f(3) - (if (f.length > 4) f(4) else 0L)
  }

  /** Hypervisor steal jiffies (runnable but not scheduled on the host).
    * −1 when unreadable. */
  private def stealJiffies(): Long = {
    val f = statFields()
    if (f.length > 7) f(7) else -1L
  }

  /** I/O-wait jiffies — shared-disk contention shows here and in wall
    * time while leaving CPU attribution clean. −1 when unreadable. */
  private def iowaitJiffies(): Long = {
    val f = statFields()
    if (f.length > 4) f(4) else -1L
  }

  /** This JVM's utime+stime jiffies (/proc/self/stat fields 14/15,
    * 1-indexed; comm is parenthesized and may contain spaces, so parse
    * from the LAST ')'). −1 when unreadable. */
  private def selfJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/stat")
      val line = try src.mkString finally src.close()
      val rest = line.substring(line.lastIndexOf(')') + 2).split("\\s+")
      // rest(0) is field 3 (state); utime/stime are fields 14/15.
      rest(11).toLong + rest(12).toLong
    } catch { case _: Throwable => -1L }

  private val HZ = 100.0 // USER_HZ; Linux fixes this at 100 for /proc

  /** ACTIVE steal probe (round 13): hypervisor steal is only accounted
    * while our vCPUs are RUNNABLE — an idle box can never see the
    * co-located neighbor, which is exactly why both round-13 passive
    * gates admitted passes that then lost 370-650 CPU-s to steal
    * (pass_steal_s ≈ pass_ext_cpu_s in the 11:00-slot artifacts; iowait
    * ~1.5 s — the tenant is a neighboring VM, not a process here). The
    * probe DEMANDS the cpus for `ms` (busy-spin on all of them) and
    * returns the steal rate the host actually charges under load —
    * stolen CPUs, comparable to the loadavg gate value. */
  private def stealProbe(cpus: Int, ms: Long): Double = {
    val st0 = stealJiffies()
    if (st0 < 0) return -1.0
    val t0 = System.nanoTime()
    val end = t0 + ms * 1000000L
    val threads = (1 to cpus).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (System.nanoTime() < end) { x += 1 }
        if (x == Long.MinValue) println(x) // keep the loop un-elidable
      })
      t.setDaemon(true); t.start(); t
    }
    threads.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    (stealJiffies() - st0).max(0L) / HZ / dt
  }

  /** Spin-wait (bounded) until the box is quiet; returns
    * (loadAtAdmission, stealProbeCpus, waitedSeconds, admittedBy).
    * admittedBy ∈ load+steal | instant+steal | timeout | unreadable |
    * off. Two-stage admission: (1) the passive gates (loadavg, or five
    * consecutive quiet non-self busy samples while our own load residue
    * decays) catch same-VM contention; (2) the ACTIVE [[stealProbe]]
    * catches the hypervisor neighbor the passive gates cannot see —
    * both must agree before a pass starts. */
  private def admitPass(gate: Double, timeoutS: Int,
      pass: Int): (Double, Double, Double, String) = {
    val t0 = System.nanoTime()
    def waited = (System.nanoTime() - t0) / 1e9
    var quietStreak = 0
    var iter = 0
    while (true) {
      val l = load1()
      if (l < 0) return (l, -1.0, waited, "unreadable")
      var passive: String = null
      if (l < gate) passive = "load"
      else {
        // Non-self instantaneous busy CPUs over a 1 s sample: admits
        // while our own just-finished pass's loadavg residue decays.
        val b0 = busyJiffies(); val s0 = selfJiffies()
        Thread.sleep(1000)
        val db = busyJiffies() - b0; val ds = selfJiffies() - s0
        val extBusyCpus =
          if (b0 < 0 || s0 < 0) Double.MaxValue
          else (db - ds).max(0L) / HZ
        quietStreak = if (extBusyCpus < gate) quietStreak + 1 else 0
        if (quietStreak >= 5) passive = "instant"
      }
      if (passive != null) {
        val cpus = Runtime.getRuntime.availableProcessors()
        val sp = stealProbe(cpus, 2000)
        // Probe threshold: the measured quiet-slot steal floor is
        // ~0.3-0.4 CPUs and the noisy slot runs 1.0-2.3; half the gate
        // (default 0.75) separates them.
        if (sp < 0 || sp < gate / 2) return (l, sp, waited, passive + "+steal")
        quietStreak = 0 // neighbor active: re-earn the passive quiet too
        System.err.println(f"[bench] pass $pass gate: steal probe " +
          f"$sp%.2f cpus (>= ${gate / 2}%.2f), waiting")
      }
      if (waited > timeoutS) return (l, -1.0, waited, "timeout")
      iter += 1
      if (iter % 15 == 0)
        System.err.println(f"[bench] pass $pass gate: load1=$l%.2f " +
          f"waited ${waited}%.0f s")
      Thread.sleep(1000)
    }
    throw new IllegalStateException("unreachable")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val passes =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt.max(1)
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
    // Per-query, PER-PASS times (None = that pass crashed for that
    // query). A crashed run must not masquerade as a (misleadingly
    // fast) timing — it is simply absent. A query with zero successful
    // runs reports null and lands in "errors"; one that failed SOME
    // passes still reports its median but is called out in "flaky" —
    // intermittent failures must not hide behind a clean artifact.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, Array[Option[Double]]]()
    names.foreach(n => times(n) = Array.fill[Option[Double]](passes)(None))
    val gateEnv = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_GATE", "1.5")
    val gateOn = !Set("off", "0", "false").contains(gateEnv.toLowerCase)
    val gate = if (gateOn) gateEnv.toDouble else 0.0
    val gateTimeoutS = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_GATE_TIMEOUT_S", "600").toInt
    // Per-pass admission + tenant-attribution records, JSON-ready.
    val gateRecs = scala.collection.mutable.ArrayBuffer[String]()
    val extCpu = scala.collection.mutable.ArrayBuffer[Double]()
    val selfCpu = scala.collection.mutable.ArrayBuffer[Double]()
    val stealS = scala.collection.mutable.ArrayBuffer[Double]()
    val iowaitS = scala.collection.mutable.ArrayBuffer[Double]()
    // RETRY-ON-CONTAMINATION (round 13, run-3 lesson): the steal probe
    // admits at the neighbor's idle floor (0.01-0.07 cpus measured) and
    // the neighbor then bursts MID-pass (683 CPU-s inside pass 3 of a
    // run whose every admission probed clean). A pass whose measured
    // steal rate exceeds the threshold is a CORRUPTED TRIAL — the
    // exclusion criterion is external, objective, and stamped below
    // (`pass_discarded`), so discarding is contamination control, not
    // cherry-picking: the clean floor reads ~0.05 stolen cpus and a
    // poisoned pass ≥ ~1, two orders apart. Retries are bounded
    // (SPARK_GRAFT_BENCH_PASS_RETRIES per pass, default 2, shared
    // global budget of the same size × passes) — a neighbor that never
    // relents still yields a finished, self-flagged artifact.
    val stealRateMax = gate / 6 // 1.5 → 0.25 stolen cpus
    val maxRetries = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_PASS_RETRIES", "2").toInt.max(0)
    var retryBudget = maxRetries * passes
    val discarded = scala.collection.mutable.ArrayBuffer[String]()
    val passTotals = (1 to passes).map { pass =>
      var recorded = -1.0
      var done = false
      while (!done) {
        val (admitLoad, admitSteal, waitS, admitBy) =
          if (gateOn) admitPass(gate, gateTimeoutS, pass)
          else (load1(), -1.0, 0.0, "off")
        if (admitBy == "timeout")
          System.err.println(f"[bench] pass $pass admitted by TIMEOUT " +
            f"at load1=$admitLoad%.2f after $waitS%.0f s — starts dirty")
        val b0 = busyJiffies(); val s0 = selfJiffies()
        val st0 = stealJiffies(); val io0 = iowaitJiffies()
        val t0 = System.nanoTime()
        val attempt = scala.collection.mutable
          .Map[String, Double]()
        SparkEntry.queries.foreach { case (name, fn) =>
          val q0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            attempt(name) = (System.nanoTime() - q0) / 1e9
          } catch { case t: Throwable =>
            System.err.println(s"[bench] $name failed: ${t.getMessage}")
          }
          // Outside the per-query timer: each invocation's dead
          // localCheckpoint blocks must not become the NEXT query's
          // memory pressure (the round-7 drift — see releaseTransient).
          Harness.releaseTransient(spark)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val db = busyJiffies() - b0; val ds = selfJiffies() - s0
        val dst = if (st0 < 0) -1.0 else (stealJiffies() - st0) / HZ
        val stealRate = if (dst < 0) -1.0 else dst / wall
        val dirty = gateOn && stealRate > stealRateMax && retryBudget > 0
        if (dirty) {
          retryBudget -= 1
          discarded += f"""{"pass":$pass,"total":$wall%.1f,""" +
            f""""steal_s":$dst%.1f,"steal_cpus":$stealRate%.2f}"""
          System.err.println(f"[bench] pass $pass DISCARDED: steal " +
            f"$dst%.1f CPU-s ($stealRate%.2f cpus > $stealRateMax%.2f)" +
            f" — retrying (${retryBudget} retries left)")
        } else {
          attempt.foreach { case (n, t) => times(n)(pass - 1) = Some(t) }
          gateRecs += f"""{"load":$admitLoad%.2f,""" +
            f""""steal":$admitSteal%.2f,"wait_s":$waitS%.1f,""" +
            f""""by":"$admitBy"}"""
          selfCpu += (if (s0 < 0) -1.0 else math.rint(ds / HZ * 10) / 10)
          extCpu += (if (b0 < 0 || s0 < 0) -1.0
                     else math.rint((db - ds).max(0L) / HZ * 10) / 10)
          stealS += (if (dst < 0) -1.0 else math.rint(dst * 10) / 10)
          iowaitS += (if (io0 < 0) -1.0
                      else math.rint((iowaitJiffies() - io0) / HZ * 10)
                        / 10)
          recorded = wall
          done = true
        }
      }
      recorded
    }
    def spreadOf(ts: Seq[Double]): Double =
      if (ts.size < 2 || ts.min <= 0) 0.0
      else (ts.max - ts.min) / ts.min * 100
    // Select the min-spread consecutive window of (up to) 3 passes; the
    // medians below are computed from it alone.
    val winLen = passes.min(3)
    val winStart = (0 to passes - winLen)
      .minBy(i => spreadOf(passTotals.slice(i, i + winLen)))
    val winTotals = passTotals.slice(winStart, winStart + winLen)
    def winTimes(k: String): Seq[Double] =
      times(k).slice(winStart, winStart + winLen).flatten.toSeq
    val qs = names.map { k =>
      val v = winTimes(k)
      s"\"" + k + "\":" +
        (if (v.nonEmpty) Harness.median(v).toString else "null")
    }.mkString("{", ",", "}")
    // Raw per-pass times for ALL passes (nulls where crashed) — the
    // full record a reader audits the window selection against.
    val runs = names.map { k =>
      s"\"" + k + "\":" + times(k).map(_.map(_.toString).getOrElse("null"))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // "errors" is window-scoped like the medians: a query with NO
    // successful run inside the selected window reports a null median
    // and silently vanishes from the headline total — it must land in
    // "errors" even if some pass OUTSIDE the window succeeded
    // (round-12 review: the old all-passes test let such a query read
    // as a performance improvement). "flaky" = measured in the window
    // but failed at least one pass somewhere — disjoint from errors.
    val errorNames = names.filter(k => winTimes(k).isEmpty)
    val errors = errorNames.map(k => s"\"$k\"").mkString("[", ",", "]")
    val flaky = names
      .filter(k => winTimes(k).nonEmpty && times(k).exists(_.isEmpty))
      .map(k => s"\"$k\"").mkString("[", ",", "]")
    val total = names.flatMap { k =>
      val v = winTimes(k)
      if (v.nonEmpty) Some(Harness.median(v)) else None
    }.sum
    // Drift verdict (round-10 ask 2, re-scoped round 12 to the selected
    // window): BASELINE.md's rule says pass totals spreading >2 % mean
    // a noisy box whose medians should not be trusted as a baseline.
    // Verdict from the UNROUNDED spread (rounding first misclassified
    // the [1.95, 2.0)% band — round-11 review), strict-> per the rule's
    // wording ("spread >2% means noisy"); round only for display. A
    // run where EVERY query errored out of the window is degenerate —
    // stamp "degenerate", never the healthiest verdict (round-11
    // advice; round-12 review: the old pass-total<=0 test was
    // unreachable — failing queries still burn positive wall time, so
    // the check must read the measurements, not the clock).
    val degenerate = names.nonEmpty && errorNames.size == names.size
    val spreadRaw = spreadOf(winTotals)
    val spreadPct = math.rint(spreadRaw * 10) / 10
    val fullSpreadPct = math.rint(spreadOf(passTotals) * 10) / 10
    val drift =
      if (degenerate) "degenerate"
      else if (spreadRaw <= 2.0) "ok"
      else "noisy_box"
    val driftJson =
      s""""pass_spread_pct":$spreadPct,"full_spread_pct":$fullSpreadPct,""" +
        s""""window":[${winStart + 1},${winStart + winLen}],""" +
        s""""drift":"$drift",""" +
        s""""load_gate":${if (gateOn) gate.toString else "null"},""" +
        s""""pass_gate":${gateRecs.mkString("[", ",", "]")},""" +
        s""""pass_ext_cpu_s":${extCpu.mkString("[", ",", "]")},""" +
        s""""pass_self_cpu_s":${selfCpu.mkString("[", ",", "]")},""" +
        s""""pass_steal_s":${stealS.mkString("[", ",", "]")},""" +
        s""""pass_iowait_s":${iowaitS.mkString("[", ",", "]")},""" +
        s""""pass_discarded":${discarded.mkString("[", ",", "]")}"""
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
