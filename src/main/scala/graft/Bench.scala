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
  * of completed passes (round 12): on a shared box a single multi-minute
  * load event poisons one pass, and with only 3 passes that poisoned
  * pass sits inside every median. Five passes give three consecutive
  * windows; picking the one with the smallest total spread drops up to
  * two box events while keeping the windows CONSECUTIVE (cherry-picking
  * the 3 fastest of 5 would bias low). The artifact stays self-auditing:
  * `pass_totals` lists ALL completed passes, `window` names the selected
  * triple, `pass_spread_pct`/`drift` describe the SELECTED window, and
  * `full_spread_pct` keeps the whole-run spread visible.
  *
  * ARTIFACT DELIVERY GUARANTEE (round 14 — the round-13 run died at
  * rc 124 with NOTHING in the tail but gate spam; a fully-correct
  * engine scored zero because the artifact was written only at run
  * end). Three layers, any one of which suffices:
  *   (a) the run is BOUNDED: all admission waiting draws from ONE
  *       run-wide budget (SPARK_GRAFT_BENCH_GATE_BUDGET_S, default
  *       180 s); once spent, every later pass admits immediately,
  *       stamped "budget". A run-wide wall-clock DEADLINE
  *       (SPARK_GRAFT_BENCH_DEADLINE_S, default 2700 s of Bench-main
  *       time; the round-12 full official run fit in 3214 s of sbt
  *       time INCLUDING compile) stops scheduling further passes or
  *       retries when the estimated next-pass cost would cross it —
  *       the artifact then reports the completed passes, stamped
  *       `"passes_done"` < `"passes"`.
  *   (b) the artifact is INCREMENTAL: after every completed pass the
  *       full + abridged JSON (with `"partial":true`) is rewritten to
  *       /tmp/graft-bench-<sf>.json and printed, so a kill between
  *       passes leaves the latest state in the stdout tail.
  *   (c) a JVM SHUTDOWN HOOK prints the latest abridged partial line
  *       on SIGTERM (`timeout` sends SIGTERM first), so even a kill
  *       MID-pass ends the tail with a parseable artifact rather than
  *       Spark warning spew.
  * Purity machinery (gates, probes, retries) only ever trades within
  * these bounds — existence beats purity.
  *
  * LOAD-GATED ADMISSION (round 13 — all thirteen round-12 runs were
  * poisoned by an external tenant; passive windowing is exhausted):
  * each timed pass is ADMITTED only when the box is quiet. Passive
  * stage, both paths logged and stamped: (a) 1-min /proc/loadavg <
  * SPARK_GRAFT_BENCH_LOAD_GATE (default 1.5) — the direct "nobody
  * else is running on this VM" read; (b) five consecutive 1-second
  * /proc/stat samples whose NON-SELF busy-CPU count is under the same
  * gate — this admits while our OWN previous pass's load contribution
  * is still decaying (1-min load has a 60 s time constant). ACTIVE
  * stage: the passive gates CANNOT see a hypervisor neighbor — steal
  * time is only charged while our vCPUs are runnable, so an idle-box
  * probe reads quiet no matter how loaded the host is. A 2 s all-core
  * busy-spin [[stealProbe]] demands the cpus and measures what the
  * host actually delivers; admission additionally requires probed
  * steal < SPARK_GRAFT_BENCH_STEAL_PROBE_GATE (default 0.75 stolen
  * cpus — its own knob since round 14; quiet-slot floor measured
  * ~0.3-0.4, noisy slot 1.0-6.0). Failed probes BACK OFF
  * exponentially (2,4,8,16,30 s cap) and re-probe for only 1 s —
  * round 13's fixed-cadence all-core spins burned ~20 CPU-min/pass
  * heating the box they were measuring. Set
  * SPARK_GRAFT_BENCH_LOAD_GATE=off to disable gating entirely.
  *
  * RETRY-ON-CONTAMINATION: admission probing is necessary but not
  * sufficient — the neighbor bursts MID-pass (round-13 run 3: every
  * admission probed 0.01-0.07 stolen cpus, then passes 3-5 lost
  * 258-683 CPU-s while clean passes measured ~12). A pass whose steal
  * RATE exceeds SPARK_GRAFT_BENCH_STEAL_DISCARD (default 0.25 stolen
  * cpus — its own knob since round 14; clean floor ~0.05, poisoned
  * ≥ ~1, two orders apart) is discarded and re-run, bounded by a
  * GLOBAL run-total retry budget of SPARK_GRAFT_BENCH_PASS_RETRIES
  * (default 4 — a flat total since round 14; the round-13 per-pass
  * multiplier allowed 10, enough for retries alone to out-wait the
  * external driver) AND by the run deadline. Every discarded attempt is
  * stamped in `pass_discarded` — contamination control with the
  * exclusion criterion external, objective, and auditable.
  *
  * PER-PASS TENANT ATTRIBUTION: around each timed pass the harness
  * reads aggregate /proc/stat busy jiffies and /proc/self/stat
  * utime+stime; `pass_ext_cpu_s[i]` = (Δbusy_total − Δself) / HZ is
  * the CPU-seconds an external tenant burned DURING pass i, and
  * `pass_steal_s` / `pass_iowait_s` split the diagnosis: steal ≈ ext
  * means a host-level neighbor (unfixable from here), process-busy
  * means something on this VM, iowait means shared-disk contention. */
object Bench {
  /** Parse an env var as a Double with a CLEAR error — round-13 advice:
    * a typo'd knob must fail loudly at startup, not throw a bare
    * NumberFormatException mid-run (or worse, silently shift a derived
    * threshold). */
  private def envDouble(name: String, default: Double): Double =
    sys.env.get(name) match {
      case None => default
      case Some(v) =>
        try v.toDouble
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$name must be numeric, got '$v'")
        }
    }

  private def envInt(name: String, default: Int): Int =
    sys.env.get(name) match {
      case None => default
      case Some(v) =>
        try v.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$name must be an integer, got '$v'")
        }
    }

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
    * gates admitted passes that then lost 370-650 CPU-s to steal. The
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

  /** Spin-wait (bounded by `timeoutS` — the CALLER passes the remaining
    * run-wide gate budget) until the box is quiet; returns
    * (loadAtAdmission, stealProbeCpus, waitedSeconds, admittedBy).
    * admittedBy ∈ load+steal | instant+steal | timeout | budget |
    * unreadable | off. Two-stage admission: (1) the passive gates
    * (loadavg, or five consecutive quiet non-self busy samples while
    * our own load residue decays) catch same-VM contention; (2) the
    * ACTIVE [[stealProbe]] catches the hypervisor neighbor the passive
    * gates cannot see — both must agree before a pass starts. Failed
    * probes back off exponentially (2,4,8,16,30 s cap) and re-probe at
    * 1 s so the gate does not itself heat the box (round-13 advice). */
  private def admitPass(gate: Double, probeGate: Double, timeoutS: Double,
      pass: Int): (Double, Double, Double, String) = {
    val t0 = System.nanoTime()
    def waited = (System.nanoTime() - t0) / 1e9
    if (timeoutS <= 0) return (load1(), -1.0, 0.0, "budget")
    var quietStreak = 0
    var iter = 0
    var probeFails = 0
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
        // First probe 2 s (the calibrated reference); re-probes after a
        // failure 1 s — enough to resolve a 0.75-cpus threshold without
        // re-heating the box the gate is trying to read.
        val sp = stealProbe(cpus, if (probeFails == 0) 2000 else 1000)
        if (sp < 0 || sp < probeGate) return (l, sp, waited, passive + "+steal")
        probeFails += 1
        quietStreak = 0 // neighbor active: re-earn the passive quiet too
        val backoffS = math.min(30L, 1L << math.min(probeFails, 5)) // 2,4,8,16,30
        System.err.println(f"[bench] pass $pass gate: steal probe " +
          f"$sp%.2f cpus (>= $probeGate%.2f), backing off ${backoffS}s")
        if (waited > timeoutS) return (l, -1.0, waited, "timeout")
        Thread.sleep(backoffS * 1000)
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
    val runT0 = System.nanoTime()
    def elapsedRun = (System.nanoTime() - runT0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val passes = envInt("SPARK_GRAFT_BENCH_PASSES", 5).max(1)
    val gateEnv = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_GATE", "1.5")
    val gateOn = !Set("off", "0", "false").contains(gateEnv.toLowerCase)
    val gate =
      if (!gateOn) 0.0
      else try gateEnv.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          "SPARK_GRAFT_BENCH_LOAD_GATE must be numeric or off/0/false, " +
            s"got '$gateEnv'")
      }
    // Round 14: the probe and discard thresholds are their OWN knobs —
    // deriving them from the load gate meant raising the gate for a
    // busier box silently loosened the contamination criterion past the
    // documented poisoned floor.
    val probeGate = envDouble("SPARK_GRAFT_BENCH_STEAL_PROBE_GATE", 0.75)
    val stealRateMax = envDouble("SPARK_GRAFT_BENCH_STEAL_DISCARD", 0.25)
    // Run-wide bounds (round 14, artifact-delivery mandate): ALL
    // admission waiting shares one budget, and the whole run races one
    // deadline — a neighbor that never relents still yields a finished,
    // self-flagged artifact inside the external driver's patience.
    var gateBudgetS = envDouble("SPARK_GRAFT_BENCH_GATE_BUDGET_S", 180.0)
    // 3000 s: the last driver run that FINISHED took 3214 s of sbt time
    // end-to-end (so the external timeout is above that); 3000 s of
    // main time + sbt/compile overhead stays under it while fitting
    // warmups + ~5 sf0.1 passes + a couple of discard-retries.
    val deadlineS = envDouble("SPARK_GRAFT_BENCH_DEADLINE_S", 3000.0)
    val maxRetries = envInt("SPARK_GRAFT_BENCH_PASS_RETRIES", 4).max(0)

    // SPARK_GRAFT_BENCH_WARMUPS (round 14, dev knob): 2 = both untimed
    // sweeps (the official configuration), 1 = tiny-sf only, 0 = none
    // (machinery tests, where timing comparability is not the point).
    val warmups = envInt("SPARK_GRAFT_BENCH_WARMUPS", 2).max(0).min(2)
    val spark = Harness.session()
    // Artifact-delivery layer 0 (round 14): the external driver keeps
    // only the LAST ~2000 chars of combined output. Spark's WARN
    // chatter (WindowExec single-partition, streaming AQE notes, ...)
    // floods that window at ~10 lines/s during a pass, so a mid-pass
    // kill used to leave a tail of pure log spam. ERROR-level logging
    // keeps the tail dominated by our own JSON lines.
    spark.sparkContext.setLogLevel("ERROR")

    // Per-query, PER-PASS times (None = that pass crashed for that
    // query). A crashed run must not masquerade as a (misleadingly
    // fast) timing — it is simply absent. A query with zero successful
    // runs reports null and lands in "errors"; one that failed SOME
    // passes still reports its median but is called out in "flaky".
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, Array[Option[Double]]]()
    names.foreach(n => times(n) = Array.fill[Option[Double]](passes)(None))
    val gateRecs = scala.collection.mutable.ArrayBuffer[String]()
    val extCpu = scala.collection.mutable.ArrayBuffer[Double]()
    val selfCpu = scala.collection.mutable.ArrayBuffer[Double]()
    val stealS = scala.collection.mutable.ArrayBuffer[Double]()
    val iowaitS = scala.collection.mutable.ArrayBuffer[Double]()
    var retryBudget = maxRetries // flat run total (round 14), not × passes
    val discarded = scala.collection.mutable.ArrayBuffer[String]()
    val passTotals = scala.collection.mutable.ArrayBuffer[Double]()
    var deadlineStopped = false

    def spreadOf(ts: Seq[Double]): Double =
      if (ts.size < 2 || ts.min <= 0) 0.0
      else (ts.max - ts.min) / ts.min * 100

    /** Render (full, abridged) artifact JSON from the passes completed
      * SO FAR — called after every pass (partial=true) and at run end
      * (partial=false). Pure string-building over driver-side state, so
      * the shutdown hook can safely reprint its latest output. */
    def render(partial: Boolean): (String, String) = {
      val nDone = passTotals.size
      val winLen = nDone.min(3).max(1)
      val winStart =
        if (nDone == 0) 0
        else (0 to nDone - winLen)
          .minBy(i => spreadOf(passTotals.slice(i, i + winLen).toSeq))
      val winTotals = passTotals.slice(winStart, winStart + winLen).toSeq
      def winTimes(k: String): Seq[Double] =
        times(k).slice(winStart, winStart + winLen).flatten.toSeq
      val qs = names.map { k =>
        val v = winTimes(k)
        s"\"" + k + "\":" +
          (if (v.nonEmpty) Harness.median(v).toString else "null")
      }.mkString("{", ",", "}")
      // Raw per-pass times for ALL completed passes (nulls where
      // crashed) — the full record a reader audits window selection
      // against.
      val runs = names.map { k =>
        s"\"" + k + "\":" + times(k).take(nDone)
          .map(_.map(_.toString).getOrElse("null"))
          .mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      // "errors" is window-scoped like the medians: a query with NO
      // successful run inside the selected window reports a null median
      // and silently vanishes from the headline total — it must land in
      // "errors" even if some pass OUTSIDE the window succeeded.
      // "flaky" = measured in the window but failed at least one
      // completed pass somewhere — disjoint from errors.
      val errorNames = names.filter(k => winTimes(k).isEmpty)
      val errors = errorNames.map(k => s"\"$k\"").mkString("[", ",", "]")
      val flaky = names
        .filter(k => winTimes(k).nonEmpty &&
          times(k).take(nDone).exists(_.isEmpty))
        .map(k => s"\"$k\"").mkString("[", ",", "]")
      val total = names.flatMap { k =>
        val v = winTimes(k)
        if (v.nonEmpty) Some(Harness.median(v)) else None
      }.sum
      // Drift verdict: BASELINE.md's rule says pass totals spreading >2%
      // mean a noisy box whose medians should not be trusted as a
      // baseline; verdict from the UNROUNDED spread of the SELECTED
      // window; round only for display. A run where EVERY query errored
      // out of the window (or no pass completed) is degenerate.
      val degenerate = nDone == 0 ||
        (names.nonEmpty && errorNames.size == names.size)
      val spreadRaw = spreadOf(winTotals)
      val spreadPct = math.rint(spreadRaw * 10) / 10
      val fullSpreadPct = math.rint(spreadOf(passTotals.toSeq) * 10) / 10
      val drift =
        if (degenerate) "degenerate"
        else if (nDone < 3) "short_run"
        else if (spreadRaw <= 2.0) "ok"
        else "noisy_box"
      val driftJson =
        s""""pass_spread_pct":$spreadPct,"full_spread_pct":$fullSpreadPct,""" +
          s""""window":[${winStart + 1},${winStart + winLen}],""" +
          s""""drift":"$drift",""" +
          s""""load_gate":${if (gateOn) gate.toString else "null"},""" +
          s""""steal_probe_gate":$probeGate,""" +
          s""""steal_discard":$stealRateMax,""" +
          s""""pass_gate":${gateRecs.mkString("[", ",", "]")},""" +
          s""""pass_ext_cpu_s":${extCpu.mkString("[", ",", "]")},""" +
          s""""pass_self_cpu_s":${selfCpu.mkString("[", ",", "]")},""" +
          s""""pass_steal_s":${stealS.mkString("[", ",", "]")},""" +
          s""""pass_iowait_s":${iowaitS.mkString("[", ",", "]")},""" +
          s""""pass_discarded":${discarded.mkString("[", ",", "]")}"""
      val meta =
        s""""passes":$passes,"passes_done":$nDone,""" +
          s""""partial":$partial,"deadline_stop":$deadlineStopped"""
      val full =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
          s"""$meta,"runs":$runs,""" +
          s""""pass_totals":${passTotals.mkString("[", ",", "]")},""" +
          s"""$driftJson,""" +
          s""""errors":$errors,"flaky":$flaky,"sf":"$sfDir"}"""
      val abridged =
        s"""{"metric":"total","value":$total,"unit":"sec","abridged":true,""" +
          s"""$meta,"n_queries":${names.size},$driftJson,""" +
          s""""errors":$errors,"flaky":$flaky,"sf":"$sfDir"}"""
      (full, abridged)
    }

    val sfKey = new java.io.File(sfDir).getName
    def persist(full: String): Unit =
      try {
        val w = new java.io.PrintWriter(s"/tmp/graft-bench-$sfKey.json")
        try w.println(full) finally w.close()
      } catch { case _: java.io.IOException => () }

    // Shutdown hook (round 14): `timeout` sends SIGTERM before SIGKILL;
    // the hook ends stdout with the latest abridged partial line so the
    // driver's 2000-char tail capture parses an artifact instead of the
    // killed pass's shutdown chatter. JVM shutdown hooks run
    // CONCURRENTLY with Spark's own (which cancels jobs and logs
    // multi-line ERROR stacks for seconds — measured: they buried a
    // single hook print ~130 lines deep), so the hook (1) mutes the
    // root logger FIRST — everything Spark says after this instant
    // vanishes — and (2) prints three times across ~5 s so the last
    // copy postdates whatever non-logger output remains.
    val finalized = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var lastAbridged: String = null
    @volatile var lastFull: String = null
    @volatile var shuttingDown = false
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      shuttingDown = true
      // Mute UNCONDITIONALLY: even a finished run's spark.stop() can
      // log after the final JSON line and push it out of the tail.
      try org.apache.logging.log4j.core.config.Configurator
        .setRootLevel(org.apache.logging.log4j.Level.OFF)
      catch { case _: Throwable => () }
      if (!finalized.get && lastAbridged != null) {
        if (lastFull != null) persist(lastFull) // survives a dead stdout pipe
        var i = 0
        while (i < 3) {
          println(lastAbridged)
          Console.out.flush()
          i += 1
          if (i < 3)
            try Thread.sleep(if (i == 1) 1500 else 3000)
            catch { case _: InterruptedException => () }
        }
      }
    }))

    // Artifact-delivery layer 1b (round 14): seed the hook's artifact
    // BEFORE the warmups. The two untimed sweeps are the longest
    // artifact-free window in the run (~5-10 min at sf0.1, plus sbt
    // compile before them), and the round-13 postmortem showed a kill
    // in any such window yields a tail of raw Spark shutdown stacks. A
    // kill from here on ends stdout with a parseable, self-flagged
    // degenerate line ("passes_done":0,"drift":"degenerate").
    locally {
      val (f0, a0) = render(partial = true)
      persist(f0); lastFull = f0; lastAbridged = a0
    }
    // Warmup (1): one untimed sweep at tiny sf — JIT + codegen caches.
    if (warmups >= 1)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
        Harness.releaseTransient(spark)
      }
    // Warmup (2): one untimed sweep at the TARGET scale factor. Its wall
    // time seeds the per-pass cost estimate the deadline logic uses
    // before any timed pass has completed.
    var passEstimateS = 0.0
    if (warmups >= 2) {
      val warm2T0 = System.nanoTime()
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        Harness.releaseTransient(spark)
      }
      passEstimateS = (System.nanoTime() - warm2T0) / 1e9
    }

    var pass = 1
    while (pass <= passes && !deadlineStopped) {
      // Deadline check BEFORE scheduling a pass: if the estimated cost
      // of one more sweep would cross the run deadline, stop and report
      // what we have (at least one timed pass always runs).
      if (pass > 1 && elapsedRun + passEstimateS > deadlineS) {
        deadlineStopped = true
        System.err.println(f"[bench] deadline: ${elapsedRun}%.0f s elapsed" +
          f" + est pass ${passEstimateS}%.0f s > ${deadlineS}%.0f s — " +
          s"stopping after ${passTotals.size} passes")
      } else {
        var done = false
        while (!done) {
          val (admitLoad, admitSteal, waitS, admitBy) =
            if (gateOn) admitPass(gate, probeGate, gateBudgetS, pass)
            else (load1(), -1.0, 0.0, "off")
          gateBudgetS = (gateBudgetS - waitS).max(0.0)
          if (admitBy == "timeout" || admitBy == "budget")
            System.err.println(f"[bench] pass $pass admitted by " +
              f"$admitBy at load1=$admitLoad%.2f after $waitS%.0f s " +
              "— starts dirty")
          val b0 = busyJiffies(); val s0 = selfJiffies()
          val st0 = stealJiffies(); val io0 = iowaitJiffies()
          val t0 = System.nanoTime()
          val attempt = scala.collection.mutable.Map[String, Double]()
          var qIdx = 0
          SparkEntry.queries.foreach { case (name, fn) =>
            val q0 = System.nanoTime()
            try {
              fn(spark, sfDir).count()
              attempt(name) = (System.nanoTime() - q0) / 1e9
            } catch { case t: Throwable =>
              // Quiet once the shutdown hook owns the tail: the cancel
              // cascade would otherwise print one failure line per
              // in-flight query AFTER the hook's final artifact line.
              if (!shuttingDown)
                System.err.println(s"[bench] $name failed: ${t.getMessage}")
            }
            // Outside the per-query timer: each invocation's dead
            // localCheckpoint blocks must not become the NEXT query's
            // memory pressure (the round-7 drift — see releaseTransient).
            Harness.releaseTransient(spark)
            qIdx += 1
            // Keep the newest completed-pass artifact within the tail
            // window even when the run is killed MID-pass: re-print it
            // every 50 queries (self-flagged "partial":true duplicates;
            // a reader takes the last line).
            if (qIdx % 50 == 0 && lastAbridged != null) {
              println(lastAbridged)
              Console.out.flush()
            }
          }
          val wall = (System.nanoTime() - t0) / 1e9
          passEstimateS = math.max(passEstimateS, wall)
          val db = busyJiffies() - b0; val ds = selfJiffies() - s0
          val dst = if (st0 < 0) -1.0 else (stealJiffies() - st0) / HZ
          val stealRate = if (dst < 0) -1.0 else dst / wall
          // Retry only while BOTH budgets allow: the global retry count
          // and the run deadline (a discarded pass near the deadline
          // records as-measured, self-flagged via pass_steal_s).
          val canRetry = retryBudget > 0 &&
            elapsedRun + passEstimateS <= deadlineS
          val dirty = gateOn && stealRate > stealRateMax && canRetry
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
            passTotals += wall
            done = true
            // Incremental artifact (round 14): flush after EVERY pass so
            // a kill between passes still leaves the latest state in
            // /tmp and the stdout tail.
            val (fullP, abrP) = render(partial = true)
            persist(fullP)
            lastFull = fullP
            lastAbridged = abrP
            println(abrP)
          }
        }
        pass += 1
      }
    }

    val (full, abridged) = render(partial = false)
    // The per-query maps make the full line long enough that a tail-only
    // stdout capture can cut off its head (where the headline total
    // lives). Persist the full line to an SF-KEYED file, print it, and
    // end stdout with a SHORT self-contained total line.
    persist(full)
    finalized.set(true)
    println(full)
    println(abridged)
    spark.stop()
  }
}
