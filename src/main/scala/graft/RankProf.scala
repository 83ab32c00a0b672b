package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Attribution profiler for RankOps' fixed two-phase overhead (the
  * round-11 verdict's task 1; rewritten round 12 to profile the SHAPES
  * THAT SHIPPED): times each stage of the current `rangeSortedWithMid`
  * pipeline in isolation — scan, AQE-coalesced range exchange + sort,
  * eager localCheckpoint, driver-census collect, downstream broadcast
  * join — so a fixed-overhead regression pins to a specific stage
  * before any rewrite is attempted, then prints a per-JOB wall-time
  * attribution for the four RankOps-heavy queries. `runMain
  * graft.RankProf` on SPARK_GRAFT_SF_DIR; per-stage medians are 2
  * warmups + 3 timed.
  *
  * (A persist(MEMORY_AND_DISK)+count materialization variant was
  * measured here in round 12 and removed: its readings were confounded
  * by CacheManager entry reuse across timed runs, and a persist call in
  * src/main would break HarnessSpec's no-persist sweep —
  * releaseTransient unpersists EVERY persistent RDD between queries,
  * which is only safe while localCheckpoint is the sole persistence in
  * any main-path code. BASELINE.md records the attribution outcome:
  * the pre-round-12 census chain cost 2-3 AQE stage jobs per call.) */
object RankProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()

    def time(label: String)(body: => Any): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        Harness.releaseTransient(spark)
        dt
      }
      println(f"[rankprof] $label%-44s ${Harness.median(ts.drop(2))}%7.3f s" +
        s"  (runs ${ts.map(t => f"$t%.3f").mkString(" ")})")
    }

    def base(): DataFrame = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val sortCols =
      Seq(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    // Mirrors RankOps.rangeSortedWithMid as shipped: NO explicit
    // partition count (AQE coalesces the range exchange), mid stamped
    // above the within-partition sort.
    def sortedMid(): DataFrame = base()
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__g_mid", monotonically_increasing_id())
    def pid = shiftright(col("__g_mid"), 33)

    // Mirrors the shipped driver census: one bounded aggregation
    // collected; the prefix fold itself is driver-side arithmetic with
    // no job to time.
    def census(df: DataFrame): Int =
      df.groupBy(pid.as("__g_pid"), col("o_orderpriority"))
        .agg(count(lit(1)).as("__g_cnt"), min(col("__g_mid")).as("__g_min"))
        .collect().length

    time("scan+count") { base().count() }
    time("exchange+sort+mid+count (no materialize)") { sortedMid().count() }
    time("localCheckpoint (eager) only") { sortedMid().localCheckpoint() }
    time("ckpt + census collect") { census(sortedMid().localCheckpoint()) }
    time("full q_window_pct (current)") {
      SparkEntry.queries("q_window_pct")(spark, sfDir).count()
    }
    time("full q_window_ntile_range (current)") {
      SparkEntry.queries("q_window_ntile_range")(spark, sfDir).count()
    }
    time("full q_select_head (current)") {
      SparkEntry.queries("q_select_head")(spark, sfDir).count()
    }
    time("full q_rfm (current)") {
      SparkEntry.queries("q_rfm")(spark, sfDir).count()
    }

    // Per-JOB attribution: one warm run of each query under a job-end
    // listener — prints every Spark job's wall time, so the fixed
    // overhead pins to a specific job (boundary sampling, checkpoint
    // materialization, census collect, final count).
    import org.apache.spark.scheduler.{SparkListener,
      SparkListenerJobEnd, SparkListenerJobStart}
    val jobStart = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val jobLines = scala.collection.concurrent.TrieMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = (System.nanoTime(),
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
            .getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          jobLines(e.jobId) = f"    job ${e.jobId}%4d  $dt%6.3f s  " +
            desc.replaceAll("\\s+", " ").take(110)
        }
    }
    for (q <- Seq("q_window_pct", "q_window_ntile_range", "q_select_head",
        "q_rfm")) {
      SparkEntry.queries(q)(spark, sfDir).count() // warm
      Harness.releaseTransient(spark)
      jobLines.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // The listener bus is ASYNCHRONOUS: count() returns when the
      // DAGScheduler finishes, but the final job's events may still be
      // queued — detaching immediately would nondeterministically drop
      // the last (often largest) job from the attribution (round-12
      // review). A bare in-flight-starts drain is not enough: a job
      // whose JobStart itself is still QUEUED is invisible to it (the
      // second round-12 review pass). So first wait for the bus to go
      // QUIET — recorded event count stable across two checks, the
      // StreamProf quiesce pattern — then drain any in-flight starts.
      var waited = 0
      var stable = 0
      var last = -1
      while (stable < 2 && waited < 2000) {
        Thread.sleep(50); waited += 50
        val n = jobLines.size + jobStart.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      while (jobStart.nonEmpty && waited < 4000) {
        Thread.sleep(50); waited += 50
      }
      spark.sparkContext.removeSparkListener(listener)
      Harness.releaseTransient(spark)
      val missed =
        if (jobStart.isEmpty && stable >= 2 && jobLines.nonEmpty) ""
        else s"  [WARNING: bus never went quiet or job(s) never " +
          s"completed within the drain cap (open starts: " +
          s"${jobStart.size}, quiet: ${stable >= 2}) — lines below " +
          "may be incomplete]"
      println(f"[rankprof] $q jobs (total $dt%.3f s):$missed")
      jobLines.toSeq.sortBy(_._1).foreach { case (_, l) => println(l) }
    }
    spark.stop()
  }
}
