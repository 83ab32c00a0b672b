package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribution profiler for RankOps' fixed two-phase overhead (the
  * round-11 verdict's task 1): times each stage of the
  * `rangeSortedWithMid` pipeline in isolation — scan, range exchange +
  * sort, eager localCheckpoint vs persist+count materialization, census
  * pass, downstream join — so the ~0.5-0.9 s/call can be pinned to
  * boundary sampling, checkpoint materialization, or the census before
  * any rewrite is attempted. `runMain graft.RankProf` on
  * SPARK_GRAFT_SF_DIR; prints per-stage medians (2 warmups + 3 timed). */
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
    def sortedMid(): DataFrame = base()
      .repartitionByRange(32, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__g_mid", monotonically_increasing_id())
    def pid = shiftright(col("__g_mid"), 33)

    def census(df: DataFrame): Long = {
      val offs = df.groupBy(pid.as("__g_pid"), col("o_orderpriority"))
        .agg(count(lit(1)).as("__g_cnt"), min(col("__g_mid")).as("__g_min"))
        .select(col("__g_pid"), col("o_orderpriority"),
          (sum("__g_cnt").over(Window.partitionBy("o_orderpriority")
            .orderBy("__g_pid")) - col("__g_cnt")).as("__g_off"),
          col("__g_min"))
      offs.count()
    }

    // (A persist(MEMORY_AND_DISK)+count materialization variant was
    // measured here in round 12 and removed: its readings were
    // confounded by CacheManager entry reuse across timed runs, and a
    // persist call in src/main would break HarnessSpec's no-persist
    // sweep — releaseTransient unpersists EVERY persistent RDD between
    // queries, which is only safe while localCheckpoint is the sole
    // persistence in any main-path code. BASELINE.md records the
    // attribution outcome.)
    time("scan+count") { base().count() }
    time("exchange+sort+mid+count (no materialize)") { sortedMid().count() }
    time("localCheckpoint (eager) only") { sortedMid().localCheckpoint() }
    time("ckpt + census") { census(sortedMid().localCheckpoint()) }
    time("ckpt + census + downstream join + count") {
      val df = sortedMid().localCheckpoint()
      val offs = df.groupBy(pid.as("__g_pid"), col("o_orderpriority"))
        .agg(count(lit(1)).as("__g_cnt"), min(col("__g_mid")).as("__g_min"))
      df.withColumn("__g_pid", pid)
        .join(broadcast(offs), Seq("__g_pid", "o_orderpriority")).count()
    }
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
    // listener — prints every Spark job's wall time and stage summary, so
    // the fixed overhead pins to a specific job (boundary sampling,
    // checkpoint materialization, census, final count).
    import org.apache.spark.scheduler.{SparkListener,
      SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
    val jobStart = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val stages = scala.collection.concurrent.TrieMap[Int, List[String]]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = (System.nanoTime(),
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
            .getOrElse(""))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          stages(e.jobId) = List(f"    job ${e.jobId}%4d  $dt%6.3f s  " +
            desc.replaceAll("\\s+", " ").take(110))
        }
    }
    for (q <- Seq("q_window_pct", "q_window_ntile_range", "q_select_head",
        "q_rfm")) {
      SparkEntry.queries(q)(spark, sfDir).count() // warm
      Harness.releaseTransient(spark)
      stages.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Harness.releaseTransient(spark)
      println(f"[rankprof] $q jobs (total $dt%.3f s):")
      stages.toSeq.sortBy(_._1).foreach { case (_, l) => l.foreach(println) }
    }
    spark.stop()
  }
}
