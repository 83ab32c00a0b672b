package graft
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the runnable mains (Verify / Bench / BenchOne):
  * one SparkSession recipe so a tuning added for the full bench applies
  * identically to single-query iteration and the correctness dump, and
  * one median so both bench harnesses report the same statistic. */
object Harness {
  /** The local session every main runs: SPARK_GRAFT_CPUS threads,
    * shuffle fan-out sized to the thread count (not the 200 default — a
    * production cluster sizes this to its core count the same way), UTC,
    * graft extensions installed the deployment way. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Primary site for the naive-timestamp mapping (Tables.table
      // re-asserts it only when unset, for driver-owned sessions).
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // ObjectHashAggregate (the execution home of graft_topk_by and
      // every TypedImperativeAggregate) falls back to SORT-based
      // aggregation once a partition's hash map passes this many keys —
      // the 128 default predates cheap RAM and would demote the knn
      // family's ~corpus-sized key space to a per-partition sort whose
      // avoidance is the aggregate's whole point. graft_topk_by buffers
      // are O(k) primitive arrays, so 64k keys is still MBs per
      // partition. KNOWN EXPOSURE (round-10 advice): the setting is
      // session-global, so it also lifts the sort fallback for
      // VARIABLE-width TypedImperativeAggregate buffers — collect_list/
      // collect_set in q_basket_pairs and q_select_maxcover today, and
      // any future aggregate — where per-partition memory is
      // 64k × buffer size, not O(k). Today's variable-width buffers are
      // bounded (a basket holds ≤7 lineitems by TPC-H construction;
      // maxcover's set column is the ≤32-shingle doc fingerprint), so
      // 64k keys is still ≤~100 MB/partition; an UNBOUNDED per-key list
      // aggregate must not ride this session default — scope it with
      // withSQLConf or cap the buffer instead.
      .config(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Release per-invocation session residue between independent query
    * runs. Two leak classes accumulate over a long single-session sweep
    * (the round-7 drift: timed pass totals climbed 164 → 218 → 265 s
    * across three sweeps of 294 queries):
    *
    *  1. `localCheckpoint` blocks — ~40 call sites materialize
    *     intermediate frames; the blocks are freed only when the
    *     ContextCleaner notices the RDD is unreachable (GC-driven), so a
    *     fast sweep outruns the cleaner and every pass executes under
    *     the previous passes' dead blocks' memory pressure.
    *  2. memory-sink stream tables — handled at the source:
    *     StreamQueries.runToTable drops its temp view once the caller's
    *     DataFrame holds the materialized plan (not here — a catalog
    *     listing per query is a driver-side Dataset build, too heavy for
    *     a per-query hook).
    *
    * Safe ONLY between queries: every declared query builds its frames
    * fresh per invocation (no RDD is shared across invocations, and the
    * repo has no `.cache()`/`persist` in any query path — grep-pinned),
    * but an unpersisted localCheckpoint CANNOT recompute (lineage is
    * truncated), so callers must not hold live DataFrames across a
    * release. Bench/Verify call it after each query's action completes;
    * unpersist is non-blocking, so the cost is a handful of async
    * messages, not a stop-the-world sweep. */
  def releaseTransient(s: SparkSession): Unit =
    quietCheckpointNoise {
      s.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }

  /** Unpersisting a localCheckpoint'd RDD logs one WARN per RDD
    * ("lineage has been truncated and cannot be recomputed") — correct
    * and intended here: the blocks belong to finished queries and are
    * never recomputed. Across 294 queries × 5 sweeps that is thousands
    * of lines drowning the signal WARNs, so the emitting logger drops
    * to ERROR FOR THE DURATION OF THE UNPERSIST LOOP ONLY (the WARN is
    * emitted synchronously inside `RDD.unpersist`, so the scope
    * suffices) and the previous effective level is restored on exit —
    * a permanently-raised level would also hide genuine
    * checkpoint-recompute warnings elsewhere in the session (the
    * round-8 advice). Scoped to the RDD class, not the spark.rdd
    * package. */
  private def quietCheckpointNoise(body: => Unit): Unit = {
    val logger = "org.apache.spark.rdd.MapPartitionsRDD"
    // Capture the CONFIG state, not the effective level: the effective
    // level is usually root-inherited, and restoring it as an explicit
    // per-logger level would pin this logger forever after the first
    // call — it would stop tracking later root changes (sc.setLogLevel).
    // If no explicit LoggerConfig existed for this exact name, the
    // restore REMOVES the one Configurator.setLevel created, returning
    // the logger to inheritance (round-9 advice).
    val hadExplicit =
      try {
        val cfg = org.apache.logging.log4j.core.LoggerContext
          .getContext(false).getConfiguration
        Option(cfg.getLoggerConfig(logger))
          .filter(_.getName == logger).map(_.getLevel)
      } catch { case _: Throwable => None }
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      logger, org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
    try body
    finally {
      try {
        hadExplicit match {
          case Some(lv) =>
            org.apache.logging.log4j.core.config.Configurator
              .setLevel(logger, lv)
          case None =>
            val ctx = org.apache.logging.log4j.core.LoggerContext
              .getContext(false)
            ctx.getConfiguration.removeLogger(logger)
            ctx.updateLoggers()
        }
      } catch { case _: Throwable => () }
    }
  }

  /** True median: midpoint average for even-length samples — the upper
    * order statistic would systematically overstate exactly the queries
    * that dropped a run. Callers guarantee non-empty. */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }
}
