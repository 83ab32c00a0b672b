package graft

/** Single-query timing/plan harness for iterating on one operator without
  * paying the full bench: `runMain graft.BenchOne <query> [n] [--explain]`
  * times `<query>` n times (default 3, floored at 1) on SPARK_GRAFT_SF_DIR
  * after one warmup at sf0.001, printing each run and the median. Session
  * and median come from [[Harness]] so the numbers are comparable to the
  * full bench by construction. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query>"))
    val n = args.drop(1).find(!_.startsWith("--"))
      .map(_.toInt).getOrElse(3).max(1)
    val explain = args.contains("--explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warmup: JIT + codegen
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bench-one] $name run $i: $dt%.3f s ($rows rows)")
      Harness.releaseTransient(spark) // full-bench hygiene, same here
      dt
    }
    println(f"[bench-one] $name median: ${Harness.median(times)}%.3f s")
    if (explain) {
      // Execute THIS df instance first so the AdaptiveSparkPlan prints
      // isFinalPlan=true — AQE stage reuse (ReusedExchange/ReusedSubquery)
      // only appears in the final plan, never in the initial one.
      val df = fn(spark, sfDir)
      df.collect()
      df.explain("formatted")
    }
    spark.stop()
  }
}
