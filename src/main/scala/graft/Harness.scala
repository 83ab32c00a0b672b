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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
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
