package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Optional extra
  * args are substring filters for fast single-query iteration (the driver
  * passes exactly two args, so its full-sweep contract is unchanged).
  * Filtered runs rewrite oracle_sql.json with ONLY the kept keys, so they
  * REQUIRE an empty outDir: into a previous full sweep's dir, the stale
  * parquet of every omitted query would fall through to the checker's
  * rows-only fallback and silently downgrade the gate while reporting
  * green. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val filters = args.drop(2)
    def keep(name: String) =
      filters.isEmpty || filters.exists(name.contains)
    if (filters.nonEmpty) {
      val existing = Option(new java.io.File(outDir).list())
        .getOrElse(Array.empty[String])
      require(existing.isEmpty,
        s"filtered Verify needs an empty outDir: $outDir already holds " +
          s"${existing.length} entries whose stale results the oracle " +
          "check would silently rows-only-pass")
    }
    val spark = Harness.session()
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The manifest is static — write it BEFORE the multi-minute query
    // sweep. Round 13's kill-yields-nothing lesson: a run that dies
    // mid-sweep must still leave oracle_sql.json plus every parquet
    // written so far, so the driver's compare sees a partial result
    // instead of an empty round.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    var done = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        done += 1
        if (done % 50 == 0)
          System.err.println(s"[verify] $done queries dumped")
      }
      Harness.releaseTransient(spark)
    }
    System.err.println(s"[verify] complete: $done queries dumped")
    spark.stop()
  }
}
