package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every BATCH query must evaluate (not
  * throw) against a schema-correct, zero-row scale-factor dir — the
  * day-one-of-a-new-tenant / empty-partition reality of a deployed
  * library. Streaming replays are excluded (their two-batch staging
  * derives split points from data and an empty replay is a different
  * contract — StreamingSpec covers their semantics), as are the staged
  * binary/JDBC round-trips whose fixtures are data-derived by design.
  */
class EmptyInputSpec extends AnyFunSuite with SparkFixture {

  private lazy val emptyDir: String = {
    val dir = "/tmp/graft-empty-sf"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      Tables.table(spark, sfDir, t).limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private val excluded: Set[String] = Set() ++
    SparkEntry.queries.keys.filter(_.startsWith("q_stream_")) ++
    Set(
      "q_batch_session", // shares the stream replay's staging contract
      "q_scan_binaryfile", // data-derived file fixture (0 files = no scan)
      "q_scan_jdbc" // data-derived Derby fixture
    )

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !excluded(name)) {
    test(s"$name evaluates on an empty corpus") {
      val rows = fn(spark, emptyDir).collect()
      assert(rows.length >= 0)
    }
  }
}
