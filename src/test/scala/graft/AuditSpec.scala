package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural/layout audit semantics (AuditQueries): the referential
  * audit on a PLANTED broken mini-corpus (the sf fixtures are
  * referentially clean, so the orphan/null paths need a fixture that
  * actually exercises them), and the layout audit's stage-once
  * lifecycle + file-grain invariants.
  */
class AuditSpec extends AnyFunSuite with SparkFixture {

  /** sf0.001 copied, with customer REBUILT to plant: one orphan fk
    * (nationkey 999 — no such nation) and one NULL fk. */
  private lazy val brokenDir: String = {
    val dir = "/tmp/graft-audit-broken"
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    for (t <- Seq("region", "nation", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      Tables.table(spark, sfDir, t).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val c = Tables.customer(spark, sfDir)
    val broken = c
      .withColumn("c_nationkey",
        when(col("c_custkey") === 1, lit(999))
          .when(col("c_custkey") === 2, lit(null).cast("int"))
          .otherwise(col("c_nationkey")))
    broken.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    dir
  }

  test("q_dq_referential flags the planted orphan and null fk exactly") {
    val out = graft.operators.AuditQueries
      .dqReferential(spark, brokenDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 7)
    val cn = out("customer.nation")
    assert(cn.getAs[Long]("orphan_rows") == 1L)
    assert(cn.getAs[Long]("null_fk") == 1L)
    val nCust = Tables.customer(spark, sfDir).count()
    assert(cn.getAs[Long]("child_rows") == nCust)
    // Clean edges stay clean: no orphans anywhere else.
    for ((e, r) <- out if e != "customer.nation") {
      assert(r.getAs[Long]("orphan_rows") == 0L, s"edge $e")
      assert(r.getAs[Long]("null_fk") == 0L, s"edge $e")
    }
    // Cardinality coherence on every edge.
    for ((e, r) <- out) {
      assert(r.getAs[Long]("child_keys") <= r.getAs[Long]("child_rows"))
      assert(r.getAs[Long]("parents_hit") <=
        math.min(r.getAs[Long]("child_keys"),
          r.getAs[Long]("parent_rows")), s"edge $e")
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0, s"edge $e")
      assert(r.getAs[Long]("max_fanout") <= r.getAs[Long]("child_rows"))
    }
  }

  test("q_dq_referential orphan count matches a direct anti-join recount") {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val direct = li.join(o, li("l_orderkey") === o("o_orderkey"),
      "left_anti").count()
    val row = graft.operators.AuditQueries
      .dqReferential(spark, sfDir).collect()
      .find(_.getString(0) == "lineitem.orders").get
    assert(row.getAs[Long]("orphan_rows") == direct)
  }

  test("q_dq_layout: one file per bucket, mass conserved, stage-once") {
    val out = graft.operators.AuditQueries.dqLayout(spark, sfDir)
      .collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq.sorted ==
      (0L to 7L).toSeq)
    assert(out.forall(_.getAs[Long]("n_files") == 1L),
      "one-task-per-bucket write must yield exactly one file per dir")
    assert(out.map(_.getAs[Long]("n_rows")).sum ==
      Tables.lineitem(spark, sfDir).count())
    for (r <- out) {
      assert(r.getAs[Long]("keys") <= r.getAs[Long]("n_rows"))
      val sf = r.getAs[Double]("span_frac")
      assert(sf >= 0.0 && sf <= 1.0)
      assert(r.getAs[Long]("key_min") <= r.getAs[Long]("key_max"))
    }
    // Stage-once: a second evaluation reuses the layout (marker file
    // modtime unchanged — no rewrite happened).
    val marker = new Path(
      graft.sources.SourceQueries.scratch(sfDir, "lineitem_bucketed"),
      graft.sources.Staging.MarkerName)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    graft.operators.AuditQueries.dqLayout(spark, sfDir).collect()
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "second call must not restage")
  }
}
