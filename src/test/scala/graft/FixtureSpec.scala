package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declared fixture invariants (FIXTURES.md) that queries take as
  * preconditions — pinned here so a regenerated fixture that silently
  * breaks one fails THIS spec, not the query that assumed it.
  *
  * Today's sole entry: `documents.doc_id` is a dense 0..n−1 surrogate
  * key at every SF. `q_text_editdist`'s predecessor equi-join
  * (TextQueries.textEditDist) substitutes `doc_id − 1` for `lag` on the
  * strength of exactly this declaration (round-9 advice asked for the
  * executable check). */
class FixtureSpec extends AnyFunSuite with SparkFixture {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")

  test("documents.doc_id is dense 0..n-1 at every SF") {
    sfDirs.foreach { d =>
      val r = spark.read.parquet(s"$d/documents.parquet")
        .agg(count(lit(1)).as("n"), min("doc_id").as("lo"),
          max("doc_id").as("hi"),
          countDistinct("doc_id").as("nd"))
        .collect().head
      val (n, lo, hi, nd) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo == 0L && hi == n - 1 && nd == n,
        s"$d: doc_id not dense 0..n-1 (n=$n lo=$lo hi=$hi distinct=$nd)")
    }
  }
}
