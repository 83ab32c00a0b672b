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

  test("documents.text honors the XxHashSql twin preconditions at " +
      "every SF (ASCII, shingles under the 32-byte stripe bound)") {
    // XxHashSql (the DuckDB twin generator behind the whole MinHash/
    // SimHash oracle family) declares two fixture preconditions: input
    // is ASCII (the twin reads bytes as ord(substr(...)) — the code
    // point, which equals the byte ONLY below 128), and every hashed
    // token/shingle is < 32 bytes (the XXH64 stripe phase is not
    // generated). A third precondition belongs to the MediaSql twin
    // (round-10 advice): text must be NON-EMPTY — MediaOps
    // .extractFeatures emits a feature row even for an empty payload
    // (frameLen = max(1, payload.length) decodes one byte from h0)
    // while the twin's range(0, length(text)) yields no chars rows for
    // an empty doc, dropping it entirely — a regenerated fixture with
    // one empty doc would surface as an unattributed
    // q_multimodal_features/ann hash mismatch. A regenerated fixture
    // breaking any of these would otherwise be unattributed; this
    // names them instead.
    sfDirs.foreach { d =>
      val r = spark.read.parquet(s"$d/documents.parquet")
        .agg(
          sum(when(length(col("text")) =!= octet_length(col("text")),
            1L).otherwise(0L)).as("non_ascii_docs"),
          max(array_max(transform(split(col("text"), " "),
            t => octet_length(t)))).as("max_tok_bytes"),
          min(octet_length(col("text"))).as("min_text_bytes"),
          count(lit(1)).as("n_docs"))
        .collect().head
      // An EMPTY fixture makes every min/max aggregate NULL and the
      // getInt reads below die with an opaque NPE instead of the named
      // message each assert exists for (round-11 advice) — fail the
      // degenerate case by name first.
      assert(r.getLong(3) > 0L,
        s"$d: documents.parquet is EMPTY — fixture generation failed")
      assert(r.getLong(0) === 0L,
        s"$d: non-ASCII text — the twin's ord-as-byte read diverges")
      val maxTok = r.getInt(1)
      assert(3 * maxTok + 2 < 32,
        s"$d: max token $maxTok bytes — a 3-token shingle can reach " +
          s"${3 * maxTok + 2} bytes, into the ungenerated stripe phase")
      assert(r.getInt(2) >= 1,
        s"$d: empty documents.text — MediaSql's range(0, length(text)) " +
          "twin drops empty docs that extractFeatures keeps")
    }
  }

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
