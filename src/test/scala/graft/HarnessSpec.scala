package graft

import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Millis, Seconds, Span}

/** Executable contract for Harness.releaseTransient (SURVEY §5.5, the
  * round-8 advice): the scaladoc's safety argument — "safe ONLY between
  * queries; a held localCheckpoint'd frame cannot recompute after
  * release" — was a comment-level invariant. These tests make both
  * halves enforceable: the failure mode a cross-invocation cache WOULD
  * hit is pinned (so a future violation fails here, not with a
  * block-not-found error at a distance), and the no-persist-in-query-
  * path premise is swept structurally.
  */
class HarnessSpec extends AnyFunSuite with SparkFixture with Eventually {

  test("releaseTransient frees checkpoint blocks: a frame held across " +
      "the release is unrecoverable (the declared contract)") {
    val df = spark.range(0, 1000).toDF("x").localCheckpoint()
    assert(df.count() === 1000L)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "localCheckpoint should register a persistent RDD")
    Harness.releaseTransient(spark)
    // Deregistration is synchronous (the unpersist call removes the RDD
    // from the context's persistent map before the async block drop).
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseTransient left persistent RDDs registered")
    // Block removal is async (blocking = false): once the executors
    // drop the blocks, re-materializing the held frame MUST fail —
    // lineage is truncated, there is nothing to recompute from. If this
    // ever starts succeeding, localCheckpoint semantics changed and the
    // releaseTransient safety argument needs re-auditing.
    eventually(timeout(Span(30, Seconds)), interval(Span(200, Millis))) {
      intercept[Exception] { df.count() }
    }
  }

  test("no declared query path persists frames across invocations " +
      "(the premise releaseTransient's safety rests on)") {
    // releaseTransient unpersists EVERY persistent RDD in the context;
    // that is safe because the only persistence any query path creates
    // is per-invocation localCheckpoint (re-built fresh each call). A
    // .cache()/.persist( in src/main would be a cross-invocation
    // persistent RDD that a release in another query's epilogue would
    // silently destroy — fail at the source.
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"sweep must run from the repo root")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    val hits = files(root).flatMap { f =>
      // ISO-8859-1: total on bytes — a stray non-UTF-8 literal anywhere
      // in the tree must not abort the sweep.
      val src = scala.io.Source.fromFile(f, "ISO-8859-1")
      val lines = try src.getLines().toVector finally src.close()
      lines.zipWithIndex.collect {
        case (l, i) if (l.contains(".cache()") || l.contains(".persist("))
            && !l.trim.startsWith("*") && !l.trim.startsWith("//") =>
          s"${f.getPath}:${i + 1}: $l"
      }
    }
    assert(hits.isEmpty,
      "cross-invocation persistence in a query path (breaks " +
        "releaseTransient's all-RDDs sweep):\n" + hits.mkString("\n"))
  }
}
