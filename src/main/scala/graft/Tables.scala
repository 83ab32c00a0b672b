package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor dir.
  *
  * Schema-on-read: `spark.read.parquet` takes the footer schema (FIXTURES.md),
  * giving the columnar vectorized scan + predicate pushdown for free. This is
  * the engine's ingestion boundary — the Spark-native equivalent of the
  * reference's Kafka source feeding bytes into a PCollection
  * (/root/reference/main.py:85-108); bounded tables here, the streaming
  * facade in [[graft.streaming]] for the unbounded shape.
  */
object Tables {
  /** Naive (non-UTC-adjusted) parquet TIMESTAMP columns must land as
    * TimestampType carrying the stored micros verbatim — i.e. the stored
    * value IS the epoch-µs — because every oracle twin compares through
    * DuckDB's `epoch_us(ts)`, which reads the same stored micros. Spark 4's
    * default instead infers TIMESTAMP_NTZ for naive columns; disabling the
    * inference restores the value-preserving mapping independent of the
    * session timezone (the NTZ fallback cast in [[events]] is only
    * value-preserving under UTC, which Harness/SparkFixture pin — this
    * branch makes that fallback unreachable in practice). Harness sets
    * the conf at session construction; here it is re-asserted only when
    * ABSENT, because the caller may be the driver's own session (not
    * built by this repo) — the guarded set keeps that coverage while
    * making the call side-effect-free once the value is in place (the
    * effective-value check, not getOption, because registered SQL confs
    * report their default as present). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val k = "spark.sql.parquet.inferTimestampNTZ.enabled"
    if (spark.conf.get(k, "true") != "false") spark.conf.set(k, "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: INT64 TIMESTAMP(NANOS) (read as raw nanos via the legacy
    * conf, floored to µs by integer division — the same truncation DuckDB's
    * `epoch_us` applies) and plain TIMESTAMP(MICROS) (already the target
    * type after [[table]]'s NTZ-inference opt-out). Branch on what the
    * footer actually says so both generations read identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // only if something re-enabled NTZ inference
        raw.withColumn("ts", raw("ts").cast(TimestampType))
      case _ => raw
    }
  }
  /** Registers graft's native expressions (graft_minhash_sigs is used by
    * the shingle-LSH queries) — idempotent, same as [[embeddings]]. */
  def documents(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    table(s, d, "documents")
  }
  /** Also registers graft's native expressions (graft_vec_dot) into the
    * session — the caller may be the driver's own session, which was not
    * built with `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    table(s, d, "embeddings")
  }
}
