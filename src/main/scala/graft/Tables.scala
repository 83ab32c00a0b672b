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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is physically INT64 TIMESTAMP(NANOS) in parquet, which
    * Spark's vectorized reader rejects. Read it as raw nanos and convert to
    * a microsecond TimestampType with integer division — exact, and the same
    * floor-truncation DuckDB's `epoch_us` applies, so oracle twins agree.
    * (The testdata carries no sub-microsecond precision.) */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
