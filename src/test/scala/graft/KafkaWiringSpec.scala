package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{KafkaPipeline, KafkaSaslConfig, KafkaSourceConfig}

/** The executable end of the Kafka config surface. The sandbox ships
  * neither a broker nor the `spark-sql-kafka-0-10` connector jar, so the
  * strongest offline assertion is exact: [[KafkaPipeline.source]] carries
  * the option map all the way into DataSource resolution and fails there
  * with Spark's find-the-connector error — not a config/validation error.
  * A deployment that adds the jar turns the same call into the unresolved
  * streaming relation (whose fixed output schema EventStreams.
  * asKafkaRecords mirrors for offline development).
  */
class KafkaWiringSpec extends AnyFunSuite with SparkFixture {

  private val cfg = KafkaSourceConfig(
    bootstrapServers = "broker-1:9096",
    topic = "test-topic",
    maxOffsetsPerTrigger = Some(3L),
    security = Some(KafkaSaslConfig("user", "pass")))

  test("source options reach DataSource resolution; only the jar is missing") {
    val e = intercept[Exception] {
      KafkaPipeline.source(spark, cfg)
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("kafka"),
      s"failure must be the missing-connector lookup, got: ${e.getMessage}")
    assert(msg.contains("failed to find") || msg.contains("data source"),
      s"expected Spark's DataSource lookup error, got: ${e.getMessage}")
    // Specifically the lookup error CONDITION, not an option-validation
    // failure (asserting on the error class is robust to message
    // rewording across Spark versions).
    e match {
      case st: org.apache.spark.SparkThrowable =>
        // Spark 4.1's STREAMING lookup path still throws the legacy
        // condition (_LEGACY_ERROR_TEMP_1140, the "deploy with
        // spark-sql-kafka" message); batch lookup uses
        // DATA_SOURCE_NOT_FOUND. Either is the connector-missing error.
        assert(Set("DATA_SOURCE_NOT_FOUND", "_LEGACY_ERROR_TEMP_1140")
            .contains(st.getCondition),
          s"expected the connector-lookup condition, got ${st.getCondition}")
      case other => fail(s"expected a SparkThrowable, got $other")
    }
  }

  test("sink writer is built lazily from the producer options") {
    // The writer object itself materializes without a connector (format
    // resolution happens at start()); building it proves the producer
    // option plumbing compiles against the streaming writer API.
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, sfDir).limit(1)
      .select(col("event_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("event_id"))).cast("binary").as("value"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kafka-wiring").toString
    val stream = spark.readStream.schema(df.schema)
      .option("pathGlobFilter", "nothing-matches")
      .parquet(dir)
    val w = KafkaPipeline.sink(stream, cfg, s"$dir/ckpt")
    assert(w != null)
  }
}
