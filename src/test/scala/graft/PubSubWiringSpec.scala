package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{PubSubPipeline, PubSubSourceConfig,
  StaticSecretProvider}

/** The executable end of the Pub/Sub config surface — KafkaWiringSpec's
  * contract applied to the mandate's second source: offline, the
  * strongest exact assertion is that the option map reaches DataSource
  * resolution and fails ONLY on the missing connector jar; plus the
  * secret→config flow and the option rendering itself.
  */
class PubSubWiringSpec extends AnyFunSuite with SparkFixture {

  private val cfg = PubSubSourceConfig(
    projectNumber = 123456789L,
    location = "us-central1-a",
    subscriptionId = "events-sub",
    topicId = Some("events-topic"),
    credentialsKey = Some("ZmFrZS1rZXk="),
    messagesOutstandingPerPartition = Some(1000L))

  test("source options render the documented connector option names") {
    val o = cfg.sourceOptions
    assert(o("pubsublite.subscription") ===
      "projects/123456789/locations/us-central1-a/subscriptions/events-sub")
    assert(o("gcp.credentials.key") === "ZmFrZS1rZXk=")
    assert(
      o("pubsublite.flowcontrol.messagesoutstandingperpartition") === "1000")
    assert(!o.contains(
      "pubsublite.flowcontrol.byteoutstandingperpartition"),
      "unset flow-control knobs must not render")
  }

  test("sink options target the topic path") {
    assert(cfg.sinkOptions("pubsublite.topic") ===
      "projects/123456789/locations/us-central1-a/topics/events-topic")
  }

  test("source options reach DataSource resolution; only the jar is missing") {
    val e = intercept[Exception] {
      PubSubPipeline.source(spark, cfg)
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("pubsublite"),
      s"failure must be the missing-connector lookup, got: ${e.getMessage}")
    e match {
      case st: org.apache.spark.SparkThrowable =>
        // The streaming lookup path throws the legacy find-the-connector
        // condition; batch lookup uses DATA_SOURCE_NOT_FOUND. Either is
        // the connector-missing error — never option validation.
        assert(Set("DATA_SOURCE_NOT_FOUND", "_LEGACY_ERROR_TEMP_1140")
            .contains(st.getCondition),
          s"expected the connector-lookup condition, got ${st.getCondition}")
      case other => fail(s"expected a SparkThrowable, got $other")
    }
  }

  test("sink writer is built lazily from the producer options") {
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, sfDir).limit(1)
      .select(to_json(struct(col("event_id"))).cast("binary").as("data"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pubsub-wiring").toString
    val stream = spark.readStream.schema(df.schema)
      .option("pathGlobFilter", "nothing-matches")
      .parquet(dir)
    val w = PubSubPipeline.sink(stream, cfg, s"$dir/ckpt")
    assert(w != null)
  }

  test("secret payload -> config, the reference's end-to-end flow") {
    val provider = new StaticSecretProvider(Map(
      "pubsub/events" ->
        """{"project_number": 123456789, "location": "us-central1-a",
          |"subscription_id": "events-sub",
          |"credentials_key": "ZmFrZS1rZXk="}""".stripMargin))
    val fromSecret =
      PubSubSourceConfig.fromSecret(provider.fetchConfig("pubsub/events"))
    // Non-string JSON values (project_number) arrive via fetchConfig's
    // compact rendering; fromSecret parses them back to their types.
    assert(fromSecret.projectNumber === 123456789L)
    assert(fromSecret.subscriptionPath === cfg.subscriptionPath)
    assert(fromSecret.credentialsKey === Some("ZmFrZS1rZXk="))
    val missing = intercept[IllegalArgumentException] {
      PubSubSourceConfig.fromSecret(Map("location" -> "x"))
    }
    assert(missing.getMessage.contains("project_number"))
  }
}
