package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** Secret resolution + Kafka config surface vs the reference's settings
  * (/root/reference/main.py:31-54 secret flow, :86-108 consumer config,
  * :80-84 producer config). */
class SecretsSpec extends AnyFunSuite {

  private val payload =
    """{"bootstrap_servers": "b-1.msk:9096,b-2.msk:9096",
      |"topic": "test-topic",
      |"username": "alice", "password": "s3cr3t",
      |"port": 9096}""".stripMargin

  test("static provider parses JSON payloads into config maps") {
    val p = new StaticSecretProvider(Map("msk-proxy" -> payload))
    val cfg = p.fetchConfig("msk-proxy")
    assert(cfg("bootstrap_servers") === "b-1.msk:9096,b-2.msk:9096")
    assert(cfg("username") === "alice")
    assert(cfg("port") === "9096", "non-string values render as strings")
  }

  test("missing secret raises a typed error (not print-and-swallow)") {
    val p = new StaticSecretProvider(Map.empty)
    intercept[NoSuchElementException](p.fetchConfig("absent"))
  }

  test("non-object payload is rejected") {
    val p = new StaticSecretProvider(Map("bad" -> "[1,2,3]"))
    intercept[IllegalArgumentException](p.fetchConfig("bad"))
  }

  test("file provider reads <root>/<name>.json") {
    val dir = Files.createTempDirectory("secrets")
    Files.writeString(dir.resolve("msk.json"), payload)
    val p = new FileSecretProvider(dir.toString)
    assert(p.fetchConfig("msk")("topic") === "test-topic")
    assert(p.fetch("nope").isEmpty)
  }

  test("env provider maps secret names to env-var style keys") {
    // Name exercises the full mapping: dashes AND dots → underscores,
    // lowercase → upper.
    val p = new EnvSecretProvider(Map("TEST_KAFKA_REST_PROXY" -> payload))
    assert(p.fetch("test-kafka-rest.proxy").isDefined)
  }

  test("chained provider takes the first hit") {
    val p = new ChainedSecretProvider(Seq(
      new StaticSecretProvider(Map.empty),
      new StaticSecretProvider(Map("k" -> """{"a":"1"}"""))))
    assert(p.fetchConfig("k")("a") === "1")
  }

  test("consumer options mirror the reference's Kafka read config") {
    val cfg = KafkaSourceConfig.fromSecret(
      new StaticSecretProvider(Map("msk" -> payload)).fetchConfig("msk"))
    val o = cfg.sourceOptions
    // main.py:87-92,104-106 settings, mapped to Spark option names:
    assert(o("kafka.bootstrap.servers") === "b-1.msk:9096,b-2.msk:9096")
    assert(o("subscribe") === "test-topic")
    assert(o("startingOffsets") === "earliest") // auto.offset.reset
    assert(o("kafka.group.id") === "tap_kafka_read")
    assert(o("includeHeaders") === "true") // with_metadata=True
    assert(o("kafka.security.protocol") === "SASL_SSL")
    assert(o("kafka.sasl.mechanism") === "SCRAM-SHA-512")
    assert(o("kafka.sasl.jaas.config").contains("ScramLoginModule"))
    assert(o("kafka.sasl.jaas.config").contains("\"alice\""))
  }

  test("bounded-read cap maps to maxOffsetsPerTrigger (max_num_records=3)") {
    val cfg = KafkaSourceConfig("b:9092", "t",
      maxOffsetsPerTrigger = Some(3L))
    assert(cfg.sourceOptions("maxOffsetsPerTrigger") === "3")
  }

  test("producer options carry topic + auth (main.py:80-84)") {
    val cfg = KafkaSourceConfig("b:9092", "t",
      security = Some(KafkaSaslConfig("u", "p")))
    val o = cfg.sinkOptions
    assert(o("topic") === "t")
    assert(o("kafka.bootstrap.servers") === "b:9092")
    assert(o.contains("kafka.sasl.jaas.config"))
  }

  test("jaas config escapes quotes and backslashes in credentials") {
    val sasl = KafkaSaslConfig("""al"ice""", """p\as"s""")
    val jaas = sasl.jaasConfig
    assert(jaas.contains("""username="al\"ice""""))
    assert(jaas.contains("""password="p\\as\"s""""))
    // Still exactly one terminating `";` and balanced quotes overall.
    assert(jaas.endsWith("\";"))
    assert(jaas.count(_ == '"') % 2 === 0)
  }

  test("oauth callback class passes through (main.py:16-24 remnant)") {
    val sasl = KafkaSaslConfig("u", "p", mechanism = "OAUTHBEARER",
      loginCallbackHandlerClass = Some("example.OauthCallbackHandler"))
    assert(sasl.clientOptions("kafka.sasl.login.callback.handler.class")
      === "example.OauthCallbackHandler")
  }

  test("secret missing bootstrap_servers fails fast") {
    intercept[IllegalArgumentException](
      KafkaSourceConfig.fromSecret(Map("topic" -> "t")))
  }
}
