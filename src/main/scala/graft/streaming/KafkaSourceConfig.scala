package graft.streaming

/** Kafka source/sink option builders — the engine's rendering of the
  * reference's consumer and producer config dicts
  * (/root/reference/main.py:86-103 and :80-84) onto Spark's Kafka
  * connector options.
  *
  * Spark's Kafka source is in-JVM (`spark-sql-kafka-0-10`); the
  * reference's separate Java expansion-service process
  * (/root/reference/main.py:14,107, README.md:1-3) has no equivalent here
  * — that architectural hop is deleted, not ported (SURVEY §2.1).
  *
  * This is a pure config surface: the zero-egress build environment has no
  * broker (and no kafka connector jar), so nothing in the declared queries
  * executes it. Tests assert the option map against the reference's
  * settings; deployment wires `reader.format("kafka")` with
  * `options(...)`.
  */
final case class KafkaSourceConfig(
    bootstrapServers: String,
    topic: String,
    groupId: String = "tap_kafka_read", // main.py:88
    startingOffsets: String = "earliest", // main.py:89 auto.offset.reset
    includeHeaders: Boolean = true, // main.py:105 with_metadata=True
    maxOffsetsPerTrigger: Option[Long] = None, // main.py:106 bounded cap
    security: Option[KafkaSaslConfig] = None) {

  /** Options for `spark.readStream.format("kafka")`. The fixed output
    * schema (key/value binary, topic, partition, offset, timestamp,
    * timestampType, headers) is Spark's own — it supersedes the Beam
    * KafkaRecord metadata shape (SURVEY §1.1). */
  def sourceOptions: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "kafka.group.id" -> groupId,
      "includeHeaders" -> includeHeaders.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      security.map(_.clientOptions).getOrElse(Map.empty)

  /** Options for `df.write/writeStream.format("kafka")` (requires
    * key/value columns on the DataFrame — main.py:80-84's producer map). */
  def sinkOptions: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic) ++
      security.map(_.clientOptions).getOrElse(Map.empty)
}

/** SASL_SSL + SCRAM-SHA-512 client config (main.py:90-92), with the
  * optional OAuth login-callback pass-through the reference keeps as an
  * alternative auth path (main.py:16-24, OIDC remnants :93-102). */
final case class KafkaSaslConfig(
    username: String,
    password: String,
    mechanism: String = "SCRAM-SHA-512", // main.py:91
    protocol: String = "SASL_SSL", // main.py:90
    loginCallbackHandlerClass: Option[String] = None) {

  def jaasConfig: String = {
    val module =
      if (mechanism.startsWith("SCRAM"))
        "org.apache.kafka.common.security.scram.ScramLoginModule"
      else "org.apache.kafka.common.security.plain.PlainLoginModule"
    // JAAS values are double-quoted strings; a credential containing `"` or
    // `\` must be escaped or the rendered config is malformed/injectable.
    def esc(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""$module required username="${esc(username)}" password="${esc(password)}";"""
  }

  def clientOptions: Map[String, String] =
    Map(
      "kafka.security.protocol" -> protocol,
      "kafka.sasl.mechanism" -> mechanism,
      "kafka.sasl.jaas.config" -> jaasConfig) ++
      loginCallbackHandlerClass.map(
        "kafka.sasl.login.callback.handler.class" -> _)
}

object KafkaSourceConfig {

  /** Build from a secret payload (SecretProvider.fetchConfig result) — the
    * reference's end-to-end flow: secret name → JSON → client config
    * (main.py:31-71 feeding :86-103). Expected keys: `bootstrap_servers`,
    * `topic`, optional `username`/`password`/`sasl_mechanism`/
    * `security_protocol`. */
  def fromSecret(cfg: Map[String, String],
      defaultTopic: String = "test-topic"): KafkaSourceConfig =
    KafkaSourceConfig(
      bootstrapServers = cfg.getOrElse("bootstrap_servers",
        throw new IllegalArgumentException(
          "secret payload missing bootstrap_servers")),
      topic = cfg.getOrElse("topic", defaultTopic),
      security =
        for (u <- cfg.get("username"); p <- cfg.get("password"))
          yield KafkaSaslConfig(u, p,
            mechanism = cfg.getOrElse("sasl_mechanism", "SCRAM-SHA-512"),
            protocol = cfg.getOrElse("security_protocol", "SASL_SSL")))
}
