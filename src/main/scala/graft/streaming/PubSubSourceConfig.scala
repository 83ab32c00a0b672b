package graft.streaming

/** Pub/Sub source/sink option builders — the second named source of the
  * mandate ("Structured Streaming + Kafka/Pub-Sub source", BASELINE.json
  * `spark_approach`), given the same treatment as [[KafkaSourceConfig]]:
  * a typed config facade rendering onto a Spark connector's option map,
  * with credentials resolved through [[SecretProvider]].
  *
  * Spark has no BUILT-IN Pub/Sub connector; the public connector for
  * this surface is the Pub/Sub Lite Spark connector
  * (`pubsublite-spark-sql-streaming`, format `"pubsublite"`), whose
  * option names and fixed output schema this facade targets. Pub/Sub
  * LITE rather than classic Pub/Sub is itself the architecturally honest
  * choice for Spark: Structured Streaming's source contract requires a
  * REPLAYABLE, offset-addressable log (`getBatch(start, end)` must be
  * re-runnable for failure recovery), which Lite's per-partition offset
  * model provides and classic Pub/Sub's ack/lease-per-message model does
  * not — a classic-Pub/Sub "source" has to stage messages into a log
  * first, which is just this connector with extra steps. Ack semantics
  * therefore collapse to offset commits in the stream's checkpoint, the
  * same exactly-once ledger every other Spark source uses.
  *
  * Like the Kafka facade this is a pure config surface in the
  * zero-egress build (no connector jar, no backend): PubSubWiringSpec
  * pins that the options reach DataSource resolution and fail ONLY on
  * the missing jar; a deployment adds the connector and the same call
  * yields the streaming relation with the documented fixed schema
  * (subscription, partition, offset, key, data, publish_timestamp,
  * event_timestamp, attributes).
  */
final case class PubSubSourceConfig(
    projectNumber: Long,
    location: String,
    subscriptionId: String,
    topicId: Option[String] = None,
    /** Base64 service-account JSON; absent → application-default creds. */
    credentialsKey: Option[String] = None,
    /** Flow control: outstanding byte / message caps per partition — the
      * backpressure analog of the Kafka facade's maxOffsetsPerTrigger. */
    bytesOutstandingPerPartition: Option[Long] = None,
    messagesOutstandingPerPartition: Option[Long] = None) {

  /** Fully-qualified subscription path the connector expects. */
  def subscriptionPath: String =
    s"projects/$projectNumber/locations/$location/" +
      s"subscriptions/$subscriptionId"

  /** Fully-qualified topic path (sink side). */
  def topicPath: String =
    s"projects/$projectNumber/locations/$location/topics/" +
      topicId.getOrElse(throw new IllegalArgumentException(
        "sink requires topicId"))

  /** Options for `spark.readStream.format("pubsublite")`. */
  def sourceOptions: Map[String, String] =
    Map("pubsublite.subscription" -> subscriptionPath) ++
      credentialsKey.map("gcp.credentials.key" -> _) ++
      bytesOutstandingPerPartition.map(
        "pubsublite.flowcontrol.byteoutstandingperpartition" -> _.toString) ++
      messagesOutstandingPerPartition.map(
        "pubsublite.flowcontrol.messagesoutstandingperpartition" ->
          _.toString)

  /** Options for `df.writeStream.format("pubsublite")` (requires a
    * `data: binary` column; `key`/`attributes` optional). */
  def sinkOptions: Map[String, String] =
    Map("pubsublite.topic" -> topicPath) ++
      credentialsKey.map("gcp.credentials.key" -> _)
}

object PubSubSourceConfig {

  /** Build from a secret payload ([[SecretProvider.fetchConfig]]) — the
    * same end-to-end flow as [[KafkaSourceConfig.fromSecret]]: secret
    * name → JSON → connector config. Expected keys: `project_number`,
    * `location`, `subscription_id`, optional `topic_id` /
    * `credentials_key`. */
  def fromSecret(cfg: Map[String, String]): PubSubSourceConfig = {
    def req(k: String): String = cfg.getOrElse(k,
      throw new IllegalArgumentException(s"secret payload missing $k"))
    PubSubSourceConfig(
      projectNumber = req("project_number").toLong,
      location = req("location"),
      subscriptionId = req("subscription_id"),
      topicId = cfg.get("topic_id"),
      credentialsKey = cfg.get("credentials_key"))
  }
}
