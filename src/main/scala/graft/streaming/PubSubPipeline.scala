package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Executable Pub/Sub wiring for [[PubSubSourceConfig]] — the
  * [[KafkaPipeline]] pattern applied to the mandate's second source:
  * feed the option map into a real `format("pubsublite")` relation.
  *
  * The build sandbox has no Pub/Sub backend and no connector jar, so
  * [[source]] cannot RESOLVE here — Spark fails DataSource lookup with
  * its find-the-connector error, and PubSubWiringSpec pins exactly that
  * failure mode: the options reach resolution, and the one missing piece
  * is the jar (`pubsublite-spark-sql-streaming`) a deployment adds. Every
  * downstream operator develops against [[EventStreams]]' file-backed
  * mirror of the record shape instead, the same offline strategy the
  * Kafka surface uses.
  */
object PubSubPipeline {

  /** Unbounded Pub/Sub Lite read:
    * `readStream.format("pubsublite")` with the config's options. */
  def source(s: SparkSession, cfg: PubSubSourceConfig): DataFrame =
    s.readStream.format("pubsublite").options(cfg.sourceOptions).load()

  /** Pub/Sub Lite write of a streaming frame (requires a `data` binary
    * column). The caller starts it; offset commits live in the stream
    * checkpoint — the ack semantics of this surface (see
    * [[PubSubSourceConfig]]'s scaladoc). */
  def sink(df: DataFrame, cfg: PubSubSourceConfig,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("pubsublite")
      .options(cfg.sinkOptions)
      .option("checkpointLocation", checkpointDir)
}
