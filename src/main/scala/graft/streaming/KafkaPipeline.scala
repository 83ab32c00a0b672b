package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Executable Kafka wiring for [[KafkaSourceConfig]] — the last step the
  * config surface was missing: feeding the option maps into a real
  * `format("kafka")` relation.
  *
  * The build sandbox has neither a broker nor the connector jar
  * (`spark-sql-kafka-0-10`), so [[source]] cannot RESOLVE here — Spark
  * fails DataSource lookup with its deployment-section error, and
  * KafkaWiringSpec pins exactly that failure mode: the options reach
  * resolution, and the one missing piece is the jar a deployment adds.
  * On a cluster with the connector on the classpath the same call yields
  * the unresolved streaming relation whose fixed schema
  * [[EventStreams.asKafkaRecords]] mirrors (which is what lets every
  * downstream operator be developed and tested against the mirror).
  */
object KafkaPipeline {

  /** Unbounded Kafka read: `readStream.format("kafka")` with the config's
    * consumer options (reference main.py:86-108). */
  def source(s: SparkSession, cfg: KafkaSourceConfig): DataFrame =
    s.readStream.format("kafka").options(cfg.sourceOptions).load()

  /** Kafka write of a streaming frame (requires key/value columns —
    * reference main.py:80-84's producer path). The caller starts it; the
    * checkpoint is the producer's exactly-once ledger. */
  def sink(df: DataFrame, cfg: KafkaSourceConfig,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("kafka")
      .options(cfg.sinkOptions)
      .option("checkpointLocation", checkpointDir)
}
