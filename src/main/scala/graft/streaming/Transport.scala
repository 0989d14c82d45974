package graft.streaming

/** Config-gated transport endpoints for [[RadiationPipeline]] — the
  * reference deployment is Kafka-to-Kafka (source flink_process/
  * flink_process.py:230-236, three sinks py:354-390); the offline sandbox
  * runs files-to-parquet. Selecting a transport swaps ONLY the endpoints:
  * the parse → validate → dedup → cohort → route plan between them is
  * identical, so correctness established on [[Dir]] carries to [[Kafka]].
  */
sealed trait Transport

object Transport {

  /** Kafka endpoints (reference parity). Delivery semantics: the kafka
    * batch writer inside `foreachBatch` is at-least-once — a retried epoch
    * re-sends its records and Spark opens no cross-sink transaction. That
    * matches the reference, whose three `FlinkKafkaProducer` sinks run
    * AT_LEAST_ONCE (flink_process.py:354-390 sets no transactional
    * semantic), and is weaker than the [[Dir]] sink's epoch-overwrite
    * idempotence; downstream consumers collapse replays on `key`
    * (the dedup key).
    */
  final case class Kafka(
      bootstrapServers: String,
      subscribe: String = "radiation-data",
      normalTopic: String = "normal-data",
      criticalTopic: String = "critical-data",
      dirtyTopic: String = "dirty-data",
      startingOffsets: String = "earliest") extends Transport

  /** Offline stand-in (SURVEY §2.1 S3/S6 mapping): a directory of
    * JSON-lines files as the source topic; three epoch-partitioned parquet
    * dirs as the sink topics (idempotent under epoch retry).
    */
  final case class Dir(inPath: String, outPath: String) extends Transport
}
