package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S1 — the Kafka micro-batch source (`BigQuerySinkTask.java:248-297`,
  * where the Connect framework delivers `Collection<SinkRecord>`): a thin
  * shaping layer over `spark.readStream.format("kafka")` producing the
  * engine's canonical stream shape
  * (`topic, partition, offset, timestamp, <key fields>, value STRUCT`)
  * that [[MergePipeline]] consumes.
  *
  * Requires the `spark-sql-kafka-0-10` connector on the classpath (not
  * shipped in this build environment — the pipeline is exercised through
  * `MemoryStream` in tests, which produces the identical shape; this
  * wrapper is the production entry point). What CAN be tested without a
  * broker is the option translation: [[KafkaSource.options]] is a pure
  * function from config to the connector's documented option keys,
  * golden-spec'd per config shape.
  *
  * T5 backpressure: `maxOffsetsPerTrigger` bounds each micro-batch (the
  * pull-model replacement for the reference's pause/resume queue bound,
  * `BigQuerySinkTask.java:307-318`); it also carries the
  * `mergeRecordsThreshold` semantic (T3) — at most that many records per
  * merge flush.
  */
object KafkaSource {

  /** How to pick partitions — the connector's three mutually exclusive
    * modes (`subscribe` / `subscribePattern` / `assign`). The sealed
    * trait makes "exactly one" hold by construction, mirroring the
    * reference's `topics` vs `topics.regex` config exclusivity
    * (`SinkConfig` rejects both set).
    */
  sealed trait Subscription
  /** Explicit topic list → the `subscribe` option (comma-joined). */
  final case class Topics(names: Seq[String]) extends Subscription {
    require(names.nonEmpty, "at least one topic required")
    require(names.forall(n => n.nonEmpty && !n.contains(",")),
      s"topic names must be non-empty and comma-free: $names")
  }
  /** Java regex over topic names → the `subscribePattern` option —
    * the reference's `topics.regex` mode.
    */
  final case class TopicPattern(regex: String) extends Subscription {
    require(regex.nonEmpty, "topic pattern must be non-empty")
    // fail at config time, not in the connector's driver thread
    java.util.regex.Pattern.compile(regex)
  }
  /** Explicit partition assignment → the `assign` option; JSON like
    * `{"topicA":[0,1]}`.
    */
  final case class Assign(partitionsJson: String) extends Subscription {
    require(partitionsJson.trim.startsWith("{"),
      s"assign takes the connector's JSON form {\"topic\":[partitions]}: $partitionsJson")
  }

  /** Source configuration; field names follow the connector's options.
    * `startingOffsets` is `earliest`, `latest`, or the per-partition
    * JSON form; `failOnDataLoss=false` tolerates aged-out offsets
    * (the connector's documented escape hatch for retention races).
    */
  final case class Config(
      bootstrapServers: String,
      subscription: Subscription,
      startingOffsets: String = "earliest",
      failOnDataLoss: Boolean = true,
      maxOffsetsPerTrigger: Option[Long] = None,
      groupIdPrefix: Option[String] = None,
      kafkaConsumerProps: Map[String, String] = Map.empty) {
    require(bootstrapServers.nonEmpty, "bootstrapServers required")
    require(startingOffsets == "earliest" || startingOffsets == "latest"
        || startingOffsets.trim.startsWith("{"),
      s"startingOffsets must be earliest|latest|{json}: $startingOffsets")
    require(maxOffsetsPerTrigger.forall(_ > 0),
      s"maxOffsetsPerTrigger must be positive: $maxOffsetsPerTrigger")
    // normalize before checking: options() adds the `kafka.` prefix to
    // unprefixed pass-throughs, so a bare "bootstrap.servers" would end
    // up as "kafka.bootstrap.servers" and silently override the
    // dedicated field (the props map is ++'d last) — reject both forms
    require(!kafkaConsumerProps.keys
        .map(k => if (k.startsWith("kafka.")) k.stripPrefix("kafka.") else k)
        .exists(_ == "bootstrap.servers"),
      "pass bootstrapServers via the dedicated field")
  }

  /** The pure option translation: config → the exact DataSource option
    * map `spark-sql-kafka-0-10` documents. Kept free of SparkSession so
    * it is testable without a broker or the connector jar; consumer
    * pass-throughs get the connector's required `kafka.` prefix.
    */
  def options(cfg: Config): Map[String, String] = {
    val sub = cfg.subscription match {
      case Topics(names) => "subscribe" -> names.mkString(",")
      case TopicPattern(regex) => "subscribePattern" -> regex
      case Assign(json) => "assign" -> json
    }
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      sub,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString) ++
      cfg.groupIdPrefix.map("groupIdPrefix" -> _) ++
      cfg.kafkaConsumerProps.map { case (k, v) =>
        (if (k.startsWith("kafka.")) k else s"kafka.$k") -> v
      }
  }

  /** Production entry point: reads the configured topics and shapes
    * rows into the canonical stream schema. Key/value arrive as JSON
    * bytes; tombstones (null value) survive `from_json` as null structs
    * (P2 decides their fate downstream).
    */
  def stream(
      spark: SparkSession,
      cfg: Config,
      keySchema: StructType,
      valueSchema: StructType): DataFrame = {
    val raw = spark.readStream.format("kafka").options(options(cfg)).load()
    val keyStruct = from_json(col("key").cast("string"), keySchema)
    raw.select(
      Seq(col("topic"), col("partition"), col("offset"), col("timestamp")) ++
        keySchema.fieldNames.toSeq.map(f => keyStruct.getField(f).as(f)) :+
        from_json(col("value").cast("string"), valueSchema).as("value"): _*)
  }

  /** Convenience overload for the common explicit-topic-list shape. */
  def stream(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String],
      keySchema: StructType,
      valueSchema: StructType,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame =
    stream(spark,
      Config(bootstrapServers, Topics(topics),
        startingOffsets = startingOffsets,
        maxOffsetsPerTrigger = maxOffsetsPerTrigger),
      keySchema, valueSchema)
}
