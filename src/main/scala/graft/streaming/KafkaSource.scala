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
  * wrapper is the production entry point).
  *
  * T5 backpressure: `maxOffsetsPerTrigger` bounds each micro-batch (the
  * pull-model replacement for the reference's pause/resume queue bound,
  * `BigQuerySinkTask.java:307-318`); it also carries the
  * `mergeRecordsThreshold` semantic (T3) — at most that many records per
  * merge flush.
  */
object KafkaSource {

  def stream(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String],
      keySchema: StructType,
      valueSchema: StructType,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    var reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.foreach(n =>
      reader = reader.option("maxOffsetsPerTrigger", n.toString))
    val raw = reader.load()
    // key/value arrive as JSON bytes; tombstones (null value) survive
    // from_json as null structs (P2 decides their fate downstream)
    val keyStruct = from_json(col("key").cast("string"), keySchema)
    raw.select(
      Seq(col("topic"), col("partition"), col("offset"), col("timestamp")) ++
        keySchema.fieldNames.toSeq.map(f => keyStruct.getField(f).as(f)) :+
        from_json(col("value").cast("string"), valueSchema).as("value"): _*)
  }
}
