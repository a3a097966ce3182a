package graft.convert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P9/P10/P11 — record enrichment and upsert-row wrapping: the Spark
  * re-expression of `convert/KafkaDataBuilder.java:46-73` and
  * `utils/SinkRecordConverter.java:83-137`.
  *
  * A "Kafka-shaped" input frame is expected to carry the source columns
  * Spark's Kafka reader produces: `topic STRING, partition INT,
  * offset LONG, timestamp TIMESTAMP, key *, value *` — the same facts the
  * Connect framework hands the reference per `SinkRecord`.
  */
object Staging {

  /** P9 — Kafka metadata enrichment (`KafkaDataBuilder.java:46-73`):
    * appends `{topic, partition, offset, insertTime}` under the
    * configured column name. `insertTime` is the processing-time instant,
    * taken once per batch (the reference takes it per record — per-batch
    * is the deterministic, distributed-friendly analog).
    */
  def withKafkaData(df: DataFrame, fieldName: String): DataFrame =
    df.withColumn(fieldName, struct(
      col("topic"), col("partition"), col("offset"),
      current_timestamp().as("insertTime")))

  /** P10 — key embedding (`SinkRecordConverter.java:134-137`): the record
    * key struct copied into the value row under a configured name
    * (non-upsert path only).
    */
  def withKeyField(df: DataFrame, fieldName: String): DataFrame =
    df.withColumn(fieldName, col("key"))

  /** P11 — upsert-row wrapping (`SinkRecordConverter.java:83-125` +
    * intermediate-table shape `SchemaManager.java:622-672`):
    * `{key REQUIRED, value (null = tombstone), i, partitionTime,
    * batchNumber}`.
    *
    * `i` must be a total order within each key across the batch; the
    * reference uses a per-batch AtomicLong counter, whose only purpose is
    * last-write-wins ordering (`MergeQueries.java:216-226`). The Kafka
    * (partition, offset) pair gives the same per-key total order — keys
    * live in one partition — without any cross-executor coordination, so
    * we derive `i = partition * 2^40 + offset` (offsets stay below 2^40
    * per partition; at 1 M rec/s that is 34 years of a single partition).
    *
    * `partitionTime` follows T6 (`SinkRecordConverter.java:112-122`):
    * the message timestamp when event-time partitioning is on, else the
    * processing-time batch instant.
    */
  def wrapUpsert(
      df: DataFrame,
      keyCols: Seq[String],
      batchNumber: Long,
      messageTimePartitioning: Boolean = true): DataFrame = {
    val pt: Column =
      if (messageTimePartitioning) col("timestamp")
      else current_timestamp()
    val keyStruct = struct(keyCols.map(col): _*)
    // reference rejects null keys outright (`SinkRecordConverter.java:105-108`)
    val keyAllNull = keyCols.map(col(_).isNull).reduce(_ && _)
    df.select(
      when(keyAllNull, raise_error(
        lit("Record keys must be non-null when upsert/delete is enabled")))
        .otherwise(keyStruct).as("key"),
      col("value"),
      (col("partition").cast("long") * lit(1L << 40) + col("offset")).as("i"),
      pt.as("partitionTime"),
      lit(batchNumber).as("batchNumber"))
  }

  /** P2 — tombstone filter (`BigQuerySinkTask.java:258`): records with a
    * null value are dropped unless delete mode keeps them as tombstones.
    */
  def filterTombstones(df: DataFrame, deleteEnabled: Boolean): DataFrame =
    if (deleteEnabled) df else df.where(col("value").isNotNull)
}
