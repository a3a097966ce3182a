package graft.streaming

import graft.convert.Staging
import graft.sources.WarehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.Row

/** S1/T1-T7 — the streaming spine: a Kafka-shaped stream is wrapped,
  * routed per topic, and merge-flushed (or appended) into per-table
  * [[WarehouseTable]]s once per micro-batch via `foreachBatch` — the
  * Spark-native form of the reference's `put()` → stage →
  * `MergeQueries.mergeFlushAll` lifecycle (`BigQuerySinkTask.java:248-297,
  * 535-545`).
  *
  * Streaming-semantics mapping (SURVEY.md §2.8):
  *  - T1 micro-batching: `Trigger.ProcessingTime(mergeIntervalMs)` — the
  *    trigger interval *is* the merge interval (`:535-545`).
  *  - T2 exactly-once: checkpointed offsets + batch-scoped idempotent
  *    writes replace `preCommit`'s offset bookkeeping
  *    (`MergeBatches.java:286-299`); a replayed batch re-merges the same
  *    keys to the same final state (merge is idempotent per (key, i)).
  *  - T3 thresholds: `mergeRecordsThreshold` maps to the source's
  *    `maxOffsetsPerTrigger` (bound records per merge) rather than a
  *    mid-batch flush — Spark's unit of flush is the micro-batch.
  *  - T4 batch sequencing is free: micro-batch N+1 starts after N
  *    commits (`MergeBatches.java:213-277` becomes engine behavior).
  *  - T5 backpressure: `maxOffsetsPerTrigger` (pull model) replaces the
  *    pause/resume queue bound (`BigQuerySinkTask.java:307-318`).
  *  - T6 event-time partitioning: `messageTimePartitioning` selects the
  *    record timestamp as `partitionTime`.
  *  - T7 late data: lands in its timestamp's day partition; no watermark
  *    needed for parity.
  *
  * Input schema (the Kafka source shape): `topic STRING, partition INT,
  * offset LONG, timestamp TIMESTAMP, key *, value STRUCT`.
  */
object MergePipeline {

  /** Attach the pipeline to a streaming DataFrame: returns a started
    * `DataStreamWriter` configured with checkpointing and the merge
    * trigger. `tableRootFor` maps a routed (dataset, table) to a storage
    * root for its WarehouseTable.
    */
  def writer(
      stream: DataFrame,
      config: GraftSinkConfig,
      keyFields: Seq[String],
      checkpointDir: String,
      tableRootFor: TableRouter.Target => String): DataStreamWriter[Row] = {
    config.validate()
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, config, keyFields, tableRootFor)
        ()
      }
    if (config.mergeIntervalMs > 0)
      w.trigger(Trigger.ProcessingTime(config.mergeIntervalMs))
    else w
  }

  /** One micro-batch: route per topic, then per table wrap + merge (or
    * append in non-upsert mode). Public for deterministic testing — this
    * is exactly what the streaming writer runs per batch.
    */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      config: GraftSinkConfig,
      keyFields: Seq[String],
      tableRootFor: TableRouter.Target => String): Unit = {
    if (batch.isEmpty) return
    val topics = batch.select(col("topic")).distinct()
      .collect().map(_.getString(0)).toSeq
    // group topics by routed target so multi-topic → one table works
    topics.groupBy(t => TableRouter.route(t, config)).foreach {
      case (target, topicGroup) =>
        val slice = batch.where(col("topic").isin(topicGroup: _*))
        val root = tableRootFor(target)
        if (config.upsertDeleteEnabled) mergeSlice(slice, batchId, config, keyFields, root)
        else appendSlice(slice, config, keyFields, root)
    }
  }

  private def destSchemaFor(staged: DataFrame, keyFields: Seq[String]): StructType = {
    val keyT = staged.schema("key").dataType.asInstanceOf[StructType]
    val valT = staged.schema("value").dataType.asInstanceOf[StructType]
    StructType(keyT.fields ++ valT.fields)
  }

  private def mergeSlice(slice: DataFrame, batchId: Long, config: GraftSinkConfig,
      keyFields: Seq[String], root: String): Unit = {
    val tombstoned = Staging.filterTombstones(slice, config.deleteEnabled)
    val staged = Staging.wrapUpsert(tombstoned, keyFields, batchId,
      config.messageTimePartitioning)
    val table = WarehouseTable.create(slice.sparkSession, root, keyFields,
      destSchemaFor(staged, keyFields))
    table.merge(staged, delete = config.deleteEnabled)
  }

  private def appendSlice(rawSlice: DataFrame, config: GraftSinkConfig,
      keyFields: Seq[String], root: String): Unit = {
    // P2 — tombstones are skipped outside delete mode (`BigQuerySinkTask.java:258`)
    val slice = Staging.filterTombstones(rawSlice, deleteEnabled = false)
    val spark = slice.sparkSession
    var flat = slice.select(
      (col("value.*") +: Seq(col("topic"), col("partition"), col("offset"),
        struct(keyFields.map(col): _*).as("__key"))) :+
        (if (config.messageTimePartitioning) col("timestamp")
         else current_timestamp()).as("partitionTime"): _*)
    // P9 — kafka metadata column; P10 — key embedding (regular path only,
    // `SinkRecordConverter.java:126-137`)
    config.kafkaDataFieldName.foreach { f =>
      flat = Staging.withKafkaData(flat, f)
    }
    flat = config.kafkaKeyFieldName match {
      case Some(f) => flat.withColumnRenamed("__key", f)
      case None => flat.drop("__key")
    }
    val destSchema = flat.drop("partitionTime").schema
    val table = WarehouseTable.create(spark, root, Seq("offset"), destSchema)
    table.append(flat)
  }
}
