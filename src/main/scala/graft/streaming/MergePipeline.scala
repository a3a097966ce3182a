package graft.streaming

import graft.convert.Staging
import graft.schema.EvolutionPolicy
import graft.sources.WarehouseTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

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
  *    keys to the same final state (merge is idempotent per (key, i)),
  *    and the non-upsert path appends through
  *    [[WarehouseTable.appendBatch]], whose batchId-keyed files make a
  *    replayed append converge instead of duplicating.
  *  - T3 thresholds: a micro-batch larger than `mergeRecordsThreshold`
  *    is split into `ceil(n/threshold)` offset-ordered chunks, each
  *    merge-flushed separately (`SinkRecordConverter.java:96-102`), on
  *    top of `maxOffsetsPerTrigger` source rate limiting.
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
    // exactly-once namespace: batchIds are only monotonic WITHIN one
    // checkpoint lineage, so the append path's replay markers/tags are
    // namespaced by a checkpoint-derived id — a stream restarted with
    // a fresh checkpoint reuses small batchIds and must not collide
    // with the old run's committed-batch records
    val streamId = java.util.UUID
      .nameUUIDFromBytes(checkpointDir.getBytes("UTF-8")).toString.take(8)
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, config, keyFields, tableRootFor, streamId)
        ()
      }
    if (config.mergeIntervalMs > 0)
      w.trigger(Trigger.ProcessingTime(config.mergeIntervalMs))
    else w
  }

  /** One micro-batch: route per topic, then per table wrap + merge (or
    * append in non-upsert mode). Public for deterministic testing — this
    * is exactly what the streaming writer runs per batch. Returns the
    * number of flushes performed (merge chunks + appends), observable
    * for T3 threshold testing.
    */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      config: GraftSinkConfig,
      keyFields: Seq[String],
      tableRootFor: TableRouter.Target => String,
      streamId: String = "default"): Int = {
    // ONE job discovers the present-topic set AND per-topic counts,
    // regardless of the configured-topic count: the per-topic limit-1
    // probes this replaces cost one job each, so a 100-topic explicit
    // subscription paid 100 probe jobs per micro-batch. The count map
    // also serves mergeSlice's threshold check — no second count job.
    val present: Map[String, Long] = batch.groupBy(col("topic")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (present.isEmpty) return 0
    val explicit = config.subscribedTopics.nonEmpty
    val topics =
      if (explicit) config.subscribedTopics.filter(present.contains)
      else present.keys.toSeq.sorted
    // group topics by routed target so multi-topic → one table works
    topics.groupBy(t => TableRouter.route(t, config)).map {
      case (target, topicGroup) =>
        val slice = batch.where(col("topic").isin(topicGroup: _*))
        val sliceRows = topicGroup.flatMap(present.get).sum
        val root = tableRootFor(target)
        if (config.upsertDeleteEnabled)
          mergeSlice(slice, sliceRows, batchId, config, keyFields, root)
        else { appendSlice(slice, batchId, config, keyFields, root, streamId); 1 }
    }.sum
  }

  private def destSchemaFor(staged: DataFrame, keyFields: Seq[String]): StructType = {
    val keyT = staged.schema("key").dataType.asInstanceOf[StructType]
    val valT = staged.schema("value").dataType.asInstanceOf[StructType]
    StructType(keyT.fields ++ valT.fields)
  }

  private def policyOf(config: GraftSinkConfig): EvolutionPolicy =
    EvolutionPolicy(config.allowNewFields, config.allowFieldRelaxation)

  /** T3 — mid-batch merge threshold (`SinkRecordConverter.java:96-102`
    * analog): a slice larger than `mergeRecordsThreshold` is split into
    * `ceil(n/threshold)` chunks via `ntile` ordered by offset within each
    * Kafka partition — chunk k's offsets precede chunk k+1's for every
    * key (keys live in one partition), so sequential chunk flushes
    * preserve last-write-wins. Returns the number of merge flushes.
    */
  private def mergeSlice(slice: DataFrame, sliceRows: Long, batchId: Long,
      config: GraftSinkConfig, keyFields: Seq[String], root: String): Int = {
    val threshold = config.mergeRecordsThreshold
    // sliceRows comes from processBatch's single discovery aggregation —
    // no count job here; the under-threshold (steady-state) path also
    // skips the cache (the slice is consumed exactly once)
    if (threshold <= 0 || sliceRows <= threshold) {
      mergeOnce(slice, batchId, config, keyFields, root); 1
    } else {
      slice.cache()
      try {
        val numChunks = math.ceil(sliceRows.toDouble / threshold).toInt
        val w = Window.partitionBy(col("partition")).orderBy(col("offset"))
        val chunked = slice.withColumn("__chunk", ntile(numChunks).over(w))
        (1 to numChunks).foreach { k =>
          mergeOnce(chunked.where(col("__chunk") === k).drop("__chunk"),
            batchId, config, keyFields, root)
        }
        numChunks
      } finally { slice.unpersist(); () }
    }
  }

  /** One merge flush: tombstone-filter, wrap, evolve the destination
    * schema from the observed batch (R4 — DDL propagates into the merge
    * path before flushing, `UpsertDeleteBigQueryWriter.java:66-93`),
    * conform the staged value struct to the evolved schema, then route to
    * the mode's merge: J1/J2 upsert(+delete), or the reference's J3
    * delete-only semantics when only deletes are enabled.
    */
  private def mergeOnce(slice: DataFrame, batchId: Long, config: GraftSinkConfig,
      keyFields: Seq[String], root: String): Unit = {
    val tombstoned = Staging.filterTombstones(slice, config.deleteEnabled)
    val staged0 = Staging.wrapUpsert(tombstoned, keyFields, batchId,
      config.messageTimePartitioning)
    val observed = destSchemaFor(staged0, keyFields)
    val table = WarehouseTable.create(slice.sparkSession, root, keyFields, observed,
      config.tableOptions)
    val evolved = table.evolveSchema(observed, policyOf(config))
    val staged = conformValue(staged0, evolved, keyFields)
    if (config.deleteEnabled && !config.upsertEnabled) table.mergeDeleteOnly(staged)
    else table.merge(staged, delete = config.deleteEnabled)
    // kill-and-resume probe hook: table commit durable, checkpoint not
    WarehouseTable.maybeHalt(WarehouseTable.haltPostCommitAt)
    ()
  }

  /** Rebuild the staged `value` struct against the evolved destination
    * schema: batch-missing fields become NULL, order follows the evolved
    * schema, tombstones stay null.
    */
  private def conformValue(staged: DataFrame, evolved: StructType,
      keyFields: Seq[String]): DataFrame = {
    val valueFields = evolved.fields.toSeq.filterNot(f => keyFields.contains(f.name))
    val present = staged.schema("value").dataType.asInstanceOf[StructType].fieldNames.toSet
    val rebuilt = struct(valueFields.map { f =>
      if (present.contains(f.name)) col(s"value.`${f.name}`").as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    staged.withColumn("value", when(col("value").isNull, lit(null)).otherwise(rebuilt))
  }

  private def appendSlice(rawSlice: DataFrame, batchId: Long, config: GraftSinkConfig,
      keyFields: Seq[String], root: String, streamId: String): Unit = {
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
    val destSchema = StructType(flat.drop("partitionTime").schema.fields)
    val table = WarehouseTable.create(spark, root, Seq("offset"), destSchema,
      config.tableOptions)
    // R3/R4 — evolve before writing so added fields propagate on append too
    val evolved = table.evolveSchema(destSchema, policyOf(config))
    val conformed = flat.select(evolved.fields.toSeq.map { f =>
      if (flat.columns.contains(f.name)) col(s"`${f.name}`")
      else lit(null).cast(f.dataType).as(f.name)
    } :+ col("partitionTime"): _*)
    table.appendBatch(conformed, batchId, streamId = streamId)
  }
}
