package graft.streaming

import graft.llm.DedupOps
import graft.sources.{TableOptions, WarehouseTable}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** End-to-end streaming ingest for a training-data document corpus:
  * exactly-once, content-deduplicated, bounded-state.
  *
  * Three dedup layers, cheapest first, each bounding the next's input:
  *
  *  1. [[StreamOps.dedupContent]] — engine-state dedup within the
  *     watermark horizon (16-byte hash state, evicted past the horizon);
  *     kills re-deliveries and crawl-burst duplicates before they touch
  *     storage.
  *  2. `DedupOps.exactDedup` per micro-batch — deterministic min-id
  *     survivor within the batch (the horizon dedup keeps the *first
  *     seen*, this pins the canonical row among same-batch copies).
  *  3. [[WarehouseTable.insertNewOnly]] — dedup against ALL corpus
  *     history via the table's per-partition bloom index: batch hashes
  *     probe the blooms, only candidate partitions' key columns are
  *     scanned, existing partitions are never rewritten.
  *
  * The table is content-addressed (key = `text_md5`), which makes the
  * sink naturally idempotent: a replayed micro-batch anti-joins away the
  * rows its previous attempt appended, so `foreachBatch`'s
  * at-least-once becomes effective exactly-once with no batchId
  * bookkeeping.
  *
  * Input stream shape: `(id LONG, text STRING, timestamp TIMESTAMP)`
  * plus any metadata columns, all carried through to the table.
  */
object DocumentIngestPipeline {

  val HashCol = "text_md5"

  /** Attach the ingest pipeline to a streaming document frame. */
  def writer(
      stream: DataFrame,
      tableRoot: String,
      checkpointDir: String,
      textCol: String = "text",
      idCol: String = "id",
      tsCol: String = "timestamp",
      horizon: String = "10 minutes",
      triggerMs: Long = 0L,
      tableOptions: TableOptions = TableOptions()): DataStreamWriter[Row] = {
    val deduped = StreamOps.dedupContent(stream, textCol, tsCol, horizon)
    val w = deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, tableRoot, textCol, idCol, tsCol, tableOptions)
        ()
      }
    if (triggerMs > 0) w.trigger(Trigger.ProcessingTime(triggerMs)) else w
  }

  /** One micro-batch: deterministic within-batch dedup, content
    * addressing, insert-if-absent against corpus history. Public for
    * deterministic testing — exactly what the stream runs per batch.
    */
  def processBatch(
      batch: DataFrame,
      tableRoot: String,
      textCol: String = "text",
      idCol: String = "id",
      tsCol: String = "timestamp",
      tableOptions: TableOptions = TableOptions()): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val unique = DedupOps.exactDedup(batch, textCol, idCol)
      .withColumn(HashCol, md5(to_binary(col(textCol), lit("utf-8"))))
      .withColumnRenamed(tsCol, "partitionTime")
    val destSchema = StructType(unique.drop("partitionTime").schema.fields)
    val table = WarehouseTable.create(spark, tableRoot, Seq(HashCol),
      destSchema, tableOptions)
    table.insertNewOnly(unique)
    ()
  }
}
