package graft.streaming

import graft.sources.WarehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The reference's published upsert/delete throughput probe, end-to-end
  * through the streaming pipeline
  * (`UpsertDeleteBigQuerySinkConnectorIT.java:285-371`): N records over
  * 10 key-partitions, each record pair sharing a key (`key = i/2`),
  * every fourth record a tombstone (`i % 4 == 3`), flushed in 10 merge
  * chunks (`mergeRecordsThreshold = N/10`). Survivors are exactly the
  * `i % 4 == 1` records — pairs with an odd key are deleted by their
  * second (tombstone) record, pairs with an even key keep their second
  * (update) record. The reference gates this at < 10 minutes for 1 M
  * records (≥ ~1,667 rec/s); [[run]] returns the measured wall so
  * callers (the throughput spec, the Bench `stream_merge_1m` entry) can
  * assert or report rec/s against that envelope.
  */
object ThroughputProbe {

  /** The probe's record shape: kafka-framed rows for record ids `i`,
    * 10 partitions keyed by key (the reference topology), tombstone
    * when `i % 4 == 3`.
    */
  def kafkaShape(ids: DataFrame): DataFrame =
    ids.select(
      lit("t").as("topic"),
      ((col("i") / 2).cast("long") % 10).cast("int").as("partition"),
      col("i").as("offset"),
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"),
      (col("i") / 2).cast("long").as("k1"),
      when(col("i") % 4 =!= 3,
        struct(concat(lit("v"), col("i")).as("f1"))).as("value"))

  /** Drive `n` records through the streaming merge pipeline in one
    * micro-batch chunked into `flushes` merge flushes; returns
    * (wallSeconds, survivorRows). Wall time covers query start →
    * all data merged and committed, matching the reference's
    * connector-start → records-committed window (it pre-populates Kafka
    * before starting the connector, as the MemoryStream does here).
    * Survivor VALUES are verified inside — a fast-but-wrong run throws.
    */
  def run(spark: SparkSession, warehouse: String, checkpoint: String,
      n: Long, flushes: Int = 10): (Double, Long) = {
    require(n % (4L * flushes) == 0, s"n=$n must divide into $flushes even flushes")
    val config = GraftSinkConfig(
      upsertEnabled = true, deleteEnabled = true,
      kafkaKeyFieldName = Some("k1"),
      mergeIntervalMs = 50L,
      mergeRecordsThreshold = n / flushes)
    val sps = spark
    import sps.implicits._
    val input = MemoryStream[Long](spark)
    // pre-populate BEFORE starting the clock (reference: "Pre-populate
    // Kafka ... as we want to measure the connector's throughput cleanly")
    var off = 0L
    while (off < n) { // bounded addData calls keep driver allocations sane
      val hi = math.min(off + 250000L, n)
      input.addData(off until hi)
      off = hi
    }
    val shaped = kafkaShape(input.toDF().withColumnRenamed("value", "i"))
    val t0 = System.nanoTime()
    val q = MergePipeline.writer(shaped, config, Seq("k1"), checkpoint,
      t => s"$warehouse/${t.dataset}/${t.table}").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    // exact survivor check — the reference asserts the full i%4==1 set
    val table = WarehouseTable.open(spark, s"$warehouse/default/t")
    val bad = table.read()
      .select(col("k1"), col("f1"),
        (col("k1") % 2 === 0 &&
          col("f1") === concat(lit("v"),
            (col("k1") * 2 + 1).cast("string"))).as("ok"))
      .where(!col("ok")).count()
    require(bad == 0L, s"$bad survivors violate the i%4==1 pattern")
    val survivors = table.read().count()
    require(survivors == n / 4,
      s"expected ${n / 4} survivors (the i%4==1 records), got $survivors")
    (wall, survivors)
  }
}
