package graft.streaming

import graft.sources.WarehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Kill-and-resume child process for the T2 end-to-end probe: runs the
  * reference's upsert/delete workload ([[ThroughputProbe.kafkaShape]])
  * through the streaming pipeline from a REPLAYABLE file source (the
  * MemoryStream of the throughput probe dies with the JVM; a parquet
  * directory of record ids replays from checkpointed offsets exactly),
  * optionally hard-halting at an injected protocol point:
  *
  *  - `-Dgraft.probe.haltPreCommit=N`: SIGKILL-equivalent halt on the
  *    N-th stage-written-but-uncommitted window (claimCommit entry) —
  *    the flush's staged rewrite exists, nothing is claimed or
  *    committed, the checkpoint never advanced;
  *  - `-Dgraft.probe.haltPostCommit=N`: halt after the N-th table
  *    commit returns to the flush loop — the table state is durable,
  *    the checkpoint is NOT, so the restarted query REPLAYS the whole
  *    micro-batch (at-least-once foreachBatch) and every flush
  *    re-merges; convergence relies on merge idempotence per (key, i),
  *    the `MergeBatches.java:286-299` offsets-after-durable-write
  *    contract re-expressed on Spark checkpoints.
  *
  * A clean invocation (no halt prop) runs to completion, verifies the
  * EXACT survivor set in-process — count `n/4`, every row matching the
  * `i % 4 == 1` value pattern, zero duplicate keys — and prints
  * `PROBE_OK <survivors>`. The parent spec
  * (`StreamingMergeSpec`, kill-and-resume case) chains
  * halt → halt → clean over ONE shared checkpoint + warehouse and
  * asserts the final state, so the probe covers crash, double-crash,
  * replay and recovery on the same table history.
  *
  * Args: `<dataDir> <warehouseDir> <checkpointDir> <n> <flushes> <master>`
  */
object KillResumeProbe {

  def main(args: Array[String]): Unit = {
    val Array(dataDir, warehouse, checkpoint, nStr, flushesStr, master) = args
    val n = nStr.toLong
    val flushes = flushesStr.toInt
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-kill-resume-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val config = GraftSinkConfig(
        upsertEnabled = true, deleteEnabled = true,
        kafkaKeyFieldName = Some("k1"),
        mergeIntervalMs = 50L,
        mergeRecordsThreshold = n / flushes)
      val ids = spark.readStream
        .schema("i LONG")
        .parquet(dataDir)
      val shaped = ThroughputProbe.kafkaShape(ids)
      val q = MergePipeline.writer(shaped, config, Seq("k1"), checkpoint,
        t => s"$warehouse/${t.dataset}/${t.table}").start()
      try q.processAllAvailable() finally q.stop()
      // exact-state verification (the reference's full i%4==1 assert):
      // survivor count, value pattern, and key uniqueness
      val table = WarehouseTable.open(spark, s"$warehouse/default/t")
      val rows = table.read().cache()
      try {
        val survivors = rows.count()
        require(survivors == n / 4,
          s"expected ${n / 4} survivors, read $survivors")
        val bad = rows.select(col("k1"), col("f1"),
          (col("k1") % 2 === 0 &&
            col("f1") === concat(lit("v"),
              (col("k1") * 2 + 1).cast("string"))).as("ok"))
          .where(!col("ok")).count()
        require(bad == 0L, s"$bad survivors violate the i%4==1 pattern")
        val dups = rows.groupBy(col("k1")).count()
          .where(col("count") > 1).count()
        require(dups == 0L, s"$dups duplicated keys after resume")
        println(s"PROBE_OK $survivors")
      } finally { rows.unpersist(); () }
    } finally spark.stop()
  }
}
