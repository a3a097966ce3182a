package graft.streaming

import graft.sources.WarehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming-SOURCE throughput probe: drain an N-row, 10-commit graft
  * table through `readStream.format("graft")` under
  * `Trigger.AvailableNow` with `maxVersionsPerTrigger=2` and
  * `startingVersion=earliest` — the capped incremental replay path (5
  * bounded batches), not one giant snapshot. The timed figure is the
  * DRAIN (stream start → self-termination); table construction is
  * outside the timer. Row count is asserted from the engine's own
  * batch progress, so a short-read can't masquerade as fast.
  *
  * This is the read-side twin of [[ThroughputProbe]] (the merge-sink
  * probe): together they bound both halves of the table-as-stream
  * pipeline the chained graft→graft arm proves correct.
  */
object SourceDrainProbe {

  /** @return (drain wall seconds, rows drained, input batches) */
  def run(spark: SparkSession, whRoot: String, ckDir: String,
      n: Long): (Double, Long, Int) = {
    val schema = StructType(Seq(
      StructField("k1", LongType), StructField("f1", StringType)))
    val t = WarehouseTable.create(spark, whRoot, Seq("k1"), schema)
    val perCommit = n / 10
    (0 until 10).foreach { i =>
      t.append(spark.range(i * perCommit, (i + 1) * perCommit).select(
        col("id").as("k1"),
        concat(lit("v"), col("id")).as("f1"),
        to_timestamp(lit(f"2024-01-${i % 5 + 1}%02d 12:00:00"))
          .as("partitionTime")))
    }
    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "2")
      .load(whRoot)
      .writeStream.format("noop")
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(600000L),
      "source drain did not terminate inside 600 s")
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val rows = progress.map(_.numInputRows).sum
    require(rows == 10 * perCommit,
      s"source drain read $rows rows, expected ${10 * perCommit}")
    (wall, rows, progress.size)
  }
}
