package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Mid-stream schema evolution through `writeStream.format("graft")`
  * (r13 VERDICT "Next round" #7) — the engine-side analog of the
  * reference's adaptive writer, which widens the destination table when
  * a batch's records carry a new field and retries the same batch
  * without a connector restart
  * (kcbq-connector/.../write/row/AdaptiveBigQueryWriter.java:84-148).
  *
  * Spark's generic sink sees one schema per QUERY lineage, but the
  * graft sink re-derives the observed schema per BATCH (addBatch →
  * evolveSchema), so both shapes are pinned here:
  *
  *  - RESTART-FREE: batch N of one sink instance carries a new field —
  *    the table widens mid-lineage, no restart, earlier rows read back
  *    NULL for the new field (tested through addBatch directly, the
  *    only way to hand one lineage two schemas without a Kafka-style
  *    dynamic source);
  *  - CROSS-RESTART: the public writeStream API, same checkpoint, the
  *    source widened between runs — the continuation batch evolves the
  *    table and replays stay no-ops;
  *  - the all-NULL backfill is pinned AT EVERY VERSION that knows the
  *    field (time travel conforms old snapshots to the current schema).
  */
class StreamingSinkEvolveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-evolve").toString + "/tbl"

  private def ts(day: Int) = to_timestamp(lit(f"2024-01-$day%02d 12:00:00"))

  test("restart-free evolve: a new field in batch N widens the table " +
      "mid-lineage; prior rows backfill NULL at every version") {
    val root = tmpRoot()
    val sink = new GraftDataSource().createSink(spark.sqlContext,
      Map("path" -> root, "keys" -> "k1",
        "checkpointLocation" -> Files.createTempDirectory("ck-ev").toString),
      Nil, OutputMode.Append())

    def classic(df: DataFrame) =
      df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]

    // batch 0: (k1, f1)
    sink.addBatch(0, classic(
      Seq(1L -> "a", 2L -> "b").toDF("k1", "f1")
        .withColumn("partitionTime", ts(1))))
    val t = WarehouseTable.open(spark, root)
    assert(!t.schema.fieldNames.contains("f2"))
    val v1 = t.currentVersion

    // batch 1: (k1, f1, f2) — the new field appears MID-LINEAGE, no
    // restart, same sink instance
    sink.addBatch(1, classic(
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("k1", "f1", "f2")
        .withColumn("partitionTime", ts(2))))

    val evolved = WarehouseTable.open(spark, root)
    assert(evolved.schema.fieldNames.contains("f2"),
      s"table did not widen: ${evolved.schema.treeString}")
    // live read: old rows NULL, new rows carry values
    val live = evolved.read()
      .select($"k1", $"f2").as[(Long, Option[Long])].collect().toMap
    assert(live == Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))

    // batch 2: a LATE batch still arriving with the OLD narrow schema —
    // the reference tolerates interleaved old-schema writers; rows land
    // with the missing field conformed to NULL
    sink.addBatch(2, classic(
      Seq(5L -> "e").toDF("k1", "f1").withColumn("partitionTime", ts(2))))
    assert(WarehouseTable.open(spark, root).read()
      .where($"k1" === 5L).select($"f2").head().isNullAt(0))

    // every post-evolve version conforms the pre-evolve rows to NULL
    val t2 = WarehouseTable.open(spark, root)
    (v1 to t2.currentVersion).foreach { v =>
      val asOf = t2.readAsOf(v)
      if (asOf.columns.contains("f2")) {
        val nulls = asOf.where($"k1".isin(1L, 2L) && $"f2".isNull).count()
        val present = asOf.where($"k1".isin(1L, 2L)).count()
        assert(nulls == present,
          s"version $v: pre-evolve rows must read f2 as NULL")
      }
    }
  }

  test("cross-restart evolve through the public API: same checkpoint, " +
      "widened source — continuation evolves, replays stay no-ops") {
    val root = tmpRoot()
    val srcDir = Files.createTempDirectory("graft-ev-src").toString
    val ckpt = Files.createTempDirectory("graft-ev-ckpt").toString

    Seq(1L -> "a").toDF("k1", "f1").coalesce(1)
      .write.parquet(s"$srcDir/f1")
    def run(schema: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
        .withColumn("partitionTime", ts(1))
        .writeStream.format("graft")
        .option("path", root).option("keys", "k1")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run("k1 LONG, f1 STRING")
    assert(!WarehouseTable.open(spark, root).schema.fieldNames.contains("f2"))

    // widen the source, restart on the SAME checkpoint
    Seq((2L, "b", 20L)).toDF("k1", "f1", "f2").coalesce(1)
      .write.parquet(s"$srcDir/f2")
    run("k1 LONG, f1 STRING, f2 LONG")
    val t = WarehouseTable.open(spark, root)
    assert(t.schema.fieldNames.contains("f2"))
    val got = t.read().select($"k1", $"f2")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(20L)))

    // replay restart: nothing new, nothing duplicated, schema stable
    run("k1 LONG, f1 STRING, f2 LONG")
    assert(WarehouseTable.open(spark, root).read().count() == 2)
  }
}
