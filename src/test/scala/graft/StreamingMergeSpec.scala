package graft

import graft.sources.WarehouseTable
import graft.streaming.{GraftConfigException, GraftSinkConfig, MergePipeline, TableRouter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end streaming merge: MemoryStream → wrap → route → per-batch
  * merge-flush into on-disk WarehouseTables, reproducing the reference's
  * upsert/delete survivor pattern through the streaming path
  * (`UpsertDeleteBigQuerySinkConnectorIT.java:262-283, 362-370`): records
  * i = 0..N-1, key = i/2, tombstone at i%4==3 ⇒ survivors are exactly the
  * i%4==1 rows.
  */
class StreamingMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** i → kafka-shaped record: 10 partitions keyed by key (reference
    * topology), tombstone when i % 4 == 3.
    */
  private def kafkaShape(ids: org.apache.spark.sql.Dataset[Long]) =
    ids.toDF("i").select(
      lit("t").as("topic"),
      (($"i" / 2).cast("long") % 10).cast("int").as("partition"),
      $"i".as("offset"),
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"),
      ($"i" / 2).cast("long").as("k1"),
      when($"i" % 4 =!= 3, struct(concat(lit("v"), $"i").as("f1"))).as("value"))

  private val upsertConfig = GraftSinkConfig(
    upsertEnabled = true, deleteEnabled = true,
    kafkaKeyFieldName = Some("k1"), mergeIntervalMs = 50L)

  test("streaming upsert/delete: survivor pattern holds across 5 merge flushes") {
    val warehouse = tmp("stream-wh")
    val input = MemoryStream[Long](spark)
    val q = MergePipeline.writer(
      kafkaShape(input.toDS()), upsertConfig, Seq("k1"),
      tmp("stream-ckpt"),
      t => s"$warehouse/${t.dataset}/${t.table}").start()
    try {
      val N = 4000L
      // 5 chunks = 5 micro-batch merge flushes (reference runs 10 on 1M)
      (0 until 5).foreach { c =>
        input.addData((c * N / 5) until ((c + 1) * N / 5))
        q.processAllAvailable()
      }
      val table = WarehouseTable.open(spark, s"$warehouse/default/t")
      val rows = table.read().select($"k1", $"f1").as[(Long, String)].collect()
      assert(rows.length == N / 4) // exactly the i%4==1 rows survive
      rows.foreach { case (k, v) =>
        assert((2 * k + 1) % 4 == 1, s"unexpected survivor key $k")
        assert(v == s"v${2 * k + 1}")
      }
    } finally q.stop()
  }

  test("checkpoint restart resumes without reprocessing (exactly-once effect)") {
    val warehouse = tmp("restart-wh")
    val ckpt = tmp("restart-ckpt")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"

    val in1 = MemoryStream[Long](spark)
    val q1 = MergePipeline.writer(kafkaShape(in1.toDS()), upsertConfig,
      Seq("k1"), ckpt, root).start()
    in1.addData(0L until 400L)
    q1.processAllAvailable()
    q1.stop()

    // new query, same checkpoint: only the new offsets are processed
    val in2 = MemoryStream[Long](spark)
    in2.addData(0L until 400L)   // replayed source data, already-committed range
    in2.addData(400L until 800L)
    val q2 = MergePipeline.writer(kafkaShape(in2.toDS()), upsertConfig,
      Seq("k1"), ckpt, root).start()
    try {
      q2.processAllAvailable()
      val table = WarehouseTable.open(spark, s"$warehouse/default/t")
      val rows = table.read().select($"k1", $"f1").as[(Long, String)].collect()
      // merge is idempotent per (key, i): state equals the batch outcome
      assert(rows.length == 800 / 4)
      rows.foreach { case (k, v) => assert(v == s"v${2 * k + 1}") }
    } finally q2.stop()
  }

  test("multi-topic routing: dataset:table split and explicit map") {
    val warehouse = tmp("route-wh")
    val cfg = upsertConfig
    val input = MemoryStream[Long](spark)
    val shaped = input.toDS().toDF("i").select(
      when($"i" % 2 === 0, lit("ds1:tbl_a")).otherwise(lit("plain")).as("topic"),
      lit(0).as("partition"),
      $"i".as("offset"),
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"),
      $"i".as("k1"),
      struct(concat(lit("v"), $"i").as("f1")).as("value"))
    val q = MergePipeline.writer(shaped, cfg, Seq("k1"),
      tmp("route-ckpt"), t => s"$warehouse/${t.dataset}/${t.table}").start()
    try {
      input.addData(0L until 100L)
      q.processAllAvailable()
      val a = WarehouseTable.open(spark, s"$warehouse/ds1/tbl_a")
      val p = WarehouseTable.open(spark, s"$warehouse/default/plain")
      assert(a.read().count() == 50)
      assert(p.read().count() == 50)
    } finally q.stop()
  }

  test("non-upsert mode appends with kafka metadata and key embedding") {
    val warehouse = tmp("append-wh")
    val cfg = GraftSinkConfig(
      kafkaDataFieldName = Some("kafkaData"), kafkaKeyFieldName = Some("recordKey"))
    val input = MemoryStream[Long](spark)
    val q = MergePipeline.writer(kafkaShape(input.toDS()), cfg, Seq("k1"),
      tmp("append-ckpt"), t => s"$warehouse/${t.dataset}/${t.table}").start()
    try {
      input.addData(0L until 40L)
      q.processAllAvailable()
      val t = WarehouseTable.open(spark, s"$warehouse/default/t")
      val df = t.read()
      // P2: tombstones dropped in non-delete mode → 3/4 of rows land
      assert(df.count() == 30)
      assert(df.columns.contains("kafkaData") && df.columns.contains("recordKey"))
      assert(df.select($"kafkaData.topic").distinct().as[String].collect().toSeq == Seq("t"))
    } finally q.stop()
  }

  // ---- router unit cases (BigQuerySinkTask.java:180-245)
  test("TableRouter: map override, dataset split, sanitize fallback") {
    val base = GraftSinkConfig(defaultDataset = "dd")
    assert(TableRouter.route("plain", base) == TableRouter.Target("dd", "plain"))
    assert(TableRouter.route("ds:tb", base) == TableRouter.Target("ds", "tb"))
    assert(TableRouter.route("top", base.copy(topic2TableMap = Map("top" -> "custom")))
      == TableRouter.Target("dd", "custom"))
    // unmapped topic falls back to topic name when a map exists
    assert(TableRouter.route("other", base.copy(topic2TableMap = Map("top" -> "custom")))
      == TableRouter.Target("dd", "other"))
    assert(TableRouter.route("weird-topic!", base.copy(sanitizeTableNames = true))
      == TableRouter.Target("dd", "weird_topic_"))
    intercept[GraftConfigException](TableRouter.route("a:b:c", base))
  }

  // ---- config validator chain (UpsertDeleteValidator.java:48-73)
  test("config validation gates") {
    GraftSinkConfig().validate() // defaults fine
    intercept[GraftConfigException](
      GraftSinkConfig(upsertEnabled = true).validate()) // missing key field
    intercept[GraftConfigException](
      GraftSinkConfig(upsertEnabled = true, kafkaKeyFieldName = Some("k"),
        mergeIntervalMs = -1, mergeRecordsThreshold = -1).validate())
    intercept[GraftConfigException](
      GraftSinkConfig(upsertEnabled = true, kafkaKeyFieldName = Some("k"),
        mergeIntervalMs = 0).validate())
    // one of the two disabled is fine
    GraftSinkConfig(upsertEnabled = true, kafkaKeyFieldName = Some("k"),
      mergeIntervalMs = -1, mergeRecordsThreshold = 1000).validate()
  }
}
