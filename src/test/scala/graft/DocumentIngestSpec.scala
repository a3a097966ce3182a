package graft

import graft.streaming.DocumentIngestPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end corpus ingest: streaming horizon dedup + within-batch
  * dedup + insert-if-absent against table history, exactly-once under
  * replay.
  */
class DocumentIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(): String = Files.createTempDirectory("ingest").toString

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")

  test("processBatch: within-batch dup picks min id; history dup dropped; replay converges") {
    val root = tmpDir() + "/corpus"
    DocumentIngestPipeline.processBatch(
      docs((3L, "alpha", "2024-03-01 10:00:02"), (1L, "alpha", "2024-03-01 10:00:00"),
        (2L, "beta", "2024-03-01 10:00:01")), root)
    val t1 = graft.sources.WarehouseTable.open(spark, root).read()
      .select($"id", $"text").as[(Long, String)].collect().toSet
    assert(t1 == Set((1L, "alpha"), (2L, "beta")))
    // second crawl: one dup against history, one fresh doc
    val b2 = docs((10L, "alpha", "2024-03-05 09:00:00"), (11L, "gamma", "2024-03-05 09:00:01"))
    DocumentIngestPipeline.processBatch(b2, root)
    val t2 = graft.sources.WarehouseTable.open(spark, root).read()
      .select($"id", $"text").as[(Long, String)].collect().toSet
    assert(t2 == Set((1L, "alpha"), (2L, "beta"), (11L, "gamma")))
    // at-least-once replay of the same batch: no duplicates appear
    DocumentIngestPipeline.processBatch(b2, root)
    assert(graft.sources.WarehouseTable.open(spark, root).read().count() == 3)
  }

  test("streaming ingest: horizon dedup + corpus dedup through a MemoryStream") {
    val root = tmpDir() + "/corpus_s"
    val ckpt = tmpDir() + "/ckpt"
    val input = MemoryStream[(Long, String, String)](spark)
    val shaped = input.toDF().toDF("id", "text", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val q = DocumentIngestPipeline.writer(shaped, root, ckpt).start()
    try {
      input.addData((1L, "doc one", "2024-03-01 10:00:00"),
        (2L, "doc two", "2024-03-01 10:00:01"),
        (3L, "doc one", "2024-03-01 10:00:02")) // within-batch dup
      q.processAllAvailable()
      input.addData((4L, "doc one", "2024-03-01 10:02:00"), // horizon dup
        (5L, "doc three", "2024-03-01 10:02:01"))
      q.processAllAvailable()
      val state = graft.sources.WarehouseTable.open(spark, root).read()
        .select($"text").as[String].collect().sorted.toSeq
      assert(state == Seq("doc one", "doc three", "doc two"))
      val ids = graft.sources.WarehouseTable.open(spark, root).read()
        .select($"id").as[Long].collect().toSet
      assert(Set(1L, 2L, 5L).subsetOf(ids) || Set(3L, 2L, 5L).subsetOf(ids),
        s"unexpected survivor ids $ids")
    } finally q.stop()
  }
}
