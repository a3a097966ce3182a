package graft

import graft.schema.{EvolutionPolicy, SchemaEvolutionException}
import graft.sources.{Retry, StagedLoader, WarehouseTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** S4/S5 staged NDJSON load path + R1/R3 retry/adaptive-schema tests
  * (reference: GCSToBQWriter/GCSToBQLoadRunnable/AdaptiveBigQueryWriter).
  */
class StagedLoaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val destSchema = StructType(Seq(
    StructField("k1", LongType), StructField("f1", StringType)))

  test("stage + load cycle: NDJSON blobs land in the table, blobs deleted") {
    val staging = tmp("stage")
    val whRoot = tmp("wh") + "/tbl"
    WarehouseTable.create(spark, whRoot, Seq("k1"), destSchema)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k1", "f1")
      .withColumn("partitionTime", to_timestamp(lit("2024-02-01 08:00:00")))
    val blob = StagedLoader.stageBatch(batch, staging, "tbl")
    assert(new java.io.File(blob).listFiles().exists(_.getName.endsWith(".json")))

    val results = StagedLoader.runOnce(spark, staging, _ => whRoot)
    assert(results == Seq(StagedLoader.LoadResult("tbl", 1, 2L, 0)))
    val t = WarehouseTable.open(spark, whRoot)
    assert(t.read().select($"k1").as[Long].collect().toSet == Set(1L, 2L))
    assert(!new java.io.File(blob).exists()) // claimed blob deleted
  }

  test("load quota defers blobs beyond maxFilesPerLoad to the next cycle") {
    val staging = tmp("stage-q")
    val whRoot = tmp("wh-q") + "/tbl"
    WarehouseTable.create(spark, whRoot, Seq("k1"), destSchema)
    (0 until 3).foreach { b =>
      StagedLoader.stageBatch(
        Seq((b.toLong, s"v$b")).toDF("k1", "f1")
          .coalesce(1)
          .withColumn("partitionTime", to_timestamp(lit("2024-02-01 08:00:00"))),
        staging, "tbl")
    }
    val r1 = StagedLoader.runOnce(spark, staging, _ => whRoot, maxFilesPerLoad = 2)
    assert(r1.head.blobsLoaded == 2 && r1.head.blobsDeferred == 1)
    val r2 = StagedLoader.runOnce(spark, staging, _ => whRoot, maxFilesPerLoad = 2)
    assert(r2.head.blobsLoaded == 1 && r2.head.blobsDeferred == 0)
    assert(WarehouseTable.open(spark, whRoot).read().count() == 3)
  }

  test("withRetry retries transient IO and gives up after maxRetries") {
    var calls = 0
    val out = Retry.withRetry(maxRetries = 3, waitMs = 1, jitterMs = 1) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3)

    var calls2 = 0
    intercept[java.io.IOException] {
      Retry.withRetry(maxRetries = 2, waitMs = 1, jitterMs = 1) {
        calls2 += 1
        throw new java.io.IOException("always")
      }
    }
    assert(calls2 == 3) // initial + 2 retries

    // non-retryable surfaces immediately
    var calls3 = 0
    intercept[IllegalArgumentException] {
      Retry.withRetry(maxRetries = 5, waitMs = 1, jitterMs = 1) {
        calls3 += 1
        throw new IllegalArgumentException("logic")
      }
    }
    assert(calls3 == 1)
  }

  test("error taxonomy: each storage-I/O class gets its own retry verdict") {
    import Retry._
    // one injected fault per class — the classifier must pick the
    // SUBCLASS verdict even though most of these extend IOException
    val matrix: Seq[(Throwable, ErrorClass)] = Seq(
      (new java.net.SocketTimeoutException("read timed out"), ReadTimeout),
      (new java.util.concurrent.TimeoutException("future"), ReadTimeout),
      (new org.apache.hadoop.fs.ChecksumException("bad crc", 0L), CorruptRead),
      (new java.io.FileNotFoundException("part-0000 vanished mid-swap"),
        PartialVisibility),
      (new java.io.IOException("connection reset"), TransientIo),
      (new org.apache.hadoop.security.AccessControlException("denied"),
        AccessDenied),
      (new java.io.InterruptedIOException("task killed"), Cancelled),
      (new graft.streaming.GraftConfigException("bad config"), Logic),
      (new IllegalStateException("???"), Unknown))
    matrix.foreach { case (t, expected) =>
      assert(classify(t) == expected, s"misclassified ${t.getClass.getName}")
      assert(isRetryable(t) == expected.retryable, t.getClass.getName)
    }
    // wrapped causes unwrap: Spark-style wrapping keeps the verdict
    assert(classify(new RuntimeException("wrapper",
      new org.apache.hadoop.fs.ChecksumException("inner", 1L))) == CorruptRead)
    assert(classify(new RuntimeException("wrapper",
      new org.apache.hadoop.security.AccessControlException("inner"))) == AccessDenied)

    // behavior under withRetry: transient classes spend retry budget...
    var checksumCalls = 0
    val ok = withRetry(maxRetries = 2, waitMs = 1, jitterMs = 1) {
      checksumCalls += 1
      if (checksumCalls == 1) throw new org.apache.hadoop.fs.ChecksumException("crc", 0L)
      "recovered"
    }
    assert(ok == "recovered" && checksumCalls == 2)
    var fnfCalls = 0
    val ok2 = withRetry(maxRetries = 2, waitMs = 1, jitterMs = 1) {
      fnfCalls += 1
      if (fnfCalls == 1) throw new java.io.FileNotFoundException("swap window")
      "visible"
    }
    assert(ok2 == "visible" && fnfCalls == 2)
    // ...permanent classes fail on the FIRST attempt even though they
    // extend IOException (the coarse type test would have looped here)
    var deniedCalls = 0
    intercept[org.apache.hadoop.security.AccessControlException] {
      withRetry(maxRetries = 5, waitMs = 1, jitterMs = 1) {
        deniedCalls += 1
        throw new org.apache.hadoop.security.AccessControlException("denied")
      }
    }
    assert(deniedCalls == 1)
  }

  test("adaptiveAppend evolves schema for new fields, rejects when gated") {
    val whRoot = tmp("wh-a") + "/tbl"
    val t = WarehouseTable.create(spark, whRoot, Seq("k1"), destSchema)
    val widened = Seq((1L, "a", 3.5)).toDF("k1", "f1", "f2")
      .withColumn("partitionTime", to_timestamp(lit("2024-02-01 08:00:00")))
    Retry.adaptiveAppend(t, widened)
    assert(t.schema.fieldNames.contains("f2"))
    assert(t.read().select($"f2").as[Double].collect().toSeq == Seq(3.5))

    // gated: new field with evolution disabled → SchemaEvolutionException
    val more = Seq((2L, "b", 1.0, true)).toDF("k1", "f1", "f2", "f3")
      .withColumn("partitionTime", to_timestamp(lit("2024-02-01 08:00:00")))
    intercept[SchemaEvolutionException] {
      Retry.adaptiveAppend(t, more, EvolutionPolicy(allowNewFields = false))
    }
  }
}
