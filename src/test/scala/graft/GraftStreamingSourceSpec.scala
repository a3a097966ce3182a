package graft

import graft.sources.WarehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `spark.readStream.format("graft")` — the table as a streaming
  * source (the Delta streaming-table pattern, offsets = committed
  * snapshot versions). Pins:
  *
  *  - batch 0 is the full snapshot pinned at start; later batches are
  *    exactly the appended commits (file-granular, no rescan);
  *  - compaction commits are transparent (row-preserving, no dups);
  *  - a checkpoint restart resumes exactly-once — proven end-to-end by
  *    CHAINING graft→graft (source table streams into a second graft
  *    table through the streaming sink);
  *  - non-append commits fail the stream by default;
  *    `skipChangeCommits` streams past them without emitting changes;
  *  - `startingVersion` replays appends from a version on, skipping
  *    the initial snapshot;
  *  - a vacuumed-past offset fails loudly (no silent re-emission).
  */
class GraftStreamingSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val destSchema = StructType(Seq(
    StructField("k1", LongType),
    StructField("f1", StringType)))

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-ssrc").toString + "/tbl"

  private def ts(day: Int) = to_timestamp(lit(f"2024-01-$day%02d 12:00:00"))

  private def batch(rows: Seq[(Long, String)], day: Int): DataFrame =
    rows.toDF("k1", "f1").withColumn("partitionTime", ts(day))

  private def contents(df: DataFrame): Set[(Long, String)] =
    df.select($"k1", $"f1").as[(Long, String)].collect().toSet

  test("initial snapshot + incremental appends + transparent compaction " +
      "through a memory sink") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "a", 2L -> "b"), day = 1))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("ssrc_mem")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(contents(spark.table("ssrc_mem")) == Set(1L -> "a", 2L -> "b"))
      // incremental: only the appended commit's rows arrive
      t.append(batch(Seq(3L -> "c"), day = 2))
      q.processAllAvailable()
      assert(contents(spark.table("ssrc_mem")) ==
        Set(1L -> "a", 2L -> "b", 3L -> "c"))
      // compaction preserves rows: the stream must emit NOTHING for it
      t.append(batch(Seq(4L -> "d"), day = 2)) // day 2 now has 2 files
      q.processAllAvailable()
      t.compactPartitions()
      q.processAllAvailable()
      assert(spark.table("ssrc_mem").count() == 4,
        "compaction re-emitted rows")
    } finally q.stop()
  }

  test("graft→graft chaining with checkpoint restart: exactly-once end to end") {
    val srcRoot = tmpRoot()
    val dstRoot = tmpRoot()
    val ckpt = Files.createTempDirectory("ssrc-chain-ck").toString
    val src = WarehouseTable.create(spark, srcRoot, Seq("k1"), destSchema)
    src.append(batch(Seq(1L -> "a", 2L -> "b"), day = 1))
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(srcRoot)
        // derive the sink's slice time from the source's slice token
        .withColumn("partitionTime", to_timestamp(col("_pday")))
        .drop("_pday")
        .writeStream.format("graft")
        .option("path", dstRoot).option("keys", "k1")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      Set(1L -> "a", 2L -> "b"))
    // restart on the same checkpoint with one more source commit: only
    // the new rows land downstream (no initial-snapshot replay)
    src.append(batch(Seq(3L -> "c"), day = 2))
    run()
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // idle restart: zero change
    run()
    assert(spark.read.format("graft").load(dstRoot).count() == 3)
  }

  test("non-append commits fail the stream by default; skipChangeCommits " +
      "streams past them") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "a", 2L -> "b"), day = 1))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("ssrc_fail")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-ck2").toString)
      .start()
    try {
      q.processAllAvailable()
      // a merge (row change) lands in the span → the stream must FAIL,
      // not silently mis-stream
      t.merge(Seq((2L, "b2", 1L)).toDF("k", "v", "i").select(
        struct($"k".as("k1")).as("key"),
        struct($"v".as("f1")).as("value"),
        $"i", ts(1).as("partitionTime"), lit(0L).as("batchNumber")))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(x: Throwable): Boolean = {
        var c = x; var d = 0
        while (c != null && d < 12) {
          if (String.valueOf(c.getMessage).contains("skipChangeCommits"))
            return true
          c = c.getCause; d += 1
        }
        false
      }
      assert(chain(e), s"unexpected failure shape: $e")
    } finally q.stop()

    // with skipChangeCommits: fresh lineage streams the CURRENT snapshot
    // (merge applied), then appends flow and further changes are skipped
    val q2 = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.format("memory").queryName("ssrc_skip")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-ck3").toString)
      .start()
    try {
      q2.processAllAvailable()
      assert(contents(spark.table("ssrc_skip")) == Set(1L -> "a", 2L -> "b2"))
      t.deleteWhere($"k1" === 1L) // a change commit: skipped, not emitted
      t.append(batch(Seq(5L -> "e"), day = 2))
      q2.processAllAvailable()
      assert(contents(spark.table("ssrc_skip")) ==
        Set(1L -> "a", 2L -> "b2", 5L -> "e"))
    } finally q2.stop()
  }

  test("startingVersion streams appends from the version on, no snapshot") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "a"), day = 1)) // v1
    t.append(batch(Seq(2L -> "b"), day = 1)) // v2
    t.append(batch(Seq(3L -> "c"), day = 2)) // v3
    val q = spark.readStream.format("graft")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName("ssrc_sv")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-ck4").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(contents(spark.table("ssrc_sv")) == Set(2L -> "b", 3L -> "c"))
    } finally q.stop()
    // 'earliest' replays every append
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "earliest").load(root)
      .writeStream.format("memory").queryName("ssrc_all")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-ck5").toString)
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ssrc_all").count() == 3)
    } finally q2.stop()
  }

  test("a vacuumed-past resume offset fails loudly — never silent re-emission") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    (1 to 6).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    t.vacuum(retainVersions = 2)
    val e = intercept[Exception] { t.appendedBetween(1L, t.currentVersion) }
    assert(String.valueOf(e.getMessage).contains("vacuumed"), s"got: $e")
    // a retained-span read still works and is exactly the newest appends
    val cur = t.currentVersion
    assert(contents(t.appendedBetween(cur - 1, cur)) == Set(6L -> "v6"))
  }
}
