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

  test("readChangeFeed streams row-level changes: upsert = removed " +
      "pre-image + added post-image, tagged with the committing version") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "a", 2L -> "b"), day = 1)) // v1
    t.merge(Seq((2L, Some("b2")), (3L, Some("c"))).toDF("k", "v").select(
      struct($"k".as("k1")).as("key"),
      when($"v".isNotNull, struct($"v".as("f1"))).as("value"),
      $"k".as("i"), ts(1).as("partitionTime"),
      lit(0L).as("batchNumber"))) // v2: update k=2, insert k=3
    t.deleteWhere($"k1" === 1L) // v3: delete k=1
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "earliest").load(root)
      .writeStream.format("memory").queryName("ssrc_cdf")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-cdf-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val changes = spark.table("ssrc_cdf")
        .select($"k1", $"f1", $"change_type", $"_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(changes == Set(
        (1L, "a", "added", 1L), (2L, "b", "added", 1L), // v1 appends
        (2L, "b", "removed", 2L), (2L, "b2", "added", 2L), // v2 upsert
        (3L, "c", "added", 2L), // v2 insert
        (1L, "a", "removed", 3L)), // v3 delete
        s"got $changes")
      // an incremental change mid-stream arrives tagged with its version
      t.append(batch(Seq(9L -> "z"), day = 2)) // v4
      q.processAllAvailable()
      assert(spark.table("ssrc_cdf")
        .where($"_commit_version" === 4L)
        .select($"k1", $"change_type").as[(Long, String)].collect().toSet ==
        Set(9L -> "added"))
    } finally q.stop()
    // readChangeFeed without startingVersion is refused at start
    val e = intercept[Exception] {
      spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(root)
        .writeStream.format("memory").queryName("ssrc_cdf_bad")
        .option("checkpointLocation",
          Files.createTempDirectory("ssrc-cdf-ck2").toString)
        .start().processAllAvailable()
    }
    def chain(x: Throwable): Boolean = {
      var c = x; var d = 0
      while (c != null && d < 12) {
        if (String.valueOf(c.getMessage).contains("startingVersion")) return true
        c = c.getCause; d += 1
      }
      false
    }
    assert(chain(e), s"unexpected failure shape: $e")
  }

  test("maxVersionsPerTrigger bounds each catch-up batch to N versions") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "a"), day = 1)) // v1 — initial snapshot
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.format("memory").queryName("ssrc_rate")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-rate-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      // backlog: three more commits land while the stream is idle
      (2 to 4).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
      q.processAllAvailable()
      assert(spark.table("ssrc_rate").count() == 4)
      // the backlog drained as one-version batches: at least 3 separate
      // post-snapshot micro-batches, each with at most one commit's rows
      val perBatch = q.recentProgress.toSeq
        .map(p => p.numInputRows).filter(_ > 0)
      assert(perBatch.count(_ == 1L) >= 3,
        s"expected >=3 single-commit batches, got $perBatch")
    } finally q.stop()
  }

  test("scale witness: a one-commit advance scans ONLY that commit's " +
      "files — O(commit), never O(table)") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    // 20 committed appends = the table the stream is behind on
    (1 to 20).foreach { i =>
      t.append(batch((1 to 50).map(j => (i * 1000L + j) -> s"r$i"), day = i % 5 + 1))
    }
    val filesBefore = t.read().inputFiles.toSet
    t.append(batch(Seq(999999L -> "new"), day = 2))
    val newFiles = t.read().inputFiles.toSet -- filesBefore
    val cur = t.currentVersion
    val (rows, totals) = ScanMetrics.selectedByQueries(spark) {
      t.appendedBetween(cur - 1, cur).collect().length
    }
    assert(rows == 1)
    assert(totals.numFiles == newFiles.size,
      s"one-commit advance scanned ${totals.numFiles} files, the commit " +
        s"added ${newFiles.size} — the source must never rescan the table " +
        s"(${filesBefore.size} prior files)")
  }

  test("batch change-feed read: spark.read with readChangeFeed returns " +
      "the span's change set, SQL-addressable through a temp view") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "a", 2L -> "b"), day = 1)) // v1
    t.deleteWhere($"k1" === 1L) // v2
    val cdf = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "earliest")
      .load(root)
      .select($"k1", $"f1", $"change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(cdf == Set((1L, "a", "added", 1L), (2L, "b", "added", 1L),
      (1L, "a", "removed", 2L)), s"got $cdf")
    // span-bounded: only v2
    assert(spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(root).count() == 1)
    // SQL access (the Delta table_changes workflow)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW cdf_v USING graft
                 |OPTIONS (path '$root', readChangeFeed 'true',
                 |         startingVersion '1')""".stripMargin)
    assert(spark.sql(
      "SELECT count(*) FROM cdf_v WHERE change_type = 'removed'")
      .head().getLong(0) == 1L)
    // missing startingVersion refused
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("readChangeFeed", "true").load(root)
    }
  }

  test("a writer racing the stream: every committed row arrives exactly " +
      "once (snapshot-version offsets under concurrent commits)") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(0L -> "seed"), day = 1))
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("ssrc_race")
      .option("checkpointLocation",
        Files.createTempDirectory("ssrc-race-ck").toString)
      .start()
    try {
      // 15 appends land WHILE the stream drains — getOffset pins a
      // version mid-commit-storm, getBatch reads immutable manifests,
      // so no interleaving can dup or drop
      @volatile var writerErr: Option[Throwable] = None
      val writer = new Thread(() => {
        try (1 to 15).foreach { i =>
          t.append(batch(Seq(i.toLong -> s"w$i"), day = i % 3 + 1))
          Thread.sleep(30)
        } catch { case e: Throwable => writerErr = Some(e) }
      }, "racing-writer")
      writer.start()
      while (writer.isAlive) q.processAllAvailable()
      writer.join()
      assert(writerErr.isEmpty, s"writer failed: $writerErr")
      q.processAllAvailable() // drain whatever landed after the last loop
      val streamed = contents(spark.table("ssrc_race"))
      val committed = contents(spark.read.format("graft").load(root))
      assert(streamed == committed,
        s"missing=${committed -- streamed} dup/extra=${streamed -- committed}")
      assert(spark.table("ssrc_race").count() == 16L, "duplicate emission")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and self-terminates; a " +
      "second run over the same checkpoint picks up only the increments") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    (1 to 3).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    val ck = Files.createTempDirectory("ssrc-an-ck").toString
    val dstRoot = tmpRoot()
    // graft→graft: the memory sink cannot recover a checkpoint, and the
    // whole point here is the periodic re-RUN over one checkpoint
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(root)
        .withColumn("partitionTime", to_timestamp(col("_pday")))
        .drop("_pday")
        .writeStream.format("graft")
        .option("path", dstRoot).option("keys", "k1")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
    }
    // run 1: drains the 3-commit snapshot, then STOPS on its own
    // (the periodic-incremental-job pattern — no always-on cluster)
    run()
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      Set(1L -> "v1", 2L -> "v2", 3L -> "v3"))
    val versionsAfterRun1 =
      WarehouseTable.open(spark, dstRoot).currentVersion
    // two more commits land while no query is running
    t.append(batch(Seq(4L -> "v4"), day = 2))
    t.append(batch(Seq(5L -> "v5"), day = 2))
    // run 2, same checkpoint: exactly the two new commits, then stop
    run()
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      (1 to 5).map(i => i.toLong -> s"v$i").toSet,
      "resumed AvailableNow run must emit ONLY the post-checkpoint commits")
    // idle run 3: terminates with zero new destination commits
    run()
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      (1 to 5).map(i => i.toLong -> s"v$i").toSet)
    assert(versionsAfterRun1 >= 1L)
  }

  test("Trigger.AvailableNow + maxVersionsPerTrigger: the backlog drains " +
      "in bounded batches — including the FIRST post-restart trigger — " +
      "and the run still terminates") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    t.append(batch(Seq(1L -> "v1"), day = 1))
    val ck = Files.createTempDirectory("ssrc-anr-ck").toString
    val dstRoot = tmpRoot()
    def run(rate: Option[Int]): org.apache.spark.sql.streaming.StreamingQuery = {
      val r = spark.readStream.format("graft")
      val q = rate.fold(r)(n => r.option("maxVersionsPerTrigger", n.toString))
        .load(root)
        .withColumn("partitionTime", to_timestamp(col("_pday")))
        .drop("_pday")
        .writeStream.format("graft")
        .option("path", dstRoot).option("keys", "k1")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
      q
    }
    run(None)
    // 4-version backlog; the resumed run must advance 2 versions per
    // batch from the CHECKPOINTED offset (the old getOffset watermark
    // could not see it and left the first post-restart batch uncapped)
    (2 to 5).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    val q2 = run(Some(2))
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      (1 to 5).map(i => i.toLong -> s"v$i").toSet)
    val perBatch = q2.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(perBatch == Seq(2L, 2L),
      s"expected two 2-commit batches (capped from the restart offset " +
        s"on), got $perBatch")
  }

  test("checkpoint ahead of table (filesystem-level rewind): " +
      "failOnVersionRewind=false clamps latestOffset to the checkpointed " +
      "start — no end<start batch, the checkpoint stays authoritative " +
      "until the table passes it again") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    (1 to 2).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    // filesystem snapshot at version 2 (the restore-from-backup case)
    val backup = Files.createTempDirectory("ssrc-rewind").toString + "/tbl"
    copyDir(root, backup)
    (3 to 4).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    val ck = Files.createTempDirectory("ssrc-rewind-ck").toString
    val dstRoot = tmpRoot()
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("failOnVersionRewind", "false").load(root)
        .withColumn("partitionTime", to_timestamp(col("_pday")))
        .drop("_pday")
        .writeStream.format("graft")
        .option("path", dstRoot).option("keys", "k1")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
    }
    run() // checkpoint now at version 4
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      (1 to 4).map(i => i.toLong -> s"v$i").toSet)
    // restore the version-2 backup: table is now BEHIND the checkpoint
    deleteDir(root); copyDir(backup, root)
    // resume over the same checkpoint: must terminate cleanly with NO
    // new batch (offset clamped to start), not plan end < start
    run()
    assert(contents(spark.read.format("graft").load(dstRoot)) ==
      (1 to 4).map(i => i.toLong -> s"v$i").toSet,
      "rewound table must emit nothing while behind the checkpoint")
    // the table catches back up PAST the checkpoint: only the versions
    // beyond the checkpointed offset are emitted (versions up to it
    // are 'seen' by contract — the checkpoint is authoritative)
    val t2 = WarehouseTable.open(spark, root)
    (5 to 7).foreach(i => t2.append(batch(Seq(i.toLong -> s"r$i"), day = 2)))
    run() // table now at version 5 > checkpointed 4 → one new commit
    val got = contents(spark.read.format("graft").load(dstRoot))
    assert(got.contains(7L -> "r7"),
      s"post-catch-up commit must stream: $got")
  }

  test("checkpoint ahead of table: default failOnVersionRewind surfaces " +
      "the rewind as a stream failure instead of silently skipping commits") {
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    (1 to 2).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    val backup = Files.createTempDirectory("ssrc-rewindf").toString + "/tbl"
    copyDir(root, backup)
    (3 to 4).foreach(i => t.append(batch(Seq(i.toLong -> s"v$i"), day = 1)))
    val ck = Files.createTempDirectory("ssrc-rewindf-ck").toString
    val dstRoot = tmpRoot()
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(root)
        .withColumn("partitionTime", to_timestamp(col("_pday")))
        .drop("_pday")
        .writeStream.format("graft")
        .option("path", dstRoot).option("keys", "k1")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
    }
    run() // checkpoint now at version 4
    deleteDir(root); copyDir(backup, root) // table rewound to version 2
    val e = intercept[Exception] { run() }
    def chain(x: Throwable): Boolean = {
      var c = x; var d = 0
      while (c != null && d < 12) {
        if (String.valueOf(c.getMessage).contains("rewound")) return true
        c = c.getCause; d += 1
      }
      false
    }
    assert(chain(e), s"expected a loud rewind failure, got: $e")
  }

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    java.nio.file.Files.walk(s).forEach { p =>
      val d = java.nio.file.Paths.get(dst).resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(d)
      else {
        java.nio.file.Files.createDirectories(d.getParent)
        java.nio.file.Files.copy(p, d,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private def deleteDir(dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(d)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
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
