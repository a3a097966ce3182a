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

  test("explicit subscription routes from config — no topic discovery, silent topics skip") {
    val warehouse = tmp("subs-wh")
    val cfg = upsertConfig.copy(
      subscribedTopics = Seq("ds1:tbl_a", "plain", "silent"))
    val input = MemoryStream[Long](spark)
    // the batch carries only two of the three subscribed topics; the
    // silent one must produce zero flushes (isEmpty probe), not an
    // empty-table side effect
    val shaped = input.toDS().toDF("i").select(
      when($"i" % 2 === 0, lit("ds1:tbl_a")).otherwise(lit("plain")).as("topic"),
      lit(0).as("partition"),
      $"i".as("offset"),
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"),
      $"i".as("k1"),
      struct(concat(lit("v"), $"i").as("f1")).as("value"))
    val q = MergePipeline.writer(shaped, cfg, Seq("k1"),
      tmp("subs-ckpt"), t => s"$warehouse/${t.dataset}/${t.table}").start()
    try {
      input.addData(0L until 100L)
      q.processAllAvailable()
      val a = WarehouseTable.open(spark, s"$warehouse/ds1/tbl_a")
      val p = WarehouseTable.open(spark, s"$warehouse/default/plain")
      assert(a.read().count() == 50)
      assert(p.read().count() == 50)
      // the silent topic's table root was never created
      assert(!new java.io.File(s"$warehouse/default/silent").exists())
    } finally q.stop()
  }

  test("20 configured topics cost ONE discovery job, not one probe per topic") {
    // explicit subscriptions used to run a limit-1 isEmpty probe per
    // configured topic per micro-batch — 20 probe jobs here. The single
    // groupBy(topic).count discovery job replaces them AND serves the
    // merge-threshold check; total jobs must stay proportional to the
    // topics PRESENT (2), not the topics CONFIGURED (20).
    val warehouse = tmp("jobdiet-wh")
    val cfg = GraftSinkConfig(kafkaDataFieldName = Some("kafkaData"),
      subscribedTopics = (1 to 18).map(i => s"silent$i") ++ Seq("ta", "tb"))
    val batch = spark.range(100).toDF("i").select(
      when($"i" % 2 === 0, lit("ta")).otherwise(lit("tb")).as("topic"),
      lit(0).as("partition"), $"i".as("offset"),
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"),
      $"i".as("k1"),
      struct(concat(lit("v"), $"i").as("f1")).as("value"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MergePipeline.processBatch(batch, 0L, cfg, Seq("k1"),
        t => s"$warehouse/${t.dataset}/${t.table}")
      var last = -1; var now = jobs.get(); var spins = 0
      while (last != now && spins < 50) {
        last = now; Thread.sleep(200); now = jobs.get(); spins += 1
      }
      assert(jobs.get() <= 16,
        s"processBatch ran ${jobs.get()} jobs for 2 present topics — " +
          "per-configured-topic probes are back")
    } finally spark.sparkContext.removeSparkListener(listener)
    // both present topics landed; no silent-topic side effects
    assert(WarehouseTable.open(spark, s"$warehouse/default/ta").read().count() == 50)
    assert(WarehouseTable.open(spark, s"$warehouse/default/tb").read().count() == 50)
    assert(!new java.io.File(s"$warehouse/default/silent1").exists())
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

  test("R4: schema evolution propagates through the streaming merge path") {
    val warehouse = tmp("evolve-wh")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"
    def batch(withF2: Boolean, ids: Seq[Long], off: Long) =
      ids.toDF("k1").select(
        lit("t").as("topic"), lit(0).as("partition"),
        (monotonically_increasing_id() + off).as("offset"),
        to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"), $"k1",
        (if (withF2) struct(concat(lit("v"), $"k1").as("f1"), ($"k1" * 10).as("f2"))
         else struct(concat(lit("v"), $"k1").as("f1"))).as("value"))

    MergePipeline.processBatch(batch(withF2 = false, Seq(1L, 2L), 0L), 0L,
      upsertConfig, Seq("k1"), root)
    // batch 1 adds a value field mid-stream
    MergePipeline.processBatch(batch(withF2 = true, Seq(2L, 3L), 100L), 1L,
      upsertConfig, Seq("k1"), root)

    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    assert(t.schema.fieldNames.toSeq == Seq("k1", "f1", "f2"))
    val rows = t.read().select($"k1", $"f1", $"f2").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(rows == Set(
      (1L, "v1", None),        // pre-evolution row reads NULL for the new field
      (2L, "v2", Some(20L)),   // updated by the evolved batch
      (3L, "v3", Some(30L))))
    // and a later batch WITHOUT the field still merges (relaxation)
    MergePipeline.processBatch(batch(withF2 = false, Seq(4L), 200L), 2L,
      upsertConfig, Seq("k1"), root)
    assert(t.read().where($"k1" === 4L).select($"f2").collect().head.isNullAt(0))
  }

  test("U3 gate: a mid-stream added field is rejected when allowNewFields=false") {
    val warehouse = tmp("gate-wh")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"
    val cfg = upsertConfig.copy(allowNewFields = false)
    def batch(withF2: Boolean, off: Long) =
      Seq(1L).toDF("k1").select(
        lit("t").as("topic"), lit(0).as("partition"), lit(off).as("offset"),
        to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"), $"k1",
        (if (withF2) struct(lit("v").as("f1"), lit(1L).as("f2"))
         else struct(lit("v").as("f1"))).as("value"))
    MergePipeline.processBatch(batch(withF2 = false, 0L), 0L, cfg, Seq("k1"), root)
    intercept[graft.schema.SchemaEvolutionException] {
      MergePipeline.processBatch(batch(withF2 = true, 1L), 1L, cfg, Seq("k1"), root)
    }
    // table state unchanged by the rejected batch
    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    assert(t.schema.fieldNames.toSeq == Seq("k1", "f1"))
    assert(t.read().count() == 1)
  }

  test("delete-only mode routes to J3 semantics: duplicates allowed") {
    val warehouse = tmp("delonly-wh")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"
    val cfg = GraftSinkConfig(upsertEnabled = false, deleteEnabled = true,
      kafkaKeyFieldName = Some("k1"), mergeIntervalMs = 50L)
    // same key twice, no tombstone: delete-only inserts BOTH (reference
    // allows duplicates, MergeQueries.java:310-412); upsert would keep 1
    val batch = Seq((7L, 0L), (7L, 1L)).toDF("k1", "offset").select(
      lit("t").as("topic"), lit(0).as("partition"), $"offset",
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"), $"k1",
      struct(concat(lit("v"), $"offset").as("f1")).as("value"))
    MergePipeline.processBatch(batch, 0L, cfg, Seq("k1"), root)
    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    assert(t.read().count() == 2, "delete-only mode must not dedup inserts")
    // a tombstone followed by an insert for the same key: insert survives
    val batch2 = Seq((7L, 2L, false), (7L, 3L, true)).toDF("k1", "offset", "live").select(
      lit("t").as("topic"), lit(0).as("partition"), $"offset",
      to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"), $"k1",
      when($"live", struct(concat(lit("v"), $"offset").as("f1"))).as("value"))
    MergePipeline.processBatch(batch2, 1L, cfg, Seq("k1"), root)
    val vals = t.read().select($"f1").as[String].collect().toSeq
    assert(vals == Seq("v3"), s"tombstone fence failed: $vals")
  }

  test("sink config wires clustering + field partitioning into the created table") {
    val warehouse = tmp("optwire-wh")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"
    val cfg = GraftSinkConfig(
      upsertEnabled = true, deleteEnabled = true, kafkaKeyFieldName = Some("k1"),
      messageTimePartitioning = false,
      timestampPartitionFieldName = Some("ets"), timePartitioningType = "MONTH",
      clusteringFieldNames = Seq("k1"))
    cfg.validate()
    val batch = Seq((1L, 0L, "2024-01-05"), (2L, 1L, "2024-02-20"))
      .toDF("k1", "offset", "d").select(
        lit("t").as("topic"), lit(0).as("partition"), $"offset",
        to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"), $"k1",
        struct(concat(lit("v"), $"k1").as("f1"),
          to_timestamp($"d").as("ets")).as("value"))
    MergePipeline.processBatch(batch, 0L, cfg, Seq("k1"), root)
    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    assert(t.options.partitionField.contains("ets"))
    assert(t.options.granularity == "MONTH")
    assert(t.options.clusteringFields == Seq("k1"))
    assert(t.listDays() == Seq("2024-01", "2024-02"), "rows not routed by the record field")
  }

  test("T3: a 3x-threshold batch produces 3 merge flushes with correct state") {
    val warehouse = tmp("chunk-wh")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"
    val cfg = upsertConfig.copy(mergeRecordsThreshold = 100L)
    val flushes = MergePipeline.processBatch(
      kafkaShape(spark.range(300).as[Long]), 0L, cfg, Seq("k1"), root)
    assert(flushes == 3, s"expected 3 chunked flushes, got $flushes")
    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    val rows = t.read().select($"k1", $"f1").as[(Long, String)].collect()
    assert(rows.length == 300 / 4) // survivor pattern identical to unchunked
    rows.foreach { case (k, v) => assert(v == s"v${2 * k + 1}") }
  }

  test("append path: a replayed batch converges instead of duplicating") {
    val warehouse = tmp("replay-wh")
    val root = (t: TableRouter.Target) => s"$warehouse/${t.dataset}/${t.table}"
    val cfg = GraftSinkConfig(kafkaDataFieldName = Some("kafkaData"))
    val batch = kafkaShape(spark.range(40).as[Long])
    MergePipeline.processBatch(batch, 5L, cfg, Seq("k1"), root)
    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    val n1 = t.read().count()
    // foreachBatch replay: same batchId, same data
    MergePipeline.processBatch(batch, 5L, cfg, Seq("k1"), root)
    assert(t.read().count() == n1, "replayed append duplicated rows")
    // a different batch still appends
    MergePipeline.processBatch(kafkaShape(spark.range(40, 80).as[Long]), 6L, cfg, Seq("k1"), root)
    assert(t.read().count() == 2 * n1)
  }

  test("reference throughput probe: 1M records / 10 partitions / 10 merge flushes, exact survivors") {
    // the reference's one published performance figure
    // (UpsertDeleteBigQuerySinkConnectorIT.java:285-371): 1 M records,
    // key = i/2, tombstone at i%4==3, ten merge flushes, < 10 minutes.
    // ThroughputProbe verifies the exact i%4==1 survivor set internally
    // (values AND count) and throws on any violation.
    import graft.streaming.ThroughputProbe
    val (wall, survivors) = ThroughputProbe.run(
      spark, tmp("tp-wh"), tmp("tp-ckpt"), n = 1000000L, flushes = 10)
    assert(survivors == 250000L)
    info(f"1M-record streaming merge: $wall%.1f s (${1000000 / wall}%.0f rec/s; " +
      "reference budget 600 s)")
    assert(wall < 600.0,
      f"1M-record streaming merge took $wall%.1f s — outside the reference's 10-minute envelope")
  }

  test("kill-and-resume: SIGKILL mid-flush (pre-commit), resume, SIGKILL " +
      "again (post-commit, pre-checkpoint), resume — exact survivors, no dups") {
    // child-JVM probe: the halt is Runtime.halt at the exact protocol
    // window (no shutdown hooks — the in-process SIGKILL), the resume
    // is a fresh JVM on the SAME checkpoint + warehouse, and the file
    // source replays from checkpointed offsets deterministically.
    // Default tier 100k keeps the suite fast; SPARK_GRAFT_PROBE_KILL=1
    // runs the reference-scale 1 M tier.
    val n = if (sys.env.contains("SPARK_GRAFT_PROBE_KILL")) 1000000L else 100000L
    val flushes = 10
    val dataDir = tmp("kr-data")
    val warehouse = tmp("kr-wh")
    val checkpoint = tmp("kr-ckpt")
    spark.range(n).toDF("i").repartition(4)
      .write.mode("overwrite").parquet(dataDir)
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def runChild(props: Seq[String]): (Int, String) = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g", "-cp", cp) ++
        props ++ Seq("graft.streaming.KillResumeProbe",
          dataDir, warehouse, checkpoint, n.toString, flushes.toString,
          "local[8]"))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val code = proc.waitFor()
      (code, out)
    }
    // run 1: halt in flush 6's stage-written-but-unclaimed window
    val (c1, o1) = runChild(Seq("-Dgraft.probe.haltPreCommit=6"))
    assert(c1 != 0, s"pre-commit halt child exited cleanly:\n${o1.takeRight(2000)}")
    assert(o1.contains("halting JVM at injection point"),
      s"pre-commit injection never fired:\n${o1.takeRight(2000)}")
    // run 2 (resume): replays the batch, halts AFTER flush 3's table
    // commit, BEFORE the checkpoint commit
    val (c2, o2) = runChild(Seq("-Dgraft.probe.haltPostCommit=3"))
    assert(c2 != 0, s"post-commit halt child exited cleanly:\n${o2.takeRight(2000)}")
    assert(o2.contains("halting JVM at injection point"),
      s"post-commit injection never fired:\n${o2.takeRight(2000)}")
    // run 3 (resume): runs to completion and verifies the exact
    // survivor set in-child (count, value pattern, no duplicate keys)
    val (c3, o3) = runChild(Seq.empty)
    assert(c3 == 0, s"resume child failed:\n${o3.takeRight(4000)}")
    assert(o3.contains(s"PROBE_OK ${n / 4}"),
      s"resume did not verify the exact survivor set:\n${o3.takeRight(2000)}")
    // independent re-verification in the parent session
    val t = WarehouseTable.open(spark, s"$warehouse/default/t")
    assert(t.read().count() == n / 4)
    assert(t.read().groupBy($"k1").count().where($"count" > 1).count() == 0L,
      "duplicate keys after double kill-and-resume")
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
    // partitioning-mode validator: field partitioning excludes message time
    intercept[GraftConfigException](
      GraftSinkConfig(timestampPartitionFieldName = Some("ts")).validate())
    GraftSinkConfig(timestampPartitionFieldName = Some("ts"),
      messageTimePartitioning = false).validate()
    intercept[GraftConfigException](
      GraftSinkConfig(clusteringFieldNames = Seq("a", "b", "c", "d", "e")).validate())
    intercept[GraftConfigException](
      GraftSinkConfig(timePartitioningType = "WEEK").validate())
    intercept[GraftConfigException](
      GraftSinkConfig(partitionExpirationMs = Some(0L)).validate())
    GraftSinkConfig(clusteringFieldNames = Seq("a", "b"),
      timePartitioningType = "MONTH", partitionExpirationMs = Some(1000L)).validate()
  }

  test("KafkaSource.options: exact connector option map per config shape") {
    import graft.streaming.KafkaSource
    import graft.streaming.KafkaSource.{Assign, Config, TopicPattern, Topics}
    // explicit topic list → subscribe, comma-joined; defaults explicit
    assert(KafkaSource.options(
      Config("b1:9092,b2:9092", Topics(Seq("rows", "events")))) == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "rows,events",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true"))
    // regex → subscribePattern (the reference's topics.regex mode),
    // plus backpressure, offsets JSON, loss tolerance, group prefix
    assert(KafkaSource.options(
      Config("b:9092", TopicPattern("metrics-.*"),
        startingOffsets = """{"metrics-a":{"0":42}}""",
        failOnDataLoss = false,
        maxOffsetsPerTrigger = Some(100000L),
        groupIdPrefix = Some("graft"))) == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribePattern" -> "metrics-.*",
      "startingOffsets" -> """{"metrics-a":{"0":42}}""",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "100000",
      "groupIdPrefix" -> "graft"))
    // explicit partition assignment; consumer props get the kafka. prefix
    assert(KafkaSource.options(
      Config("b:9092", Assign("""{"t":[0,1]}"""),
        kafkaConsumerProps = Map(
          "security.protocol" -> "SASL_SSL",
          "kafka.session.timeout.ms" -> "30000"))) == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "assign" -> """{"t":[0,1]}""",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.session.timeout.ms" -> "30000"))
    // config-time validation, not connector-time failures
    intercept[IllegalArgumentException](Topics(Seq.empty))
    intercept[IllegalArgumentException](Topics(Seq("a,b")))
    intercept[java.util.regex.PatternSyntaxException](TopicPattern("["))
    intercept[IllegalArgumentException](Assign("not-json"))
    intercept[IllegalArgumentException](
      Config("", Topics(Seq("t"))))
    intercept[IllegalArgumentException](
      Config("b:9092", Topics(Seq("t")), startingOffsets = "beginning"))
    intercept[IllegalArgumentException](
      Config("b:9092", Topics(Seq("t")), maxOffsetsPerTrigger = Some(0L)))
    intercept[IllegalArgumentException](
      Config("b:9092", Topics(Seq("t")),
        kafkaConsumerProps = Map("kafka.bootstrap.servers" -> "x")))
    // UNPREFIXED form too: options() adds the kafka. prefix to raw
    // pass-throughs, so a bare bootstrap.servers would silently
    // override the dedicated field (props are ++'d last)
    intercept[IllegalArgumentException](
      Config("b:9092", Topics(Seq("t")),
        kafkaConsumerProps = Map("bootstrap.servers" -> "x")))
  }
}
