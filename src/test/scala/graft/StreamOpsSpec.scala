package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.KeyedValue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked windowed aggregation + keyed state: value assertions in
  * batch mode (the window plan is mode-agnostic), state behavior through
  * a real MemoryStream query.
  */
class StreamOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("windowedIngestCounts: tumbling windows split rows by event time") {
    val rows = Seq(
      ("t", 0, 0L, "2024-03-01 10:00:10"),
      ("t", 0, 1L, "2024-03-01 10:00:50"),
      ("t", 1, 2L, "2024-03-01 10:01:10"),
      ("u", 0, 0L, "2024-03-01 10:00:30"))
      .toDF("topic", "partition", "offset", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val out = StreamOps.windowedIngestCounts(rows)
      .select($"window_start".cast("string"), $"topic", $"n_rows", $"max_offset")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("2024-03-01 10:00:00", "t", 2L, 1L),
      ("2024-03-01 10:01:00", "t", 1L, 2L),
      ("2024-03-01 10:00:00", "u", 1L, 0L)))
  }

  test("windowedIngestCounts streams: watermark closes windows in append mode") {
    val input = MemoryStream[(String, Int, Long, String)](spark)
    val shaped = input.toDF().toDF("topic", "partition", "offset", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val q = StreamOps.windowedIngestCounts(shaped, "1 minute", "1 minute")
      .writeStream.format("memory").queryName("ingest_counts")
      .outputMode("append").start()
    try {
      input.addData(("t", 0, 0L, "2024-03-01 10:00:10"))
      q.processAllAvailable()
      // advance the watermark far past the first window so it closes
      input.addData(("t", 0, 1L, "2024-03-01 10:30:00"))
      q.processAllAvailable()
      input.addData(("t", 0, 2L, "2024-03-01 10:31:00"))
      q.processAllAvailable()
      val closed = spark.table("ingest_counts")
        .select($"window_start".cast("string"), $"n_rows")
        .as[(String, Long)].collect().toMap
      assert(closed.get("2024-03-01 10:00:00").contains(1L),
        s"first window never closed: $closed")
    } finally q.stop()
  }

  test("session_window streams: gap sessions close under the watermark in append mode") {
    // the exact plan shape of the a6_session_window query, fed by a
    // stream: sessions emit only once the watermark passes their close
    val input = MemoryStream[(Long, String, Double)](spark)
    val shaped = input.toDF().toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp($"s")).drop("s")
      .withWatermark("ts", "1 minute")
    val agg = shaped
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
      .select($"user_id", $"session_window.start".cast("string").as("start"),
        $"session_window.end".cast("string").as("end"), $"n_events", $"total_value")
    val q = agg.writeStream.format("memory").queryName("sess_win")
      .outputMode("append").start()
    try {
      // two events 10 min apart -> one session; a third 2h later both
      // advances the watermark (closing it) and opens a new session
      input.addData((1L, "2024-03-01 10:00:00", 1.0), (1L, "2024-03-01 10:10:00", 2.0))
      q.processAllAvailable()
      input.addData((1L, "2024-03-01 12:00:00", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess_win")
        .as[(Long, String, String, Long, Double)].collect().toSet
      // merged session: start 10:00, end = last event + gap = 10:40
      assert(closed == Set((1L, "2024-03-01 10:00:00", "2024-03-01 10:40:00", 2L, 3.0)),
        s"unexpected closed sessions: $closed")
      // the 12:00 session is still open (watermark at 11:59) — not emitted
    } finally q.stop()
  }

  test("intervalJoin batch: right rows within the lookback enrich the left") {
    val clicks = Seq((1L, "c1", "2024-03-01 10:00:30"), (1L, "c2", "2024-03-01 10:02:00"),
      (2L, "c3", "2024-03-01 10:00:40"))
      .toDF("user_id", "click", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val imps = Seq((1L, "i1", "2024-03-01 10:00:00"), (1L, "i2", "2024-03-01 10:01:55"),
      (2L, "i3", "2024-03-01 10:10:00"))
      .toDF("user_id", "imp", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val out = StreamOps.intervalJoin(clicks, imps, "user_id", lookbackSeconds = 60)
      .select($"click", $"imp").as[(String, String)].collect().toSet
    // c1 sees i1 (30s before); c2 sees i2 (5s before) but NOT i1 (120s);
    // c3 sees nothing (i3 is after it)
    assert(out == Set(("c1", "i1"), ("c2", "i2")))
  }

  test("intervalJoin streams: joins emit in append mode with bounded state") {
    val clicks = MemoryStream[(Long, String, String)](spark)
    val imps = MemoryStream[(Long, String, String)](spark)
    def shape(df: org.apache.spark.sql.DataFrame, v: String) =
      df.toDF("user_id", v, "s").withColumn("timestamp", to_timestamp($"s")).drop("s")
    val q = StreamOps.intervalJoin(
      shape(clicks.toDF(), "click"), shape(imps.toDF(), "imp"),
      "user_id", lookbackSeconds = 60, watermarkDelay = "1 minute")
      .select($"click", $"imp")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      imps.addData((1L, "i1", "2024-03-01 10:00:00"))
      clicks.addData((1L, "c1", "2024-03-01 10:00:30"))
      q.processAllAvailable()
      imps.addData((1L, "i2", "2024-03-01 10:05:00"))
      clicks.addData((1L, "c2", "2024-03-01 10:05:30"))
      q.processAllAvailable()
      val got = spark.table("ij").as[(String, String)].collect().toSet
      assert(got == Set(("c1", "i1"), ("c2", "i2")))
    } finally q.stop()
  }

  test("intervalJoin left_outer: unmatched lefts emit with NULL once the watermark passes") {
    val clicks = MemoryStream[(Long, String, String)](spark)
    val imps = MemoryStream[(Long, String, String)](spark)
    def shape(df: org.apache.spark.sql.DataFrame, v: String) =
      df.toDF("user_id", v, "s").withColumn("timestamp", to_timestamp($"s")).drop("s")
    val q = StreamOps.intervalJoin(
      shape(clicks.toDF(), "click"), shape(imps.toDF(), "imp"),
      "user_id", lookbackSeconds = 60, watermarkDelay = "1 minute",
      joinType = "left_outer")
      .select($"click", $"imp")
      .writeStream.format("memory").queryName("ij_outer").outputMode("append").start()
    try {
      imps.addData((1L, "i1", "2024-03-01 10:00:00"))
      clicks.addData((1L, "c1", "2024-03-01 10:00:30")) // matches i1
      clicks.addData((2L, "c2", "2024-03-01 10:00:40")) // no impression at all
      q.processAllAvailable()
      // push the watermark far past c2's eviction horizon so the outer
      // row is finalized as unmatched
      clicks.addData((9L, "late", "2024-03-01 10:30:00"))
      imps.addData((9L, "ilate", "2024-03-01 10:30:00"))
      q.processAllAvailable()
      clicks.addData((9L, "late2", "2024-03-01 10:40:00"))
      q.processAllAvailable()
      val got = spark.table("ij_outer").as[(String, String)].collect().toMap
      assert(got.get("c1").contains("i1"))
      assert(got.contains("c2") && got("c2") == null,
        s"unmatched left row not emitted with NULL: $got")
    } finally q.stop()
  }

  test("dedupConsecutive: re-delivered identical values are suppressed across batches") {
    val input = MemoryStream[KeyedValue](spark)
    val q = StreamOps.dedupConsecutive(input.toDS())
      .writeStream.format("memory").queryName("dedup_cc")
      .outputMode("append").start()
    try {
      input.addData(KeyedValue("a", 0L, "v1"), KeyedValue("a", 1L, "v1"),
        KeyedValue("b", 0L, "x"))
      q.processAllAvailable()
      input.addData(KeyedValue("a", 2L, "v1")) // still unchanged → no output
      q.processAllAvailable()
      input.addData(KeyedValue("a", 3L, "v2"), KeyedValue("b", 1L, "x"))
      q.processAllAvailable()
      val out = spark.table("dedup_cc").as[KeyedValue].collect()
        .map(r => (r.key, r.offset, r.value)).toSet
      assert(out == Set(("a", 0L, "v1"), ("b", 0L, "x"), ("a", 3L, "v2")))
    } finally q.stop()
  }

  test("streaming ddSketch: per-batch sketches merge to the whole-stream sketch") {
    // the mergeable-summary contract under a stream: each micro-batch
    // builds its own quantile sketch, ddMerge folds it into the running
    // one, and after N batches the accumulated sketch is CELL-IDENTICAL
    // to sketching the concatenated stream — so quantile reads off the
    // running sketch inherit the batch-mode error bound
    import graft.operators.SketchOps
    val input = MemoryStream[(String, Long)](spark)
    var acc: Option[org.apache.spark.sql.DataFrame] = None
    val q = input.toDF().toDF("key", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sk = SketchOps.ddSketch(batch, "key", "v").localCheckpoint(true)
        acc = Some(acc.map(SketchOps.ddMerge(_, sk).localCheckpoint(true))
          .getOrElse(sk))
        ()
      }.start()
    val all = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    try {
      val rnd = new scala.util.Random(5)
      (1 to 3).foreach { _ =>
        val rows = (1 to 200).map(_ =>
          ("k" + rnd.nextInt(2), (rnd.nextInt(10000) + 1).toLong))
        all ++= rows
        input.addData(rows: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = acc.get.as[(String, Int, Long)].collect().toSet
    val whole = SketchOps.ddSketch(all.toSeq.toDF("key", "v"), "key", "v")
      .as[(String, Int, Long)].collect().toSet
    assert(streamed == whole, "accumulated stream sketch diverged from batch sketch")
    // and a quantile read off the streamed sketch respects the bound
    val p50 = SketchOps.ddQuantiles(acc.get, Seq(("p50", 1, 2)))
      .as[(String, String, Int, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    all.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      val truth = sorted((sorted.size + 1) / 2 - 1).toDouble
      assert(math.abs(p50(k) - truth) <= truth * 0.0625 + 1e-9,
        s"$k: streamed p50 ${p50(k)} vs $truth")
    }
  }

  test("dedupContent streams: identical content suppressed across batches within the horizon") {
    val input = MemoryStream[(Long, String, String)](spark)
    val shaped = input.toDF().toDF("id", "text", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val q = StreamOps.dedupContent(shaped, "text", horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_content")
      .outputMode("append").start()
    try {
      input.addData((1L, "doc alpha", "2024-03-01 10:00:00"),
        (2L, "doc beta", "2024-03-01 10:00:01"),
        (3L, "doc alpha", "2024-03-01 10:00:02")) // within-batch dup
      q.processAllAvailable()
      // cross-batch re-delivery inside the horizon → suppressed
      input.addData((4L, "doc alpha", "2024-03-01 10:05:00"))
      q.processAllAvailable()
      input.addData((5L, "doc gamma", "2024-03-01 10:06:00"))
      q.processAllAvailable()
      val texts = spark.table("dedup_content").select($"text")
        .as[String].collect().toSeq
      assert(texts.sorted == Seq("doc alpha", "doc beta", "doc gamma"),
        s"got $texts")
    } finally q.stop()
  }

  test("stream-static join: each micro-batch enriches against the static dim") {
    // the canonical streaming enrich: no state, no watermark needed —
    // the static side is (re)planned per micro-batch, so at scale the
    // dim is a broadcast per batch, never stream-buffered state
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Double)](spark)
    val q = input.toDF().toDF("user_id", "amount")
      .join(dim, Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (3L, 5.0))
      q.processAllAvailable()
      input.addData((2L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select($"user_id", $"amount", $"tier")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) null else r.getString(2))).toSet
      assert(rows == Set((1L, 10.0, "gold"), (3L, 5.0, null), (2L, 7.0, "silver")))
    } finally q.stop()
  }

  test("dedupContent on a batch frame dedups by content") {
    val df = Seq((1L, "a", "2024-03-01 10:00:00"), (2L, "a", "2024-03-01 10:00:01"),
      (3L, "b", "2024-03-01 10:00:02")).toDF("id", "text", "s")
      .withColumn("timestamp", to_timestamp($"s")).drop("s")
    val out = StreamOps.dedupContent(df, "text")
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("id", "text", "timestamp"))
  }

  test("sessionSummaries: event-time timers close idle sessions exactly once") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Double, String)](spark)
      val shaped = input.toDF().toDF("k", "v", "s")
        .withColumn("timestamp", to_timestamp($"s")).drop("s")
      val q = StreamOps.sessionSummaries(shaped, "k", "v", "timestamp",
          gapMs = 60000L)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").start()
      try {
        // session "a": two events 30s apart (same session); "b": one event
        input.addData(("a", 1.0, "2024-03-01 10:00:00"),
          ("a", 2.0, "2024-03-01 10:00:30"), ("b", 7.0, "2024-03-01 10:00:10"))
        q.processAllAvailable()
        // watermark still at the batch max (10:00:30) < deadline — open
        assert(spark.table("sessions").isEmpty)
        // advance the watermark far past both deadlines → both close
        input.addData(("c", 0.0, "2024-03-01 10:30:00"))
        q.processAllAvailable()
        input.addData(("c", 0.0, "2024-03-01 10:31:00")) // let c's own timer arm
        q.processAllAvailable()
        val closed = spark.table("sessions")
          .select($"key", $"n", $"total", $"firstMs", $"lastMs")
          .as[(String, Long, Double, Long, Long)].collect().toSet
        val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime
        assert(closed == Set(
          ("a", 2L, 3.0, t0, t0 + 30000L),
          ("b", 1L, 7.0, t0 + 10000L, t0 + 10000L)),
          s"unexpected closed sessions: $closed")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("runningProfile accumulates per-key state across batches (transformWithState)") {
    import graft.streaming.StreamOps.KeyedMetric
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedMetric](spark)
      val q = StreamOps.runningProfile(input.toDS())
        .writeStream.format("memory").queryName("profiles")
        .outputMode("update").start()
      try {
        input.addData(KeyedMetric("a", 1.0), KeyedMetric("a", 3.0),
          KeyedMetric("b", -2.0))
        q.processAllAvailable()
        input.addData(KeyedMetric("a", 5.0))
        q.processAllAvailable()
        val rows = spark.table("profiles")
          .select($"key", $"n", $"total", $"vmin", $"vmax")
          .as[(String, Long, Double, Double, Double)].collect()
        // Update mode re-emits per batch: the LAST emission per key is
        // the accumulated profile — batch 2 must see batch 1's state
        val last = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
        assert(last("a") == ("a", 3L, 9.0, 1.0, 5.0),
          s"state did not carry across batches: ${rows.toSeq}")
        assert(last("b") == ("b", 1L, -2.0, -2.0, -2.0))
        // batch 1 emitted the intermediate profile for "a" as well
        assert(rows.contains(("a", 2L, 4.0, 1.0, 3.0)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("throttleStream: suppression clock carries across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Long, Long)](spark)
      val df = input.toDF().toDF("k", "us", "id")
        .select($"k", timestamp_micros($"us").as("ts"), $"id")
      val q = StreamOps.throttleStream(df, "k", "ts", "id",
          cooldownSeconds = 10)
        .writeStream.format("memory").queryName("throttled")
        .outputMode("append").start()
      try {
        def s(n: Long) = n * 1000000L
        // batch 1: a@0 kept, a@5 suppressed; b@0 kept
        input.addData(("a", s(0), 1L), ("a", s(5), 2L), ("b", s(0), 3L))
        q.processAllAvailable()
        // batch 2: a@12 kept (12-0 >= 10); b@4 SUPPRESSED only if the
        // clock survived the batch boundary; b@11 kept
        input.addData(("a", s(12), 4L), ("b", s(4), 5L), ("b", s(11), 6L))
        q.processAllAvailable()
        val got = spark.table("throttled")
          .select($"key", $"tie").as[(String, Long)].collect().toSet
        assert(got == Set(("a", 1L), ("b", 3L), ("a", 4L), ("b", 6L)),
          s"streamed keep-set wrong: $got")
        // exact agreement with the batch operator over the union
        val all = Seq(("a", s(0), 1L), ("a", s(5), 2L), ("b", s(0), 3L),
          ("a", s(12), 4L), ("b", s(4), 5L), ("b", s(11), 6L))
          .toDF("k", "us", "id")
          .select($"k", timestamp_micros($"us").as("ts"), $"id")
        val batch = graft.operators.TemporalOps.throttle(
            all, Seq("k"), "ts", "id", cooldownSeconds = 10)
          .select($"k", $"id").as[(String, Long)].collect().toSet
        assert(got == batch, s"stream $got != batch $batch")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("cusumStream: fold state carries across batches and matches the batch operator exactly") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // integer-valued doubles → every partial sum exact → batch μ and
      // both folds are bit-equal (the operators' documented contract)
      val b1 = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("b", 1L, 5.0))
      val b2 = Seq(("a", 3L, 30.0), ("a", 4L, 30.0), ("b", 2L, 5.0),
        ("b", 3L, 50.0), ("b", 4L, 5.0))
      val all = b1 ++ b2
      // the stream's in-control mean is config; feed it the batch
      // operator's own μ = Σx/n so the two must agree bit-for-bit
      val mus = all.groupBy(_._1).map { case (k, xs) =>
        k -> xs.map(_._3).sum / xs.size
      }
      val input = MemoryStream[(String, Long, Double)](spark)
      val df = input.toDF().toDF("k", "id", "x")
        .select($"k", timestamp_micros($"id" * 1000000L).as("ts"),
          $"id", $"x")
      val q = StreamOps.cusumStream(df, "k", "ts", "id", "x",
          slack = 1.0, threshold = 15.0, targetMeans = mus)
        .writeStream.format("memory").queryName("cusum")
        .outputMode("update").start()
      try {
        input.addData(b1: _*)
        q.processAllAvailable()
        input.addData(b2: _*)
        q.processAllAvailable()
        // Update mode re-emits per batch: last emission per key (max
        // nObs) is the carried accumulator — drift built across the
        // batch BOUNDARY must alarm exactly as the single batch fold
        val rows = spark.table("cusum")
          .select($"key", $"nObs", $"maxPos", $"maxNeg", $"nAlarms",
            $"firstAlarm")
          .as[(String, Long, Double, Double, Long, Option[Long])]
          .collect()
        val last = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
        val batch = graft.operators.TemporalOps.cusumChangepoints(
            all.toDF("k", "id", "x")
              .select($"k", timestamp_micros($"id" * 1000000L).as("ts"),
                $"id", $"x"),
            "k", "ts", "id", "x", slack = 1.0, threshold = 15.0)
          .select($"k", $"n_obs", $"max_pos", $"max_neg", $"n_alarms",
            $"first_alarm")
          .as[(String, Long, Double, Double, Long, Option[Long])]
          .collect().map(r => r._1 -> r).toMap
        assert(last.keySet == batch.keySet)
        last.foreach { case (k, got) =>
          assert(got == batch(k), s"key $k: stream $got != batch ${batch(k)}")
        }
        // and the drift genuinely alarmed (the test isn't vacuous)
        assert(last("a")._5 > 0, s"'a' never alarmed: ${last("a")}")
        // intermediate emission existed for batch 1 (state was live)
        assert(rows.exists(r => r._1 == "a" && r._2 == 2L))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("leaderboard: totals accumulate in MapState, ranks refresh per batch") {
    import graft.streaming.StreamOps.ScoreEvent
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[ScoreEvent](spark)
      val q = StreamOps.leaderboard(input.toDS(), k = 2)
        .writeStream.format("memory").queryName("board")
        .outputMode("update").start()
      try {
        input.addData(ScoreEvent("g", "alice", 5.0), ScoreEvent("g", "bob", 3.0),
          ScoreEvent("g", "carol", 1.0), ScoreEvent("h", "dave", 2.0))
        q.processAllAvailable()
        val b1 = spark.table("board")
          .select($"group", $"rank", $"member", $"total")
          .as[(String, Int, String, Double)].collect().toSet
        assert(b1 == Set(("g", 1, "alice", 5.0), ("g", 2, "bob", 3.0),
          ("h", 1, "dave", 2.0)), s"batch-1 board wrong: $b1")
        // batch 2: carol overtakes (1+9=10); alice untouched but must
        // keep her cross-batch total; bob drops off the top-2
        input.addData(ScoreEvent("g", "carol", 9.0))
        q.processAllAvailable()
        val rows = spark.table("board")
          .select($"group", $"rank", $"member", $"total")
          .as[(String, Int, String, Double)].collect().toSeq
        val b2 = rows.diff(b1.toSeq).toSet
        assert(b2 == Set(("g", 1, "carol", 10.0), ("g", 2, "alice", 5.0)),
          s"batch-2 refresh wrong: $b2")
        // the stream's final per-group board equals the batch plan over
        // the union of all events (group g refreshed in batch 2; h's
        // batch-1 board is final since nothing touched it after)
        val all = Seq(("g", "alice", 5.0), ("g", "bob", 3.0), ("g", "carol", 1.0),
          ("h", "dave", 2.0), ("g", "carol", 9.0)).toDF("group", "member", "value")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"group").orderBy($"total".desc, $"member")
        val batchBoard = all.groupBy($"group", $"member")
          .agg(sum($"value").as("total"))
          .withColumn("rank", row_number().over(w)).where($"rank" <= 2)
          .select($"group", $"rank".cast("int"), $"member", $"total")
          .as[(String, Int, String, Double)].collect().toSet
        val streamFinal = b2 ++ Set(("h", 1, "dave", 2.0))
        assert(streamFinal == batchBoard, s"stream $streamFinal != batch $batchBoard")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
