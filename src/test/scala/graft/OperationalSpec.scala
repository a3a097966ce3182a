package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{KeyedMetric, RunningProfile}
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operational behavior a 100 TB deployment hits that correctness
  * oracles don't: corrupt files inside a huge scan, in-flight metric
  * observation without a second pass, and streaming state surviving a
  * query restart from its checkpoint.
  */
class OperationalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("ignoreCorruptFiles: a corrupt part-file degrades the scan, not the job") {
    val dir = java.nio.file.Files.createTempDirectory("op-corrupt").toString
    spark.range(100).select($"id", ($"id" % 7).as("v"))
      .repartition(4).write.mode("overwrite").parquet(dir)
    // clobber one part-file's body (valid name, garbage content)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .maxBy(_.getName)
    java.nio.file.Files.write(part.toPath, Array.fill[Byte](64)(0x5a))
    // explicit schema both times: this isolates the DATA read (schema
    // inference picks its own footer and has its own failure mode).
    // Per-READ options, not spark.conf.set: suites share one session
    // and run in parallel, so a session-global toggle here is a race
    // window for every concurrently-running scan (one full-suite run
    // had the corrupt-read failure surface inside WarehouseTableSpec's
    // multi-writer soak)
    val schema = "id BIGINT, v BIGINT"
    // default: the corrupt footer fails the whole read
    intercept[Exception] {
      spark.read.schema(schema)
        .option("ignoreCorruptFiles", "false").parquet(dir).count()
    }
    val n = spark.read.schema(schema)
      .option("ignoreCorruptFiles", "true").parquet(dir).count()
    // the other three files' rows survive
    assert(n > 0 && n < 100, s"expected a partial read, got $n")
  }

  test("observe: pipeline metrics ride the action, no second scan") {
    val obs = Observation("ingest")
    val df = spark.range(1000)
      .select($"id", ($"id" % 10).as("bucket"))
      .observe(obs, count(lit(1)).as("rows"),
        approx_count_distinct($"bucket").as("buckets"),
        max($"id").as("max_id"))
    df.where($"bucket" === 3).collect()
    val m = obs.get
    // metrics reflect the FULL observed stream, pre-filter (HLL on 10
    // distinct values is exact)
    assert(m("rows") == 1000L && m("buckets") == 10L && m("max_id") == 999L, m.toString)
  }

  test("runningProfile state survives a query restart from its checkpoint") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("op-ckpt").toString
    val sink = scala.collection.mutable.ArrayBuffer.empty[RunningProfile]
    try {
      val input = MemoryStream[KeyedMetric](spark)
      val profiles = StreamOps.runningProfile(input.toDS())
      // memory sink can't recover from a checkpoint; foreachBatch can
      def start() = profiles.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[RunningProfile], _: Long) =>
          sink.synchronized { sink ++= batch.collect() }; ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      val q1 = start()
      try {
        input.addData(KeyedMetric("a", 1.0), KeyedMetric("a", 3.0))
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start()
      try {
        input.addData(KeyedMetric("a", 5.0))
        q2.processAllAvailable()
        val last = sink.synchronized(sink.toList).maxBy(_.n)
        assert(last == RunningProfile("a", 3L, 9.0, 1.0, 5.0),
          s"restart lost checkpointed state: ${sink.toList}")
      } finally q2.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("leaderboard MapState survives a query restart from its checkpoint") {
    import graft.streaming.StreamOps.{LeaderboardEntry, ScoreEvent}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("op-ckpt-lb").toString
    val sink = scala.collection.mutable.ArrayBuffer.empty[(LeaderboardEntry, Long)]
    try {
      val input = MemoryStream[ScoreEvent](spark)
      val board = StreamOps.leaderboard(input.toDS(), k = 2)
      def start() = board.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[LeaderboardEntry], id: Long) =>
          sink.synchronized { sink ++= batch.collect().map(_ -> id) }; ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      val q1 = start()
      try {
        input.addData(ScoreEvent("g", "alice", 5.0), ScoreEvent("g", "bob", 3.0))
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start()
      try {
        // bob's +4 must stack on his checkpointed 3 → 7 beats alice's 5
        input.addData(ScoreEvent("g", "bob", 4.0))
        q2.processAllAvailable()
        val lastBatch = sink.synchronized(sink.toList).groupBy(_._2)
          .maxBy(_._1)._2.map(_._1).toSet
        assert(lastBatch == Set(LeaderboardEntry("g", 1, "bob", 7.0),
          LeaderboardEntry("g", 2, "alice", 5.0)),
          s"restart lost MapState totals: ${sink.toList}")
      } finally q2.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
