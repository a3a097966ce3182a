package graft.tools

import graft.Tables
import graft.operators.MergeOps
import graft.sources.{TableOptions, WarehouseTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Scratch profiler for the s7 field-partitioned merge stages. */
object ProfileS7 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(s.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.remove(e.jobId)
        if (t0 != 0L) { jobCount.incrementAndGet(); jobNanos.addAndGet(System.nanoTime() - t0) }
      }
    })

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get(); val n0 = jobNanos.get()
      val r = body
      Thread.sleep(150)
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  " +
        f"jobs=${jobCount.get() - j0}%3d jobTime=${(jobNanos.get() - n0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"[prof] --- round $round ---")
      val root = Files.createTempDirectory("prof-wh").toString + "/events_fp"
      val all = Tables.load(spark, dir, "events").select(
        struct(col("user_id").as("k")).as("key"),
        when(col("event_type") =!= "error",
          struct(col("event_type").as("v_type"), col("value").as("v_amount"),
            timestamp_micros(expr("ts div 1000")).as("v_ts"))).as("value"),
        col("event_id").as("i"),
        lit(0L).as("batchNumber"))
      val schemaT = StructType(Seq(
        StructField("k", LongType), StructField("v_type", StringType),
        StructField("v_amount", DoubleType), StructField("v_ts", TimestampType)))
      val t = WarehouseTable.create(spark, root, Seq("k"), schemaT,
        TableOptions(clusteringFields = Seq("k"),
          partitionField = Some("v_ts"), granularity = "MONTH"))
      val d0 = time("latestPerKey(first half)") {
        val d = MergeOps.latestPerKey(all.where(col("i") < 5000))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"), col("value.v_type").as("v_type"),
            col("value.v_amount").as("v_amount"), col("value.v_ts").as("v_ts"))
        d.count(); d
      }
      time("append(d0)")(t.append(d0))
      time("merge(second half)")(t.merge(all.where(col("i") >= 5000)))
      time("read+count")(t.read().count())
      println(s"[prof] days=${t.listDays().size}")
    }
    spark.stop()
  }
}
