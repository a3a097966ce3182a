package graft.tools

import graft.Tables
import graft.operators.MergeOps
import graft.sources.WarehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Scratch profiler for the s6 warehouse-cycle stages. */
object ProfileS6 {
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

    // per-phase job accounting: count + summed wall time of Spark jobs
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.put(s.jobId, System.nanoTime())
        val exec = Option(s.properties).map(_.getProperty("spark.sql.execution.id")).orNull
        val last = s.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("")
        println(s"[prof]   job ${s.jobId}: execId=$exec nStages=${s.stageInfos.size} last=$last")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.remove(e.jobId)
        if (t0 != 0L) { jobCount.incrementAndGet(); jobNanos.addAndGet(System.nanoTime() - t0) }
      }
    })

    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        println(f"[prof]   exec ${qe.id}: fn=$funcName ${durationNs / 1e9}%6.3f s " +
          s"plan=${qe.logical.simpleString(1).takeWhile(_ != '\n').take(120)}")
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get(); val n0 = jobNanos.get()
      val r = body
      Thread.sleep(150) // let listener events drain
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  " +
        f"jobs=${jobCount.get() - j0}%3d jobTime=${(jobNanos.get() - n0) / 1e9}%7.3f s")
      r
    }

    val destSchema = StructType(Seq(
      StructField("k", LongType),
      StructField("v_type", StringType),
      StructField("v_amount", DoubleType)))

    (1 to 2).foreach { round =>
      println(s"[prof] --- round $round ---")
      val root = Files.createTempDirectory("prof-wh").toString + "/events_tbl"
      val all = Tables.load(spark, dir, "events").select(
        struct(col("user_id").as("k")).as("key"),
        when(col("event_type") =!= "error",
          struct(col("event_type").as("v_type"), col("value").as("v_amount"))).as("value"),
        col("event_id").as("i"),
        timestamp_micros(expr("ts div 1000")).as("partitionTime"),
        lit(0L).as("batchNumber"))
      val t = WarehouseTable.create(spark, root, Seq("k"), destSchema)
      val d0 = time("latestPerKey(first half)") {
        val d = MergeOps.latestPerKey(all.where(col("i") < 5000))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
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
