package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone runner for the 1 M-record streaming merge probe with N
  * reps and loadavg capture — attribution harness for round-over-round
  * throughput deltas (a single-rep probe in a loaded JVM can swing
  * ±25% on machine noise alone).
  *
  * Usage: runMain graft.tools.ProbeTime [reps] [records]
  */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 2
    val n = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      val wh = java.nio.file.Files.createTempDirectory("probe-wh").toString
      val ck = java.nio.file.Files.createTempDirectory("probe-ck").toString
      System.err.println(s"[probe] rep$r loadavg=${SpotTime.loadavg()}")
      val (wall, survivors) = graft.streaming.ThroughputProbe.run(spark, wh, ck, n)
      println(f"[probe-result] rep$r sec=$wall%.2f rec_per_s=${n / wall}%.0f " +
        s"survivors=$survivors loadavg=${SpotTime.loadavg()}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
