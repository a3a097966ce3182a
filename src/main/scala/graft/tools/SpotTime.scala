package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused spot-timer for perf iteration: times named SparkEntry
  * queries against one data dir with N reps (min + spread), printing
  * one line per query plus /proc/loadavg at each rep start — the
  * attribution data the full Bench run is too slow to iterate with.
  *
  * Usage: runMain graft.tools.SpotTime <dir> <reps> <query...>
  */
object SpotTime {
  def loadavg(): String =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim
    catch { case _: Throwable => "n/a" }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = graft.SparkEntry.queries
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      // drain released blocks/broadcasts (see Bench.resetSession)
      val deadline = System.nanoTime() + 3000000000L
      var usedMb = Long.MaxValue
      while (usedMb > 64L && System.nanoTime() < deadline) {
        Thread.sleep(100L)
        usedMb = spark.sparkContext.statusTracker.getExecutorInfos
          .map(i => i.usedOnHeapStorageMemory() + i.usedOffHeapStorageMemory())
          .sum / (1024L * 1024L)
        if (usedMb > 64L) System.gc()
      }
    }
    // SPOT_ACTION=count reproduces the old Bench action; default is a
    // noop write — full materialization of every output column, so
    // count-only plan pruning (e.g. outer-join elimination) can't make
    // a query look faster than its real work
    val useCount = sys.env.get("SPOT_ACTION").contains("count")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      if (useCount) { df.count(); () }
      else df.write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      // one warm pass at the smallest SF (codegen/classloading)
      try run(byName(n)(spark, "/root/testdata/sf0.001"))
      catch { case e: Throwable =>
        System.err.println(s"[spot-warm] $n: ${e.getMessage}") }
      reset()
      val times = (1 to reps).map { r =>
        System.err.println(s"[spot] $n rep$r loadavg=${loadavg()}")
        val t0 = System.nanoTime()
        run(byName(n)(spark, dir))
        val t = (System.nanoTime() - t0) / 1e9
        reset()
        t
      }
      println(f"[spot-result] $n min=${times.min}%.2f " +
        f"spread=${times.max - times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
