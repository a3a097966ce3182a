package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import java.nio.file.{Files, Paths}

/** Write `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence an
  * optimization round commits (one JVM for all snapshots, bench confs).
  *
  * Usage: runMain graft.tools.PlanSnap <dataDir> <outDir> <tag> <query...|ALL>
  * (ALL = every headline)
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names =
      if (args.drop(3).sameElements(Array("ALL"))) graft.SparkEntry.headlines
      else args.drop(3).toSeq
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
    Files.createDirectories(Paths.get(outDir))
    val byName = graft.SparkEntry.queries
    names.foreach { n =>
      try {
        val df = byName(n)(spark, dir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"),
          s"== $n ($tag, dir=$dir) ==\n$txt")
        println(s"[plansnap] wrote $n")
        // side-effecting queries (temp warehouses) leave cached state
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      } catch { case e: Throwable =>
        System.err.println(s"[plansnap] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
