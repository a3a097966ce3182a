package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a named SparkEntry query's formatted plan (post-AQE when
  * `--run` is passed) — the `.explain` feedback loop as a runnable.
  *
  * Usage: runMain graft.tools.PlanDump <dir> <query> [--run]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val exec = args.contains("--run")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (exec) df.write.format("noop").mode("overwrite").save()
    println(s"===== $name${if (exec) " (executed, AQE-final)" else ""} =====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
