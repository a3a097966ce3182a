package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize the synthetic 10×/100× corpus (done-marker cached) so
  * SpotTime / PlanSnap can iterate at scale without a full Bench run.
  *
  * Usage: runMain graft.tools.Materialize <srcDir> <outDir> <copies>
  */
object Materialize {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copies) = args
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
    Scale10x.materialize(spark, src, out, copies = copies.toInt)
    println(s"[materialize] done: $out")
    spark.stop()
  }
}
