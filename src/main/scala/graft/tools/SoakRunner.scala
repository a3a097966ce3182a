package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** Standalone entry for [[Soak100x]] — run the write-side lifecycle
  * soak against any corpus dir without the full bench sweep:
  *
  *   sbt "runMain graft.tools.SoakRunner /root/testdata/sf0.1"
  *   sbt "runMain graft.tools.SoakRunner /tmp/graft_scale100x_sf0.1 /root/testdata/sf0.1 100"
  *
  * Defaults to the sf0.1 testdata (a 100 k-row smoke of the same
  * lifecycle); with a source dir + copies it materializes the scaled
  * corpus first (idempotent via Scale10x's done marker), which is how
  * the bench's default arm reaches the 10 M-row tier.
  */
object SoakRunner {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length >= 3)
      Scale10x.materialize(spark, args(1), corpus, copies = args(2).toInt)
    val wh = Files.createTempDirectory("graft-soak").toString + "/tbl"
    val r = Soak100x.run(spark, corpus, wh)
    println(s"SOAK OK: $r")
    spark.stop()
  }
}
