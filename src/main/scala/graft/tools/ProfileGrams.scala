package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-attribution of the n-gram contamination probe side. */
object ProfileGrams {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    import graft.llm.{DedupOps, TextOps}
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[gramprof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def docs = graft.Tables.load(spark, dir, "documents")
    def ev = docs.where(col("doc_id") % 97 === 0)
    time("warm")(ev.select(col("doc_id")))
    time("eval_scan")(ev.select(col("doc_id"), col("text")))
    time("eval_norm")(ev.select(TextOps.normalizeText(col("text")).as("nt")))
    time("eval_shingles")(ev.select(
      DedupOps.wordShingles(TextOps.normalizeText(col("text")), 5).as("ng")))
    time("eval_explode")(ev.select(
      explode(DedupOps.wordShingles(TextOps.normalizeText(col("text")), 5)).as("g")))
    time("eval_md5")(ev.select(
      explode(DedupOps.wordShingles(TextOps.normalizeText(col("text")), 5)).as("g"))
      .select(unhex(md5(to_binary(col("g"), lit("utf-8")))).as("h")))
    time("eval_distinct")(ev.select(
      explode(DedupOps.wordShingles(TextOps.normalizeText(col("text")), 5)).as("g"))
      .select(unhex(md5(to_binary(col("g"), lit("utf-8")))).as("h")).distinct())
    time("full_norm_corpus")(docs.select(TextOps.normalizeText(col("text")).as("nt")))
    spark.stop()
  }
}
