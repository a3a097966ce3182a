package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution profile for d10 duplicatedSpans (guide §1). */
object ProfileD10 {
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
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[d10prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val w = 8
    def docs = graft.Tables.load(spark, dir, "documents")
    def built = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(substring(col("text"), 1, 120),
          lit(" all work and no play makes jack a dull boy every day "),
          substring(col("text"), 121, 240)))
        .otherwise(col("text")).as("text"))
    val words = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    def staged = built.select(col("doc_id").as("__id"), words.as("__ws"))
      .select(col("__id"), col("__ws"), size(col("__ws")).as("__nw"))
    val winHashes = when(col("__nw") >= w,
      transform(sequence(lit(1), col("__nw") - w + 1),
        p => unhex(md5(to_binary(array_join(slice(col("__ws"), p, lit(w)), " "),
          lit("utf-8"))))))
      .otherwise(array().cast("array<binary>"))
    time("warm")(built.select(col("doc_id")))
    time("split_words")(staged.select(col("__id"), col("__nw")))
    time("win_hashes")(staged.select(col("__id"), posexplode(winHashes)))
    time("full_d10")(graft.SparkEntry.queries("d10_substring_dedup")(spark, dir))
    spark.stop()
  }
}
