package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution profile for t24 (guide §1: measure first).
  * Usage: runMain graft.tools.ProfileT24 <dir>
  */
object ProfileT24 {
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
    import graft.llm.TextOps
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[t24prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def docs = graft.Tables.load(spark, dir, "documents")
    def train = docs.where(col("doc_id") % 2 === 0)
    val sep = lit("")
    def h(c: org.apache.spark.sql.Column) = unhex(md5(to_binary(c, lit("utf-8"))))
    val toks = filter(split(TextOps.normalizeText(col("text")), " "), t => t =!= "")
    val emitT = {
      val w = col("__ws")
      when(size(w) >= 3,
        transform(sequence(lit(3), size(w)), i => struct(
          h(concat(element_at(w, i - 2), sep, element_at(w, i - 1), sep,
            element_at(w, i))).as("th"),
          h(concat(element_at(w, i - 2), sep, element_at(w, i - 1))).as("ph"),
          h(concat(element_at(w, i - 1), sep, element_at(w, i))).as("bh"),
          h(element_at(w, i - 1)).as("fh"),
          h(element_at(w, i)).as("uh"))))
        .otherwise(array().cast(
          "array<struct<th:binary,ph:binary,bh:binary,fh:binary,uh:binary>>"))
    }
    time("warm")(train.select(col("doc_id")))
    time("train_tokenize")(train.select(toks.as("__ws")).select(size(col("__ws"))))
    time("train_emit_explode")(train.select(toks.as("__ws"))
      .select(explode(emitT).as("__e")).select(col("__e.th")))
    time("train_tri_counts")(train.select(toks.as("__ws"))
      .select(explode(emitT).as("__e"))
      .select(col("__e.th").as("__th"), col("__e.ph").as("__ph"),
        col("__e.bh").as("__bh"), col("__e.fh").as("__fh"))
      .groupBy(col("__th"), col("__ph"), col("__bh"), col("__fh"))
      .agg(count(lit(1)).as("__c")))
    time("train_unigrams")(train.select(explode(toks).as("__w"))
      .select(h(col("__w")).as("__uh"))
      .groupBy(col("__uh")).agg(count(lit(1)).as("__cu")))
    time("full_t24")(graft.SparkEntry.queries("t24_trigram_backoff")(spark, dir))
    spark.stop()
  }
}
