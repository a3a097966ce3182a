package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution profile for pipeline_e2e (guide §1: measure first).
  * Usage: runMain graft.tools.ProfilePipeline <dir>
  */
object ProfilePipeline {
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
    import graft.llm.{CurationOps, DedupOps, TextOps}
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[pipeprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def docs = graft.Tables.load(spark, dir, "documents")
    time("scan_docs(warm)")(docs)
    time("scan_docs")(docs)
    time("tokenCount_gate")(docs.where(TextOps.tokenCount(col("text")) >= 30)
      .select(col("doc_id")))
    time("dupWordRatio_gate")(docs.where(TextOps.dupWordRatio(col("text")) <= 0.6)
      .select(col("doc_id")))
    def gatedRaw = docs
      .where(TextOps.tokenCount(col("text")) >= 30 &&
        TextOps.dupWordRatio(col("text")) <= 0.6)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    time("gates")(gatedRaw.select(col("doc_id")))
    time("gates+dedup")(DedupOps.exactDedup(gatedRaw, "text", "doc_id")
      .select(col("doc_id")))
    def gated = DedupOps.exactDedup(gatedRaw, "text", "doc_id")
    def evalSet = docs.where(col("doc_id") % 97 === 0)
    time("evalgrams")(evalSet.select(col("doc_id"),
      DedupOps.wordShingles(TextOps.normalizeText(col("text")), 5).as("ng"))
      .select(explode(col("ng")).as("g")).select(unhex(md5(to_binary(col("g"), lit("utf-8")))).as("h")).distinct())
    time("contamination")(CurationOps.ngramContamination(
      evalSet, gated, "text", "doc_id", n = 5))
    time("full_pipeline")(graft.SparkEntry.queries("pipeline_e2e")(spark, dir))
    spark.stop()
  }
}
