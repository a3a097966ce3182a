package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution profile for t24 (guide §1: measure first).
  * r18: rebuilt around the component-fingerprint implementation —
  * stages mirror TextOps.withTrigramBackoff so each reading isolates
  * one increment of the real query's work.
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
    def test = docs.where(col("doc_id") % 2 === 1)
    val toks = filter(graft.functions.WsTokens(
      TextOps.normalizeText(col("text"))), t => t =!= "")
    def hashed(df: org.apache.spark.sql.DataFrame) = df
      .select(toks.as("__ws"))
      .select(transform(col("__ws"), t => xxhash64(t)).as("__h1"))
    val emitT = {
      val h1 = col("__h1")
      when(size(h1) >= 3,
        transform(sequence(lit(3), size(h1)), i => struct(
          element_at(h1, i - 2).as("a1"),
          element_at(h1, i - 1).as("b1"),
          element_at(h1, i).as("c1"))))
        .otherwise(array().cast(
          "array<struct<a1:bigint,b1:bigint,c1:bigint>>"))
    }
    val triKey = Seq("__a1", "__b1", "__c1")
    time("warm")(train.select(col("doc_id")))
    time("train_tokenize")(train.select(toks.as("__ws")).select(size(col("__ws"))))
    time("train_hash")(hashed(train).select(size(col("__h1"))))
    time("train_emit_explode")(hashed(train)
      .select(explode(emitT).as("__e")).select(col("__e.a1")))
    time("train_tri_counts")(hashed(train)
      .select(explode(emitT).as("__e"))
      .select(triKey.map(k => col(s"__e.${k.stripPrefix("__")}").as(k)): _*)
      .groupBy(triKey.map(col): _*)
      .agg(count(lit(1)).as("__ct")))
    time("train_unigrams")(hashed(train)
      .select(explode(col("__h1")).as("__c1"))
      .groupBy(col("__c1")).agg(count(lit(1)).as("__cu")))
    time("test_probe_emit")(hashed(test)
      .select(explode(emitT).as("__e")).select(col("__e.a1")))
    // composed increments (each re-pays the barrier build after the
    // cache clear — attribute by subtraction)
    val prefixKey = Seq("__a1", "__b1")
    def triTrain = hashed(train)
      .select(explode(emitT).as("__e"))
      .select(triKey.map(k => col(s"__e.${k.stripPrefix("__")}").as(k)): _*)
      .groupBy(triKey.map(col): _*)
      .agg(count(lit(1)).as("__ct"))
      .transform(graft.util.GraftCache.barrier("TextOps.trigramCounts"))
    time("barrier_build_read")(triTrain)
    time("ct_attach")(
      triTrain.join(triTrain.groupBy(prefixKey.map(col): _*)
        .agg(sum(col("__ct")).as("__cp")), prefixKey))
    time("probe_join_ct")(hashed(test)
      .select(explode(emitT).as("__e"))
      .select(triKey.map(k => col(s"__e.${k.stripPrefix("__")}").as(k)): _*)
      .join(triTrain, triKey, "left"))
    time("full_t24")(graft.SparkEntry.queries("t24_trigram_backoff")(spark, dir))
    time("full_t24_again")(graft.SparkEntry.queries("t24_trigram_backoff")(spark, dir))
    spark.stop()
  }
}
