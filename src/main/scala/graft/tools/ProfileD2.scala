package graft.tools

import graft.llm.{DedupOps, TextOps}
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the d2 pipeline stages (not part of the library
  * surface; run via `runMain graft.tools.ProfileD2`).
  */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = {
      val d = Tables.load(spark, dir, "documents").where(col("doc_id") < 100)
      d.select(col("doc_id"), col("text"))
        .unionByName(d.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" extra pad tokens appended")).as("text")))
        .select(col("doc_id").as("id"), col("text").as("t"))
    }

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s (rows=$n)")
    }

    // repeat to separate first-use codegen from steady state
    (1 to 2).foreach { round =>
      println(s"[prof] --- round $round ---")
      time("docs.count")(docs.count())
      time("shingles")(docs.select(col("id"),
        DedupOps.charShingles(TextOps.normalizeText(col("t")), 6).as("sh")).count())
      time("hashes")(docs.select(col("id"),
        DedupOps.shingleHashes(
          DedupOps.charShingles(TextOps.normalizeText(col("t")), 6)).as("hs")).count())
      def bandedStaged = docs
        .select(col("id"), DedupOps.shingleHashes(
          DedupOps.charShingles(TextOps.normalizeText(col("t")), 6)).as("hs"))
        .select(col("id"), DedupOps.signatureFromHashes(col("hs"), 12).as("sig"))
        .withColumn("b", explode(sequence(lit(0), lit(3))))
        .select(DedupOps.lshBandKey(col("sig"), col("b"), 3).as("band"), col("id"))
      if (round == 2) {
        val plan = bandedStaged.queryExecution.optimizedPlan.toString
        println(s"[prof] aggregate() count in banded optimized plan: " +
          "aggregate\\(".r.findAllIn(plan).size)
        println(s"[prof] transform() count in banded optimized plan: " +
          "transform\\(".r.findAllIn(plan).size)
      }
      time("sig only") {
        docs.select(col("id"), DedupOps.shingleHashes(
          DedupOps.charShingles(TextOps.normalizeText(col("t")), 6)).as("hs"))
          .select(col("id"), DedupOps.signatureFromHashes(col("hs"), 12).as("sig"))
          .count()
      }
      time("banded(staged projections)")(bandedStaged.count())
      def pairsDf = {
        val b = bandedStaged
        b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"))
          .distinct()
      }
      time("pairs: planning only") {
        pairsDf.queryExecution.executedPlan; 0L
      }
      if (round == 2) {
        val p = pairsDf.queryExecution.executedPlan.toString
        println("[prof] pairs plan (first 40 lines):")
        p.linesIterator.take(40).foreach(l => println(s"[prof]   $l"))
      }
      time("pairs join+distinct")(pairsDf.count())
      time("full d2")(DedupOps.minhashNearDups(docs, "t", "id",
        shingleK = 6, numHashes = 12, bands = 4, threshold = 0.7).count())
    }
    spark.stop()
  }
}
