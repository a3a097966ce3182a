package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off synthetic "sf1-equivalent" corpus: every sf0.1 table
  * replicated [[Copies]]× into a parquet dir with the SAME layout, so
  * the whole headline set can run unchanged at 10× the rows and the
  * bench can record a per-headline scaling exponent (testdata tops out
  * at sf0.1; per-operator 10× proofs live in BenchScaleSpec, this is
  * the all-headlines sweep).
  *
  * Replication preserves IN-copy structure and suppresses CROSS-copy
  * interaction, because a fair 10× workload must not manufacture new
  * relational or similarity structure:
  *
  *  - id/key columns shift by a per-copy offset, consistently across
  *    fact tables (lineitem.l_orderkey and orders.o_orderkey shift
  *    together), so joins match within a copy exactly as at 1× and
  *    never across copies; tiny dims (region, nation) stay shared.
  *  - document TEXT is passed through a per-copy letter substitution
  *    (`translate`, copy 0 = identity): in-copy duplicate/near-dup
  *    relationships survive verbatim (a deterministic character map
  *    preserves shingle equality within the copy) while cross-copy
  *    shingle overlap collapses — without this, every doc would gain 9
  *    textual twins and candidate-pair counts in the dedup headlines
  *    would scale quadratically, benchmarking an artifact.
  *  - EMBEDDINGS get a per-copy orthogonal transform (negate the dims
  *    where (i + copy) % 7 == 0): norms and all in-copy cosines are
  *    bit-preserved, cross-copy neighborhoods scramble — same argument
  *    as the text, for the ANN/semantic headlines.
  *
  * Materialization is idempotent via a `_scale10x_done` marker.
  */
object Scale10x {

  val Copies = 10

  private val letters = "abcdefghijklmnopqrstuvwxyz"
  private val digits = "0123456789"

  /** Full substitution alphabet: lower, UPPER, and digits all rotate —
    * an uppercase- or number-heavy document must scramble across copies
    * too, or its shingles stay cross-copy-equal and the dedup/LSH
    * headlines regain the quadratic candidate pairs this transform is
    * documented to suppress (round-12 advisor finding).
    */
  private val alphabet = letters + letters.toUpperCase + digits

  private def rotated(c: Int): String =
    letters.drop(c % 26) + letters.take(c % 26) +
      (letters.drop(c % 26) + letters.take(c % 26)).toUpperCase +
      digits.drop(c % 10) + digits.take(c % 10)

  /** Per-copy transforms; copy 0 is the identity so the original corpus
    * is a subset of the scaled one.
    */
  private def copyOf(spark: SparkSession, from: String, name: String,
      c: Int): DataFrame = {
    val df = Tables.load(spark, from, name)
    val k = c.toLong
    name match {
      case "lineitem" => df
        .withColumn("l_orderkey", col("l_orderkey") + k * 100000000L)
        .withColumn("l_partkey", col("l_partkey") + k * 100000000L)
        .withColumn("l_suppkey", col("l_suppkey") + k * 100000000L)
      case "orders" => df
        .withColumn("o_orderkey", col("o_orderkey") + k * 100000000L)
        .withColumn("o_custkey", col("o_custkey") + k * 100000000L)
      case "customer" => df
        .withColumn("c_custkey", col("c_custkey") + k * 100000000L)
      case "supplier" => df
        .withColumn("s_suppkey", col("s_suppkey") + k * 100000000L)
      case "part" => df
        .withColumn("p_partkey", col("p_partkey") + k * 100000000L)
      case "events" => df
        .withColumn("event_id", col("event_id") + k * 1000000000L)
        .withColumn("user_id", col("user_id") + k * 100000000L)
      case "documents" =>
        if (c == 0) df
        else df
          .withColumn("doc_id", col("doc_id") + k * 100000000L)
          .withColumn("text", translate(col("text"), alphabet, rotated(c)))
      case "embeddings" =>
        if (c == 0) df
        else df
          .withColumn("vec_id", col("vec_id") + k * 100000000L)
          .withColumn("embedding", expr(
            s"transform(embedding, (x, i) -> if((i + $c) % 7 = 0, -x, x))"))
      case _ => df // region/nation: shared dims, copied once below
    }
  }

  /** Materialize the 10× corpus under `to` (same `<table>.parquet`
    * names Tables.load expects). No-op when the done-marker exists.
    */
  def materialize(spark: SparkSession, from: String, to: String): Unit = {
    val marker = java.nio.file.Paths.get(to, "_scale10x_done")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(to))
    Tables.all.foreach { name =>
      val copies = if (name == "region" || name == "nation") 1 else Copies
      val scaled = (0 until copies)
        .map(c => copyOf(spark, from, name, c))
        .reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$to/$name.parquet")
    }
    java.nio.file.Files.writeString(marker, "ok")
    ()
  }
}
