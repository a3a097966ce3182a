package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scaled corpora: every sf table replicated `copies`× into a
  * parquet dir with the SAME layout, so the whole headline set can run
  * unchanged at N× the rows and the bench can record per-headline
  * scaling exponents (testdata tops out at sf0.1; per-operator 10×
  * proofs live in BenchScaleSpec, this is the all-headlines sweep —
  * 10× every round, plus the 100× spot tier for the 5 steepest
  * headlines so a super-linear knee hiding inside one decade shows).
  *
  * Replication preserves IN-copy structure and suppresses CROSS-copy
  * interaction, because a fair N× workload must not manufacture new
  * relational or similarity structure:
  *
  *  - id/key columns shift by a per-copy offset, consistently across
  *    fact tables (lineitem.l_orderkey and orders.o_orderkey shift
  *    together), so joins match within a copy exactly as at 1× and
  *    never across copies; tiny dims (region, nation) stay shared.
  *  - document TEXT passes through a per-copy SEEDED PERMUTATION of
  *    the letter/digit alphabet (copy 0 = identity): in-copy
  *    duplicate/near-dup relationships survive verbatim (a
  *    deterministic character map preserves shingle equality within
  *    the copy, and the lower/upper halves share one permutation so
  *    case-folding survives too) while cross-copy shingle overlap
  *    collapses — without this, every doc would gain copies-1 textual
  *    twins and candidate-pair counts in the dedup headlines would
  *    scale quadratically, benchmarking an artifact. A permutation
  *    keyed by the copy index stays collision-free at ANY copy count;
  *    the earlier rotation map repeated every 26 copies, which would
  *    have handed the 100× tier cross-copy equality on aligned pairs.
  *  - EMBEDDINGS get a per-copy SEEDED SIGN VECTOR (negate a random
  *    half of the dimensions; copy 0 = identity): norms and all
  *    in-copy cosines are bit-preserved (signs square away), cross-
  *    copy neighborhoods scramble — same argument as the text, for the
  *    ANN/semantic headlines, and again collision-free at 100 copies
  *    where the old (i + copy) % 7 pattern repeated every 7.
  *
  * Materialization is idempotent via a per-tier done marker.
  */
object Scale10x {

  val Copies = 10

  private val letters = "abcdefghijklmnopqrstuvwxyz"
  private val digits = "0123456789"
  private val alphabet = letters + letters.toUpperCase + digits

  /** Per-copy substitution alphabet (doc above); copy 0 is identity so
    * the original corpus is a subset of the scaled one.
    */
  private def permuted(c: Int): String =
    if (c == 0) alphabet
    else {
      val r = new scala.util.Random(0x5ca1e000L + c)
      val lower = r.shuffle(letters.toList).mkString
      lower + lower.toUpperCase + r.shuffle(digits.toList).mkString
    }

  /** Per-copy sign vector for the embedding transform; copy 0 is
    * identity, every other copy flips a seeded-random nonempty subset.
    */
  private def signs(c: Int, dim: Int): Seq[Int] =
    if (c == 0) Seq.fill(dim)(1)
    else {
      val r = new scala.util.Random(0xe2bed000L + c)
      val s = Seq.fill(dim)(if (r.nextBoolean()) 1 else -1)
      if (s.forall(_ == 1)) -1 +: s.tail else s
    }

  /** Per-copy transforms; copy 0 is the identity so the original corpus
    * is a subset of the scaled one. `embDim` is the embedding length
    * (only consulted for the embeddings table).
    */
  private def copyOf(spark: SparkSession, from: String, name: String,
      c: Int, embDim: Int): DataFrame = {
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
          .withColumn("text", translate(col("text"), alphabet, permuted(c)))
      case "embeddings" =>
        if (c == 0) df
        else {
          val sg = signs(c, embDim)
          df
            .withColumn("vec_id", col("vec_id") + k * 100000000L)
            .withColumn("embedding", expr(
              s"transform(embedding, (x, i) -> x * element_at(" +
                s"array(${sg.mkString(",")}), cast(i + 1 AS INT)))"))
        }
      case _ => df // region/nation: shared dims, copied once below
    }
  }

  /** Materialize a `copies`× corpus under `to` (same `<table>.parquet`
    * names Tables.load expects). No-op when the tier's done-marker
    * exists.
    */
  def materialize(spark: SparkSession, from: String, to: String,
      copies: Int = Copies): Unit = {
    require(copies >= 1 && copies <= 1000, s"copies out of range: $copies")
    val marker = java.nio.file.Paths.get(to, s"_scale${copies}x_done")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(to))
    val embDim = Tables.load(spark, from, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    Tables.all.foreach { name =>
      val n = if (name == "region" || name == "nation") 1 else copies
      val scaled = (0 until n)
        .map(c => copyOf(spark, from, name, c, embDim))
        .reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$to/$name.parquet")
    }
    java.nio.file.Files.writeString(marker, "ok")
    ()
  }
}
