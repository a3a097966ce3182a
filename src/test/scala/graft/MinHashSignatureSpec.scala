package graft

import graft.functions.MinHashSignature
import graft.llm.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native minhash signature: bit parity with the composed
  * higher-order form on real documents, null-element and empty-set
  * handling, codegen execution.
  */
class MinHashSignatureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("bit parity with the composed form on real document shingles") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where($"doc_id" < 60)
      .select($"doc_id",
        DedupOps.charShingles(TextOps.normalizeText($"text"), 6).as("sh"))
    val rows = docs.select($"doc_id",
      MinHashSignature($"sh", 12).as("fused"),
      DedupOps.signatureFromHashes(DedupOps.shingleHashes($"sh"), 12).as("composed"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, f, c) =>
      assert(f == c, s"signature diverged for doc $id")
      assert(f.size == 12)
    }
  }

  test("null elements skipped, empty set yields MaxValue minima, null input null") {
    val df = Seq(
      (1L, Seq[String]("ab", null, "cd")),
      (2L, Seq.empty[String]),
      (3L, null: Seq[String]))
      .toDF("id", "sh")
      .select($"id", MinHashSignature($"sh", 4).as("fused"),
        DedupOps.signatureFromHashes(DedupOps.shingleHashes($"sh"), 4).as("composed"))
    val rows = df.collect()
    val byId = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getSeq[Long](1),
        if (r.isNullAt(2)) null else r.getSeq[Long](2))).toMap
    assert(byId(1L)._1 == byId(1L)._2)
    assert(byId(2L)._1 == Seq.fill(4)(Long.MaxValue))
    assert(byId(2L)._1 == byId(2L)._2)
    assert(byId(3L)._1 == null && byId(3L)._2 == null)
  }

  test("HyperplaneBuckets: bit parity with composed lshBucket on embeddings") {
    import graft.llm.SimOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .where($"vec_id" < 80)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val rows = emb.select($"vec_id",
      graft.functions.HyperplaneBuckets($"v", 4, 8).as("fused"),
      array((0 until 8).map(t => SimOps.lshBucket($"v", 4, t)): _*).as("composed"))
      .as[(Long, Seq[String], Seq[String])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, f, c) => assert(f == c, s"buckets diverged for vec $id") }
  }

  test("HyperplaneBuckets: non-finite dot products keep parity with the composed form") {
    import graft.llm.SimOps
    // NaN element → NaN dot; ±Inf elements → ±Inf or NaN dots. Spark's
    // >= is nan-safe (NaN sorts above 0 → '1' bit); the fused loop must
    // agree on every bit.
    val df = Seq(
      (1L, Seq(Double.NaN, 1.0, 2.0)),
      (2L, Seq(Double.PositiveInfinity, Double.NegativeInfinity, 1.0)),
      (3L, Seq(Double.NegativeInfinity, 0.0)),
      (4L, Seq(Double.PositiveInfinity, 0.0)))
      .toDF("id", "v")
    val rows = df.select($"id",
      graft.functions.HyperplaneBuckets($"v", 4, 2).as("fused"),
      array((0 until 2).map(t => SimOps.lshBucket($"v", 4, t)): _*).as("composed"))
      .as[(Long, Seq[String], Seq[String])].collect()
    rows.foreach { case (id, f, c) => assert(f == c, s"buckets diverged for vec $id") }
    // NaN dots specifically read as '1' bits in both forms
    val nanRow = rows.find(_._1 == 1L).get
    assert(nanRow._2 == Seq("0:1111", "1:1111"))
  }

  test("HyperplaneBuckets: null vector element zeroes every sign bit") {
    val df = Seq((1L, Seq[java.lang.Double](1.0, null, 2.0))).toDF("id", "v")
      .select(graft.functions.HyperplaneBuckets($"v".cast("array<double>"), 2, 2).as("b"))
    assert(df.collect().head.getSeq[String](0) == Seq("0:00", "1:00"))
  }

  test("d2 pipeline output is unchanged by the native signature") {
    // the oracle gate also pins this at sf0.01; quick local guard here
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where($"doc_id" < 40).select($"doc_id", $"text")
      .unionByName(
        Tables.load(spark, "/root/testdata/sf0.001", "documents")
          .where($"doc_id" < 40)
          .select(($"doc_id" + 1000000).as("doc_id"),
            concat($"text", lit(" extra pad tokens appended")).as("text")))
    val pairs = DedupOps.minhashNearDups(docs, "text", "doc_id", threshold = 0.7)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
  }
}
