package graft

import graft.functions.PqEncode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the fused PQ encoder against the composed
  * array_min/array_position formulation it replaces (the
  * [[graft.functions.CosineSimilarity]] pattern: the composed form
  * stays as the semantic reference), plus tie and NaN behavior.
  */
class PqEncodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** The composed reference: staged per-subspace distance arrays,
    * first-min argmin — exactly what pqTopK inlined before the fused
    * expression existed.
    */
  private def composedCodes(books: Seq[Seq[Seq[Double]]], subDim: Int) = {
    val numSubspaces = books.size
    def d2(j: Int, cent: Seq[Double]) =
      (0 until subDim).map { i =>
        val x = element_at($"v", j * subDim + i + 1) - lit(cent(i))
        x * x
      }.reduce(_ + _)
    (df: org.apache.spark.sql.DataFrame) =>
      (0 until numSubspaces).foldLeft(df) { (acc, j) =>
        val dists = array(books(j).map(ct => d2(j, ct)): _*)
        acc.withColumn(s"_d$j", dists)
          .withColumn(s"code_$j",
            (array_position(col(s"_d$j"), array_min(col(s"_d$j"))) - 1).cast("int"))
          .drop(s"_d$j")
      }
  }

  test("fused encoder matches the composed form on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
    val cents = emb.orderBy($"id").limit(16).select($"v")
      .collect().map(_.getSeq[Double](0).toVector).toVector
    val subDim = cents.head.size / 8
    val books = (0 until 8).map(j => cents.map(_.slice(j * subDim, (j + 1) * subDim)))

    val fused = emb.withColumn("codes", PqEncode($"v", books))
      .select($"id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val composed = composedCodes(books, subDim)(emb)
      .select($"id", array((0 until 8).map(j => col(s"code_$j")): _*))
      .as[(Long, Seq[Int])].collect().toMap
    assert(fused.size == composed.size)
    composed.foreach { case (id, codes) =>
      assert(fused(id) == codes, s"codes diverged for vec $id")
    }
  }

  test("ties pick the first (lowest) centroid index") {
    // two identical centroids: code must be 0, never 1
    val books = Seq(Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(9.0, 9.0)))
    val out = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
      .select(PqEncode($"v", books)).as[Seq[Int]].head()
    assert(out == Seq(0))
  }

  test("NaN distances never win; null vector yields null codes") {
    val books = Seq(Seq(Seq(0.0), Seq(5.0)))
    val df = Seq(
      (1L, Some(Seq(Double.NaN))), // all distances NaN -> first centroid
      (2L, Some(Seq(4.0))),        // plain nearest: centroid 1 (5.0)
      (3L, None)                   // null vector -> null result
    ).toDF("id", "v")
    val out = df.select($"id", PqEncode($"v".cast("array<double>"), books))
      .as[(Long, Option[Seq[Int]])].collect().toMap
    assert(out(1L) == Some(Seq(0)))
    assert(out(2L) == Some(Seq(1)))
    assert(out(3L).isEmpty)
  }
}
