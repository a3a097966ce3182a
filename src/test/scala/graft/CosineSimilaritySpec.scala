package graft

import graft.functions.CosineSimilarity
import graft.llm.SimOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native cosine expression: value parity with the composed
  * built-ins form (bit-exact — same sequential accumulation), null
  * handling, codegen execution, and SQL registration.
  */
class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def vecs = Seq(
    (Array(1.0, 2.0, 3.0), Array(2.0, 4.0, 6.0)),     // parallel → 1.0
    (Array(1.0, 0.0), Array(0.0, 1.0)),               // orthogonal → 0.0
    (Array(1.0, -1.0, 0.5), Array(-0.3, 2.0, 7.0)),
    (Array(0.1234, 5.678, -9.01), Array(3.3, -2.2, 1.1)))
    .toDF("a", "b")

  test("FuseCosineSimilarity rule rewrites the composed fold to the fused expression") {
    import graft.functions.FuseCosineSimilarity
    val before = spark.experimental.extraOptimizations
    // parquet-backed input: a local Seq collapses to a LocalRelation
    // before any optimizer rule can observe the projection
    def composed = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .limit(20)
      .select($"vec_id", SimOps.cosineComposed($"v", $"v").as("sim"))
    spark.experimental.extraOptimizations = before :+ FuseCosineSimilarity
    try {
      val df = composed
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_similarity"),
        s"composed fold not fused:\n$optimized")
      assert(!optimized.contains("aggregate("),
        s"composed fold still present after fusing:\n$optimized")
      // and the rewrite preserves values bit-exactly vs the un-fused run
      val fusedVals = df.orderBy($"vec_id").select($"sim").as[Double].collect()
      spark.experimental.extraOptimizations = before
      val plainVals = composed.orderBy($"vec_id").select($"sim").as[Double].collect()
      assert(fusedVals.map(java.lang.Double.doubleToLongBits).toSeq ==
        plainVals.map(java.lang.Double.doubleToLongBits).toSeq)
    } finally spark.experimental.extraOptimizations = before
  }

  test("FuseCosineSimilarity leaves non-cosine folds alone") {
    import graft.functions.FuseCosineSimilarity
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ FuseCosineSimilarity
    try {
      // a plain dot product (no norm quotient) must NOT be rewritten
      val df = vecs.select(
        org.apache.spark.sql.functions.aggregate(
          org.apache.spark.sql.functions.zip_with($"a", $"b", (x, y) => x * y),
          org.apache.spark.sql.functions.lit(0.0), (acc, v) => acc + v).as("dot"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosine_similarity"),
        s"bare dot product wrongly fused:\n$optimized")
      df.collect() // still evaluates
    } finally spark.experimental.extraOptimizations = before
  }

  test("fused expression matches the composed form bit-exactly") {
    val out = vecs.select(
      CosineSimilarity($"a", $"b").as("fused"),
      SimOps.cosineComposed($"a", $"b").as("composed"))
      .as[(Double, Double)].collect()
    out.foreach { case (f, c) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(c),
        s"fused=$f composed=$c")
    }
    assert(math.abs(out(0)._1 - 1.0) < 1e-12)
    assert(math.abs(out(1)._1) < 1e-12)
  }

  test("null inputs yield null; zero vector yields NaN") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0))))
      .toDF("a", "b")
      .select(CosineSimilarity($"a", $"b").as("s"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0).isNaN)
  }

  test("null element or length mismatch yield null, matching the composed form") {
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](2.0, 4.0)))
      .toDF("a", "b")
      .select(CosineSimilarity($"a", $"b").as("fused"),
        SimOps.cosineComposed($"a", $"b").as("composed"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // null element
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // length mismatch
    assert(math.abs(rows(2).getDouble(0) - 1.0) < 1e-12)
    assert(rows(2).getDouble(0) == rows(2).getDouble(1))
  }

  test("executes inside whole-stage codegen") {
    // local Seq relations constant-fold to LocalTableScan; use a file
    // source so a real codegen'd projection exists
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(CosineSimilarity($"embedding", $"embedding").as("s"))
    val out = df.collect()
    assert(out.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9)) // self-similarity = 1
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "expression fell out of codegen")
  }

  test("float arrays cast transparently (the embeddings column shape)") {
    val f = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val s = f.select(CosineSimilarity($"a", $"b")).as[Double].collect().head
    assert(math.abs(s - 1.0) < 1e-7)
  }

  test("SQL registration: cosine_similarity callable from spark.sql") {
    CosineSimilarity.register(spark)
    vecs.createOrReplaceTempView("vecs_t")
    val s = spark.sql(
      "SELECT cosine_similarity(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>)) FROM vecs_t")
      .as[Double].collect()
    assert(math.abs(s(0) - 1.0) < 1e-12)
  }

  test("radiusSearch: threshold inclusive, self excluded, empty result well-formed") {
    import graft.llm.SimOps
    // unit vectors at 0°, 60°, 90°, 180° from the x axis: cosines to
    // the 0° probe are exactly representable (0.5 via sqrt(3)/2 is
    // not, but the DOT product is computed from these literals
    // identically on both paths, so the comparisons are stable)
    val s3 = math.sqrt(3) / 2
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.5f, s3.toFloat)),   // ~60° → cos ≈ 0.5
      (2L, Array(0.0f, 1.0f)),         // 90° → cos 0
      (3L, Array(-1.0f, 0.0f)))        // 180° → cos -1
      .toDF("vec_id", "embedding")
    val probe = corpus.where($"vec_id" === 0L)
    val got = SimOps.radiusSearch(corpus, probe, minSim = 0.49)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    // neighbor 1 is inside the radius, 2 and 3 outside, self excluded
    assert(got.keySet == Set(1L))
    assert(math.abs(got(1L) - 0.5) < 1e-6)
    // a radius nothing satisfies returns empty, not an error
    assert(SimOps.radiusSearch(corpus, probe, minSim = 0.99).count() == 0)
    // minSim = -1 returns the whole corpus minus self
    assert(SimOps.radiusSearch(corpus, probe, minSim = -1.0).count() == 3)
  }
}
