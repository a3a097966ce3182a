package graft

import graft.functions.GraftExtensions
import graft.plans.ApproxDistinctRewrite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions wiring: the approx-distinct rewrite must
  * activate only behind its session flag, rewrite only single-column
  * `count(DISTINCT …)`, and stay within the HLL error envelope.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A session with [[GraftExtensions]] installed. `getOrCreate` would
    * hand back the suite-shared session (extensions are builder-time
    * only), so the default/active sessions are cleared first; the new
    * session shares the JVM's SparkContext and must NOT be stopped.
    */
  private lazy val spark: SparkSession = {
    // make sure a context exists before we fork a session off it
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    assert(s ne base)
    s
  }

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("flag off: count distinct stays exact") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 7, i % 13)).toDF("g", "v")
    val out = df.groupBy($"g").agg(count_distinct($"v").as("d"))
    assert(!optimized(out).contains("approx_count_distinct"))
    assert(out.as[(Int, Long)].collect().toMap.values.forall(_ == 13L))
  }

  test("flag on: single-column distinct rewrites to HLL within its error bound") {
    import spark.implicits._
    spark.conf.set(ApproxDistinctRewrite.FlagKey, "true")
    try {
      val df = (1 to 20000).map(i => i % 4093).toDF("v")
      val out = df.agg(count_distinct($"v").as("d"))
      val plan = optimized(out)
      assert(plan.contains("approx_count_distinct"), s"not rewritten:\n$plan")
      val approx = out.as[Long].head()
      assert(math.abs(approx - 4093.0) / 4093.0 < 0.05,
        s"approx $approx outside 5% of 4093")
    } finally spark.conf.unset(ApproxDistinctRewrite.FlagKey)
  }

  test("flag on: multi-column distinct is NOT rewritten (no HLL tuple semantics)") {
    import spark.implicits._
    spark.conf.set(ApproxDistinctRewrite.FlagKey, "true")
    try {
      val df = (1 to 100).map(i => (i % 5, i % 4)).toDF("a", "b")
      val out = df.agg(count_distinct($"a", $"b").as("d"))
      assert(!optimized(out).contains("approx_count_distinct"))
      assert(out.as[Long].head() == 20L)
    } finally spark.conf.unset(ApproxDistinctRewrite.FlagKey)
  }

  test("SQL surface: minhash_signature and winnow_fingerprints resolve and match the Column API") {
    import spark.implicits._
    val sig = spark.sql(
      "SELECT minhash_signature(array('abcdef', 'bcdefg'), 4) AS s")
      .as[Seq[Long]].head()
    val sigCol = Seq(Seq("abcdef", "bcdefg")).toDF("sh")
      .select(graft.functions.MinHashSignature($"sh", 4).as("s"))
      .as[Seq[Long]].head()
    assert(sig == sigCol && sig.length == 4)
    val fp = spark.sql(
      "SELECT winnow_fingerprints('the quick brown fox', 6, 4) AS f")
      .as[Seq[Long]].head()
    val fpCol = Seq("the quick brown fox").toDF("t")
      .select(graft.functions.WinnowFingerprints($"t", 6, 4).as("f"))
      .as[Seq[Long]].head()
    assert(fp == fpCol && fp.nonEmpty)
    // non-literal shape parameters are rejected with a clear message
    val err = intercept[Exception](
      spark.sql("SELECT winnow_fingerprints('x', 1 + 5, 4)").collect())
    assert(err.getMessage.contains("integer literal")
      || err.getMessage.contains("winnow_fingerprints"))
  }

  test("SQL surface: ANN primitives resolve and match the Column API") {
    import spark.implicits._
    val vec = Seq(0.6, 0.8, 0.0, 0.1)
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val df = Seq(vec).toDF("v")
    df.createOrReplaceTempView("ann_v")
    val centsSql = cents.map(_.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")

    // nearest_centroid: struct(cell, sim)
    val ncSql = spark.sql(
      s"SELECT nearest_centroid(v, $centsSql) AS nc FROM ann_v")
      .select($"nc.cell", $"nc.sim").as[(Int, Double)].head()
    val ncCol = df.select(graft.functions.NearestCentroid($"v", cents).as("nc"))
      .select($"nc.cell", $"nc.sim").as[(Int, Double)].head()
    assert(ncSql == ncCol && ncSql._1 == 1) // 0.8 on dim 1 dominates

    // centroid_sims: per-cell cosine array
    val csSql = spark.sql(
      s"SELECT centroid_sims(v, $centsSql) AS cs FROM ann_v")
      .as[Seq[Double]].head()
    val csCol = df.select(graft.functions.CentroidSims($"v", cents).as("cs"))
      .as[Seq[Double]].head()
    assert(csSql == csCol && csSql.length == 2)

    // pq_encode: 2 subspaces × 2 centroids of dim 2
    val books = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
      Seq(Seq(0.0, 0.0), Seq(0.0, 0.2)))
    val booksSql = books.map(_.map(_.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")).mkString("array(", ", ", ")")
    val pqSql = spark.sql(
      s"SELECT pq_encode(v, $booksSql) AS c FROM ann_v")
      .as[Seq[Int]].head()
    val pqCol = df.select(graft.functions.PqEncode($"v", books).as("c"))
      .as[Seq[Int]].head()
    assert(pqSql == pqCol && pqSql.length == 2)

    // hyperplane_buckets: integer-literal shape args
    val hbSql = spark.sql(
      "SELECT hyperplane_buckets(v, 4, 2) AS b FROM ann_v")
      .as[Seq[String]].head()
    val hbCol = df.select(graft.functions.HyperplaneBuckets($"v", 4, 2).as("b"))
      .as[Seq[String]].head()
    assert(hbSql == hbCol && hbSql.length == 2)

    // non-constant centroids are a resolution-time error, not a per-row
    // evaluation — the matrix shapes the expression
    val errNc = intercept[Exception](spark.sql(
      "SELECT nearest_centroid(v, array(v)) AS nc FROM ann_v").collect())
    assert(errNc.getMessage.contains("constant")
      || errNc.getMessage.contains("nearest_centroid"))
    val errHb = intercept[Exception](spark.sql(
      "SELECT hyperplane_buckets(v, 1 + 3, 2) AS b FROM ann_v").collect())
    assert(errHb.getMessage.contains("integer literal")
      || errHb.getMessage.contains("hyperplane_buckets"))
    // integer centroid literals coerce to double like SQL users expect
    val ncInt = spark.sql(
      "SELECT nearest_centroid(v, array(array(1, 0, 0, 0), array(0, 1, 0, 0))) AS nc FROM ann_v")
      .select($"nc.cell").as[Int].head()
    assert(ncInt == 1)
  }

  test("winnow_fingerprints counts CODE POINTS: supplementary-plane input matches substr gram boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = 3; val w = 2
    // emoji are 2 UTF-16 units but 1 code point — the SQL function must
    // slice grams exactly like Column.substr (code points), not Java chars
    val raw = "a😀b😁cde😂fg"
    val df = Seq(raw).toDF("t")
    def hash(c: org.apache.spark.sql.Column) =
      conv(substring(md5(to_binary(c, lit("utf-8"))), 1, 8), 16, 10)
        .cast("long")
    val grams = df.select(transform(
        sequence(lit(1), length($"t") - (k - 1)),
        i => hash($"t".substr(i, lit(k)))).as("g"))
      .as[Seq[Long]].head()
    val want =
      (if (grams.size < w) Seq(grams.min)
       else grams.sliding(w).map(_.min).toSeq).distinct
    val got = df
      .select(graft.functions.WinnowFingerprints($"t", k, w).as("f"))
      .as[Seq[Long]].head()
    assert(got == want)
    // and via the SQL registration too
    df.createOrReplaceTempView("wf_sp")
    val sqlF = spark.sql(s"SELECT winnow_fingerprints(t, $k, $w) AS f FROM wf_sp")
      .as[Seq[Long]].head()
    assert(sqlF == want)
  }

  test("SQL surface: gear_cdc_chunks resolves and matches the Column API") {
    import spark.implicits._
    val text = "All work and no play makes Jack a dull boy. " * 10
    val df = Seq(text).toDF("t")
    df.createOrReplaceTempView("gear_t")
    val sqlChunks = spark.sql(
      "SELECT explode(gear_cdc_chunks(t, 32)) AS c FROM gear_t")
      .select($"c.s", $"c.l", $"c.h").as[(Int, Int, String)].collect().toSeq
    val colChunks = df.select(explode(
        graft.functions.GearCdcChunks($"t", 32)).as("c"))
      .select($"c.s", $"c.l", $"c.h").as[(Int, Int, String)].collect().toSeq
    assert(sqlChunks == colChunks && sqlChunks.size > 1)
    // shape arg must be a literal
    val err = intercept[Exception](
      spark.sql("SELECT gear_cdc_chunks('x', 1 + 5)").collect())
    assert(err.getMessage.contains("integer literal")
      || err.getMessage.contains("gear_cdc_chunks"))
  }
}
