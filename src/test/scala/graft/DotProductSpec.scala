package graft

import graft.functions.{CosineSimilarity, DotProduct}
import graft.llm.SimOps
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The norm-hoisted cosine substitution (r18): `cosineStaged(a, an, b,
  * bn)` with `an`/`bn` = `vecNorm` staged per row must be BIT-IDENTICAL
  * to the fused `CosineSimilarity(a, b)` — values, NaN cases (zero
  * norms), and the null surface (null input, length mismatch, null
  * element). The pair-scan call sites (bruteForce/PQ/SQ/RP/IVF scans,
  * crossSetMaxSim, near-dup verifies, centroid assignment) all rely on
  * this equivalence, and every one is additionally oracle-gated.
  */
class DotProductSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def bits(d: java.lang.Double): Any =
    if (d == null) null else java.lang.Double.doubleToLongBits(d)

  private def staged(a: Column, b: Column): Column =
    SimOps.cosineStaged(a, SimOps.vecNorm(a), b, SimOps.vecNorm(b))

  test("bit parity with the fused cosine on randomized vectors") {
    val rnd = new scala.util.Random(20260819L)
    val rows = (1 to 2000).map { i =>
      val n = 1 + rnd.nextInt(8)
      val scale = math.pow(10.0, rnd.nextInt(7) - 3)
      (Array.fill(n)((rnd.nextDouble() - 0.5) * scale),
        Array.fill(n)((rnd.nextDouble() - 0.5) * scale))
    } :+ ((Array(0.0, 0.0), Array(1.0, 2.0))) /* zero norm → NaN */ :+
      ((Array(0.0), Array(0.0))) :+
      ((Array(1e200, 1e200), Array(1e200, -1e200))) /* overflow regime */
    val df = rows.toDF("a", "b")
    val got = df.select(staged($"a", $"b")).as[java.lang.Double].collect()
    val want = df.select(CosineSimilarity($"a", $"b"))
      .as[java.lang.Double].collect()
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(bits(g) == bits(w), s"row $i: staged=$g fused=$w")
    }
  }

  test("null surface matches the fused cosine") {
    val df = Seq[(Array[java.lang.Double], Array[java.lang.Double])](
      (null, Array[java.lang.Double](1.0, 2.0)),             // null input
      (Array[java.lang.Double](1.0, 2.0), null),
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](1.0, 2.0, 3.0)),             // length mismatch
      (Array[java.lang.Double](1.0, null),
        Array[java.lang.Double](1.0, 2.0)),                  // null element left
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](null, 2.0)))                 // null element right
      .toDF("a", "b")
    val got = df.select(staged($"a", $"b")).collect().map(_.isNullAt(0))
    val want = df.select(CosineSimilarity($"a", $"b"))
      .collect().map(_.isNullAt(0))
    assert(got.toSeq == want.toSeq)
    assert(want.forall(identity), "all edge rows must be null under the fused form")
  }

  test("DotProduct(v, v) equals the fused loop's norm accumulator") {
    // sqrt(dot(v,v)) staged per row must equal the fused cosine's
    // sqrt(nx): check via cos(v,v) == dot(v,v)/(vn*vn) bit-for-bit
    val rnd = new scala.util.Random(42)
    val df = (1 to 500).map(_ => Tuple1(Array.fill(6)(rnd.nextGaussian())))
      .toDF("v")
    val got = df.select(staged($"v", $"v")).as[Double].collect()
    val want = df.select(CosineSimilarity($"v", $"v")).as[Double].collect()
    assert(got.zip(want).forall { case (g, w) =>
      java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(w) })
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Array(0.3, -1.7, 2.9)
    val b = Array(1.1, 0.0, -4.2)
    def arrLit(v: Array[Double]) =
      Literal.create(ArrayData.toArrayData(v), ArrayType(DoubleType, false))
    val fromEval = DotProduct(arrLit(a), arrLit(b))
      .eval(null).asInstanceOf[Double]
    val fromCodegen = Seq((a, b)).toDF("a", "b")
      .select(DotProduct($"a", $"b")).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(fromEval) ==
      java.lang.Double.doubleToLongBits(fromCodegen))
    val manual = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    assert(java.lang.Double.doubleToLongBits(fromEval) ==
      java.lang.Double.doubleToLongBits(manual))
  }
}
