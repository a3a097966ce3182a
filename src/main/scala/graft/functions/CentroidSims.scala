package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** All-centroids cosine similarity vector as one native expression:
  * `array(nanvl(cos(v, c0), -1), nanvl(cos(v, c1), -1), …)` — the
  * staged `cellSims` array [[graft.llm.SimOps]] ranks probe cells with,
  * in the constant-generated-code form of [[NearestCentroid]]. The
  * staged `array(cosine, cosine, …)` literal form inlines one fused
  * loop per centroid into the stage's single generated class, which
  * janino refuses near a thousand centroids; here the centroid matrix
  * is a reference object and the generated code is one static call, so
  * cell RANKING (top-nProbe, which [[NearestCentroid]]'s argmax cannot
  * answer) stays codegen'd at any cell count.
  *
  * Null/NaN semantics match the staged form exactly: null input,
  * ragged lengths, or a null element yield a null result; a zero-norm
  * cosine coalesces to -1 per cell.
  */
case class CentroidSims(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "centroid_sims needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_sims requires ARRAY<DOUBLE>, got ${other.simpleString(10)}")
  }

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "centroid_sims"

  override protected def withNewChildInternal(newChild: Expression): CentroidSims =
    copy(child = newChild)

  @transient private lazy val centArrays: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  // r18: constant centroid norms hoisted out of the per-row loop (see
  // NearestCentroid — same index-order accumulation, bit-identical)
  @transient private lazy val centNorms: Array[Double] =
    NearestCentroid.norms(centArrays)

  override def nullSafeEval(input: Any): Any =
    CentroidSims.compute(input.asInstanceOf[ArrayData], centArrays, centNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centArrays, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.CentroidSims.compute($c, $centsRef, $normsRef);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }
}

object CentroidSims {

  /** Column-API entry point (casts the input to `ARRAY<DOUBLE>`). */
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(CentroidSims(
      Bridge.expression(vec.cast("array<double>")), centroids))

  /** SQL builder: `centroid_sims(vec, array(array(…), …))` — constant
    * centroid matrix folded at resolution; vec casts like the Column
    * API.
    */
  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "centroid_sims takes (vec, centroids)")
    CentroidSims(
      org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, ArrayType(DoubleType)),
      ConstArgs.matrix(args(1), "centroid_sims centroids"))
  }

  /** The fused loop (also the codegen target). Same per-cell
    * accumulation order as [[CosineSimilarity]]/[[NearestCentroid]];
    * r18: row norm hoisted out of the centroid loop, centroid norms
    * precomputed — bit-identical values (NearestCentroid.compute doc).
    */
  def compute(vec: ArrayData, cents: Array[Array[Double]],
      centNorms: Array[Double]): ArrayData = {
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    var nx = 0.0
    i = 0
    while (i < n) {
      val xi = vec.getDouble(i)
      nx += xi * xi
      i += 1
    }
    val nxs = math.sqrt(nx)
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != n) return null
      var dot = 0.0
      i = 0
      while (i < n) {
        dot += vec.getDouble(i) * cent(i)
        i += 1
      }
      val s = dot / (nxs * centNorms(c))
      out(c) = if (s.isNaN) -1.0 else s
      c += 1
    }
    new GenericArrayData(out)
  }
}
