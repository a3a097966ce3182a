package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Nearest-centroid cell assignment as a native Catalyst expression:
  * `struct(cell INT, sim DOUBLE)` — the argmax-cosine cell over a
  * centroid matrix (first maximum = lowest cell on ties, NaN cosine
  * coalesced to -1 so zero-norm vectors land in a deterministic cell
  * and rank last).
  *
  * This is the large-k form of the staged
  * `array_position(cellSims, array_max(cellSims))` argmax used by
  * [[graft.llm.SimOps]]: the staged-array form inlines one fused cosine
  * per centroid into the stage's generated `processNext()`, which
  * janino refuses outright around a thousand cells (whole-stage codegen
  * compiles the WHOLE stage into one class, so sharding the expression
  * into blocks does not help — measured: k=1024 × dim=64 throws
  * `InternalCompilerException`). Here the centroid matrix rides along
  * as a reference object and the generated code is ONE static call, so
  * the stage stays inside whole-stage codegen — and inside the JVM's
  * 8000-byte JIT method threshold — at any k (spec-pinned at k=1024
  * with codegen byte-code stats).
  *
  * Semantics are bit-identical to the staged form (parity-spec'd):
  * per-cell cosine accumulates left-to-right exactly like
  * [[CosineSimilarity]], and null inputs / ragged lengths / null
  * elements yield null, matching how a null poisons every element of
  * the staged sims array.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires ARRAY<DOUBLE>, got ${other.simpleString(10)}")
  }

  // null for a null/ragged/null-element input vector
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def prettyName: String = "nearest_centroid"

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  @transient private lazy val centArrays: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  // r18 (guide §1.2 step 2): centroid norms are constants — computed
  // once per expression (same index-order accumulation as the fused
  // loop, so sqrt of them is the identical double) instead of once per
  // (row × centroid)
  @transient private lazy val centNorms: Array[Double] =
    NearestCentroid.norms(centArrays)

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], centArrays, centNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centArrays, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.NearestCentroid.compute($c, $centsRef, $normsRef);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }
}

object NearestCentroid {

  /** Column-API entry point (casts the input to `ARRAY<DOUBLE>`). */
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroid(
      Bridge.expression(vec.cast("array<double>")), centroids))

  /** SQL builder: `nearest_centroid(vec, array(array(…), …))` — the
    * centroid matrix must be a constant array literal (it shapes the
    * expression; [[ConstArgs.matrix]] folds it at resolution). The
    * vector argument casts to `ARRAY<DOUBLE>` like the Column API.
    */
  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "nearest_centroid takes (vec, centroids)")
    NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, ArrayType(DoubleType)),
      ConstArgs.matrix(args(1), "nearest_centroid centroids"))
  }

  /** The fused loop (also the codegen target — a static call per row).
    * Returns null for ragged lengths or null elements — the same
    * poisoning the staged per-cell cosines produce.
    *
    * r18: the row norm hoists out of the centroid loop (it is the same
    * accumulation over the same vector every iteration — identical
    * double) and centroid norms arrive precomputed (`norms`), so the
    * inner loop is 1 FMA per element instead of 3. `s` is the same
    * `dot / (sqrt(nx) * sqrt(ny))` double as before — bit-identical,
    * parity re-pinned by the existing staged-form spec.
    */
  def compute(vec: ArrayData, cents: Array[Array[Double]],
      centNorms: Array[Double]): InternalRow = {
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
    var best = -2.0
    var bestCell = -1
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
      var s = dot / (nxs * centNorms(c))
      if (s.isNaN) s = -1.0 // nanvl(cosine, -1): zero-norm ranks last
      // strict greater-than: first maximum wins, matching the staged
      // array_position(cellSims, array_max(cellSims)) first occurrence
      if (s > best) { best = s; bestCell = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCell, best))
  }

  /** Per-centroid `sqrt(Σ y²)` in the fused loop's index order — the
    * constant half of every cosine in [[compute]].
    */
  def norms(cents: Array[Array[Double]]): Array[Double] = {
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var ny = 0.0
      var i = 0
      while (i < cent.length) {
        val yi = cent(i)
        ny += yi * yi
        i += 1
      }
      out(c) = math.sqrt(ny)
      c += 1
    }
    out
  }
}
