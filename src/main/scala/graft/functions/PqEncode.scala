package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder as a native Catalyst expression: for
  * each subspace, the index of the codebook centroid with minimum
  * squared L2 distance to the vector's subrange (first minimum = lowest
  * code on ties), all subspaces in one tight loop.
  *
  * The composed form — `numSubspaces × numCentroids` staged `(x−c)²`
  * sum chains plus `array_position(array_min(…))` — is semantically
  * identical but expands to >64 KB of generated code at realistic
  * codebook sizes (8×16×8 ≈ a thousand terms), which silently disables
  * whole-stage codegen for the entire encode stage and drops the scan
  * to interpreted evaluation (~3× slower measured). Here the codebook
  * rides along as a reference object and the generated code is one
  * static call, so the stage stays inside whole-stage codegen no
  * matter the codebook size.
  *
  * Accumulation order matches the composed form and the SQL oracle:
  * per-dimension terms fold left-to-right in ascending index order, so
  * distances — and therefore argmin choices — are bit-identical.
  * Parity with the composed form is spec-pinned like
  * [[CosineSimilarity]]'s.
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "codebook must have at least one centroid per subspace")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<DOUBLE>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  @transient private lazy val bookArrays: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], bookArrays)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", bookArrays,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.compute($c, $booksRef);")
  }
}

object PqEncode {

  /** Column-API entry point. */
  def apply(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), books))

  /** SQL builder: `pq_encode(vec, array(array(array(…))))` — the
    * codebook (subspace → centroid → dims) must be a constant array
    * literal, folded at resolution; vec casts to `ARRAY<DOUBLE>`.
    */
  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "pq_encode takes (vec, codebooks)")
    PqEncode(
      org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, ArrayType(DoubleType)),
      ConstArgs.cube(args(1), "pq_encode codebooks"))
  }

  /** The fused loop (also the codegen target — a static call per row).
    * `books(j)(c)(i)` = dimension `i` of centroid `c` in subspace `j`;
    * subspace `j` covers vector dims `[j·subDim, (j+1)·subDim)`.
    */
  def compute(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val numSubspaces = books.length
    val codes = new Array[Int](numSubspaces)
    var j = 0
    while (j < numSubspaces) {
      val cents = books(j)
      val subDim = cents(0).length
      val base = j * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = vec.getDouble(base + i) - cent(i)
          d += x * x
          i += 1
        }
        // strict less-than: first minimum wins, matching the composed
        // array_position(array_min) and the oracle's ORDER BY d2, cid
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}
