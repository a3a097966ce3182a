package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused dot product of two `ARRAY<DOUBLE>` columns — the norm-hoisted
  * half of [[CosineSimilarity]].
  *
  * == Why it exists (r18, guide §1.2 step 2: per-task work) ==
  *
  * The ANN quadratic scans (brute-force / PQ / SQ candidate passes)
  * evaluate a cosine per (corpus row × query) pair. [[CosineSimilarity]]
  * fuses dot + both norms into one loop — 3 FMAs per element — but the
  * two norms are functions of ONE side each: per pair, only the dot
  * actually needs both operands. Staging `sqrt(dot(v,v))` per corpus row
  * (inside the code relation's barrier) and per query row (on the
  * broadcast side) leaves 1 FMA per element per pair:
  * `dot(a,b) / (norm_a * norm_b)`.
  *
  * == Bit-exactness ==
  *
  * The substitution is bit-identical to [[CosineSimilarity]], not
  * approximately equal: this loop accumulates `dot += a(i)*b(i)` in the
  * same sequential index order as the fused loop's `dot`/`nx`/`ny`
  * accumulators (doubles are deterministic under a fixed op order), so
  * `DotProduct(a,a)` equals the fused `nx` exactly, `sqrt` of it equals
  * the fused `sqrt(nx)` whether taken per pair or staged per row, and
  * the final `Divide(dot, Multiply(norm_a, norm_b))` is the same
  * `dot / (sqrt(nx) * sqrt(ny))` double operation. Null semantics also
  * coincide where it matters: the per-pair dot is null on length
  * mismatch or any null element of either side — exactly the cases the
  * fused cosine returns null — and a null poisons the composed divide.
  * Parity is spec-pinned (`DotProductSpec`) against the fused form on
  * randomized vectors including the NaN / zero-norm / null-element /
  * length-mismatch edges.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // may return null even for non-null array inputs (length mismatch,
  // null element) — same surface as CosineSimilarity
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two ARRAY<DOUBLE> arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })
}

object DotProduct {

  /** Column-API entry point (casts inputs to `ARRAY<DOUBLE>`). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
}

/** The per-pair combiner of the norm-hoisted cosine:
  * `dot(a, b) / (an * bn)` with the division done in JAVA double
  * arithmetic — NOT Spark's `Divide`, which cannot reproduce the fused
  * cosine's IEEE semantics in either eval mode (ANSI throws
  * DIVIDE_BY_ZERO on a zero norm product; legacy returns NULL where
  * [[CosineSimilarity]] returns the 0/0 = NaN that `nanvl(…, -1)` call
  * sites rely on).
  *
  * Bit-identical to `CosineSimilarity(a, b)` when `an`/`bn` carry
  * `sqrt(dot(v, v))` of the respective side (see [[DotProduct]] — same
  * accumulation order, same scalar ops): values, NaN cases, and the
  * null surface (null inputs, length mismatch, null element) all
  * coincide. Parity pinned by `DotProductSpec`.
  */
case class StagedCosine(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, an, bn) => TypeCheckResult.TypeCheckFailure(
        s"staged_cosine requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>, DOUBLE, DOUBLE), " +
          s"got (${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${an.simpleString(10)}, ${bn.simpleString(10)})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "staged_cosine"

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): StagedCosine =
    copy(first = f, second = s, third = t, fourth = q)

  override def nullSafeEval(a: Any, b: Any, an: Any, bn: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot / (an.asInstanceOf[Double] * bn.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, an, bn) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / ($an * $bn);
         |  }
         |}
       """.stripMargin
    })
}

object StagedCosine {

  /** Column-API entry point: `a`/`b` cast to `ARRAY<DOUBLE>`, the
    * staged norms to `DOUBLE`.
    */
  def apply(a: Column, b: Column, an: Column, bn: Column): Column =
    Bridge.column(StagedCosine(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>")),
      Bridge.expression(an.cast("double")),
      Bridge.expression(bn.cast("double"))))
}
