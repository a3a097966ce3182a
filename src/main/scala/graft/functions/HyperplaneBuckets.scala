package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numTables` hyperplane-LSH bucket keys of a vector as one fused
  * native expression.
  *
  * The composed form ([[graft.llm.SimOps.lshBucket]] per table) evaluates
  * `tables × planes` interpreted aggregate/zip_with passes per row AND
  * re-derives the md5-based plane components — which are constants of
  * (plane, dimension), not of the row — once per row per dimension.
  * Here the components are computed once per executor (memoized,
  * append-only cache) and each row does `tables × planes` tight dot
  * products. Values are bit-identical to the composed form, including
  * its null semantics: a null vector element nulls every dot product,
  * which the CaseWhen turns into a '0' bit.
  */
case class HyperplaneBuckets(child: Expression, numPlanes: Int, numTables: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numTables > 0,
    s"numPlanes/numTables must be positive, got $numPlanes/$numTables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires ARRAY<DOUBLE>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "hyperplane_buckets"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], numPlanes, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBuckets.compute($c, $numPlanes, $numTables);")
}

object HyperplaneBuckets {

  /** Column-API entry point. */
  def apply(vec: Column, numPlanes: Int, numTables: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), numPlanes, numTables))

  /** SQL builder: `hyperplane_buckets(vec, numPlanes, numTables)` —
    * shape parameters must be integer literals; vec casts to
    * `ARRAY<DOUBLE>`.
    */
  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3,
      "hyperplane_buckets takes (vec, numPlanes, numTables)")
    HyperplaneBuckets(
      org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, ArrayType(DoubleType)),
      ConstArgs.intLit(args(1), "hyperplane_buckets numPlanes"),
      ConstArgs.intLit(args(2), "hyperplane_buckets numTables"))
  }

  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  // plane components keyed by (globalPlane, dim) — constants of the
  // configuration, computed once per executor JVM and memoized
  private val componentCache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()

  /** `planeComponent(p, d)` — md5("p{p}_d{d}") first 6 hex chars as a
    * 24-bit int, scaled to [-1, 1]: identical to the SQL/column formula.
    * Shared with [[RpProject]] (r18) — both draw from the same global
    * plane family, so the memoized cache serves both.
    */
  private[functions] def planeComponent(plane: Int, dim: Int): Double =
    component(plane, dim)

  private def component(plane: Int, dim: Int): Double = {
    val key = plane.toLong << 32 | (dim.toLong & 0xffffffffL)
    val cached = componentCache.get(key)
    if (cached != null) cached.doubleValue()
    else {
      val md = mdPool.get()
      md.reset()
      val d = md.digest(s"p${plane}_d$dim".getBytes("UTF-8"))
      val v24 = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
      val v = v24.toDouble / 8388607.5 - 1.0
      componentCache.putIfAbsent(key, java.lang.Double.valueOf(v))
      v
    }
  }

  /** The fused loop (also the codegen target — a static call per row). */
  def compute(vec: ArrayData, numPlanes: Int, numTables: Int): ArrayData = {
    val n = vec.numElements()
    // a null element nulls every dot product (zip_with semantics); the
    // composed CaseWhen maps a null predicate to '0'
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    val out = new Array[AnyRef](numTables)
    var t = 0
    while (t < numTables) {
      val sb = new java.lang.StringBuilder(numPlanes + 8)
      sb.append(t).append(':')
      var p = 0
      while (p < numPlanes) {
        val g = t * numPlanes + p
        if (hasNull) sb.append('0')
        else {
          var dot = 0.0
          var d = 0
          while (d < n) {
            dot += vec.getDouble(d) * component(g, d)
            d += 1
          }
          // GreaterThanOrEqual on doubles is nan-safe in Spark (NaN sorts
          // above every value), so a NaN dot product is a '1' bit in the
          // composed form — match it
          sb.append(if (dot >= 0 || java.lang.Double.isNaN(dot)) '1' else '0')
        }
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }
}
