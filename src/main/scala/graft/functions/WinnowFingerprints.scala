package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) of an
  * already-normalized text column as a native Catalyst expression: one
  * md5 per character `k`-gram, sliding-`window` minima, first-occurrence
  * distinct — one tight loop, zero intermediate arrays.
  *
  * The composed form
  * ([[graft.llm.DedupOps.winnowedFingerprintsComposed]]) evaluates
  * interpreted higher-order functions (HOFs are CodegenFallback) with
  * per-gram and per-window allocation — correct, but the dominant
  * map-side cost of the winnowed-overlap pipeline. This expression
  * computes bit-identical values: the gram hash is the digest's first
  * 4 bytes as an unsigned int, exactly `conv(substr(md5hex, 1, 8), 16,
  * 10)`, the same h1 as [[MinHashSignature]]. The composed form stays
  * as the parity reference, mirroring [[CosineSimilarity]]'s pattern.
  *
  * Fewer than `window` grams (but at least one) yield the single global
  * minimum; no grams yield an empty array; null text yields null.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k >= 2 && window >= 2, s"need k >= 2 and window >= 2: $k/$window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires STRING, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($c, $k, $window);")
}

object WinnowFingerprints {

  /** Column-API entry point; `text` must already be normalized. */
  def apply(text: Column, k: Int, window: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, window))

  /** SQL builder: `winnow_fingerprints(text, k, window)` — k/window
    * must be integer literals (they shape the expression, like a
    * window frame bound).
    */
  private[functions] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { args =>
    require(args.length == 3,
      "winnow_fingerprints takes (text, k, window)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    (args(1), args(2)) match {
      case (Literal(k: Int, _), Literal(w: Int, _)) =>
        WinnowFingerprints(args.head, k, w)
      case _ => throw new IllegalArgumentException(
        "winnow_fingerprints k/window must be integer literals")
    }
  }

  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The fused loop (also the codegen target — a static call per row). */
  def compute(s: UTF8String, k: Int, window: Int): ArrayData = {
    // CODE-POINT semantics to match Column.substr/length on the composed
    // path: Spark counts code points, Java String counts UTF-16 units,
    // and the function is SQL-registered for arbitrary input — a
    // supplementary-plane character must not split a gram differently
    // here than in the composed reference. (Normalized internal text is
    // ASCII, where the two coincide — but don't rely on it.)
    val t = s.toString
    val nChars = t.length
    // offsets(i) = UTF-16 index where code point i starts
    val offsets = new Array[Int](nChars + 1)
    var ncp = 0
    var ci = 0
    while (ci < nChars) {
      offsets(ncp) = ci
      ci += Character.charCount(t.codePointAt(ci))
      ncp += 1
    }
    offsets(ncp) = nChars
    if (ncp < k) return new GenericArrayData(Array.empty[Long])
    val md = mdPool.get()
    val grams = new Array[Long](ncp - k + 1)
    var i = 0
    while (i <= ncp - k) {
      md.reset()
      val d = md.digest(t.substring(offsets(i), offsets(i + k)).getBytes("UTF-8"))
      grams(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // first-occurrence-ordered distinct window minima, matching the
    // composed form's array_distinct(transform(...)) exactly
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (grams.length < window) {
      var m = Long.MaxValue
      var j = 0
      while (j < grams.length) { if (grams(j) < m) m = grams(j); j += 1 }
      seen.add(m)
    } else {
      var st = 0
      while (st <= grams.length - window) {
        var m = grams(st)
        var j = 1
        while (j < window) {
          if (grams(st + j) < m) m = grams(st + j)
          j += 1
        }
        seen.add(m)
        st += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
