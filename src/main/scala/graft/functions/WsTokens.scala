package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization `split(trim(c), "\\s+")` — optionally over
  * `lower(trim(c))` — as ONE native codegen expression. The composed
  * regex split is the second-largest per-byte cost in the text family
  * after normalization (r17 profile: ~2 s per corpus pass at the 10×
  * tier in the span-dedup ops); this is a single byte scan.
  *
  * Bit-identical to the composed form by construction:
  *
  *  - **ASCII fast path**: space-only trim (what Spark's `trim` does),
  *    then split on maximal runs of Java `\s` = `[ \t\n\x0B\f\r]`,
  *    keeping the leading/trailing EMPTY tokens a Java `split(re, -1)`
  *    produces when the trimmed string starts/ends with a non-space
  *    whitespace char, and `[""]` for the empty string — the exact
  *    `StringSplit` semantics callers' `filter(_ =!= "")` / `when`
  *    guards already encode. `lowercase` maps `A-Z` during the copy
  *    (the composed form lowercases before splitting; for ASCII the
  *    two orders agree).
  *  - **Fallback** (any byte ≥ 0x80): the literal chain —
  *    `UTF8String.trim`, optional `UTF8String.toLowerCase` (Spark's
  *    `lower`), then the same compiled `\s+` pattern split with
  *    limit −1 that Spark's `split` runs.
  *
  * Null → null.
  */
case class WsTokens(child: Expression, lowercase: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires STRING, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ws_tokens"

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WsTokens.compute(input.asInstanceOf[UTF8String], lowercase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokens.compute($c, $lowercase);")
}

object WsTokens {

  /** Column-API entry point: `split(trim(c), "\\s+")`, lowercased first
    * when `lowercase` is set.
    */
  def apply(text: Column, lowercase: Boolean = false): Column =
    Bridge.column(WsTokens(Bridge.expression(text), lowercase))

  private[functions] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { args =>
    require(args.length == 1 || args.length == 2,
      "ws_tokens takes (text[, lowercase])")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val lc = if (args.length == 2) args(1) match {
      case Literal(b: Boolean, _) => b
      case _ => throw new IllegalArgumentException(
        "ws_tokens lowercase must be a boolean literal")
    } else false
    WsTokens(args.head, lc)
  }

  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s: UTF8String, lowercase: Boolean): GenericArrayData = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return fallback(s, lowercase)
      i += 1
    }
    // space-only trim (Spark's trim)
    var st = 0
    var en = n
    while (st < en && s.getByte(st) == ' ') st += 1
    while (en > st && s.getByte(en - 1) == ' ') en -= 1
    if (st == en) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new java.util.ArrayList[AnyRef](16)
    // Java split(re, -1): a leading separator yields a leading "", a
    // trailing separator a trailing ""
    if (isWs(s.getByte(st))) out.add(UTF8String.EMPTY_UTF8)
    i = st
    while (i < en) {
      while (i < en && isWs(s.getByte(i))) i += 1
      if (i < en) {
        val t0 = i
        while (i < en && !isWs(s.getByte(i))) i += 1
        val len = i - t0
        val b = new Array[Byte](len)
        var j = 0
        while (j < len) {
          var c = s.getByte(t0 + j)
          if (lowercase && c >= 'A' && c <= 'Z') c = (c + 32).toByte
          b(j) = c
          j += 1
        }
        out.add(UTF8String.fromBytes(b))
      } else out.add(UTF8String.EMPTY_UTF8) // trailing separator run
    }
    new GenericArrayData(out.toArray)
  }

  private def fallback(s: UTF8String, lowercase: Boolean): GenericArrayData = {
    val trimmed = s.trim()
    val base = if (lowercase) trimmed.toLowerCase else trimmed
    val parts = WsRun.split(base.toString, -1)
    new GenericArrayData(
      parts.map(p => UTF8String.fromString(p): AnyRef))
  }
}
