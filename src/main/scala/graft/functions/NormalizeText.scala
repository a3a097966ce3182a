package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's canonical text normalization
  *
  *   `trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "),
  *                        "\\s+", " "))`
  *
  * as ONE native codegen expression. The composed form is the single
  * most expensive per-byte operation in the text family — two
  * `java.util.regex` passes (each converting UTF8String → String →
  * UTF8String) over every document, paid by normalize/tokenize callers
  * across dedup, quality gates, n-gram contamination and the LM builds;
  * at the 100× bench tier one composed pass over the corpus measured
  * 15.9 s of the pipeline's 43 s (r17 profile, guide §1).
  *
  * Semantics are bit-identical to the composed form, by construction:
  *
  *  - **ASCII fast path** (every byte < 0x80): one pass over the bytes.
  *    `[A-Z]` lowercases to `[a-z]`; `[a-z0-9]` copies; every other
  *    byte — whether the first regex would have replaced it with a
  *    space or `\s+` would have collapsed it — begins/extends a
  *    separator run, which emits exactly one `' '` between alnum runs
  *    and nothing at the ends. This equals the composed form because,
  *    after `lower`, the first regex turns each non-alnum-non-ws char
  *    into a space (making every non-alnum run a whitespace run), the
  *    second collapses each whitespace run to one space, and `trim`
  *    drops the boundary runs.
  *  - **Fallback** (any byte ≥ 0x80): delegates to the literal chain —
  *    `UTF8String.toLowerCase` (what Spark's `lower` calls) and the
  *    same two compiled patterns `java.util.regex` applies for Spark's
  *    `regexp_replace`, then a space-only trim (after the second
  *    replace the string contains only `[a-z0-9 ]`, so space-trim is
  *    exactly Spark's `trim`). Multi-byte lowercasing oddities (İ → i̇,
  *    K → k) therefore take the identical code path Spark itself uses.
  *
  * Null → null; empty → empty.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_text requires STRING, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "norm_text"

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c);")
}

object NormalizeText {

  /** Column-API entry point. */
  def apply(text: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(text)))

  private[functions] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { args =>
    require(args.length == 1, "norm_text takes (text)")
    NormalizeText(args.head)
  }

  // the exact patterns Spark's regexp_replace compiles for the composed
  // form — used only on the (rare) non-ASCII fallback path
  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9\\s]")
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return fallback(s)
      i += 1
    }
    // ASCII fast path: single byte scan, output never longer than input
    val out = new Array[Byte](n)
    var o = 0
    var pendingSep = false // a separator run seen since the last alnum
    i = 0
    while (i < n) {
      var b = s.getByte(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSep && o > 0) { out(o) = ' '; o += 1 }
        pendingSep = false
        out(o) = b
        o += 1
      } else pendingSep = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private def fallback(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val r1 = NonAlnum.matcher(lowered).replaceAll(" ")
    val r2 = WsRun.matcher(r1).replaceAll(" ")
    // after r2 the string holds only [a-z0-9 ] plus any multi-byte
    // remnants already spaced — space-trim equals Spark's trim here
    var a = 0
    var z = r2.length
    while (a < z && r2.charAt(a) == ' ') a += 1
    while (z > a && r2.charAt(z - 1) == ' ') z -= 1
    UTF8String.fromString(r2.substring(a, z))
  }
}
