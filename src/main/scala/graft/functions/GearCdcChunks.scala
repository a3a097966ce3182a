package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking with a GEAR-TABLE ROLLING HASH (the
  * FastCDC/ddelta boundary function) as a native Catalyst expression —
  * the production O(n)-per-document form of
  * [[graft.llm.TextOps.chunkContentDefined]], whose engine-portable
  * md5-per-window boundary test is O(n·window·md5) and the most
  * expensive per-byte text operation in the engine.
  *
  * Boundary function, defined over CODE POINTS so Column.substr /
  * DuckDB substr / this loop all agree on arbitrary input (the
  * [[WinnowFingerprints]] convention):
  *
  *   h(p) = Σ_{i=max(1,p−31)}^{p} G[cp_i mod 256] · 2^(p−i)  (mod 2^32)
  *
  * computed by the rolling recurrence `h = ((h << 1) + G[cp & 255]) &
  * 0xffffffff` — one table lookup, shift, and add per code point. A cut
  * falls AFTER position p (1-based) when `p ∈ [32, n−1]` and
  * `h(p) % divisor == 0`; expected chunk length ≈ divisor code points,
  * and because h(p) sees only the trailing ≤32 code points, boundaries
  * are edit-local: an insertion early in a document leaves all later
  * chunks byte-identical (the rsync/LBFS property — same guarantee,
  * different boundary set, as the md5 form). The gear table is
  * derived, not magic: `G[j]` = first 4 bytes of `md5("gear-" + j)` as
  * an unsigned 32-bit value, so SQL oracles (Spark or DuckDB) can
  * re-derive it and the whole boundary set exactly — see
  * [[graft.llm.TextOps.gearCdcChunksComposed]], the bit-parity
  * reference.
  *
  * Returns `array<struct<s:int, l:int, h:string>>`: 1-based code-point
  * start, code-point length, md5 hex of the chunk's UTF-8 bytes —
  * exactly [[graft.llm.TextOps.chunkContentDefined]]'s chunk cells.
  * Empty text → empty array; null → null.
  */
case class GearCdcChunks(child: Expression, divisor: Int)
    extends UnaryExpression {

  require(divisor >= 1, s"divisor must be >= 1, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_cdc_chunks requires STRING, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = GearCdcChunks.resultType

  override def prettyName: String = "gear_cdc_chunks"

  override protected def withNewChildInternal(newChild: Expression): GearCdcChunks =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    GearCdcChunks.compute(input.asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GearCdcChunks.compute($c, $divisor);")
}

object GearCdcChunks {

  val Window = 32 // the rolling hash's span in code points

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("l", IntegerType, nullable = false),
    StructField("h", StringType, nullable = false))), containsNull = false)

  /** Column-API entry point. */
  def apply(text: Column, divisor: Int): Column =
    Bridge.column(GearCdcChunks(Bridge.expression(text), divisor))

  /** SQL builder: `gear_cdc_chunks(text, divisor)` — divisor must be
    * an integer literal (it shapes the expression).
    */
  private[functions] val builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { args =>
    require(args.length == 2, "gear_cdc_chunks takes (text, divisor)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    args(1) match {
      case Literal(d: Int, _) => GearCdcChunks(args.head, d)
      case _ => throw new IllegalArgumentException(
        "gear_cdc_chunks divisor must be an integer literal")
    }
  }

  /** The derived gear table: G[j] = first 4 md5 bytes of "gear-j",
    * unsigned. Public so the composed parity form and the DuckDB
    * oracle generator share the exact constants.
    */
  val gearTable: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { j =>
      md.reset()
      val d = md.digest(s"gear-$j".getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }.toArray
  }

  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): UTF8String = {
    val d = mdPool.get()
    d.reset()
    val dig = d.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((dig(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(dig(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** The fused loop (also the codegen target — a static call per row). */
  def compute(s: UTF8String, divisor: Int): ArrayData = {
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
    if (ncp == 0) return new GenericArrayData(Array.empty[Any])
    // rolling gear hash over code points; cut AFTER position p (1-based)
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var p = 0
    while (p < ncp) {
      h = ((h << 1) + gearTable(t.codePointAt(offsets(p)) & 0xff)) & 0xffffffffL
      val pos1 = p + 1
      if (pos1 >= Window && pos1 <= ncp - 1 && h % divisor == 0) cuts += pos1
      p += 1
    }
    val bounds = 0 +: cuts.toSeq :+ ncp
    val rows = new Array[Any](bounds.length - 1)
    var k = 0
    while (k < bounds.length - 1) {
      val s0 = bounds(k)
      val e0 = bounds(k + 1)
      val chunk = t.substring(offsets(s0), offsets(e0))
      rows(k) = new GenericInternalRow(Array[Any](
        s0 + 1, e0 - s0, md5Hex(chunk.getBytes("UTF-8"))))
      k += 1
    }
    new GenericArrayData(rows)
  }
}
