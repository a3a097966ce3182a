package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** TIFF header walk (byte-order mark, magic-42 in that byte order,
  * first-IFD pointer follow, bounded tag scan for ImageWidth /
  * ImageLength) as ONE native expression.
  *
  * The composed Column form
  * ([[graft.llm.MultimodalOps.tiffMetaComposed]]) re-derives the
  * endianness branch and the IFD pointer inside every one of the
  * `2 × maxEntries` tag probes; the expanded tree's single generated
  * method exceeds janino's 64 KB limit at the default `maxEntries = 6`,
  * which silently drops the WHOLE project stage (observed on the m6
  * sweep: `InternalCompilerException: Code grows beyond 64 KB` →
  * whole-stage codegen disabled) to interpreted evaluation. Here the
  * walk is a static call and the stage stays codegen'd — the same fix
  * [[PqEncode]] and [[NearestCentroid]] applied to their composed
  * forms. The composed form stays as the bit-parity reference
  * (spec-pinned on hand-written files, its own encoder, and random
  * bytes), mirroring [[WinnowFingerprints]]'s pattern.
  *
  * Semantics notes pinned by the parity spec: out-of-bounds reads are
  * null probes (the composed `substring → hex → conv` chain yields
  * null); a NEGATIVE computed offset reads from the payload's END
  * (Spark substring semantics — reproduced here byte-for-byte); an IFD
  * pointer or dimension past int range marks the file corrupt →
  * `unknown` (under ANSI mode — Spark 4's default — an unchecked cast
  * would throw CAST_OVERFLOW on one corrupt file and kill the query;
  * fuzz-found in the composed form and fixed in both); and a matched
  * tag whose value bytes are unreadable falls through to the next
  * probe (`coalesce` takes the first non-null VALUE).
  */
case class TiffMeta(child: Expression, maxEntries: Int)
    extends UnaryExpression {

  require(maxEntries > 0, s"maxEntries must be positive: $maxEntries")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tiff_meta requires BINARY, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("byte_order", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  override def prettyName: String = "tiff_meta"

  override protected def withNewChildInternal(newChild: Expression): TiffMeta =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    TiffMeta.compute(input.asInstanceOf[Array[Byte]], maxEntries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TiffMeta.compute($c, $maxEntries);")
}

object TiffMeta {

  /** Column-API entry point. */
  def apply(payload: Column, maxEntries: Int = 6): Column =
    Bridge.column(TiffMeta(Bridge.expression(payload), maxEntries))

  private val unknown: InternalRow = new GenericInternalRow(
    Array[Any](UTF8String.fromString("unknown"), null, null, null))

  /** One byte read with EXACT `substring(payload, pos, 1)` semantics:
    * 1-based, position 0 treated as 1, negative positions count from
    * the end, out-of-range yields -1 (the composed chain's null).
    */
  private def byteAt(bytes: Array[Byte], pos: Int): Int = {
    val n = bytes.length
    val idx = if (pos > 0) pos - 1 else if (pos == 0) 0 else n + pos
    if (idx < 0 || idx >= n) -1 else bytes(idx) & 0xff
  }

  /** The fused walk (also the codegen target — a static call per row).
    * Never returns null: non-TIFF input yields the `unknown` row, like
    * the composed `otherwise` branch.
    */
  def compute(bytes: Array[Byte], maxEntries: Int): InternalRow = {
    val b0 = byteAt(bytes, 1)
    val b1 = byteAt(bytes, 2)
    val le = b0 == 0x49 && b1 == 0x49 // "II"
    val isTiff = le || (b0 == 0x4D && b1 == 0x4D) // "MM"
    // -1L = null (a missing byte poisons the whole read)
    def u16e(off: Int): Long = {
      val a = byteAt(bytes, off); val b = byteAt(bytes, off + 1)
      if (a < 0 || b < 0) -1L
      else if (le) a + b * 256L else a * 256L + b
    }
    def u32e(off: Int): Long = {
      val a = byteAt(bytes, off); val b = byteAt(bytes, off + 1)
      val c = byteAt(bytes, off + 2); val d = byteAt(bytes, off + 3)
      if (a < 0 || b < 0 || c < 0 || d < 0) -1L
      else if (le) a + b * 256L + c * 65536L + d * 16777216L
      else a * 16777216L + b * 65536L + c * 256L + d
    }
    if (!isTiff || u16e(3) != 42L) return unknown
    val ifdPtr = u32e(5)
    // pointer must leave every probe offset (ifd + 2 + 12·maxEntries
    // − 1) inside int range — corrupt otherwise, like the composed gate
    if (ifdPtr < 0 || ifdPtr + 1 > Int.MaxValue - 12 * maxEntries - 2)
      return unknown
    val ifd = (ifdPtr + 1).toInt
    val cnt = u16e(ifd)
    // first probe whose tag matches AND whose value is readable — a
    // matched-but-unreadable probe falls through, like coalesce
    def tagVal(tag: Long): Long = {
      if (cnt < 0) return -1L // null count nulls every probe condition
      var i = 0
      while (i < maxEntries) {
        if (i < cnt) {
          val pos = ifd + 2 + 12 * i
          if (u16e(pos) == tag) {
            val v = u32e(pos + 8)
            if (v >= 0) return v
          }
        }
        i += 1
      }
      -1L
    }
    val width = tagVal(256L)
    val height = tagVal(257L)
    // dims past int range are corrupt too (same ANSI cast hazard)
    if (width < 0 || height < 0 ||
        width > Int.MaxValue || height > Int.MaxValue) return unknown
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("tiff"),
      UTF8String.fromString(if (le) "II" else "MM"),
      width.toInt, height.toInt))
  }
}
