package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash signature of a shingle-set column as a native Catalyst
  * expression: one md5 per shingle, Kirsch-Mitzenmacher double hashing
  * (`g_j = (h1 + j*h2) mod 2^32`), all `numHashes` running minima carried
  * through a single tight loop.
  *
  * The composed form ([[graft.llm.DedupOps.signatureFromHashes]] over
  * [[graft.llm.DedupOps.shingleHashes]]) evaluates interpreted
  * higher-order functions with per-step array allocation — correct, but
  * the dominant map-side cost of the near-dup pipelines. This expression
  * computes bit-identical values (h1/h2 are the digest's first/second
  * 4 bytes as unsigned ints, exactly `conv(substr(md5hex, 1|9, 8), 16,
  * 10)`) with zero intermediate allocation; the composed form stays as
  * the parity reference, mirroring [[CosineSimilarity]]'s pattern.
  *
  * Null shingle elements are skipped (the composed form's `least`
  * ignores the nulls they produce); an empty or all-null set yields
  * `Long.MaxValue` minima, matching the fold's init.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires ARRAY<STRING>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $numHashes);")
}

object MinHashSignature {

  /** Column-API entry point. */
  def apply(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** SQL builder: `minhash_signature(shingles, numHashes)` — the hash
    * count must be an integer literal (it fixes the output arity).
    */
  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2,
      "minhash_signature takes (shingles, numHashes)")
    import org.apache.spark.sql.catalyst.expressions.Literal
    args(1) match {
      case Literal(n: Int, _) => MinHashSignature(args.head, n)
      case _ => throw new IllegalArgumentException(
        "minhash_signature numHashes must be an integer literal")
    }
  }

  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The fused loop (also the codegen target — a static call per row). */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = mdPool.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var j = 0
        while (j < numHashes) {
          val g = (h1 + j * h2) % 4294967296L
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
