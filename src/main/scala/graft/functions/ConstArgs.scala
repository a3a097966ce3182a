package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Builder-side extraction of constant structural arguments for the
  * SQL registrations of the native ANN expressions. A centroid matrix
  * or PQ codebook shapes the expression (it rides into codegen as a
  * reference object), like a window-frame bound — so it must be
  * foldable, evaluated ONCE at resolution time, never per row. Numeric
  * literals coerce through a Cast to double, so
  * `array(array(1, 2), …)` works as SQL users would expect.
  */
private[functions] object ConstArgs {

  private def folded(e: Expression, tpe: ArrayType, what: String): ArrayData = {
    require(e.foldable, s"$what must be a constant (foldable) array literal")
    val v = Cast(e, tpe).eval()
    require(v != null, s"$what must not be null")
    v.asInstanceOf[ArrayData]
  }

  /** `array(array(double))` → centroid matrix. */
  def matrix(e: Expression, what: String): Seq[Seq[Double]] = {
    val rows = folded(e, ArrayType(ArrayType(DoubleType)), what)
    (0 until rows.numElements()).map { i =>
      val r = rows.getArray(i)
      require(r != null, s"$what: row $i is null")
      (0 until r.numElements()).map { j =>
        require(!r.isNullAt(j), s"$what: element [$i][$j] is null")
        r.getDouble(j)
      }
    }
  }

  /** `array(array(array(double)))` → PQ codebook (subspace → centroid
    * → dims).
    */
  def cube(e: Expression, what: String): Seq[Seq[Seq[Double]]] = {
    val subs = folded(e, ArrayType(ArrayType(ArrayType(DoubleType))), what)
    (0 until subs.numElements()).map { j =>
      val cents = subs.getArray(j)
      require(cents != null, s"$what: subspace $j is null")
      (0 until cents.numElements()).map { c =>
        val cent = cents.getArray(c)
        require(cent != null, s"$what: centroid [$j][$c] is null")
        (0 until cent.numElements()).map { i =>
          require(!cent.isNullAt(i), s"$what: element [$j][$c][$i] is null")
          cent.getDouble(i)
        }
      }
    }
  }

  /** Plain integer literal (shape parameter). */
  def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be an integer literal")
  }
}
