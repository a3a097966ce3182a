package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) write layout for multi-column clustering.
  *
  * A linear `repartitionByRange(k1, k2).sortWithinPartitions(k1, k2)`
  * gives perfect parquet min/max file skipping on `k1` but none on `k2`
  * alone: every file spans the full `k2` domain. Sorting instead by the
  * interleaved bits of the columns' quantile-bucket ranks makes each
  * written file cover a small hyper-rectangle of the clustering space,
  * so a predicate on ANY clustering column prunes most files — the
  * layout BigQuery clustering and Delta `OPTIMIZE ZORDER BY` apply to
  * multi-column cluster keys.
  *
  * == 100 TB design ==
  *
  * The z-value is pure per-row arithmetic over literal quantile
  * boundaries: one extra `approxQuantile` pass over the batch being
  * written (all columns in a single job) computes the boundaries, and
  * the bucket/interleave expressions are codegen'd column math — no
  * shuffle beyond the range partition the linear layout already pays,
  * no UDFs, no driver-side row data. Quantile (not min/max linear)
  * bucketing keeps skewed columns balanced: every bucket holds ~1/64 of
  * the batch regardless of the value distribution. The curve quality
  * only affects *layout* (skipping efficiency), never results.
  */
object ZOrder {

  /** Buckets per column: 64 ranges is plenty at file granularity (a
    * partition rarely holds more than a few thousand files; 64^2 cells
    * already out-resolve that), and keeps the per-column fold short.
    */
  val Buckets = 64
  val BitsPerColumn = 6 // log2(Buckets)

  /** Orderable-to-double projection used for both quantile estimation
    * and bucket assignment; None for types z-order cannot rank (the
    * validator rejects them up front).
    */
  private[graft] def rankable(dt: DataType, c: Column): Option[Column] = dt match {
    case _: NumericType => Some(c.cast("double"))
    case DateType => Some(unix_date(c).cast("double"))
    case TimestampType => Some(unix_micros(c).cast("double"))
    case BooleanType => Some(c.cast("int").cast("double"))
    case _ => None
  }

  def supports(dt: DataType): Boolean = rankable(dt, lit(null)).isDefined

  /** Quantile-bucket index (0..Buckets-1) of `c` against sorted literal
    * `bounds`: the count of boundaries <= value. Nulls land in bucket 0
    * (the comparison is null → the filter drops every element), i.e.
    * null rows cluster together at the low corner — matching their
    * sort-first placement under the linear layout.
    */
  private[graft] def bucketOf(c: Column, bounds: Seq[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else size(filter(array(bounds.map(lit): _*), b => b <= c))

  /** Morton interleave: bit `i` of each of the `n` bucket indices maps
    * to bit `i*n + c` of the z-value. Plain shift/mask/sum — codegen'd.
    */
  private[graft] def interleaveBits(buckets: Seq[Column],
      bits: Int = BitsPerColumn): Column = {
    val n = buckets.size
    val terms = for {
      i <- 0 until bits
      c <- 0 until n
    } yield shiftleft(
      shiftright(buckets(c).cast("long"), i).bitwiseAND(lit(1L)),
      i * n + c)
    terms.reduce(_ + _)
  }

  /** The z-value column for `fields` of `df`: runs ONE
    * `approxQuantile` job over the frame to fix the bucket boundaries,
    * then returns the literal-bounded bucket+interleave expression.
    * Deterministic for a given frame (approxQuantile's result is a
    * deterministic function of the data and error bound).
    */
  def zValue(df: DataFrame, fields: Seq[String]): Column = {
    require(fields.size >= 2, s"z-order needs >= 2 columns, got $fields")
    val schema = df.schema
    val ranked = fields.map { f =>
      val dt = schema(f).dataType
      rankable(dt, col(s"`$f`")).getOrElse(
        throw new IllegalArgumentException(
          s"z-order field '$f' has unsupported type ${dt.simpleString}"))
    }
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val tmpNames = fields.indices.map(i => s"__zq$i")
    val projected = df.select(ranked.zip(tmpNames).map {
      case (c, nm) => c.as(nm) }: _*)
    val bounds = projected.stat.approxQuantile(tmpNames.toArray, probs, 0.005)
    val bucketCols = ranked.zip(bounds).map { case (c, bs) =>
      // dedup collapsed quantiles (heavy hitters) — bucketOf only needs
      // the distinct ascending boundaries
      bucketOf(c, bs.toSeq.distinct.sorted)
    }
    interleaveBits(bucketCols)
  }
}
