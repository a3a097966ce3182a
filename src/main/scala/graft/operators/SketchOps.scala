package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches. Companion to the engine's other
  * bounded-state summaries (HLL distinct counts in
  * [[ViewMaintenance]], the MinHash estimator in graft.llm.DedupOps):
  * a count-min sketch (Cormode & Muthukrishnan 2005) answers
  * "how often does key x occur?" from `depth × width` counters instead
  * of a full distinct-key table — the heavy-hitter / frequency primitive
  * for streams and multi-tenant corpora whose key cardinality dwarfs
  * memory.
  *
  * Hashing is the engine's deterministic md5 convention (row-salted, so
  * the `depth` rows are independent), which a SQL oracle replays
  * byte-for-byte. Counters are exact integers: the only approximation
  * is bucket collision, which only ever ADDS — `estimate ≥ true count`
  * always (spec-pinned), with overshoot ≤ εN at ε = e/width with
  * probability 1-δ at δ = e^-depth.
  *
  * == 100 TB design ==
  *
  * The sketch build is one partial-aggregated groupBy over (row,
  * bucket) — map-side combine crushes the stream to ≤ depth×width rows
  * per partition before the exchange, so shuffle volume is CONSTANT in
  * the corpus size. Sketches merge by per-cell addition ([[cmsMerge]]),
  * the property that lets per-day/per-shard sketches roll up without
  * rescanning. Estimation broadcasts the tiny sketch against the probe
  * keys — the probe side stays map-only.
  */
object SketchOps {

  private def bucket(row: Int, key: org.apache.spark.sql.Column,
      width: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(to_binary(
      concat(lit(s"cms$row:"), key.cast("string")), lit("utf-8"))), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build a count-min sketch over `keyCol` occurrences: one
    * `(row, bucket, cnt)` cell per non-empty counter (≤ depth × width
    * rows).
    */
  def countMin(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("row"), bucket(r, col(keyCol), width).as("bucket"))): _*))
        .as("__rb"))
      .groupBy(col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches of identical shape by per-cell addition — the
    * roll-up path for per-shard / per-day sketches.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Estimate each probe key's occurrence count: min over the sketch
    * rows of the key's counter. The sketch (≤ depth × width rows)
    * broadcasts; probes stay map-only. Keys absent from every counter
    * estimate 0.
    */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    keys.select(col(keyCol),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("row"), bucket(r, col(keyCol), width).as("bucket"))): _*))
          .as("__rb"))
      .select(col(keyCol), col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
