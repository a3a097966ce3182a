package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Exponential-histogram quantile sketch (the DDSketch shape, Masson
    * et al. 2019) over POSITIVE integer values: value v lands in bucket
    * `e*subs + floor((v - 2^e)*subs / 2^e)` where `e = floor(log2 v)` —
    * computed as `length(bin(v)) - 1`, pure integer arithmetic any
    * engine replays bit-for-bit (the divisor is a power of two, so even
    * the one double division is IEEE-exact). Bucket width is relative:
    * a quantile read back from bucket midpoints is within `1/(2*subs)`
    * relative error of the true quantile (6.25% at the default
    * subs = 8), spec-pinned against exact percentiles.
    *
    * Non-positive values are excluded (DDSketch stores them in separate
    * zero/negative stores; callers needing them sketch `-v` / count
    * zeros alongside).
    *
    * == 100 TB design ==
    *
    * Like [[countMin]], the build is one partial-aggregated groupBy:
    * map-side combine reduces every partition to ≤ `keys ×
    * subs*log2(max)` cells (≤ ~170 per key for 64-bit cent values)
    * before the exchange — constant shuffle volume in corpus size.
    * Sketches merge by per-cell addition ([[ddMerge]]), so per-shard /
    * per-day sketches roll up without rescanning, and the quantile read
    * ([[ddQuantiles]]) runs on the O(keys × buckets) relation only.
    */
  def ddSketch(df: DataFrame, keyCol: String, valueCol: String,
      subs: Int = 8): DataFrame = {
    require(subs > 0, s"subs must be positive: $subs")
    df.select(col(keyCol).as("key"), col(valueCol).cast("long").as("__v"))
      .where(col("__v") > 0)
      .withColumn("__e", (length(bin(col("__v"))) - 1).cast("int"))
      .withColumn("__p", pow(lit(2.0), col("__e")))
      .withColumn("bucket", (col("__e") * subs +
        floor((col("__v").cast("double") - col("__p")) * subs / col("__p"))
          .cast("int")).cast("int"))
      .groupBy(col("key"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge quantile sketches of identical `subs` by per-cell addition. */
  def ddMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("key"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Read quantiles out of a [[ddSketch]] relation. Each requested
    * quantile is a RATIONAL `(name, num, den)` — e.g. `("p90", 9, 10)`
    * — so the target rank `ceil(q*n) = (num*n + den - 1) div den` is
    * integer-exact; the answer bucket is the first whose cumulative
    * count reaches the rank, and the estimate is the bucket midpoint
    * `2^e * (2*s + 2*subs + 1) / (2*subs)` (exact double arithmetic:
    * power-of-two divisor). Runs entirely on the O(keys × buckets)
    * sketch — one per-key window pass plus a per-(key, quantile)
    * aggregate.
    */
  def ddQuantiles(sketch: DataFrame, qs: Seq[(String, Int, Int)],
      subs: Int = 8): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    require(qs.forall { case (_, n, d) => n > 0 && d > 0 && n <= d },
      s"quantiles must be rationals in (0, 1]: $qs")
    val perKey = Window.partitionBy(col("key"))
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(perKey.orderBy(col("bucket"))))
      .withColumn("total", sum(col("cnt")).over(perKey))
    cum
      .withColumn("__q", explode(array(qs.map { case (name, num, den) =>
        struct(lit(name).as("qname"), lit(num.toLong).as("num"),
          lit(den.toLong).as("den"))
      }: _*)))
      .withColumn("__a", col("total") * col("__q.num") + (col("__q.den") - 1))
      .withColumn("__rank",
        ((col("__a") - pmod(col("__a"), col("__q.den"))) / col("__q.den")).cast("long"))
      .groupBy(col("key"), col("__q.qname").as("q"))
      .agg(min(when(col("cum") >= col("__rank"), col("bucket"))).as("bucket"))
      .withColumn("__s", pmod(col("bucket"), lit(subs)))
      .withColumn("__e", ((col("bucket") - col("__s")) / subs).cast("int"))
      .withColumn("est",
        pow(lit(2.0), col("__e")) * (col("__s") * 2 + 2 * subs + 1) / (2.0 * subs))
      .select(col("key"), col("q"), col("bucket"), col("est"))
  }
}
