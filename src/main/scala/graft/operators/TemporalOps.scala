package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators a training-data / event pipeline needs that Spark
  * has no single built-in for: backward as-of join, gap sessionization,
  * and point-in-interval range join. Each is expressed as a composition
  * of shuffle-minimal built-ins (the brief's preference order (a)) and
  * designed so the data-sized side is shuffled at most once:
  *
  *  - as-of join: NO join operator at all — both sides union into one
  *    stream, one exchange on the key, one sort, one running
  *    `last(..., ignoreNulls)`;
  *  - sessionize: one exchange on the key; the downstream per-session
  *    aggregation reuses that partitioning (hash on a subset of the
  *    grouping keys satisfies the aggregation's required distribution),
  *    so no second data shuffle;
  *  - range join: equi-join on a time bin (hash join, AQE-skew-safe);
  *    only the interval side fans out, by its span/bin ratio. The naive
  *    plan Spark would pick for a pure inequality join is a broadcast
  *    nested loop — O(points × intervals) compares; binning makes the
  *    compare count O(matches + points + interval spans).
  */
object TemporalOps {

  /** Row-level gap sessionization: assigns each row a per-key session
    * sequence number (1-based) where a new session starts when the gap
    * from the previous row (by `tsCol`, ties broken by `tieCols`)
    * exceeds `gapSeconds`. One exchange on `keys`; both window passes
    * (lag + running sum) share its sort order.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCols: Seq[String], gapSeconds: Long,
      sessionCol: String = "session_seq"): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val boundary = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Backward (`<=`) as-of join: for every left row, the payload of the
    * latest right row with the same key and `rightTs <= leftTs` —
    * matched columns are `payload` plus the matched `asof_ts`, all NULL
    * when no right row precedes.
    *
    * Implementation is the union-merge plan, not a join: right rows are
    * first deduped per (key, ts) to the greatest-`rightTie` row (as-of
    * must be deterministic under timestamp ties), then both sides merge
    * into one stream ordered by (ts, side) — right before left at equal
    * ts, which is exactly `<=` — and a running
    * `last(payload, ignoreNulls)` carries the newest right payload
    * forward onto each left row. Cost: one exchange of
    * |left| + |right per-ts survivors| rows on the key, one sort — vs a
    * range join's candidate blowup or a per-key collect. Skew bound:
    * a single hot key sorts within one task, same bound as any
    * window/aggregation over that key.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      rightTie: String): DataFrame =
    asofJoinBackwardImpl(left, right, keys, leftTs, rightTs, payload, rightTie)

  /** [[asofJoinBackward]] with a staleness bound (pandas
    * `merge_asof(tolerance=...)`): a match older than
    * `toleranceSeconds` before the left row is treated as NO match —
    * `asof_ts` and the payload come back NULL. The lookup a serving
    * join actually wants: "the user's latest state, unless it's gone
    * stale". Same union-merge plan as the unbounded form (the bound is
    * a post-fold projection, not a join-shape change), so the same
    * one-exchange cost and skew bound.
    */
  def asofJoinBackwardWithin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String], rightTie: String,
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0,
      s"toleranceSeconds must be >= 0: $toleranceSeconds")
    val matched = asofJoinBackwardImpl(left, right, keys, leftTs, rightTs,
      payload, rightTie)
    val inBound = col("asof_ts").isNotNull &&
      unix_micros(col(leftTs)) - unix_micros(col("asof_ts")) <=
        toleranceSeconds * 1000000L
    ("asof_ts" +: payload).foldLeft(matched) { (df, f) =>
      df.withColumn(f, when(inBound, col(s"`$f`")))
    }
  }

  private def asofJoinBackwardImpl(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String], rightTie: String): DataFrame = {
    val keyCols = keys.map(col)
    // per-(key, ts) survivor: greatest tie wins (partial-aggregable)
    val payStruct = struct(col(rightTs).as("asof_ts") +: payload.map(col): _*)
    val rightDeduped = right.groupBy(keyCols :+ col(rightTs): _*)
      .agg(max_by(payStruct, col(rightTie)).as("_asof_pay"))
    val leftTagged = left.select(
      keyCols ++ Seq(col(leftTs).as("_ats"), lit(1).as("_side"),
        struct(col("*")).as("_lrow"),
        lit(null).cast(rightDeduped.schema("_asof_pay").dataType).as("_asof_pay")): _*)
    val rightTagged = rightDeduped.select(
      keyCols ++ Seq(col(rightTs).as("_ats"), lit(0).as("_side"),
        lit(null).cast(leftTagged.schema("_lrow").dataType).as("_lrow"),
        col("_asof_pay")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged)
      .withColumn("_asof", last(col("_asof_pay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_lrow.*") +: col("_asof.asof_ts").as("asof_ts") +:
        payload.map(f => col(s"_asof.`$f`").as(f)): _*)
  }

  /** Point-in-interval range join: all (point, interval) pairs with
    * `startCol <= pTs < endCol`. Both sides key on a `binSeconds`-wide
    * time bin — a point belongs to exactly one bin, an interval is
    * replicated to every bin it overlaps — so the join is a plain hash
    * equi-join on the bin plus a residual range filter, and no pair is
    * ever emitted twice. Choose `binSeconds` near the typical interval
    * length: replication is ceil(span/bin) + 1 per interval, while the
    * per-bin candidate count (the residual-filter work) shrinks as bins
    * narrow.
    */
  /** Build a type-2 slowly-changing dimension from a keyed change log:
    * one output row per (key, attribute version) with
    * `effective_from` / `effective_to` (`effective_to` NULL on the
    * current version), `is_current`, and a 1-based `version` number.
    * Consecutive deliveries of IDENTICAL attributes collapse — a no-op
    * update never opens a new version, so redelivered snapshots (the
    * at-least-once case the reference's upsert path absorbs via merge —
    * kcbq-connector/src/main/java/com/wepay/kafka/connect/bigquery/MergeQueries.java:95)
    * leave the dimension unchanged.
    *
    * Rows are ordered per key by (`tsCol`, `tieCols`...); `attrCols`
    * are the tracked attributes. ONE hash exchange on the key: the
    * change-collapse lag, the closing lead, and the version number are
    * three window functions over the same sort, and the post-filter
    * windows reuse the first window's partitioning and ordering, so at
    * 100 TB the change log shuffles exactly once regardless of history
    * depth.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val attrStruct = struct(attrCols.map(col): _*)
    val opened = changes
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      // null-safe: a NULL attribute field must not look like a change,
      // and the first row (__prev NULL) must open version 1
      .where(!(col("__prev") <=> attrStruct))
      .drop("__prev")
    opened
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumnRenamed(tsCol, "effective_from")
      .withColumn("is_current", col("effective_to").isNull)
  }

  def pointInInterval(points: DataFrame, pTs: String, intervals: DataFrame,
      startCol: String, endCol: String, binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binUs)
    val p = points.withColumn("_bin", binOf(col(pTs)))
    // end is exclusive: the last covered bin is the one holding end-1µs;
    // empty/negative intervals are dropped (sequence would run backward)
    val iv = intervals
      .where(col(startCol) < col(endCol))
      .withColumn("_bin", explode(sequence(binOf(col(startCol)),
        binOf(timestamp_micros(unix_micros(col(endCol)) - 1)))))
    p.join(iv, Seq("_bin"))
      .where(col(pTs) >= col(startCol) && col(pTs) < col(endCol))
      .drop("_bin")
  }

  /** Interval-overlap join: all (left, right) interval pairs with
    * `lStart < rEnd && rStart < lEnd` (half-open intervals, so touching
    * endpoints do NOT overlap). Same binning idea as `pointInInterval`,
    * applied to BOTH sides: each interval replicates to every
    * `binSeconds`-wide bin it covers and the join is a hash equi-join
    * on the bin plus the residual overlap filter — never a
    * BroadcastNestedLoopJoin. An overlapping pair shares every bin in
    * the overlap, so to emit it exactly once only the FIRST shared bin
    * survives: the bin of the later of the two starts (covered by both
    * sides whenever they overlap, because each side spans from its own
    * start past the later start). Replication cost is span/bin per
    * interval; pick `binSeconds` near the typical interval length.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binUs)
    def binned(df: DataFrame, s: String, e: String) = df
      .where(col(s) < col(e))
      .withColumn("_bin", explode(sequence(binOf(col(s)),
        binOf(timestamp_micros(unix_micros(col(e)) - 1)))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("_bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("_bin") === greatest(binOf(col(lStart)), binOf(col(rStart))))
      .drop("_bin")
  }

  /** Nearest-event join: for every left row, the payload of the right
    * row with the same key whose timestamp is CLOSEST to the left
    * timestamp, in either direction — backward wins exact-distance ties
    * (and a right row at the identical timestamp counts as backward).
    * All NULL when the key has no right rows.
    *
    * Extends the as-of union-merge plan instead of running two range
    * joins: right rows dedup per (key, ts) to the greatest-`rightTie`
    * row, both sides merge into one key-partitioned stream sorted by
    * (ts, side), and TWO frames over that one sort carry the
    * candidates — a running `last(…, ignoreNulls)` for the newest
    * preceding right row and a `first(…, ignoreNulls)` over the
    * following frame for the earliest strictly-later one; a scalar
    * comparison picks the nearer. Both frames share the same partition
    * and order, so Spark evaluates them in ONE Window operator over ONE
    * exchange — the cost is identical to the backward-only as-of.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      rightTie: String): DataFrame = {
    val keyCols = keys.map(col)
    val payStruct = struct(col(rightTs).as("near_ts") +: payload.map(col): _*)
    val rightDeduped = right.groupBy(keyCols :+ col(rightTs): _*)
      .agg(max_by(payStruct, col(rightTie)).as("_pay"))
    val leftTagged = left.select(
      keyCols ++ Seq(col(leftTs).as("_ats"), lit(1).as("_side"),
        struct(col("*")).as("_lrow"),
        lit(null).cast(rightDeduped.schema("_pay").dataType).as("_pay")): _*)
    val rightTagged = rightDeduped.select(
      keyCols ++ Seq(col(rightTs).as("_ats"), lit(0).as("_side"),
        lit(null).cast(leftTagged.schema("_lrow").dataType).as("_lrow"),
        col("_pay")): _*)
    // right sorts before left at equal ts, so the preceding frame is
    // `<=` (as-of semantics) and the following frame is strictly `>`
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ats").asc, col("_side").asc)
    val prev = last(col("_pay"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val next = first(col("_pay"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val merged = leftTagged.unionByName(rightTagged)
      .withColumn("_prev", prev).withColumn("_next", next)
      .where(col("_side") === 1)
    val takePrev = col("_next").isNull || (col("_prev").isNotNull &&
      unix_micros(col("_ats")) - unix_micros(col("_prev.near_ts")) <=
        unix_micros(col("_next.near_ts")) - unix_micros(col("_ats")))
    val chosen = when(takePrev, col("_prev")).otherwise(col("_next"))
    merged.withColumn("_near", chosen)
      .select(col("_lrow.*") +: col("_near.near_ts").as("near_ts") +:
        payload.map(f => col(s"_near.`$f`").as(f)): _*)
  }

  /** Cooldown throttle (debounce): keeps a row iff at least
    * `cooldownSeconds` elapsed since the previous KEPT row of the same
    * key (the first row of a key is always kept; a gap exactly equal to
    * the cooldown keeps). This is NOT gap sessionization — the
    * suppression clock resets only on kept rows, so the scan is
    * inherently sequential per key and no window/lag rewrite exists.
    * Batch form: one exchange on the key, then a per-key ordered fold
    * over (ts, tie) SCALARS via the `aggregate` higher-order function —
    * payload columns never enter the collected array, and the per-key
    * array is bounded by that key's row count, the same bound any
    * per-key window sort already carries. The unbounded-stream analog
    * keeps one (lastKept) value per key in a state store
    * (transformWithState — see graft.streaming.StreamOps).
    * Output: `keys` + kept rows' (`tsCol`, `tieCol`).
    */
  /** Two-sided CUSUM changepoint detection per key (Page 1954): over
    * each key's series ordered by (`tsCol`, `tieCol`),
    * `s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (xᵢ − μ − k))` and
    * `s⁻ᵢ = max(0, s⁻ᵢ₋₁ + (μ − xᵢ − k))` accumulate evidence of an
    * upward / downward mean shift against the key's own mean μ, with
    * slack `k` absorbing in-control noise; an index alarms when either
    * statistic exceeds `threshold`. The standard sequential drift
    * detector for data pipelines (a corpus/source whose quality or
    * volume signal drifts mid-stream alarms here long before a global
    * mean moves). Returns per key: `n_obs`, `max_pos`, `max_neg`,
    * `n_alarms`, `first_alarm` (1-based index, null if never).
    *
    * The recursion is a non-linear fold (the max-with-0 reflection), so
    * it cannot be a window sum: each key's series is gathered, sorted,
    * and folded in order — per-key series must fit an executor (the
    * same per-entity contract as [[throttle]] and sessionize; keys are
    * entities, not the corpus). The groupBy shuffles `(key, ts, tie,
    * x)` scalars once; the fold is map-side arithmetic.
    *
    * Determinism note: μ = Σx/n is float-sum-order-sensitive in
    * general; feed integer-valued doubles (e.g. cents) and every
    * partial sum is exact, making μ — and the whole fold — bit-equal
    * across engines and partitionings.
    *
    * The unbounded-stream analog carries the fold accumulator per key
    * in a state store with μ as config (a stream cannot see its own
    * future mean): [[graft.streaming.StreamOps.cusumStream]], spec-
    * pinned to agree with this operator bit-for-bit given the same μ.
    */
  def cusumChangepoints(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String,
      slack: Double, threshold: Double): DataFrame = {
    import org.apache.spark.sql.types._
    require(slack >= 0, s"slack must be >= 0: $slack")
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val item = struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
      col(valueCol).cast("double").as("x"))
    val grouped = df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(item)).as("_evs"),
        (sum(col(valueCol).cast("double")) / count(lit(1))).as("_mu"),
        count(lit(1)).as("n_obs"))
    val acc0 = struct(lit(0.0).as("sp"), lit(0.0).as("sn"),
      lit(0.0).as("mp"), lit(0.0).as("mn"),
      lit(0L).as("al"), lit(null).cast(LongType).as("fa"), lit(0L).as("i"))
    val folded = aggregate(
      col("_evs"), acc0,
      (a, e) => {
        val i = a.getField("i") + 1
        val sp = greatest(lit(0.0),
          a.getField("sp") + (e.getField("x") - col("_mu") - slack))
        val sn = greatest(lit(0.0),
          a.getField("sn") + (col("_mu") - e.getField("x") - slack))
        val alarm = sp > threshold || sn > threshold
        struct(sp.as("sp"), sn.as("sn"),
          greatest(a.getField("mp"), sp).as("mp"),
          greatest(a.getField("mn"), sn).as("mn"),
          (a.getField("al") + when(alarm, 1L).otherwise(0L)).as("al"),
          coalesce(a.getField("fa"), when(alarm, i)).as("fa"),
          i.as("i"))
      })
    grouped.withColumn("_f", folded)
      .select(col(keyCol), col("n_obs"),
        col("_f.mp").as("max_pos"), col("_f.mn").as("max_neg"),
        col("_f.al").as("n_alarms"), col("_f.fa").as("first_alarm"))
  }

  def throttle(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, cooldownSeconds: Long): DataFrame = {
    import org.apache.spark.sql.types._
    val cdUs = cooldownSeconds * 1000000L
    val keyCols = keys.map(col)
    val itemType = ArrayType(StructType(Seq(
      StructField("us", LongType, nullable = false),
      StructField("tie", df.schema(tieCol).dataType))), containsNull = false)
    val item = struct(unix_micros(col(tsCol)).as("us"), col(tieCol).as("tie"))
    val grouped = df.groupBy(keyCols: _*)
      .agg(array_sort(collect_list(item)).as("_evs"))
    val kept = aggregate(
      col("_evs"),
      struct(lit(Long.MinValue).as("last"),
        array().cast(itemType).as("kept")),
      (acc, x) => when(
        acc.getField("last") === lit(Long.MinValue) ||
          x.getField("us") - acc.getField("last") >= cdUs,
        struct(x.getField("us").as("last"),
          concat(acc.getField("kept"), array(x)).as("kept")))
        .otherwise(acc),
      acc => acc.getField("kept"))
    grouped.select(keyCols :+ explode(kept).as("_k"): _*)
      .select(keyCols :+ timestamp_micros(col("_k.us")).as(tsCol) :+
        col("_k.tie").as(tieCol): _*)
  }

  /** Per-key interval UNION via the classic sweep line: each interval
    * contributes a (+1 at start, −1 at end) point; sorting the points
    * and running-summing the deltas gives the active-coverage count,
    * and the union length is the sum of inter-point gaps where coverage
    * is positive. Returns per key `(n_intervals, n_merged, covered_us)`
    * — `n_merged` counts the 0→1 coverage rises, i.e. the merged
    * intervals. Starts sort before ends at the same instant (delta
    * DESC), so touching intervals merge; the `(t, delta, tie)` order is
    * total, making every running sum engine-exact on integer
    * microseconds.
    *
    * Scale: one exchange of `(key, t, ±1, tie)` scalars, one per-key
    * window pass, one partial-aggregated rollup — never an
    * interval-overlap self-join (which is O(n²) per key under skew).
    */
  def intervalUnion(df: DataFrame, keys: Seq[String], startUsCol: String,
      endUsCol: String, tieCol: String): DataFrame = {
    val kc = keys.map(col)
    def side(t: String, d: Int) = df.select(
      kc :+ col(t).cast("long").as("__t") :+ lit(d).as("__d") :+
        col(tieCol).as("__tie"): _*)
    val pts = side(startUsCol, 1).unionByName(side(endUsCol, -1))
    val w = Window.partitionBy(kc: _*)
      .orderBy(col("__t"), col("__d").desc, col("__tie"))
    pts
      .withColumn("__active", sum(col("__d")).over(w))
      .withColumn("__nextt", lead(col("__t"), 1).over(w))
      .groupBy(kc: _*)
      .agg(
        sum(when(col("__d") === 1, 1L).otherwise(0L)).as("n_intervals"),
        sum(when(col("__active") === 1 && col("__d") === 1, 1L).otherwise(0L))
          .as("n_merged"),
        sum(when(col("__active") > 0 && col("__nextt").isNotNull,
          col("__nextt") - col("__t")).otherwise(0L)).as("covered_us"))
  }

  /** Frequent contiguous event sequences (the n-gram slice of
    * PrefixSpan-style sequence mining): every length-`length` run of
    * consecutive `itemCol` values per key, ranked by SUPPORT (distinct
    * keys exhibiting the sequence — the market-basket definition, so a
    * single looping user cannot dominate) with total occurrences as the
    * tiebreak. Returns the top-`topK` as
    * `(seq, support, occurrences, rank)`.
    *
    * == 100 TB design ==
    *
    * The per-key window leads over `(key, ts, tie, item)` scalars —
    * one exchange on the key, no self-joins (a length-n window of
    * `lead`s replaces the n-way positional self-join a naive SQL
    * formulation would run). The sequence aggregate partial-aggregates
    * map-side, and the top-K is a TakeOrdered (per-partition heads,
    * never a global sort of all sequences).
    */
  def frequentSequences(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, itemCol: String, length: Int = 3,
      topK: Int = 20): DataFrame = {
    require(length >= 2, s"sequence length must be >= 2: $length")
    require(topK > 0, s"topK must be positive: $topK")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val items = col(itemCol) +: (1 until length).map(i =>
      lead(col(itemCol), i).over(w))
    val seqs = df
      .select(col(keyCol).as("__k"),
        concat_ws(">", items: _*).as("seq"),
        items.last.isNotNull.as("__complete"))
      .where(col("__complete"))
    val counts = seqs.groupBy(col("seq"))
      .agg(countDistinct(col("__k")).as("support"),
        count(lit(1)).as("occurrences"))
      .orderBy(col("support").desc, col("occurrences").desc, col("seq"))
      .limit(topK)
    counts.withColumn("rank", row_number().over(
      Window.orderBy(col("support").desc, col("occurrences").desc, col("seq"))))
  }

  /** Holt's linear-trend exponential smoothing per key (double
    * exponential smoothing): ordered observations fold through
    * `l_t = α·y_t + (1-α)·(l_{t-1}+b_{t-1})`,
    * `b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}`, initialized
    * `l_1 = y_1, b_1 = y_2 - y_1`. Returns one row per key:
    * `(keyCol, n_obs, level, trend, forecast)` with
    * `forecast = level + horizon·trend` (all rounded to 6), keys with
    * fewer than two observations dropped (no trend is derivable).
    *
    * Determinism: the recursion fixes the floating-point evaluation
    * ORDER, so any engine replaying the same recurrence on the same
    * doubles produces bit-identical results — the oracle replays it
    * with a recursive CTE. Within the fold, `l_t` is written ONCE as
    * an expression and re-derived for the trend update from the same
    * lambda-variable inputs, so both occurrences round identically.
    *
    * == 100 TB design ==
    *
    * The series collapse to per-key arrays via `collect_list` — valid
    * because a smoothing series is bounded by the OBSERVATION HORIZON
    * (days × keys), not the fact count: the daily rollup that feeds
    * this is the partial-aggregated heavy stage, and what shuffles
    * here is one (key, n_obs) array row per key. The fold itself is a
    * single `aggregate` HOF per row — sequential by definition (each
    * step consumes the previous level), so no distribution is lost.
    */
  def holtForecast(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double = 0.5, beta: Double = 0.5,
      horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"smoothing factors must be in (0,1): $alpha/$beta")
    val series = df
      .select(col(keyCol).as("__k"),
        struct(col(tsCol).as("t"), col(valueCol).cast("double").as("y")).as("__o"))
      .groupBy(col("__k"))
      .agg(array_sort(collect_list(col("__o"))).as("__ys"))
      .where(size(col("__ys")) >= 2)
    val y1 = col("__ys").getItem(0).getField("y")
    val y2 = col("__ys").getItem(1).getField("y")
    val folded = aggregate(
      slice(col("__ys"), lit(2), size(col("__ys")) - 1),
      struct(y1.as("l"), (y2 - y1).as("b")),
      (acc, o) => {
        val lNew = lit(alpha) * o.getField("y") +
          lit(1 - alpha) * (acc.getField("l") + acc.getField("b"))
        struct(lNew.as("l"),
          (lit(beta) * (lNew - acc.getField("l")) +
            lit(1 - beta) * acc.getField("b")).as("b"))
      })
    series
      .select(col("__k").as(keyCol), size(col("__ys")).as("n_obs"),
        folded.as("__f"))
      .select(col(keyCol), col("n_obs"),
        round(col("__f.l"), 6).as("level"),
        round(col("__f.b"), 6).as("trend"),
        round(col("__f.l") + lit(horizon.toDouble) * col("__f.b"), 6)
          .as("forecast"))
  }
}
