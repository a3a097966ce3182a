package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Streaming-native operators beyond the reference's surface, using the
  * engine features a large-scale ingest pipeline needs: watermarked
  * windowed aggregation and keyed state.
  *
  * Both consume the canonical Kafka-shaped stream
  * (`topic, partition, offset, timestamp, …, value`) and run identically
  * over batch frames (windowed aggregation is mode-agnostic), so specs
  * can assert values in batch and wire the same plan into a stream.
  */
object StreamOps {

  /** Tumbling-window per-topic ingest metrics — the streaming analog of
    * the reference's task metrics (row counters in
    * `BigQuerySinkTask`/Kafka Connect metrics): rows, distinct source
    * partitions, and the high-watermark offset per (window, topic).
    *
    * The watermark bounds state: windows older than `watermarkDelay`
    * close and their state is dropped, so state size is
    * O(topics × open windows), independent of stream length — the
    * property that lets this run forever on an unbounded stream.
    */
  def windowedIngestCounts(
      stream: DataFrame,
      windowDur: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    stream
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowDur), col("topic"))
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("partition")).as("n_partitions"),
        max(col("offset")).as("max_offset"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("topic"), col("n_rows"), col("n_partitions"), col("max_offset"))

  /** Streaming exact dedup with BOUNDED state: suppress re-deliveries
    * and re-crawls of identical content across micro-batches, keeping
    * state only within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). The dedup key is the md5 of the
    * content column — 16 bytes of state per distinct document instead
    * of the document body, the same shuffle/state discipline as
    * `DedupOps.exactDedup`.
    *
    * This is the intra-stream half of streaming corpus dedup: duplicates
    * *within* the horizon die here with O(horizon) state; duplicates
    * against the standing corpus die in the sink's `foreachBatch` via
    * `DedupOps.incrementalExactDedup` (bloom against table history). A
    * plain `dropDuplicates` would hold every hash forever — state growth
    * unbounded in stream length, the thing a 100 TB ingest cannot do.
    *
    * Works identically on batch frames (where it degrades to plain
    * within-frame dedup semantics over the hash).
    */
  def dedupContent(stream: DataFrame, textCol: String,
      tsCol: String = "timestamp",
      horizon: String = "10 minutes"): DataFrame = {
    val hashed = stream
      .withColumn("__h", md5(to_binary(col(textCol), lit("utf-8"))))
    val deduped =
      if (stream.isStreaming)
        hashed.withWatermark(tsCol, horizon).dropDuplicatesWithinWatermark("__h")
      else hashed.dropDuplicates("__h")
    deduped.drop("__h")
  }

  /** Watermarked stream-stream interval join: enrich each left event
    * with the right-stream rows of the same key whose timestamp falls in
    * `[left.ts - lookbackSeconds, left.ts]` — the streaming form of the
    * as-of/range lookup (clicks joined to the impressions that preceded
    * them, events to the config push in force, …). Inner join; both
    * sides carry the given key column and a `timestamp`.
    *
    * == why the time bound is load-bearing ==
    *
    * A stream-stream join must buffer BOTH sides in state. The watermark
    * plus the explicit interval condition is what lets the engine evict:
    * a right row older than `watermark + lookback` can never match a
    * future left row, so state is O(key-rate × (delay + lookback)) —
    * bounded in stream length. Without the time-range predicate Spark
    * (rightly) refuses the join in append mode, because state would grow
    * forever — the same discipline as [[dedupContent]]'s horizon.
    *
    * Runs identically on batch frames (where it is just the interval
    * equi-join, same results as `TemporalOps.pointInInterval`-style
    * bounds).
    *
    * `joinType` may be `inner` or `left_outer`: outer rows (left events
    * with no right match in the window) are held back until the
    * watermark proves no match can still arrive, then emitted with NULL
    * right columns — the streaming form of "click with no preceding
    * impression".
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lookbackSeconds: Long, watermarkDelay: String = "2 minutes",
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val l = left.withWatermark("timestamp", watermarkDelay).alias("l")
    val r = right.withWatermark("timestamp", watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.timestamp") >= col("l.timestamp") - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col("r.timestamp") <= col("l.timestamp"),
      joinType)
  }

  /** A keyed change record for [[dedupConsecutive]]. */
  final case class KeyedValue(key: String, offset: Long, value: String)

  /** Per-key consecutive-duplicate suppression across micro-batches via
    * `flatMapGroupsWithState`: a row is emitted only when its value
    * differs from the key's previously-emitted value (CDC-style change
    * capture for training-data streams — re-delivered identical states
    * produce no output). State per key is one value string; pass
    * `idleTimeout` to evict idle keys with a processing-time timeout so
    * state stays bounded by the recently-active key set (note: a timeout
    * makes the engine self-trigger batches to fire expirations — leave
    * it off for drain-and-stop batch tests).
    *
    * Rows within a batch are processed in ascending offset order (the
    * per-key delivery order guarantee of a Kafka partition).
    */
  def dedupConsecutive(
      ds: Dataset[KeyedValue],
      idleTimeout: Option[String] = None): Dataset[KeyedValue] = {
    implicit val kvEnc: Encoder[KeyedValue] = Encoders.product[KeyedValue]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[KeyedValue], state: GroupState[String]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[KeyedValue]
            var last = state.getOption
            rows.toSeq.sortBy(_.offset).foreach { r =>
              if (!last.contains(r.value)) {
                out += r
                last = Some(r.value)
              }
            }
            last.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Input row for [[runningProfile]]. */
  final case class KeyedMetric(key: String, value: Double)

  /** Per-key cumulative statistics emitted by [[runningProfile]]. */
  final case class RunningProfile(
      key: String, n: Long, total: Double, vmin: Double, vmax: Double)

  /** The [[runningProfile]] state machine on the Spark 4
    * `transformWithState` arbitrary-state API (the successor to
    * `flatMapGroupsWithState`): typed `ValueState` in the RocksDB state
    * store, with state TTL handled by the ENGINE — no hand-rolled
    * timeout dance like [[dedupConsecutive]] needs on the old API.
    * State per key is one fixed-size record, so store size is bounded
    * by the (TTL-pruned) live key set, not stream length.
    */
  private final class RunningProfileProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, KeyedMetric, RunningProfile] {
    @transient private var profile: ValueState[RunningProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      profile = getHandle.getValueState[RunningProfile](
        "profile", Encoders.product[RunningProfile], cfg)
    }

    override def handleInputRows(key: String, rows: Iterator[KeyedMetric],
        timerValues: TimerValues): Iterator[RunningProfile] = {
      var p =
        if (profile.exists()) profile.get()
        else RunningProfile(key, 0L, 0.0,
          Double.PositiveInfinity, Double.NegativeInfinity)
      rows.foreach { r =>
        p = RunningProfile(key, p.n + 1, p.total + r.value,
          math.min(p.vmin, r.value), math.max(p.vmax, r.value))
      }
      profile.update(p)
      Iterator.single(p)
    }
  }

  /** Input row for [[sessionSummaries]]: key + value + event-time
    * millis (derive from the watermarked timestamp column).
    */
  final case class SessionEvent(key: String, value: Double, eventMs: Long)

  /** A closed session emitted by [[sessionSummaries]]. */
  final case class SessionSummary(
      key: String, n: Long, total: Double, firstMs: Long, lastMs: Long)

  /** The [[sessionSummaries]] state machine: accumulate per-key session
    * state and register an EVENT-TIME timer at `last event + gap`; when
    * the watermark passes it, `handleExpiredTimer` emits the summary
    * and clears state — the close-and-emit sessionization pattern
    * (finalize exactly once, only when the stream can no longer extend
    * the session). A new event before expiry supersedes the timer:
    * the old one is deleted and re-registered at the new deadline, so
    * state per key is one record plus one timer regardless of session
    * length.
    */
  private final class SessionFinalizeProcessor(gapMs: Long)
      extends StatefulProcessor[String, SessionEvent, SessionSummary] {
    @transient private var session: ValueState[SessionSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionSummary](
        "session", Encoders.product[SessionSummary], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      var s =
        if (session.exists()) session.get()
        else SessionSummary(key, 0L, 0.0, Long.MaxValue, Long.MinValue)
      rows.foreach { r =>
        s = SessionSummary(key, s.n + 1, s.total + r.value,
          math.min(s.firstMs, r.eventMs), math.max(s.lastMs, r.eventMs))
      }
      session.update(s)
      // supersede any earlier deadline: one live timer per key
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(s.lastMs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = if (session.exists()) Iterator.single(session.get())
      else Iterator.empty
      session.clear()
      out
    }
  }

  /** Gap-based sessionization that EMITS ON CLOSE via event-time timers
    * (the `transformWithState` timer API): nothing is produced while a
    * session is live; once the watermark passes `last event + gap`, the
    * per-key summary (count, sum, first/last event time) is emitted
    * exactly once and the state is dropped. Complements the
    * `session_window` aggregation (a6) with arbitrary per-session state
    * and an explicit finalize hook. Requires the RocksDB state store
    * provider and Append output mode; the watermark (event-time clock
    * for the timers) is applied here on `tsCol`.
    */
  def sessionSummaries(stream: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionSummary] = {
    implicit val inEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]
    stream.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("double").as("value"),
        unix_millis(col(tsCol)).as("eventMs"))
      .as[SessionEvent]
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new SessionFinalizeProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Input/output row for [[throttleStream]]: key + event-time micros +
    * the deterministic tiebreaker.
    */
  final case class ThrottleEvent(key: String, eventUs: Long, tie: Long)

  /** The [[throttleStream]] state machine: one `lastKept` timestamp per
    * key. Rows within a batch sort by `(eventUs, tie)` before the fold —
    * the same scan order as the batch operator — and the suppression
    * clock carries across micro-batches in the state store, so a
    * cooldown window spanning a batch boundary still suppresses.
    */
  private final class ThrottleProcessor(cooldownUs: Long)
      extends StatefulProcessor[String, ThrottleEvent, ThrottleEvent] {
    @transient private var lastKept: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastKept = getHandle.getValueState[Long](
        "lastKept", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ThrottleEvent],
        timerValues: TimerValues): Iterator[ThrottleEvent] = {
      var last = if (lastKept.exists()) lastKept.get() else Long.MinValue
      val out = Seq.newBuilder[ThrottleEvent]
      rows.toSeq.sortBy(r => (r.eventUs, r.tie)).foreach { r =>
        if (last == Long.MinValue || r.eventUs - last >= cooldownUs) {
          out += r
          last = r.eventUs
        }
      }
      lastKept.update(last)
      out.result().iterator
    }
  }

  /** Streaming cooldown throttle — the micro-batch form of
    * `TemporalOps.throttle` (w10): keep a row iff at least
    * `cooldownSeconds` passed since the previous KEPT row of its key,
    * with the suppression clock carried across batches in per-key
    * state (one long per key — store size is the live key set).
    * Matches the batch operator exactly when each key's rows arrive in
    * event-time order across batches (within a batch any order is
    * fine — rows sort before the fold); a late row that lands behind
    * an already-kept timestamp is evaluated against it, never
    * retroactively un-kept. Requires the RocksDB state store provider
    * and Append output mode.
    */
  def throttleStream(stream: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, cooldownSeconds: Long): Dataset[ThrottleEvent] = {
    implicit val enc: Encoder[ThrottleEvent] = Encoders.product[ThrottleEvent]
    stream.select(col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("eventUs"),
        col(tieCol).cast("long").as("tie"))
      .as[ThrottleEvent]
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new ThrottleProcessor(cooldownSeconds * 1000000L),
        TimeMode.None(), OutputMode.Append())
  }

  /** Input row for [[cusumStream]]: key + event-time micros + tiebreak
    * + observed value.
    */
  final case class CusumEvent(key: String, eventUs: Long, tie: Long, x: Double)

  /** Running CUSUM summary emitted per touched key per batch by
    * [[cusumStream]] — same fields as the batch operator's output row.
    */
  final case class CusumSummary(key: String, nObs: Long, maxPos: Double,
      maxNeg: Double, nAlarms: Long, firstAlarm: Option[Long])

  private final case class CusumAcc(sp: Double, sn: Double, mp: Double,
      mn: Double, al: Long, fa: Long, i: Long) // fa == 0 ⇒ no alarm yet

  /** The [[cusumStream]] state machine: the whole fold accumulator
    * (s⁺, s⁻, their maxima, alarm count, first-alarm index, row index)
    * is ONE ValueState row per key. Within a batch rows sort by
    * `(eventUs, tie)` — the same scan order as the batch operator — and
    * the accumulator carries across micro-batches, so a drift building
    * up over many batches alarms exactly when the batch fold would.
    * The arithmetic reproduces `TemporalOps.cusumChangepoints`'s op
    * order exactly (`(x − μ) − slack`, then the max-with-0 reflection),
    * so on integer-valued doubles the two are bit-equal.
    */
  private final class CusumProcessor(means: Map[String, Double],
      defaultMean: Double, slack: Double, threshold: Double)
      extends StatefulProcessor[String, CusumEvent, CusumSummary] {
    @transient private var acc: ValueState[CusumAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[CusumAcc](
        "cusum", Encoders.product[CusumAcc], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
        timerValues: TimerValues): Iterator[CusumSummary] = {
      val mu = means.getOrElse(key, defaultMean)
      var a =
        if (acc.exists()) acc.get()
        else CusumAcc(0.0, 0.0, 0.0, 0.0, 0L, 0L, 0L)
      rows.toSeq.sortBy(r => (r.eventUs, r.tie)).foreach { r =>
        val i = a.i + 1
        val sp = math.max(0.0, a.sp + (r.x - mu - slack))
        val sn = math.max(0.0, a.sn + (mu - r.x - slack))
        val alarm = sp > threshold || sn > threshold
        a = CusumAcc(sp, sn, math.max(a.mp, sp), math.max(a.mn, sn),
          a.al + (if (alarm) 1L else 0L),
          if (a.fa != 0L) a.fa else if (alarm) i else 0L, i)
      }
      acc.update(a)
      Iterator.single(CusumSummary(key, a.i, a.mp, a.mn, a.al,
        if (a.fa == 0L) None else Some(a.fa)))
    }
  }

  /** Streaming two-sided CUSUM drift detection — the unbounded-stream
    * analog of `TemporalOps.cusumChangepoints` (a29). The batch
    * operator derives μ from each key's own full series; a stream
    * cannot see its future, so the in-control mean is CONFIG here —
    * `targetMeans` maps each monitored key to its control target
    * (monitored entities are a bounded config set, driver-side map by
    * contract), `defaultMean` covers unmapped keys. Feeding the batch
    * operator's own μ reproduces its result exactly (spec-pinned).
    * Emits the refreshed per-key summary for every key a batch touches
    * (Update mode — downstream sinks upsert on `key`). State is one
    * fixed-width accumulator per key, independent of stream length.
    * Requires the RocksDB state store provider.
    */
  def cusumStream(stream: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, slack: Double, threshold: Double,
      targetMeans: Map[String, Double], defaultMean: Double = 0.0)
      : Dataset[CusumSummary] = {
    require(slack >= 0, s"slack must be >= 0: $slack")
    require(threshold > 0, s"threshold must be > 0: $threshold")
    implicit val enc: Encoder[CusumEvent] = Encoders.product[CusumEvent]
    implicit val outEnc: Encoder[CusumSummary] = Encoders.product[CusumSummary]
    stream.select(col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("eventUs"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[CusumEvent]
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(
        new CusumProcessor(targetMeans, defaultMean, slack, threshold),
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-key running count/sum/min/max across micro-batches — the
    * incremental per-entity profile an ingest pipeline keeps (rows seen
    * per user, running spend, outlier bounds) without re-aggregating
    * history. Emits the updated profile for each key touched by a batch
    * (Update mode). Requires the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`); pass `ttl` to let the
    * engine expire profiles of idle keys.
    */
  def runningProfile(ds: Dataset[KeyedMetric],
      ttl: Option[java.time.Duration] = None): Dataset[RunningProfile] = {
    implicit val outEnc: Encoder[RunningProfile] = Encoders.product[RunningProfile]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new RunningProfileProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Input row for [[leaderboard]]: group + member + score delta. */
  final case class ScoreEvent(group: String, member: String, value: Double)

  /** One leaderboard row emitted by [[leaderboard]]. */
  final case class LeaderboardEntry(
      group: String, rank: Int, member: String, total: Double)

  /** The [[leaderboard]] state machine: per-member cumulative totals in
    * `MapState` (point lookups/updates against RocksDB — a batch only
    * reads the members it touches, not the whole map), re-ranking the
    * full member set only when emitting. State per group is one map
    * entry per member ever seen; pair with an upstream filter or TTL'd
    * member pruning when the member domain is unbounded.
    */
  private final class LeaderboardProcessor(k: Int)
      extends StatefulProcessor[String, ScoreEvent, LeaderboardEntry] {
    @transient private var totals: org.apache.spark.sql.streaming.MapState[String, Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getMapState[String, Double](
        "totals", Encoders.STRING, Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ScoreEvent],
        timerValues: TimerValues): Iterator[LeaderboardEntry] = {
      rows.foreach { r =>
        val cur = if (totals.containsKey(r.member)) totals.getValue(r.member) else 0.0
        totals.updateValue(r.member, cur + r.value)
      }
      totals.iterator().toSeq
        .sortBy { case (m, t) => (-t, m) }
        .take(k).zipWithIndex
        .map { case ((m, t), i) => LeaderboardEntry(key, i + 1, m, t) }
        .iterator
    }
  }

  /** Continuous top-k leaderboard per group across micro-batches: each
    * batch folds its score deltas into per-member running totals and
    * emits the group's refreshed top-k (Update mode — downstream sinks
    * upsert on `(group, rank)`). The streaming form of the W1
    * top-per-group pattern, with totals accumulated over the stream's
    * whole history in keyed state rather than recomputed. Requires the
    * RocksDB state store provider.
    */
  def leaderboard(ds: Dataset[ScoreEvent], k: Int): Dataset[LeaderboardEntry] = {
    implicit val outEnc: Encoder[LeaderboardEntry] = Encoders.product[LeaderboardEntry]
    ds.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new LeaderboardProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
