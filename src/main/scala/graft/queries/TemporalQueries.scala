package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

/** Temporal operators over the `events` stream table: gap
  * sessionization, backward as-of join, point-in-interval range join.
  * Oracles: plain window SQL for sessions, DuckDB's native ASOF JOIN
  * for the as-of, and the unconstrained inequality join (DuckDB IEJoin)
  * for the range join — three independent formulations of the same
  * semantics.
  */
object TemporalQueries extends QueryPack {

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery("a5_sessionize",
      // 30-minute-gap sessions per user, aggregated to one row per
      // session; the session assignment is one exchange on user_id and
      // the aggregation reuses that partitioning
      (s, dir) => {
        val sess = TemporalOps.sessionize(Tables.events(s, dir),
          Seq("user_id"), "ts", Seq("event_id"), gapSeconds = 1800)
        sess.groupBy(col("user_id"), col("session_seq").as("session_id"))
          .agg(min("ts").as("session_start"), max("ts").as("session_end"),
            count(lit(1)).as("n_events"),
            round(sum("value"), 6).as("total_value"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts)//1000) AS ts, value
          |  FROM events),
          |marked AS (
          |  SELECT user_id, ts, value, event_id,
          |         CASE WHEN lag(ts) OVER w IS NULL
          |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          |              THEN 1 ELSE 0 END AS boundary
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sess AS (
          |  SELECT user_id, ts, value,
          |         CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          |  FROM marked)
          |SELECT user_id, session_id, min(ts) AS session_start,
          |       max(ts) AS session_end, count(*) AS n_events,
          |       round(sum(value), 6) AS total_value
          |FROM sess GROUP BY 1, 2""".stripMargin),
      headline = true),

    GraftQuery("a26_hopping_window",
      // hopping (sliding) 1-hour windows every 15 minutes via Spark's
      // native window() — each event lands in exactly 4 epoch-aligned
      // windows; the oracle expands the same 4 covering starts with
      // integer microsecond arithmetic. The streaming-capable form:
      // with a watermark this exact plan runs on an unbounded stream
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 6).as("total_value"))
        .select(col("window.start").as("w_start"),
          col("window.end").as("w_end"),
          col("n_events"), col("total_value")),
      oracle = Some(
        """WITH ev AS (
          |  SELECT epoch_ns(ts) // 1000 AS us, value FROM events),
          |cover AS (
          |  SELECT ((us // 900000000) - k.k) * 900000000 AS start_us, value
          |  FROM ev CROSS JOIN generate_series(0, 3) AS k(k))
          |SELECT make_timestamp(start_us) AS w_start,
          |       make_timestamp(start_us + 3600000000) AS w_end,
          |       count(*) AS n_events,
          |       round(sum(value), 6) AS total_value
          |FROM cover GROUP BY start_us""".stripMargin)),

    GraftQuery("a29_cusum",
      // two-sided CUSUM drift detection per user against the user's own
      // mean, slack 10 units, threshold 300 units. Values scale to exact
      // integer cents first, so the per-key mean (and therefore the
      // whole reflected fold) is bit-equal across engines and
      // partitionings; the oracle replays the recursion as a
      // per-(key, index) recursive CTE
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", round(col("value") * 100, 0))
        TemporalOps.cusumChangepoints(ev, "user_id", "ts", "event_id",
          "cents", slack = 1000.0, threshold = 30000.0)
          .select(col("user_id"), col("n_obs"),
            round(col("max_pos") / 100, 6).as("max_pos"),
            round(col("max_neg") / 100, 6).as("max_neg"),
            col("n_alarms"), col("first_alarm"))
      },
      oracle = Some(
        """WITH RECURSIVE ev AS (
          |  SELECT user_id, round(value * 100) AS cents,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY ts, event_id) AS i
          |  FROM events),
          |mu AS (
          |  SELECT user_id, sum(cents) / count(*) AS mu, count(*) AS n_obs
          |  FROM ev GROUP BY user_id),
          |rec AS (
          |  SELECT e.user_id, e.i,
          |         greatest(0, e.cents - m.mu - 1000) AS sp,
          |         greatest(0, m.mu - e.cents - 1000) AS sn
          |  FROM ev e JOIN mu m USING (user_id) WHERE e.i = 1
          |  UNION ALL
          |  SELECT e.user_id, e.i,
          |         greatest(0, r.sp + (e.cents - m.mu - 1000)),
          |         greatest(0, r.sn + (m.mu - e.cents - 1000))
          |  FROM rec r
          |  JOIN ev e ON e.user_id = r.user_id AND e.i = r.i + 1
          |  JOIN mu m ON m.user_id = e.user_id)
          |SELECT r.user_id, m.n_obs,
          |       round(max(sp) / 100, 6) AS max_pos,
          |       round(max(sn) / 100, 6) AS max_neg,
          |       CAST(sum(CASE WHEN sp > 30000 OR sn > 30000 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_alarms,
          |       min(CASE WHEN sp > 30000 OR sn > 30000 THEN i END) AS first_alarm
          |FROM rec r JOIN mu m USING (user_id)
          |GROUP BY r.user_id, m.n_obs""".stripMargin)),

    GraftQuery("a32_rfm_segments",
      // RFM segmentation: per-user recency (days since the corpus's
      // last day), frequency, monetary (exact cents, so the median
      // thresholds interpolate from exact integers — no float-sum
      // boundary ambiguity anywhere); score = how many of the three
      // median cuts the user clears. Thresholds are one broadcast row;
      // everything else is one partial-aggregated pass
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          to_date(col("ts")).as("d"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val mx = ev.agg(max(col("d")).as("maxd"))
        val u = ev.crossJoin(broadcast(mx))
          .groupBy(col("user_id"), col("maxd"))
          .agg(count(lit(1)).as("freq"), sum(col("cents")).as("m_cents"),
            max(col("d")).as("lastd"))
          .select(col("user_id"), datediff(col("maxd"), col("lastd")).as("r_days"),
            col("freq"), col("m_cents"))
        val th = u.agg(
          expr("percentile(r_days, 0.5D)").as("tr"),
          expr("percentile(freq, 0.5D)").as("tf"),
          expr("percentile(m_cents, 0.5D)").as("tm"))
        u.crossJoin(broadcast(th))
          .select(col("user_id"), col("r_days"), col("freq"), col("m_cents"),
            (when(col("freq") >= col("tf"), 1).otherwise(0) +
              when(col("m_cents") >= col("tm"), 1).otherwise(0) +
              when(col("r_days") <= col("tr"), 1).otherwise(0)).as("rfm_score"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT user_id, CAST(make_timestamp(epoch_ns(ts)//1000) AS DATE) AS d,
          |         CAST(round(value * 100) AS BIGINT) AS cents
          |  FROM events),
          |mx AS (SELECT max(d) AS maxd FROM ev),
          |u AS (
          |  SELECT user_id, date_diff('day', max(d), mx.maxd) AS r_days,
          |         count(*) AS freq, CAST(sum(cents) AS BIGINT) AS m_cents
          |  FROM ev CROSS JOIN mx GROUP BY user_id, mx.maxd),
          |th AS (SELECT quantile_cont(r_days, 0.5) AS tr,
          |              quantile_cont(freq, 0.5) AS tf,
          |              quantile_cont(m_cents, 0.5) AS tm FROM u)
          |SELECT user_id, CAST(r_days AS INT) AS r_days, freq, m_cents,
          |       (CASE WHEN freq >= tf THEN 1 ELSE 0 END +
          |        CASE WHEN m_cents >= tm THEN 1 ELSE 0 END +
          |        CASE WHEN r_days <= tr THEN 1 ELSE 0 END) AS rfm_score
          |FROM u CROSS JOIN th""".stripMargin)),

    GraftQuery("a31_ohlc_bars",
      // OHLC candlestick resampling per (event_type, day): open/close
      // are single-pass min_by/max_by on the (ts, event_id) order —
      // no per-bar sort, one partial-aggregated exchange; the oracle
      // derives the same endpoints from rank-1 rows of two windows
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"),
          to_date(col("ts")).cast("string").as("day"))
        .agg(
          round(min_by(col("value"), struct(col("ts"), col("event_id"))), 6)
            .as("open"),
          round(max(col("value")), 6).as("high"),
          round(min(col("value")), 6).as("low"),
          round(max_by(col("value"), struct(col("ts"), col("event_id"))), 6)
            .as("close"),
          count(lit(1)).as("n_trades"),
          round(sum(col("value")), 6).as("total")),
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_type, make_timestamp(epoch_ns(ts)//1000) AS t,
          |         event_id, value
          |  FROM events),
          |d AS (
          |  SELECT event_type, strftime(t, '%Y-%m-%d') AS day, t, event_id, value
          |  FROM ev),
          |w AS (
          |  SELECT *,
          |         row_number() OVER (PARTITION BY event_type, day
          |                            ORDER BY t, event_id) AS ra,
          |         row_number() OVER (PARTITION BY event_type, day
          |                            ORDER BY t DESC, event_id DESC) AS rd
          |  FROM d)
          |SELECT event_type, day,
          |       round(max(CASE WHEN ra = 1 THEN value END), 6) AS open,
          |       round(max(value), 6) AS high,
          |       round(min(value), 6) AS low,
          |       round(max(CASE WHEN rd = 1 THEN value END), 6) AS close,
          |       count(*) AS n_trades,
          |       round(sum(value), 6) AS total
          |FROM w GROUP BY 1, 2""".stripMargin)),

    GraftQuery("a34_frequent_seqs",
      // top-20 length-3 event-type paths by user support: the window
      // lead form replaces the 3-way positional self-join, support
      // counts distinct users so loops don't dominate, and the top-K
      // is a TakeOrdered on a deterministic total order
      (s, dir) => TemporalOps.frequentSequences(
        Tables.events(s, dir), "user_id", "ts", "event_id", "event_type",
        length = 3, topK = 20),
      oracle = Some(
        """WITH led AS (
          |  SELECT user_id, event_type AS a,
          |         lead(event_type, 1) OVER w AS b,
          |         lead(event_type, 2) OVER w AS c
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |seqs AS (
          |  SELECT user_id, a || '>' || b || '>' || c AS seq
          |  FROM led WHERE c IS NOT NULL),
          |counts AS (
          |  SELECT seq, count(DISTINCT user_id) AS support,
          |         count(*) AS occurrences
          |  FROM seqs GROUP BY seq
          |  ORDER BY support DESC, occurrences DESC, seq LIMIT 20)
          |SELECT seq, support, occurrences,
          |       row_number() OVER (ORDER BY support DESC, occurrences DESC, seq)
          |         AS rank
          |FROM counts""".stripMargin)),

    GraftQuery("a35_interval_union",
      // sweep-line union of per-user busy intervals (event start +
      // value-hours duration, exact integer microseconds): total
      // covered time and merged-interval count per user without any
      // O(n²) overlap self-join
      (s, dir) => {
        val iv = Tables.events(s, dir).select(
          col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            round(col("value") * 100, 0).cast("long") * 36000000L).as("e_us"))
        TemporalOps.intervalUnion(iv, Seq("user_id"), "s_us", "e_us", "event_id")
      },
      oracle = Some(
        """WITH iv AS (
          |  SELECT user_id, event_id,
          |         epoch_ns(ts) // 1000 AS s,
          |         epoch_ns(ts) // 1000
          |           + CAST(round(value * 100, 0) AS BIGINT) * 36000000 AS e
          |  FROM events),
          |pts AS (
          |  SELECT user_id, s AS t, 1 AS d, event_id FROM iv
          |  UNION ALL
          |  SELECT user_id, e AS t, -1 AS d, event_id FROM iv),
          |m AS (
          |  SELECT user_id, t, d,
          |         sum(d) OVER w AS active,
          |         lead(t) OVER w AS nextt
          |  FROM pts
          |  WINDOW w AS (PARTITION BY user_id ORDER BY t, d DESC, event_id))
          |SELECT user_id,
          |  sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n_intervals,
          |  sum(CASE WHEN active = 1 AND d = 1 THEN 1 ELSE 0 END)::BIGINT
          |    AS n_merged,
          |  sum(CASE WHEN active > 0 AND nextt IS NOT NULL THEN nextt - t
          |      ELSE 0 END)::BIGINT AS covered_us
          |FROM m GROUP BY user_id""".stripMargin)),

    GraftQuery("a39_cadence",
      // posting-cadence profile per user: inter-arrival gaps log2-
      // bucketed with the a33 integer trick (length(bin(s))-1), the
      // modal bucket (ties → smallest) and its share — too-regular
      // cadence (high share) is the classic bot signal. One window
      // pass + (user, bucket) scalar aggregates.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .withColumn("gap_s",
            ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
              / 1000000L).cast("long"))
          .where(col("gap_s").isNotNull && col("gap_s") > 0)
          .withColumn("bucket", (length(bin(col("gap_s"))) - 1).cast("int"))
        val counts = gaps.groupBy(col("user_id"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val top = counts.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("cnt").desc, col("bucket"))))
          .where(col("rn") === 1)
        val totals = counts.groupBy(col("user_id")).agg(sum(col("cnt")).as("n_gaps"))
        totals.join(top, "user_id")
          .select(col("user_id"), col("n_gaps"),
            col("bucket").as("modal_bucket"), col("cnt").as("modal_cnt"),
            round(col("cnt").cast("double") / col("n_gaps"), 6).as("modal_share"),
            (col("cnt") * 2 > col("n_gaps")).as("regular"))
      },
      oracle = Some(
        """WITH g AS (
          |  SELECT user_id,
          |    (epoch_ns(ts) // 1000
          |     - epoch_ns(lag(ts) OVER (PARTITION BY user_id
          |                              ORDER BY ts, event_id)) // 1000)
          |      // 1000000 AS gap_s
          |  FROM events),
          |b AS (
          |  SELECT user_id, length(bin(gap_s)) - 1 AS bucket
          |  FROM g WHERE gap_s IS NOT NULL AND gap_s > 0),
          |counts AS (
          |  SELECT user_id, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
          |top AS (
          |  SELECT user_id, bucket, cnt,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY cnt DESC, bucket) AS rn
          |  FROM counts),
          |totals AS (SELECT user_id, sum(cnt)::BIGINT AS n_gaps
          |           FROM counts GROUP BY 1)
          |SELECT t.user_id, t.n_gaps, p.bucket AS modal_bucket,
          |       p.cnt AS modal_cnt,
          |       round(p.cnt::DOUBLE / t.n_gaps, 6) AS modal_share,
          |       (p.cnt * 2 > t.n_gaps) AS regular
          |FROM totals t JOIN top p ON p.user_id = t.user_id AND p.rn = 1""".stripMargin)),

    GraftQuery("a25_twap",
      // time-weighted average per user: each observation holds until the
      // next one, so its weight is the gap to the successor (last
      // observation carries no interval — excluded, exactly like a TWAP
      // window that closes at the final tick). Weights are exact integer
      // microsecond gaps from ONE lead() pass over the (user, ts) sort;
      // only the weighted-sum ratio is floating point, rounded at output
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("dt",
            unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .where(col("dt").isNotNull)
          .groupBy(col("user_id"))
          .agg(
            round(sum(col("value") * col("dt")) / sum(col("dt")), 6).as("twap"),
            count(lit(1)).as("n_intervals"),
            sum(col("dt")).as("span_us"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, value
          |  FROM events),
          |gaps AS (
          |  SELECT user_id, value,
          |         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
          |           - us AS dt
          |  FROM ev)
          |SELECT user_id, round(sum(value * dt) / sum(dt), 6) AS twap,
          |       count(*) AS n_intervals, CAST(sum(dt) AS BIGINT) AS span_us
          |FROM gaps WHERE dt IS NOT NULL GROUP BY user_id""".stripMargin)),

    GraftQuery("a6_session_window",
      // the same sessions via Spark's NATIVE session_window aggregation
      // (the streaming-capable form: with a watermark this exact plan
      // runs on an unbounded stream with state bounded to open
      // sessions). Boundary semantics differ from a5 by design:
      // session_window closes at gap >= (an event exactly `gap` later
      // starts a new session), mirrored in the oracle's >= test, and
      // session_end is last_event + gap, not last_event.
      (s, dir) => Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("total_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("total_value")),
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts)//1000) AS ts, value
          |  FROM events),
          |marked AS (
          |  SELECT user_id, ts, value, event_id,
          |         CASE WHEN lag(ts) OVER w IS NULL
          |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
          |              THEN 1 ELSE 0 END AS boundary
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sess AS (
          |  SELECT user_id, ts, value,
          |         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                             ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM marked)
          |SELECT user_id, min(ts) AS session_start,
          |       max(ts) + INTERVAL 30 MINUTE AS session_end,
          |       count(*) AS n_events, round(sum(value), 6) AS total_value
          |FROM sess GROUP BY user_id, sid""".stripMargin)),

    GraftQuery("j6_asof_join",
      // every event annotated with the user's latest purchase at or
      // before it: the classic dimension-as-of lookup, checked against
      // DuckDB's native ASOF LEFT JOIN
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val purchases = Tables.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        TemporalOps.asofJoinBackward(ev, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("value"),
          rightTie = "event_id")
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            col("asof_ts").as("purchase_ts"), col("value").as("purchase_value"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
          |         event_type
          |  FROM events),
          |p AS (
          |  SELECT user_id, ts, value FROM (
          |    SELECT user_id, make_timestamp(epoch_ns(ts)//1000) AS ts, value,
          |           row_number() OVER (PARTITION BY user_id, ts
          |                              ORDER BY event_id DESC) AS rn
          |    FROM events WHERE event_type = 'purchase') t
          |  WHERE rn = 1)
          |SELECT e.event_id, e.user_id, e.ts, e.event_type,
          |       p.ts AS purchase_ts, p.value AS purchase_value
          |FROM ev e ASOF LEFT JOIN p
          |  ON e.user_id = p.user_id AND p.ts <= e.ts""".stripMargin),
      headline = true),

    GraftQuery("j13_asof_tolerance",
      // j6 with a staleness bound (pandas merge_asof tolerance): a
      // purchase more than 6 hours before the event is treated as no
      // match — the "latest state, unless stale" serving lookup
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val purchases = Tables.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        TemporalOps.asofJoinBackwardWithin(ev, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("value"),
          rightTie = "event_id", toleranceSeconds = 6 * 3600L)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            col("asof_ts").as("purchase_ts"), col("value").as("purchase_value"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
          |         event_type
          |  FROM events),
          |p AS (
          |  SELECT user_id, ts, value FROM (
          |    SELECT user_id, make_timestamp(epoch_ns(ts)//1000) AS ts, value,
          |           row_number() OVER (PARTITION BY user_id, ts
          |                              ORDER BY event_id DESC) AS rn
          |    FROM events WHERE event_type = 'purchase') t
          |  WHERE rn = 1)
          |SELECT e.event_id, e.user_id, e.ts, e.event_type,
          |       CASE WHEN p.ts >= e.ts - INTERVAL '6' HOUR THEN p.ts END
          |         AS purchase_ts,
          |       CASE WHEN p.ts >= e.ts - INTERVAL '6' HOUR THEN p.value END
          |         AS purchase_value
          |FROM ev e ASOF LEFT JOIN p
          |  ON e.user_id = p.user_id AND p.ts <= e.ts""".stripMargin)),

    GraftQuery("j7_range_join",
      // error events falling inside any 45-minute promo window opened
      // by a purchase of a low-id user — a genuine no-equi-key range
      // join (windows of ANY user match errors of ANY user), binned to
      // an hash join on the hour bin; the oracle is DuckDB's
      // inequality-join formulation
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.where(col("event_type") === "error")
          .select(col("event_id"), col("ts"))
        val promos = ev.where(col("event_type") === "purchase" && col("user_id") < 30)
          .select(col("event_id").as("promo_id"), col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL '45' MINUTE")).as("end_ts"))
        TemporalOps.pointInInterval(errors, "ts", promos,
          "start_ts", "end_ts", binSeconds = 3600)
          .select(col("event_id"), col("ts"), col("promo_id"), col("start_ts"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, event_type,
          |         make_timestamp(epoch_ns(ts)//1000) AS ts
          |  FROM events),
          |errors AS (
          |  SELECT event_id, ts FROM ev WHERE event_type = 'error'),
          |promos AS (
          |  SELECT event_id AS promo_id, ts AS start_ts,
          |         ts + INTERVAL 45 MINUTE AS end_ts
          |  FROM ev WHERE event_type = 'purchase' AND user_id < 30)
          |SELECT e.event_id, e.ts, p.promo_id, p.start_ts
          |FROM errors e JOIN promos p
          |  ON e.ts >= p.start_ts AND e.ts < p.end_ts""".stripMargin)),

    GraftQuery("j11_overlap_join",
      // which promo windows did each user session overlap, and for how
      // long: a genuine interval×interval overlap join (sessions of ANY
      // user vs windows opened by ANY low-id user's purchase), binned to
      // a hash equi-join with first-shared-bin dedup; the oracle is the
      // unconstrained inequality formulation (DuckDB IEJoin)
      (s, dir) => {
        val sess = TemporalOps.sessionize(Tables.events(s, dir),
            Seq("user_id"), "ts", Seq("event_id"), gapSeconds = 1800)
          .groupBy(col("user_id"), col("session_seq").as("session_id"))
          .agg(min("ts").as("s_start"),
            // half-open: pad a minute past the last event so one-event
            // sessions are non-empty intervals
            (max(col("ts")) + expr("INTERVAL '60' SECOND")).as("s_end"))
        val promos = Tables.events(s, dir)
          .where(col("event_type") === "purchase" && col("user_id") < 30)
          .select(col("event_id").as("promo_id"), col("ts").as("p_start"),
            (col("ts") + expr("INTERVAL '45' MINUTE")).as("p_end"))
        TemporalOps.intervalOverlapJoin(sess, "s_start", "s_end",
            promos, "p_start", "p_end", binSeconds = 3600)
          .select(col("user_id"), col("session_id"), col("promo_id"),
            floor((least(unix_micros(col("s_end")), unix_micros(col("p_end"))) -
              greatest(unix_micros(col("s_start")), unix_micros(col("p_start"))))
              / 1000000L).as("overlap_sec"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, event_type,
          |         make_timestamp(epoch_ns(ts)//1000) AS ts
          |  FROM events),
          |marked AS (
          |  SELECT user_id, ts, event_id,
          |         CASE WHEN lag(ts) OVER w IS NULL
          |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          |              THEN 1 ELSE 0 END AS boundary
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sess AS (
          |  SELECT user_id,
          |         CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
          |         ts
          |  FROM marked),
          |iv AS (
          |  SELECT user_id, session_id, min(ts) AS s_start,
          |         max(ts) + INTERVAL 60 SECOND AS s_end
          |  FROM sess GROUP BY 1, 2),
          |promos AS (
          |  SELECT event_id AS promo_id, ts AS p_start,
          |         ts + INTERVAL 45 MINUTE AS p_end
          |  FROM ev WHERE event_type = 'purchase' AND user_id < 30)
          |SELECT s.user_id, s.session_id, p.promo_id,
          |       (epoch_us(least(s.s_end, p.p_end)) -
          |        epoch_us(greatest(s.s_start, p.p_start))) // 1000000 AS overlap_sec
          |FROM iv s JOIN promos p
          |  ON s.s_start < p.p_end AND p.p_start < s.s_end""".stripMargin)),

    GraftQuery("j12_nearest_join",
      // every view event annotated with the user's NEAREST purchase in
      // either direction (backward wins distance ties) — the
      // sensor-alignment join; one exchange, no join operator. The
      // oracle composes DuckDB's backward and forward native ASOF joins
      // and re-applies the same tie rule.
      (s, dir) => {
        val views = Tables.events(s, dir)
          .where(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = Tables.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        TemporalOps.nearestJoin(views, purchases, Seq("user_id"),
            leftTs = "ts", rightTs = "ts",
            payload = Seq("value"), rightTie = "event_id")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("near_ts").as("purchase_ts"), col("value").as("purchase_value"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id, event_type, value,
          |         make_timestamp(epoch_ns(ts)//1000) AS ts
          |  FROM events),
          |v AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view'),
          |p AS (
          |  SELECT user_id, ts, value FROM (
          |    SELECT user_id, ts, value,
          |           row_number() OVER (PARTITION BY user_id, ts
          |                              ORDER BY event_id DESC) AS rn
          |    FROM ev WHERE event_type = 'purchase') t
          |  WHERE rn = 1),
          |b AS (
          |  SELECT v.event_id, v.user_id, v.ts, p.ts AS bts, p.value AS bval
          |  FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND p.ts <= v.ts),
          |f AS (
          |  SELECT v.event_id, p.ts AS fts, p.value AS fval
          |  FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND p.ts > v.ts)
          |SELECT b.event_id, b.user_id, b.ts,
          |       CASE WHEN f.fts IS NULL OR (b.bts IS NOT NULL AND
          |                 epoch_us(b.ts) - epoch_us(b.bts) <=
          |                 epoch_us(f.fts) - epoch_us(b.ts))
          |            THEN b.bts ELSE f.fts END AS purchase_ts,
          |       CASE WHEN f.fts IS NULL OR (b.bts IS NOT NULL AND
          |                 epoch_us(b.ts) - epoch_us(b.bts) <=
          |                 epoch_us(f.fts) - epoch_us(b.ts))
          |            THEN b.bval ELSE f.fval END AS purchase_value
          |FROM b JOIN f ON b.event_id = f.event_id""".stripMargin)),

    GraftQuery("w12_lastk_prior",
      // feature engineering: each purchase gets the average of its
      // user's last <=3 PRIOR non-purchase values via IGNORE NULLS
      // lags — one window exchange of scalars, never the O(n²)
      // running-collect_list a naive "last k" materializes
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val prior = when(col("event_type") =!= "purchase", col("value"))
        Tables.events(s, dir)
          .withColumn("__prior", prior)
          // one projection holds all three lags → ONE Window operator
          // (separate withColumns stack three; plan-audited)
          .select(col("event_id"), col("user_id"), col("event_type"),
            lag(col("__prior"), 1, null, ignoreNulls = true).over(w).as("l1"),
            lag(col("__prior"), 2, null, ignoreNulls = true).over(w).as("l2"),
            lag(col("__prior"), 3, null, ignoreNulls = true).over(w).as("l3"))
          .where(col("event_type") === "purchase" && col("l1").isNotNull)
          .withColumn("n_hist",
            lit(1) + when(col("l2").isNotNull, 1).otherwise(0)
              + when(col("l3").isNotNull, 1).otherwise(0))
          .withColumn("avg_prior3", round(
            (col("l1") + coalesce(col("l2"), lit(0.0))
              + coalesce(col("l3"), lit(0.0))) / col("n_hist"), 6))
          .select(col("event_id"), col("user_id"), col("n_hist"),
            col("avg_prior3"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT event_id, user_id, event_type,
          |    lag(CASE WHEN event_type <> 'purchase' THEN value END,
          |        1 IGNORE NULLS) OVER w AS l1,
          |    lag(CASE WHEN event_type <> 'purchase' THEN value END,
          |        2 IGNORE NULLS) OVER w AS l2,
          |    lag(CASE WHEN event_type <> 'purchase' THEN value END,
          |        3 IGNORE NULLS) OVER w AS l3
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT event_id, user_id,
          |  (1 + CASE WHEN l2 IS NOT NULL THEN 1 ELSE 0 END
          |     + CASE WHEN l3 IS NOT NULL THEN 1 ELSE 0 END) AS n_hist,
          |  round((l1 + coalesce(l2, 0) + coalesce(l3, 0)) /
          |        (1 + CASE WHEN l2 IS NOT NULL THEN 1 ELSE 0 END
          |           + CASE WHEN l3 IS NOT NULL THEN 1 ELSE 0 END), 6)
          |    AS avg_prior3
          |FROM t WHERE event_type = 'purchase' AND l1 IS NOT NULL""".stripMargin)),

    GraftQuery("w10_throttle",
      // alert-style cooldown throttle: per (user, event_type), keep an
      // event only if >= 2h passed since the previously KEPT one — the
      // suppression clock resets on keeps, so this is a sequential
      // per-key fold, not a window; the oracle walks the same rule as a
      // DuckDB recursive CTE
      (s, dir) => TemporalOps.throttle(Tables.events(s, dir),
          Seq("user_id", "event_type"), "ts", "event_id",
          cooldownSeconds = 7200)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
      oracle = Some(
        """WITH RECURSIVE ev AS (
          |  SELECT user_id, event_type, event_id,
          |         make_timestamp(epoch_ns(ts)//1000) AS ts,
          |         CAST(row_number() OVER (PARTITION BY user_id, event_type
          |                                 ORDER BY ts, event_id) AS INT) AS rn
          |  FROM events),
          |walk AS (
          |  SELECT user_id, event_type, event_id, ts, rn, ts AS last_kept,
          |         TRUE AS kept
          |  FROM ev WHERE rn = 1
          |  UNION ALL
          |  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.rn,
          |         CASE WHEN epoch_us(e.ts) - epoch_us(w.last_kept) >= 7200000000
          |              THEN e.ts ELSE w.last_kept END,
          |         epoch_us(e.ts) - epoch_us(w.last_kept) >= 7200000000
          |  FROM walk w JOIN ev e ON e.user_id = w.user_id
          |    AND e.event_type = w.event_type AND e.rn = w.rn + 1)
          |SELECT user_id, event_type, ts, event_id FROM walk WHERE kept""".stripMargin)),

    GraftQuery("j10_scd2",
      // type-2 slowly-changing dimension from the event change log: each
      // user's event_type history collapses no-op redeliveries and opens
      // a dated version per actual change, closed by the next version's
      // start. One key exchange; the collapse lag, closing lead, and
      // version number share its sort.
      (s, dir) => {
        val ch = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        TemporalOps.scd2(ch, "user_id", "ts", Seq("event_type"),
            tieCols = Seq("event_id"))
          .select(col("user_id"), col("version"),
            col("event_type").as("attr"), col("effective_from"),
            col("effective_to"), col("is_current"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT user_id, event_id, event_type,
          |         make_timestamp(epoch_ns(ts)//1000) AS ts
          |  FROM events),
          |l AS (
          |  SELECT *, lag(event_type) OVER
          |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM ev),
          |o AS (SELECT * FROM l WHERE prev IS NULL OR prev <> event_type)
          |SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
          |       event_type AS attr, ts AS effective_from,
          |       lead(ts) OVER w AS effective_to,
          |       lead(ts) OVER w IS NULL AS is_current
          |FROM o
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin))
  )
}
