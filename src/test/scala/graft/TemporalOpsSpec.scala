package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case goldens + plan audits for the temporal operators: the gap
  * boundary itself, inclusive/exclusive interval endpoints, as-of ties,
  * and the shuffle shape each operator promises (no join node in the
  * as-of plan, no nested-loop/cartesian in the range join, one data
  * exchange for sessionize+aggregate).
  */
class TemporalOpsSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("uid", "t", "eid")
      .select($"uid", $"t".cast("timestamp").as("t"), $"eid")

  // ---- sessionize ----

  test("sessionize: gap strictly greater than gapSeconds splits, equal does not") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:30:00", 2L), // exactly 1800s later -> same session
      (1L, "2024-01-01 11:00:01", 3L), // 1801s later -> new session
      (2L, "2024-01-01 09:00:00", 4L)) // other key starts at 1
    val out = TemporalOps.sessionize(df, Seq("uid"), "t", Seq("eid"), 1800)
      .select($"uid", $"eid", $"session_seq").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("sessionize + per-session aggregate shuffles the data exactly once") {
    val df = events((1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 12:00:00", 2L))
    val agg = TemporalOps.sessionize(df, Seq("uid"), "t", Seq("eid"), 1800)
      .groupBy($"uid", $"session_seq").agg(count(lit(1)).as("n"))
    agg.collect()
    val exchanges = collectWithSubqueries(agg.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // the window's exchange on uid also satisfies the aggregation's
    // (uid, session_seq) clustering — a second exchange would mean the
    // partitioning reuse regressed
    assert(exchanges.size == 1, s"expected 1 exchange, got ${exchanges.size}")
  }

  // ---- asofJoinBackward ----

  private def asofFixture: (DataFrame, DataFrame) = {
    val left = events(
      (1L, "2024-01-01 10:00:00", 10L), // equal-ts right row matches (<=)
      (1L, "2024-01-01 11:00:00", 11L), // latest prior = 10:00 row
      (1L, "2024-01-01 09:00:00", 12L), // only the 08:00 right row precedes
      (3L, "2024-01-01 10:00:00", 13L)) // key with no right rows at all
    val right = Seq(
      (1L, "2024-01-01 10:00:00", 100L, 5.0), // tie on (key, ts):
      (1L, "2024-01-01 10:00:00", 101L, 7.0), //  greater eid wins -> 7.0
      (1L, "2024-01-01 08:00:00", 102L, 1.0))
      .toDF("uid", "t", "eid", "v")
      .select($"uid", $"t".cast("timestamp").as("t"), $"eid", $"v")
    (left, right)
  }

  test("asofJoinBackward: inclusive match, tie dedup, and null for no-prior") {
    val (left, right) = asofFixture
    val out = TemporalOps.asofJoinBackward(left, right, Seq("uid"),
      "t", "t", Seq("v"), rightTie = "eid")
      .select($"eid", $"asof_ts", $"v")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(7.0)), // equal ts, tie -> eid 101
      (11L, Some(ts("2024-01-01 10:00:00")), Some(7.0)),
      (12L, Some(ts("2024-01-01 08:00:00")), Some(1.0)),
      (13L, None, None)))
  }

  test("asofJoinBackward plan contains no join operator") {
    val (left, right) = asofFixture
    val out = TemporalOps.asofJoinBackward(left, right, Seq("uid"),
      "t", "t", Seq("v"), rightTie = "eid")
    out.collect()
    val joins = collectWithSubqueries(out.queryExecution.executedPlan) {
      case p: SparkPlan if p.nodeName.toLowerCase.contains("join") => p
    }
    assert(joins.isEmpty, s"as-of must be the union-merge plan, found: ${joins.map(_.nodeName)}")
  }

  test("asofJoinBackwardWithin: stale matches null out; bounds inclusive; extremes") {
    val (left, right) = asofFixture
    def run(tolSec: Long) =
      TemporalOps.asofJoinBackwardWithin(left, right, Seq("uid"),
        "t", "t", Seq("v"), rightTie = "eid", toleranceSeconds = tolSec)
        .select($"eid", $"asof_ts", $"v")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)),
          Option(r.get(2)))).toSet
    // 1h bound, inclusive: eid 11's match is EXACTLY 3600s old — kept;
    // eid 12's (08:00 -> 09:00) is also exactly 3600s — kept
    assert(run(3600L) == Set(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(7.0)),
      (11L, Some(ts("2024-01-01 10:00:00")), Some(7.0)),
      (12L, Some(ts("2024-01-01 08:00:00")), Some(1.0)),
      (13L, None, None)))
    // one second under: both hour-old matches go stale
    assert(run(3599L) == Set(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(7.0)),
      (11L, None, None), (12L, None, None), (13L, None, None)))
    // zero tolerance: only the equal-timestamp match survives
    assert(run(0L) == Set(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(7.0)),
      (11L, None, None), (12L, None, None), (13L, None, None)))
    // huge tolerance degenerates to the unbounded operator
    val unbounded = TemporalOps.asofJoinBackward(left, right, Seq("uid"),
      "t", "t", Seq("v"), rightTie = "eid")
      .select($"eid", $"asof_ts", $"v")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)),
        Option(r.get(2)))).toSet
    assert(run(365L * 86400L) == unbounded)
  }

  // ---- pointInInterval ----

  test("pointInInterval: inclusive start, exclusive end, multi-bin intervals match once") {
    val points = Seq(
      (1L, "2024-01-01 10:00:00"), // == start -> match
      (2L, "2024-01-01 13:00:00"), // == end -> no match
      (3L, "2024-01-01 12:59:59"), // inside, 3 bins from start
      (4L, "2024-01-01 09:59:59")) // just before start
      .toDF("pid", "t").select($"pid", $"t".cast("timestamp").as("t"))
    val intervals = Seq(
      (100L, "2024-01-01 10:00:00", "2024-01-01 13:00:00"), // spans 4 hour-bins
      (101L, "2024-01-01 11:00:00", "2024-01-01 11:00:00")) // empty -> dropped
      .toDF("iid", "s", "e")
      .select($"iid", $"s".cast("timestamp").as("s"), $"e".cast("timestamp").as("e"))
    val out = TemporalOps.pointInInterval(points, "t", intervals, "s", "e", 3600)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((1L, 100L), (3L, 100L)))
    // exactly once each, even though the interval spans several bins
    assert(out.distinct.size == out.size)
  }

  test("pointInInterval plan is an equi hash join, not a nested loop") {
    val points = Seq((1L, "2024-01-01 10:30:00")).toDF("pid", "t")
      .select($"pid", $"t".cast("timestamp").as("t"))
    val intervals = Seq((100L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("iid", "s", "e")
      .select($"iid", $"s".cast("timestamp").as("s"), $"e".cast("timestamp").as("e"))
    val out = TemporalOps.pointInInterval(points, "t", intervals, "s", "e", 3600)
    out.collect()
    val bad = collectWithSubqueries(out.queryExecution.executedPlan) {
      case p: SparkPlan
        if p.nodeName.contains("BroadcastNestedLoopJoin") ||
          p.nodeName.contains("CartesianProduct") => p
    }
    assert(bad.isEmpty, s"range join must bin to an equi join, found: ${bad.map(_.nodeName)}")
  }

  test("scd2: no-op redeliveries collapse, reopened value gets a new version") {
    // key 1: a, a (no-op), b, a (reopen) -> 3 versions; key 2: one row
    val ch = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a"), (2L, 10L, 5L, "x"))
      .toDF("k", "t", "seq", "attr")
    val out = TemporalOps.scd2(ch, "k", "t", Seq("attr"), tieCols = Seq("seq"))
      .select($"k", $"version", $"attr", $"effective_from",
        $"effective_to", $"is_current")
      .as[(Long, Int, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, 1, "a", 10L, Some(30L), false),
      (1L, 2, "b", 30L, Some(40L), false),
      (1L, 3, "a", 40L, None, true),
      (2L, 1, "x", 10L, None, true)))
  }

  test("scd2: NULL attribute values compare null-safely") {
    // null -> null is a no-op; null -> value and value -> null are changes
    val ch = Seq(
      (1L, 10L, Option.empty[String]), (1L, 20L, Option.empty[String]),
      (1L, 30L, Some("v")), (1L, 40L, Option.empty[String]))
      .toDF("k", "t", "attr")
    val out = TemporalOps.scd2(ch, "k", "t", Seq("attr"))
      .select($"version", $"attr", $"effective_from")
      .as[(Int, Option[String], Long)].collect().toSet
    assert(out == Set((1, None, 10L), (2, Some("v"), 30L), (3, None, 40L)))
  }

  test("scd2: multi-attribute tuples — any field change opens a version") {
    val ch = Seq(
      (1L, 10L, "a", 1), (1L, 20L, "a", 2), (1L, 30L, "a", 2))
      .toDF("k", "t", "c1", "c2")
    val out = TemporalOps.scd2(ch, "k", "t", Seq("c1", "c2"))
      .select($"version", $"c2").as[(Int, Int)].collect().toSet
    assert(out == Set((1, 1), (2, 2)))
    intercept[IllegalArgumentException] {
      TemporalOps.scd2(ch, "k", "t", Seq.empty)
    }
  }

  // ---- intervalOverlapJoin ----

  private def intervals(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("iid", "s", "e")
      .select($"iid", $"s".cast("timestamp").as("s"), $"e".cast("timestamp").as("e"))

  test("intervalOverlapJoin: overlap/touch/contain/disjoint, multi-bin pairs emit once") {
    val left = intervals(
      (1L, "2024-01-01 10:00:00", "2024-01-01 13:00:00"), // spans 4 hour-bins
      (2L, "2024-01-01 15:00:00", "2024-01-01 16:00:00"),
      (3L, "2024-01-01 20:00:00", "2024-01-01 20:00:00")) // empty -> dropped
    val right = intervals(
      (100L, "2024-01-01 12:30:00", "2024-01-01 14:00:00"), // overlaps 1
      (101L, "2024-01-01 13:00:00", "2024-01-01 14:00:00"), // touches 1 (half-open) -> no
      (102L, "2024-01-01 10:30:00", "2024-01-01 11:00:00"), // contained in 1
      (103L, "2024-01-01 09:00:00", "2024-01-01 14:00:00"), // contains 1, overlaps nothing else
      (104L, "2024-01-01 20:00:00", "2024-01-01 20:00:00")) // empty -> dropped
    val pairs = TemporalOps.intervalOverlapJoin(
        left, "s", "e",
        right.toDF("rid", "rs", "re"), "rs", "re", binSeconds = 3600)
      .select($"iid", $"rid").as[(Long, Long)].collect().toSeq
    assert(pairs.sorted == Seq((1L, 100L), (1L, 102L), (1L, 103L)))
    // exactly once each even though both sides replicate across bins
    assert(pairs.distinct.size == pairs.size)
  }

  test("intervalOverlapJoin plan is an equi hash join, not a nested loop") {
    val left = intervals((1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
    val right = intervals((2L, "2024-01-01 10:30:00", "2024-01-01 12:00:00"))
      .toDF("rid", "rs", "re")
    val out = TemporalOps.intervalOverlapJoin(left, "s", "e", right, "rs", "re", 3600)
    out.collect()
    val bad = collectWithSubqueries(out.queryExecution.executedPlan) {
      case p: SparkPlan
        if p.nodeName.contains("BroadcastNestedLoopJoin") ||
          p.nodeName.contains("CartesianProduct") => p
    }
    assert(bad.isEmpty, s"overlap join must bin to an equi join, found: ${bad.map(_.nodeName)}")
  }

  // ---- nearestJoin ----

  private def nearestFixture: (DataFrame, DataFrame) = {
    val left = events(
      (1L, "2024-01-01 10:00:00", 10L), // equal-ts right counts as backward
      (1L, "2024-01-01 11:30:00", 11L), // 10:00 is 90min back, 12:00 is 30min ahead -> forward
      (1L, "2024-01-01 13:00:00", 12L), // 12:00 back (60min) vs 14:00 ahead (60min): tie -> backward
      (1L, "2024-01-01 07:00:00", 13L), // nothing prior -> forward 10:00
      (3L, "2024-01-01 10:00:00", 14L)) // key with no right rows -> nulls
    val right = Seq(
      (1L, "2024-01-01 10:00:00", 100L, 5.0),
      (1L, "2024-01-01 10:00:00", 101L, 7.0), // (key, ts) tie: greater eid wins
      (1L, "2024-01-01 12:00:00", 102L, 2.0),
      (1L, "2024-01-01 14:00:00", 103L, 9.0))
      .toDF("uid", "t", "eid", "v")
      .select($"uid", $"t".cast("timestamp").as("t"), $"eid", $"v")
    (left, right)
  }

  test("nearestJoin: picks nearer side, backward wins ties, null when no right rows") {
    val (left, right) = nearestFixture
    val out = TemporalOps.nearestJoin(left, right, Seq("uid"),
        "t", "t", Seq("v"), rightTie = "eid")
      .select($"eid", $"near_ts", $"v")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(7.0)), // equal ts -> backward, tie dedup
      (11L, Some(ts("2024-01-01 12:00:00")), Some(2.0)), // forward is nearer
      (12L, Some(ts("2024-01-01 12:00:00")), Some(2.0)), // distance tie -> backward
      (13L, Some(ts("2024-01-01 10:00:00")), Some(7.0)), // no prior -> forward
      (14L, None, None)))
  }

  // ---- throttle ----

  test("cusumChangepoints: hand-computed reflected fold, alarms, and param gates") {
    import spark.implicits._
    // key "a": mean 20, slack 2 → downward arm climbs 8/step over the
    // three 10s (8,16,24), resets on the 30s; upward arm mirrors.
    // threshold 20 → sn alarms at i=3 (24), sp at i=6 (24): 2 alarms.
    // key "b": constant series → both arms pinned at 0, no alarm.
    val rows = Seq(10.0, 10.0, 10.0, 30.0, 30.0, 30.0).zipWithIndex
      .map { case (x, i) => ("a", i.toLong, i.toLong, x) } ++
      (0 until 4).map(i => ("b", i.toLong, i.toLong, 5.0))
    val df = rows.toDF("k", "ts", "tie", "x")
    val out = TemporalOps.cusumChangepoints(df, "k", "ts", "tie", "x",
      slack = 2.0, threshold = 20.0)
      .as[(String, Long, Double, Double, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    val a = out("a")
    assert(a._2 == 6 && a._3 == 24.0 && a._4 == 24.0, s"key a stats: $a")
    assert(a._5 == 2 && a._6.contains(3L), s"key a alarms: $a")
    val b = out("b")
    assert(b._2 == 4 && b._3 == 0.0 && b._4 == 0.0 && b._5 == 0 && b._6.isEmpty,
      s"key b must be quiet: $b")
    // order sensitivity: the fold must follow (ts, tie), not input order
    val shuffled = df.orderBy(rand(42))
    val again = TemporalOps.cusumChangepoints(shuffled, "k", "ts", "tie", "x",
      slack = 2.0, threshold = 20.0)
      .as[(String, Long, Double, Double, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(again == out, "result must be independent of input row order")
    intercept[IllegalArgumentException](
      TemporalOps.cusumChangepoints(df, "k", "ts", "tie", "x", -1.0, 20.0))
    intercept[IllegalArgumentException](
      TemporalOps.cusumChangepoints(df, "k", "ts", "tie", "x", 2.0, 0.0))
  }

  test("throttle: clock resets on KEPT rows only (not a gap-session), equal gap keeps") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L), // kept (first)
      (1L, "2024-01-01 10:05:00", 2L), // 5m since kept -> dropped
      (1L, "2024-01-01 10:12:00", 3L), // 12m since KEPT 10:00 -> kept
      // gap-sessionize with a 10m gap would keep only eid 1 here: every
      // consecutive gap is < 10m, but 10:12 is >= 10m past the last KEPT
      (1L, "2024-01-01 10:22:00", 4L), // exactly 10m since kept -> kept
      (2L, "2024-01-01 10:01:00", 5L)) // other key independent
    val out = TemporalOps.throttle(df, Seq("uid"), "t", "eid", 600)
      .select($"eid").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L, 5L))
  }

  test("throttle: (ts, tie) ordering breaks same-timestamp ties deterministically") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 7L),
      (1L, "2024-01-01 10:00:00", 6L)) // same ts: lower eid sorts first, is kept
    val out = TemporalOps.throttle(df, Seq("uid"), "t", "eid", 600)
      .select($"eid").as[Long].collect().toSet
    assert(out == Set(6L))
  }

  test("nearestJoin plan: no join operator, one exchange, one Window") {
    val (left, right) = nearestFixture
    val out = TemporalOps.nearestJoin(left, right, Seq("uid"),
      "t", "t", Seq("v"), rightTie = "eid")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val joins = collectWithSubqueries(plan) {
      case p: SparkPlan if p.nodeName.toLowerCase.contains("join") => p
    }
    assert(joins.isEmpty, s"nearest must be the union-merge plan, found: ${joins.map(_.nodeName)}")
    // both frames (running last + following first) must ride ONE Window
    // operator over ONE exchange — a second sort/exchange means the
    // shared window spec regressed
    val windows = collectWithSubqueries(plan) {
      case p: SparkPlan if p.nodeName == "Window" => p
    }
    assert(windows.size == 1, s"expected 1 Window operator, got ${windows.size}")
  }

  test("intervalUnion: overlaps merge, touching merge, gaps split, zero-length ok") {
    // user 1: [0,10] ∪ [5,20] ∪ [20,25] merge to [0,25]; [30,40] separate
    // user 2: [0,5] and zero-length [7,7]
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 25L),
      (1L, 4L, 30L, 40L),
      (2L, 5L, 0L, 5L), (2L, 6L, 7L, 7L))
      .toDF("uid", "eid", "s", "e")
    val got = TemporalOps.intervalUnion(iv, Seq("uid"), "s", "e", "eid")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 2L, 35L)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 5L)), s"user 2: ${got(2L)}")
  }

  test("frequentSequences: support counts users not loops; windows stay per-user") {
    // user 1 loops a>b>a>b>a (3 occurrences of length-3 runs), users
    // 2 and 3 each do x>y>z once — support must rank x>y>z (2 users)
    // over the looped runs (1 user each), occurrences break ties
    val rows =
      (1 to 5).map(i => (1L, f"2024-01-01 10:0$i:00", i.toLong,
        if (i % 2 == 1) "a" else "b")) ++
      Seq((2L, "2024-01-01 11:01:00", 10L, "x"),
        (2L, "2024-01-01 11:02:00", 11L, "y"),
        (2L, "2024-01-01 11:03:00", 12L, "z"),
        (3L, "2024-01-01 12:01:00", 20L, "x"),
        (3L, "2024-01-01 12:02:00", 21L, "y"),
        (3L, "2024-01-01 12:03:00", 22L, "z"))
    val df = rows.toDF("uid", "t", "eid", "etype")
      .select($"uid", to_timestamp($"t").as("t"), $"eid", $"etype")
    val got = TemporalOps.frequentSequences(df, "uid", "t", "eid", "etype",
        length = 3, topK = 10)
      .select($"seq", $"support", $"occurrences", $"rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.head == (("x>y>z", 2L, 2L, 1)))
    // user 1's runs: a>b>a (2 occurrences), b>a>b (1)
    assert(got(1) == (("a>b>a", 1L, 2L, 2)))
    assert(got(2) == (("b>a>b", 1L, 1L, 3)))
    assert(got.length == 3, "incomplete tail windows must not emit sequences")
    // no cross-user sequence: user boundaries never chain (z of user 2
    // never leads into user 3's x)
    assert(!got.map(_._1).contains("y>z>x"))
  }

  test("holtForecast matches a reference fold; short series dropped") {
    def ref(ys: Seq[Double], a: Double, b: Double, h: Int): (Double, Double, Double) = {
      var l = ys(0); var t = ys(1) - ys(0)
      ys.drop(1).foreach { y =>
        val lNew = a * y + (1 - a) * (l + t)
        t = b * (lNew - l) + (1 - b) * t
        l = lNew
      }
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      (r6(l), r6(t), r6(l + h * t))
    }
    val rows = Seq(
      ("up", Seq(10.0, 12.0, 15.0, 13.0, 18.0, 21.0)),
      ("flat", Seq(5.0, 5.0, 5.0, 5.0)),
      ("short", Seq(42.0))) // < 2 obs: no trend derivable, dropped
      .flatMap { case (k, ys) => ys.zipWithIndex.map { case (y, i) => (k, i, y) } }
    val got = graft.operators.TemporalOps.holtForecast(
        rows.toDF("k", "t", "y"), "k", "t", "y",
        alpha = 0.4, beta = 0.3, horizon = 5)
      .as[(String, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (ul, ut, uf) = ref(Seq(10.0, 12.0, 15.0, 13.0, 18.0, 21.0), 0.4, 0.3, 5)
    assert(got("up") == ((6, ul, ut, uf)))
    // a constant series smooths to itself with zero trend
    assert(got("flat") == ((4, 5.0, 0.0, 5.0)))
    assert(!got.contains("short"))
  }
}
