package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** General relational capability queries (the engine exposes full
  * `groupBy().agg()` / join because the merge operators are built on it —
  * SURVEY.md §2.4). Doubles are rounded after aggregation so Spark and the
  * DuckDB oracle produce bit-identical values regardless of summation
  * order.
  */
object CoreQueries extends QueryPack {

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery("q1_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      oracle = Some(
        """SELECT l_returnflag, l_linestatus,
          |       round(sum(l_quantity), 2) AS sum_qty,
          |       round(sum(l_extendedprice), 2) AS sum_base_price,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          |       count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    GraftQuery("q6_selective_agg",
      // TPC-H Q6 shape: three pushable range predicates and a single
      // global aggregate — the canonical predicate-pushdown probe (all
      // three filters must reach the parquet scan; PlanAuditSpec pins it)
      (s, dir) => Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= to_timestamp(lit("1994-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1995-01-01")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      oracle = Some(
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
          |  AND l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)),

    GraftQuery("q3_join_topk",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        val l = Tables.load(s, dir, "lineitem")
          .where(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      oracle = Some(
        """SELECT o_orderkey, o_orderdate,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY o_orderkey, o_orderdate
          |ORDER BY revenue DESC, o_orderkey
          |LIMIT 10""".stripMargin),
      headline = true),

    GraftQuery("q5_multi_join",
      (s, dir) => {
        val r = Tables.load(s, dir, "region").where(col("r_name") === "ASIA")
        val n = Tables.load(s, dir, "nation")
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        val sup = Tables.load(s, dir, "supplier")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(sup, l("l_suppkey") === sup("s_suppkey") &&
            c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      },
      oracle = Some(
        """SELECT n_name,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |GROUP BY n_name""".stripMargin),
      headline = true),

    GraftQuery("a7_rollup",
      // multi-level OLAP aggregate in ONE pass: Spark's rollup emits the
      // (event_type, day), (event_type) and () grouping sets from a
      // single Expand + hash aggregate — no per-level re-scan. Rollup
      // NULLs are rendered as '(all)' so the two engines agree on the
      // subtotal rows' representation (event_type/day are never null in
      // the data).
      (s, dir) => Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("total_value"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("day"), lit("(all)")).as("day"),
          col("n_events"), col("total_value")),
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_type,
          |         strftime(make_timestamp(epoch_ns(ts)//1000), '%Y-%m-%d') AS day,
          |         value
          |  FROM events)
          |SELECT coalesce(event_type, '(all)') AS event_type,
          |       coalesce(day, '(all)') AS day,
          |       count(*) AS n_events,
          |       round(sum(value), 6) AS total_value
          |FROM ev GROUP BY ROLLUP (event_type, day)""".stripMargin)),

    GraftQuery("w4_running_agg",
      // running + sliding window aggregates per user: cumulative sum,
      // 5-row moving average, and the row index — one exchange on
      // user_id serves all three frames
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          row_number().over(w).as("rn"),
          round(sum("value").over(w.rowsBetween(Long.MinValue, 0)), 6).as("cum_value"),
          round(avg("value").over(w.rowsBetween(-4, 0)), 6).as("avg5"))
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       CAST(row_number() OVER w AS INT) AS rn,
          |       round(sum(value) OVER (w ROWS UNBOUNDED PRECEDING), 6) AS cum_value,
          |       round(avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS avg5
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    GraftQuery("w5_window_suite",
      // window-function breadth off a single user_id exchange: offsets
      // (lag/lead), distribution (ntile, percent_rank), frame-anchored
      // first_value, and a second ordering's rank
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          lag("value", 1).over(w).as("prev_value"),
          lead("event_type", 1).over(w).as("next_type"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          first("event_id").over(w).as("first_event"),
          rank().over(wv).as("value_rank"))
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       lag(value) OVER w AS prev_value,
          |       lead(event_type) OVER w AS next_type,
          |       CAST(ntile(4) OVER w AS INT) AS quartile,
          |       round(percent_rank() OVER w, 6) AS pct_rank,
          |       first_value(event_id) OVER w AS first_event,
          |       CAST(rank() OVER (PARTITION BY user_id
          |                         ORDER BY value DESC, event_id) AS INT) AS value_rank
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    GraftQuery("q7_set_ops",
      // set operations (SURVEY §2.6): distinct-buyer key sets of two
      // years combined via INTERSECT / EXCEPT; each leg reduces to
      // counts so the result is a 3-row summary
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        def buyers(y: Int) = o.where(year(col("o_orderdate")) === y)
          .select(col("o_custkey")).distinct()
        val b94 = buyers(1994)
        val b95 = buyers(1995)
        def leg(tag: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_customers"))
            .select(lit(tag).as("bucket"), col("n_customers"))
        leg("both", b94.intersect(b95))
          .unionAll(leg("only_1994", b94.except(b95)))
          .unionAll(leg("only_1995", b95.except(b94)))
      },
      oracle = Some(
        """WITH b94 AS (SELECT DISTINCT o_custkey FROM orders
          |             WHERE year(o_orderdate) = 1994),
          |b95 AS (SELECT DISTINCT o_custkey FROM orders
          |        WHERE year(o_orderdate) = 1995)
          |SELECT 'both' AS bucket, count(*) AS n_customers
          |FROM (SELECT * FROM b94 INTERSECT SELECT * FROM b95)
          |UNION ALL
          |SELECT 'only_1994', count(*)
          |FROM (SELECT * FROM b94 EXCEPT SELECT * FROM b95)
          |UNION ALL
          |SELECT 'only_1995', count(*)
          |FROM (SELECT * FROM b95 EXCEPT SELECT * FROM b94)""".stripMargin)),

    GraftQuery("q8_exists_subquery",
      // the SQL entry point with a correlated EXISTS (TPC-H Q4 shape):
      // Catalyst decorrelates it into a left-semi join — no per-row
      // subquery execution, the plan a hand-written semi join would get
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(
          """SELECT o_orderpriority, count(*) AS order_count
            |FROM orders_v
            |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
            |  AND EXISTS (SELECT 1 FROM lineitem_v
            |              WHERE l_orderkey = o_orderkey
            |                AND l_shipdate > o_orderdate
            |                AND l_discount > 0.05)
            |GROUP BY o_orderpriority""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate
          |                AND l_discount > 0.05)
          |GROUP BY o_orderpriority""".stripMargin)),

    GraftQuery("a8_stats_agg",
      // statistical aggregate surface per group: sample stddev/variance,
      // correlation and covariance between price and quantity (rounded
      // to 4 so both engines' partial-sum association orders agree)
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_extendedprice")), 4).as("var_price"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 4).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 4).as("cov_pq")),
      oracle = Some(
        """SELECT l_returnflag,
          |       round(stddev_samp(l_quantity), 4) AS sd_qty,
          |       round(var_samp(l_extendedprice), 4) AS var_price,
          |       round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
          |       round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_pq
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    GraftQuery("p13_array_ops",
      // higher-order array surface: build per-user sorted event arrays,
      // then transform / filter / aggregate / zip over them — the
      // collection toolkit every complex-typed pipeline leans on
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("value"))).as("vs"))
        .select(col("user_id"),
          size(col("vs")).as("n"),
          round(aggregate(col("vs"), lit(0.0), (acc, v) => acc + v), 6).as("total"),
          size(filter(col("vs"), v => v > 50)).as("n_big"),
          round(element_at(transform(col("vs"), v => v * 2), 1), 6).as("first_doubled"),
          round(aggregate(zip_with(col("vs"), reverse(col("vs")), (a, b) => a * b),
            lit(0.0), (acc, v) => acc + v), 6).as("palindot")),
      oracle = Some(
        """WITH g AS (
          |  SELECT user_id, list_sort(list(value)) AS vs FROM events GROUP BY 1)
          |SELECT user_id,
          |       CAST(len(vs) AS INT) AS n,
          |       round(list_sum(vs), 6) AS total,
          |       CAST(len(list_filter(vs, v -> v > 50)) AS INT) AS n_big,
          |       round(vs[1] * 2, 6) AS first_doubled,
          |       round(list_sum(list_transform(generate_series(1, len(vs)),
          |             i -> vs[i] * vs[len(vs) - i + 1])), 6) AS palindot
          |FROM g""".stripMargin)),

    GraftQuery("q13_bucketed_join",
      // co-located join via bucketed tables: both sides written
      // bucketBy(8, orderkey) + sortBy, so the fact-fact join needs NO
      // exchange and NO sort on either side — at 100 TB the bucketed
      // layout turns every repeated key-join against these tables into
      // a map-side zip of pre-sorted buckets (PlanAuditSpec pins the
      // zero-exchange, zero-sort join plan with broadcast disabled)
      (s, dir) => {
        val wh = Files.createTempDirectory("graft-bkt").toString
        val names = Seq("graft_bkt_orders", "graft_bkt_lineitem")
        names.foreach(n => s.sql(s"DROP TABLE IF EXISTS $n"))
        Tables.load(s, dir, "orders")
          .repartition(8, col("o_orderkey")) // one file per bucket => sorted read
          .write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$wh/orders").mode("overwrite").saveAsTable(names.head)
        Tables.load(s, dir, "lineitem")
          .repartition(8, col("l_orderkey"))
          .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$wh/lineitem").mode("overwrite").saveAsTable(names(1))
        s.table(names.head)
          .join(s.table(names(1)), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")), 2).as("revenue"))
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n_items,
          |       round(sum(l_extendedprice), 2) AS revenue
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |GROUP BY o_orderpriority""".stripMargin)),

    GraftQuery("a18_outliers",
      // Tukey-fence anomaly detection: per-group exact quartiles → IQR
      // bounds (broadcast back — the bounds table is O(groups), never the
      // facts), outliers counted strictly outside the fences. Both
      // engines compute the same interpolated quartiles, so the fences
      // are bit-identical and the strict comparison cannot straddle.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.25)").as("q1"),
            expr("percentile(value, 0.75)").as("q3"))
          .select(col("event_type"),
            (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
            (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
        ev.join(broadcast(bounds), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
              .otherwise(0L)).as("n_outliers"),
            round(first(col("lo")), 6).as("lo"),
            round(first(col("hi")), 6).as("hi"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         quantile_cont(value, 0.25) AS q1,
          |         quantile_cont(value, 0.75) AS q3
          |  FROM events GROUP BY 1),
          |bb AS (
          |  SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo,
          |         q3 + (q3 - q1) * 1.5 AS hi
          |  FROM b)
          |SELECT event_type, count(*) AS n,
          |       sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)::BIGINT
          |         AS n_outliers,
          |       round(any_value(lo), 6) AS lo, round(any_value(hi), 6) AS hi
          |FROM events JOIN bb USING (event_type)
          |GROUP BY event_type""".stripMargin)),

    GraftQuery("a16_cube",
      // full CUBE with grouping_id: all four grouping-set combinations in
      // one pass (Spark expands the cube map-side — one shuffle, not one
      // per grouping set)
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"), (col("user_id") % 4).as("ub"), col("value"))
        .cube(col("event_type"), col("ub"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value")),
      oracle = Some(
        """SELECT event_type, ub, CAST(grouping(event_type, ub) AS INT) AS gid,
          |       count(*) AS n, round(sum(value), 6) AS sum_value
          |FROM (SELECT event_type, user_id % 4 AS ub, value FROM events) t
          |GROUP BY CUBE (event_type, ub)""".stripMargin)),

    GraftQuery("a17_gapfill",
      // time-series resample + gap fill: hourly average of a sparse
      // series, re-gridded onto a dense hour spine, missing hours filled
      // two ways — last-observation-carried-forward and linear
      // interpolation between the bracketing observations. The spine is
      // bounded by the series' own extent so both fills are total.
      // Scale note: the unpartitioned ORDER BY h window is over the
      // spine (≤ hours-of-history rows, ~9k/year), not the events table;
      // a multi-series gapfill would partition the window by series key.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val series = Tables.events(s, dir)
          .where(col("event_type") === "error")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(avg(col("value")).as("v"), count(lit(1)).as("n"))
        val spine = series.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("h"))
        val j = spine.join(series, Seq("h"), "left")
        val back = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
        val fwd = Window.orderBy("h").rowsBetween(0, Window.unboundedFollowing)
        val obsH = when(col("v").isNotNull, col("h"))
        val e = unix_timestamp(col("h")).cast("double")
        val pe = unix_timestamp(col("ph")).cast("double")
        val ne = unix_timestamp(col("nh")).cast("double")
        j.withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
          .withColumn("ph", last(obsH, ignoreNulls = true).over(back))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
          .withColumn("nh", first(obsH, ignoreNulls = true).over(fwd))
          .select(col("h"), coalesce(col("n"), lit(0L)).as("n"),
            round(col("pv"), 6).as("v_locf"),
            round(when(col("v").isNotNull, col("v"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (e - pe) / (ne - pe)), 6).as("v_interp"))
      },
      oracle = Some(
        """WITH s AS (
          |  SELECT date_trunc('hour', ts) AS h, avg(value) AS v, count(*) AS n
          |  FROM events WHERE event_type = 'error' GROUP BY 1),
          |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM s),
          |spine AS (
          |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
          |j AS (SELECT spine.h, s.v, s.n FROM spine LEFT JOIN s USING (h)),
          |f AS (
          |  SELECT h, v, n,
          |    last_value(v IGNORE NULLS) OVER
          |      (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          |      (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
          |    first_value(v IGNORE NULLS) OVER
          |      (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          |      (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
          |  FROM j)
          |SELECT h, coalesce(n, 0)::BIGINT AS n, round(pv, 6) AS v_locf,
          |       round(CASE WHEN v IS NOT NULL THEN v
          |                  ELSE pv + (nv - pv) * (epoch(h) - epoch(ph))
          |                                       / (epoch(nh) - epoch(ph)) END,
          |             6) AS v_interp
          |FROM f""".stripMargin)),

    GraftQuery("a15_histogram",
      // fixed-width histogram: 20 buckets over [0, 100] with explicit
      // edge handling (values at the top edge land in the last bucket)
      // — one map-only bucket expression + one aggregate
      (s, dir) => Tables.events(s, dir)
        .select(least(floor(col("value") / 5.0).cast("int"), lit(19)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(col("bucket"), round(col("bucket") * 5.0, 1).as("lo"),
          round((col("bucket") + 1) * 5.0, 1).as("hi"), col("n")),
      oracle = Some(
        """SELECT bucket, round(bucket * 5.0, 1) AS lo,
          |       round((bucket + 1) * 5.0, 1) AS hi, count(*) AS n
          |FROM (SELECT least(CAST(floor(value / 5.0) AS INT), 19) AS bucket
          |      FROM events) t
          |GROUP BY bucket""".stripMargin)),

    GraftQuery("a36_benford_check",
      // Benford first-digit audit per event type: digit counts in ONE
      // conditional-aggregate pass (map-side partial agg), chi-square
      // against log10(1+1/d) written as the same fixed 9-term
      // left-associative sum in both engines, so the doubles are
      // bit-identical; the df=8 critical value flags deviating streams
      (s, dir) => {
        val cents = round(col("value") * 100, 0).cast("long")
        val digit = substring(cents.cast("string"), 1, 1).cast("int")
        val counts = Tables.events(s, dir)
          .where(cents > 0)
          .select(col("event_type"), digit.as("d"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (1 to 9).map(d => sum(when(col("d") === d, 1L).otherwise(0L))
              .as(s"c$d")): _*)
        val chi2 = (1 to 9).map { d =>
          val exp = col("n") * log10(lit(1.0) + lit(1.0) / d)
          (col(s"c$d") - exp) * (col(s"c$d") - exp) / exp
        }.reduceLeft(_ + _)
        counts.select(col("event_type"), col("n"),
          round(chi2, 6).as("chi2"),
          (chi2 > 15.507).as("deviates"))
      },
      oracle = Some {
        val terms = (1 to 9).map(d =>
          s"(c$d - n * log10(1.0 + 1.0 / $d)) * (c$d - n * log10(1.0 + 1.0 / $d))"
            + s" / (n * log10(1.0 + 1.0 / $d))").mkString(" + ")
        val sums = (1 to 9).map(d =>
          s"sum(CASE WHEN d = $d THEN 1 ELSE 0 END)::BIGINT AS c$d").mkString(", ")
        s"""WITH v AS (
           |  SELECT event_type,
           |    substr(CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR), 1, 1)::INT AS d
           |  FROM events WHERE CAST(round(value * 100, 0) AS BIGINT) > 0),
           |c AS (SELECT event_type, count(*) AS n, $sums FROM v GROUP BY event_type)
           |SELECT event_type, n, round($terms, 6) AS chi2,
           |       ($terms) > 15.507 AS deviates
           |FROM c""".stripMargin
      }),

    GraftQuery("a37_ks_drift",
      // two-sample Kolmogorov-Smirnov drift test per event type (user
      // shards A/B): D = max|F1-F2| computed as the INTEGER
      // max|c1*n2 - c2*n1| over the pooled value grid — the whole
      // statistic is exact arithmetic, no float ECDFs; the 5% critical
      // value only enters the final flag. Counts partial-aggregate per
      // (type, value) before the per-type window pass.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          (col("user_id") % 2 === 0).as("in_a"))
        val counts = ev.groupBy(col("event_type"), col("cents"))
          .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
        val byType = Window.partitionBy(col("event_type"))
        val w = byType.orderBy(col("cents"))
        val cum = counts
          .withColumn("cum_a", sum(col("ca")).over(w))
          .withColumn("cum_b", sum(col("cb")).over(w))
          .withColumn("n1", sum(col("ca")).over(byType))
          .withColumn("n2", sum(col("cb")).over(byType))
        cum.groupBy(col("event_type"))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            max(abs(col("cum_a") * col("n2") - col("cum_b") * col("n1")))
              .as("d_num"))
          .select(col("event_type"), col("n1"), col("n2"), col("d_num"),
            round(col("d_num").cast("double") / (col("n1") * col("n2")), 6)
              .as("ks"),
            (col("d_num").cast("double") / (col("n1") * col("n2")) >
              lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
                / (col("n1") * col("n2")))).as("drifted"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_type,
          |         CAST(round(value * 100, 0) AS BIGINT) AS cents,
          |         (user_id % 2 = 0) AS in_a
          |  FROM events),
          |counts AS (
          |  SELECT event_type, cents,
          |         sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS ca,
          |         sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS cb
          |  FROM ev GROUP BY 1, 2),
          |cum AS (
          |  SELECT event_type,
          |         sum(ca) OVER (PARTITION BY event_type ORDER BY cents) AS cum_a,
          |         sum(cb) OVER (PARTITION BY event_type ORDER BY cents) AS cum_b,
          |         sum(ca) OVER (PARTITION BY event_type) AS n1,
          |         sum(cb) OVER (PARTITION BY event_type) AS n2
          |  FROM counts),
          |agg AS (
          |  SELECT event_type, max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
          |         max(abs(cum_a * n2 - cum_b * n1))::BIGINT AS d_num
          |  FROM cum GROUP BY event_type)
          |SELECT event_type, n1, n2, d_num,
          |       round(d_num::DOUBLE / (n1 * n2), 6) AS ks,
          |       (d_num::DOUBLE / (n1 * n2) >
          |        1.358 * sqrt((n1 + n2)::DOUBLE / (n1 * n2))) AS drifted
          |FROM agg""".stripMargin)),

    GraftQuery("a38_mad_outliers",
      // robust outlier detection per event type: median absolute
      // deviation instead of a18's moment-based z-scores (one planted
      // extreme value corrupts a stddev but not a median). All medians
      // interpolate exact integer cents (exact halves/quarters in
      // IEEE), so both engines derive identical thresholds; the 3σ
      // equivalent 3·1.4826 enters as one constant product.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val med = ev.groupBy(col("event_type"))
          .agg(expr("percentile(cents, 0.5D)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("d", abs(col("cents") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(d, 0.5D)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(max(col("med")), 4).as("med_cents"),
            round(max(col("mad")), 4).as("mad_cents"),
            sum(when(col("d") > col("mad") * 4.4478, 1L).otherwise(0L))
              .as("n_outliers"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
          |  FROM events),
          |med AS (
          |  SELECT event_type, quantile_cont(cents, 0.5) AS med
          |  FROM ev GROUP BY 1),
          |dev AS (
          |  SELECT ev.event_type, cents, abs(cents - med) AS d
          |  FROM ev JOIN med USING (event_type)),
          |mad AS (
          |  SELECT event_type, quantile_cont(d, 0.5) AS mad
          |  FROM dev GROUP BY 1)
          |SELECT d.event_type, count(*) AS n,
          |       round(max(m2.med), 4) AS med_cents,
          |       round(max(m.mad), 4) AS mad_cents,
          |       sum(CASE WHEN d.d > m.mad * 4.4478 THEN 1 ELSE 0 END)::BIGINT
          |         AS n_outliers
          |FROM dev d JOIN mad m USING (event_type) JOIN med m2 USING (event_type)
          |GROUP BY 1""".stripMargin)),

    GraftQuery("a40_gini",
      // value-concentration audit per event type: the Gini coefficient
      // from the sorted-rank identity G = (2·Σi·xᵢ − (n+1)·Σxᵢ)/(n·Σxᵢ)
      // — every term integer cents, ties rank-order-invariant, one
      // division at the end. The corpus-domination metric ("how skewed
      // is spend/token mass across items") in exact arithmetic.
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .where(col("cents") >= 0)
          .withColumn("i", row_number().over(w).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("total_cents"),
            sum(col("i") * col("cents")).as("iwx"))
          .select(col("event_type"), col("n"), col("total_cents"),
            round((lit(2) * col("iwx") - (col("n") + 1) * col("total_cents"))
              .cast("double") / (col("n") * col("total_cents")), 6).as("gini"))
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT event_type, event_id,
          |         CAST(round(value * 100, 0) AS BIGINT) AS cents
          |  FROM events
          |  WHERE CAST(round(value * 100, 0) AS BIGINT) >= 0),
          |r AS (
          |  SELECT event_type, cents,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY cents, event_id) AS i
          |  FROM v),
          |a AS (
          |  SELECT event_type, count(*) AS n,
          |         sum(cents)::BIGINT AS total_cents,
          |         sum(i * cents)::BIGINT AS iwx
          |  FROM r GROUP BY 1)
          |SELECT event_type, n, total_cents,
          |       round((2 * iwx - (n + 1) * total_cents)::DOUBLE
          |             / (n * total_cents), 6) AS gini
          |FROM a""".stripMargin)),

    GraftQuery("a13_data_profile",
      // data-quality profile in ONE pass over the table: per-column
      // null counts, ranges, and exact distinct cardinalities from a
      // single aggregate (no per-column re-scan)
      (s, dir) => Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
        sum(col("o_orderpriority").isNull.cast("long")).as("null_priority"),
        count_distinct(col("o_custkey")).as("distinct_custkey"),
        count_distinct(col("o_orderstatus")).as("distinct_status"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date")),
      oracle = Some(
        """SELECT count(*) AS n_rows,
          |       sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_custkey,
          |       sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_priority,
          |       count(DISTINCT o_custkey) AS distinct_custkey,
          |       count(DISTINCT o_orderstatus) AS distinct_status,
          |       round(min(o_totalprice), 2) AS min_price,
          |       round(max(o_totalprice), 2) AS max_price,
          |       min(o_orderdate) AS min_date,
          |       max(o_orderdate) AS max_date
          |FROM orders""".stripMargin)),

    GraftQuery("a14_uniqueness_check",
      // dbt-style constraint check as a query: keys violating a
      // uniqueness expectation, with their multiplicity — built from
      // lineitem's naturally repeating l_orderkey (a real table whose
      // "unique" assumption fails), empty output would mean the
      // constraint holds
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_dupes"))
        .where(col("n_dupes") > 1),
      oracle = Some(
        """SELECT l_orderkey, count(*) AS n_dupes
          |FROM lineitem GROUP BY l_orderkey
          |HAVING count(*) > 1""".stripMargin)),

    GraftQuery("q22_sole_late_supplier",
      // TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
      // multi-supplier finished order — the dual-correlated
      // EXISTS / NOT-EXISTS pattern. Spark-side it decomposes into two
      // hash aggregations (per-(order,supplier) lateness, then per-order
      // counts) + a broadcast dimension join — no correlated re-scan of
      // lineitem; the oracle keeps the literal EXISTS formulation.
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val l = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL '60' DAY"), 1).otherwise(0))
            .as("late"))
        val soleLate = perSupp.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"),
            max(when(col("late") === 1, col("l_suppkey"))).as("sole_supp"))
          .where(col("n_supp") > 1 && col("n_late") === 1)
        soleLate.groupBy(col("sole_supp")).agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables.load(s, dir, "supplier")),
            col("sole_supp") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
      },
      oracle = Some(
        """WITH late AS (
          |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  WHERE o.o_orderstatus = 'F'
          |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
          |SELECT s.s_name, count(*) AS numwait
          |FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
          |WHERE EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM late l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey)
          |GROUP BY s.s_name""".stripMargin)),

    GraftQuery("q23_disjunctive_scan",
      // TPC-H Q19 shape: OR of three conjunctive branches mixing both
      // join sides' predicates. The filter can only evaluate AFTER the
      // join, but each branch implies a per-table weakening — brand in
      // the union of brands, quantity in the union of ranges — which is
      // pushed manually so both scans prune before the shuffle (Spark
      // leaves cross-table disjunctions as post-join filters; the
      // explicit weakened predicates are what a 100 TB scan needs, and
      // the plan audit pins them reaching the parquet readers)
      (s, dir) => {
        val branches = Seq(
          ("Brand#1", 5, 1.0, 11.0), ("Brand#2", 10, 10.0, 20.0),
          ("Brand#3", 15, 20.0, 30.0))
        val p = Tables.load(s, dir, "part")
          .where(col("p_brand").isin(branches.map(_._1): _*) &&
            col("p_size") <= branches.map(_._2).max && col("p_size") >= 1)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val l = Tables.load(s, dir, "lineitem")
          .where(col("l_quantity") >= branches.map(_._3).min &&
            col("l_quantity") <= branches.map(_._4).max)
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
        val full = branches.map { case (b, sz, qlo, qhi) =>
          col("p_brand") === b && col("p_size").between(1, sz) &&
            col("l_quantity").between(qlo, qhi)
        }.reduce(_ || _)
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .where(full)
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      oracle = Some(
        """SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
          |       count(*) AS n_lines
          |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
          |       AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
          |       AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    GraftQuery("q24_count_distribution",
      // TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
      // zero-order customers — the left-outer + conditional-count +
      // count-of-counts double aggregation. The outer join preserves
      // customers with no qualifying orders (c_count = 0 bucket); both
      // aggregations partial-combine map-side
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").select(col("c_custkey"))
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      oracle = Some(
        """SELECT c_count, count(*) AS custdist FROM (
          |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          |  FROM customer c LEFT OUTER JOIN orders o
          |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          |  GROUP BY c.c_custkey) t
          |GROUP BY c_count""".stripMargin)),

    GraftQuery("q12_having",
      // aggregate-predicate filtering (HAVING): frequent buyers only —
      // the filter runs on the aggregated row, after the hash aggregate
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
        .where(col("n_orders") >= 5),
      oracle = Some(
        """SELECT o_custkey, count(*) AS n_orders,
          |       round(sum(o_totalprice), 2) AS total_spend
          |FROM orders GROUP BY o_custkey
          |HAVING count(*) >= 5""".stripMargin)),

    GraftQuery("q14_full_outer",
      // FULL OUTER reconciliation of two independent per-customer
      // aggregates (orders spend vs lineitem quantity joined through
      // orders): unmatched sides surface with NULL-coalesced defaults —
      // the audit-join shape (which customers ordered but shipped
      // nothing this window, and vice versa)
      (s, dir) => {
        val spend = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") < to_timestamp(lit("1995-01-01")))
          .groupBy(col("o_custkey").as("custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("early_spend"))
        val late = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01")))
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("late_orders"))
        spend.join(late, Seq("custkey"), "full_outer")
          .select(col("custkey"),
            coalesce(col("early_spend"), lit(0.0)).as("early_spend"),
            coalesce(col("late_orders"), lit(0L)).as("late_orders"),
            (col("early_spend").isNotNull && col("late_orders").isNotNull)
              .as("in_both"))
      },
      oracle = Some(
        """WITH spend AS (
          |  SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS early_spend
          |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
          |  GROUP BY 1),
          |late AS (
          |  SELECT o_custkey AS custkey, count(*) AS late_orders
          |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  GROUP BY 1)
          |SELECT coalesce(spend.custkey, late.custkey) AS custkey,
          |       coalesce(early_spend, 0.0) AS early_spend,
          |       coalesce(late_orders, 0)::BIGINT AS late_orders,
          |       spend.custkey IS NOT NULL AND late.custkey IS NOT NULL AS in_both
          |FROM spend FULL OUTER JOIN late ON spend.custkey = late.custkey""".stripMargin)),

    GraftQuery("q10_promo_share",
      // TPC-H Q14 shape: conditional-sum ratio over a fact-to-dim join —
      // the part side is broadcast, the ratio of the two sums rounds at
      // 4 places so summation order cannot surface
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
          .where(col("l_shipdate") >= to_timestamp(lit("1995-06-01")) &&
            col("l_shipdate") < to_timestamp(lit("1995-09-01")))
        val p = Tables.load(s, dir, "part")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))) /
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("promo_revenue_pct"))
      },
      oracle = Some(
        """SELECT round(100.0 *
          |       sum(CASE WHEN p_type = 'PROMO'
          |                THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
          |       sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1995-09-01 00:00:00'""".stripMargin)),

    GraftQuery("q11_multi_predicate_join",
      // TPC-H Q19 shape: disjunctive multi-predicate join (brand ×
      // size-range × quantity-range) — the OR of conjuncts must still
      // push the part filters below the join
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val p = Tables.load(s, dir, "part")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .where(
            (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 35)))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      oracle = Some(
        """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity BETWEEN 1 AND 20)
          |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
          |       AND l_quantity BETWEEN 10 AND 35)""".stripMargin)),

    GraftQuery("a12_group_quantiles",
      // exact interpolated per-group quantiles (median + p90): Spark's
      // percentile and DuckDB's quantile_cont share the interpolation
      // definition, so values match to the rounding digit
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("median_value"),
          round(expr("percentile(value, 0.9)"), 6).as("p90_value"),
          count(lit(1)).as("n")),
      oracle = Some(
        """SELECT event_type,
          |       round(quantile_cont(value, 0.5), 6) AS median_value,
          |       round(quantile_cont(value, 0.9), 6) AS p90_value,
          |       count(*) AS n
          |FROM events GROUP BY event_type""".stripMargin)),

    GraftQuery("w6_range_frame",
      // RANGE (value-interval) window frame: per-user trailing-hour
      // event count and value sum, ordered by epoch seconds — peers at
      // the same second enter the frame together in both engines
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-3600, 0)
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_last_hour"),
          round(sum("value").over(w), 6).as("sum_last_hour"))
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       count(*) OVER w AS n_last_hour,
          |       round(sum(value) OVER w, 6) AS sum_last_hour
          |FROM (SELECT user_id, event_id, value,
          |             -- floor to whole seconds: Spark's unix_timestamp
          |             -- truncates, and DuckDB's epoch() keeps
          |             -- fractional seconds — an event pair ~3600.x s
          |             -- apart would otherwise frame differently
          |             CAST(floor(epoch(make_timestamp(epoch_ns(ts)//1000)))
          |                  AS BIGINT) AS es
          |      FROM events) t
          |WINDOW w AS (PARTITION BY user_id ORDER BY es
          |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin)),

    GraftQuery("a11_funnel",
      // ordered funnel: users who viewed, then clicked AFTER their first
      // view, then purchased AFTER that click — each stage joins the
      // previous stage's anchor timestamp, so ordering is enforced, not
      // just co-occurrence
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val v = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
        val c = ev.where(col("event_type") === "click").as("e")
          .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
            col("e.ts") > col("v.tv"))
          .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.ts")).as("tc"))
        val p = ev.where(col("event_type") === "purchase").as("e")
          .join(c.as("c"), col("e.user_id") === col("c.user_id") &&
            col("e.ts") > col("c.tc"))
          .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.ts")).as("tp"))
        def stage(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
        stage("1_viewed", v)
          .unionAll(stage("2_then_clicked", c))
          .unionAll(stage("3_then_purchased", p))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT user_id, event_type, make_timestamp(epoch_ns(ts)//1000) AS ts
          |  FROM events),
          |v AS (SELECT user_id, min(ts) AS tv FROM ev
          |      WHERE event_type = 'view' GROUP BY 1),
          |c AS (SELECT e.user_id, min(e.ts) AS tc
          |      FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
          |      WHERE e.event_type = 'click' GROUP BY 1),
          |p AS (SELECT e.user_id, min(e.ts) AS tp
          |      FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
          |      WHERE e.event_type = 'purchase' GROUP BY 1)
          |SELECT '1_viewed' AS stage, count(*) AS n_users FROM v
          |UNION ALL SELECT '2_then_clicked', count(*) FROM c
          |UNION ALL SELECT '3_then_purchased', count(*) FROM p""".stripMargin)),

    GraftQuery("q9_scalar_subquery",
      // scalar subquery in a predicate: Catalyst evaluates the subquery
      // once and broadcasts the scalar into the filter (the threshold is
      // max-based — exact in both engines, no float-sum boundary risk)
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v2")
        s.sql(
          """SELECT o_orderpriority, count(*) AS n
            |FROM orders_v2
            |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders_v2) * 0.5
            |GROUP BY o_orderpriority""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders
          |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
          |GROUP BY o_orderpriority""".stripMargin)),

    GraftQuery("q15_correlated_min",
      // CORRELATED scalar subquery (q9 is uncorrelated): keep each
      // part's cheapest lineitem rows — Catalyst must decorrelate the
      // per-part min into an aggregate + join, not evaluate the
      // subquery per row
      (s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_q15")
        s.sql(
          """SELECT l_partkey, count(*) AS n_at_min,
            |       round(min(l_extendedprice), 2) AS min_price
            |FROM lineitem_q15 l
            |WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
            |                         FROM lineitem_q15 l2
            |                         WHERE l2.l_partkey = l.l_partkey)
            |GROUP BY l_partkey""".stripMargin)
      },
      oracle = Some(
        """SELECT l_partkey, count(*) AS n_at_min,
          |       round(min(l_extendedprice), 2) AS min_price
          |FROM lineitem l
          |WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
          |                         FROM lineitem l2
          |                         WHERE l2.l_partkey = l.l_partkey)
          |GROUP BY l_partkey""".stripMargin)),

    GraftQuery("q25_mincost_supplier",
      // TPC-H Q2 shape: min-cost regional supplier per part. The supply
      // relation is derived from lineitem (min unit price per
      // part×supplier — identical multisets give identical IEEE minima
      // in both engines, so the correlated-min equality is exact). The
      // correlated subquery re-filters by region — Catalyst decorrelates
      // it into an aggregate + join instead of per-row re-execution; the
      // dim chain (supplier⋈nation⋈region) broadcasts.
      (s, dir) => {
        Tables.load(s, dir, "part").createOrReplaceTempView("part_v")
        Tables.load(s, dir, "supplier").createOrReplaceTempView("supplier_v")
        Tables.load(s, dir, "nation").createOrReplaceTempView("nation_v")
        Tables.load(s, dir, "region").createOrReplaceTempView("region_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(q25Sql("part_v", "supplier_v", "nation_v", "region_v", "lineitem_v"))
      },
      oracle = Some(q25Sql("part", "supplier", "nation", "region", "lineitem"))),

    GraftQuery("q26_dominant_supplier",
      // TPC-H Q20 shape: suppliers holding a dominant share of some
      // part's filtered-year shipments — a correlated scalar aggregate
      // inside HAVING, compared against the group's own aggregate.
      // Quantities are integer-valued doubles, so both sums and the
      // 0.3× threshold are exact in both engines. Catalyst decorrelates
      // the inner sum into a per-part aggregate joined on the group key.
      (s, dir) => {
        Tables.load(s, dir, "supplier").createOrReplaceTempView("supplier_v")
        Tables.load(s, dir, "part").createOrReplaceTempView("part_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(q26Sql("supplier_v", "part_v", "lineitem_v"))
      },
      oracle = Some(q26Sql("supplier", "part", "lineitem"))),

    GraftQuery("q27_nation_volume",
      // TPC-H Q7 shape: bilateral shipping volume between two nations by
      // year — a 5-way join where the two nation legs must stay on
      // opposite sides (supplier's vs customer's), then a year rollup.
      // Both nation dims broadcast; the fact-fact join shuffles once on
      // orderkey. Prices are integer-cent-valued doubles but the sums
      // are rounded anyway (summation order differs across engines).
      (s, dir) => {
        Seq("supplier", "lineitem", "orders", "customer", "nation")
          .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(s"${t}_v"))
        s.sql(q27Sql("_v"))
      },
      oracle = Some(q27Sql(""))),

    GraftQuery("q28_market_share",
      // TPC-H Q8 shape: one nation's share of a region's yearly import
      // volume — conditional-sum ratio over a 6-way join. The CASE'd
      // numerator and the denominator aggregate in ONE pass (no second
      // join), and every dim leg broadcasts.
      (s, dir) => {
        Seq("part", "supplier", "lineitem", "orders", "customer",
          "nation", "region")
          .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(s"${t}_v"))
        s.sql(q28Sql("_v"))
      },
      oracle = Some(q28Sql(""))),

    GraftQuery("q29_idle_accounts",
      // TPC-H Q22 shape: above-average-balance customers with no
      // orders, grouped by a derived code — an uncorrelated scalar
      // aggregate threshold plus a null-safe NOT EXISTS anti join.
      // Boundary exactness: both engines average the same multiset
      // (order differs only in the last ulps, far from any balance).
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_v")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql(q29Sql("_v"))
      },
      oracle = Some(q29Sql(""))),

    GraftQuery("q30_returned_revenue",
      // TPC-H Q10 shape: top-20 customers by revenue lost to returns.
      // The global top-k runs as a TakeOrdered over the aggregate, and
      // the order key is the ROUNDED revenue + custkey so the cutoff is
      // deterministic across engines (raw float sums differ in
      // summation order near ties).
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_v")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(q30Sql("_v"))
      },
      oracle = Some(q30Sql(""))),

    GraftQuery("q31_top_supplier",
      // TPC-H Q15 shape: the supplier(s) achieving the maximum revenue
      // in a quarter — an aggregate view consumed twice (once for the
      // per-supplier totals, once reduced to its max) with equality on
      // the ROUNDED total, so the float compare is engine-portable.
      (s, dir) => {
        Tables.load(s, dir, "supplier").createOrReplaceTempView("supplier_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(q31Sql("_v"))
      },
      oracle = Some(q31Sql(""))),

    GraftQuery("q32_small_order_share",
      // TPC-H Q17 shape: revenue locked in orders below a fifth of the
      // part's average quantity — a correlated scalar AVG threshold
      // Catalyst must decorrelate into a per-part aggregate join.
      // Quantities are integer-valued, so the 0.2×avg boundary sits far
      // from any quantity in ulp terms in both engines.
      (s, dir) => {
        Tables.load(s, dir, "part").createOrReplaceTempView("part_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(q32Sql("_v"))
      },
      oracle = Some(q32Sql(""))),

    GraftQuery("q33_nation_profit",
      // TPC-H Q9 shape: profit by supplier nation and year, with the
      // supply cost derived from lineitem exactly as q25 does (identical
      // multiset minima are bit-equal across engines, so the amount
      // expression is the same IEEE arithmetic on both sides). The
      // Spark plan computes the per-(partkey, suppkey) min as a WINDOW
      // over lineitem instead of the oracle's aggregate-then-self-join:
      // ONE fact shuffle replaces two (the group-by exchange AND the
      // join-back exchange of the whole fact) — measured 4.7× faster at
      // the 100× tier (50 s → 5 s), the knee the second-decade exponent
      // caught in r13. Same multiset min per group ⇒ bit-equal amounts.
      //
      // r17: the selective part filter (`p_name LIKE '%bolt%'`, ~1/17 of
      // parts) applies BELOW the window. Legal because p_partkey is
      // part's key, so the broadcast join keeps either ALL lineitem rows
      // of a partkey or none — the per-(l_partkey, l_suppkey) min over
      // the kept rows is the min over the same unfiltered multiset,
      // bit-equal. The window exchange+sort now carries only bolt
      // lineitems: at the 100× tier this removed the plan's 4.7 GB sort
      // spill and cut the fact exchange ~17× (guide §2.3/§2.4).
      // One more measured 100×-tier cut (guide §2.3): the orders side
      // projects year(o_orderdate) BEFORE its exchange (an int per
      // order instead of a timestamp, computed once per order rather
      // than per joined row; 5.5 → 4.3 s in the A/B). A SHUFFLE_HASH
      // hint on the same join was ALSO tried and measured neutral vs
      // the sort-merge (4.3 vs 4.2 s min-of-3 at 100×) once properly
      // resolved, so the scale-safer default strategy stays (guide
      // §3.1: pick deliberately — and keep what measurement supports).
      (s, dir) => {
        Seq("part", "supplier", "lineitem", "orders", "nation")
          .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(s"${t}_v"))
        s.sql(
          """SELECT n_name, o_year, round(sum(amount), 2) AS profit
            |FROM (
            |  SELECT n_name, o_year,
            |         l_extendedprice * (1 - l_discount)
            |           - cost * l_quantity AS amount
            |  FROM supplier_v,
            |       (SELECT l_suppkey, l_orderkey, l_quantity,
            |               l_extendedprice, l_discount,
            |               min(l_extendedprice / l_quantity)
            |                 OVER (PARTITION BY l_partkey, l_suppkey) AS cost
            |        FROM lineitem_v, part_v
            |        WHERE p_partkey = l_partkey
            |          AND p_name LIKE '%bolt%') priced,
            |       (SELECT o_orderkey, year(o_orderdate) AS o_year
            |        FROM orders_v) o,
            |       nation_v
            |  WHERE s_suppkey = l_suppkey
            |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey) profit
            |GROUP BY n_name, o_year""".stripMargin)
      },
      oracle = Some(q33Sql("")),
      headline = true),

    GraftQuery("g1_pagerank",
      // iterative graph computation: 5 PageRank rounds over a
      // deterministic link graph derived from events; the oracle unrolls
      // the same five iterations as chained CTEs, so every double is the
      // same IEEE expression in both engines (teleport/damping computed,
      // not re-parsed)
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          ((col("user_id") * 7 + col("event_id") % 13) % 100).as("dst"))
        graft.operators.GraphOps.pageRank(edges, iterations = 5)
          .select(col("id"), round(col("rank"), 6).as("rank"))
      },
      oracle = Some {
        val iter = (i: Int) =>
          s"""r$i AS (
             |  SELECT nodes.id,
             |         (1 - 0.85) / params.n + 0.85 * coalesce(c.contrib, 0.0) AS rank
             |  FROM nodes CROSS JOIN params LEFT JOIN (
             |    SELECT e.dst AS id, sum(r${i - 1}.rank / deg.deg) AS contrib
             |    FROM edges e
             |    JOIN r${i - 1} ON e.src = r${i - 1}.id
             |    JOIN deg ON e.src = deg.src
             |    GROUP BY 1) c ON nodes.id = c.id)"""
        ("""WITH edges AS (
           |  SELECT DISTINCT user_id AS src,
           |         (user_id * 7 + event_id % 13) % 100 AS dst
           |  FROM events),
           |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
           |params AS (SELECT count(*)::DOUBLE AS n FROM nodes),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
           |r0 AS (SELECT id, 1.0 / params.n AS rank FROM nodes CROSS JOIN params),
           |""" + (1 to 5).map(iter).mkString(",\n") +
          "\nSELECT id, round(rank, 6) AS rank FROM r5").stripMargin
      }),

    GraftQuery("g10_weighted_pagerank",
      // weighted PageRank over the g1 link graph with deterministic
      // integer edge weights ((src+dst)%5+1): rank flows proportional
      // to weight. The oracle unrolls the identical 4 rounds with the
      // same contrib expression `rank * w / W`, so every double is the
      // same IEEE arithmetic in both engines
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          ((col("user_id") * 7 + col("event_id") % 13) % 100).as("dst"))
          .distinct()
          .withColumn("weight", (col("src") + col("dst")) % 5 + 1)
        graft.operators.GraphOps.weightedPageRank(edges, iterations = 4)
          .select(col("id"), round(col("rank"), 6).as("rank"))
      },
      oracle = Some {
        val iter = (i: Int) =>
          s"""r$i AS (
             |  SELECT nodes.id,
             |         (1 - 0.85) / params.n + 0.85 * coalesce(c.contrib, 0.0) AS rank
             |  FROM nodes CROSS JOIN params LEFT JOIN (
             |    SELECT e.dst AS id, sum(r${i - 1}.rank * e.w / wo.wout) AS contrib
             |    FROM edges e
             |    JOIN r${i - 1} ON e.src = r${i - 1}.id
             |    JOIN wo ON e.src = wo.src
             |    GROUP BY 1) c ON nodes.id = c.id)"""
        ("""WITH e0 AS (
           |  SELECT DISTINCT user_id AS src,
           |         (user_id * 7 + event_id % 13) % 100 AS dst
           |  FROM events),
           |edges AS (
           |  SELECT src, dst, ((src + dst) % 5 + 1)::DOUBLE AS w FROM e0),
           |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
           |params AS (SELECT count(*)::DOUBLE AS n FROM nodes),
           |wo AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1),
           |r0 AS (SELECT id, 1.0 / params.n AS rank FROM nodes CROSS JOIN params),
           |""" + (1 to 4).map(iter).mkString(",\n") +
          "\nSELECT id, round(rank, 6) AS rank FROM r4").stripMargin
      }),

    GraftQuery("g6_hits",
      // HITS hub/authority over the g1 link graph, 2 rounds with L2
      // normalization after each half-step; the oracle unrolls the
      // identical pulls and normalizers as chained CTEs so every double
      // is the same IEEE expression in both engines
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          ((col("user_id") * 7 + col("event_id") % 13) % 100).as("dst"))
        graft.operators.GraphOps.hits(edges, iterations = 2)
          .select(col("id"), round(col("hub"), 6).as("hub"),
            round(col("auth"), 6).as("auth"))
      },
      oracle = Some(hitsOracleSql(2))),

    GraftQuery("g7_personalized_pagerank",
      // random walk with restart: teleport mass returns to the seed set
      // {0,20,40,60,80}∩nodes instead of spreading uniformly — the
      // seed-expansion primitive. Same unrolled-CTE oracle discipline
      // as g1: the (1-0.85) teleport factor is computed in-engine on
      // both sides so every double is the same IEEE expression
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          ((col("user_id") * 7 + col("event_id") % 13) % 100).as("dst"))
        val seeds = s.range(0, 100, 20).select(col("id"))
        graft.operators.GraphOps.personalizedPageRank(edges, seeds,
          iterations = 5)
          .select(col("id"), round(col("rank"), 6).as("rank"))
      },
      oracle = Some {
        val iter = (i: Int) =>
          s"""r$i AS (
             |  SELECT tele.id,
             |         (1 - 0.85) * tele.t + 0.85 * coalesce(c.contrib, 0.0) AS rank
             |  FROM tele LEFT JOIN (
             |    SELECT e.dst AS id, sum(r${i - 1}.rank / deg.deg) AS contrib
             |    FROM edges e
             |    JOIN r${i - 1} ON e.src = r${i - 1}.id
             |    JOIN deg ON e.src = deg.src
             |    GROUP BY 1) c ON tele.id = c.id)"""
        ("""WITH edges AS (
           |  SELECT DISTINCT user_id AS src,
           |         (user_id * 7 + event_id % 13) % 100 AS dst
           |  FROM events),
           |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
           |params AS (
           |  SELECT count(*)::DOUBLE AS ns FROM nodes
           |  WHERE id % 20 = 0 AND id < 100),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
           |tele AS (
           |  SELECT nodes.id,
           |         CASE WHEN nodes.id % 20 = 0 AND nodes.id < 100
           |              THEN 1.0 / params.ns ELSE 0.0 END AS t
           |  FROM nodes CROSS JOIN params),
           |r0 AS (SELECT id, t AS rank FROM tele),
           |""" + (1 to 5).map(iter).mkString(",\n") +
          "\nSELECT id, round(rank, 6) AS rank FROM r5").stripMargin
      }),

    GraftQuery("g2_components",
      // connected components to fixpoint over an undirected link graph
      // constructed so edges stay within user-id decades (≥ several
      // components, not one giant blob); the oracle computes min
      // reachable label via a recursive CTE over the same closure
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.connectedComponents(edges)
      },
      oracle = Some(
        """WITH RECURSIVE
          |edges0 AS (
          |  SELECT DISTINCT user_id AS src,
          |         user_id - user_id % 10 + event_id % 10 AS dst
          |  FROM events),
          |sym AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
          |nodes AS (SELECT DISTINCT src AS id FROM sym),
          |reach(a, b) AS (
          |  SELECT id, id FROM nodes
          |  UNION
          |  SELECT r.a, e.dst FROM reach r JOIN sym e ON r.b = e.src)
          |SELECT a AS id, min(b) AS comp FROM reach GROUP BY a""".stripMargin)),

    GraftQuery("g8_label_propagation",
      // synchronous mode-label propagation (3 rounds) over the
      // decade-local graph g2 uses — communities, not components: the
      // most-frequent-neighbor-label update splits each connected
      // decade into its dense cores. Deterministic (synchronous rounds,
      // (cnt desc, label asc) tie-break), so the oracle unrolls the
      // identical rounds as chained CTEs
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.labelPropagation(edges, rounds = 3)
      },
      oracle = Some {
        val round = (i: Int) =>
          s"""l$i AS (
             |  SELECT n.id, coalesce(t.nlabel, n.id) AS label
             |  FROM nodes n LEFT JOIN (
             |    SELECT nid, label AS nlabel FROM (
             |      SELECT c.nid, c.label,
             |             row_number() OVER (PARTITION BY c.nid
             |                                ORDER BY c.cnt DESC, c.label) AS rn
             |      FROM (SELECT s.dst AS nid, l.label, count(*) AS cnt
             |            FROM sym s JOIN l${i - 1} l ON s.src = l.id
             |            GROUP BY s.dst, l.label) c) x
             |    WHERE rn = 1) t ON n.id = t.nid)"""
        ("""WITH e0 AS (
           |  SELECT DISTINCT user_id AS src,
           |         user_id - user_id % 10 + event_id % 10 AS dst
           |  FROM events
           |  WHERE user_id <> user_id - user_id % 10 + event_id % 10),
           |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |nodes AS (SELECT DISTINCT src AS id FROM sym),
           |l0 AS (SELECT id, id AS label FROM nodes),
           |""" + (1 to 3).map(round).mkString(",\n") +
          "\nSELECT id, label FROM l3").stripMargin
      }),

    GraftQuery("g9_adamic_adar",
      // Adamic-Adar link prediction over a SPARSIFIED decade-link graph
      // (every 4th event — at full density the decade cliques complete
      // and no non-adjacent pair remains): score every non-adjacent
      // pair with >= 2 rare shared neighbors. Wedge enumeration (never
      // all-pairs), hub centers excluded by the maxDegree bound; oracle
      // replays the identical wedge + anti-join
      (s, dir) => {
        val edges = Tables.load(s, dir, "events")
          .where(col("event_id") % 4 === 0)
          .select(col("user_id").as("src"),
            (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.adamicAdar(edges, maxDegree = 10000)
          .where(col("common") >= 2)
      },
      oracle = Some(
        """WITH e0 AS (
          |  SELECT user_id AS src,
          |         user_id - user_id % 10 + event_id % 10 AS dst
          |  FROM events WHERE event_id % 4 = 0),
          |sym AS (
          |  SELECT DISTINCT src, dst FROM
          |    (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0) u
          |  WHERE src <> dst),
          |deg AS (SELECT src AS n, count(*) AS deg FROM sym GROUP BY src),
          |centers AS (
          |  SELECT s.src AS n, s.dst AS leaf, d.deg
          |  FROM sym s JOIN deg d ON d.n = s.src
          |  WHERE d.deg <= 10000),
          |cand AS (
          |  SELECT x.leaf AS a, y.leaf AS b, x.deg AS deg
          |  FROM centers x JOIN centers y ON x.n = y.n AND x.leaf < y.leaf),
          |nonadj AS (
          |  SELECT a, b, deg FROM cand c
          |  WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.src = c.a AND s.dst = c.b))
          |SELECT a, b, count(*) AS common,
          |       round(sum(1.0 / ln(deg)), 6) AS aa_score
          |FROM nonadj GROUP BY a, b
          |HAVING count(*) >= 2""".stripMargin)),

    GraftQuery("g11_assortativity",
      // degree assortativity of the SPARSIFIED decade graph (every 4th
      // event, like g9 — at full density the cliques complete, every
      // degree equals 9 and the variance degenerates): Pearson
      // correlation of endpoint degrees over directed edge-ends —
      // every Σ is an integer, so the statistic reduces to one exact
      // fraction with a final sqrt both engines evaluate on identical
      // doubles. NULL when a degenerate graph has zero degree variance.
      (s, dir) => {
        val e0 = Tables.load(s, dir, "events")
          .where(col("event_id") % 4 === 0)
          .select(col("user_id").as("src"),
            (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
          .where(col("src") =!= col("dst")).distinct()
        val sym = e0.unionByName(
          e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        val deg = sym.groupBy(col("src").as("n")).agg(count(lit(1)).as("deg"))
        val ends = sym
          .join(deg.select(col("n").as("src"), col("deg").as("x")), "src")
          .join(deg.select(col("n").as("dst"), col("deg").as("y")), "dst")
        ends.agg(count(lit(1)).as("n_ends"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n_ends"),
            round(when(
              (col("n_ends") * col("sxx") - col("sx") * col("sx")) > 0 &&
                (col("n_ends") * col("syy") - col("sy") * col("sy")) > 0,
              (col("n_ends") * col("sxy") - col("sx") * col("sy"))
                .cast("double") /
                sqrt((col("n_ends") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n_ends") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))), 6).as("assortativity"))
      },
      oracle = Some(
        """WITH e0 AS (
          |  SELECT DISTINCT user_id AS src,
          |         user_id - user_id % 10 + event_id % 10 AS dst
          |  FROM events
          |  WHERE event_id % 4 = 0
          |    AND user_id <> user_id - user_id % 10 + event_id % 10),
          |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
          |deg AS (SELECT src AS n, count(*) AS deg FROM sym GROUP BY 1),
          |ends AS (
          |  SELECT dx.deg AS x, dy.deg AS y
          |  FROM sym JOIN deg dx ON dx.n = sym.src JOIN deg dy ON dy.n = sym.dst),
          |a AS (
          |  SELECT count(*) AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          |         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
          |         sum(y * y)::BIGINT AS syy
          |  FROM ends)
          |SELECT n AS n_ends,
          |       round(CASE WHEN (n * sxx - sx * sx) > 0
          |                   AND (n * syy - sy * sy) > 0
          |             THEN (n * sxy - sx * sy)::DOUBLE /
          |                  sqrt((n * sxx - sx * sx)::DOUBLE
          |                       * (n * syy - sy * sy)::DOUBLE)
          |             END, 6) AS assortativity
          |FROM a""".stripMargin)),

    GraftQuery("a41_daily_autocorr",
      // lag-1 autocorrelation of each event type's daily cent totals —
      // the "is today predictive of tomorrow" seasonality probe. Daily
      // totals are exact integers; the correlation is the same
      // all-integer Pearson reduction as g11, windowed by day order.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val paired = daily
          .withColumn("next", lead(col("cents"), 1).over(w))
          .where(col("next").isNotNull)
        paired.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("cents")).as("sx"), sum(col("next")).as("sy"),
            sum(col("cents") * col("next")).as("sxy"),
            sum(col("cents") * col("cents")).as("sxx"),
            sum(col("next") * col("next")).as("syy"))
          .select(col("event_type"), col("n_pairs"),
            round((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n_pairs") * col("syy") - col("sy") * col("sy"))
                  .cast("double")), 6).as("autocorr"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY 1, 2),
          |p AS (
          |  SELECT event_type, cents,
          |         lead(cents) OVER (PARTITION BY event_type ORDER BY day) AS next
          |  FROM daily),
          |f AS (SELECT * FROM p WHERE next IS NOT NULL),
          |a AS (
          |  SELECT event_type, count(*) AS n, sum(cents)::BIGINT AS sx,
          |         sum(next)::BIGINT AS sy, sum(cents * next)::BIGINT AS sxy,
          |         sum(cents * cents)::BIGINT AS sxx,
          |         sum(next * next)::BIGINT AS syy
          |  FROM f GROUP BY 1)
          |SELECT event_type, n AS n_pairs,
          |       round((n * sxy - sx * sy)::DOUBLE /
          |             sqrt((n * sxx - sx * sx)::DOUBLE
          |                  * (n * syy - sy * sy)::DOUBLE), 6) AS autocorr
          |FROM a""".stripMargin)),

    GraftQuery("a42_journey_regex",
      // MATCH_RECOGNIZE-style behavioral pattern matching: each user's
      // ordered event-type journey as one string, then regex counts
      // over it — funnel completions (`view (click )*purchase`) and
      // maximal error runs. The journey is assembled by array_sort on
      // (ts, event_id) structs (event_id is unique, so the order is
      // total and engine-independent); patterns stay in the
      // RE2-portable subset both engines match identically, and
      // non-overlapping left-to-right scan semantics agree. Scale: one
      // shuffle of (user, type, ts, id) scalars; the journey string
      // materializes only inside its own user's group, and the regex
      // runs map-side after the agg.
      (s, dir) => {
        val seqs = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x("event_type")), " ").as("journey"))
        seqs.select(col("user_id"),
          size(split(col("journey"), " ")).as("n_events"),
          size(regexp_extract_all(col("journey"),
            lit("view (?:click )*purchase"), lit(0))).as("n_funnels"),
          size(regexp_extract_all(col("journey"),
            lit("error(?: error)*"), lit(0))).as("n_error_runs"))
      },
      oracle = Some(
        """WITH j AS (
          |  SELECT user_id,
          |         string_agg(event_type, ' ' ORDER BY ts, event_id) AS journey
          |  FROM events GROUP BY user_id)
          |SELECT user_id,
          |       len(string_split(journey, ' '))::INT AS n_events,
          |       len(regexp_extract_all(journey,
          |           'view (?:click )*purchase'))::INT AS n_funnels,
          |       len(regexp_extract_all(journey,
          |           'error(?: error)*'))::INT AS n_error_runs
          |FROM j""".stripMargin)),

    GraftQuery("q34_skyline_parts",
      // SKYLINE (Pareto-dominance) query: parts not dominated on
      // (cheaper price, larger size). The engine computes it in
      // O(n log n) with two windows — max size over STRICTLY cheaper
      // rows (range frame to -1 cent) and max size within the same
      // price — while the oracle keeps the textbook quadratic
      // NOT EXISTS dominance test: same set, structurally different
      // derivations. Prices compare in exact integer cents. The
      // global-ordered window runs over the CATALOG-sized part
      // relation (same contract as a44's Pareto cumsum); for a
      // fact-scale 2-D skyline, partition-local skylines union then
      // re-skyline (skyline is distributive) before this window.
      (s, dir) => {
        val p = Tables.load(s, dir, "part").select(col("p_partkey"),
          round(col("p_retailprice") * 100, 0).cast("long").as("cents"),
          col("p_size"))
        val wLess = Window.orderBy(col("cents"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy(col("cents"))
        p.withColumn("mx_less", max(col("p_size")).over(wLess))
          .withColumn("mx_eq", max(col("p_size")).over(wEq))
          .where(!(coalesce(col("mx_less") >= col("p_size"), lit(false)) ||
            col("mx_eq") > col("p_size")))
          .select(col("p_partkey"), col("cents"), col("p_size"))
      },
      oracle = Some(
        """WITH p AS (
          |  SELECT p_partkey, CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents,
          |         p_size
          |  FROM part)
          |SELECT p_partkey, cents, p_size FROM p a
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM p b
          |  WHERE b.cents <= a.cents AND b.p_size >= a.p_size
          |    AND (b.cents < a.cents OR b.p_size > a.p_size))""".stripMargin)),

    GraftQuery("a53_hhi_concentration",
      // Herfindahl-Hirschman concentration of user revenue per event
      // type: HHI = Σ shareᵢ² = Σ centsᵢ² / (Σ centsᵢ)² — both sums
      // exact integers, one final division (the market-concentration
      // companion to a40's Gini; HHI is the antitrust-standard form).
      // Also the effective number of users 1/HHI.
      (s, dir) => {
        val perUser = Tables.events(s, dir)
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        perUser.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("cents")).as("__s"),
            sum(col("cents") * col("cents")).as("__sq"))
          .select(col("event_type"), col("n_users"),
            round(col("__sq").cast("double") /
              (col("__s").cast("double") * col("__s")), 6).as("hhi"),
            round((col("__s").cast("double") * col("__s")) /
              col("__sq"), 6).as("effective_users"))
      },
      oracle = Some(
        """WITH per_user AS (
          |  SELECT event_type, user_id,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY 1, 2),
          |a AS (
          |  SELECT event_type, count(*) AS n_users,
          |         sum(cents)::BIGINT AS s,
          |         sum(cents * cents)::BIGINT AS sq
          |  FROM per_user GROUP BY 1)
          |SELECT event_type, n_users,
          |       round(sq::DOUBLE / (s::DOUBLE * s), 6) AS hhi,
          |       round((s::DOUBLE * s) / sq, 6) AS effective_users
          |FROM a""".stripMargin)),

    GraftQuery("w14_cumulative_share",
      // running share of group total per user within each event type
      // (the "how many users cover 80% of revenue" curve, grouped):
      // per-user cents ranked desc, cumulative sum over the group
      // window, share = cum/total — both exact longs until the final
      // division. The window runs over the per-user AGGREGATED
      // relation (users × types), not events.
      (s, dir) => {
        val perUser = Tables.events(s, dir)
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents").desc, col("user_id"))
        perUser
          .withColumn("rank", row_number().over(w))
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("total", sum(col("cents")).over(
            Window.partitionBy(col("event_type"))))
          .select(col("event_type"), col("user_id"), col("cents"),
            col("rank"), round(col("cum") / col("total").cast("double"), 6)
              .as("cum_share"))
      },
      oracle = Some(
        """WITH per_user AS (
          |  SELECT event_type, user_id,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, user_id, cents,
          |       CAST(row_number() OVER w AS INT) AS rank,
          |       round(sum(cents) OVER (w ROWS UNBOUNDED PRECEDING)::DOUBLE /
          |             sum(cents) OVER (PARTITION BY event_type), 6)
          |         AS cum_share
          |FROM per_user
          |WINDOW w AS (PARTITION BY event_type
          |             ORDER BY cents DESC, user_id)""".stripMargin)),

    GraftQuery("a52_interarrival_quartiles",
      // inter-arrival time quartiles per event type: consecutive-event
      // gaps in exact integer MICROS (lead over (ts, event_id)), then
      // the exact-binary-fraction quartile trick from a43 — the
      // latency-distribution companion to a39's modal cadence.
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"),
            expr("unix_micros(ts)").as("us"))
          .withColumn("gap_us", lead(col("us"), 1).over(w) - col("us"))
          .where(col("gap_us").isNotNull)
        gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            expr("percentile(gap_us, 0.25D)").as("p25_us"),
            expr("percentile(gap_us, 0.5D)").as("p50_us"),
            expr("percentile(gap_us, 0.75D)").as("p75_us"),
            max(col("gap_us")).as("max_us"))
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
          |gaps AS (
          |  SELECT event_type,
          |         lead(us) OVER (PARTITION BY event_type
          |                        ORDER BY us, event_id) - us AS gap_us
          |  FROM e)
          |SELECT event_type, count(*) AS n_gaps,
          |       quantile_cont(gap_us, 0.25) AS p25_us,
          |       quantile_cont(gap_us, 0.5) AS p50_us,
          |       quantile_cont(gap_us, 0.75) AS p75_us,
          |       max(gap_us) AS max_us
          |FROM gaps WHERE gap_us IS NOT NULL
          |GROUP BY 1""".stripMargin)),

    GraftQuery("a51_wow_growth",
      // week-over-week growth per event type: lag on weekly cent
      // totals, growth as one exact integer fraction (NULL on a zero
      // base week rather than an infinity). Weeks key on integer
      // epoch-week arithmetic like a20, never date_trunc strings.
      (s, dir) => {
        val weekly = Tables.events(s, dir)
          .groupBy(col("event_type"),
            floor(unix_timestamp(col("ts")) / 604800).cast("long").as("wk"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
        weekly
          .withColumn("prev", lag(col("cents"), 1).over(w))
          .select(col("event_type"), col("wk"), col("cents"), col("prev"),
            round(when(col("prev") > 0,
              (col("cents") - col("prev")).cast("double") / col("prev")), 6)
              .as("wow_growth"))
      },
      oracle = Some(
        """WITH weekly AS (
          |  SELECT event_type, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY 1, 2),
          |lagged AS (
          |  SELECT event_type, wk, cents,
          |         lag(cents) OVER (PARTITION BY event_type ORDER BY wk) AS prev
          |  FROM weekly)
          |SELECT event_type, wk, cents, prev,
          |       round(CASE WHEN prev > 0
          |             THEN (cents - prev)::DOUBLE / prev END, 6) AS wow_growth
          |FROM lagged""".stripMargin)),

    GraftQuery("w13_rolling_corr",
      // rolling 7-day Pearson correlation between the click and
      // purchase daily revenue series — the co-movement monitor. All
      // six Σs are ROWS-frame window sums of exact integer cents, so
      // the statistic is one exact fraction per day (g11's reduction
      // under a sliding frame); degenerate windows (zero variance,
      // n < 3) are NULL. The ordered window runs over the DAY grid
      // (horizon-sized, like a44/q34), not facts.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum(when(col("event_type") === "click",
              round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("y"))
        val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("x")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sxy", sum(col("x") * col("y")).over(w))
          .withColumn("sxx", sum(col("x") * col("x")).over(w))
          .withColumn("syy", sum(col("y") * col("y")).over(w))
          .select(col("day").cast("string").as("day"), col("n").as("n_days"),
            round(when(col("n") >= 3 &&
              (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
              (col("n") * col("syy") - col("sy") * col("sy")) > 0,
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))), 6).as("corr7"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS day,
          |         sum(CASE WHEN event_type = 'click'
          |                  THEN CAST(round(value * 100, 0) AS BIGINT)
          |                  ELSE 0 END)::BIGINT AS x,
          |         sum(CASE WHEN event_type = 'purchase'
          |                  THEN CAST(round(value * 100, 0) AS BIGINT)
          |                  ELSE 0 END)::BIGINT AS y
          |  FROM events GROUP BY 1),
          |win AS (
          |  SELECT day,
          |         count(*) OVER w AS n,
          |         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
          |         sum(x * y) OVER w AS sxy,
          |         sum(x * x) OVER w AS sxx,
          |         sum(y * y) OVER w AS syy
          |  FROM daily
          |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
          |SELECT strftime(day, '%Y-%m-%d') AS day, n::BIGINT AS n_days,
          |       round(CASE WHEN n >= 3
          |                   AND (n * sxx - sx * sx) > 0
          |                   AND (n * syy - sy * sy) > 0
          |             THEN (n * sxy - sx * sy)::DOUBLE /
          |                  sqrt((n * sxx - sx * sx)::DOUBLE
          |                       * (n * syy - sy * sy)::DOUBLE)
          |             END, 6) AS corr7
          |FROM win""".stripMargin)),

    GraftQuery("a50_dow_effect",
      // seasonality strength as eta-squared: how much of the variance
      // in daily cent totals the day-of-week explains,
      // SS_between/SS_total — both sums of squares reduce to exact
      // integer Σs cross-multiplied over group sizes (the g11 trick
      // lifted to ANOVA), so the only float is the final ratio.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
          .withColumn("dow", dayofweek(col("day")).cast("long"))
        val g = daily.groupBy(col("dow"))
          .agg(count(lit(1)).as("m"), sum(col("y")).as("sg"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("st"),
          sum(col("y") * col("y")).as("sqt"))
        // SS_total = Σy² − (Σy)²/n ; SS_between = Σ_g (Σ_g y)²/m_g − (Σy)²/n.
        // eta² is scale-invariant, so the squared terms use DOLLARS
        // (cents/100) to pull magnitudes 4 orders below the cents
        // version before any double multiply; and the Σ over the ≤7
        // dow groups is SEVEN EXPLICIT TERMS added left-to-right (one
        // conditional agg per dow — each sums exactly one row — then a
        // literal addition chain), so both engines execute the same
        // IEEE op sequence: no partition-order summation wobble can
        // land the ratio on a round-to-6 boundary. The integer Σs
        // (m, sg, st, sqt, n) stay exact longs up to this final step.
        val terms = (1 to 7).map(d =>
          sum(when(col("dow") === d,
            (col("sg") / lit(100.0)) * (col("sg") / lit(100.0)) / col("m")))
            .as(s"t$d"))
        val sb = (1 to 7).map(d => coalesce(col(s"t$d"), lit(0.0)))
          .reduceLeft(_ + _)
        val stD = col("st") / lit(100.0)
        g.crossJoin(broadcast(tot))
          .groupBy(col("n"), col("st"), col("sqt"))
          .agg(terms.head, terms.tail: _*)
          .select(
            round((lit(1.0) * col("n") * sb - stD * stD) /
              (lit(1.0) * col("n") * (col("sqt") / lit(10000.0)) -
                stD * stD), 6).as("eta_sq"),
            col("n").as("n_days"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS day,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS y,
          |         dayofweek(CAST(ts AS DATE))::BIGINT AS dow0
          |  FROM events GROUP BY 1),
          |d2 AS (SELECT day, y, dow0 FROM daily),
          |g AS (SELECT dow0, count(*) AS m, sum(y)::BIGINT AS sg FROM d2 GROUP BY 1),
          |tot AS (SELECT count(*) AS n, sum(y)::BIGINT AS st,
          |               sum(y * y)::BIGINT AS sqt FROM d2),
          |-- one term per dow (DuckDB dayofweek is 0..6, Sunday=0 — the
          |-- engine's Spark dayofweek d maps to dow0 = d-1), summed in
          |-- a FIXED left-to-right order to mirror the engine exactly
          |sb AS (SELECT
          |  sum(CASE WHEN dow0 = 0 THEN (sg/100.0)*(sg/100.0)/m END) AS t1,
          |  sum(CASE WHEN dow0 = 1 THEN (sg/100.0)*(sg/100.0)/m END) AS t2,
          |  sum(CASE WHEN dow0 = 2 THEN (sg/100.0)*(sg/100.0)/m END) AS t3,
          |  sum(CASE WHEN dow0 = 3 THEN (sg/100.0)*(sg/100.0)/m END) AS t4,
          |  sum(CASE WHEN dow0 = 4 THEN (sg/100.0)*(sg/100.0)/m END) AS t5,
          |  sum(CASE WHEN dow0 = 5 THEN (sg/100.0)*(sg/100.0)/m END) AS t6,
          |  sum(CASE WHEN dow0 = 6 THEN (sg/100.0)*(sg/100.0)/m END) AS t7
          |  FROM g)
          |SELECT round((1.0 * n * (coalesce(t1, 0.0) + coalesce(t2, 0.0)
          |               + coalesce(t3, 0.0) + coalesce(t4, 0.0)
          |               + coalesce(t5, 0.0) + coalesce(t6, 0.0)
          |               + coalesce(t7, 0.0))
          |              - (st/100.0) * (st/100.0)) /
          |             (1.0 * n * (sqt/10000.0)
          |              - (st/100.0) * (st/100.0)), 6) AS eta_sq,
          |       n AS n_days
          |FROM tot, sb""".stripMargin)),

    GraftQuery("a48_association_rules",
      // market-basket association rules over per-user event-type
      // baskets: support / confidence / lift for every ordered type
      // pair (antecedent → consequent). Every statistic is a ratio of
      // exact integer user counts — distinct-type baskets bound the
      // pair fan-out at |types|² per user, so the pair join is a
      // small-dimension self-join, never row-scale. Lift > 1 reads
      // "purchase co-occurs with signup more than independence
      // predicts"; the oracle re-derives all three ratios.
      (s, dir) => {
        val baskets = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type")).distinct()
        val nUsers = baskets.agg(
          count_distinct(col("user_id")).as("n_users"))
        val typeCounts = baskets.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_t"))
        val pairs = baskets.as("a").join(baskets.as("b"), "user_id")
          .where(col("a.event_type") =!= col("b.event_type"))
          .groupBy(col("a.event_type").as("antecedent"),
            col("b.event_type").as("consequent"))
          .agg(count(lit(1)).as("n_both"))
        pairs
          .join(typeCounts.select(col("event_type").as("antecedent"),
            col("n_t").as("n_ante")), "antecedent")
          .join(typeCounts.select(col("event_type").as("consequent"),
            col("n_t").as("n_cons")), "consequent")
          .crossJoin(broadcast(nUsers))
          .select(col("antecedent"), col("consequent"), col("n_both"),
            round(col("n_both") / col("n_users").cast("double"), 6)
              .as("support"),
            round(col("n_both") / col("n_ante"), 6).as("confidence"),
            round((col("n_both") * col("n_users").cast("double")) /
              (col("n_ante") * col("n_cons")), 6).as("lift"))
      },
      oracle = Some(
        """WITH baskets AS (
          |  SELECT DISTINCT user_id, event_type FROM events),
          |nu AS (SELECT count(DISTINCT user_id) AS n FROM baskets),
          |tc AS (SELECT event_type, count(*) AS n_t FROM baskets GROUP BY 1),
          |pairs AS (
          |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
          |         count(*) AS n_both
          |  FROM baskets a JOIN baskets b ON a.user_id = b.user_id
          |  WHERE a.event_type <> b.event_type
          |  GROUP BY 1, 2)
          |SELECT antecedent, consequent, n_both,
          |       round(n_both::DOUBLE / nu.n, 6) AS support,
          |       round(n_both::DOUBLE / ta.n_t, 6) AS confidence,
          |       round((n_both * (nu.n)::DOUBLE) / (ta.n_t * tb.n_t), 6) AS lift
          |FROM pairs
          |JOIN tc ta ON ta.event_type = pairs.antecedent
          |JOIN tc tb ON tb.event_type = pairs.consequent
          |CROSS JOIN nu""".stripMargin)),

    GraftQuery("a49_stickiness",
      // DAU/MAU stickiness per month: mean daily distinct users over
      // monthly distinct users — the standard engagement ratio. Sums
      // of daily distinct counts are exact integers, so the ratio is
      // one exact fraction; months key on integer year*100+month, not
      // date_trunc strings.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          to_date(col("ts")).as("day"),
          (year(col("ts")) * 100 + month(col("ts"))).cast("long").as("ym"))
        val dau = ev.groupBy(col("ym"), col("day"))
          .agg(count_distinct(col("user_id")).as("dau"))
        val daily = dau.groupBy(col("ym"))
          .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("dau_sum"))
        val mau = ev.groupBy(col("ym"))
          .agg(count_distinct(col("user_id")).as("mau"))
        daily.join(mau, "ym")
          .select(col("ym"), col("n_days"), col("mau"),
            round(col("dau_sum") / col("n_days"), 6).as("avg_dau"),
            round(col("dau_sum") / (col("n_days") * col("mau")), 6)
              .as("stickiness"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT user_id, CAST(ts AS DATE) AS day,
          |         (year(ts) * 100 + month(ts))::BIGINT AS ym
          |  FROM events),
          |dau AS (
          |  SELECT ym, day, count(DISTINCT user_id) AS dau
          |  FROM ev GROUP BY 1, 2),
          |daily AS (
          |  SELECT ym, count(*) AS n_days, sum(dau)::BIGINT AS dau_sum
          |  FROM dau GROUP BY 1),
          |mau AS (SELECT ym, count(DISTINCT user_id) AS mau FROM ev GROUP BY 1)
          |SELECT daily.ym, n_days, mau,
          |       round(dau_sum::DOUBLE / n_days, 6) AS avg_dau,
          |       round(dau_sum::DOUBLE / (n_days * mau), 6) AS stickiness
          |FROM daily JOIN mau ON mau.ym = daily.ym""".stripMargin)),

    GraftQuery("a47_trimmed_mean",
      // 10% trimmed mean per event type — the robust location estimate
      // between a8's moment mean and a38's median. The trim is
      // RANK-based (drop the k = n÷10 lowest and highest by
      // (cents, event_id)), so the cut is pure integer arithmetic —
      // no percentile interpolation anywhere — and the kept-set mean
      // is one exact integer fraction rounded at the end.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          col("event_id"), round(col("value") * 100, 0).cast("long").as("cents"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))
        val ranked = ev
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
        ranked.groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            round(sum(col("cents")) / count(lit(1)), 6).as("raw_mean_cents"),
            sum(when(col("rk") > expr("n div 10") &&
              col("rk") <= col("n") - expr("n div 10"), col("cents")))
              .as("__ts"),
            sum(when(col("rk") > expr("n div 10") &&
              col("rk") <= col("n") - expr("n div 10"), 1L).otherwise(0L))
              .as("n_kept"))
          .select(col("event_type"), col("n"), col("n_kept"),
            round(col("__ts") / col("n_kept"), 6).as("trimmed_mean_cents"),
            col("raw_mean_cents"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_type, event_id,
          |         CAST(round(value * 100, 0) AS BIGINT) AS cents
          |  FROM events),
          |ranked AS (
          |  SELECT event_type, cents,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY cents, event_id) AS rk,
          |         count(*) OVER (PARTITION BY event_type) AS n
          |  FROM ev)
          |SELECT event_type, max(n) AS n,
          |       sum(CASE WHEN rk > n // 10 AND rk <= n - n // 10
          |                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
          |       round(sum(CASE WHEN rk > n // 10 AND rk <= n - n // 10
          |                      THEN cents END)::DOUBLE /
          |             sum(CASE WHEN rk > n // 10 AND rk <= n - n // 10
          |                      THEN 1 ELSE 0 END), 6) AS trimmed_mean_cents,
          |       round(sum(cents)::DOUBLE / count(*), 6) AS raw_mean_cents
          |FROM ranked GROUP BY event_type""".stripMargin)),

    GraftQuery("a54_winsorized_stats",
      // a47's robust-location companion: instead of DROPPING the k =
      // n÷10 tail rows per side, CLIP them to the surviving boundary
      // values (rank k+1 low, rank n−k high) — the outlier treatment
      // that keeps n constant (reward/feature clipping). Rank-based
      // like a47: bounds are actual data cents, the winsorized sum is
      // Σ(middle) + k·(lo + hi) in exact integers, one division at
      // the end.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          col("event_id"), round(col("value") * 100, 0).cast("long").as("cents"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))
        val ranked = ev
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
        ranked.groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            max(when(col("rk") === expr("n div 10") + 1, col("cents")))
              .as("lo_cents"),
            max(when(col("rk") === col("n") - expr("n div 10"), col("cents")))
              .as("hi_cents"),
            sum(when(col("rk") > expr("n div 10") &&
              col("rk") <= col("n") - expr("n div 10"), col("cents"))
              .otherwise(0L)).as("__mid"))
          .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
            round((col("__mid") +
              expr("n div 10") * (col("lo_cents") + col("hi_cents"))) /
              col("n"), 6).as("winsorized_mean_cents"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_type, event_id,
          |         CAST(round(value * 100, 0) AS BIGINT) AS cents
          |  FROM events),
          |ranked AS (
          |  SELECT event_type, cents,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY cents, event_id) AS rk,
          |         count(*) OVER (PARTITION BY event_type) AS n
          |  FROM ev)
          |SELECT event_type, max(n) AS n,
          |       max(CASE WHEN rk = n // 10 + 1 THEN cents END) AS lo_cents,
          |       max(CASE WHEN rk = n - n // 10 THEN cents END) AS hi_cents,
          |       round((sum(CASE WHEN rk > n // 10 AND rk <= n - n // 10
          |                       THEN cents ELSE 0 END)
          |              + (max(n) // 10) *
          |                (max(CASE WHEN rk = n // 10 + 1 THEN cents END) +
          |                 max(CASE WHEN rk = n - n // 10 THEN cents END)))::DOUBLE
          |             / max(n), 6) AS winsorized_mean_cents
          |FROM ranked GROUP BY event_type""".stripMargin)),

    GraftQuery("a55_cuped",
      // CUPED variance reduction (Deng et al. 2013, the standard
      // experimentation readout): per-user pre-period spend is the
      // covariate, post-period spend the metric, θ = cov(x,y)/var(x)
      // pooled over all users, and each variant's adjusted mean is
      // ȳ_v − θ·(x̄_v − x̄). Every Σ (n, Σx, Σy, Σxy, Σxx, per-variant
      // Σ) is an exact integer in cents; θ and the means combine those
      // integers in ONE spelled-out double expression mirrored
      // verbatim in the oracle (casts before multiplies — n·Σxy in
      // longs could overflow at corpus scale). Variant = user_id mod 2
      // (deterministic synthetic assignment).
      (s, dir) => {
        val per = Tables.events(s, dir)
          .select(col("user_id"),
            to_date(col("ts")).as("day"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("day") < lit("2024-01-16"), col("cents"))
              .otherwise(0L)).as("x"),
            sum(when(col("day") >= lit("2024-01-16"), col("cents"))
              .otherwise(0L)).as("y"))
          .withColumn("variant", pmod(col("user_id"), lit(2)).cast("long"))
        val g = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("theta",
            (col("sxy").cast("double") * col("n") -
              col("sx").cast("double") * col("sy")) /
            (col("sxx").cast("double") * col("n") -
              col("sx").cast("double") * col("sx")))
        per.groupBy(col("variant"))
          .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sxv"),
            sum(col("y")).as("syv"))
          .crossJoin(broadcast(g))
          .select(col("variant"), col("n_users"),
            round(col("syv").cast("double") / col("n_users"), 6)
              .as("raw_mean_cents"),
            round(col("syv").cast("double") / col("n_users") -
              col("theta") * (col("sxv").cast("double") / col("n_users") -
                col("sx").cast("double") / col("n")), 6)
              .as("cuped_mean_cents"),
            round(col("theta"), 6).as("theta"))
      },
      oracle = Some(
        """WITH per AS (
          |  SELECT user_id,
          |         sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
          |                  THEN CAST(round(value * 100, 0) AS BIGINT)
          |                  ELSE 0 END) AS x,
          |         sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
          |                  THEN CAST(round(value * 100, 0) AS BIGINT)
          |                  ELSE 0 END) AS y,
          |         user_id % 2 AS variant
          |  FROM events GROUP BY user_id),
          |g AS (
          |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
          |         sum(x * y) AS sxy, sum(x * x) AS sxx,
          |         (sum(x * y)::DOUBLE * count(*) -
          |            sum(x)::DOUBLE * sum(y)) /
          |         (sum(x * x)::DOUBLE * count(*) -
          |            sum(x)::DOUBLE * sum(x)) AS theta
          |  FROM per)
          |SELECT variant, count(*) AS n_users,
          |       round(sum(y)::DOUBLE / count(*), 6) AS raw_mean_cents,
          |       round(sum(y)::DOUBLE / count(*) -
          |             g.theta * (sum(x)::DOUBLE / count(*) -
          |                        g.sx::DOUBLE / g.n), 6) AS cuped_mean_cents,
          |       round(g.theta, 6) AS theta
          |FROM per, g GROUP BY variant, g.theta, g.sx, g.n""".stripMargin)),

    GraftQuery("w15_peak_drawdown",
      // worst peak-to-trough decline of the daily revenue series per
      // event type — the drawdown diagnostic a metric dashboard runs
      // on any KPI: running max over the day-ordered totals minus the
      // current total, maximized. Exact integer cents end to end; the
      // window partitions by event_type, so the sort is per-group.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("peak", max(col("cents")).over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            max(col("peak")).as("peak_cents"),
            max(col("peak") - col("cents")).as("max_drawdown_cents"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |r AS (
          |  SELECT event_type, cents,
          |         max(cents) OVER (PARTITION BY event_type ORDER BY day
          |                          ROWS UNBOUNDED PRECEDING) AS peak
          |  FROM daily)
          |SELECT event_type, count(*) AS n_days,
          |       max(peak) AS peak_cents,
          |       max(peak - cents) AS max_drawdown_cents
          |FROM r GROUP BY event_type""".stripMargin)),

    GraftQuery("a56_mann_whitney",
      // the nonparametric companion to a55: Mann-Whitney rank-sum test
      // between the two variants on per-user post-period spend. Pooled
      // AVERAGE ranks (tie groups share rank() + (|ties|−1)/2 — exact
      // binary halves), U_a = Σ_A ranks − n_a(n_a+1)/2, and the
      // rank-biserial effect size as the single final division. A
      // global rank window over USERS (one experiment's units — the
      // bounded relation, not events).
      (s, dir) => {
        val per = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .groupBy(col("user_id"))
          .agg(sum(when(col("day") >= lit("2024-01-16"), col("cents"))
            .otherwise(0L)).as("y"))
          .withColumn("variant", pmod(col("user_id"), lit(2)).cast("long"))
        val ranked = per
          .withColumn("avg_rank",
            rank().over(Window.orderBy(col("y"))).cast("double") +
              (count(lit(1)).over(Window.partitionBy(col("y"))) - 1)
                .cast("double") / 2.0)
        ranked.agg(
            sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("variant") === 0, col("avg_rank"))
              .otherwise(0.0)).as("__ra"))
          .select(col("n_a"), col("n_b"),
            (col("__ra") - col("n_a").cast("double") * (col("n_a") + 1) / 2.0)
              .as("u_a"))
          .select(col("n_a"), col("n_b"), round(col("u_a"), 6).as("u_a"),
            round(col("n_a").cast("double") * col("n_b") - col("u_a"), 6)
              .as("u_b"),
            round((col("u_a") - (col("n_a").cast("double") * col("n_b") -
              col("u_a"))) / (col("n_a").cast("double") * col("n_b")), 6)
              .as("rank_biserial"))
      },
      oracle = Some(
        """WITH per AS (
          |  SELECT user_id,
          |         sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
          |                  THEN CAST(round(value * 100, 0) AS BIGINT)
          |                  ELSE 0 END) AS y,
          |         user_id % 2 AS variant
          |  FROM events GROUP BY user_id),
          |r AS (
          |  SELECT variant,
          |         rank() OVER (ORDER BY y)::DOUBLE +
          |           (count(*) OVER (PARTITION BY y) - 1)::DOUBLE / 2.0
          |           AS avg_rank
          |  FROM per),
          |agg AS (
          |  SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
          |         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
          |         sum(CASE WHEN variant = 0 THEN avg_rank ELSE 0.0 END) AS ra
          |  FROM r),
          |u AS (
          |  SELECT n_a, n_b,
          |         ra - n_a::DOUBLE * (n_a + 1) / 2.0 AS u_a
          |  FROM agg)
          |SELECT n_a, n_b, round(u_a, 6) AS u_a,
          |       round(n_a::DOUBLE * n_b - u_a, 6) AS u_b,
          |       round((u_a - (n_a::DOUBLE * n_b - u_a)) /
          |             (n_a::DOUBLE * n_b), 6) AS rank_biserial
          |FROM u""".stripMargin)),

    GraftQuery("a46_trend_ols",
      // least-squares daily trend per event type: slope/intercept of
      // cents vs day index from the closed-form Σ identities — n, Σx,
      // Σy, Σxy, Σxx are all exact integers (day index from a window
      // rank), so the slope is one exact fraction and the only floats
      // are the two final divisions. The regression complement of
      // a45's recursive smoothing: same series, stateless reduction.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        daily
          .withColumn("x", row_number().over(w).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("cents")).as("sy"),
            sum(col("x") * col("cents")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6)
              .as("slope_cents_per_day"),
            round((col("sy") * col("sxx") - col("sx") * col("sxy"))
              .cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")), 6)
              .as("intercept_cents"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY 1, 2),
          |xy AS (
          |  SELECT event_type, cents,
          |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS x
          |  FROM daily),
          |a AS (
          |  SELECT event_type, count(*) AS n, sum(x)::BIGINT AS sx,
          |         sum(cents)::BIGINT AS sy, sum(x * cents)::BIGINT AS sxy,
          |         sum(x * x)::BIGINT AS sxx
          |  FROM xy GROUP BY 1)
          |SELECT event_type, n,
          |       round((n * sxy - sx * sy)::DOUBLE
          |             / (n * sxx - sx * sx), 6) AS slope_cents_per_day,
          |       round((sy * sxx - sx * sxy)::DOUBLE
          |             / (n * sxx - sx * sx), 6) AS intercept_cents
          |FROM a""".stripMargin)),

    GraftQuery("a45_holt_forecast",
      // Holt linear-trend smoothing of each event type's daily cent
      // totals, 7-day-ahead forecast. The fold fixes the float
      // evaluation ORDER, so the oracle's recursive CTE replaying the
      // identical recurrence on the identical doubles lands on
      // bit-identical level/trend — determinism by sequencing, not by
      // integer-only arithmetic.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        graft.operators.TemporalOps.holtForecast(daily, "event_type",
          "day", "cents", alpha = 0.5, beta = 0.5, horizon = 7)
      },
      oracle = Some(
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM events GROUP BY 1, 2),
          |ord AS (
          |  SELECT event_type, cents,
          |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
          |  FROM daily),
          |n AS (SELECT event_type, max(t) AS n FROM ord GROUP BY 1),
          |rec AS (
          |  SELECT o1.event_type, 1 AS t, o1.cents::DOUBLE AS l,
          |         (o2.cents - o1.cents)::DOUBLE AS b
          |  FROM ord o1 JOIN ord o2
          |    ON o1.event_type = o2.event_type AND o1.t = 1 AND o2.t = 2
          |  UNION ALL
          |  SELECT r.event_type, r.t + 1,
          |         0.5 * o.cents + 0.5 * (r.l + r.b),
          |         0.5 * ((0.5 * o.cents + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
          |  FROM rec r JOIN ord o
          |    ON o.event_type = r.event_type AND o.t = r.t + 1)
          |SELECT r.event_type, n.n::INT AS n_obs, round(r.l, 6) AS level,
          |       round(r.b, 6) AS trend,
          |       round(r.l + 7.0 * r.b, 6) AS forecast
          |FROM rec r JOIN n USING (event_type) WHERE r.t = n.n""".stripMargin)),

    GraftQuery("a44_abc_pareto",
      // ABC (Pareto 80/95) inventory classification: parts ranked by
      // revenue, classed by cumulative share — A while cum <= 80%,
      // B while <= 95%, C after. Class boundaries decide on INTEGER
      // cross-multiplication (cum·100 vs total·80/95 in cents), never
      // a float share, so both engines cut identically even at exact
      // boundaries. The ordered cumulative sum runs over the
      // AGGREGATED part relation (catalog-sized, not fact-sized) — the
      // revenue rollup itself is a partial-aggregated fact scan.
      (s, dir) => {
        val rev = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("cents"))
        val w = Window.orderBy(col("cents").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = rev.agg(sum(col("cents")).as("__tot"))
        rev.withColumn("cum", sum(col("cents")).over(w))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cents").desc, col("l_partkey"))))
          .crossJoin(broadcast(tot))
          .select(col("l_partkey"), col("cents"), col("rank"),
            when(col("cum") * 100 <= col("__tot") * 80, "A")
              .when(col("cum") * 100 <= col("__tot") * 95, "B")
              .otherwise("C").as("abc_class"))
      },
      oracle = Some(
        """WITH rev AS (
          |  SELECT l_partkey,
          |         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))::BIGINT AS cents
          |  FROM lineitem GROUP BY 1),
          |ranked AS (
          |  SELECT l_partkey, cents,
          |         CAST(row_number() OVER (ORDER BY cents DESC, l_partkey) AS INT) AS rank,
          |         sum(cents) OVER (ORDER BY cents DESC, l_partkey
          |                          ROWS UNBOUNDED PRECEDING) AS cum,
          |         sum(cents) OVER () AS tot
          |  FROM rev)
          |SELECT l_partkey, cents, rank,
          |       CASE WHEN cum * 100 <= tot * 80 THEN 'A'
          |            WHEN cum * 100 <= tot * 95 THEN 'B'
          |            ELSE 'C' END AS abc_class
          |FROM ranked""".stripMargin)),

    GraftQuery("a43_conversion_latency",
      // funnel latency percentiles per signup cohort: each user's time
      // from first signup to first subsequent purchase, quartiles per
      // signup week. Latencies are exact integer MICROS and the
      // quartile fracs (0.25/0.5/0.75) interpolate in exact binary
      // fractions below 2^53, so both engines' percentile formulas
      // produce identical doubles. Cohort weeks are integer `div`, not
      // date_trunc. Non-converted users stay in the denominator (NULL
      // latency, counted signups).
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"))
        val su = ev.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("su_us"))
        val pu = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("pu_us"))
        val conv = su.join(pu, "user_id")
          .where(col("pu_us") >= col("su_us"))
          .groupBy(col("user_id"))
          .agg(min(col("pu_us") - col("su_us")).as("lat_us"))
        su.select(col("user_id"),
            expr("su_us div 604800000000").as("cohort_wk"))
          .join(conv, Seq("user_id"), "left")
          .groupBy(col("cohort_wk"))
          .agg(count(lit(1)).as("n_signups"),
            count(col("lat_us")).as("n_converted"),
            round(count(col("lat_us")) / count(lit(1)), 6)
              .as("conversion_rate"),
            expr("percentile(lat_us, 0.25D)").as("p25_us"),
            expr("percentile(lat_us, 0.5D)").as("p50_us"),
            expr("percentile(lat_us, 0.75D)").as("p75_us"))
      },
      oracle = Some(
        """WITH su AS (
          |  SELECT user_id, min(epoch_us(ts)) AS su_us
          |  FROM events WHERE event_type = 'signup' GROUP BY 1),
          |pu AS (
          |  SELECT user_id, epoch_us(ts) AS pu_us
          |  FROM events WHERE event_type = 'purchase'),
          |conv AS (
          |  SELECT su.user_id, min(pu_us - su_us) AS lat_us
          |  FROM su JOIN pu USING (user_id)
          |  WHERE pu_us >= su_us GROUP BY 1),
          |base AS (
          |  SELECT su.user_id, su_us // 604800000000 AS cohort_wk, lat_us
          |  FROM su LEFT JOIN conv ON conv.user_id = su.user_id)
          |SELECT cohort_wk, count(*) AS n_signups,
          |       count(lat_us) AS n_converted,
          |       round(count(lat_us)::DOUBLE / count(*), 6) AS conversion_rate,
          |       quantile_cont(lat_us, 0.25) AS p25_us,
          |       quantile_cont(lat_us, 0.5) AS p50_us,
          |       quantile_cont(lat_us, 0.75) AS p75_us
          |FROM base GROUP BY 1""".stripMargin)),

    GraftQuery("g3_triangles",
      // per-node triangle counts; the engine orients each edge
      // low-degree→high-degree (the O(m^1.5) skew bound), the oracle
      // enumerates id-ordered triples — triangle sets are
      // orientation-invariant, so the counts must agree exactly
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.triangleCounts(edges)
      },
      oracle = Some(
        """WITH und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM (SELECT user_id AS src,
          |               user_id - user_id % 10 + event_id % 10 AS dst
          |        FROM events) e
          |  WHERE src <> dst),
          |tri AS (
          |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
          |  FROM und e1
          |  JOIN und e2 ON e1.b = e2.a
          |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
          |SELECT id, count(*) AS triangles
          |FROM (SELECT x AS id FROM tri
          |      UNION ALL SELECT y FROM tri
          |      UNION ALL SELECT z FROM tri) n
          |GROUP BY id""".stripMargin)),

    GraftQuery("g12_clustering_coeff",
      // local clustering coefficient over the decade-link graph:
      // triangles(v) / (deg(v) choose 2), triangles and wedges both
      // exact longs, coeff NULL below degree 2 (undefined, not zero).
      // Same degree-oriented triangle enumeration as g3; the oracle
      // re-derives both counts id-ordered.
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.clusteringCoefficient(edges)
      },
      oracle = Some(
        """WITH und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM (SELECT user_id AS src,
          |               user_id - user_id % 10 + event_id % 10 AS dst
          |        FROM events) e
          |  WHERE src <> dst),
          |deg AS (
          |  SELECT id, count(*) AS deg
          |  FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und) n
          |  GROUP BY id),
          |tri AS (
          |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
          |  FROM und e1
          |  JOIN und e2 ON e1.b = e2.a
          |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
          |tcnt AS (
          |  SELECT id, count(*) AS triangles
          |  FROM (SELECT x AS id FROM tri
          |        UNION ALL SELECT y FROM tri
          |        UNION ALL SELECT z FROM tri) n
          |  GROUP BY id)
          |SELECT d.id, d.deg,
          |       coalesce(t.triangles, 0)::BIGINT AS triangles,
          |       ((d.deg * (d.deg - 1)) // 2)::BIGINT AS wedges,
          |       CASE WHEN d.deg >= 2 THEN
          |         round(coalesce(t.triangles, 0)::DOUBLE /
          |               ((d.deg * (d.deg - 1)) // 2), 6) END AS coeff
          |FROM deg d LEFT JOIN tcnt t ON t.id = d.id""".stripMargin)),

    GraftQuery("g13_jaccard_linkpred",
      // neighbor-set Jaccard link prediction on the SPARSIFIED decade
      // graph (every 4th event, like g9): non-adjacent pairs with >= 2
      // shared neighbors, union by inclusion-exclusion — all counts
      // exact longs, the ratio the only float. Wedge enumeration, never
      // all-pairs; the oracle replays the identical wedge + anti-join
      // and re-joins the endpoint degrees.
      (s, dir) => {
        val edges = Tables.load(s, dir, "events")
          .where(col("event_id") % 4 === 0)
          .select(col("user_id").as("src"),
            (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.jaccardLinkPred(edges, maxDegree = 10000)
          .where(col("common") >= 2)
      },
      oracle = Some(
        """WITH e0 AS (
          |  SELECT user_id AS src,
          |         user_id - user_id % 10 + event_id % 10 AS dst
          |  FROM events WHERE event_id % 4 = 0),
          |sym AS (
          |  SELECT DISTINCT src, dst FROM
          |    (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0) u
          |  WHERE src <> dst),
          |deg AS (SELECT src AS n, count(*) AS deg FROM sym GROUP BY src),
          |centers AS (
          |  SELECT s.src AS n, s.dst AS leaf
          |  FROM sym s JOIN deg d ON d.n = s.src
          |  WHERE d.deg <= 10000),
          |cand AS (
          |  SELECT x.leaf AS a, y.leaf AS b
          |  FROM centers x JOIN centers y ON x.n = y.n AND x.leaf < y.leaf),
          |nonadj AS (
          |  SELECT a, b FROM cand c
          |  WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.src = c.a AND s.dst = c.b)),
          |cm AS (
          |  SELECT a, b, count(*) AS common FROM nonadj GROUP BY a, b
          |  HAVING count(*) >= 2)
          |SELECT cm.a, cm.b, cm.common,
          |       (da.deg + db.deg - cm.common)::BIGINT AS union_size,
          |       round(cm.common::DOUBLE /
          |             (da.deg + db.deg - cm.common), 6) AS jaccard
          |FROM cm
          |JOIN deg da ON da.n = cm.a
          |JOIN deg db ON db.n = cm.b""".stripMargin)),

    GraftQuery("g15_degree_histogram",
      // log2-bucketed degree distribution of the SPARSIFIED decade
      // graph (every 4th event, like g9 — at full density the cliques
      // complete and every degree is 9) — the power-law diagnostic that decides hub caps (g9/g13
      // maxDegree) and skew salting. Buckets come from integer
      // bit-length arithmetic (floor(log2(deg)) via repeated halving
      // in SQL = length of the binary string minus one), all counts
      // exact.
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .where(col("event_id") % 4 === 0)
          .select(col("user_id").as("src"),
            (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
          .where(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b")).distinct()
        val deg = e.select(col("a").as("id")).union(e.select(col("b")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        deg.groupBy((length(conv(col("deg"), 10, 2)) - 1).cast("long")
            .as("log2_bucket"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      },
      oracle = Some(
        """WITH und AS (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM (SELECT user_id AS src,
          |               user_id - user_id % 10 + event_id % 10 AS dst
          |        FROM events WHERE event_id % 4 = 0) e
          |  WHERE src <> dst),
          |deg AS (
          |  SELECT id, count(*) AS deg
          |  FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und) n
          |  GROUP BY id)
          |SELECT (length(bin(deg)) - 1)::BIGINT AS log2_bucket,
          |       count(*) AS n_nodes, min(deg) AS min_deg, max(deg) AS max_deg
          |FROM deg GROUP BY 1""".stripMargin)),

    GraftQuery("g14_reciprocity",
      // directed-graph reciprocity: the fraction of distinct directed
      // decade-link edges whose reverse edge also exists — the classic
      // "is attention mutual" network statistic. One self-join on the
      // deduplicated edge relation (scalar pairs), both counts exact
      // longs, one final rounded division.
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("user_id").as("src"),
            (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
          .where(col("src") =!= col("dst")).distinct()
        val recip = e.as("a").join(e.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
          .select(col("a.src"), col("a.dst"))
        e.agg(count(lit(1)).as("n_edges"))
          .crossJoin(broadcast(recip.agg(count(lit(1)).as("n_recip"))))
          .select(col("n_edges"), col("n_recip"),
            round(col("n_recip") / col("n_edges").cast("double"), 6)
              .as("reciprocity"))
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT DISTINCT user_id AS src,
          |         user_id - user_id % 10 + event_id % 10 AS dst
          |  FROM events
          |  WHERE user_id <> user_id - user_id % 10 + event_id % 10),
          |r AS (
          |  SELECT count(*) AS n_recip FROM e a
          |  JOIN e b ON a.src = b.dst AND a.dst = b.src),
          |t AS (SELECT count(*) AS n_edges FROM e)
          |SELECT n_edges, n_recip,
          |       round(n_recip::DOUBLE / n_edges, 6) AS reciprocity
          |FROM t, r""".stripMargin)),

    GraftQuery("g4_bfs_hops",
      // frontier BFS: min hop distance from the seed set (every 20th
      // user) over the undirected link graph; only the frontier
      // re-shuffles each round, so total work is O(edges), not
      // O(edges × diameter). Oracle walks the same closure with a
      // bounded recursive CTE.
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        val seeds = Tables.load(s, dir, "events")
          .where(col("user_id") % 20 === 0)
          .select(col("user_id").as("id")).distinct()
        graft.operators.GraphOps.shortestHops(edges, seeds)
      },
      oracle = Some(
        """WITH RECURSIVE
          |e0 AS (
          |  SELECT DISTINCT user_id AS src,
          |         user_id - user_id % 10 + event_id % 10 AS dst
          |  FROM events),
          |sym AS (
          |  SELECT src, dst FROM
          |    (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0) u
          |  WHERE src <> dst),
          |walk(id, hops) AS (
          |  SELECT DISTINCT user_id, 0 FROM events WHERE user_id % 20 = 0
          |  UNION
          |  SELECT e.dst, w.hops + 1
          |  FROM walk w JOIN sym e ON w.id = e.src
          |  WHERE w.hops < 30)
          |SELECT id, CAST(min(hops) AS BIGINT) AS hops
          |FROM walk GROUP BY id""".stripMargin)),

    GraftQuery("g5_kcore",
      // k-core peel to fixpoint over the decade link graph: dense
      // sub-communities whose every member keeps >= 3 in-core links.
      // Recursive CTEs cannot re-aggregate degrees per round, so the
      // oracle UNROLLS the peel (12 rounds, idempotent once converged;
      // the operator's own fixpoint guard would flag non-convergence)
      (s, dir) => {
        val edges = Tables.load(s, dir, "events").select(
          col("user_id").as("src"),
          (col("user_id") - col("user_id") % 10 + col("event_id") % 10).as("dst"))
        graft.operators.GraphOps.kCore(edges, k = 3)
      },
      oracle = Some(kcoreOracleSql(k = 3, rounds = 12))),

    GraftQuery("a19_grouping_sets",
      // explicit GROUPING SETS — the general form CUBE/ROLLUP lower to:
      // a hand-picked subset of grouping combinations in one Expand +
      // one shuffle, for when the full cube is mostly waste at scale
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"), (col("user_id") % 4).as("ub"), col("value"))
        .groupingSets(
          Seq(Seq(col("event_type"), col("ub")), Seq(col("event_type")), Seq()),
          col("event_type"), col("ub"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value")),
      oracle = Some(
        """SELECT event_type, ub, CAST(grouping(event_type, ub) AS INT) AS gid,
          |       count(*) AS n, round(sum(value), 6) AS sum_value
          |FROM (SELECT event_type, user_id % 4 AS ub, value FROM events) t
          |GROUP BY GROUPING SETS ((event_type, ub), (event_type), ())""".stripMargin)),

    GraftQuery("w7_rolling_median",
      // order-statistic window: centered 5-row rolling median per user —
      // the robust smoother a sensor/metrics pipeline uses where a
      // rolling mean is outlier-dominated; exact interpolated median in
      // both engines
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 2)
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5)").over(w), 6).as("med5"))
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       round(quantile_cont(value, 0.5) OVER
          |         (PARTITION BY user_id ORDER BY ts, event_id
          |          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS med5
          |FROM events""".stripMargin)),

    GraftQuery("a9_pivot",
      // pivot: one row per user, one column per event type (explicit
      // value list — dynamic pivot values would need a pre-scan) — a
      // single hash aggregate with per-bucket conditional sums, the
      // same plan the oracle's CASE aggregation describes
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 6))
        .select(col("user_id"),
          col("click"), col("error"), col("purchase"),
          col("signup"), col("view")),
      oracle = Some(
        """SELECT user_id,
          |       round(sum(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
          |       round(sum(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
          |       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
          |       round(sum(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
          |       round(sum(CASE WHEN event_type = 'view' THEN value END), 6) AS view
          |FROM events GROUP BY user_id""".stripMargin)),

    GraftQuery("a10_unpivot",
      // unpivot (melt): the pivoted frame back to long form — wide
      // columns become (metric, amount) rows, NULL cells dropped, so
      // the round trip reproduces the per-(user, type) aggregate
      (s, dir) => {
        val wide = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(round(sum("value"), 6))
        wide.unpivot(
          Array(col("user_id")),
          Array(col("click"), col("error"), col("purchase"),
            col("signup"), col("view")),
          "metric", "amount")
          .where(col("amount").isNotNull)
      },
      oracle = Some(
        """SELECT user_id, event_type AS metric,
          |       round(sum(value), 6) AS amount
          |FROM events GROUP BY user_id, event_type""".stripMargin)),

    GraftQuery("j8_salted_join",
      // a deliberately hot-keyed join (3 keys carry the whole events
      // table) through the explicit salting operator: each hot key
      // spreads over 8 shuffle groups, and the result must equal the
      // plain unsalted join — which is exactly what the oracle runs
      (s, dir) => {
        val ev = graft.Tables.load(s, dir, "events")
          .select(col("event_id"), (col("user_id") % 3).as("bucket"), col("value"))
        val dim = graft.Tables.load(s, dir, "events")
          .select((col("user_id") % 3).as("bucket")).distinct()
          .select(col("bucket"), concat(lit("seg"), col("bucket")).as("segment"))
        graft.operators.SkewOps.saltedJoin(ev, dim, Seq("bucket"),
          saltCol = "event_id", salts = 8)
          .select(col("event_id"), col("bucket"), col("segment"), col("value"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT event_id, user_id % 3 AS bucket, value FROM events),
          |dim AS (
          |  SELECT bucket, 'seg' || bucket AS segment
          |  FROM (SELECT DISTINCT user_id % 3 AS bucket FROM events) t)
          |SELECT e.event_id, e.bucket, d.segment, e.value
          |FROM ev e JOIN dim d USING (bucket)""".stripMargin)),

    GraftQuery("a20_cohort_retention",
      // cohort/retention analysis: users grouped by first-activity week,
      // activity counted per (cohort, week-offset) cell. The first-seen
      // aggregate and the activity join share the user_id hash
      // partitioning (one exchange builds it, the join reuses it); only
      // the final small (cohort × offset) grid re-shuffles. Week index
      // is integer epoch arithmetic, not date_trunc, so both engines
      // bucket identically.
      (s, dir) => {
        // one explicit user_id exchange serves the first-seen aggregate
        // AND the co-partitioned activity join (hash on user_id clusters
        // every grouping that includes it); only the tiny cohort grid
        // re-shuffles after. Without this, Spark plans three exchanges.
        val ev = Tables.events(s, dir).select(col("user_id"),
            floor(unix_timestamp(col("ts")) / 604800).cast("long").as("wk"))
          .repartition(col("user_id"))
        val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
        ev.join(cohort, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
          .agg(count_distinct(col("user_id")).as("active_users"))
      },
      oracle = Some(
        """WITH ev AS (
          |  SELECT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
          |  FROM events),
          |c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
          |SELECT c.cohort_wk, e.wk - c.cohort_wk AS offset_wk,
          |       count(DISTINCT e.user_id) AS active_users
          |FROM ev e JOIN c USING (user_id)
          |GROUP BY 1, 2""".stripMargin)),

    GraftQuery("a27_chi2_independence",
      // Pearson chi-square independence test of lang × source: the full
      // contingency grid INCLUDING zero-observed cells (their (0−e)²/e
      // = e still contributes — joining only observed pairs understates
      // the statistic). Marginals are partial-aggregated scalars; the
      // grid is |langs|×|sources| rows — driver-trivial at any corpus
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val obs = d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).cast("double").as("o"))
        val rt = d.groupBy(col("lang")).agg(count(lit(1)).cast("double").as("rt"))
        val ct = d.groupBy(col("source")).agg(count(lit(1)).cast("double").as("ct"))
        val n = d.agg(count(lit(1)).cast("double").as("n"))
        rt.crossJoin(broadcast(ct)).join(obs, Seq("lang", "source"), "left")
          .na.fill(0.0, Seq("o"))
          .crossJoin(broadcast(n))
          .withColumn("e", col("rt") * col("ct") / col("n"))
          .agg(
            round(sum(pow(col("o") - col("e"), 2) / col("e")), 6).as("chi2"),
            ((countDistinct(col("lang")) - 1) *
              (countDistinct(col("source")) - 1)).cast("int").as("dof"))
      },
      oracle = Some(
        """WITH o AS (
          |  SELECT lang, source, count(*)::DOUBLE AS o FROM documents GROUP BY 1, 2),
          |r AS (SELECT lang, count(*)::DOUBLE AS rt FROM documents GROUP BY 1),
          |c AS (SELECT source, count(*)::DOUBLE AS ct FROM documents GROUP BY 1),
          |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
          |grid AS (
          |  SELECT r.lang, c.source, r.rt, c.ct, coalesce(o.o, 0) AS o
          |  FROM r CROSS JOIN c LEFT JOIN o USING (lang, source))
          |SELECT round(sum(pow(o - rt * ct / n, 2) / (rt * ct / n)), 6) AS chi2,
          |       CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS INT) AS dof
          |FROM grid CROSS JOIN n""".stripMargin)),

    GraftQuery("a28_last_touch",
      // last-touch attribution: each purchase credits the user's most
      // recent PRIOR non-purchase event type; purchases with no prior
      // touch are unattributed (dropped). One user-partitioned window
      // pass (scalars only), then a |types|-row aggregate
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("touch",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase" && col("touch").isNotNull)
          .groupBy(col("touch"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum(col("value")), 6).as("attributed_value"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT event_type, value,
          |         last_value(CASE WHEN event_type <> 'purchase'
          |                         THEN event_type END IGNORE NULLS)
          |           OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |           AS touch
          |  FROM events)
          |SELECT touch, count(*) AS n_purchases,
          |       round(sum(value), 6) AS attributed_value
          |FROM t WHERE event_type = 'purchase' AND touch IS NOT NULL
          |GROUP BY touch""".stripMargin)),

    GraftQuery("a21_markov_transitions",
      // first-order event-sequence model: per-user ordered lag pairs →
      // global transition counts and row-normalized probabilities. One
      // user_id exchange feeds the lag window; the transition grid is
      // |types|² rows, so the second aggregate and the normalizing
      // window are driver-trivial at any corpus size.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev"))
          .where(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("nxt"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n") /
            sum(col("n")).over(Window.partitionBy(col("prev"))), 6))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT event_type AS nxt,
          |         lag(event_type) OVER
          |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events),
          |n AS (SELECT prev, nxt, count(*) AS n
          |      FROM t WHERE prev IS NOT NULL GROUP BY 1, 2)
          |SELECT prev, nxt, n,
          |       round(n / sum(n) OVER (PARTITION BY prev), 6) AS p
          |FROM n""".stripMargin)),

    GraftQuery("w8_ewma",
      // bounded exponentially-weighted moving average (8 taps, α = 1/2)
      // per user: Σ value_{i-k}·2⁻ᵏ / Σ 2⁻ᵏ over the taps that exist.
      // The dyadic weights only shift the double's exponent — each term
      // is EXACT — and both engines sum the taps in the same written
      // order, so the scores agree bit-for-bit before the final round.
      // Eight lags share one window frame = one exchange, map-side math.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        def tap(k: Int) =
          if (k == 0) col("value") else lag(col("value"), k).over(w)
        val num = (0 to 7).map(k => coalesce(tap(k) * lit(math.pow(0.5, k)), lit(0.0)))
          .reduce(_ + _)
        val den = (0 to 7).map(k =>
          when(tap(k).isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)))
          .reduce(_ + _)
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          round(num / den, 6).as("ewma8"))
      },
      oracle = Some {
        val num = (0 to 7).map { k =>
          val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
          s"coalesce($v * ${math.pow(0.5, k)}, 0)"
        }.mkString(" + ")
        val den = (0 to 7).map { k =>
          val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
          s"(CASE WHEN $v IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0 END)"
        }.mkString(" + ")
        s"""SELECT user_id, event_id, round(($num) / ($den), 6) AS ewma8
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
      }),

    GraftQuery("q16_notin_nulls",
      // NOT IN with a nullable probe — three-valued logic means NULL
      // probes are neither in nor not-in, so a plain anti join is WRONG;
      // Catalyst compiles this to its null-aware anti join. The probe
      // domain (97 values) broadcasts.
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql(
          """SELECT o_orderpriority, count(*) AS n
            |FROM (SELECT o_orderpriority, nullif(o_custkey % 97, 13) AS probe
            |      FROM orders_v) t
            |WHERE probe NOT IN (SELECT c_custkey % 97 FROM customer_v
            |                    WHERE c_acctbal > 9000)
            |GROUP BY o_orderpriority""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n
          |FROM (SELECT o_orderpriority, nullif(o_custkey % 97, 13) AS probe
          |      FROM orders) t
          |WHERE probe NOT IN (SELECT c_custkey % 97 FROM customer
          |                    WHERE c_acctbal > 9000)
          |GROUP BY o_orderpriority""".stripMargin)),

    GraftQuery("q17_lateral_topk",
      // correlated LATERAL subquery with ORDER BY + LIMIT: top-2 orders
      // per MACHINERY customer. Catalyst decorrelates the limit into a
      // per-key window rank — no per-row subquery execution; ties are
      // broken by the unique orderkey so both engines pick identically.
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql(
          """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            |FROM customer_v c,
            |LATERAL (SELECT o_orderkey, o_totalprice
            |         FROM orders_v o
            |         WHERE o.o_custkey = c.c_custkey
            |         ORDER BY o_totalprice DESC, o_orderkey
            |         LIMIT 2) t
            |WHERE c.c_mktsegment = 'MACHINERY'""".stripMargin)
      },
      oracle = Some(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice
          |         FROM orders o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey
          |         LIMIT 2) t
          |WHERE c.c_mktsegment = 'MACHINERY'""".stripMargin)),

    GraftQuery("j9_grid_join",
      // planar distance join via radius-sized grid cells: the distance
      // predicate becomes a cell equi-join (query side fans out 9×, a
      // point's single home cell guarantees each pair meets once) plus
      // an exact residual filter — never a cross join. Coordinates are
      // eighths (dyadic), so squared distances are exact doubles and
      // the inclusive radius boundary agrees bit-for-bit with the
      // oracle's direct quadratic formulation.
      (s, dir) => {
        val pts = Tables.load(s, dir, "events").select(
          col("event_id").as("id"),
          ((col("event_id") % 800) / lit(8.0)).as("x"),
          ((col("user_id") * 7 % 800) / lit(8.0)).as("y"))
        val queries = pts.where(col("id") % 499 === 0)
        val corpus = pts.where(col("id") % 5 === 0)
        graft.operators.SpatialOps.gridDistanceJoin(queries, corpus, radius = 2.0)
          .select(col("q_id"), col("p_id"), round(col("dist2"), 6).as("dist2"))
      },
      oracle = Some(
        """WITH p AS (
          |  SELECT event_id AS id, (event_id % 800) / 8.0 AS x,
          |         ((user_id * 7) % 800) / 8.0 AS y
          |  FROM events),
          |a AS (SELECT * FROM p WHERE id % 499 = 0),
          |b AS (SELECT * FROM p WHERE id % 5 = 0)
          |SELECT a.id AS q_id, b.id AS p_id,
          |       round((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), 6) AS dist2
          |FROM a JOIN b
          |  ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 4.0""".stripMargin)),

    GraftQuery("q18_recursive_cte",
      // WITH RECURSIVE through the SQL entry point (new in Spark 4):
      // 8-step walk over a functional edge table (each node exactly one
      // successor, so the frontier never multiplies). Each recursion
      // step is one co-partitioned hash join; the oracle runs the
      // identical recursion in DuckDB.
      (s, dir) => {
        Tables.load(s, dir, "events").createOrReplaceTempView("events_v")
        s.sql(
          """WITH RECURSIVE
            |edges AS (
            |  SELECT DISTINCT user_id % 1000 AS src,
            |         (user_id % 1000 * 3 + 7) % 1000 AS dst
            |  FROM events_v),
            |walk(node, depth) AS (
            |  SELECT DISTINCT user_id % 1000, 0 FROM events_v
            |  UNION ALL
            |  SELECT e.dst, w.depth + 1
            |  FROM walk w JOIN edges e ON w.node = e.src
            |  WHERE w.depth < 8)
            |SELECT depth, count(*) AS n, sum(node) AS checksum,
            |       count(DISTINCT node) AS n_distinct
            |FROM walk GROUP BY depth""".stripMargin)
      },
      oracle = Some(
        """WITH RECURSIVE
          |edges AS (
          |  SELECT DISTINCT user_id % 1000 AS src,
          |         (user_id % 1000 * 3 + 7) % 1000 AS dst
          |  FROM events),
          |walk(node, depth) AS (
          |  SELECT DISTINCT user_id % 1000, 0 FROM events
          |  UNION ALL
          |  SELECT e.dst, w.depth + 1
          |  FROM walk w JOIN edges e ON w.node = e.src
          |  WHERE w.depth < 8)
          |SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS checksum,
          |       count(DISTINCT node) AS n_distinct
          |FROM walk GROUP BY depth""".stripMargin)),

    GraftQuery("a22_islands",
      // gaps-and-islands: per-user runs of consecutive active days via
      // the day − row_number() constant-per-run trick — one user_id
      // exchange carries (user, day) scalars through the window, the
      // run and per-user aggregates reuse that partitioning. Day index
      // is integer epoch arithmetic so both engines bucket identically.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // hash on user_id alone clusters (user_id, day) too, so ONE
        // explicit exchange serves the distinct, the window, and both
        // downstream aggregates (all group on a superset of user_id)
        val days = Tables.events(s, dir).select(col("user_id"),
            floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
          .repartition(col("user_id"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days.withColumn("grp", col("day") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
            min(col("start_day")).as("first_day"))
      },
      oracle = Some(
        """WITH days AS (
          |  SELECT DISTINCT user_id,
          |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
          |  FROM events),
          |runs AS (
          |  SELECT user_id, day,
          |         day - row_number() OVER
          |           (PARTITION BY user_id ORDER BY day) AS grp
          |  FROM days),
          |streaks AS (
          |  SELECT user_id, grp, count(*) AS len, min(day) AS start_day
          |  FROM runs GROUP BY 1, 2)
          |SELECT user_id, count(*) AS n_streaks, max(len) AS longest,
          |       min(start_day) AS first_day
          |FROM streaks GROUP BY user_id""".stripMargin)),

    GraftQuery("w11_running_distinct",
      // running count of DISTINCT event types per user — Spark windows
      // reject DISTINCT aggregates, so the classic rewrite: flag each
      // type's first occurrence (lag over a type-major sort), then a
      // running sum over the time-major sort. Both windows partition on
      // user_id alone, so ONE exchange feeds two sorts; the oracle is
      // DuckDB's NATIVE windowed count(DISTINCT) — an independent
      // engine feature checking the rewrite
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byType = Window.partitionBy(col("user_id"))
          .orderBy(col("event_type"), col("ts"), col("event_id"))
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("_first", when(lag(col("event_type"), 1).over(byType)
            .isNull || lag(col("event_type"), 1).over(byType) =!=
            col("event_type"), 1).otherwise(0))
          .select(col("event_id"), col("user_id"), col("ts"),
            sum(col("_first")).over(byTime).cast("int").as("n_distinct_types"))
      },
      oracle = Some(
        """SELECT event_id, user_id,
          |       make_timestamp(epoch_ns(ts)//1000) AS ts,
          |       CAST(count(DISTINCT event_type) OVER
          |         (PARTITION BY user_id ORDER BY ts, event_id
          |          ROWS UNBOUNDED PRECEDING) AS INT) AS n_distinct_types
          |FROM events""".stripMargin)),

    GraftQuery("w9_window_extras",
      // remaining rank-family breadth: cume_dist over the full
      // partition plus a running nth_value under the default
      // to-current-row frame — both off the same single user_id
      // exchange as every other window query
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir).select(col("user_id"), col("event_id"),
          round(cume_dist().over(w), 6).as("cd"),
          round(nth_value(col("value"), 2).over(w), 6).as("second_v"))
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       round(cume_dist() OVER w, 6) AS cd,
          |       round(nth_value(value, 2) OVER w, 6) AS second_v
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    GraftQuery("q19_bag_setops",
      // INTERSECT ALL / EXCEPT ALL — multiset semantics, a different
      // physical shape from q7's distinct set ops: Catalyst lowers both
      // to a replicate-count generate over a single count aggregate,
      // never a distinct. The two halves of the events table are the
      // bags; the oracle states the same ALL operators directly.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def half(m: Int) = ev.where(col("event_id") % 2 === m)
          .select((col("user_id") % 100).as("k"))
        val ia = half(0).intersectAll(half(1)).groupBy(col("k"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        val ea = half(0).exceptAll(half(1)).groupBy(col("k"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        ia.unionByName(ea)
      },
      oracle = Some(
        """WITH a AS (SELECT user_id % 100 AS k FROM events WHERE event_id % 2 = 0),
          |b AS (SELECT user_id % 100 AS k FROM events WHERE event_id % 2 = 1),
          |ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
          |ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
          |SELECT k, count(*) AS n, 'intersect_all' AS op FROM ia GROUP BY k
          |UNION ALL
          |SELECT k, count(*) AS n, 'except_all' AS op FROM ea GROUP BY k""".stripMargin)),

    GraftQuery("q20_having_in",
      // TPC-H Q18 shape: IN over a grouped-HAVING subquery — the
      // large-order drill-down. Catalyst turns the IN into a semi join
      // against the re-aggregated key set; quantities are
      // integer-valued doubles, so the HAVING threshold is exact in
      // both engines.
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer_v")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql(
          """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
            |       round(sum(l_quantity), 2) AS sum_qty
            |FROM customer_v, orders_v, lineitem_v
            |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_v
            |                     GROUP BY l_orderkey
            |                     HAVING sum(l_quantity) > 250)
            |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
            |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""".stripMargin)
      },
      oracle = Some(
        """SELECT c_name, c_custkey, o_orderkey, o_totalprice,
          |       round(sum(l_quantity), 2) AS sum_qty
          |FROM customer, orders, lineitem
          |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
          |                     GROUP BY l_orderkey
          |                     HAVING sum(l_quantity) > 250)
          |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""".stripMargin)),

    GraftQuery("q21_global_share",
      // TPC-H Q11 shape: groups gated against a scalar-subquery global
      // threshold. The gate is COUNT-based (integer-exact — a float-sum
      // threshold could flip membership on summation order, the q9
      // lesson); the reported share is rounded after the fact. The
      // scalar aggregate broadcasts as a 1-row relation.
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql(
          """SELECT o_orderpriority, count(*) AS n,
            |       round(sum(o_totalprice) /
            |             (SELECT sum(o_totalprice) FROM orders_v), 6) AS share
            |FROM orders_v
            |GROUP BY o_orderpriority
            |HAVING count(*) > (SELECT 0.19 * count(*) FROM orders_v)""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n,
          |       round(sum(o_totalprice) /
          |             (SELECT sum(o_totalprice) FROM orders), 6) AS share
          |FROM orders
          |GROUP BY o_orderpriority
          |HAVING count(*) > (SELECT 0.19 * count(*) FROM orders)""".stripMargin)),

    GraftQuery("a23_feature_scale",
      // per-group feature normalization (the ML-preprocessing staple):
      // z-score and min-max per event type, computed as window
      // aggregates over one event_type exchange — no stats-collect to
      // the driver, no join back. Rounded to the stddev tolerance.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
        Tables.events(s, dir).select(col("event_id"), col("event_type"),
          round((col("value") - avg(col("value")).over(w)) /
            stddev_samp(col("value")).over(w), 4).as("z"),
          round((col("value") - min(col("value")).over(w)) /
            (max(col("value")).over(w) - min(col("value")).over(w)), 6).as("mm"))
      },
      oracle = Some(
        """SELECT event_id, event_type,
          |       round((value - avg(value) OVER w) /
          |             stddev_samp(value) OVER w, 4) AS z,
          |       round((value - min(value) OVER w) /
          |             (max(value) OVER w - min(value) OVER w), 6) AS mm
          |FROM events
          |WINDOW w AS (PARTITION BY event_type)""".stripMargin)),

    GraftQuery("a24_seasonal_backtest",
      // forecast evaluation: seasonal-naive (ŷ_h = y_{h−24}) backtested
      // over the hourly click series on a dense spine (missing hours
      // count 0, so the lag is total). Counts are integers — MAE is
      // exact rational arithmetic in both engines. As in a17, the
      // unpartitioned window runs over the bounded spine, never the
      // fact table.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, dir)
          .where(col("event_type") === "click")
          .groupBy(floor(unix_timestamp(col("ts")) / 3600).cast("long").as("h"))
          .agg(count(lit(1)).as("n"))
        val spine = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(explode(sequence(col("h0"), col("h1"))).as("h"))
        val dense = spine.join(hourly, Seq("h"), "left")
          .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
        val f = lag(col("n"), 24).over(Window.orderBy(col("h")))
        dense.select(col("h"), col("n"), f.as("fc"))
          .where(col("fc").isNotNull)
          .agg(count(lit(1)).as("n_hours"),
            round(avg(abs(col("n") - col("fc"))), 6).as("mae"),
            sum(when(col("n") === col("fc"), 1L).otherwise(0L)).as("n_exact"))
      },
      oracle = Some(
        """WITH hourly AS (
          |  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS n
          |  FROM events WHERE event_type = 'click' GROUP BY 1),
          |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
          |spine AS (SELECT unnest(generate_series(h0, h1)) AS h FROM b),
          |dense AS (
          |  SELECT spine.h, coalesce(hourly.n, 0)::BIGINT AS n
          |  FROM spine LEFT JOIN hourly USING (h)),
          |bt AS (
          |  SELECT h, n, lag(n, 24) OVER (ORDER BY h) AS fc FROM dense)
          |SELECT count(*) AS n_hours, round(avg(abs(n - fc)), 6) AS mae,
          |       CAST(sum(CASE WHEN n = fc THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
          |FROM bt WHERE fc IS NOT NULL""".stripMargin))
  )

  /** Unrolled k-core peel for the g5 oracle: round r drops nodes whose
    * degree in e(r-1) is below k; once converged the remaining rounds
    * are no-ops, so a fixed unroll depth is exact as long as it covers
    * the peel depth (the operator's convergence guard enforces that).
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM (
        |    SELECT user_id AS src,
        |           user_id - user_id % 10 + event_id % 10 AS dst
        |    FROM events) t
        |  WHERE src <> dst)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
        |low$r AS MATERIALIZED (
        |  SELECT id FROM (
        |    SELECT a AS id FROM e${r - 1}
        |    UNION ALL SELECT b FROM e${r - 1}) t
        |  GROUP BY id HAVING count(*) < $k),
        |e$r AS MATERIALIZED (
        |  SELECT a, b FROM e${r - 1}
        |  WHERE a NOT IN (SELECT id FROM low$r)
        |    AND b NOT IN (SELECT id FROM low$r))""".stripMargin)
    }
    sb.append(s"""
      |SELECT id, CAST(count(*) AS INT) AS core_deg FROM (
      |  SELECT a AS id FROM e$rounds UNION ALL SELECT b FROM e$rounds) t
      |GROUP BY id""".stripMargin)
    sb.toString
  }

  /** Shared SQL for q25 (TPC-H Q2 shape), parameterized on table names so
    * the Spark temp-view and DuckDB oracle texts stay a single source.
    */
  private def q25Sql(part: String, supplier: String, nation: String,
      region: String, lineitem: String): String =
    s"""WITH supply AS (
       |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
       |         min(l_extendedprice / l_quantity) AS cost
       |  FROM $lineitem GROUP BY l_partkey, l_suppkey),
       |asia AS (
       |  SELECT s_suppkey, s_name, n_name
       |  FROM $supplier
       |  JOIN $nation ON s_nationkey = n_nationkey
       |  JOIN $region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA')
       |SELECT p_partkey, p_name, s_name, n_name, cost
       |FROM $part, supply, asia
       |WHERE p_partkey = partkey AND suppkey = s_suppkey
       |  AND p_size <= 5
       |  AND cost = (SELECT min(s2.cost)
       |              FROM supply s2 JOIN asia a2 ON s2.suppkey = a2.s_suppkey
       |              WHERE s2.partkey = p_partkey)""".stripMargin

  /** Shared SQL for q27 (TPC-H Q7 shape); `sfx` suffixes table names so
    * the Spark temp-view and DuckDB oracle texts stay a single source.
    */
  private def q27Sql(sfx: String): String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |       round(sum(volume), 2) AS revenue, count(*) AS n_rows
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         year(o_orderdate) AS l_year,
       |         l_extendedprice * (1 - l_discount) AS volume
       |  FROM supplier$sfx, lineitem$sfx, orders$sfx, customer$sfx,
       |       nation$sfx n1, nation$sfx n2
       |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))) shipping
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** Shared SQL for q28 (TPC-H Q8 shape). */
  private def q28Sql(sfx: String): String =
    s"""SELECT o_year,
       |       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) /
       |             sum(volume), 6) AS mkt_share
       |FROM (
       |  SELECT year(o_orderdate) AS o_year,
       |         l_extendedprice * (1 - l_discount) AS volume,
       |         n2.n_name AS nation
       |  FROM part$sfx, supplier$sfx, lineitem$sfx, orders$sfx,
       |       customer$sfx, nation$sfx n1, nation$sfx n2, region$sfx
       |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |    AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
       |    AND p_type = 'STANDARD') all_nations
       |GROUP BY o_year""".stripMargin

  /** Unrolled HITS iterations for the g6 oracle: each round pulls
    * authority from in-neighbor hubs, L2-normalizes, pulls hubs from
    * out-neighbor authorities, L2-normalizes — the exact expression
    * sequence [[graft.operators.GraphOps.hits]] evaluates.
    */
  private def hitsOracleSql(rounds: Int): String = {
    val sb = new StringBuilder(
      """WITH edges AS (
        |  SELECT DISTINCT user_id AS src,
        |         (user_id * 7 + event_id % 13) % 100 AS dst
        |  FROM events
        |  WHERE user_id != (user_id * 7 + event_id % 13) % 100),
        |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |s0 AS (SELECT id, 1.0 AS hub, 1.0 AS auth FROM nodes)""".stripMargin)
    for (r <- 1 to rounds) {
      val p = s"s${r - 1}"
      sb.append(s""",
        |a${r}raw AS (
        |  SELECT e.dst AS id, sum($p.hub) AS auth
        |  FROM edges e JOIN $p ON e.src = $p.id GROUP BY 1),
        |a$r AS (
        |  SELECT nodes.id, $p.hub, coalesce(a${r}raw.auth, 0.0) AS auth
        |  FROM nodes JOIN $p ON nodes.id = $p.id
        |  LEFT JOIN a${r}raw ON nodes.id = a${r}raw.id),
        |an$r AS (
        |  SELECT id, hub,
        |         auth / (SELECT sqrt(sum(auth * auth)) FROM a$r) AS auth
        |  FROM a$r),
        |h${r}raw AS (
        |  SELECT e.src AS id, sum(an$r.auth) AS hub
        |  FROM edges e JOIN an$r ON e.dst = an$r.id GROUP BY 1),
        |h$r AS (
        |  SELECT nodes.id, coalesce(h${r}raw.hub, 0.0) AS hub, an$r.auth
        |  FROM nodes LEFT JOIN h${r}raw ON nodes.id = h${r}raw.id
        |  JOIN an$r ON nodes.id = an$r.id),
        |s$r AS (
        |  SELECT id,
        |         hub / (SELECT sqrt(sum(hub * hub)) FROM h$r) AS hub, auth
        |  FROM h$r)""".stripMargin)
    }
    sb.append(s"""
      |SELECT id, round(hub, 6) AS hub, round(auth, 6) AS auth
      |FROM s$rounds""".stripMargin)
    sb.toString
  }

  /** Shared SQL for q32 (TPC-H Q17 shape). */
  private def q32Sql(sfx: String): String =
    s"""SELECT count(*) AS n_rows,
       |       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
       |FROM lineitem$sfx l JOIN part$sfx ON p_partkey = l.l_partkey
       |WHERE p_brand = 'Brand#9'
       |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
       |                      FROM lineitem$sfx l2
       |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** Shared SQL for q33 (TPC-H Q9 shape). */
  private def q33Sql(sfx: String): String =
    s"""WITH supply AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk,
       |         min(l_extendedprice / l_quantity) AS cost
       |  FROM lineitem$sfx GROUP BY l_partkey, l_suppkey)
       |SELECT n_name, o_year, round(sum(amount), 2) AS profit
       |FROM (
       |  SELECT n_name, year(o_orderdate) AS o_year,
       |         l_extendedprice * (1 - l_discount)
       |           - supply.cost * l_quantity AS amount
       |  FROM part$sfx, supplier$sfx, lineitem$sfx, orders$sfx,
       |       nation$sfx, supply
       |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |    AND supply.pk = l_partkey AND supply.sk = l_suppkey
       |    AND p_name LIKE '%bolt%') profit
       |GROUP BY n_name, o_year""".stripMargin

  /** Shared SQL for q31 (TPC-H Q15 shape). */
  private def q31Sql(sfx: String): String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total
       |  FROM lineitem$sfx
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total
       |FROM supplier$sfx JOIN rev ON s_suppkey = l_suppkey
       |WHERE total = (SELECT max(total) FROM rev)""".stripMargin

  /** Shared SQL for q29 (TPC-H Q22 shape). */
  private def q29Sql(sfx: String): String =
    s"""SELECT code, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
       |FROM (SELECT c_custkey, c_acctbal, c_nationkey % 10 AS code
       |      FROM customer$sfx) c
       |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer$sfx
       |                   WHERE c_acctbal > 0)
       |  AND NOT EXISTS (SELECT 1 FROM orders$sfx o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderpriority = '1-URGENT')
       |GROUP BY code""".stripMargin

  /** Shared SQL for q30 (TPC-H Q10 shape). */
  private def q30Sql(sfx: String): String =
    s"""SELECT c_custkey, c_name, revenue FROM (
       |  SELECT c_custkey, c_name,
       |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       |  FROM customer$sfx, orders$sfx, lineitem$sfx
       |  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |    AND l_returnflag = 'R'
       |  GROUP BY c_custkey, c_name) t
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Shared SQL for q26 (TPC-H Q20 shape). */
  private def q26Sql(supplier: String, part: String, lineitem: String): String =
    s"""SELECT s_suppkey, s_name
       |FROM $supplier
       |WHERE s_suppkey IN (
       |  SELECT l.l_suppkey
       |  FROM $lineitem l JOIN $part ON l.l_partkey = p_partkey
       |  WHERE p_type = 'PROMO'
       |    AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |    AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
       |  GROUP BY l.l_suppkey, l.l_partkey
       |  HAVING sum(l.l_quantity) > 0.3 * (
       |    SELECT sum(l2.l_quantity) FROM $lineitem l2
       |    WHERE l2.l_partkey = l.l_partkey
       |      AND l2.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       |      AND l2.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'))""".stripMargin
}
