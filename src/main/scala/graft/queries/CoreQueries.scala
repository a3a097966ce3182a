package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

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
          |FROM ev e JOIN dim d USING (bucket)""".stripMargin))
  )
}
