package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution profile for q33 at a given dir: times each
  * sub-plan with the noop sink so the expensive piece is identifiable
  * (guide §1: measure first). Usage: runMain graft.tools.ProfileQ33 <dir>
  */
object ProfileQ33 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq("part", "supplier", "lineitem", "orders", "nation")
      .foreach(t => graft.Tables.load(spark, dir, t).createOrReplaceTempView(s"${t}_v"))
    def time(label: String, sql: String): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      println(f"[q33prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    val priced =
      """SELECT l_suppkey, l_orderkey, l_quantity, l_extendedprice, l_discount,
        |       min(l_extendedprice / l_quantity)
        |         OVER (PARTITION BY l_partkey, l_suppkey) AS cost
        |FROM lineitem_v, part_v
        |WHERE p_partkey = l_partkey AND p_name LIKE '%bolt%'""".stripMargin
    // warm (codegen + page cache)
    time("scan_lineitem(warm)", "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount FROM lineitem_v")
    time("scan_lineitem", "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_discount FROM lineitem_v")
    time("bolt_join", "SELECT l_suppkey, l_orderkey, l_quantity, l_extendedprice, l_discount FROM lineitem_v, part_v WHERE p_partkey = l_partkey AND p_name LIKE '%bolt%'")
    time("bolt_join+window", priced)
    time("+supplier", s"SELECT s_nationkey, p.* FROM ($priced) p JOIN supplier_v ON s_suppkey = l_suppkey")
    time("+orders", s"SELECT o_orderdate, p.* FROM ($priced) p JOIN orders_v ON o_orderkey = l_orderkey")
    time("scan_orders", "SELECT o_orderkey, o_orderdate FROM orders_v")
    time("full_q33",
      s"""SELECT n_name, o_year, round(sum(amount), 2) AS profit
         |FROM (
         |  SELECT n_name, year(o_orderdate) AS o_year,
         |         l_extendedprice * (1 - l_discount) - cost * l_quantity AS amount
         |  FROM supplier_v, ($priced) priced, orders_v, nation_v
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND s_nationkey = n_nationkey) profit
         |GROUP BY n_name, o_year""".stripMargin)
    time("q33_yearproj",
      s"""SELECT n_name, o_year, round(sum(amount), 2) AS profit
         |FROM (
         |  SELECT n_name, o_year,
         |         l_extendedprice * (1 - l_discount) - cost * l_quantity AS amount
         |  FROM supplier_v, ($priced) priced,
         |       (SELECT o_orderkey, year(o_orderdate) AS o_year FROM orders_v) o,
         |       nation_v
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND s_nationkey = n_nationkey) profit
         |GROUP BY n_name, o_year""".stripMargin)
    time("q33_shj",
      s"""SELECT /*+ SHUFFLE_HASH(priced) */ n_name, o_year, round(sum(amount), 2) AS profit
         |FROM (
         |  SELECT n_name, year(o_orderdate) AS o_year,
         |         l_extendedprice * (1 - l_discount) - cost * l_quantity AS amount
         |  FROM supplier_v, ($priced) priced, orders_v, nation_v
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND s_nationkey = n_nationkey) profit
         |GROUP BY n_name, o_year""".stripMargin)
    spark.stop()
  }
}
