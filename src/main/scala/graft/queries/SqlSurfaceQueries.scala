package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the SQL DDL/DML surface
  * ([[graft.sources.GraftCatalog]] + [[graft.plans.GraftDmlRule]]):
  * each query drives a real `spark.sql` statement sequence — CREATE
  * TABLE / INSERT INTO / MERGE INTO / UPDATE / DELETE — against a
  * catalog-managed warehouse table seeded from the TPC-H-ish inputs,
  * then returns the table's final content; the DuckDB oracle
  * recomputes the same final state relationally from the same parquet.
  * This is the end-to-end witness that a reference user's SQL
  * warehouse workflow (BigQuery DDL/DML on the destination) runs on
  * the graft engine verbatim.
  *
  * Each run creates its tables fresh under a per-JVM temp warehouse
  * (names are per-query), so results are deterministic and re-runnable.
  */
object SqlSurfaceQueries extends QueryPack {

  /** Per-JVM catalog warehouse (the catalog caches its instance on
    * first reference, so the location is fixed once per process).
    */
  private lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft-sql-surface").toString

  /** Register the `gsql` catalog lazily (v2 catalogs instantiate from
    * the CURRENT conf on first reference, so a runtime set works; the
    * DML rule itself rides in via spark.sql.extensions, which
    * [[graft.Verify]]/[[graft.Bench]] set at session build).
    */
  private def withCatalog(s: SparkSession): Unit = {
    s.conf.set("spark.sql.catalog.gsql", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gsql.warehouse", warehouse)
  }

  /** customer with the derived slice day the arms route on. */
  private def customerView(s: SparkSession, dir: String, view: String): Unit = {
    Tables.load(s, dir, "customer").select(
      col("c_custkey").as("k"), col("c_name").as("nm"),
      col("c_acctbal").cast("double").as("acct"),
      concat(lit("2024-01-0"), (col("c_custkey") % 3 + 1).cast("string"))
        .as("_pday"))
      .createOrReplaceTempView(view)
    ()
  }

  private val custDaySql =
    "'2024-01-0' || CAST(c_custkey % 3 + 1 AS VARCHAR)"

  override def queries: Seq[GraftQuery] = Seq(

    // CREATE + INSERT INTO ... SELECT + pruned SELECT through the catalog
    GraftQuery("c1_sql_catalog_roundtrip",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c1_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c1")
        s.sql("""CREATE TABLE gsql.db.c1 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c1 SELECT k, nm, acct, _pday FROM c1_customer")
        s.sql("SELECT k, nm, acct FROM gsql.db.c1 WHERE _pday = '2024-01-02'")
      },
      oracle = Some(
        s"""SELECT c_custkey AS k, c_name AS nm,
           |       CAST(c_acctbal AS DOUBLE) AS acct
           |FROM customer WHERE $custDaySql = '2024-01-02'""".stripMargin)),

    // SQL UPDATE + DELETE routed to the file-granular executors
    GraftQuery("c2_sql_update_delete",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c2_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c2")
        s.sql("""CREATE TABLE gsql.db.c2 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c2 SELECT k, nm, acct, _pday FROM c2_customer")
        s.sql("UPDATE gsql.db.c2 SET acct = acct * 2 WHERE k % 5 = 0")
        s.sql("DELETE FROM gsql.db.c2 WHERE k % 7 = 0")
        s.sql("SELECT k, nm, acct, _pday FROM gsql.db.c2")
      },
      oracle = Some(
        s"""SELECT c_custkey AS k, c_name AS nm,
           |       CAST(CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
           |                 ELSE c_acctbal END AS DOUBLE) AS acct,
           |       $custDaySql AS _pday
           |FROM customer WHERE c_custkey % 7 <> 0""".stripMargin)),

    // SQL MERGE INTO: ordered conditional clauses (DELETE / UPDATE /
    // INSERT *) — seed odd keys, merge the %3==0 slice with bumped
    // balances; DELETE fires where the bumped balance goes negative
    GraftQuery("c3_sql_merge_clauses",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c3_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c3")
        s.sql("""CREATE TABLE gsql.db.c3 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("""INSERT INTO gsql.db.c3
                |SELECT k, nm, acct, _pday FROM c3_customer WHERE k % 2 = 1""".stripMargin)
        s.sql("""MERGE INTO gsql.db.c3 t
                |USING (SELECT k, nm, acct - 5000 AS acct, _pday
                |       FROM c3_customer WHERE k % 3 = 0) s
                |ON t.k = s.k
                |WHEN MATCHED AND s.acct < 0 THEN DELETE
                |WHEN MATCHED THEN UPDATE SET acct = s.acct
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.sql("SELECT k, nm, acct, _pday FROM gsql.db.c3")
      },
      oracle = Some(
        s"""WITH seed AS (
           |  SELECT c_custkey AS k, c_name AS nm,
           |         CAST(c_acctbal AS DOUBLE) AS acct,
           |         $custDaySql AS _pday
           |  FROM customer WHERE c_custkey % 2 = 1),
           |src AS (
           |  SELECT c_custkey AS k, c_name AS nm,
           |         CAST(c_acctbal - 5000 AS DOUBLE) AS acct,
           |         $custDaySql AS _pday
           |  FROM customer WHERE c_custkey % 3 = 0)
           |SELECT coalesce(seed.k, src.k) AS k,
           |       CASE WHEN seed.k IS NULL THEN src.nm ELSE seed.nm END AS nm,
           |       CASE WHEN src.k IS NULL THEN seed.acct ELSE src.acct END AS acct,
           |       CASE WHEN seed.k IS NULL THEN src._pday ELSE seed._pday END AS _pday
           |FROM seed FULL OUTER JOIN src ON seed.k = src.k
           |WHERE NOT (seed.k IS NOT NULL AND src.k IS NOT NULL AND src.acct < 0)""".stripMargin)),

    // SQL MERGE INTO: NOT MATCHED BY SOURCE sweep (update stale rows,
    // delete a keyed slice of them)
    GraftQuery("c4_sql_merge_by_source",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c4_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c4")
        s.sql("""CREATE TABLE gsql.db.c4 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c4 SELECT k, nm, acct, _pday FROM c4_customer")
        s.sql("""MERGE INTO gsql.db.c4 t
                |USING (SELECT k FROM c4_customer WHERE k % 2 = 0) s
                |ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET nm = concat(t.nm, '+')
                |WHEN NOT MATCHED BY SOURCE AND t.k % 11 = 0 THEN DELETE
                |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET nm = 'stale'""".stripMargin)
        s.sql("SELECT k, nm, acct, _pday FROM gsql.db.c4")
      },
      oracle = Some(
        s"""SELECT c_custkey AS k,
           |       CASE WHEN c_custkey % 2 = 0 THEN c_name || '+'
           |            ELSE 'stale' END AS nm,
           |       CAST(c_acctbal AS DOUBLE) AS acct,
           |       $custDaySql AS _pday
           |FROM customer
           |WHERE NOT (c_custkey % 2 <> 0 AND c_custkey % 11 = 0)""".stripMargin)),

    // CALL zonemaps: the data-skipping sidecars as a SQL-visible
    // relation — per-day [min, max, non_null] of the key column, which
    // the oracle recomputes as a plain grouped aggregate
    GraftQuery("c5_sql_call_zonemaps",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c5_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c5")
        s.sql("""CREATE TABLE gsql.db.c5 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c5 SELECT k, nm, acct, _pday FROM c5_customer")
        s.sql("CALL gsql.system.zonemaps('db.c5', 'k')")
      },
      oracle = Some(
        s"""SELECT $custDaySql AS day,
           |       CAST(min(c_custkey) AS VARCHAR) AS min_value,
           |       CAST(max(c_custkey) AS VARCHAR) AS max_value,
           |       count(c_custkey) AS non_null
           |FROM customer GROUP BY 1""".stripMargin)),

    // Star join through catalog tables in pure SQL: a day-filtered fact
    // joins a small dimension. The fact side's _pday predicate prunes at
    // the scan, and the dim's day-pruned size estimate (the scan-stats
    // rule) makes the join an auto-broadcast — the plan shape that keeps
    // a 100 TB fact⨝dim star query shuffle-free on the fact side.
    // Aggregates are exact integers so the hash compare is stable.
    GraftQuery("c6_sql_star_join",
      (s, dir) => {
        withCatalog(s)
        Tables.load(s, dir, "orders").select(
          col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
          concat(lit("2024-01-0"), (col("o_orderkey") % 5 + 1).cast("string"))
            .as("_pday"))
          .createOrReplaceTempView("c6_orders")
        Tables.load(s, dir, "customer").select(
          col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          lit("2024-01-01").as("_pday"))
          .createOrReplaceTempView("c6_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c6f")
        s.sql("DROP TABLE IF EXISTS gsql.db.c6d")
        s.sql("""CREATE TABLE gsql.db.c6f (ok BIGINT, ck BIGINT, _pday STRING)
                |USING graft TBLPROPERTIES ('keys' = 'ok')""".stripMargin)
        s.sql("""CREATE TABLE gsql.db.c6d (k BIGINT, seg STRING, _pday STRING)
                |USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c6f SELECT ok, ck, _pday FROM c6_orders")
        s.sql("INSERT INTO gsql.db.c6d SELECT k, seg, _pday FROM c6_customer")
        s.sql("""SELECT d.seg AS seg, count(*) AS n, sum(f.ok) AS keysum
                |FROM gsql.db.c6f f JOIN gsql.db.c6d d ON f.ck = d.k
                |WHERE f._pday = '2024-01-03'
                |GROUP BY d.seg""".stripMargin)
      },
      oracle = Some(
        """SELECT c.c_mktsegment AS seg, count(*) AS n,
          |       CAST(sum(o.o_orderkey) AS BIGINT) AS keysum
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |WHERE '2024-01-0' || CAST(o.o_orderkey % 5 + 1 AS VARCHAR)
          |      = '2024-01-03'
          |GROUP BY 1""".stripMargin)),

    // Day-scoped backfill: INSERT OVERWRITE PARTITION replaces exactly
    // one day slice in one commit (doubled balances, odd keys dropped),
    // every other day untouched — the classic warehouse recompute job
    GraftQuery("c7_sql_backfill_overwrite",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c7_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c7")
        s.sql("""CREATE TABLE gsql.db.c7 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c7 SELECT k, nm, acct, _pday FROM c7_customer")
        s.sql("""INSERT OVERWRITE gsql.db.c7 PARTITION (_pday = '2024-01-02')
                |SELECT k, nm, acct * 2 AS acct FROM c7_customer
                |WHERE _pday = '2024-01-02' AND k % 2 = 0""".stripMargin)
        s.sql("SELECT k, nm, acct, _pday FROM gsql.db.c7")
      },
      oracle = Some(
        s"""SELECT c_custkey AS k, c_name AS nm,
           |       CAST(CASE WHEN $custDaySql = '2024-01-02'
           |                 THEN c_acctbal * 2 ELSE c_acctbal END
           |            AS DOUBLE) AS acct,
           |       $custDaySql AS _pday
           |FROM customer
           |WHERE $custDaySql <> '2024-01-02' OR c_custkey % 2 = 0""".stripMargin)),

    // Metadata-only COUNT(*): the day-ranged ungrouped count collapses
    // into the scan (parquet-footer sum over the pruned days — zero
    // data read); the oracle recomputes it the slow relational way
    GraftQuery("c8_sql_metadata_count",
      (s, dir) => {
        withCatalog(s)
        customerView(s, dir, "c8_customer")
        s.sql("DROP TABLE IF EXISTS gsql.db.c8")
        s.sql("""CREATE TABLE gsql.db.c8 (k BIGINT, nm STRING, acct DOUBLE,
                |  _pday STRING) USING graft TBLPROPERTIES ('keys' = 'k')""".stripMargin)
        s.sql("INSERT INTO gsql.db.c8 SELECT k, nm, acct, _pday FROM c8_customer")
        s.sql("CALL gsql.system.zonemaps('db.c8', 'k')")
        s.sql("""SELECT count(*) AS n, min(k) AS mn, max(k) AS mx
                |FROM gsql.db.c8 WHERE _pday >= '2024-01-02'""".stripMargin)
      },
      oracle = Some(
        s"""SELECT count(*) AS n, min(c_custkey) AS mn, max(c_custkey) AS mx
           |FROM customer WHERE $custDaySql >= '2024-01-02'""".stripMargin)))
}
