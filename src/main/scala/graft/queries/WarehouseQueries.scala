package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.operators.MergeOps
import graft.sources.WarehouseTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Oracle-checked end-to-end warehouse cycle (S3 append + S6 create +
  * partition-pruned MERGE): seed a day-partitioned on-disk table from the
  * first half of the `events` stream, merge-flush the second half, read
  * the final table state back. This is the full reference lifecycle
  * (`BigQuerySinkTask.put` → stage → `MergeQueries.mergeFlush`) against
  * real partitioned storage instead of in-memory frames.
  */
object WarehouseQueries extends QueryPack {

  private val Split = 5000L

  private def stagedAll(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      struct(col("user_id").as("k")).as("key"),
      when(col("event_type") =!= "error",
        struct(col("event_type").as("v_type"), col("value").as("v_amount"))).as("value"),
      col("event_id").as("i"),
      timestamp_micros(expr("ts div 1000")).as("partitionTime"),
      lit(0L).as("batchNumber"))

  private val destSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("v_type", StringType),
    StructField("v_amount", DoubleType)))

  /** Staged-events + seed-state (`d0`) CTEs shared by the merge-cycle
    * oracles and the time-travel oracle (s10 reads the seed state BACK
    * from snapshot v1, so its expected rows are exactly `d0`).
    */
  private val stagedD0Cte =
    """WITH staged AS (
      |  SELECT user_id AS k, event_id AS i,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS v_type,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_amount,
      |         make_timestamp(epoch_ns(ts)//1000) AS pt
      |  FROM events),
      |d0 AS (
      |  SELECT k, v_type, v_amount, strftime(pt, '%Y-%m-%d') AS pday FROM (
      |    SELECT k, v_type, v_amount, pt,
      |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
      |    FROM staged WHERE i < 5000) t
      |  WHERE rn = 1 AND v_type IS NOT NULL)""".stripMargin

  /** The full seed+merge cycle as CTEs, final state in `fin` — shared
    * by the merge-cycle oracles and the CDC diff oracle.
    */
  private val mergeCycleCtes = stagedD0Cte +
    """,
      |s1 AS (
      |  SELECT k, v_type, v_amount, strftime(pt, '%Y-%m-%d') AS pday FROM (
      |    SELECT k, v_type, v_amount, pt,
      |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
      |    FROM staged WHERE i >= 5000) t
      |  WHERE rn = 1),
      |fin AS (
      |  SELECT coalesce(s1.k, d0.k) AS k,
      |         CASE WHEN s1.k IS NOT NULL THEN s1.v_type ELSE d0.v_type END AS v_type,
      |         CASE WHEN s1.k IS NOT NULL THEN s1.v_amount ELSE d0.v_amount END AS v_amount,
      |         coalesce(d0.pday, s1.pday) AS pday
      |  FROM d0 FULL OUTER JOIN s1 ON d0.k = s1.k
      |  WHERE NOT (s1.k IS NOT NULL AND s1.v_type IS NULL))""".stripMargin

  /** Final-state SQL shared by s6 (LINEAR) and s8 (ZORDER): the file
    * layout must never change table contents.
    */
  private val mergeCycleOracle = mergeCycleCtes +
    "\nSELECT k, v_type, v_amount, pday FROM fin"

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery("s8_zorder_merge",
      (s, dir) => {
        // same seed + merge cycle as s6, but the table is z-order
        // clustered on (k, v_amount): proves the Morton layout changes
        // only file placement, never merge results
        val root = Files.createTempDirectory("graft-wh").toString + "/events_z"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema,
          graft.sources.TableOptions(clusteringFields = Seq("k", "v_amount"),
            layout = "ZORDER"))
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        t.read().select(col("k"), col("v_type"), col("v_amount"),
          col("_pday").cast("string").as("pday"))
      },
      oracle = Some(mergeCycleOracle)),

    GraftQuery("s21_zone_map_prune",
      // zone-map data skipping: raw events land in a day-partitioned
      // table, then a range read on event_id — ids are time-correlated,
      // so the lazy per-day [min,max] maps prune most partitions before
      // any scan plan is built (asserted in-flight: candidates < days).
      // The pruned read must equal the plain filter — zone maps are a
      // superset filter, like the bloom probe
      (s, dir) => {
        val root = Files.createTempDirectory("graft-wh").toString + "/events_zm"
        val evSchema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val t = WarehouseTable.create(s, root, Seq("event_id"), evSchema)
        t.append(Tables.load(s, dir, "events").select(
          col("event_id"), col("event_type"), col("value"),
          timestamp_micros(expr("ts div 1000")).as("partitionTime")))
        val total = t.listDays().size
        val cand = t.rangeCandidateDays("event_id", 100L, 299L).size
        require(cand < total, s"zone maps pruned nothing: $cand of $total days")
        // read through the `graft` connector: the pushed BETWEEN range
        // hits the SAME zone-map sidecars inside GraftFileIndex (the
        // rangeCandidateDays call above built them), so the day
        // skipping is now implicit in any tool's pushed predicate —
        // GraftDataSourceSpec + PlanAuditSpec pin the scan count
        s.read.format("graft").load(root)
          .where(col("event_id").between(100L, 299L))
          .select(col("event_id"), col("event_type"), col("value"),
            col("_pday").cast("string").as("pday"))
      },
      oracle = Some(
        """SELECT event_id, event_type, value,
          |       strftime(make_timestamp(epoch_ns(ts)//1000), '%Y-%m-%d') AS pday
          |FROM events WHERE event_id BETWEEN 100 AND 299""".stripMargin)),

    GraftQuery("s25_delete_where",
      // predicate DELETE: land events in a day-partitioned table, then
      // DELETE WHERE (type OR value range) — only days holding matches
      // are rewritten (asserted in-flight); survivors are exactly the
      // rows where the predicate is not TRUE (SQL DELETE semantics)
      (s, dir) => {
        val root = Files.createTempDirectory("graft-wh").toString + "/events_dw"
        val evSchema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val t = WarehouseTable.create(s, root, Seq("event_id"), evSchema)
        t.append(Tables.load(s, dir, "events").select(
          col("event_id"), col("event_type"), col("value"),
          timestamp_micros(expr("ts div 1000")).as("partitionTime")))
        val before = t.currentVersion
        val touched = t.deleteWhere(
          col("event_type") === "click" || col("value") > 400.0)
        require(touched.nonEmpty, "delete matched nothing — query vacuous")
        require(t.readAsOf(before).count() > t.read().count(),
          "pre-delete snapshot must still hold the deleted rows")
        t.read().select(col("event_id"), col("event_type"), col("value"),
          col("_pday").cast("string").as("pday"))
      },
      oracle = Some(
        """SELECT event_id, event_type, value,
          |       strftime(make_timestamp(epoch_ns(ts)//1000), '%Y-%m-%d') AS pday
          |FROM events
          |WHERE NOT (event_type = 'click' OR value > 400.0)""".stripMargin)),

    GraftQuery("s26_update_where",
      // predicate UPDATE: all assignments evaluate against the OLD row
      // (SQL semantics), only days holding matches rewrite, keys stay
      // untouched so the day blooms remain exact
      (s, dir) => {
        val root = Files.createTempDirectory("graft-wh").toString + "/events_uw"
        val evSchema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType)))
        val t = WarehouseTable.create(s, root, Seq("event_id"), evSchema)
        t.append(Tables.load(s, dir, "events").select(
          col("event_id"), col("event_type"), col("value"),
          timestamp_micros(expr("ts div 1000")).as("partitionTime")))
        val before = t.currentVersion
        val touched = t.updateWhere(col("event_type") === "error",
          Map("event_type" -> lit("error_archived"),
            "value" -> (col("value") * -1.0)))
        require(touched.nonEmpty, "update matched nothing — query vacuous")
        require(t.readAsOf(before)
          .where(col("event_type") === "error").count() > 0,
          "pre-update snapshot must still hold the original rows")
        t.read().select(col("event_id"), col("event_type"), col("value"),
          col("_pday").cast("string").as("pday"))
      },
      oracle = Some(
        """SELECT event_id,
          |       CASE WHEN event_type = 'error' THEN 'error_archived'
          |            ELSE event_type END AS event_type,
          |       CASE WHEN event_type = 'error' THEN value * -1.0
          |            ELSE value END AS value,
          |       strftime(make_timestamp(epoch_ns(ts)//1000), '%Y-%m-%d') AS pday
          |FROM events""".stripMargin)),

    GraftQuery("s10_time_travel",
      (s, dir) => {
        // seed (snapshot v1) then merge the second half (v2, which
        // archives the replaced partition generations) — and read
        // snapshot v1 BACK: time travel must reproduce the pre-merge
        // table bit-for-bit, which is exactly the oracle's d0 state
        val root = Files.createTempDirectory("graft-wh").toString + "/events_tt"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema)
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        // time travel through the `graft` connector (versionAsOf): the
        // same per-file archive resolution as readAsOf, consumable
        // from plain spark.read/SQL — oracle rows unchanged
        s.read.format("graft").option("versionAsOf", "1").load(root)
          .select(col("k"), col("v_type"), col("v_amount"),
            col("_pday").cast("string").as("pday"))
      },
      oracle = Some(stagedD0Cte +
        "\nSELECT k, v_type, v_amount, pday FROM d0")),

    GraftQuery("s15_restore",
      (s, dir) => {
        // seed (v1), merge the second half (v2), then RESTORE to v1 as a
        // new commit (v3) and read the LIVE table: it must reproduce the
        // seed exactly — and the pre-restore state must still be
        // time-travelable (asserted in-flight; the oracle pins the
        // restored live state)
        val root = Files.createTempDirectory("graft-wh").toString + "/events_rst"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema)
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        // at tiny SFs the second half is empty and the merge is a no-op
        // (no snapshot committed, same note as s11): the restore is then
        // itself a no-op and there is no pre-restore version to pin
        val preRestore = t.currentVersion
        t.restore(1)
        if (preRestore > 1L)
          require(t.readAsOf(preRestore).count() > 0, "pre-restore snapshot lost")
        t.read().select(col("k"), col("v_type"), col("v_amount"),
          col("_pday").cast("string").as("pday"))
      },
      oracle = Some(stagedD0Cte +
        "\nSELECT k, v_type, v_amount, pday FROM d0")),

    GraftQuery("s11_table_diff",
      (s, dir) => {
        // CDC read across the merge: the v1→v2 diff must be exactly the
        // rows the merge added minus the rows it replaced/deleted —
        // EXCEPT ALL of the oracle's seed (d0) and final (fin) states
        val root = Files.createTempDirectory("graft-wh").toString + "/events_cdc"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema)
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        // at tiny SFs the second half is empty and the merge is a no-op
        // (no snapshot committed): diff to the actual head, which the
        // oracle mirrors as fin == d0 → empty diff
        t.tableDiff(1, t.currentVersion).select(col("change_type"), col("k"),
          col("v_type"), col("v_amount"), col("_pday").cast("string").as("pday"))
      },
      oracle = Some(mergeCycleCtes +
        """
          |SELECT 'added' AS change_type, k, v_type, v_amount, pday FROM (
          |  SELECT k, v_type, v_amount, pday FROM fin
          |  EXCEPT ALL SELECT k, v_type, v_amount, pday FROM d0) a
          |UNION ALL
          |SELECT 'removed', k, v_type, v_amount, pday FROM (
          |  SELECT k, v_type, v_amount, pday FROM d0
          |  EXCEPT ALL SELECT k, v_type, v_amount, pday FROM fin) r""".stripMargin)),

    GraftQuery("s13_incremental_agg",
      (s, dir) => {
        // materialized-view refresh: aggregate the SEED state once, then
        // roll the merge's CDC diff into it — the result must equal
        // aggregating the final table directly (the oracle's derivation)
        val root = Files.createTempDirectory("graft-wh").toString + "/events_mv"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema)
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        val base = graft.operators.ViewMaintenance.aggregate(
          t.readAsOf(1), Seq("v_type"), "v_amount")
        val diff = t.tableDiff(1, t.currentVersion)
        graft.operators.ViewMaintenance.applyDiff(base, diff, Seq("v_type"), "v_amount")
          .select(col("v_type"), col("n"), round(col("total"), 6).as("total"))
      },
      oracle = Some(mergeCycleCtes +
        """
          |SELECT v_type, count(*) AS n, round(sum(v_amount), 6) AS total
          |FROM fin GROUP BY v_type""".stripMargin)),

    GraftQuery("s20_hll_distinct_view",
      // incremental DISTINCT view via re-aggregatable sketch state:
      // per-(user, day) HLL sketches roll up to per-user distinct
      // event-type counts by unioning sketch bytes — a refresh appends
      // new day-strata and re-unions, never re-scanning history. The
      // exact oracle is valid because Datasketches HLL is exact below
      // its coupon-list bound and event_type has 5 distinct values;
      // the error bound at real cardinality is spec'd separately.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("day", to_date(col("ts")))
        val sketches = graft.operators.ViewMaintenance.distinctSketches(
          ev, Seq("user_id", "day"), "event_type")
        graft.operators.ViewMaintenance.mergeDistinct(
          sketches, Seq("user_id"), "n_types")
      },
      oracle = Some(
        """SELECT user_id, count(DISTINCT event_type) AS n_types
          |FROM events GROUP BY user_id""".stripMargin)),

    GraftQuery("s19_minmax_view_refresh",
      // NON-additive view refresh: min/max per type can't apply the
      // diff arithmetically (a removed max doesn't subtract), so only
      // the groups the merge's changeset touched re-aggregate from the
      // final table — untouched groups keep their seed-state rows. The
      // oracle derives min/max from the final state directly
      (s, dir) => {
        val root = Files.createTempDirectory("graft-wh").toString + "/events_mm"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema)
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        val oldAgg = t.readAsOf(1).groupBy(col("v_type"))
          .agg(min(col("v_amount")).as("vmin"), max(col("v_amount")).as("vmax"))
        val diff = t.tableDiff(1, t.currentVersion)
        graft.operators.ViewMaintenance.refreshMinMax(
          oldAgg, t.read(), diff, Seq("v_type"), "v_amount")
      },
      oracle = Some(mergeCycleCtes +
        """
          |SELECT v_type, min(v_amount) AS vmin, max(v_amount) AS vmax
          |FROM fin GROUP BY v_type""".stripMargin)),

    GraftQuery("s18_join_view_maintain",
      (s, dir) => {
        // materialized JOIN-view refresh: facts (keyed by user) and a
        // dim (keyed by event type, attr = latest user to emit it) each
        // run their own seed + merge cycle; the view over the SEED
        // states is then maintained from both tables' CDC diffs via the
        // bilinear delta (dA·B + A·dB + dA·dB) and must equal joining
        // the FINAL states directly — which is the oracle's derivation
        val rootA = Files.createTempDirectory("graft-wh").toString + "/facts_jv"
        val rootB = Files.createTempDirectory("graft-wh").toString + "/dim_jv"
        val all = stagedAll(s, dir)
        val tA = WarehouseTable.create(s, rootA, Seq("k"), destSchema)
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        tA.append(d0)
        tA.merge(all.where(col("i") >= Split))
        val dimStaged = Tables.load(s, dir, "events")
          .where(col("event_type") =!= "error")
          .select(struct(col("event_type").as("t")).as("key"),
            struct(col("user_id").as("attr")).as("value"),
            col("event_id").as("i"),
            timestamp_micros(expr("ts div 1000")).as("partitionTime"),
            lit(0L).as("batchNumber"))
        val dimSchema = StructType(Seq(
          StructField("t", StringType), StructField("attr", LongType)))
        val tB = WarehouseTable.create(s, rootB, Seq("t"), dimSchema)
        val b0 = MergeOps.latestPerKey(dimStaged.where(col("i") < Split))
          .select(col("key.t").as("t"), col("value.attr").as("attr"),
            col("partitionTime"))
        tB.append(b0)
        tB.merge(dimStaged.where(col("i") >= Split))
        val aOld = tA.readAsOf(1).select(col("k"), col("v_type"), col("v_amount"))
        val bOld = tB.readAsOf(1).select(col("t").as("v_type"), col("attr"))
        val aDiff = tA.tableDiff(1, tA.currentVersion)
          .select(col("change_type"), col("k"), col("v_type"), col("v_amount"))
        val bDiff = tB.tableDiff(1, tB.currentVersion)
          .select(col("change_type"), col("t").as("v_type"), col("attr"))
        val viewOld = aOld.join(bOld, "v_type")
          .select(col("k"), col("v_type"), col("v_amount"), col("attr"))
        graft.operators.ViewMaintenance.applyJoinDiff(
            viewOld, aDiff, bDiff, aOld, bOld, Seq("v_type"))
          .select(col("k"), col("v_type"),
            round(col("v_amount"), 6).as("v_amount"), col("attr"))
      },
      oracle = Some(mergeCycleCtes +
        """,
          |dstaged AS (
          |  SELECT event_type AS t, event_id AS i, user_id AS attr
          |  FROM events WHERE event_type <> 'error'),
          |dimfin AS (
          |  SELECT t, attr FROM (
          |    SELECT t, attr, row_number() OVER (PARTITION BY t ORDER BY i DESC) AS rn
          |    FROM dstaged) x
          |  WHERE rn = 1)
          |SELECT fin.k, fin.v_type, round(fin.v_amount, 6) AS v_amount, dimfin.attr
          |FROM fin JOIN dimfin ON fin.v_type = dimfin.t""".stripMargin)),

    GraftQuery("s12_csv_roundtrip",
      // CSV source/sink fidelity: the documents table (free text with
      // quotes/commas) written to CSV by the engine and read back with
      // an explicit schema must reproduce the parquet source exactly —
      // the oracle just reads the original table
      (s, dir) => {
        val out = Files.createTempDirectory("graft-csv").toString + "/docs"
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").option("header", "true")
          .option("escape", "\"").csv(out)
        s.read
          .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
          .option("header", "true").option("escape", "\"")
          .option("multiLine", "true").csv(out)
      },
      oracle = Some(
        "SELECT doc_id, text, lang, source, n_chars FROM documents")),

    GraftQuery("s14_orc_roundtrip",
      // ORC source/sink fidelity (Spark-native columnar alternative):
      // timestamps, doubles, and JSON strings written to ORC and read
      // back must equal the parquet source
      (s, dir) => {
        val out = Files.createTempDirectory("graft-orc").toString + "/ev"
        Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
      },
      oracle = Some(
        """SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
          |       user_id, event_type, value, props
          |FROM events""".stripMargin)),

    GraftQuery("s16_jsonl_roundtrip",
      // JSONL source/sink fidelity — the interchange format training
      // exports actually ship ([[CurationOps.exportShards]] writes it):
      // free text with quotes/newlines/unicode JSON-escaped by the
      // engine writer and read back under an explicit schema must equal
      // the parquet source
      (s, dir) => {
        val out = Files.createTempDirectory("graft-jsonl").toString + "/docs"
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .write.mode("overwrite").json(out)
        s.read
          .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
          .json(out)
      },
      oracle = Some(
        "SELECT doc_id, text, lang, source, n_chars FROM documents")),

    GraftQuery("s17_xml_roundtrip",
      // XML source/sink fidelity (Spark 4's built-in XML data source):
      // free text with markup-significant characters (<, >, &, quotes)
      // entity-escaped by the engine writer and read back under an
      // explicit schema must equal the parquet source — plus a
      // timestamp and a double through the default XML value formats
      (s, dir) => {
        val out = Files.createTempDirectory("graft-xml").toString + "/ev"
        Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").option("rowTag", "event")
          // default XML timestamp format truncates to milliseconds;
          // the source carries microseconds
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
          .xml(out)
        s.read
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")
          .option("rowTag", "event")
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
          .xml(out)
      },
      oracle = Some(
        """SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
          |       user_id, event_type, value, props
          |FROM events""".stripMargin)),

    GraftQuery("s9_ingest_dedup",
      (s, dir) => {
        // two crawl batches through the content-addressed ingest path
        // (within-batch min-id dedup + insert-if-absent vs history):
        // first-write-wins across batches, bloom-pruned history probe
        val root = Files.createTempDirectory("graft-wh").toString + "/corpus"
        val d = Tables.load(s, dir, "documents")
        val b1 = d.where(col("doc_id") % 2 === 0)
          .select(col("doc_id").as("id"), col("text"),
            to_timestamp(lit("2024-03-01 10:00:00")).as("timestamp"))
        val b2 = d.where(col("doc_id") % 2 === 1)
          .select(col("doc_id").as("id"), col("text"))
          .unionByName(d.where(col("doc_id") % 2 === 0 && col("doc_id") % 6 === 0)
            .select((col("doc_id") + 1000000).as("id"), col("text")))
          .withColumn("timestamp", to_timestamp(lit("2024-03-02 10:00:00")))
        graft.streaming.DocumentIngestPipeline.processBatch(b1, root)
        graft.streaming.DocumentIngestPipeline.processBatch(b2, root)
        graft.sources.WarehouseTable.open(s, root).read()
          .select(col("id"), col("text_md5"), col("_pday").cast("string").as("pday"))
      },
      oracle = Some(
        """WITH b1 AS (
          |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 0),
          |b2 AS (
          |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 1
          |  UNION ALL
          |  SELECT doc_id + 1000000, text FROM documents
          |  WHERE doc_id % 2 = 0 AND doc_id % 6 = 0),
          |s1 AS (
          |  SELECT min(id) AS id, md5(text) AS text_md5, '2024-03-01' AS pday
          |  FROM b1 GROUP BY text),
          |s2 AS (
          |  SELECT min(id) AS id, md5(text) AS text_md5, '2024-03-02' AS pday
          |  FROM b2 WHERE text NOT IN (SELECT text FROM b1) GROUP BY text)
          |SELECT id, text_md5, pday FROM s1
          |UNION ALL
          |SELECT id, text_md5, pday FROM s2""".stripMargin),
      headline = true),

    GraftQuery("s27_stream_table_chain",
      // table-as-stream (the Delta streaming-table pattern): a graft
      // source table streams into a second graft table through
      // readStream.format("graft") → writeStream.format("graft") —
      // run 1 ships the initial snapshot (even half of customer),
      // run 2 resumes from the SAME checkpoint and ships only the odd
      // half's append commit (offsets = snapshot versions, so
      // exactly-once falls out of the commit protocol). The oracle is
      // the union: dedup/replay bugs surface as row-count mismatches
      (s, dir) => {
        val base = Files.createTempDirectory("graft-chain").toString
        val srcRoot = s"$base/src"
        val dstRoot = s"$base/dst"
        val ck = s"$base/ck"
        val c = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("k1"), col("c_name").as("f1"),
          to_timestamp(lit("2024-01-01 12:00:00")).as("partitionTime"))
        val t = WarehouseTable.create(s, srcRoot, Seq("k1"), StructType(Seq(
          StructField("k1", LongType), StructField("f1", StringType))))
        t.append(c.where(col("k1") % 2 === 0))
        def run(): Unit = {
          val q = s.readStream.format("graft").load(srcRoot)
            .withColumn("partitionTime", to_timestamp(col("_pday")))
            .drop("_pday")
            .writeStream.format("graft")
            .option("path", dstRoot).option("keys", "k1")
            .option("checkpointLocation", ck)
            .start()
          try q.processAllAvailable() finally q.stop()
        }
        run()
        t.append(c.where(col("k1") % 2 === 1))
        run()
        s.read.format("graft").load(dstRoot)
          .select(col("k1"), col("f1"), col("_pday"))
      },
      oracle = Some(
        """SELECT c_custkey AS k1, c_name AS f1, '2024-01-01' AS _pday
          |FROM customer""".stripMargin)),

    GraftQuery("s28_change_feed",
      // change-data-feed primitive (readChangeFeed's engine):
      // row-level changes per committing version — append (v1), an
      // upsert merge whose updates surface as removed pre-image +
      // added post-image with carried rows of the rewritten files
      // cancelling exactly (v2), and a predicate DELETE over the
      // post-merge state (v3). The oracle recomputes all three change
      // sets relationally
      (s, dir) => {
        val root = Files.createTempDirectory("graft-cdf").toString + "/t"
        val cust = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("k"), col("c_name").as("nm"))
        val t = WarehouseTable.create(s, root, Seq("k1"), StructType(Seq(
          StructField("k1", LongType), StructField("f1", StringType))))
        val day = to_timestamp(lit("2024-01-01 12:00:00"))
        t.append(cust.select(col("k").as("k1"), col("nm").as("f1"),
          day.as("partitionTime"))) // v1
        val upd = cust.where(col("k") % 4 === 0).select(
          struct(col("k").as("k1")).as("key"),
          struct(concat(lit("upd:"), col("k")).as("f1")).as("value"),
          col("k").as("i"), day.as("partitionTime"), lit(0L).as("batchNumber"))
        val ins = cust.where(col("k") % 10 === 0).select(
          struct((col("k") + 1000000L).as("k1")).as("key"),
          struct(col("nm").as("f1")).as("value"),
          (col("k") + 1000000L).as("i"), day.as("partitionTime"),
          lit(0L).as("batchNumber"))
        t.merge(upd.unionByName(ins)) // v2
        t.deleteWhere(col("k1") % 7 === 0) // v3
        t.changesBetween(0L, t.currentVersion)
          .select(col("k1"), col("f1"), col("change_type"),
            col("_commit_version"))
      },
      oracle = Some(
        """WITH cust AS (SELECT c_custkey AS k, c_name AS nm FROM customer),
          |upd AS (SELECT k, nm FROM cust WHERE k % 4 = 0),
          |ins AS (SELECT k + 1000000 AS k, nm FROM cust WHERE k % 10 = 0),
          |state AS (
          |  SELECT k, CASE WHEN k % 4 = 0
          |    THEN 'upd:' || CAST(k AS VARCHAR) ELSE nm END AS nm FROM cust
          |  UNION ALL SELECT k, nm FROM ins)
          |SELECT k AS k1, nm AS f1, 'added' AS change_type,
          |       CAST(1 AS BIGINT) AS _commit_version FROM cust
          |UNION ALL
          |SELECT k, nm, 'removed', 2 FROM upd
          |UNION ALL
          |SELECT k, 'upd:' || CAST(k AS VARCHAR), 'added', 2 FROM upd
          |UNION ALL
          |SELECT k, nm, 'added', 2 FROM ins
          |UNION ALL
          |SELECT k, nm, 'removed', 3 FROM state WHERE k % 7 = 0""".stripMargin)),

    GraftQuery("s6_wh_merge_pruned",
      (s, dir) => {
        val root = Files.createTempDirectory("graft-wh").toString + "/events_tbl"
        val all = stagedAll(s, dir)
        val t = WarehouseTable.create(s, root, Seq("k"), destSchema)
        // seed: merge batch 0 into the empty table = latest non-tombstone
        // per key, landed in its own event-day partition
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("partitionTime"))
        t.append(d0)
        // merge-flush the second half (updates/inserts/tombstone deletes)
        t.merge(all.where(col("i") >= Split))
        // partition-dir values round-trip as DATE; oracle compares strings
        t.read().select(col("k"), col("v_type"), col("v_amount"),
          col("_pday").cast("string").as("pday"))
      },
      oracle = Some(mergeCycleOracle),
      headline = true),

    GraftQuery("s7_field_partition_merge",
      (s, dir) => {
        // column-based time partitioning (timestampPartitionFieldName
        // analog) at MONTH granularity, clustered on the key: partitions
        // route by the record's own `v_ts` field, updates keep their
        // original month, inserts land in their v_ts month
        val root = Files.createTempDirectory("graft-wh").toString + "/events_fp"
        val all = Tables.load(s, dir, "events").select(
          struct(col("user_id").as("k")).as("key"),
          when(col("event_type") =!= "error",
            struct(col("event_type").as("v_type"), col("value").as("v_amount"),
              timestamp_micros(expr("ts div 1000")).as("v_ts"))).as("value"),
          col("event_id").as("i"),
          lit(0L).as("batchNumber"))
        val schemaT = StructType(Seq(
          StructField("k", LongType), StructField("v_type", StringType),
          StructField("v_amount", DoubleType), StructField("v_ts", TimestampType)))
        val t = WarehouseTable.create(s, root, Seq("k"), schemaT,
          graft.sources.TableOptions(clusteringFields = Seq("k"),
            partitionField = Some("v_ts"), granularity = "MONTH"))
        val d0 = MergeOps.latestPerKey(all.where(col("i") < Split))
          .where(col("value").isNotNull)
          .select(col("key.k").as("k"), col("value.v_type").as("v_type"),
            col("value.v_amount").as("v_amount"), col("value.v_ts").as("v_ts"))
        t.append(d0)
        t.merge(all.where(col("i") >= Split))
        t.read().select(col("k"), col("v_type"), col("v_amount"), col("v_ts"),
          col("_pday").cast("string").as("pmonth"))
      },
      oracle = Some(
        """WITH staged AS (
          |  SELECT user_id AS k, event_id AS i,
          |         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS v_type,
          |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_amount,
          |         CASE WHEN event_type = 'error' THEN NULL
          |              ELSE make_timestamp(epoch_ns(ts)//1000) END AS v_ts
          |  FROM events),
          |d0 AS (
          |  SELECT k, v_type, v_amount, v_ts, strftime(v_ts, '%Y-%m') AS pmonth FROM (
          |    SELECT k, v_type, v_amount, v_ts,
          |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
          |    FROM staged WHERE i < 5000) t
          |  WHERE rn = 1 AND v_type IS NOT NULL),
          |s1 AS (
          |  SELECT k, v_type, v_amount, v_ts, strftime(v_ts, '%Y-%m') AS pmonth FROM (
          |    SELECT k, v_type, v_amount, v_ts,
          |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
          |    FROM staged WHERE i >= 5000) t
          |  WHERE rn = 1)
          |SELECT coalesce(s1.k, d0.k) AS k,
          |       CASE WHEN s1.k IS NOT NULL THEN s1.v_type ELSE d0.v_type END AS v_type,
          |       CASE WHEN s1.k IS NOT NULL THEN s1.v_amount ELSE d0.v_amount END AS v_amount,
          |       CASE WHEN s1.k IS NOT NULL THEN s1.v_ts ELSE d0.v_ts END AS v_ts,
          |       coalesce(d0.pmonth, s1.pmonth) AS pmonth
          |FROM d0 FULL OUTER JOIN s1 ON d0.k = s1.k
          |WHERE NOT (s1.k IS NOT NULL AND s1.v_type IS NULL)""".stripMargin),
      headline = true),

    GraftQuery("s22_fk_orphans",
      // referential-integrity audit across the star schema: one row per
      // declared FK relation with checked/orphan counts. The first four
      // relations hold by construction (all-zero orphans — the audit
      // proves it); the fifth plants a STALE DIMENSION (nation filtered
      // to n_nationkey < 15) so the orphan path is exercised on real
      // keys. Parent sides reduce to DISTINCT keys before each join.
      (s, dir) => {
        import graft.operators.QualityOps.FkRelation
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        graft.operators.QualityOps.fkOrphans(Seq(
          FkRelation("lineitem.l_orderkey->orders", li, "l_orderkey",
            ord, "o_orderkey"),
          FkRelation("lineitem.l_partkey->part", li, "l_partkey",
            Tables.load(s, dir, "part"), "p_partkey"),
          FkRelation("lineitem.l_suppkey->supplier", li, "l_suppkey",
            Tables.load(s, dir, "supplier"), "s_suppkey"),
          FkRelation("orders.o_custkey->customer", ord, "o_custkey",
            Tables.load(s, dir, "customer"), "c_custkey"),
          FkRelation("customer.c_nationkey->stale_nation",
            Tables.load(s, dir, "customer"), "c_nationkey",
            Tables.load(s, dir, "nation").where(col("n_nationkey") < 15),
            "n_nationkey")))
      },
      oracle = Some {
        def leg(name: String, child: String, ck: String, parent: String,
            pk: String, parentFilter: String = "") =
          s"""SELECT '$name' AS relation, count(*) AS n_checked,
             |       sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans,
             |       count(DISTINCT CASE WHEN p.$pk IS NULL THEN c.$ck END) AS n_orphan_keys
             |FROM $child c
             |LEFT JOIN (SELECT DISTINCT $pk FROM $parent $parentFilter) p
             |  ON c.$ck = p.$pk
             |WHERE c.$ck IS NOT NULL""".stripMargin
        Seq(
          leg("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          leg("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          leg("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          leg("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          leg("customer.c_nationkey->stale_nation", "customer",
            "c_nationkey", "nation", "n_nationkey",
            "WHERE n_nationkey < 15")).mkString("\nUNION ALL\n")
      }),

    GraftQuery("s24_topk_view_refresh",
      // incremental top-k view maintenance: the view is built over the
      // first 80% of events, then refreshed with ONLY the appended 20%
      // — top-k is monotone under insertion, so the refresh equals a
      // full recompute, which is EXACTLY what the oracle runs (top-3
      // over the whole table). Ties break on event_id, making the view
      // a pure function of table state.
      (s, dir) => {
        import graft.operators.ViewMaintenance
        val ev = Tables.events(s, dir).select(col("event_type"),
          col("event_id"), round(col("value") * 100, 0).cast("long").as("cents"))
        val base = ev.where(col("event_id") % 10 < 8)
        val appended = ev.where(col("event_id") % 10 >= 8)
        val view = ViewMaintenance.refreshTopK(
          base.limit(0), base, Seq("event_type"), "cents", "event_id", k = 3)
        ViewMaintenance.refreshTopK(view, appended,
          Seq("event_type"), "cents", "event_id", k = 3)
      },
      oracle = Some(
        """SELECT event_type, event_id, cents, rank FROM (
          |  SELECT event_type, event_id,
          |         CAST(round(value * 100, 0) AS BIGINT) AS cents,
          |         CAST(row_number() OVER (
          |           PARTITION BY event_type
          |           ORDER BY CAST(round(value * 100, 0) AS BIGINT) DESC,
          |                    event_id) AS INT) AS rank
          |  FROM events) t
          |WHERE rank <= 3""".stripMargin)),

    GraftQuery("a3_batch_counts",
      (s, dir) => graft.operators.BatchOps.batchRowCounts(
        Tables.load(s, dir, "events")
          .withColumn("batchNumber", col("event_id") % 7)),
      oracle = Some(
        """SELECT event_id % 7 AS batchNumber, count(*) AS n_rows
          |FROM events GROUP BY 1""".stripMargin)),

    GraftQuery("a4_max_offsets",
      (s, dir) => graft.operators.BatchOps.maxOffsets(
        Tables.load(s, dir, "events").select(
          concat(lit("t"), col("user_id") % 3).as("topic"),
          (col("user_id") % 8).as("partition"),
          col("event_id").as("offset"))),
      oracle = Some(
        """SELECT 't' || (user_id % 3) AS topic, user_id % 8 AS partition,
          |       max(event_id) + 1 AS commit_offset
          |FROM events GROUP BY 1, 2""".stripMargin))
  )
}
