package graft.tools

import graft.sources.WarehouseTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.util.concurrent.atomic.AtomicLong

/** Full warehouse WRITE-side lifecycle soak at the scale100x corpus
  * (r13 VERDICT "Next round" #6): the query bench exercises reads; a
  * driver-memory or manifest-size cliff on the write side (a collect
  * that scales with the batch, a manifest rewrite that scales with
  * history) would never show there. This arm runs, at 10 M rows:
  *
  *   1. bulk append of the 100× events corpus (one commit, ~30 days),
  *   2. an over-gate backfill merge (10 M staged rows > the 8 M driver
  *      row gate → the BULK path engages: no per-row driver state) that
  *      updates half the keys, tombstones a quarter, inserts 2.5 M new,
  *   3. day compaction, then a day-scoped backfill (the INSERT
  *      OVERWRITE PARTITION shape): ONE commit replaces the inserted
  *      day with its recomputed half — O(that day), never O(table),
  *   4. a time-travel read of the pre-merge snapshot (manifest
  *      lineage under file-granular + whole-day rewrites),
  *   5. vacuum down to 2 retained versions,
  *   6. reader soak: exact survivor count, day-pruned count, key
  *      lookups for an updated / tombstoned / backfilled key.
  *
  * Every count is asserted EXACTLY (survivors are computable in closed
  * form from the id-space arithmetic), and the peak DRIVER heap is
  * sampled throughout on a 50 ms daemon thread — the witness that no
  * step held per-row state on the driver: at 10 M keys a collect-based
  * path would show up as ≥ a few hundred MB of sampled heap. NOTE the
  * local-mode caveat: in `local[N]` the executors share the driver JVM,
  * so the sampled figure is driver + all executor task memory (shuffle
  * buffers, sort pages) — an upper bound on the true driver footprint,
  * useful round-over-round as a REGRESSION witness, not an absolute.
  *
  * Reference anchor: this is the engine-side analog of the reference's
  * upsert/delete integration probe
  * (kcbq-connector/src/test/java/.../it/UpsertDeleteBigQuerySinkConnectorIT.java:288-357)
  * scaled 10× and extended over the maintenance surface the reference
  * delegates to BigQuery (compaction/vacuum have no connector-side
  * equivalent; they exist because this engine OWNS its storage).
  */
object Soak100x {

  final case class Result(
      sec: Double,
      appendSec: Double,
      mergeSec: Double,
      compactSec: Double,
      backfillSec: Double,
      vacuumSec: Double,
      readSec: Double,
      rowsIn: Long,
      survivors: Long,
      compactedDays: Int,
      peakDriverHeapMb: Long,
      peakUnmanagedHeapMb: Long,
      peakStoragePoolMb: Long,
      peakExecutionPoolMb: Long,
      retainedDriverHeapMb: Long,
      retainedByPhase: Seq[(String, Long)],
      bulkPathEngaged: Boolean)

  def run(spark: SparkSession, corpusDir: String, whRoot: String): Result = {
    // Peak-heap sampler: used-heap polled every 50 ms. Cheap, catches
    // any driver-side materialization that lives longer than a tick;
    // a short-lived spike can slip between samples, but the collects
    // this guards against (10 M × ~16 B hash arrays) persist for the
    // whole probe/bloom phase and cannot hide.
    val peak = new AtomicLong(0L)
    // DRIVER-attributable peak: used heap MINUS Spark's managed pools
    // (storage + execution — task-side memory) at the same sample. In
    // local mode one JVM hosts driver and executors, so the raw figure
    // alone can't witness the driver-memory cliff (manifest/bloom
    // collects) this arm exists for; the unmanaged remainder can.
    // Approximate (unmanaged task allocations land in it too), but the
    // collects it guards against persist for whole phases and dominate.
    val peakUnmanaged = new AtomicLong(0L)
    // the two managed pools on their own: execution-pool peak is the
    // witness that the shuffle/sort work actually exercised task
    // memory (an all-zero pool would mean the "unmanaged remainder"
    // subtraction attributes nothing — the r15 artifact's failure mode)
    val peakStorage = new AtomicLong(0L)
    val peakExecution = new AtomicLong(0L)
    @volatile var sampling = true
    def raise(acc: AtomicLong, v: Long): Unit = {
      var cur = acc.get()
      while (v > cur && !acc.compareAndSet(cur, v)) cur = acc.get()
    }
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (sampling) {
        val used = rt.totalMemory() - rt.freeMemory()
        raise(peak, used)
        val (st, ex) =
          try org.apache.spark.sql.graftbridge.Bridge.sparkPoolsUsed()
          catch { case _: Throwable => (0L, 0L) }
        raise(peakStorage, st)
        raise(peakExecution, ex)
        raise(peakUnmanaged, math.max(0L, used - st - ex))
        Thread.sleep(50)
      }
    }, "soak-heap-sampler")
    sampler.setDaemon(true)
    sampler.start()

    // RETAINED driver heap per phase boundary: the continuous
    // (used − pools) peak above is garbage-inflated in local mode (a
    // 128 GB heap GCs rarely, so "used" tracks allocation, not live
    // set — the r15 artifact showed driver ≈ JVM total, attributing
    // nothing). A post-GC sample at each phase boundary measures LIVE
    // driver-side state — exactly where a manifest/bloom/collect that
    // scales with the table would persist. Max over phases is the
    // headline driver-attributable figure.
    val retainedByPhase = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def sampleRetained(phase: String): Unit = {
      System.gc()
      Thread.sleep(200L)
      val rt = Runtime.getRuntime
      val used = rt.totalMemory() - rt.freeMemory()
      val managed =
        try org.apache.spark.sql.graftbridge.Bridge.sparkManagedMemoryUsed()
        catch { case _: Throwable => 0L }
      retainedByPhase += phase -> (math.max(0L, used - managed) >> 20)
    }

    val t0 = System.nanoTime()
    def secsSince(t: Long): Double = (System.nanoTime() - t) / 1e9

    try {
      val events = spark.read.parquet(s"$corpusDir/events.parquet")
      val destSchema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))
      val table = WarehouseTable.create(spark, whRoot, Seq("event_id"), destSchema)

      // -- 1. bulk append ------------------------------------------------
      val tAppend = System.nanoTime()
      table.append(events.select(col("event_id"), col("user_id"),
        col("event_type"), col("value"), col("props"),
        col("ts").cast("timestamp").as("partitionTime")))
      val appendSec = secsSince(tAppend)
      sampleRetained("append")
      val rowsIn = table.read().count()
      val preMergeVersion = table.currentVersion

      // -- 2. over-gate backfill merge ------------------------------------
      // updates for id%4∈{0,1}, tombstones for id%4==2, id%4==3 left
      // untouched (so the merge must NOT rewrite it), plus maxId-anchored
      // inserts — survivor count closed-form: rowsIn − tombstoned + inserts
      val maxId = events.agg(max(col("event_id"))).head().getLong(0)
      // staged = 3/4·rowsIn updates+tombstones + rowsIn/4 inserts =
      // rowsIn staged rows → 10 M at the 100× corpus, over the 8 M
      // driver row gate, so the BULK merge path engages naturally (no
      // test-shrunk gate); proportional so the soak smoke-runs at any SF
      val nInserts = math.max(rowsIn / 4, 1000L)
      val seedsStaged = events.where(col("event_id") % 4 =!= 3).select(
        struct(col("event_id")).as("key"),
        when(col("event_id") % 4 === 2,
          lit(null).cast(
            "struct<user_id:bigint,event_type:string,value:double,props:string>"))
          .otherwise(struct(col("user_id"),
            lit("soaked").as("event_type"), col("value"), col("props")))
          .as("value"),
        col("event_id").as("i"),
        col("ts").cast("timestamp").as("partitionTime"),
        lit(0L).as("batchNumber"))
      val inserts = spark.range(1L, nInserts + 1L).select(
        struct((col("id") + maxId).as("event_id")).as("key"),
        struct(col("id").as("user_id"), lit("inserted").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props")).as("value"),
        (col("id") + maxId).as("i"),
        // a day far past any corpus ts, so the inserted-day count below
        // is exactly the insert set
        to_timestamp(lit("2031-01-01 12:00:00")).as("partitionTime"),
        lit(0L).as("batchNumber"))
      val bulkBefore = WarehouseTable.bulkMergePaths.get()
      val tMerge = System.nanoTime()
      table.merge(seedsStaged.unionByName(inserts))
      val mergeSec = secsSince(tMerge)
      sampleRetained("merge")
      val bulkEngaged = WarehouseTable.bulkMergePaths.get() > bulkBefore

      val nTomb = events.where(col("event_id") % 4 === 2).count()

      // -- 3. compaction ---------------------------------------------------
      // threshold 1: every multi-file day rewrites to one file — forces
      // REAL compaction work over the merged table (at 8 the post-merge
      // layout was already tidy enough to no-op the whole step)
      val tCompact = System.nanoTime()
      val compacted = table.compactFragmented(maxFilesPerDay = 1)
      val compactSec = secsSince(tCompact)
      sampleRetained("compact")

      // -- 3b. day-scoped backfill (INSERT OVERWRITE PARTITION shape) -------
      // recompute the inserted day down to its first half — ONE commit
      // replacing exactly that slice; every other day of the 10 M-row
      // table must be untouched (the swap is O(target-day files), so at
      // any corpus size this step costs the backfilled day, not the table)
      val nKept = nInserts / 2
      val tBackfill = System.nanoTime()
      table.overwriteDays(
        spark.range(1L, nKept + 1L).select(
          (col("id") + maxId).as("event_id"), col("id").as("user_id"),
          lit("backfilled").as("event_type"), lit(2.0).as("value"),
          lit("{}").as("props"),
          to_timestamp(lit("2031-01-01 12:00:00")).as("partitionTime")),
        days = Seq("2031-01-01"))
      val backfillSec = secsSince(tBackfill)
      sampleRetained("backfill")
      val expectedSurvivors = rowsIn - nTomb + nKept

      // -- 4. time travel (before vacuum trims history) ---------------------
      val travelled = table.readAsOf(preMergeVersion).count()
      require(travelled == rowsIn,
        s"time travel to pre-merge snapshot: expected $rowsIn rows, got $travelled")

      // -- 5. vacuum ---------------------------------------------------------
      val tVacuum = System.nanoTime()
      table.vacuum(retainVersions = 2)
      val vacuumSec = secsSince(tVacuum)
      sampleRetained("vacuum")

      // -- 6. reader soak ------------------------------------------------------
      val tRead = System.nanoTime()
      val fresh = WarehouseTable.open(spark, whRoot) // cold open: manifest re-read
      val survivors = fresh.read().count()
      require(survivors == expectedSurvivors,
        s"survivors: expected $expectedSurvivors, got $survivors")
      val inserted = fresh.read()
        .where(col("_pday") === "2031-01-01").count()
      require(inserted == nKept,
        s"backfilled day: expected $nKept rows, got $inserted")
      val backType = fresh.read().where(col("event_id") === maxId + 1L)
        .select(col("event_type")).head().getString(0)
      require(backType == "backfilled",
        s"backfilled key read back '$backType'")
      // key lookups: updated carries the merge value, tombstoned is gone,
      // untouched keeps the seed value
      val updatedType = fresh.read().where(col("event_id") === 4L)
        .select(col("event_type")).head().getString(0)
      require(updatedType == "soaked", s"updated key read back '$updatedType'")
      require(fresh.read().where(col("event_id") === 2L).count() == 0L,
        "tombstoned key survived")
      val untouched = fresh.read().where(col("event_id") === 3L)
        .select(col("event_type")).head().getString(0)
      require(untouched != "soaked", "untouched key was rewritten")
      val readSec = secsSince(tRead)
      sampleRetained("read")

      Result(secsSince(t0), appendSec, mergeSec, compactSec, backfillSec,
        vacuumSec, readSec, rowsIn, survivors, compacted.size,
        peak.get() >> 20, peakUnmanaged.get() >> 20,
        peakStorage.get() >> 20, peakExecution.get() >> 20,
        retainedByPhase.map(_._2).max, retainedByPhase.toSeq, bulkEngaged)
    } finally {
      sampling = false
    }
  }
}
