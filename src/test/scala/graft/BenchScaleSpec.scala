package graft

import graft.operators.MergeOps
import graft.sources.{TableOptions, WarehouseTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The 100×-evidence the sf0.1 bench cannot give: drive the warehouse
  * merge at 10× its bench batch size (~1M staged rows built by
  * key-shifted replication of the sf0.1 events) and pin
  *
  *  1. the PLAN selections — the broadcast decomposition below the
  *     row ceiling (dest never shuffled) and the sort-merge full-outer
  *     fallback above it — via a QueryExecutionListener over the
  *     merge's write jobs, and
  *  2. that wall time scales ~linearly in batch size (a generous bound:
  *     well under quadratic, which is what a broken candidate-day or
  *     key-join plan would produce).
  *
  * Result equality of the two plans is pinned separately at small scale
  * (`WarehouseTableSpec`: "broadcast merge plan and shuffle fallback
  * produce identical state").
  */
class BenchScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.1"

  /** Wall-clock scaling bound, LOAD-AWARE: on a machine whose 1-min
    * loadavg exceeds this, a wall-clock ratio says more about the
    * neighbors than the plan (r15: d14 measured 54× under loadavg ~10
    * yet 1.5× in isolation), so the ratio is still asserted — but via
    * `assume`, which CANCELS (visibly, not red) instead of failing.
    * The scaling property itself stays pinned load-independently by
    * the exact-recall assertions plus the shuffle-record-count bound
    * ([[shuffleRecordsDuring]]), which depend on the plan, not the
    * clock.
    */
  private val QuietLoad = 8.0

  private def loadavg1(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private def assertLinearWall(tag: String, ms1: Double, ms10: Double,
      bound: Double = 25.0): Unit = {
    info(f"$tag wall: 1x $ms1%.0f ms, 10x $ms10%.0f ms (ratio ${ms10 / ms1}%.1f)")
    val l = loadavg1()
    val msg = f"10x $tag cost ${ms10 / ms1}%.1fx — superlinear blow-up " +
      f"(loadavg $l%.1f)"
    if (l > QuietLoad) assume(ms10 < ms1 * bound,
      s"$msg — MACHINE LOADED, canceling instead of failing")
    else assert(ms10 < ms1 * bound, msg)
  }

  /** Total shuffle records read across all stages triggered by `body` —
    * a deterministic, load-immune scaling witness: a candidate-pair
    * blow-up multiplies the rows crossing the exchanges whatever the
    * machine is doing.
    */
  private def shuffleRecordsDuring(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        acc.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.recordsRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.graftbridge.Bridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  private def tmpRoot(): String =
    Files.createTempDirectory("wh-scale").toString + "/tbl"

  private val destSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("v_type", StringType),
    StructField("v_amount", DoubleType)))

  /** The s6 staged shape, replicated `copies`× with disjoint key and
    * event-id ranges — same day span, `copies`× the rows per day.
    */
  private def stagedTimes(copies: Int): DataFrame = {
    val ev = Tables.load(spark, sf, "events")
    (0 until copies).map { c =>
      ev.select(
        struct((col("user_id") + c * 10000000L).as("k")).as("key"),
        when(col("event_type") =!= "error",
          struct(col("event_type").as("v_type"), col("value").as("v_amount")))
          .as("value"),
        (col("event_id") + c * 1000000000L).as("i"),
        timestamp_micros(expr("ts div 1000")).as("partitionTime"),
        lit(0L).as("batchNumber"))
    }.reduce(_ unionByName _)
  }

  /** Seed a fresh table with the latest non-tombstone state of copy 0
    * (the s6 seeding pattern), return it.
    */
  private def seeded(): WarehouseTable = {
    val t = WarehouseTable.create(spark, tmpRoot(), Seq("k"), destSchema)
    val d0 = MergeOps.latestPerKey(stagedTimes(1))
      .where(col("value").isNotNull)
      .select(col("key.k").as("k"), col("value.v_type").as("v_type"),
        col("value.v_amount").as("v_amount"), col("partitionTime"))
    t.append(d0)
    t
  }

  /** Run `body` while capturing every completed query execution's
    * physical plan string (listener delivery is async — poll until the
    * capture set is quiet).
    */
  private def capturingPlans[A](body: => A): (A, Seq[String]) = {
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = body
      // async listener bus: wait for the plan stream to go quiet
      var last = -1
      var now = plans.synchronized(plans.size)
      var spins = 0
      while (last != now && spins < 100) {
        last = now; Thread.sleep(200)
        now = plans.synchronized(plans.size); spins += 1
      }
      (out, plans.synchronized(plans.toVector))
    } finally spark.listenerManager.unregister(listener)
  }

  test("10x merge keeps the broadcast decomposition; forced fallback goes sort-merge") {
    // ---- 1x warm-up + timing base: ~100k staged rows
    val t1 = seeded()
    val t1Start = System.nanoTime()
    t1.merge(stagedTimes(1))
    val t1Ms = (System.nanoTime() - t1Start) / 1000000.0

    // ---- 10x: ~1M staged rows, same day span
    val t10 = seeded()
    val big = stagedTimes(10)
    val t10Start = System.nanoTime()
    val (days, plans) = capturingPlans { t10.merge(big) }
    val t10Ms = (System.nanoTime() - t10Start) / 1000000.0
    assert(days.nonEmpty)

    // the staged key count is far under the 1M-row broadcast ceiling, so
    // the decomposed plan must have been selected: its merge write joins
    // are broadcast, and nothing in the merge ran the full-outer SMJ
    val writePlans = plans.filter(_.contains("InsertIntoHadoopFsRelation"))
    assert(writePlans.nonEmpty, s"no write plan captured among ${plans.size}")
    assert(writePlans.exists(_.contains("BroadcastHashJoin")),
      s"merge write lost the broadcast decomposition:\n${writePlans.mkString("\n---\n")}")
    assert(!writePlans.exists(p =>
        p.contains("SortMergeJoin") && p.contains("FullOuter")),
      "full-outer SMJ resurfaced below the broadcast ceiling")

    // ~linear scaling: 10x rows may cost at most ~25x wall (generous —
    // a quadratic candidate or join plan would blow far past this)
    assertLinearWall("merge", t1Ms, t10Ms)

    // ---- above the ceiling: the same merge shape with a forced 1k-row
    // ceiling must select the sort-merge full-outer fallback
    val tF = seeded()
    val (_, fallbackPlans) = capturingPlans {
      tF.merge(stagedTimes(1), broadcastMaxRows = 1000L)
    }
    val fWrites = fallbackPlans.filter(_.contains("InsertIntoHadoopFsRelation"))
    assert(fWrites.exists(p => p.contains("SortMergeJoin")),
      s"row-ceiling fallback did not select sort-merge:\n${fWrites.mkString("\n---\n")}")
  }

  test("file-granular merge at 100k rows: a 10-key flush into a CLUSTERED " +
      "multi-file day full-row-scans a small fraction of the table") {
    // the 100 TB story of the file-granular rewrite: with clustering on
    // the merge key, each written file covers a narrow key range, so a
    // small flush's matched-file set — and therefore its full-row read
    // AND its rewrite — is a handful of files regardless of table size
    val root = tmpRoot()
    val t = WarehouseTable.create(spark, root, Seq("k"), destSchema,
      TableOptions(clusteringFields = Seq("k")))
    val d0 = MergeOps.latestPerKey(stagedTimes(1))
      .where(col("value").isNotNull)
      .select(col("key.k").as("k"), col("value.v_type").as("v_type"),
        col("value.v_amount").as("v_amount"), col("partitionTime"))
      .localCheckpoint(true)
    // force a many-file layout: 16 appends of contiguous key ranges, so
    // each day holds many NARROW-key-range files (the clustered layout
    // a compacted streaming table converges to — one clusteredWrite
    // would consolidate everything into a handful)
    val mm = d0.agg(min(col("k")), max(col("k"))).head()
    val (kmin, kmax) = (mm.getLong(0), mm.getLong(1))
    val step = math.max(1L, (kmax - kmin + 16) / 16)
    (0 until 16).foreach { b =>
      val lo = kmin + b * step
      t.append(d0.where(col("k") >= lo && col("k") < lo + step))
    }
    val totalFiles = t.read().inputFiles.length.toLong
    assert(totalFiles >= 32, s"layout too coarse for the proof: $totalFiles files")
    // a 10-key flush (keys that exist — worst case: all match)
    val tenKeys = MergeOps.latestPerKey(stagedTimes(1))
      .where(col("value").isNotNull).limit(10)
      .select(col("key"), col("value"),
        (col("i") + 5000000000L).as("i"), col("partitionTime"),
        col("batchNumber"))
    // (day, name) keys — one write job reuses the same part-file NAME
    // across the day dirs it writes, so name-only sets collide
    def fileKeys(): Set[String] = t.read().inputFiles
      .map(_.split('/').takeRight(2).mkString("/")).toSet
    val before = fileKeys()
    assert(before.size == totalFiles)
    val nBefore = t.read().count()
    val (_, m) = ScanMetrics.selectedByQueries(spark) { t.merge(tenKeys) }
    val after = fileKeys()
    // write amplification: at most 10 matched files replaced (clustering
    // may co-locate several keys — fewer is better), the rest carried
    val replaced = (before -- after).size
    assert(replaced <= 10,
      s"10-key flush replaced $replaced of $totalFiles files")
    assert((before & after).size >= totalFiles - 10,
      "carried files were rewritten")
    info(s"replaced $replaced of $totalFiles files")
    // measured I/O: the full-row scans (those needing the value columns)
    // selected at most the matched-file set, not the table
    val fullRowFiles = m.readSchemas.zip(m.numFilesPerScan)
      .filter(_._1.contains("v_type")).map(_._2).sum
    assert(fullRowFiles <= 10,
      s"full-row scans selected $fullRowFiles files of $totalFiles " +
        s"(schemas: ${m.readSchemas})")
    info(s"10-key flush: $replaced/$totalFiles files replaced, " +
      s"$fullRowFiles full-row-scanned")
    // correctness: an upsert-only flush must not change the row count
    assert(t.read().count() == nBefore,
      "upsert-only flush changed the row count")
  }

  test("merge flush is a bounded-job pipeline (<= 10 Spark jobs)") {
    // per-job launch overhead dominates small-flush wall time, so the
    // flush's job count IS the latency model: 1 probe collect + the
    // bloom-candidate probe + the checkpointed touched-keys scan + the
    // matched-file collect (the one extra job the FILE-granular rewrite
    // costs — it buys survivors I/O restricted to matched files) + the
    // staged write (AQE stage jobs + broadcasts) — and NOTHING after
    // the swap (blooms are unioned driver-side from the probe's own
    // collect)
    val t = seeded()
    val batch = stagedTimes(1)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.merge(batch)
      // async listener bus: wait for the count to go quiet
      var last = -1
      var now = jobs.get()
      var spins = 0
      while (last != now && spins < 50) {
        last = now; Thread.sleep(200); now = jobs.get(); spins += 1
      }
      assert(jobs.get() <= 11,
        s"merge flush ran ${jobs.get()} Spark jobs — the bounded-job " +
          "pipeline regressed (target <= 11: probe collect, bloom probe, " +
          "touched-keys checkpoint, matched-file collect, staged write " +
          "incl. AQE/broadcast jobs)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Synthetic corpus for the dedup scale proof: `n` docs of ~40
    * md5-derived pseudo-words (content unique per doc), plus a planted
    * near-dup partner for every 100th doc. Deterministic, no RNG.
    */
  private def syntheticDocs(n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select($"id".as("doc_id"),
        concat_ws(" ", (0 until 40).map(w =>
          substring(md5(concat($"id".cast("string"), lit(s":w$w"))), 1, 8)): _*)
          .as("text"))
      .unionByName(
        spark.range(0L, n.toLong, 100L).select(($"id" + 10000000L).as("doc_id"),
          concat_ws(" ", ((0 until 40).map(w =>
            substring(md5(concat($"id".cast("string"), lit(s":w$w"))), 1, 8))
            :+ lit("tail pad")): _*).as("text")))
  }

  test("10x winnowed dedup scales ~linearly; planted pairs still surface") {
    import graft.llm.DedupOps
    def run(n: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val pairs = DedupOps.winnowedOverlap(syntheticDocs(n), "text", "doc_id",
          minShared = 10L)
        .where(col("id2") - col("id1") === 10000000L)
        .count()
      (pairs, (System.nanoTime() - t0) / 1000000.0)
    }
    run(2000) // warm-up: JIT + codegen compile, outside both timers
    val (p1, ms1) = run(2000)
    val (p10, ms10) = run(20000)
    // every planted partner shares a long run with its source, so the
    // winnowing guarantee surfaces all of them at both scales
    assert(p1 == 20 && p10 == 200,
      s"planted near-dups lost at scale: $p1/20, $p10/200")
    assertLinearWall("winnowed overlap", ms1, ms10)
  }

  /** Corpus for the containment scale proof: `n` big docs of 40
    * doc-unique pseudo-words, plus for every 100th doc a FRAGMENT that
    * is its first 15 words — the quote/mirror-page shape containment
    * dedup exists for (containment 1.0, Jaccard ~0.3, so minhash-banded
    * near-dup structurally under-recalls it). Deterministic, no RNG.
    */
  private def fragmentDocs(n: Int): DataFrame = {
    import spark.implicits._
    def words(k: Int) = (0 until k).map(w =>
      substring(md5(concat($"id".cast("string"), lit(s":w$w"))), 1, 8))
    spark.range(n.toLong)
      .select($"id".as("doc_id"), concat_ws(" ", words(40): _*).as("text"))
      .unionByName(
        spark.range(0L, n.toLong, 100L).select(
          ($"id" + 10000000L).as("doc_id"),
          concat_ws(" ", words(15): _*).as("text")))
  }

  test("10x containment dedup scales ~linearly; planted fragments still surface") {
    import graft.llm.DedupOps
    def run(n: Int): (Long, Double, Long) = {
      // fresh caches per run: the operator's DISK_ONLY barriers would
      // otherwise serve the warm-up's relations to the second same-n
      // run (CacheManager matches by plan), biasing the 1x arm LOW —
      // both timings and shuffle-record counts must measure a cold
      // operator at each scale
      graft.util.GraftCache.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      var pairs = 0L
      val recs = shuffleRecordsDuring {
        pairs = DedupOps.containmentDups(fragmentDocs(n), "text", "doc_id")
          .where(col("contained_id") - col("container_id") === 10000000L &&
            col("containment") === 1.0)
          .count()
      }
      (pairs, (System.nanoTime() - t0) / 1000000.0, recs)
    }
    run(2000) // warm-up: JIT + codegen compile, outside both timers
    val (p1, ms1, r1) = run(2000)
    val (p10, ms10, r10) = run(20000)
    // a 15-word fragment's 12 4-shingles are all in its source (and
    // rare — doc-unique words keep every shared shingle at df=2, far
    // under the hot-shingle cap), so recall-complete candidate
    // generation must surface every planted pair at both scales
    assert(p1 == 20 && p10 == 200,
      s"planted fragments lost at scale: $p1/20, $p10/200")
    // the LOAD-IMMUNE scaling witness: rows crossing the exchanges.
    // Shingle relations and df-capped candidate pairs are both linear
    // in docs, so 10x docs may put at most ~12x rows through the
    // shuffles — a candidate-pair blow-up (the failure this test
    // exists for) multiplies this count whatever the machine load is
    info(s"containment shuffle records: 1x $r1, 10x $r10 " +
      f"(ratio ${r10.toDouble / r1}%.1f)")
    assert(r10 < r1 * 12,
      f"10x corpus put ${r10.toDouble / r1}%.1fx rows through the " +
        "shuffles — candidate-pair blow-up in the shared-shingle path")
    assertLinearWall("containment", ms1, ms10)
  }

  test("10x as-of join scales ~linearly; every matched version exact at both scales") {
    import graft.operators.TemporalOps
    // n events over n/100 users (constant 100 rows/user — the per-key
    // sort bound stays flat as users scale); per-user dim versions at
    // ts = k*100 with value k, so every event's expected as-of match
    // is floor(t/100) — exact at any scale
    def data(n: Int): (DataFrame, DataFrame) = {
      import spark.implicits._
      val u = (n / 100).toLong
      val left = spark.range(n.toLong).select(($"id" % u).as("uid"),
        timestamp_seconds(expr(s"(id div $u) * 7 + 1")).as("t"), $"id".as("eid"))
      val right = spark.range(u * 8).select(($"id" % u).as("uid"),
        timestamp_seconds(expr(s"(id div $u) * 100")).as("t"),
        expr(s"id div $u").as("version"), $"id".as("rid"))
      (left, right)
    }
    def run(n: Int): (Long, Double) = {
      val (l, r) = data(n)
      val t0 = System.nanoTime()
      val bad = TemporalOps.asofJoinBackward(l, r, Seq("uid"),
          "t", "t", Seq("version"), rightTie = "rid")
        .where(col("version").isNull ||
          col("version") =!= expr("unix_timestamp(t) div 100"))
        .count()
      (bad, (System.nanoTime() - t0) / 1000000.0)
    }
    run(20000) // warm-up: JIT + codegen compile, outside both timers
    val (b1, ms1) = run(20000)
    val (b10, ms10) = run(200000)
    assert(b1 == 0L && b10 == 0L,
      s"as-of matched a wrong version at scale: $b1, $b10 mismatches")
    assertLinearWall("as-of join", ms1, ms10)
  }

  /** Synthetic graph for the graph-family scale proof: `n` nodes in
    * `n/1000` ring communities of 1000 (edges i→i+1 mod ring) plus a
    * deterministic long-range chord per 10th node INSIDE its ring —
    * component count and structure are known exactly at any scale.
    */
  private def ringGraph(n: Int): DataFrame = {
    import spark.implicits._
    val ring = lit(1000L)
    val base = spark.range(n.toLong).select($"id".as("src"),
      (($"id" / ring).cast("long") * ring + ($"id" + 1) % ring).as("dst"))
    val chords = spark.range(0L, n.toLong, 10L).select($"id".as("src"),
      (($"id" / ring).cast("long") * ring + ($"id" + 497) % ring).as("dst"))
    base.unionByName(chords)
  }

  test("10x graph ops scale ~linearly; component structure exact at both scales") {
    import graft.operators.GraphOps
    def run(n: Int): (Long, Double, Double) = {
      val t0 = System.nanoTime()
      val comps = GraphOps.connectedComponents(ringGraph(n))
        .select(col("comp")).distinct().count()
      val tComp = (System.nanoTime() - t0) / 1000000.0
      val t1 = System.nanoTime()
      val rankSum = GraphOps.pageRank(ringGraph(n), iterations = 3)
        .agg(sum(col("rank"))).collect()(0).getDouble(0)
      val tPr = (System.nanoTime() - t1) / 1000000.0
      assert(math.abs(rankSum - 1.0) < 1e-6,
        f"pagerank mass not conserved at n=$n: $rankSum%.8f")
      (comps, tComp, tPr)
    }
    run(10000) // warm-up: JIT + codegen compile, outside both timers
    val (c1, tc1, tp1) = run(10000)
    val (c10, tc10, tp10) = run(100000)
    // each 1000-node ring is one component — exactly n/1000 of them
    assert(c1 == 10L && c10 == 100L,
      s"component structure broke at scale: $c1/10, $c10/100")
    info(f"components wall: 1x $tc1%.0f ms, 10x $tc10%.0f ms (ratio ${tc10 / tc1}%.1f)")
    info(f"pagerank wall:   1x $tp1%.0f ms, 10x $tp10%.0f ms (ratio ${tp10 / tp1}%.1f)")
    // pointer jumping is O(log d) ROUNDS (ring diameter is constant
    // here, so round count is flat); pagerank is 3 fixed joins — both
    // must stay far under quadratic
    assert(tc10 < tc1 * 25, f"10x components cost ${tc10 / tc1}%.1fx — superlinear")
    assert(tp10 < tp1 * 25, f"10x pagerank cost ${tp10 / tp1}%.1fx — superlinear")
  }

  /** Train/test corpora for the trigram-LM scale proof. Train: `n` docs
    * of 40 words off a FIXED 500-word vocabulary (so the distinct-
    * trigram relation stays vocabulary-sized as the corpus grows — the
    * exact property the 100 TB design note claims). Test: `n/10` docs
    * alternating vocabulary words with doc-unique OOV words, so every
    * doc exercises the full backoff chain. Deterministic, no RNG.
    */
  private def lmTrain(n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(concat_ws(" ", (0 until 40).map(w =>
      substring(md5(concat(lit("v"),
        (($"id" * 7 + w * 13) % 500).cast("string"))), 1, 8)): _*).as("text"))
  }

  private def lmTest(n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong / 10).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 40).map(w =>
        if (w % 2 == 0)
          substring(md5(concat(lit("v"),
            (($"id" * 11 + w * 17) % 500).cast("string"))), 1, 8)
        else
          substring(md5(concat($"id".cast("string"), lit(s":oov$w"))), 1, 8)
      ): _*).as("text"))
  }

  test("10x trigram LM scoring scales ~linearly; counts stay vocabulary-sized") {
    import graft.llm.TextOps
    def run(n: Int): (Array[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val rows = TextOps.withTrigramBackoff(lmTrain(n), lmTest(n),
          "text", "doc_id")
        .agg(count(lit(1)).as("docs"),
          min(col("n_trigrams")).as("min_tri"),
          max(col("n_trigrams")).as("max_tri"),
          sum(col("n_backoff")).as("backoffs"),
          count(when(col("tri_surprisal").isNull, 1)).as("unscored"))
        .collect()
      (rows, (System.nanoTime() - t0) / 1000000.0)
    }
    run(2000) // warm-up: JIT + codegen compile, outside both timers
    val (r1, ms1) = run(2000)
    val (r10, ms10) = run(20000)
    for ((r, n) <- Seq((r1(0), 2000), (r10(0), 20000))) {
      assert(r.getLong(0) == n / 10, s"docs scored: ${r.getLong(0)} != ${n / 10}")
      assert(r.getLong(1) == 38L && r.getLong(2) == 38L,
        s"every 40-word doc has exactly 38 trigram positions, got " +
          s"[${r.getLong(1)}, ${r.getLong(2)}]")
      // interleaved OOV words force positions off the trigram level in
      // every doc — the backoff chain must actually fire at both scales
      assert(r.getLong(3) > 0L, "no backoff positions — held-out split broken")
      assert(r.getLong(4) == 0L, s"${r.getLong(4)} docs left unscored")
    }
    assertLinearWall("trigram LM", ms1, ms10)
  }

  /** Corpus for the composed-pipeline scale proof: `n` base docs of 40
    * doc-unique pseudo-words (clear the 30-token floor with zero
    * repetition), plus an EXACT copy of every 50th doc under a new id —
    * the dedup stage's prey. Deterministic, no RNG; source/n_chars
    * columns as the pipeline expects.
    */
  test("10x IVF serving scans SUB-linearly: bytes read grow ~sqrt(10), " +
      "not 10x, under the sqrt(N)-cell sizing (fixed query set)") {
    import graft.llm.SimOps
    // synthetic embeddings with ids in the e12 shape; dim 8 keeps the
    // fixture fast while cells/bytes do the talking
    def corpus(n: Int): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 7), j -> " +
          "cos(cast(id * 37 + j * 101 AS DOUBLE)))").as("embedding"))
    def servedBytes(n: Int): (Long, Long) = {
      val emb = corpus(n)
      val nc = math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
      val root = Files.createTempDirectory("ivf-subln").toString + "/idx"
      SimOps.buildIvfIndex(emb, root, numCells = nc)
      // FIXED query set at both scales: ids < 1000 (the e12 pinning)
      val queries = emb.where(col("vec_id") % 50 === 0 && col("vec_id") < 1000L)
      val (rows, totals) = ScanMetrics.selectedByQueries(spark) {
        SimOps.probeIvfIndex(spark, root, queries, k = 5, nProbe = 4).collect()
      }
      assert(rows.nonEmpty)
      // count only the index-cell scan (partition dirs under /idx/cells)
      (totals.fileBytes, totals.numFiles)
    }
    val (b1, _) = servedBytes(20000)
    val (b10, _) = servedBytes(200000)
    val ratio = b10.toDouble / b1
    // O(sqrt N) serving: 10x corpus → ~3.2x bytes (4/√N of the data).
    // Assert well under linear with headroom for file-size granularity.
    assert(ratio < 6.0,
      s"IVF serving scan grew ${ratio}x for 10x corpus — not sub-linear " +
        s"($b1 -> $b10 bytes)")
    info(f"IVF serving bytes at 10x corpus: ${ratio}%.2fx (sub-linear; " +
      "sqrt(10) ≈ 3.16x is the model)")
  }

  private def pipelineDocs(n: Int): DataFrame = {
    import spark.implicits._
    def words = (0 until 40).map(w =>
      substring(md5(concat($"id".cast("string"), lit(s":w$w"))), 1, 8))
    spark.range(n.toLong)
      .select($"id".as("doc_id"), concat_ws(" ", words: _*).as("text"))
      .unionByName(
        spark.range(0L, n.toLong, 50L).select(
          ($"id" + 30000000L).as("doc_id"),
          concat_ws(" ", words: _*).as("text")))
      .withColumn("source", concat(lit("src"), (col("doc_id") % 4).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("10x composed curation pipeline scales ~linearly; every stage's effect exact at both scales") {
    import graft.llm.{CurationOps, DedupOps, TextOps}
    // the pipeline_e2e shape: exact dedup → token+repetition gates →
    // eval-probe decontamination → budget (sized to keep all) → shard
    def run(n: Int): (Long, Long, Double) = {
      val docs = pipelineDocs(n)
      val t0 = System.nanoTime()
      val deduped = DedupOps.exactDedup(docs, "text", "doc_id")
      val gated = TextOps.withRepetitionStats(deduped, "text")
        .where(TextOps.tokenCount(col("text")) >= 30 &&
          col("dup_word_ratio") <= 0.6)
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      val evalSet = docs.where(col("doc_id") < n && col("doc_id") % 97 === 0)
      val contaminated = CurationOps.ngramContamination(
        evalSet, gated, "text", "doc_id", n = 5)
        .where(col("overlap_ratio") >= 0.5).select(col("id").as("doc_id"))
      val clean = gated.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val budgeted = CurationOps.tokenBudgetSample(clean, "source",
        tokenBudget = 1000000000L, tokensCol = "n_chars", keyCol = "doc_id",
        salt = "sp")
      val out = CurationOps.shuffleShards(budgeted, numShards = 8,
        keyCol = "doc_id", salt = "sp")
      val (survivors, shards) = {
        val r = out.agg(count(lit(1)), countDistinct(col("shard"))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      (survivors, shards, (System.nanoTime() - t0) / 1000000.0)
    }
    run(2000) // warm-up: JIT + codegen compile, outside both timers
    val (s1, sh1, ms1) = run(2000)
    val (s10, sh10, ms10) = run(20000)
    // exact stage accounting: the n/50 planted copies die in dedup, the
    // ⌈n/97⌉ eval probes die in decontamination (self-overlap 1.0, and
    // doc-unique words keep every other doc at overlap 0), gates and
    // the over-sized budget keep everything else
    def expected(n: Int) = n.toLong - (1L + (n - 1) / 97)
    assert(s1 == expected(2000), s"1x survivors $s1 != ${expected(2000)}")
    assert(s10 == expected(20000), s"10x survivors $s10 != ${expected(20000)}")
    assert(sh1 == 8L && sh10 == 8L, s"shard fan-out broken: $sh1/$sh10")
    assertLinearWall("composed pipeline", ms1, ms10)
  }

  /** Deterministic synthetic embeddings: `n` base vectors whose
    * components are md5-derived uniforms (the same seedless scheme as
    * the LSH planes), plus `dups` exact copies of vectors 0..dups-1 at
    * ids n+i — planted cosine-1.0 near-dup pairs that land in the same
    * LSH bucket / IVF cell as their source at ANY quantizer sizing.
    */
  private def syntheticEmbeddings(n: Int, dim: Int = 16,
      dups: Int = 20): DataFrame = {
    import spark.implicits._
    val base = when($"vec_id" < n, $"vec_id").otherwise($"vec_id" - n)
    spark.range(n.toLong + dups).select($"id".as("vec_id"))
      .select($"vec_id", transform(sequence(lit(0), lit(dim - 1)), d =>
        conv(substring(md5(to_binary(concat(
          base.cast("string"), lit(":e"), d.cast("string")), lit("utf-8"))),
          1, 6), 16, 10).cast("double") / 8388607.5 - 1.0).as("embedding"))
  }

  test("10x embedding near-dup scales ~linearly (auto planes); planted copies still surface") {
    import graft.llm.SimOps
    // r16: fixed 4 planes made candidate pairs (N/16)² — 10¹⁰ pairs /
    // JVM OOM at the sweep's 100× tier. autoPlanes keeps expected
    // bucket occupancy ~32, so pairs (and thus shuffle rows) grow
    // ~linearly in N. Quadratic would read ~100× here.
    def run(n: Int): (Long, Double, Long) = {
      graft.util.GraftCache.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      var found = 0L
      val recs = shuffleRecordsDuring {
        found = SimOps.embeddingNearDups(syntheticEmbeddings(n),
            threshold = 0.999)
          .where(col("id2") - col("id1") === n.toLong).count()
      }
      (found, (System.nanoTime() - t0) / 1000000.0, recs)
    }
    run(2000) // warm-up: JIT + codegen compile, outside both timers
    val (f1, ms1, r1) = run(2000)
    val (f10, ms10, r10) = run(20000)
    // an exact copy shares every sign bit with its source, so all 8
    // tables bucket the pair together — recall is structural, not
    // probabilistic, whatever plane count the auto-sizing picks
    assert(f1 == 20 && f10 == 20,
      s"planted exact copies lost: $f1/20, $f10/20")
    info(s"embed-neardup shuffle records: 1x $r1, 10x $r10 " +
      f"(ratio ${r10.toDouble / r1}%.1f)")
    assert(r10 < r1 * 20,
      f"10x corpus put ${r10.toDouble / r1}%.1fx rows through the " +
        "shuffles — candidate-pair blow-up (auto-plane sizing lost?)")
    assertLinearWall("embedding near-dup", ms1, ms10)
  }

  test("10x semantic dedup scales ~N^1.5 (auto cells); planted copies still surface") {
    import graft.llm.SimOps
    // √N cells balance assignment O(N·cells) against within-cell pairs
    // O(N²/cells) at O(N^1.5): 10× rows may put at most ~10^1.5 ≈ 32×
    // rows through the shuffles. The old fixed 16 cells would read
    // ~100× (within-cell pairs pure quadratic).
    def run(n: Int): (Long, Double, Long) = {
      graft.util.GraftCache.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      var found = 0L
      val recs = shuffleRecordsDuring {
        found = SimOps.semanticNearDups(syntheticEmbeddings(n),
            threshold = 0.999)
          .where(col("id2") - col("id1") === n.toLong).count()
      }
      (found, (System.nanoTime() - t0) / 1000000.0, recs)
    }
    run(2000) // warm-up: JIT + codegen compile, outside both timers
    val (f1, ms1, r1) = run(2000)
    val (f10, ms10, r10) = run(20000)
    // an exact copy has identical cell similarities, so the argmax
    // assigns source and copy to the same cell at any cell count
    assert(f1 == 20 && f10 == 20,
      s"planted exact copies lost: $f1/20, $f10/20")
    info(s"semantic-dedup shuffle records: 1x $r1, 10x $r10 " +
      f"(ratio ${r10.toDouble / r1}%.1f)")
    assert(r10 < r1 * 50,
      f"10x corpus put ${r10.toDouble / r1}%.1fx rows through the " +
        "shuffles — exceeds the N^1.5 SemDeDup balance (auto-cell sizing lost?)")
    assertLinearWall("semantic dedup", ms1, ms10, bound = 50.0)
  }
}
