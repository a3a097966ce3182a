package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** The 100×-tier measurement arms (scale100x spot queries + the
  * write-side soak), factored out of `Bench` so each can run either
  * in-process (the pre-r18 behavior, kept as the fallback) or in a
  * FRESH JVM forked by the bench.
  *
  * Why fork (r18, verdict item 2): the heap now scales with the thread
  * count, but a ~25-minute bench JVM still accumulates codegen caches,
  * metaspace, broadcast debris and allocator fragmentation that the
  * inter-query `resetSession` drain cannot fully return — measured on
  * identical code, same corpus, same machine back-to-back: soak
  * merge_sec 67.7 s at the end of a full bench run vs 22.8 s in a
  * fresh JVM; r17's driver artifact saw the same on t24 (54.6 s
  * in-bench vs 24.2 s at 8 cores). Forking the late tiers is standard
  * benchmarking hygiene (JMH measures in forked JVMs for exactly this
  * reason) and makes the artifact of record measure the PLAN. The
  * timed work is unchanged — same queries, same reps, same corpus,
  * same JSON fields; `tier_fork` in the bench line records which mode
  * produced the figures.
  */
object TierArms {

  /** One untimed warm pass + `reps` timed reps per spot query, with
    * per-rep I/O metering — returns the `"scale100x":{...},` fragment
    * (trailing comma included, empty string on structural failure is
    * the CALLER's contract via exceptions).
    */
  def scale100xJson(spark: SparkSession, dir100: String,
      spot: Seq[String], reps100: Int, t10ByName: Map[String, Double],
      timed: org.apache.spark.sql.DataFrame => Unit,
      resetSession: () => Unit,
      awaitQuiet: String => Unit,
      loadavg: () => String): String = {
    val byName = graft.SparkEntry.queries
    // index-backed headlines: untimed build pass (same protocol as the
    // 10× sweep)
    spot.filter(Set("e19_ivf_serve")).foreach { name =>
      try { timed(byName(name)(spark, dir100)); () }
      catch { case _: Throwable => () }
      resetSession()
    }
    awaitQuiet("100x")
    val loadavg100x = loadavg()
    val meter = new graft.tools.IoMeter
    spark.sparkContext.addSparkListener(meter)
    val io100 = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(Double, IndexedSeq[Long])]]
    val t100 = spot.map { name =>
      // UNTIMED warm pass per spot query (r18, verdict items 1/8: t24
      // reps read 100.2/54.6 s and pipeline 5.6/19.3 s at IDENTICAL
      // bytes — the first rep pays page-cache fill + per-plan JIT, an
      // artifact of the cold sandbox FS, not of the plan; the 1× tier
      // already plan-warms via sf0.001 and e19 already gets an untimed
      // build pass). The MIN is the same estimator as before (min-of-2
      // already absorbed the cold rep); what changes is that `spread`
      // now measures plan/machine noise instead of cache state, so the
      // stability gate ("spread < 30% of min") is meaningful.
      try { timed(byName(name)(spark, dir100)); () }
      catch { case _: Throwable => () }
      resetSession()
      val reps = (1 to reps100).flatMap { _ =>
        meter.reset()
        val t0 = System.nanoTime()
        val r = try {
          timed(byName(name)(spark, dir100))
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
        Thread.sleep(800L) // listener-bus drain, outside the timer
        val io = meter.snapshotMb
        resetSession()
        r.map(t => (t, io))
      }
      io100 += name -> reps
      val times = reps.map(_._1)
      val r =
        if (times.nonEmpty) Right((times.min, times.max - times.min))
        else Left(try { timed(byName(name)(spark, dir100)); "unknown" }
          catch { case e: Throwable =>
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200) })
      resetSession()
      name -> r
    }
    spark.sparkContext.removeSparkListener(meter)
    val secs = t100.map {
      case (k, Right((s, _))) => s""""${esc(k)}":${math.rint(s * 1000) / 1000}"""
      case (k, Left(_)) => s""""${esc(k)}":-1"""
    }.mkString("{", ",", "}")
    val spreads100 = t100.collect { case (k, Right((_, sp))) =>
      s""""${esc(k)}":${math.rint(sp * 1000) / 1000}""" }
      .mkString("{", ",", "}")
    val exps = t100.collect {
      case (k, Right((s, _))) if t10ByName.get(k).exists(_ > 0) =>
        val e = math.log(s / t10ByName(k)) / math.log(10.0)
        s""""${esc(k)}":${math.rint(e * 100) / 100}"""
    }.mkString("{", ",", "}")
    val errs100 = t100.collect { case (k, Left(m)) =>
      s""""${esc(k)}":"${esc(m)}"""" }.mkString("{", ",", "}")
    // every rep's wall time next to its byte volumes: an I/O-noise rep
    // shows equal bytes and divergent seconds
    val ioJson = io100.map { case (k, reps) =>
      val arr = reps.map { case (t, io) =>
        s"""{"sec":${math.rint(t * 1000) / 1000},"read_mb":${io(0)},""" +
          s""""write_mb":${io(1)},"shuffle_read_mb":${io(2)},""" +
          s""""shuffle_write_mb":${io(3)},"spill_mb":${io(4)}}"""
      }.mkString("[", ",", "]")
      s""""${esc(k)}":$arr"""
    }.mkString("{", ",", "}")
    s""""scale100x":{"dir":"${esc(dir100)}","copies":100,""" +
      s""""reps":$reps100,"agg":"min","spread":$spreads100,""" +
      s""""loadavg":"${esc(loadavg100x)}",""" +
      s""""queries":$secs,"exponent_vs_10x":$exps,""" +
      s""""io_per_rep":$ioJson,"errors":$errs100},"""
  }

  /** The write-side soak at 10 M rows — returns the
    * `"soak100x":{...},` fragment.
    */
  def soak100xJson(spark: SparkSession, dir100: String): String = {
    val whRoot = Files.createTempDirectory("graft-soak100x").toString + "/tbl"
    val r = graft.tools.Soak100x.run(spark, dir100, whRoot)
    def s3(d: Double) = math.rint(d * 1000) / 1000
    s""""soak100x":{"sec":${s3(r.sec)},"append_sec":${s3(r.appendSec)},""" +
      s""""merge_sec":${s3(r.mergeSec)},"compact_sec":${s3(r.compactSec)},""" +
      s""""backfill_sec":${s3(r.backfillSec)},""" +
      s""""vacuum_sec":${s3(r.vacuumSec)},"read_sec":${s3(r.readSec)},""" +
      s""""rows_in":${r.rowsIn},"survivors":${r.survivors},""" +
      s""""compacted_days":${r.compactedDays},""" +
      s""""peak_jvm_heap_mb":${r.peakDriverHeapMb},""" +
      s""""peak_driver_heap_mb":${r.retainedDriverHeapMb},""" +
      s""""peak_unmanaged_heap_mb":${r.peakUnmanagedHeapMb},""" +
      s""""peak_storage_pool_mb":${r.peakStoragePoolMb},""" +
      s""""peak_execution_pool_mb":${r.peakExecutionPoolMb},""" +
      s""""retained_by_phase":{${r.retainedByPhase
        .map { case (p, mb) => s""""${esc(p)}":$mb""" }
        .mkString(",")}},""" +
      s""""heap_note":"peak_driver_heap_mb = max over phase-""" +
      s"""boundary post-GC samples of (live heap minus Spark """ +
      s"""storage+execution pools) — the LIVE driver-attributable """ +
      s"""state (manifests/blooms/collects). peak_jvm_heap_mb and """ +
      s"""peak_unmanaged_heap_mb are continuous 50 ms samples and """ +
      s"""are garbage-inflated in local mode (rare GC on a 128 GB """ +
      s"""heap): allocation ceilings, not live sets",""" +
      s""""bulk_path_engaged":${r.bulkPathEngaged}},"""
  }

  private[tools] def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The marker prefixing the forked arm's one-line result on stdout. */
  val Marker = "GRAFT_TIER_JSON="

  /** Build the child session exactly like the bench's (same master,
    * partitions, extensions), run `body`, print the marker line.
    */
  private[tools] def armMain(body: SparkSession => String): Unit = {
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
    try {
      val json = body(spark)
      // stdout only — the parent scans for the marker; diagnostics go
      // to stderr with everything else
      println(Marker + json)
    } finally spark.stop()
  }

  private[tools] def benchReset(spark: SparkSession): () => Unit = () => {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    System.gc()
    val deadline = System.nanoTime() + 3000000000L
    var usedMb = Long.MaxValue
    while (usedMb > 64L && System.nanoTime() < deadline) {
      Thread.sleep(100L)
      usedMb = spark.sparkContext.statusTracker.getExecutorInfos
        .map(i => i.usedOnHeapStorageMemory() + i.usedOffHeapStorageMemory())
        .sum / (1024L * 1024L)
      if (usedMb > 64L) System.gc()
    }
  }
}

/** Forked entry for the scale100x spot tier.
  * Args: dir100, reps, then `name=t10sec` pairs for the exponent base.
  */
object Scale100xArm {
  def main(args: Array[String]): Unit = {
    val dir100 = args(0)
    val reps = args(1).toInt
    val t10 = args.drop(2).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => v.toDoubleOption.map(k -> _)
        case _ => None
      }
    }.toMap
    val spot = Seq("q33_nation_profit", "pipeline_e2e", "t24_trigram_backoff",
      "d2_minhash_lsh", "e19_ivf_serve")
      .filter(graft.SparkEntry.headlines.contains)
    TierArms.armMain { spark =>
      val reset = TierArms.benchReset(spark)
      TierArms.scale100xJson(spark, dir100, spot, reps, t10,
        df => df.write.format("noop").mode("overwrite").save(),
        reset,
        tier => { graft.util.LoadGate.awaitQuiet(tier); () },
        () => graft.util.LoadGate.loadavg())
    }
  }
}

/** Forked entry for the write-side soak. Args: dir100. */
object SoakArm {
  def main(args: Array[String]): Unit = {
    val dir100 = args(0)
    TierArms.armMain { spark =>
      graft.util.LoadGate.awaitQuiet("soak100x")
      TierArms.soak100xJson(spark, dir100)
    }
  }
}
