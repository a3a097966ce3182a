package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * Failure is never silent: a query that throws records `-1` in the
  * queries map plus its message in `errors`, and is excluded from the
  * total — a broken query can't masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val byName = SparkEntry.queries

    // Inter-query isolation: queries that cache/localCheckpoint release
    // their own references, but the BLOCKS only die when the RDD object
    // is GC'd (ContextCleaner), and shuffle files likewise. Across 17
    // back-to-back queries in one JVM that lag accumulates into storage
    // evictions and disk pressure that bleed into later queries' times —
    // so explicitly drop every persisted RDD and nudge the cleaner
    // between timed queries (outside the timers).
    //
    // NOTE the expected WARNs: unpersisting a locally-checkpointed RDD
    // logs "cannot be recomputed after unpersisting" per block. That is
    // benign HERE — every query's results are fully materialized
    // (collected/counted) before the reset, so nothing downstream will
    // ever recompute those RDDs. It is a log-noise artifact of the
    // isolation sweep, not data loss.
    def resetSession(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    // Warm EVERY headline's plan on the smallest SF so per-query times
    // measure the plan, not first-use codegen/classloading.
    SparkEntry.headlines.foreach { n =>
      try byName(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable =>
        System.err.println(s"[bench-warm] $n failed: ${e.getMessage}") }
    }
    resetSession()

    // min-of-N per query: two rounds of single-run timings produced
    // phantom regressions from shared-VM load (r07 "36.8 s" s6, r09's
    // uniform "+20%" that an idle re-run showed was +4% noise). The min
    // of 3 isolated runs estimates the load-free cost; the spread
    // (max-min) tells the reader how noisy the machine was, so a
    // cross-round delta can be adjudicated as code vs machine.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results: Seq[(String, Either[String, (Double, Double)])] =
      SparkEntry.headlines.map { name =>
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          val t = try {
            byName(name)(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
          resetSession()
          t
        }
        if (times.isEmpty) {
          val msg = try { byName(name)(spark, sfDir).count(); "unknown" }
            catch { case e: Throwable =>
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200) }
          resetSession()
          name -> Left(msg)
        } else name -> Right((times.min, times.max - times.min))
      }

    // Reference throughput-parity probe (the one performance figure the
    // reference publishes): 1 M upsert/delete records through the
    // streaming merge pipeline in 10 flushes, survivor-verified inside.
    // One rep (it is a 1 M-row end-to-end run, not a plan microbench);
    // reported as its own JSON field, NOT folded into the headline
    // total, so cross-round totals stay comparable.
    val streamProbe: Either[String, (Double, Long)] =
      try {
        val wh = Files.createTempDirectory("bench-stream-wh").toString
        val ck = Files.createTempDirectory("bench-stream-ckpt").toString
        val r = graft.streaming.ThroughputProbe.run(spark, wh, ck, 1000000L)
        resetSession()
        Right(r)
      } catch { case e: Throwable =>
        resetSession()
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    // `queries` carries the per-query MIN (the load-free estimate the
    // driver's schema expects); `spread` carries max-min across the
    // reps so a judge can separate machine noise from plan changes.
    val qs = results.map {
      case (k, Right((mn, _))) => s""""${esc(k)}":$mn"""
      case (k, Left(_)) => s""""${esc(k)}":-1"""
    }.mkString("{", ",", "}")
    val spreads = results.collect { case (k, Right((_, sp))) =>
      s""""${esc(k)}":${math.rint(sp * 1000) / 1000}""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) =>
      s""""${esc(k)}":"${esc(m)}"""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right((mn, _))) => mn }.sum
    val nFailed = results.count(_._2.isLeft)
    val probeJson = streamProbe match {
      case Right((wall, survivors)) =>
        val rps = math.rint(1000000L / wall)
        s"""{"sec":${math.rint(wall * 1000) / 1000},"rec_per_s":$rps,""" +
          s""""records":1000000,"flushes":10,"survivors":$survivors,""" +
          s""""reference_budget_sec":600}"""
      case Left(m) => s"""{"error":"${esc(m)}"}"""
    }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""spread":$spreads,"reps":$reps,"agg":"min",""" +
        s""""stream_merge_1m":$probeJson,""" +
        s""""errors":$errs,"failed":$nFailed,"sf":"${esc(sfDir)}"}"""

    // emit on stdout AND stderr (sbt decorates stdout with [info]), plus
    // a file, so the driver's parse can't miss it
    println(line)
    System.err.println(line)
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
