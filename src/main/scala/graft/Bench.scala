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

    val results: Seq[(String, Either[String, Double])] = SparkEntry.headlines.map { name =>
      val t0 = System.nanoTime()
      val r = try {
        byName(name)(spark, sfDir).count()
        name -> Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          name -> Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      resetSession()
      r
    }

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    val qs = results.map {
      case (k, Right(v)) => s""""${esc(k)}":$v"""
      case (k, Left(_)) => s""""${esc(k)}":-1"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) =>
      s""""${esc(k)}":"${esc(m)}"""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nFailed = results.count(_._2.isLeft)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
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
