package graft.tools

import org.apache.spark.sql.SparkSession

/** One-rep exponent sweep over EVERY SparkEntry query: time each at the
  * base dir and the 10× dir (noop-write action), print
  * `e = ln(t10/t1)/ln 10` sorted descending. One rep is noisy (±0.2 on
  * sub-second queries), but the defects this exists to catch — a
  * CollapseProject re-evaluating an expensive chain per join pair, an
  * eager corpus-scaled materialization — read 10×+ out of family, far
  * above the noise floor. The bench tracks exponents for headlines
  * only; this sweeps the other ~250.
  *
  * 100× TIER (r15 VERDICT #5): the 5-query 100× spot set missed the
  * CollapseProject family that this sweep caught at 10×; the same
  * blind spot exists at the SECOND decade. When a 100× dir is given,
  * the top `SWEEP_TOP100` (default 10) outliers of the 1×→10× pass
  * (ranked by first-decade exponent, t10 ≥ 2 s) re-run once at 100×
  * and the second-decade exponent e2 = ln(t100/t10)/ln 10 is ranked
  * and written to `SWEEP100X.json` — the committable artifact.
  *
  * Usage: runMain graft.tools.ExponentSweep <dir1x> <dir10x>
  *          [dir100x|-] [startAt]
  */
object ExponentSweep {
  def main(args: Array[String]): Unit = {
    val dir1 = args(0)
    val dir10 = args(1)
    val dir100 = if (args.length > 2 && args(2) != "-") Some(args(2)) else None
    val startAt = if (args.length > 3) args(3) else ""
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    var spark = newSession()
    // One fatal arm (e.g. an executor-thread OOM stopping the local
    // SparkContext) must not void every later arm: if the context died,
    // tear the session down and build a fresh one before the next arm.
    def ensureAlive(): Unit =
      if (spark.sparkContext.isStopped) {
        println("[sweep] SparkContext stopped by previous arm — rebuilding session")
        try SparkSession.clearActiveSession() finally SparkSession.clearDefaultSession()
        spark = newSession()
      }
    val byName = graft.SparkEntry.queries
    def reset(): Unit = {
      spark.catalog.clearCache()
      graft.util.GraftCache.clear()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def loadavg(): String = graft.util.LoadGate.loadavg()
    def time(n: String, d: String): Either[String, Double] = {
      ensureAlive()
      val t0 = System.nanoTime()
      val r = try {
        byName(n)(spark, d).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .takeWhile(c => c != '\n' && c != '\r').take(160)) }
      ensureAlive()
      reset()
      r
    }
    // SWEEP_ONLY=a,b,c restricts the sweep to the named queries — the
    // re-run path after a fix, so the 100x tier doesn't require
    // re-timing all ~276 first-decade arms to re-rank its outliers.
    val only = sys.env.get("SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // LOAD GATE (r16 verdict item 4: SWEEP100X recorded loadavg 9.88 at
    // tier start while billed clean — the sweep now runs under the same
    // gate as Bench). Full sweeps gate once at the start — back-to-back
    // 32-core arms keep the 1-min average above any sane threshold, so
    // per-arm gating there would add hours of decay waits between arms
    // that contaminate each other identically anyway. The hand-picked
    // SWEEP_ONLY re-runs and every 100× arm (the figures a verdict
    // quotes individually) gate PER ARM, and the artifact records each
    // arm's release loadavg so the billing is checkable.
    val gateTimeouts = scala.collection.mutable.ArrayBuffer.empty[String]
    def gated(tier: String): String = {
      val o = graft.util.LoadGate.awaitQuiet(tier)
      if (o.timedOut) gateTimeouts += tier
      o.loadAtRelease
    }
    val loadavgAtSweepStart = gated("sweep-first-decade")
    val names = byName.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .dropWhile(n => startAt.nonEmpty && n != startAt)
    val rows = names.flatMap { n =>
      if (only.nonEmpty) gated(s"sweep-only:$n")
      (time(n, dir1), time(n, dir10)) match {
        case (Right(t1), Right(t10)) =>
          val e = math.log(t10 / t1) / math.log(10.0)
          println(f"[sweep] $n%-28s t1=$t1%7.2f t10=$t10%7.2f e=$e%5.2f")
          Some((n, t1, t10, e))
        case (a, b) =>
          println(s"[sweep] $n ERROR t1=$a t10=$b")
          None
      }
    }
    println("==== top exponents (t10 >= 2s, by e desc) ====")
    // an explicit SWEEP_ONLY list was hand-picked — keep every member
    // in the 100x artifact even if its re-measured t10 dips below the
    // noise floor the full-sweep ranking filters at
    val outliers = rows.filter(r => only.nonEmpty || r._3 >= 2.0).sortBy(-_._4)
    outliers.take(25).foreach { case (n, t1, t10, e) =>
      println(f"[sweep-top] $n%-28s t1=$t1%7.2f t10=$t10%7.2f e=$e%5.2f")
    }
    // first-decade artifact (full sweeps only — a SWEEP_ONLY subset is
    // a re-run, not surface coverage): every arm, exponent-desc, so
    // "no unexplained superlinear query" is auditable per round
    if (only.isEmpty) {
      val body = rows.sortBy(-_._4).map { case (n, t1, t10, e) =>
        f"$n%-28s t1=$t1%7.2f t10=$t10%7.2f e=$e%5.2f" }.mkString("\n")
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SWEEP10X.txt"),
        s"# ExponentSweep first decade: $dir1 -> $dir10, one rep, " +
          s"noop-write action\n" +
          s"# load gate: threshold ${graft.util.LoadGate.threshold}, " +
          s"timeouts [${gateTimeouts.mkString(",")}]\n" +
          s"# loadavg at gated start: $loadavgAtSweepStart\n" +
          s"# loadavg at end: ${loadavg()}\n$body\n")
      catch { case e: Throwable =>
        System.err.println(s"[sweep] 10x artifact write failed: $e") }
    }

    // ---- second decade over the first decade's worst offenders ----
    dir100.foreach { d100 =>
      val topN = sys.env.getOrElse("SWEEP_TOP100", "10").toInt
      val spot = outliers.take(topN)
      println(s"==== 100x tier: top-$topN first-decade outliers ====")
      val la = gated("sweep-100x-start")
      val results = spot.map { case (n, t1, t10, e1) =>
        // per-ARM gate + recorded release loadavg: these are the
        // figures a verdict quotes individually, so each must carry
        // its own quiet-machine evidence
        val armLoad = gated(s"sweep-100x:$n")
        time(n, d100) match {
          case Right(t100) =>
            val e2 = math.log(t100 / t10) / math.log(10.0)
            println(f"[sweep-100x] $n%-28s t10=$t10%7.2f t100=$t100%8.2f " +
              f"e1=$e1%5.2f e2=$e2%5.2f")
            (n, t1, t10, e1, Right(t100), Some(e2), armLoad)
          case Left(m) =>
            println(s"[sweep-100x] $n ERROR $m")
            (n, t1, t10, e1, Left(m), None, armLoad)
        }
      }
      def esc(s: String) = s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val items = results.map {
        case (n, t1, t10, e1, Right(t100), Some(e2), al) =>
          f""""${esc(n)}":{"t1":$t1%.3f,"t10":$t10%.3f,"t100":$t100%.3f,""" +
            f""""e1":$e1%.2f,"e2":$e2%.2f,"loadavg_at_arm_start":"${esc(al)}"}"""
        case (n, t1, t10, e1, Left(m), _, al) =>
          f""""${esc(n)}":{"t1":$t1%.3f,"t10":$t10%.3f,""" +
            f""""e1":$e1%.2f,"error":"${esc(m)}","loadavg_at_arm_start":"${esc(al)}"}"""
      }.mkString(",")
      val json = s"""{"tool":"ExponentSweep","dir1":"${esc(dir1)}",""" +
        s""""dir10":"${esc(dir10)}","dir100":"${esc(d100)}",""" +
        s""""top":$topN,"rank":"first-decade exponent desc (t10>=2s)",""" +
        s""""load_gate":{"threshold":${graft.util.LoadGate.threshold},""" +
        s""""per_arm":true,"timeouts":[${gateTimeouts
          .map(t => s""""${esc(t)}"""").mkString(",")}]},""" +
        s""""loadavg_at_100x_start":"${esc(la)}",""" +
        s""""loadavg_at_100x_end":"${esc(loadavg())}",""" +
        s""""queries":{$items}}"""
      println(json)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SWEEP100X.json"), json + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[sweep] artifact write failed: $e") }
    }
    spark.stop()
  }
}
