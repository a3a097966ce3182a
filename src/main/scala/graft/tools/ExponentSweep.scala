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
  * Usage: runMain graft.tools.ExponentSweep <dir1x> <dir10x> [startAt]
  */
object ExponentSweep {
  def main(args: Array[String]): Unit = {
    val dir1 = args(0)
    val dir10 = args(1)
    val startAt = if (args.length > 2) args(2) else ""
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = graft.SparkEntry.queries
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def time(n: String, d: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      val r = try {
        byName(n)(spark, d).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(120)) }
      reset()
      r
    }
    val names = byName.keys.toSeq.sorted.dropWhile(n => startAt.nonEmpty && n != startAt)
    val rows = names.flatMap { n =>
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
    rows.filter(_._3 >= 2.0).sortBy(-_._4).take(25).foreach { case (n, t1, t10, e) =>
      println(f"[sweep-top] $n%-28s t1=$t1%7.2f t10=$t10%7.2f e=$e%5.2f")
    }
    spark.stop()
  }
}
