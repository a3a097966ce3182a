package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-surface physical-plan hazard scan: builds (does not run) every
  * `SparkEntry` query's executed plan and reports occurrences of shapes
  * that are cheap at test SF but can dominate or die at 100×:
  *
  *  - `SortAggregate` — planned whenever an aggregation buffer is not
  *    hash-mutable (struct-ordered `max_by`/`min_by`, binary max …).
  *    HAZARDOUS when the aggregate's INPUT stream is much larger than
  *    its group count (the r16 x15 OOM: a 3.6G-row broadcast-join
  *    stream, embedding arrays aboard, sorted for 20k groups). BENIGN
  *    when input ≈ output (LWW dedup over near-unique keys: any plan
  *    moves every row once) or when the input is already collapsed
  *    (e16's vote argmax over ≤ k rows/query), or when ordered
  *    semantics demand a sort anyway (as-of joins).
  *  - `CartesianProduct` — a non-broadcast cross join; never acceptable
  *    here (the broadcast(single-row) idiom must keep these out).
  *  - `ObjectHashAggregate` — TypedImperativeAggregates (percentiles,
  *    collect_list, HLL). Hash-based with a sort fallback at
  *    `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`;
  *    listed for awareness, generally fine.
  *
  * r16 triage of the full 276-query surface is recorded in SURVEY.md
  * (one real defect: x15's argmax, fixed; everything else benign by the
  * rules above). Since r17 the census is FROZEN as a regression gate:
  * `PlanCensusSpec` fails on any new untriaged SortAggregate query or
  * any CartesianProduct (these shapes are silent until an OOM — the
  * x15 lesson). This main remains the ad-hoc re-run / triage tool:
  * `sbt "runMain graft.tools.PlanScan [sfDir]"`.
  */
object PlanScan {
  val shapes: Seq[String] =
    Seq("SortAggregate", "CartesianProduct", "ObjectHashAggregate")

  /** (query → hazard shapes in its executed plan) for every SparkEntry
    * query. Plans are built, never executed (some builders still run
    * small eager sizing jobs — counts / centroid collects — by their
    * own contracts). A build failure yields an `ERROR:` pseudo-shape so
    * gating specs fail loud instead of under-counting.
    */
  def census(spark: SparkSession, dir: String): Seq[(String, Seq[String])] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, f) =>
      val hits =
        try {
          val plan = f(spark, dir).queryExecution.executedPlan.toString
          shapes.filter(plan.contains)
        } catch { case e: Throwable =>
          Seq("ERROR:" + Option(e.getMessage).getOrElse("?").take(80))
        }
      spark.catalog.clearCache()
      graft.util.GraftCache.clear()
      n -> hits
    }

  def main(a: Array[String]): Unit = {
    val dir = a.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cen = census(spark, dir)
    cen.foreach { case (n, hits) =>
      if (hits.nonEmpty) println(s"[planscan] $n: ${hits.mkString(",")}")
    }
    val cartesians = cen.count(_._2.contains("CartesianProduct"))
    println(s"[planscan] done; cartesian products: $cartesians (must be 0)")
    spark.stop()
  }
}
