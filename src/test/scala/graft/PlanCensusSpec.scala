package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The frozen physical-plan hazard census (r16 verdict item 7):
  * `tools/PlanScan` builds every `SparkEntry` query's executed plan and
  * flags shapes that are silent at test SF but OOM-class at 100× — the
  * x15 lesson, where a `max_by(struct, struct)` silently planned
  * `SortAggregate` over a 3.6G-row embedding-carrying stream and only
  * the 100× sweep's heap ceiling caught it. The census existed as a
  * tool; this spec freezes it: a NEW untriaged SortAggregate query or
  * ANY CartesianProduct fails the suite at authoring time, not at the
  * next sweep's OOM.
  *
  * Triage rules for allowlisting a SortAggregate (PlanScan scaladoc):
  * benign iff input ≈ output (every row moves once regardless of plan),
  * the input is pre-collapsed to ~group-count rows, or ordered
  * semantics demand the sort anyway (as-of joins). Anything else needs
  * the x15 treatment (two-pass HashAggregate argmax over scalars)
  * before it ships.
  */
class PlanCensusSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The r16-triaged SortAggregate set (SURVEY.md census), re-verified
    * r17 at sf0.01 and sf0.001. Each entry benign by rule:
    *  - input≈output (one row per near-unique key either way):
    *    a1_dedup_lww, d1_exact_dedup, d7_incremental_dedup,
    *    d12_quality_survivors, j1/j2/j4/j5 merge legs,
    *    pipeline_e2e + x12_curation_pipeline (their embedded LWW stage)
    *  - pre-collapsed input (≤ k rows per group reach the aggregate):
    *    e16_knn_classify, t24_trigram_backoff (argmax over the
    *    vocabulary-sized count relation)
    *  - ordered semantics demand a sort regardless:
    *    j6_asof_join, j12_nearest_join, j13_asof_tolerance,
    *    a31_ohlc_bars (first/last over time order)
    */
  private val sortAggTriaged: Set[String] = Set(
    "a1_dedup_lww", "a31_ohlc_bars",
    "d1_exact_dedup", "d7_incremental_dedup", "d12_quality_survivors",
    "e16_knn_classify",
    "j1_merge_upsert", "j2_merge_upsert_delete", "j4_insert_anti",
    "j5_delete_only_merge", "j6_asof_join", "j12_nearest_join",
    "j13_asof_tolerance",
    "pipeline_e2e", "t24_trigram_backoff", "x12_curation_pipeline")

  /** SQL row-level DML (UPDATE/DELETE/MERGE INTO) resolves only when
    * `GraftExtensions` was injected at session BUILD time; the suite's
    * shared `getOrCreate` session belongs to whichever suite ran first
    * and cannot gain extensions afterwards. When the arms fail with
    * exactly that UNSUPPORTED_FEATURE error they are exempt here —
    * their DML plan shapes are pinned by `GraftCatalogSpec`, which
    * always builds an extensions-bearing session. Any OTHER error on
    * them still fails the census.
    */
  private val extensionDependent =
    Set("c2_sql_update_delete", "c3_sql_merge_clauses", "c4_sql_merge_by_source")

  test("plan census: no CartesianProduct, no untriaged SortAggregate, no build errors") {
    val census = graft.tools.PlanScan.census(spark, sf)
    assert(census.size == SparkEntry.queries.size)
    val errors = census.filter(_._2.exists(_.startsWith("ERROR:")))
      .filterNot { case (n, hits) =>
        extensionDependent.contains(n) &&
          hits.exists(_.contains("UNSUPPORTED_FEATURE.TABLE_OPERATION"))
      }
    assert(errors.isEmpty, s"plan builds failed: $errors")
    val cartesian = census.collect {
      case (n, hits) if hits.contains("CartesianProduct") => n
    }
    assert(cartesian.isEmpty,
      s"CartesianProduct planned (broadcast(single-row) idiom broken?): $cartesian")
    val sortAgg = census.collect {
      case (n, hits) if hits.contains("SortAggregate") => n
    }.toSet
    val untriaged = sortAgg -- sortAggTriaged
    assert(untriaged.isEmpty,
      s"NEW untriaged SortAggregate in: $untriaged — an OOM-class shape " +
        "at 100x unless proven benign; triage against the PlanScan rules " +
        "(input~=output / pre-collapsed / ordered-semantics) and either " +
        "fix the plan (two-pass HashAggregate argmax, the x15 fix) or " +
        "add it here WITH its rule")
  }
}
