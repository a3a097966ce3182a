package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-module packs; each entry pairs a
  * Spark plan with (when SQL-expressible) a DuckDB oracle over the same
  * tables.
  */
object SparkEntry {

  val packs: Seq[QueryPack] = Seq(
    _root_.graft.queries.CoreQueries,
    _root_.graft.queries.MergeQueries,
    _root_.graft.queries.ConvertQueries,
    _root_.graft.queries.WarehouseQueries,
    _root_.graft.queries.TemporalQueries,
    _root_.graft.queries.WebQueries,
    _root_.graft.queries.LlmQueries,
    _root_.graft.queries.SqlSurfaceQueries)

  lazy val allQueries: Seq[GraftQuery] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end merge spine: upsert/delete flush of a staged batch.
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "j2_merge_upsert_delete").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Queries Bench times at sf0.1. */
  def headlines: Seq[String] = allQueries.filter(_.headline).map(_.name)
}
