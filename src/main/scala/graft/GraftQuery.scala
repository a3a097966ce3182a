package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-query: a Spark plan plus (when SQL-expressible)
  * the equivalent ANSI SQL a DuckDB oracle runs over the same tables.
  * Column names must match exactly between the two (driver hash-compares
  * after sorting columns by name).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Headline queries are the ones Bench times at sf0.1. */
    headline: Boolean = false)

trait QueryPack {
  def queries: Seq[GraftQuery]
}
