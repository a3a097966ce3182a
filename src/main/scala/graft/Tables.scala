package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-generated parquet corpus (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
    // default; read it as a nanos LongType and convert where needed
    // (eventsTsMicros) — DuckDB likewise truncates ns → µs TIMESTAMP.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with `ts` converted from nanos-long to µs TimestampType,
    * matching what the DuckDB oracle sees for the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
}
