package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-generated parquet corpus (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) (read as a
    // nanos LongType under nanosAsLong) and TIMESTAMP(MICROS, ntz).
    // Downstream operators and every oracle assume the nanos-long
    // representation, so normalize the µs form back to it here (the
    // session timezone is UTC everywhere, making the NTZ→LTZ cast an
    // identity on the wall-clock value).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" if df.schema("ts").dataType != org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      // the date columns are consumed as timestamps; if a future corpus
      // regeneration ships them as TIMESTAMP(NANOS) (read as nanos longs
      // under nanosAsLong), restore the timestamp form
      case "lineitem" if df.schema("l_shipdate").dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("l_shipdate",
          org.apache.spark.sql.functions.expr("timestamp_micros(l_shipdate div 1000)"))
      case "orders" if df.schema("o_orderdate").dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("o_orderdate",
          org.apache.spark.sql.functions.expr("timestamp_micros(o_orderdate div 1000)"))
      case _ => df
    }
  }

  /** `events` with `ts` converted from nanos-long to µs TimestampType,
    * matching what the DuckDB oracle sees for the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
}
