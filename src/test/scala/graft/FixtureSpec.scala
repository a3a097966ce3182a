package graft

import graft.convert.{ConvertOptions, LogicalTypes, RecordConverter}
import graft.sources.{StagedLoader, WarehouseTable}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** FIXTURES.md — the reference's five integration-test schemas
  * (`integration_test_cases/{primitives,nulls,logical-types,
  * matryoshka-dolls,gcs-load}`) pushed through the conversion layer and
  * the staged-load path, with the reference's expected shapes asserted.
  */
class FixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---- fixture 1: primitives (incl. bytes → base64) ----
  private val primitivesSchema = StructType(Seq(
    StructField("row", IntegerType, nullable = false),
    StructField("null_prim", IntegerType, nullable = true),
    StructField("boolean_prim", BooleanType, nullable = false),
    StructField("int_prim", IntegerType, nullable = false),
    StructField("long_prim", LongType, nullable = false),
    StructField("float_prim", FloatType, nullable = false),
    StructField("double_prim", DoubleType, nullable = false),
    StructField("string_prim", StringType, nullable = false),
    StructField("bytes_prim", BinaryType, nullable = false)))

  private def primitivesRows = java.util.List.of(
    Row(1, null, false, 4242, 42424242424242L, 42.42f, 42424242.42424242, "forty-two",
      Array[Byte](0x00, 0x0f, 0x1e, 0x2d, 0x3c, 0x4b, 0x5a, 0x69, 0x78)),
    Row(2, 5, true, 4354, 435443544354L, 43.54f, 435443.544354, "forty-three", Array[Byte](0x7f)))

  test("primitives: conversion passes values through, bytes become base64") {
    val df = spark.createDataFrame(primitivesRows, primitivesSchema)
    val out = RecordConverter.convert(df)
    assert(out.schema("bytes_prim").dataType == StringType)
    val r1 = out.where($"row" === 1).collect().head
    assert(r1.getAs[String]("bytes_prim") ==
      java.util.Base64.getEncoder.encodeToString(
        Array[Byte](0x00, 0x0f, 0x1e, 0x2d, 0x3c, 0x4b, 0x5a, 0x69, 0x78)))
    assert(r1.isNullAt(r1.fieldIndex("null_prim")))
    assert(r1.getAs[Long]("long_prim") == 42424242424242L)
    assert(RecordConverter.convertedSchema(primitivesSchema)
      .fieldNames.toSeq == primitivesSchema.fieldNames.toSeq)
  }

  // ---- fixture 2: nulls matrix + REQUIRED enforcement ----
  test("nulls: optional nulls pass, REQUIRED null fails") {
    val schema = StructType(Seq(
      StructField("row", IntegerType, nullable = false),
      StructField("f1", StringType, nullable = false),
      StructField("f2", StringType, nullable = true),
      StructField("f3", IntegerType, nullable = true),
      StructField("f4", BooleanType, nullable = true)))
    val ok = spark.createDataFrame(java.util.List.of(
      Row(1, "Required string", null, null, null),
      Row(2, "Required string", "foobar", null, null),
      Row(3, "Required string", null, 42, null),
      Row(4, "Required string", null, null, false)), schema)
    assert(RecordConverter.enforceRequired(RecordConverter.convert(ok)).count() == 4)

    val bad = spark.createDataFrame(java.util.List.of(
      Row(1, null, "x", 1, true)), schema)
    intercept[Exception] {
      RecordConverter.enforceRequired(bad).collect()
    }
  }

  // ---- fixture 3: logical types (Kafka Timestamp/Date on the wire) ----
  test("logical-types: epoch 0 / 42000000 / 1468275102000 golden strings") {
    // Connect delivers both logical types as epoch-ms (java.util.Date);
    // the fixture's date rows are day counts 0 / 4200 / 16993 → ms
    val schema = StructType(Seq(
      StructField("row", IntegerType, nullable = false),
      StructField("timestamp_test", LongType, nullable = false,
        metadata = RecordConverter.logicalMeta(LogicalTypes.KafkaTimestamp)),
      StructField("date_test", LongType, nullable = false,
        metadata = RecordConverter.logicalMeta(LogicalTypes.KafkaDate))))
    val rows = RecordConverter.convert(spark.createDataFrame(
      java.util.List.of(
        Row(1, 0L, 0L),
        Row(2, 42000000L, 4200L * 86400000L),
        Row(3, 1468275102000L, 16993L * 86400000L)), schema))
      .collect()
    val m = rows.map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(m(1) == (("1970-01-01 00:00:00.000", "1970-01-01")))
    assert(m(2) == (("1970-01-01 11:40:00.000", "1981-07-02")))
    assert(m(3) == (("2016-07-11 22:11:42.000", "2016-07-11")))
  }

  // ---- fixture 4: matryoshka-dolls (deep nesting + arrays + reuse) ----
  test("matryoshka-dolls: deep nesting converts recursively, arrays stay REPEATED") {
    val inner = StructType(Seq(
      StructField("inner_int", IntegerType, nullable = false),
      StructField("inner_string", StringType, nullable = false)))
    val schema = StructType(Seq(
      StructField("row", IntegerType, nullable = false),
      StructField("middle", StructType(Seq(
        StructField("middle_array", ArrayType(FloatType), nullable = false),
        StructField("inner", inner, nullable = false))), nullable = false),
      StructField("inner", inner, nullable = false)))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1, Row(Seq(42.0f, 42.42f), Row(42, "42")), Row(-42, "-42")),
      Row(2, Row(Seq(43.0f), Row(43, "43")), Row(-43, "-43"))), schema)
    val out = RecordConverter.convert(df, ConvertOptions(convertDoubleSpecial = true))
    assert(out.schema == RecordConverter.convertedSchema(schema))
    val r = out.where($"row" === 1).collect().head
    val middle = r.getStruct(r.fieldIndex("middle"))
    assert(middle.getSeq[Float](0) == Seq(42.0f, 42.42f))
    assert(middle.getStruct(1).getInt(0) == 42)
    assert(r.getStruct(r.fieldIndex("inner")).getString(1) == "-42")
  }

  // ---- fixture 5: gcs-load — primitives through the staged NDJSON path ----
  test("gcs-load: primitives batch staged as NDJSON, loaded, read back") {
    val staging = Files.createTempDirectory("fx-stage").toString
    val whRoot = Files.createTempDirectory("fx-wh").toString + "/primitives"
    val converted = RecordConverter.convert(
      spark.createDataFrame(primitivesRows, primitivesSchema))
    WarehouseTable.create(spark, whRoot, Seq("row"),
      RecordConverter.convertedSchema(primitivesSchema))
    StagedLoader.stageBatch(
      converted.withColumn("partitionTime", to_timestamp(lit("2024-05-01 00:00:00"))),
      staging, "primitives")
    val res = StagedLoader.runOnce(spark, staging, _ => whRoot)
    assert(res.head.rowsLoaded == 2)
    val back = WarehouseTable.open(spark, whRoot).read()
    assert(back.count() == 2)
    assert(back.where($"row" === 1).select($"string_prim").as[String].collect().head
      == "forty-two")
  }
}
