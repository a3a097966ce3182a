package graft

import graft.convert._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-value tests for the conversion layer, ported from the
  * reference's unit corpus:
  * `convert/logicaltype/DebeziumLogicalConvertersTest.java:40-142`,
  * `KafkaLogicalConvertersTest.java:40-131`,
  * `convert/BigQueryRecordConverterTest.java:190-230, 490-510, 545-660`,
  * `utils/FieldNameSanitizerTest.java`.
  */
class ConvertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Evaluate a single Column over a one-row frame. */
  private def eval1(df: DataFrame): Row = df.collect().head

  // ---- P8: logical types; constants from DebeziumLogicalConvertersTest
  //      (March 1 2017, 22:20:38.808(123) UTC)
  private val MilliTs = 1488406838808L
  private val MicroTs = 1488406838808123L
  private val Days = 17226

  test("kafka Date: ms epoch → yyyy-MM-dd") {
    val r = eval1(Seq(MilliTs).toDF("c").select(LogicalTypes.kafkaDate($"c")))
    assert(r.getString(0) == "2017-03-01")
  }

  test("kafka Timestamp: ms epoch → yyyy-MM-dd HH:mm:ss.SSS") {
    val r = eval1(Seq(MilliTs).toDF("c").select(LogicalTypes.kafkaTimestamp($"c")))
    assert(r.getString(0) == "2017-03-01 22:20:38.808")
  }

  test("kafka Time: ms → HH:mm:ss.SSS") {
    val r = eval1(Seq(MilliTs).toDF("c").select(LogicalTypes.kafkaTime($"c")))
    assert(r.getString(0) == "22:20:38.808")
  }

  test("debezium Date: days → yyyy-MM-dd") {
    val r = eval1(Seq(Days).toDF("c").select(LogicalTypes.debeziumDate($"c")))
    assert(r.getString(0) == "2017-03-01")
  }

  test("debezium MicroTime: µs → HH:mm:ss.<unpadded µs>") {
    val r = eval1(Seq(MicroTs).toDF("c").select(LogicalTypes.debeziumMicroTime($"c")))
    assert(r.getString(0) == "22:20:38.808123")
  }

  test("debezium MicroTimestamp: µs → datetime.<unpadded µs>") {
    val r = eval1(Seq(MicroTs).toDF("c").select(LogicalTypes.debeziumMicroTimestamp($"c")))
    assert(r.getString(0) == "2017-03-01 22:20:38.808123")
  }

  test("debezium Time: ms-int → HH:mm:ss.SSS") {
    val r = eval1(Seq(1488406838).toDF("c").select(LogicalTypes.debeziumTime($"c")))
    assert(r.getString(0) == "05:26:46.838")
  }

  test("debezium Timestamp: ms → yyyy-MM-dd HH:mm:ss.SSS") {
    val r = eval1(Seq(MilliTs).toDF("c").select(LogicalTypes.debeziumTimestamp($"c")))
    assert(r.getString(0) == "2017-03-01 22:20:38.808")
  }

  test("debezium ZonedTimestamp: T → space, offset kept") {
    val r = eval1(Seq("2017-03-01T14:20:38.808-08:00").toDF("c")
      .select(LogicalTypes.debeziumZonedTimestamp($"c")))
    assert(r.getString(0) == "2017-03-01 14:20:38.808-08:00")
  }

  // ---- P5: double specials (BigQueryRecordConverterTest.java:190-230)
  test("double specials: +Inf→MAX, -Inf/NaN→MIN, plain passthrough") {
    val out = Seq(Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN, 4.2)
      .toDF("c").select(RecordConverter.normalizeDouble($"c")).as[Double].collect()
    assert(out(0) == Double.MaxValue)
    assert(out(1) == java.lang.Double.MIN_VALUE)
    assert(out(2) == java.lang.Double.MIN_VALUE)
    assert(out(3) == 4.2)
  }

  // ---- P6: base64 (BigQueryRecordConverterTest.java:490-510)
  test("bytes → Base64") {
    val r = eval1(Seq("hello world").toDF("s")
      .select(RecordConverter.bytesToBase64(encode($"s", "UTF-8"))))
    assert(r.getString(0) == "aGVsbG8gd29ybGQ=")
  }

  // ---- P4: sanitizer (FieldNameSanitizer.java:29-37 cases)
  test("sanitizeName") {
    assert(FieldSanitizer.sanitizeName("abc") == "abc")
    assert(FieldSanitizer.sanitizeName("a.b") == "a_b")
    assert(FieldSanitizer.sanitizeName("a-b!c") == "a_b_c")
    assert(FieldSanitizer.sanitizeName("9abc") == "_9abc")
    assert(FieldSanitizer.sanitizeName("_abc") == "_abc")
    assert(FieldSanitizer.sanitizeName("with space") == "with_space")
  }

  test("sanitize renames nested fields without touching data") {
    val df = Seq((1L, ("x", 2.0))).toDF("id!", "rec y")
    val out = FieldSanitizer.sanitize(df)
    assert(out.columns.toSeq == Seq("id_", "rec_y"))
    assert(out.schema("rec_y").dataType.asInstanceOf[StructType].fieldNames.toSeq
      == Seq("_1", "_2"))
    assert(out.collect().head.getLong(0) == 1L)
  }

  test("sanitize throws on post-sanitize collisions") {
    val df = Seq((1, 2)).toDF("a.b", "a/b")
    intercept[IllegalArgumentException](FieldSanitizer.sanitize(df))
  }

  // ---- P1: recursive conversion + empty-struct drop
  //      (BigQueryRecordConverterTest.java:176-187 semantics)
  test("empty struct fields are dropped, schema and data side") {
    val schema = StructType(Seq(
      StructField("a", LongType),
      StructField("empty", StructType(Nil)),
      StructField("nested", StructType(Seq(
        StructField("inner_empty", StructType(Nil)),
        StructField("b", StringType))))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, Row(), Row(Row(), "x"))), schema)
    val out = RecordConverter.convert(df)
    assert(out.columns.toSeq == Seq("a", "nested"))
    assert(out.schema("nested").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("b"))
    assert(RecordConverter.convertedSchema(schema).fieldNames.toSeq == Seq("a", "nested"))
    assert(out.select($"nested.b").as[String].collect().head == "x")
  }

  test("null nullable struct stays null after conversion") {
    val df = Seq((1L, Option.empty[(String, Long)])).toDF("a", "s")
    val out = RecordConverter.convert(df)
    assert(out.select($"s").collect().head.isNullAt(0))
  }

  // ---- P7: map explode (BigQueryRecordConverterTest.java:368+ semantics)
  test("map → array<{key,value}> recursively converted") {
    val df = Seq((1, Map("k1" -> 1.0, "k2" -> Double.NaN))).toDF("id", "m")
    val out = RecordConverter.convert(df, ConvertOptions(convertDoubleSpecial = true))
    val t = out.schema("m").dataType
    assert(t.isInstanceOf[ArrayType])
    val et = t.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(et.fieldNames.toSeq == Seq("key", "value"))
    val entries = out.select(explode($"m").as("e"))
      .select($"e.key", $"e.value").as[(String, Double)].collect().toMap
    assert(entries("k1") == 1.0)
    assert(entries("k2") == java.lang.Double.MIN_VALUE)
  }

  // ---- P3: REQUIRED enforcement (BigQueryRecordConverter.java:133-141)
  test("requiredViolations: zero (not NULL) per field on an empty batch, " +
      "exact null counts otherwise") {
    import spark.implicits._
    val df = Seq((Some(1L), Option.empty[String]),
      (None, Some("x")), (Some(3L), Some("y"))).toDF("a", "b")
    val r = RecordConverter.requiredViolations(df, Seq("a", "b")).head()
    assert((r.getLong(0), r.getLong(1)) == (1L, 1L))
    val empty = RecordConverter.requiredViolations(
      df.where(lit(false)), Seq("a", "b")).head()
    assert(!empty.isNullAt(0) && empty.getLong(0) == 0L &&
      empty.getLong(1) == 0L,
      "empty batch must report ZERO violations, not NULL")
  }

  test("enforceRequired raises on null in non-nullable column") {
    val schema = StructType(Seq(StructField("req", StringType, nullable = false)))
    val df = spark.createDataFrame(java.util.List.of(Row(null)), schema)
    val ex = intercept[Exception] {
      RecordConverter.enforceRequired(df).collect()
    }
    assert(ex.getMessage != null)
  }

  test("enforceRequired passes non-null values through") {
    val schema = StructType(Seq(StructField("req", StringType, nullable = false)))
    val df = spark.createDataFrame(java.util.List.of(Row("v")), schema)
    assert(RecordConverter.enforceRequired(df).as[String].collect().head == "v")
  }

  // ---- logical-type dispatch through field metadata
  test("convert applies logical types from field metadata") {
    val schema = StructType(Seq(
      StructField("ts", LongType, nullable = true,
        metadata = RecordConverter.logicalMeta(LogicalTypes.DebeziumMicroTimestamp))))
    val df = spark.createDataFrame(java.util.List.of(Row(Long.box(MicroTs))), schema)
    assert(RecordConverter.convert(df).as[String].collect().head
      == "2017-03-01 22:20:38.808123")
    assert(RecordConverter.convertedSchema(schema).head.dataType == StringType)
  }

  // ---- P9/P10/P11 staging
  private def kafkaShaped: DataFrame =
    spark.range(10).select(
      lit("t").as("topic"), lit(3).as("partition"), $"id".as("offset"),
      timestamp_micros($"id" * 1000000L).as("timestamp"),
      $"id".as("k1"),
      when($"id" % 2 === 0, struct(concat(lit("v"), $"id").as("f1"))).as("value"))

  test("wrapUpsert produces {key,value,i,partitionTime,batchNumber}") {
    val out = Staging.wrapUpsert(kafkaShaped, Seq("k1"), batchNumber = 3L)
    assert(out.columns.toSeq == Seq("key", "value", "i", "partitionTime", "batchNumber"))
    val r = out.where($"key.k1" === 4L).collect().head
    assert(r.getLong(r.fieldIndex("i")) == 3L * (1L << 40) + 4L)
    assert(r.getLong(r.fieldIndex("batchNumber")) == 3L)
  }

  test("filterTombstones drops null values unless delete enabled") {
    assert(Staging.filterTombstones(kafkaShaped, deleteEnabled = false).count() == 5)
    assert(Staging.filterTombstones(kafkaShaped, deleteEnabled = true).count() == 10)
  }

  test("withKafkaData appends {topic,partition,offset,insertTime}") {
    val out = Staging.withKafkaData(kafkaShaped, "kafkaData")
    val t = out.schema("kafkaData").dataType.asInstanceOf[StructType]
    assert(t.fieldNames.toSeq == Seq("topic", "partition", "offset", "insertTime"))
  }

  // ---- convert()/convertedSchema() contract on nullability edge shapes
  test("convert schema equals convertedSchema: nested nullability, drops, maps") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      // nullable struct carrying a REQUIRED inner field
      StructField("opt_struct", StructType(Seq(
        StructField("req_inner", StringType, nullable = false),
        StructField("opt_inner", IntegerType, nullable = true))), nullable = true),
      // REQUIRED struct with nullable inner + empty-struct field (dropped)
      StructField("req_struct", StructType(Seq(
        StructField("opt_inner", DoubleType, nullable = true),
        StructField("empty", StructType(Seq.empty), nullable = true))), nullable = false),
      // array of empty structs → dropped entirely
      StructField("arr_empty", ArrayType(StructType(Seq.empty)), nullable = true),
      // array of structs with bytes inside (element conversion)
      StructField("arr_s", ArrayType(StructType(Seq(
        StructField("b", BinaryType, nullable = false))), containsNull = false),
        nullable = false),
      // map → repeated {key,value}
      StructField("m", MapType(StringType, LongType, valueContainsNull = true),
        nullable = true)))
    val rows = java.util.List.of(
      Row(1L, Row("x", null), Row(1.5, Row()), Seq(Row()),
        Seq(Row(Array[Byte](1, 2))), Map("a" -> 2L)),
      Row(2L, null, Row(null, Row()), null,
        Seq(Row(Array[Byte](3))), null))
    val df = spark.createDataFrame(rows, schema)
    for (opts <- Seq(ConvertOptions(), ConvertOptions(allFieldsNullable = true),
        ConvertOptions(sanitizeFieldNames = true))) {
      val out = RecordConverter.convert(df, opts)
      assert(out.schema == RecordConverter.convertedSchema(schema, opts),
        s"schema mismatch for $opts:\n${out.schema.treeString}\nvs\n" +
          RecordConverter.convertedSchema(schema, opts).treeString)
      // values survive: null struct stays null, map exploded, bytes base64'd
      val r1 = out.where($"id" === 1L).collect().head
      assert(r1.getStruct(1).getString(0) == "x")
      val m = r1.getSeq[Row](r1.fieldIndex("m"))
      assert(m.map(e => (e.getString(0), e.getLong(1))) == Seq(("a", 2L)))
      val r2 = out.where($"id" === 2L).collect().head
      assert(r2.isNullAt(1), "null nullable struct must stay null")
    }
  }

  test("SchemaRetriever: key vs value retrieval on a kafka-shaped batch " +
      "(KafkaSchemaRecordType discrimination), flat fallback, configure " +
      "hook, reflective loading") {
    val wire = Seq((1L, "a")).toDF("k1", "f1").select(
      struct($"k1").as("key"), struct($"f1").as("value"),
      lit("t").as("topic"))
    val keyS = IdentitySchemaRetriever.retrieveKeySchema(wire)
    val valS = IdentitySchemaRetriever.retrieveValueSchema(wire)
    assert(keyS.fieldNames.toSeq == Seq("k1"), s"key schema: $keyS")
    assert(valS.fieldNames.toSeq == Seq("f1"), s"value schema: $valS")
    assert(KafkaSchemaRecordType.Key.toString == "key" &&
      KafkaSchemaRecordType.Value.toString == "value")
    // flat batch (no key/value structs): both lookups fall back to the
    // whole row schema, as does the flat entry
    val flat = Seq((1L, "a")).toDF("k1", "f1")
    assert(IdentitySchemaRetriever.retrieveKeySchema(flat) == flat.schema)
    assert(IdentitySchemaRetriever.retrieveSchema(flat) == flat.schema)
    // a custom retriever loads reflectively and receives configure()
    val custom = ExtensionLoader.load[SchemaRetriever](
      "graft.ConfiguredRetriever")
    custom.configure(Map("subject" -> "events-value"))
    assert(ConfiguredRetriever.lastProps.get("subject")
      .contains("events-value"))
    assert(custom.retrieveValueSchema(wire).fieldNames.toSeq == Seq("f1"))
  }
}

/** Test fixture for reflective retriever loading + configure hook. */
class ConfiguredRetriever extends SchemaRetriever {
  override def configure(properties: Map[String, String]): Unit = {
    ConfiguredRetriever.lastProps = properties
  }
  override def retrieveSchema(batch: org.apache.spark.sql.DataFrame,
      which: KafkaSchemaRecordType): org.apache.spark.sql.types.StructType =
    IdentitySchemaRetriever.retrieveSchema(batch, which)
}
object ConfiguredRetriever {
  @volatile var lastProps: Map[String, String] = Map.empty
}
