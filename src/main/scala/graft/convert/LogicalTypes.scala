package graft.convert

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** P8 — the reference's 10 logical-type converters
  * (`kcbq-connector/.../convert/logicaltype/KafkaLogicalConverters.java:47-120`,
  * `DebeziumLogicalConverters.java:59-204`), re-expressed as a name →
  * `Column`-transform registry. Every transform is built from codegen'd
  * Spark built-ins (`date_format`, `timestamp_millis/micros`) — no UDFs —
  * so they participate in whole-stage codegen and constant folding.
  *
  * Physical encodings follow the reference: Kafka logical values arrive as
  * epoch-millis (the `java.util.Date` the Connect framework hands over),
  * Debezium `Date` as days-since-epoch INT32, `MicroTime[stamp]` as µs
  * INT64, `Time`/`Timestamp` as ms, `ZonedTimestamp` as an ISO-8601
  * offset string. All formatting is UTC (session timezone is pinned to
  * UTC by the engine's session builders).
  */
object LogicalTypes {

  // Registry names, exactly as the reference registers them
  // (`LogicalConverterRegistry.register` call sites).
  val KafkaDate = "org.apache.kafka.connect.data.Date"
  val KafkaDecimal = "org.apache.kafka.connect.data.Decimal"
  val KafkaTimestamp = "org.apache.kafka.connect.data.Timestamp"
  val KafkaTime = "org.apache.kafka.connect.data.Time"
  val DebeziumDate = "io.debezium.time.Date"
  val DebeziumMicroTime = "io.debezium.time.MicroTime"
  val DebeziumMicroTimestamp = "io.debezium.time.MicroTimestamp"
  val DebeziumTime = "io.debezium.time.Time"
  val DebeziumTimestamp = "io.debezium.time.Timestamp"
  val DebeziumZonedTimestamp = "io.debezium.time.ZonedTimestamp"

  /** ms since epoch → `yyyy-MM-dd` (KafkaLogicalConverters.java:47-61). */
  def kafkaDate(c: Column): Column =
    date_format(timestamp_millis(c.cast("long")), "yyyy-MM-dd")

  /** BigDecimal passthrough (KafkaLogicalConverters.java:66-81 — the
    * reference stores it lossily as FLOAT; we keep the decimal and let
    * the sink decide, `asFloat` gives strict parity).
    */
  def kafkaDecimal(c: Column): Column = c
  def kafkaDecimalAsFloat(c: Column): Column = c.cast("double")

  /** ms since epoch → `yyyy-MM-dd HH:mm:ss.SSS` (KafkaLogicalConverters.java:86-100). */
  def kafkaTimestamp(c: Column): Column =
    date_format(timestamp_millis(c.cast("long")), "yyyy-MM-dd HH:mm:ss.SSS")

  /** ms within day → `HH:mm:ss.SSS` (KafkaLogicalConverters.java:106-120). */
  def kafkaTime(c: Column): Column =
    date_format(timestamp_millis(c.cast("long")), "HH:mm:ss.SSS")

  /** days since epoch → `yyyy-MM-dd` (DebeziumLogicalConverters.java:59-76). */
  def debeziumDate(c: Column): Column =
    date_format(date_from_unix_date(c.cast("int")), "yyyy-MM-dd")

  /** µs since epoch → `HH:mm:ss` + "." + unpadded µs remainder
    * (DebeziumLogicalConverters.java:81-107). The unpadded remainder is a
    * reference quirk (808123 µs → ".808123" but 1230 µs → ".1230")
    * replicated exactly for parity.
    */
  def debeziumMicroTime(c: Column): Column =
    concat(date_format(timestamp_micros(c.cast("long")), "HH:mm:ss"),
      lit("."), (c.cast("long") % 1000000L).cast("string"))

  /** µs since epoch → `yyyy-MM-dd HH:mm:ss` + "." + unpadded µs remainder
    * (DebeziumLogicalConverters.java:112-138).
    */
  def debeziumMicroTimestamp(c: Column): Column =
    concat(date_format(timestamp_micros(c.cast("long")), "yyyy-MM-dd HH:mm:ss"),
      lit("."), (c.cast("long") % 1000000L).cast("string"))

  /** ms within day → `HH:mm:ss.SSS` (DebeziumLogicalConverters.java:143-158). */
  def debeziumTime(c: Column): Column =
    date_format(timestamp_millis(c.cast("long")), "HH:mm:ss.SSS")

  /** ms since epoch → `yyyy-MM-dd HH:mm:ss.SSS` (DebeziumLogicalConverters.java:163-178). */
  def debeziumTimestamp(c: Column): Column =
    date_format(timestamp_millis(c.cast("long")), "yyyy-MM-dd HH:mm:ss.SSS")

  /** ISO offset datetime string → `date' 'time` — the reference parses and
    * re-formats with `ISO_LOCAL_DATE + ' ' + ISO_TIME`
    * (DebeziumLogicalConverters.java:183-204), which for the canonical
    * strings Debezium emits is exactly the `T`→space rewrite. We do the
    * rewrite structurally (anchored on the date prefix) instead of a
    * parse/re-format round-trip; non-canonical fraction padding (e.g.
    * `.8080` vs `.808`) is passed through rather than re-normalized.
    */
  def debeziumZonedTimestamp(c: Column): Column =
    regexp_replace(c, "^(\\d{4}-\\d{2}-\\d{2})T", "$1 ")

  /** Name → transform, the Spark analog of `LogicalConverterRegistry`. */
  val registry: Map[String, Column => Column] = Map(
    KafkaDate -> kafkaDate _,
    KafkaDecimal -> kafkaDecimal _,
    KafkaTimestamp -> kafkaTimestamp _,
    KafkaTime -> kafkaTime _,
    DebeziumDate -> debeziumDate _,
    DebeziumMicroTime -> debeziumMicroTime _,
    DebeziumMicroTimestamp -> debeziumMicroTimestamp _,
    DebeziumTime -> debeziumTime _,
    DebeziumZonedTimestamp -> debeziumZonedTimestamp _,
    DebeziumTimestamp -> debeziumTimestamp _)

  /** Output type after conversion (everything formats to STRING except
    * the Decimal passthrough, which keeps its input type).
    */
  def targetType(name: String, inputType: DataType): DataType =
    if (name == KafkaDecimal) inputType else StringType
}
