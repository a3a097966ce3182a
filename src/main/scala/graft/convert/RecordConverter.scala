package graft.convert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversion options, mirroring the reference's config surface
  * (`BigQuerySinkConfig.java:268-284`).
  */
final case class ConvertOptions(
    /** P5 — `convertDoubleSpecialValues` (`BigQuerySinkConfig.java:268-275`). */
    convertDoubleSpecial: Boolean = false,
    /** P4 — `sanitizeFieldNames` (`SinkRecordConverter.java:76-78`). */
    sanitizeFieldNames: Boolean = false,
    /** `allBQFieldsNullable` (`BigQuerySinkConfig.java:277-284`). */
    allFieldsNullable: Boolean = false,
    /** Convert Kafka Decimal to double for strict FLOAT parity. */
    decimalAsFloat: Boolean = false)

/** P1/P3/P5/P6/P7/P8 — the record/schema conversion layer: the Spark-first
  * re-expression of `BigQueryRecordConverter.java:77-268` +
  * `BigQuerySchemaConverter.java:109-260`. Where the reference walks every
  * record as a `Map<String,Object>` row-at-a-time, we walk the *schema*
  * once and emit a single tree of Catalyst column expressions — the actual
  * per-row work is whole-stage-codegen'd, columnar, and constant across
  * the batch, which is the difference between O(rows) interpreted Java and
  * one compiled projection at 100 TB.
  *
  * Rules (each cites its reference source):
  *  - empty STRUCT fields are dropped entirely
  *    (`BigQueryRecordConverter.java:176-187`, `BigQuerySchemaConverter.java:212-232`);
  *  - MAP → repeated `{key, value}` record (`:205-227` / `:241-260`);
  *  - BYTES → Base64 string (`:259-268`);
  *  - FLOAT64 special values normalized when enabled (`:247-257`);
  *  - logical types dispatched by schema name through [[LogicalTypes]]
  *    (`:144-147`);
  *  - top-level schema must be a STRUCT (`:87-90`) — trivially true for a
  *    DataFrame;
  *  - recursive schemas are unrepresentable in `StructType` (the cycle
  *    check at `BigQuerySchemaConverter.java:130-157` has nothing to
  *    reject — Spark schemas are trees by construction).
  */
object RecordConverter {

  /** StructField metadata key carrying the logical-type name (the Spark
    * analog of Connect's `Schema.name()`).
    */
  val LogicalTypeKey = "graft.logicalType"

  /** Annotate a field's metadata with a logical type name. */
  def logicalMeta(name: String): Metadata =
    new MetadataBuilder().putString(LogicalTypeKey, name).build()

  /** P5 — double special-value normalization
    * (`BigQueryRecordConverter.java:247-257`): +Inf → `Double.MAX_VALUE`,
    * −Inf and NaN → `Double.MIN_VALUE` (the smallest positive subnormal,
    * 4.9e-324 — a Java quirk kept for parity).
    */
  def normalizeDouble(c: Column): Column =
    when(isnan(c), lit(java.lang.Double.MIN_VALUE))
      .when(c === lit(Double.PositiveInfinity), lit(Double.MaxValue))
      .when(c === lit(Double.NegativeInfinity), lit(java.lang.Double.MIN_VALUE))
      .otherwise(c)

  /** P6 — BYTES → Base64 string (`BigQueryRecordConverter.java:259-268`:
    * `java.util.Base64.getEncoder()`, RFC-4648 basic). Spark's `base64`
    * MIME-chunks long output with CRLF every 76 chars (legacy default),
    * so strip the line breaks to match the reference's unwrapped form
    * independent of `spark.sql.legacy.chunkBase64String.enabled`.
    */
  def bytesToBase64(c: Column): Column = regexp_replace(base64(c), "\r\n", "")

  /** P7 — MAP → array of `{key, value}` structs
    * (`BigQueryRecordConverter.java:205-227`). Spark's `map_entries`
    * already yields exactly the reference's field names. Non-string key
    * types are carried through unchanged (reference supports any primitive
    * key when a schema is present, `BigQuerySchemaConverter.java:241-260`).
    */
  def explodeMap(c: Column): Column = map_entries(c)

  /** Convert one column per the rules above, or None if the field is
    * dropped (empty struct). `meta` is the owning field's metadata (where
    * the logical-type name lives).
    */
  private def convertCol(c: Column, dt: DataType, meta: Metadata,
      opts: ConvertOptions): Option[Column] = {
    val logical = if (meta.contains(LogicalTypeKey))
      Some(meta.getString(LogicalTypeKey)) else None
    logical.flatMap(LogicalTypes.registry.get) match {
      case Some(f) =>
        val out = f(c)
        Some(if (logical.contains(LogicalTypes.KafkaDecimal) && opts.decimalAsFloat)
          LogicalTypes.kafkaDecimalAsFloat(out) else out)
      case None => dt match {
        case s: StructType =>
          if (s.fields.isEmpty) None
          else {
            val subs = s.fields.toSeq.flatMap { f =>
              convertCol(c.getField(f.name), f.dataType, f.metadata, opts)
                .map(_.as(fieldName(f.name, opts)))
            }
            if (subs.isEmpty) None
            // preserve null-ness of the struct itself (a null nullable
            // struct stays null, it does not become a struct of nulls)
            else Some(when(c.isNull, lit(null)).otherwise(struct(subs: _*)))
          }
        case ArrayType(et, _) if convertedType(et, opts).nonEmpty =>
          Some(transform(c, x =>
            convertCol(x, et, Metadata.empty, opts).getOrElse(x)))
        case ArrayType(_, _) => None // element dropped (empty struct) → drop array
        case MapType(kt, vt, _)
            if convertedType(kt, opts).nonEmpty && convertedType(vt, opts).nonEmpty =>
          Some(transform(map_entries(c), e => struct(
            convertCol(e.getField("key"), kt, Metadata.empty, opts)
              .getOrElse(e.getField("key")).as("key"),
            convertCol(e.getField("value"), vt, Metadata.empty, opts)
              .getOrElse(e.getField("value")).as("value"))))
        case MapType(_, _, _) => None // key/value dropped → drop map
        case BinaryType => Some(bytesToBase64(c))
        case DoubleType if opts.convertDoubleSpecial => Some(normalizeDouble(c))
        case _ => Some(c)
      }
    }
  }

  private def fieldName(n: String, opts: ConvertOptions): String =
    if (opts.sanitizeFieldNames) FieldSanitizer.sanitizeName(n) else n

  /** Convert a whole DataFrame (the record batch): one projection applying
    * every rule to every (possibly nested) column, then a nullability
    * alignment so the output schema equals [[convertedSchema]] exactly
    * (adjacent projections collapse in Catalyst — no extra runtime pass).
    *
    * The alignment matters because expression-level nullability inference
    * (`CaseWhen` null-preserving wrappers, `date_format`, …) marks some
    * REQUIRED columns nullable; a table created from [[convertedSchema]]
    * and data written from [[convert]] must agree on REQUIRED modes or a
    * no-op write would spuriously trip the U3 relaxation gate.
    */
  def convert(df: DataFrame, opts: ConvertOptions = ConvertOptions()): DataFrame = {
    val projected = df.select(df.schema.fields.toSeq.flatMap { f =>
      convertCol(col(s"`${f.name}`"), f.dataType, f.metadata, opts)
        .map(_.as(fieldName(f.name, opts)))
    }: _*)
    alignNullability(projected, convertedSchema(df.schema, opts))
  }

  /** Rebuild each column whose inferred `StructField` differs from the
    * declared one so nullability (outer and nested) and metadata match.
    * Declared-REQUIRED columns are tagged [[KnownNotNull]] (nullability is
    * advisory in Spark; hard enforcement stays in [[enforceRequired]]).
    */
  private def alignNullability(df: DataFrame, target: StructType): DataFrame = {
    val cols = df.schema.fields.zip(target.fields).map { case (a, t) =>
      alignCol(col(s"`${a.name}`"), a, t).as(t.name, t.metadata)
    }
    df.select(cols.toSeq: _*)
  }

  private def alignCol(c: Column, actual: StructField, target: StructField): Column = {
    val inner = (actual.dataType, target.dataType) match {
      case (a: StructType, t: StructType) if a != t =>
        val subs = a.fields.zip(t.fields).map { case (af, tf) =>
          alignCol(c.getField(af.name), af, tf).as(tf.name, tf.metadata)
        }
        val s = struct(subs.toSeq: _*)
        // a null nullable struct stays null, not a struct of nulls
        if (actual.nullable && target.nullable)
          when(c.isNull, lit(null)).otherwise(s)
        else s
      case (ArrayType(ae, an), ArrayType(te, tn)) if actual.dataType != target.dataType =>
        transform(c, x => alignCol(x,
          StructField("element", ae, an), StructField("element", te, tn)))
      case _ => c
    }
    forceNullable(inner, target.nullable)
  }

  private def forceNullable(c: Column, nullable: Boolean): Column = {
    import org.apache.spark.sql.catalyst.expressions.{KnownNotNull, KnownNullable}
    import org.apache.spark.sql.graftbridge.Bridge
    if (nullable) Bridge.column(KnownNullable(Bridge.expression(c)))
    else Bridge.column(KnownNotNull(Bridge.expression(c)))
  }

  /** P1 schema side — the output schema [[convert]] produces, computed
    * without touching data (`BigQuerySchemaConverter.java:109-260`).
    */
  def convertedSchema(schema: StructType, opts: ConvertOptions = ConvertOptions()): StructType =
    StructType(schema.fields.toSeq.flatMap(f => convertedField(f, opts)))

  private def convertedField(f: StructField, opts: ConvertOptions): Option[StructField] = {
    val logical = if (f.metadata.contains(LogicalTypeKey))
      Some(f.metadata.getString(LogicalTypeKey)) else None
    val nullable = f.nullable || opts.allFieldsNullable
    logical.filter(LogicalTypes.registry.contains) match {
      case Some(name) =>
        val t0 = LogicalTypes.targetType(name, f.dataType)
        val t = if (name == LogicalTypes.KafkaDecimal && opts.decimalAsFloat) DoubleType else t0
        Some(StructField(fieldName(f.name, opts), t, nullable))
      case None =>
        convertedType(f.dataType, opts).map(t =>
          StructField(fieldName(f.name, opts), t, nullable))
    }
  }

  private def convertedType(dt: DataType, opts: ConvertOptions): Option[DataType] = dt match {
    case s: StructType =>
      val subs = s.fields.toSeq.flatMap(f => convertedField(f, opts))
      if (subs.isEmpty) None else Some(StructType(subs))
    case ArrayType(et, n) =>
      convertedType(et, opts).map(ArrayType(_, n))
    case MapType(kt, vt, n) =>
      for (k <- convertedType(kt, opts); v <- convertedType(vt, opts))
        yield ArrayType(StructType(Seq(
          StructField("key", k, nullable = false), StructField("value", v, n))), containsNull = false)
    case BinaryType => Some(StringType)
    case other => Some(other)
  }

  /** P3 — REQUIRED enforcement (`BigQueryRecordConverter.java:133-141`):
    * Spark nullability is advisory, so each non-nullable top-level column
    * gets an explicit null check that fails the job with the reference's
    * "is not optional" message instead of silently writing a null.
    */
  def enforceRequired(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(s"`${f.name}`")
      if (f.nullable) c
      else when(c.isNull, raise_error(
        lit(s"${f.name} is not optional, but converting object had null value")))
        .otherwise(c).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** P3's decidable projection: per-field REQUIRED-violation counts,
    * using the same null predicate [[enforceRequired]] raises on.
    * `required` is the destination schema's REQUIRED field set (in the
    * reference, required-ness comes from the BigQuery table schema, not
    * the record — `BigQueryRecordConverter.java:133-141`). One row,
    * one LONG column per required field; a non-zero count is exactly
    * the set of rows `enforceRequired` would fail the job on.
    */
  def requiredViolations(df: DataFrame, required: Seq[String]): DataFrame = {
    require(required.nonEmpty, "requiredViolations: empty REQUIRED set")
    // count(when(...)) not sum(when(...).otherwise(0)): sum over an
    // EMPTY batch is NULL per field, which would diverge from both the
    // SQL oracle's count(*) FILTER (0) and enforceRequired's "no
    // violations" meaning
    val aggs = required.map(f => count(when(col(s"`$f`").isNull, 1L)).as(f))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
