package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.convert.{ConvertOptions, FieldSanitizer, LogicalTypes, RecordConverter, Staging}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the conversion layer (SURVEY.md §2.2:
  * P1, P4-P8, P11) over the `events` table. Each query applies the real
  * operator from `graft.convert` and states the equivalent DuckDB SQL.
  */
object ConvertQueries extends QueryPack {

  /** events with ts as µs and ms longs (ts is parquet TIMESTAMP(NANOS),
    * read as a nanos long — see Tables.load).
    */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery("p4_sanitize",
      (s, dir) => FieldSanitizer.sanitize(
        ev(s, dir).select(
          col("event_id").as("event id!"),
          col("event_type").as("9type"),
          col("props").as("a.b/c"))),
      oracle = Some(
        """SELECT event_id AS "event_id_", event_type AS "_9type", props AS "a_b_c"
          |FROM events""".stripMargin)),

    GraftQuery("p2_tombstone_filter",
      (s, dir) => Staging.filterTombstones(
        ev(s, dir).select(
          col("event_id").as("offset"),
          when(col("event_type") =!= "error",
            struct(col("event_type").as("et"), col("value").as("amount"))).as("value")),
        deleteEnabled = false)
        .select(col("offset"), col("value.et").as("et"), col("value.amount").as("amount")),
      oracle = Some(
        """SELECT event_id AS offset, event_type AS et, value AS amount
          |FROM events WHERE event_type != 'error'""".stripMargin)),

    GraftQuery("p3_enforce_required",
      // REQUIRED-null enforcement's decidable half: the per-field
      // violation profile over a destination schema declaring
      // (event_id, et, pr) REQUIRED, with nulls induced the way real
      // feeds produce them (a value-level condition and a key-level
      // condition). enforceRequired raises on exactly these rows —
      // unit-pinned in ConvertSpec; this query pins the predicate
      // against DuckDB.
      (s, dir) => {
        val shaped = ev(s, dir).select(
          col("event_id"),
          when(col("event_type") =!= "error", col("event_type")).as("et"),
          when(col("user_id") % 7 =!= 0, col("props")).as("pr"))
        RecordConverter.requiredViolations(shaped, Seq("event_id", "et", "pr"))
      },
      oracle = Some(
        """SELECT count(*) FILTER (WHERE event_id IS NULL) AS event_id,
          |       count(*) FILTER (WHERE (CASE WHEN event_type != 'error'
          |                               THEN event_type END) IS NULL) AS et,
          |       count(*) FILTER (WHERE (CASE WHEN user_id % 7 != 0
          |                               THEN props END) IS NULL) AS pr
          |FROM events""".stripMargin)),

    GraftQuery("p5_double_special",
      (s, dir) => ev(s, dir).select(
        col("event_id"),
        RecordConverter.normalizeDouble(
          when(col("user_id") % 37 === 0, lit(Double.PositiveInfinity))
            .when(col("user_id") % 41 === 0, lit(Double.NegativeInfinity))
            .when(col("user_id") % 43 === 0, lit(Double.NaN))
            .otherwise(col("value"))).as("dnorm")),
      oracle = Some(
        """SELECT event_id,
          |       CASE WHEN user_id % 37 = 0 THEN 1.7976931348623157e308
          |            WHEN user_id % 41 = 0 THEN 4.9e-324
          |            WHEN user_id % 43 = 0 THEN 4.9e-324
          |            ELSE value END AS dnorm
          |FROM events""".stripMargin)),

    GraftQuery("p6_base64",
      (s, dir) => Tables.load(s, dir, "documents").select(
        col("doc_id"),
        RecordConverter.bytesToBase64(encode(col("text"), "UTF-8")).as("b64")),
      oracle = Some(
        "SELECT doc_id, base64(encode(text)) AS b64 FROM documents")),

    GraftQuery("p7_map_explode",
      (s, dir) => {
        val entries = ev(s, dir).select(
          col("event_id"),
          RecordConverter.explodeMap(
            map(lit("type"), col("event_type"), lit("props"), col("props")))
            .as("entries"))
        entries.select(col("event_id"), explode(col("entries")).as("e"))
          .select(col("event_id"), col("e.key").as("mk"), col("e.value").as("mv"))
      },
      oracle = Some(
        """SELECT event_id, 'type' AS mk, event_type AS mv FROM events
          |UNION ALL
          |SELECT event_id, 'props' AS mk, props AS mv FROM events""".stripMargin)),

    GraftQuery("p8_logical_ts",
      (s, dir) => {
        val us = expr("ts div 1000")
        val ms = expr("ts div 1000000")
        ev(s, dir).select(
          col("event_id"),
          LogicalTypes.kafkaTimestamp(ms).as("kafka_ts"),
          LogicalTypes.kafkaDate(ms).as("kafka_date"),
          LogicalTypes.debeziumMicroTimestamp(us).as("micro_ts"),
          LogicalTypes.debeziumMicroTime(us).as("micro_time"))
      },
      oracle = Some(
        """SELECT event_id,
          |  strftime(make_timestamp((epoch_ns(ts)//1000000)*1000), '%Y-%m-%d %H:%M:%S.%g') AS kafka_ts,
          |  strftime(make_timestamp((epoch_ns(ts)//1000000)*1000), '%Y-%m-%d') AS kafka_date,
          |  strftime(make_timestamp(epoch_ns(ts)//1000), '%Y-%m-%d %H:%M:%S') || '.' || ((epoch_ns(ts)//1000) % 1000000) AS micro_ts,
          |  strftime(make_timestamp(epoch_ns(ts)//1000), '%H:%M:%S') || '.' || ((epoch_ns(ts)//1000) % 1000000) AS micro_time
          |FROM events""".stripMargin)),

    // P1 end-to-end: nested struct carrying a double, bytes, and a map,
    // pushed through RecordConverter.convert (empty-struct drop is unit
    // tested; this checks the recursive expression tree against SQL).
    GraftQuery("p1_struct_convert",
      (s, dir) => {
        val df = ev(s, dir).select(
          col("event_id"),
          struct(
            col("event_type").as("t"),
            when(col("user_id") % 43 === 0, lit(Double.NaN))
              .otherwise(col("value")).as("v"),
            encode(col("props"), "UTF-8").as("b"),
            map(lit("p"), col("props")).as("m")).as("rec"))
        val out = RecordConverter.convert(df, ConvertOptions(convertDoubleSpecial = true))
        out.select(
          col("event_id"), col("rec.t").as("t"), col("rec.v").as("v"),
          col("rec.b").as("b64"),
          element_at(col("rec.m"), 1).getField("value").as("mv"))
      },
      oracle = Some(
        """SELECT event_id, event_type AS t,
          |       CASE WHEN user_id % 43 = 0 THEN 4.9e-324 ELSE value END AS v,
          |       base64(encode(props)) AS b64, props AS mv
          |FROM events""".stripMargin)),

    GraftQuery("p11_upsert_wrap",
      (s, dir) => {
        val kafkaShaped = ev(s, dir).select(
          lit("events").as("topic"),
          (col("user_id") % 8).cast("int").as("partition"),
          col("event_id").as("offset"),
          timestamp_micros(expr("ts div 1000")).as("timestamp"),
          col("user_id"),
          when(col("event_type") =!= "error",
            struct(col("event_type").as("v_type"), col("value").as("v_amount")))
            .as("value"))
        Staging.wrapUpsert(kafkaShaped, Seq("user_id"), batchNumber = 7L)
          .select(
            col("key.user_id").as("k"),
            col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"),
            col("i"), col("partitionTime").as("pt"), col("batchNumber").as("bn"))
      },
      oracle = Some(
        """SELECT user_id AS k,
          |       CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS v_type,
          |       CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_amount,
          |       (user_id % 8) * 1099511627776 + event_id AS i,
          |       make_timestamp(epoch_ns(ts)//1000) AS pt,
          |       7 AS bn
          |FROM events""".stripMargin)),

    GraftQuery("p12_json_extract",
      // schema-on-read over JSON payloads: the real `props` column plus
      // a constructed nested document (object/array/nested-object, with
      // every 97th row corrupted) parsed via from_json — PERMISSIVE
      // mode nulls malformed rows instead of failing the batch, the
      // engine-side analog of the reference's per-row error
      // classification
      (s, dir) => {
        val built = graft.Tables.load(s, dir, "events").select(
          col("event_id"), col("props"),
          when(col("event_id") % 97 === 0, lit("not json")).otherwise(
            concat(lit("{\"u\": "), col("user_id"),
              lit(", \"et\": \""), col("event_type"),
              lit("\", \"tags\": ["), col("user_id") % 4,
              lit(", "), col("event_id") % 7,
              lit("], \"m\": {\"k\": "), col("user_id") % 100,
              lit("}}"))).as("js"))
        val parsed = from_json(col("js"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "u BIGINT, et STRING, tags ARRAY<INT>, m STRUCT<k: INT>"))
        built.select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("props_k"),
          parsed.getField("u").as("u"),
          parsed.getField("et").as("et"),
          parsed.getField("tags").getItem(0).as("tag0"),
          parsed.getField("tags").getItem(1).as("tag1"),
          parsed.getField("m").getField("k").as("mk"),
          get_json_object(col("js"), "$.absent").as("absent"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_id, props,
          |         CASE WHEN event_id % 97 = 0 THEN 'not json' ELSE
          |           '{"u": ' || user_id || ', "et": "' || event_type ||
          |           '", "tags": [' || (user_id % 4) || ', ' || (event_id % 7) ||
          |           '], "m": {"k": ' || (user_id % 100) || '}}' END AS js
          |  FROM events)
          |SELECT event_id,
          |       json_extract(props, '$.k')::INT AS props_k,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.u')::BIGINT END AS u,
          |       CASE WHEN json_valid(js) THEN json_extract_string(js, '$.et') END AS et,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.tags[0]')::INT END AS tag0,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.tags[1]')::INT END AS tag1,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.m.k')::INT END AS mk,
          |       CASE WHEN json_valid(js) THEN json_extract_string(js, '$.absent') END AS absent
          |FROM b""".stripMargin)),

    GraftQuery("p14_variant",
      // Spark 4 VARIANT ingestion — the OPEN-schema semi-structured path
      // (vs p12's fixed from_json schema): parse once into the binary
      // variant encoding (malformed rows → NULL via try_parse_json, never
      // a failed batch), then extract typed paths lazily with
      // variant_get. At scale the variant column shreds columnar and path
      // extraction prunes like any other column — no schema declared up
      // front, no reparse per path.
      (s, dir) => {
        val built = graft.Tables.load(s, dir, "events").select(
          col("event_id"), col("props"),
          when(col("event_id") % 97 === 0, lit("not json")).otherwise(
            concat(lit("{\"u\": "), col("user_id"),
              lit(", \"et\": \""), col("event_type"),
              lit("\", \"tags\": ["), col("user_id") % 4,
              lit(", "), col("event_id") % 7,
              lit("], \"m\": {\"k\": "), col("user_id") % 100,
              lit("}}"))).as("js"))
        val v = try_parse_json(col("js"))
        built.select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("props_k"),
          variant_get(v, "$.u", "bigint").as("u"),
          variant_get(v, "$.et", "string").as("et"),
          variant_get(v, "$.tags[1]", "int").as("tag1"),
          variant_get(v, "$.m.k", "int").as("mk"),
          v.isNotNull.as("parsed_ok"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_id, props,
          |         CASE WHEN event_id % 97 = 0 THEN 'not json' ELSE
          |           '{"u": ' || user_id || ', "et": "' || event_type ||
          |           '", "tags": [' || (user_id % 4) || ', ' || (event_id % 7) ||
          |           '], "m": {"k": ' || (user_id % 100) || '}}' END AS js
          |  FROM events)
          |SELECT event_id,
          |       json_extract(props, '$.k')::INT AS props_k,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.u')::BIGINT END AS u,
          |       CASE WHEN json_valid(js) THEN json_extract_string(js, '$.et') END AS et,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.tags[1]')::INT END AS tag1,
          |       CASE WHEN json_valid(js) THEN json_extract(js, '$.m.k')::INT END AS mk,
          |       json_valid(js) AS parsed_ok
          |FROM b""".stripMargin)),

    GraftQuery("p15_decimal_money",
      // exact money arithmetic: prices become integer cents, cents
      // become DECIMAL via a scale-2 product (decimal × decimal is
      // exact in both engines — no engine-specific division rounding),
      // and the per-priority totals aggregate in decimal, so a 100 TB
      // sum accumulates zero float error; only the final rendered
      // double leaves the exact domain (and is itself exact below
      // 2^53). round() of the positive double ×100 is half-up in both
      // engines, so the cents agree.
      (s, dir) => {
        val cents = round(col("o_totalprice") * 100).cast("long")
        val money = cents.cast(org.apache.spark.sql.types.DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.01"))
        Tables.load(s, dir, "orders")
          .select(col("o_orderpriority"), money.as("m"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("m")).cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      oracle = Some(
        """SELECT o_orderpriority,
          |       CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
          |                     AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)))
          |            AS DOUBLE) AS revenue,
          |       count(*) AS n
          |FROM orders
          |GROUP BY o_orderpriority""".stripMargin)),

    GraftQuery("p16_map_functions",
      // MapType surface: build a per-row map, transform its values,
      // filter its entries, probe one key, and explode the survivors
      // back to rows — all codegen'd map expressions, no UDF. The
      // output is relational (maps never cross the compare boundary,
      // whose hash would be entry-order-sensitive); the oracle states
      // the same per-key arithmetic directly.
      (s, dir) => {
        val m = map_from_arrays(
          array(lit("a"), lit("b"), lit("c")),
          array(col("user_id") % 10, col("event_id") % 7, col("user_id") % 3))
        Tables.load(s, dir, "events")
          .withColumn("m2", transform_values(m, (_, v) => v * 2))
          .withColumn("a_val", element_at(col("m2"), "a"))
          .select(col("event_id"), col("a_val"),
            explode(map_filter(col("m2"), (_, v) => v > 4)).as(Seq("k", "v")))
      },
      oracle = Some(
        """WITH entries AS (
          |  SELECT event_id, (user_id % 10) * 2 AS a_val,
          |         'a' AS k, (user_id % 10) * 2 AS v FROM events
          |  UNION ALL
          |  SELECT event_id, (user_id % 10) * 2, 'b', (event_id % 7) * 2 FROM events
          |  UNION ALL
          |  SELECT event_id, (user_id % 10) * 2, 'c', (user_id % 3) * 2 FROM events)
          |SELECT event_id, a_val, k, v FROM entries WHERE v > 4""".stripMargin))
  )
}
