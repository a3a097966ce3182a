package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 VARIANT behavior the p14 query relies on: open-schema parse,
  * lazy typed path extraction, malformed-row tolerance, and schema
  * inference over heterogeneous documents.
  */
class VariantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("schema_of_variant infers a merged object schema over heterogeneous docs") {
    val docs = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2, "c": [1.5, 2.5]}""").toDF("js")
    val perDoc = docs.select(schema_of_variant(parse_json($"js")).as("s"))
      .as[String].collect().toSet
    assert(perDoc == Set("OBJECT<a: BIGINT, b: STRING>",
      "OBJECT<a: BIGINT, c: ARRAY<DECIMAL(2,1)>>"), s"got $perDoc")
    val merged = docs.select(
      schema_of_variant_agg(parse_json($"js")).as("s")).as[String].head()
    assert(merged.contains("a: BIGINT") && merged.contains("b: STRING") &&
      merged.contains("c: ARRAY"), s"merged schema lost fields: $merged")
  }

  test("variant_get extracts typed paths; absent paths and type misfits are NULL") {
    val v = parse_json(lit("""{"n": 42, "s": "hi", "arr": [10, 20]}"""))
    val row = spark.range(1).select(
      variant_get(v, "$.n", "int").as("n"),
      variant_get(v, "$.s", "string").as("s"),
      variant_get(v, "$.arr[1]", "int").as("a1"),
      variant_get(v, "$.absent", "int").as("missing"),
      try_variant_get(v, "$.s", "int").as("misfit")).head()
    assert(row.getInt(0) == 42 && row.getString(1) == "hi" && row.getInt(2) == 20)
    assert(row.isNullAt(3), "absent path must be NULL")
    assert(row.isNullAt(4), "try_variant_get on a type misfit must be NULL")
  }

  test("try_parse_json nulls malformed rows instead of failing the batch") {
    val out = Seq("""{"k": 1}""", "not json", """{"k": 3}""").toDF("js")
      .select(try_parse_json($"js").isNotNull.as("ok"))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true))
  }
}
