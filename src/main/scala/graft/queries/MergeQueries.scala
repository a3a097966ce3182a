package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.operators.MergeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the merge/upsert/delete operator family
  * (SURVEY.md §2.3-2.5: A1, A2, J1-J4, W1, W3).
  *
  * The `events` table plays the staged micro-batch: key = user_id,
  * iteration counter `i` = event_id (monotonic), and rows with
  * event_type = 'error' are synthesized tombstones (null value struct) —
  * the pattern FIXTURES.md §10 prescribes. The first half of the stream
  * (i < SPLIT) seeds the destination table; the second half is the batch
  * being merged, exactly the reference's staging-then-flush lifecycle.
  */
object MergeQueries extends QueryPack {

  private val Split = 5000L

  /** Shared DuckDB CTE: the staged representation of `events`, flat. */
  private val stagedSql =
    """WITH staged AS (
      |  SELECT user_id AS k, event_id AS i,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS v_type,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v_amount
      |  FROM events)""".stripMargin

  /** Staged micro-batch: {key STRUCT, value STRUCT|null, i} per MergeOps. */
  def staged(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      struct(col("user_id").as("k")).as("key"),
      when(col("event_type") =!= "error",
        struct(col("event_type").as("v_type"), col("value").as("v_amount"))).as("value"),
      col("event_id").as("i"))

  /** Flatten staged/merged output for the oracle compare. */
  private def flat(df: DataFrame): DataFrame =
    df.select(col("key.k").as("k"), col("i"),
      col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"))

  /** Destination table seeded from the first half of the stream:
    * upsert/delete-merge of batch 0 into an empty table = latest
    * non-tombstone row per key.
    */
  private def dest0(s: SparkSession, dir: String): DataFrame = {
    val d = MergeOps.latestPerKey(staged(s, dir).where(col("i") < Split))
      .where(col("value").isNotNull)
    d.select(col("key.k").as("k"),
      col("value.v_type").as("v_type"), col("value.v_amount").as("v_amount"))
  }

  private val dest0Sql =
    """d0 AS (
      |  SELECT k, v_type, v_amount FROM (
      |    SELECT k, v_type, v_amount,
      |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
      |    FROM staged WHERE i < 5000) t
      |  WHERE rn = 1 AND v_type IS NOT NULL)""".stripMargin

  private val src1Sql =
    """s1 AS (
      |  SELECT k, i, v_type, v_amount FROM (
      |    SELECT k, i, v_type, v_amount,
      |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
      |    FROM staged WHERE i >= 5000) t
      |  WHERE rn = 1)""".stripMargin

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery("a1_dedup_lww",
      (s, dir) => flat(MergeOps.latestPerKey(staged(s, dir))),
      oracle = Some(
        s"""$stagedSql
           |SELECT k, i, v_type, v_amount FROM (
           |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
           |  FROM staged) t
           |WHERE rn = 1""".stripMargin),
      headline = true),

    GraftQuery("a2_latest_tombstone",
      (s, dir) => MergeOps.latestTombstonePerKey(staged(s, dir))
        .select(col("key.k").as("k"), col("i")),
      oracle = Some(
        s"""$stagedSql
           |SELECT k, max(i) AS i FROM staged WHERE v_type IS NULL GROUP BY k""".stripMargin)),

    GraftQuery("j1_merge_upsert",
      (s, dir) => MergeOps.upsert(
        dest0(s, dir),
        staged(s, dir).where(col("i") >= Split && col("value").isNotNull)),
      oracle = Some(
        s"""$stagedSql,
           |$dest0Sql,
           |s1 AS (
           |  SELECT k, v_type, v_amount FROM (
           |    SELECT k, v_type, v_amount,
           |           row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
           |    FROM staged WHERE i >= 5000 AND v_type IS NOT NULL) t
           |  WHERE rn = 1)
           |SELECT coalesce(s1.k, d0.k) AS k,
           |       CASE WHEN s1.k IS NOT NULL THEN s1.v_type ELSE d0.v_type END AS v_type,
           |       CASE WHEN s1.k IS NOT NULL THEN s1.v_amount ELSE d0.v_amount END AS v_amount
           |FROM d0 FULL OUTER JOIN s1 ON d0.k = s1.k""".stripMargin)),

    GraftQuery("j2_merge_upsert_delete",
      (s, dir) => MergeOps.upsertDelete(
        dest0(s, dir),
        staged(s, dir).where(col("i") >= Split)),
      oracle = Some(
        s"""$stagedSql,
           |$dest0Sql,
           |$src1Sql
           |SELECT coalesce(s1.k, d0.k) AS k,
           |       CASE WHEN s1.k IS NOT NULL THEN s1.v_type ELSE d0.v_type END AS v_type,
           |       CASE WHEN s1.k IS NOT NULL THEN s1.v_amount ELSE d0.v_amount END AS v_amount
           |FROM d0 FULL OUTER JOIN s1 ON d0.k = s1.k
           |WHERE NOT (s1.k IS NOT NULL AND s1.v_type IS NULL)""".stripMargin),
      headline = true),

    GraftQuery("j3_tombstone_fence",
      (s, dir) => flat(MergeOps.tombstoneFence(staged(s, dir))),
      oracle = Some(
        s"""$stagedSql,
           |deletes AS (
           |  SELECT k, max(i) AS del_i FROM staged WHERE v_type IS NULL GROUP BY k)
           |SELECT b.k, b.i, b.v_type, b.v_amount
           |FROM staged b LEFT JOIN deletes t ON b.k = t.k
           |WHERE t.del_i IS NULL OR b.i >= t.del_i""".stripMargin)),

    GraftQuery("j4_insert_anti",
      (s, dir) => MergeOps.insertNewOnly(
        // dest restricted to even keys so the anti-join has survivors
        dest0(s, dir).where(col("k") % 2 === 0),
        staged(s, dir).where(col("i") >= Split)),
      oracle = Some(
        s"""$stagedSql,
           |d0e AS (
           |  SELECT k FROM (
           |    SELECT k, v_type, row_number() OVER (PARTITION BY k ORDER BY i DESC) AS rn
           |    FROM staged WHERE i < 5000) t
           |  WHERE rn = 1 AND v_type IS NOT NULL AND k % 2 = 0),
           |$src1Sql
           |SELECT s1.k, s1.v_type, s1.v_amount
           |FROM s1 LEFT JOIN d0e ON s1.k = d0e.k
           |WHERE d0e.k IS NULL AND s1.v_type IS NOT NULL""".stripMargin)),

    GraftQuery("j5_delete_only_merge",
      (s, dir) => MergeOps.deleteOnly(
        dest0(s, dir),
        staged(s, dir).where(col("i") >= Split)),
      oracle = Some(
        s"""$stagedSql,
           |$dest0Sql,
           |fenced AS (
           |  SELECT b.k, b.i, b.v_type, b.v_amount
           |  FROM (SELECT * FROM staged WHERE i >= 5000) b
           |  LEFT JOIN (SELECT k, max(i) AS del_i FROM staged
           |             WHERE i >= 5000 AND v_type IS NULL GROUP BY k) t
           |  ON b.k = t.k
           |  WHERE t.del_i IS NULL OR b.i >= t.del_i),
           |tomb_keys AS (SELECT DISTINCT k FROM fenced WHERE v_type IS NULL)
           |SELECT d0.k, d0.v_type, d0.v_amount FROM d0
           |WHERE d0.k NOT IN (SELECT k FROM tomb_keys)
           |UNION ALL
           |SELECT k, v_type, v_amount FROM fenced WHERE v_type IS NOT NULL""".stripMargin)),

    GraftQuery("w1_top1_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      },
      oracle = Some(
        """SELECT o_custkey, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         row_number() OVER (PARTITION BY o_custkey
          |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) t
          |WHERE rn = 1""".stripMargin)),

    GraftQuery("w3_ordered_merge_source",
      (s, dir) => staged(s, dir).where(col("value").isNull)
        .select(col("key.k").as("k"), col("i"))
        .withColumn("seq", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("i")))),
      oracle = Some(
        s"""$stagedSql
           |SELECT k, i, row_number() OVER (PARTITION BY k ORDER BY i) AS seq
           |FROM staged WHERE v_type IS NULL""".stripMargin)),

    GraftQuery("u1_schema_union",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").select(
          col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("mktsegment"), lit("customer").as("src"))
        val sup = Tables.load(s, dir, "supplier").select(
          col("s_suppkey").as("key"), col("s_name").as("name"),
          col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"),
          lit("supplier").as("src"))
        c.unionByName(sup, allowMissingColumns = true)
      },
      oracle = Some(
        """SELECT c_custkey AS key, c_name AS name, c_nationkey AS nationkey,
          |       c_acctbal AS acctbal, c_mktsegment AS mktsegment, 'customer' AS src
          |FROM customer
          |UNION ALL
          |SELECT s_suppkey, s_name, s_nationkey, s_acctbal, NULL, 'supplier'
          |FROM supplier""".stripMargin)),

    // U1-U3 via graft.schema.SchemaUnion: a three-version schema stream
    // (v2 adds a field, v3 adds another) evolved pairwise-in-sequence with
    // validation, then unioned row-wise with missing columns as NULL.
    GraftQuery("u2_schema_evolve",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val v1 = c.where(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("key"), col("c_name").as("name"))
        val v2 = c.where(col("c_custkey") % 3 === 1)
          .select(col("c_custkey").as("key"), col("c_name").as("name"),
            col("c_acctbal").as("acctbal"))
        val v3 = c.where(col("c_custkey") % 3 === 2)
          .select(col("c_custkey").as("key"), col("c_name").as("name"),
            col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment"))
        graft.schema.SchemaUnion.unionRows(Seq(v1, v2, v3))
      },
      oracle = Some(
        """SELECT c_custkey AS key, c_name AS name, NULL AS acctbal, NULL AS mktsegment
          |FROM customer WHERE c_custkey % 3 = 0
          |UNION ALL
          |SELECT c_custkey, c_name, c_acctbal, NULL FROM customer WHERE c_custkey % 3 = 1
          |UNION ALL
          |SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 3 = 2""".stripMargin))
  )
}
