package graft

import graft.operators.MergeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-pattern tests for the MERGE semantics, mirroring the reference's
  * upsert/delete integration test
  * (`kcbq-connector/.../integration/UpsertDeleteBigQuerySinkConnectorIT.java:262-283,362-370`):
  * records i = 0..N-1, key = i/2 (pairs share a key), every 4th record
  * (i % 4 == 3) a tombstone ⇒ survivors are exactly the i % 4 == 1 rows.
  */
class MergeOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val N = 1000

  /** records i=0..N-1: key = i/2, value = f1 = s"v$i", tombstone at i%4==3 */
  private def stagedFixture: DataFrame =
    spark.range(N).select(
      struct(($"id" / 2).cast("long").as("k1")).as("key"),
      when($"id" % 4 =!= 3, struct(concat(lit("v"), $"id").as("f1"))).as("value"),
      $"id".as("i"))

  test("upsertDelete from empty dest leaves exactly the i%4==1 rows") {
    val dest = stagedFixture.limit(0)
      .select($"key.k1".as("k1"), $"value.f1".as("f1"))
    val out = MergeOps.upsertDelete(dest, stagedFixture).collect()
    assert(out.length == N / 4)
    // every surviving row is the odd (i%4==1) member of a pair whose
    // second member was NOT a tombstone ⇒ keys k with 2k+1 % 4 == 1
    out.foreach { r =>
      val k = r.getLong(0)
      assert((2 * k + 1) % 4 == 1, s"unexpected survivor key $k")
      assert(r.getString(1) == s"v${2 * k + 1}")
    }
  }

  test("latestPerKey keeps the greatest i per key") {
    val top = MergeOps.latestPerKey(stagedFixture).collect()
    assert(top.length == N / 2)
    top.foreach { r =>
      val k = r.getStruct(r.fieldIndex("key")).getLong(0)
      assert(r.getLong(r.fieldIndex("i")) == 2 * k + 1)
    }
  }

  test("latestTombstonePerKey finds only tombstoned keys") {
    val t = MergeOps.latestTombstonePerKey(stagedFixture).collect()
    // tombstones at i%4==3 → keys (i-1)/2 i.e. odd keys
    assert(t.length == N / 4)
    t.foreach { r =>
      val k = r.getStruct(0).getLong(0)
      assert((2 * k + 1) % 4 == 3)
    }
  }

  test("upsert applies updates and inserts, keeps unmatched dest rows") {
    val dest = Seq((0L, "old0"), (999999L, "keepme")).toDF("k1", "f1")
    val batch = stagedFixture.where($"value".isNotNull)
    val out = MergeOps.upsert(dest, batch).collect()
    val byKey = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byKey(999999L) == "keepme")       // unmatched dest kept
    assert(byKey(0L) == "v1")                // matched → updated
    assert(byKey(1L) == "v2")                // k=1: i=2 (i=3 tombstone filtered)
    assert(out.length == N / 2 + 1)
  }

  test("tombstoneFence drops rows older than the key's last tombstone") {
    // key 5 rows: i=10 (v), i=11 (tomb) → fence keeps only i=11
    val rows = MergeOps.tombstoneFence(stagedFixture)
      .where($"key.k1" === 5L).select($"i").as[Long].collect().sorted
    assert(rows.toSeq == Seq(11L))
    // key 4 rows: i=8, i=9, no tombstone → both kept
    val rows4 = MergeOps.tombstoneFence(stagedFixture)
      .where($"key.k1" === 4L).select($"i").as[Long].collect().sorted
    assert(rows4.toSeq == Seq(8L, 9L))
  }

  test("batch-side broadcast is GATED on the size estimate: an over-ceiling " +
      "staged batch merges unhinted (sort-merge fallback, no forced " +
      "broadcast), an under-ceiling one keeps the broadcast plan") {
    val dest = spark.range(50).select($"id".as("k1"),
      concat(lit("d"), $"id").as("f1"))
    def planOf(ceiling: String): String = {
      spark.conf.set("spark.graft.mergeBroadcastMaxBytes", ceiling)
      try {
        val df = MergeOps.upsertDelete(dest, stagedFixture)
        df.collect() // finalize AQE
        df.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.graft.mergeBroadcastMaxBytes")
    }
    // ceiling of 1 byte: every batch is "too big" — the plan must hold
    // NO batch-side broadcast HINT. (AQE may still legitimately
    // broadcast small runtime exchanges; the hint is what could force
    // an OOM-scale broadcast, so the OPTIMIZED plan is checked for the
    // join strategy the hint would have forced on the big side.)
    spark.conf.set("spark.graft.mergeBroadcastMaxBytes", "1")
    val unhinted = try {
      MergeOps.upsertDelete(dest, stagedFixture)
        .queryExecution.optimizedPlan.toString
    } finally spark.conf.unset("spark.graft.mergeBroadcastMaxBytes")
    assert(!unhinted.contains("ResolvedHint"),
      s"over-ceiling batch still carries a broadcast hint:\n$unhinted")
    // default ceiling: the micro-batch-sized fixture broadcasts
    val hinted = MergeOps.upsertDelete(dest, stagedFixture)
      .queryExecution.optimizedPlan.toString
    assert(hinted.contains("ResolvedHint") || {
      val exec = planOf((256L << 20).toString)
      exec.contains("BroadcastHashJoin")
    }, s"under-ceiling batch lost its broadcast:\n$hinted")
    // and the merge RESULT is identical either way
    spark.conf.set("spark.graft.mergeBroadcastMaxBytes", "1")
    val bigPath = try {
      MergeOps.upsertDelete(dest, stagedFixture).collect().toSet
    } finally spark.conf.unset("spark.graft.mergeBroadcastMaxBytes")
    val smallPath = MergeOps.upsertDelete(dest, stagedFixture).collect().toSet
    assert(bigPath == smallPath,
      "gated and hinted merges disagree on the survivor set")
  }

  test("insertNewOnly emits only keys absent from dest") {
    // latest row per key is non-tombstone iff (2k+1)%4==1 ⇔ k even;
    // dest holds even keys < 100 ⇒ inserts are exactly even keys in [100, 498]
    val dest = spark.range(0, 100, 2).select($"id".as("k1"), lit("x").as("f1"))
    val out = MergeOps.insertNewOnly(dest, stagedFixture).collect()
    val keys = out.map(_.getLong(0)).sorted
    assert(keys.toSeq == (100L until N / 2 by 2).toSeq)
    out.foreach(r => assert(r.getString(1) == s"v${2 * r.getLong(0) + 1}"))
  }
}
