package graft

import java.nio.file.Files
import java.util.UUID

import graft.sources.WarehouseTable
import graft.util.GraftCache
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle guards for eager `localCheckpoint` blocks (r16 verdict
  * item 6): `Dataset.unpersist()` on a checkpointed Dataset is a SILENT
  * NO-OP (the persist lives on the RDD, not in the CacheManager), so
  * without RDD-handle release every merge flush and every iterative-op
  * round leaked one MEMORY_AND_DISK generation until ContextCleaner GC
  * — unbounded-until-GC memory in a long-lived session, and the block
  * pollution that reddened r16's final suite run.
  *
  * Every assertion here is ORDER-INDEPENDENT on the shared
  * SparkContext: blocks are identified by their `graft.ckpt:<site>`
  * RDD name with a per-test unique site/root (never a global forall
  * over `getPersistentRDDs`), by a direct RDD handle, or by a DELTA on
  * the monotonic [[GraftCache.checkpointsFreed]] counter (concurrent
  * suites can only increase it).
  */
class CheckpointLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sc = spark.sparkContext

  private def namedPersistent(name: String): Seq[Int] =
    sc.getPersistentRDDs.toSeq.collect {
      case (id, rdd) if rdd.name == name => id
    }.map(_.toInt)

  test("Dataset.unpersist on a localCheckpoint is a no-op; RDD-handle release frees (the premise)") {
    val df = (1 to 100).toDF("x").localCheckpoint(true)
    val rdd = df.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    assert(rdd.getStorageLevel.useMemory && rdd.getStorageLevel.useDisk,
      s"localCheckpoint should persist MEMORY_AND_DISK: ${rdd.getStorageLevel}")
    df.unpersist(blocking = true)
    assert(rdd.getStorageLevel != StorageLevel.NONE,
      "premise broken: Dataset.unpersist now frees checkpoint blocks — " +
        "the GraftCache release layer may be removable")
    val before = GraftCache.checkpointsFreed
    GraftCache.releaseCheckpointOf(df)
    assert(rdd.getStorageLevel == StorageLevel.NONE,
      s"RDD-handle release left level ${rdd.getStorageLevel}")
    assert(GraftCache.checkpointsFreed >= before + 1)
  }

  test("namedCheckpoint registers attributable blocks; handle release frees exactly them") {
    val site = s"test-ckpt-${UUID.randomUUID().toString.take(8)}"
    val g1 = (1 to 50).toDF("a").transform(GraftCache.namedCheckpoint(site))
    val g2 = (1 to 60).toDF("a").transform(GraftCache.namedCheckpoint(site))
    val ids = namedPersistent(s"graft.ckpt:$site")
    assert(ids.size == 2, s"expected two concurrent generations: $ids")
    assert(g1.count() == 50 && g2.count() == 60)
    // releasing one handle must not touch the other (the concurrency
    // property name-keyed supersede broke: two flushes into one table
    // freed each other's live blocks)
    GraftCache.releaseCheckpointOf(g1)
    assert(namedPersistent(s"graft.ckpt:$site").size == 1,
      "handle release freed the wrong generation")
    assert(g2.count() == 60)
    GraftCache.releaseCheckpointOf(g2)
    assert(namedPersistent(s"graft.ckpt:$site").isEmpty,
      "released checkpoints still hold persistent blocks")
  }

  test("releaseCheckpointOf is a safe no-op on plain (non-checkpoint) plans") {
    val plain = (1 to 10).toDF("x").select($"x" * 2 as "y")
    GraftCache.releaseCheckpointOf(plain) // must not throw
    assert(plain.count() == 10)
  }

  private val destSchema = StructType(Seq(
    StructField("k1", LongType),
    StructField("f1", StringType)))

  private def staged(rows: Seq[(Long, Option[String], Long, Int)]): DataFrame = {
    val df = rows.toDF("k", "v", "i", "day")
    df.select(
      struct($"k".as("k1")).as("key"),
      when($"v".isNotNull, struct($"v".as("f1"))).as("value"),
      $"i",
      to_timestamp(format_string("2024-01-%02d 12:00:00", $"day")).as("partitionTime"),
      lit(0L).as("batchNumber"))
  }

  test("a completed merge flush leaves no MEMORY_AND_DISK checkpoint block behind") {
    val root = Files.createTempDirectory("wh-ckpt-lifecycle").toString + "/tbl"
    val t = WarehouseTable.create(spark, root, Seq("k1"), destSchema)
    def ts(day: Int) = to_timestamp(lit(f"2024-01-$day%02d 12:00:00"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k1", "f1")
      .withColumn("partitionTime", ts(1)))
    val sites = Seq(s"WarehouseTable.touched@$root", s"WarehouseTable.updates@$root")
    // two flushes (update + tombstone) — each must free its own blocks
    // the moment it completes, not rely on a later flush or on GC
    t.merge(staged(Seq((1L, Some("a2"), 1L, 1), (3L, Some("c"), 2L, 1))))
    sites.foreach { s =>
      assert(namedPersistent(s"graft.ckpt:$s").isEmpty,
        s"flush 1 left checkpoint blocks at site $s")
    }
    t.merge(staged(Seq((2L, None, 3L, 1))))
    sites.foreach { s =>
      assert(namedPersistent(s"graft.ckpt:$s").isEmpty,
        s"flush 2 left checkpoint blocks at site $s")
    }
    // and the flushes were correct (update applied, insert added, delete applied)
    val rows = t.read().select($"k1", $"f1").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "a2", 3L -> "c"))
  }

  test("pageRank frees each superseded iteration's checkpoint (counter delta)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val before = GraftCache.checkpointsFreed
    val ranks = graft.operators.GraphOps.pageRank(edges, iterations = 5)
    assert(ranks.count() == 4)
    // iterations 2..5 each free the previous round's checkpoint
    assert(GraftCache.checkpointsFreed >= before + 4,
      s"expected >= 4 freed generations, delta = ${GraftCache.checkpointsFreed - before}")
  }

  test("clusterPairs frees superseded label generations and the edge checkpoint") {
    // a 5-node path forces multiple label-propagation rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id1", "id2")
    val before = GraftCache.checkpointsFreed
    val clusters = graft.llm.DedupOps.clusterPairs(pairs)
    assert(clusters.select("cluster_id").distinct().count() == 1)
    // >= 2 rounds of label release + the edges checkpoint at exit
    assert(GraftCache.checkpointsFreed >= before + 3,
      s"expected >= 3 freed checkpoints, delta = ${GraftCache.checkpointsFreed - before}")
  }
}
