package graft

import graft.util.GraftCache
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the site-keyed DISK_ONLY barriers: re-entering an
  * operator site retires the previous invocation's relation (bounded
  * disk cache in long-lived sessions) without evicting a shared cache
  * entry when the plan is identical, and clear() empties everything.
  */
class GraftCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("re-entry at the same site unpersists the superseded relation; " +
      "an identical plan keeps its shared cache entry; clear() drains") {
    GraftCache.clear()
    spark.catalog.clearCache()

    val a = spark.range(10).select(col("id"), (col("id") * 2).as("v"))
      .transform(GraftCache.barrier("spec.site"))
    a.count()
    assert(a.storageLevel == StorageLevel.DISK_ONLY)

    // different plan, same site: the old generation must be retired
    val b = spark.range(20).select(col("id"), (col("id") * 3).as("v"))
      .transform(GraftCache.barrier("spec.site"))
    b.count()
    assert(a.storageLevel == StorageLevel.NONE,
      "superseded relation still pinned after re-entry")
    assert(b.storageLevel == StorageLevel.DISK_ONLY)

    // IDENTICAL plan, same site: CacheManager shares one entry across
    // both handles — re-entry must NOT evict it out from under the new
    // handle (the barrier would silently vanish)
    val b2 = spark.range(20).select(col("id"), (col("id") * 3).as("v"))
      .transform(GraftCache.barrier("spec.site"))
    assert(b2.storageLevel == StorageLevel.DISK_ONLY,
      "identical-plan re-entry evicted its own shared cache entry")

    // distinct sites hold independent generations
    val c = spark.range(5).toDF()
      .transform(GraftCache.barrier("spec.other"))
    c.count()
    assert(GraftCache.liveCount == 2)

    GraftCache.clear()
    assert(GraftCache.liveCount == 0)
    assert(b2.storageLevel == StorageLevel.NONE && c.storageLevel == StorageLevel.NONE,
      "clear() left a barrier relation pinned")

    // an unpersisted-behind-a-held-handle plan still computes correctly
    assert(b.count() == 20)
  }
}
