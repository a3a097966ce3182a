package graft.util

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Site-keyed lifecycle for the corpus-scaled `DISK_ONLY` persist
  * barriers used by the dedup / ANN / text operators.
  *
  * Those persists exist as materialization barriers: they stop
  * Catalyst's `CollapseProject` from inlining an expensive encode /
  * assignment chain through a self-join (where it would be
  * re-evaluated per candidate PAIR), and they bound plan depth. The
  * persisted relation is part of the *returned* lazy plan, so the
  * operator cannot unpersist it eagerly — but without any lifecycle,
  * repeated operator invocations in a long-lived session grow the
  * block-manager disk cache without bound, and `CacheManager`'s
  * plan-keyed substitution can serve stale data if the same input
  * path is re-read after new files land (`InMemoryFileIndex` equality
  * is rootPaths-based).
  *
  * Policy here: each *call site* keeps exactly one live generation.
  * Re-entering the same site unpersists the previous call's relation
  * (non-blocking), so steady-state disk usage is bounded by the number
  * of distinct operator sites, not by the number of invocations. A
  * caller that still holds the previous invocation's plan keeps
  * correct results — Spark recomputes an unpersisted
  * `InMemoryRelation` from its child — it just loses the barrier's
  * cache hit.
  *
  * Long-lived sessions that re-read *mutating* input paths should
  * additionally call [[clear]] (or `spark.catalog.clearCache()`)
  * between runs: unpersisting the previous generation on re-entry
  * already prevents the stale-substitution hazard for these sites,
  * but only for operators that are actually re-entered.
  */
object GraftCache {
  private val live = new ConcurrentHashMap[String, DataFrame]()

  /** `df.transform(GraftCache.barrier("Site.key"))` ==
    * `df.persist(DISK_ONLY)` + unpersist of the relation previously
    * registered under `Site.key`.
    */
  def barrier(site: String)(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.DISK_ONLY)
    val prev = live.put(site, p)
    // re-entry with the IDENTICAL plan shares one CacheManager entry
    // (persist of an already-cached plan is a no-op) — unpersisting
    // "prev" would evict the entry the new handle relies on, silently
    // removing the barrier. Only retire genuinely superseded relations.
    if (prev != null && (prev ne p) &&
        !prev.queryExecution.analyzed.sameResult(p.queryExecution.analyzed))
      prev.unpersist(blocking = false)
    p
  }

  /** Unpersist every live barrier relation and forget them. */
  def clear(): Unit = {
    val it = live.entrySet().iterator()
    while (it.hasNext) {
      it.next().getValue.unpersist(blocking = false)
      it.remove()
    }
  }

  /** [[clear]] plus Spark's own plan-keyed cache — the full reset a
    * long-lived session needs before re-reading inputs that changed
    * on disk.
    */
  def reset(spark: SparkSession): Unit = {
    clear()
    spark.catalog.clearCache()
  }

  /** Number of live barrier relations (test hook). */
  def liveCount: Int = live.size()

  /** Currently registered site keys (test hook — lets a plan-audit
    * spec assert an operator's barrier is still in place by name).
    */
  def liveSites: Set[String] = {
    val b = Set.newBuilder[String]
    live.keySet().forEach(k => b += k)
    b.result()
  }
}
