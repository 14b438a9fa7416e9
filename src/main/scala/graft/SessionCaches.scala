package graft

import org.apache.spark.sql.SparkSession

/** Shared miss-path lifecycle discipline for the engine's
  * (SparkSession, …)-keyed caches ([[Tables]], TokenCache,
  * ShingleCache, PairCache, TradeEdgeCache, BasketCache,
  * PricePercentileCache, RankQuantileCache, PsiGridCache,
  * ConformalFitCache, AssetCache, LloydFitCache).
  *
  * A long-lived JVM that creates and stops sessions — or the shared
  * test JVM, which accumulates one entry per temp dir per suite — must
  * not pin dead sessions' plans (or, for the persisted-DataFrame
  * caches, dead entries whose storage blocks already died with their
  * context) forever. The purge runs on the MISS path only (never
  * per-hit, the hot path stays a single CHM get) and BEFORE
  * `computeIfAbsent`, outside its mapping function: the CHM contract
  * forbids the mapping function from mutating the map (a removal
  * landing in the bin being computed can corrupt it).
  *
  * Stopped-session entries are removed WITHOUT unpersisting: a stopped
  * SparkContext has already torn down its block manager, so the
  * pinned blocks are gone and `unpersist()` on the dead plan would at
  * best no-op and at worst throw into the purge loop. Live-session
  * eviction (dir rewrite, suite cleanup) stays each cache's own
  * `evict`/`clear`, which DO unpersist.
  */
private[graft] object SessionCaches {

  /** Cache lookup with the stopped-session purge on the miss path.
    *
    * @param session extracts the owning session from a key (the caches
    *                key by `(SparkSession, …)` tuples of varying arity)
    */
  def getOrBuild[K, V](
      cache: java.util.concurrent.ConcurrentHashMap[K, V],
      key: K, session: K => SparkSession)(build: => V): V =
    getOrBuildWhere(cache, key,
      (k: K) => session(k).sparkContext.isStopped)(build)

  /** [[getOrBuild]] with an explicit deadness predicate — the seam
    * SessionCachesSpec pins the purge through (a JVM holds ONE
    * SparkContext, so a live-plus-stopped session pair cannot exist in
    * the test JVM to drive the real predicate).
    */
  private[graft] def getOrBuildWhere[K, V](
      cache: java.util.concurrent.ConcurrentHashMap[K, V],
      key: K, dead: K => Boolean)(build: => V): V = {
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val it = cache.keySet().iterator()
      while (it.hasNext)
        if (dead(it.next())) it.remove()
      cache.computeIfAbsent(key, { _: K => build })
    }
  }
}
