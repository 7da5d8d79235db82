package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CacheManager, CachedData}

/** Scoped access to the session's `CacheManager` (a `private[sql]`
  * member, reached from this org.apache.spark.sql subpackage — the
  * standard extension-point idiom) so [[graft.Graft.cacheScoped]] can
  * drop exactly the cache entries a block of work created, WITHOUT the
  * `clearCache()` hammer that would also evict a host application's own
  * cached datasets.
  *
  * Spark's public surface offers only all-or-nothing eviction
  * (`catalog.clearCache()`) or per-Dataset `unpersist()` — but the
  * engine's query builders persist intermediates the caller never holds
  * a reference to (SparkEntry cache contract), so a long-lived embedder
  * needs entry-level diffing: snapshot the entry list, run, uncache the
  * delta by logical plan. Entry enumeration reads the manager's private
  * `cachedData` list reflectively (pinned by CacheHygieneSuite, so a
  * Spark upgrade that moves the field fails loudly in-unit, not
  * silently at a caller). */
object CacheBridge {

  private def manager(spark: SparkSession): CacheManager =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager

  private val cachedDataM = {
    val m = classOf[CacheManager].getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m
  }

  private def entries(spark: SparkSession): Seq[CachedData] =
    cachedDataM.invoke(manager(spark))
      .asInstanceOf[scala.collection.immutable.IndexedSeq[CachedData]]

  /** Identity snapshot of the current cache entries. */
  def snapshot(spark: SparkSession): Set[AnyRef] =
    entries(spark).map(_.asInstanceOf[AnyRef]).toSet

  /** Uncache (blocking) every entry not present in `before`; returns
    * how many were dropped. cascade=false — an entry the host built ON
    * TOP of a scoped intermediate is the host's to manage. */
  def uncacheDelta(spark: SparkSession, before: Set[AnyRef]): Int = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val m = manager(spark)
    val fresh = entries(spark).filterNot(e => before(e.asInstanceOf[AnyRef]))
    fresh.foreach(e =>
      m.uncacheQuery(cs, e.plan, cascade = false, blocking = true))
    fresh.size
  }
}
