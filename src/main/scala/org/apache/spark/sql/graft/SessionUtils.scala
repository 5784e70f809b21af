package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Bridge to the `private[sql]` session-clone API (same hosting rationale
  * as [[BloomFunctions]]/VectorExpressions): a clone shares the
  * SparkContext, cache and catalog but carries an ISOLATED SQLConf —
  * exactly what a concurrent serving pass needs to right-size its conf
  * without racing the caller's session. */
object SessionUtils {
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Drop every cached catalog→LogicalRelation resolution in the session
    * (`SessionCatalog.invalidateAllCachedTables`, reachable only through
    * `private[sql] sessionState`). A DSv1 relation pins its snapshot at
    * resolution time, so after an in-session write through the relation
    * itself (`InsertableRelation.insert`) the NEXT resolution must rebuild
    * — this is how INSERT-then-SELECT over a catalog-registered
    * commit-log table sees the inserted rows without a manual
    * `refreshTable`. Kept as the fallback for
    * [[invalidateRelationCacheWhere]] — whole-cache invalidation is
    * always CORRECT, just coarser than needed. */
  def invalidateRelationCache(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.invalidateAllCachedTables()

  /** Invalidate ONLY the cached catalog→relation resolutions whose plan
    * resolves to a `BaseRelation` matching `matches`. A path-based table
    * may be registered under many catalog names, so the writing relation
    * cannot name its own keys — but it CAN recognize itself in a cached
    * plan (same provider class, same path). Enumerating the keys needs
    * one reflective read of `SessionCatalog.tableRelationCache` (private,
    * no public key-listing API); the invalidation itself goes through the
    * public `invalidateCachedTable(QualifiedTableName)`. If the internals
    * ever move, fall back to [[invalidateRelationCache]] — correctness
    * never depends on the reflection succeeding, only cache hit-rate on
    * UNRELATED tables does (the session-wide drop was penalizing every
    * `CACHE TABLE` resolution on each SQL INSERT). */
  def invalidateRelationCacheWhere(spark: SparkSession)
                                  (matches: org.apache.spark.sql.sources.BaseRelation => Boolean): Unit = {
    val catalog = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    try {
      val m = classOf[org.apache.spark.sql.catalyst.catalog.SessionCatalog]
        .getDeclaredMethod("tableRelationCache")
      m.setAccessible(true)
      val cacheMap = m.invoke(catalog)
        .asInstanceOf[org.sparkproject.guava.cache.Cache[
          org.apache.spark.sql.catalyst.QualifiedTableName,
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
        .asMap()
      val it = cacheMap.entrySet().iterator()
      val stale = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.catalyst.QualifiedTableName]
      while (it.hasNext) {
        val e = it.next()
        val hit = e.getValue.exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            matches(lr.relation)
          case _ => false
        }
        if (hit) stale += e.getKey
      }
      stale.foreach(catalog.invalidateCachedTable)
    } catch {
      case scala.util.control.NonFatal(_) => invalidateRelationCache(spark)
    }
  }

  /** Test seam for [[invalidateRelationCacheWhere]]: the catalog names
    * currently resolution-cached (empty if the reflective read fails —
    * specs guard on non-emptiness before asserting selectivity). */
  def cachedRelationKeys(spark: SparkSession): Seq[String] = {
    val catalog = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    try {
      val m = classOf[org.apache.spark.sql.catalyst.catalog.SessionCatalog]
        .getDeclaredMethod("tableRelationCache")
      m.setAccessible(true)
      val cacheMap = m.invoke(catalog)
        .asInstanceOf[org.sparkproject.guava.cache.Cache[
          org.apache.spark.sql.catalyst.QualifiedTableName,
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
        .asMap()
      import scala.jdk.CollectionConverters._
      cacheMap.keySet().asScala.toSeq.map(_.toString).sorted
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** Parse SQL text to its UNRESOLVED logical plan without executing it
    * (`sessionState.sqlParser` is `private[sql]`). `spark.sql` executes
    * commands EAGERLY, so a caller that must refuse non-query statements
    * (the dispatch serving loop's raw-SQL mode) has to inspect the parse
    * tree BEFORE handing the text to `sql()` — this is that seam. */
  def parsePlan(spark: SparkSession,
                text: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(text)
}
