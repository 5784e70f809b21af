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
    * `refreshTable`. The relation cannot know its catalog name(s) (a
    * path-based table may be registered under many), so the whole-cache
    * invalidation is the correct granularity. */
  def invalidateRelationCache(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.invalidateAllCachedTables()

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
