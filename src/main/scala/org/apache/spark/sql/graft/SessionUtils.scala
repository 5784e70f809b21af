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
}
