package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * `(SparkSession, sfDir) => DataFrame` plus (where ANSI-SQL-expressible)
  * a DuckDB oracle twin with IDENTICAL output column names — the driver
  * hash-compares the two at sf0.01.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): user_energy — JSON struct access,
    * filter, partitioned window-lag, scalar math, null guard, sort.
    * Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Komodo.userEnergy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference analytics (SURVEY §2.2-2.6, process.py) --
    "agg_interaction" -> ((s, d) => Komodo.aggInteraction(s, d)),
    "agg_user"        -> ((s, d) => Komodo.aggUser(s, d)),
    "user_energy"     -> ((s, d) => Komodo.userEnergy(s, d)),
    "drawing_pattern" -> ((s, d) => Komodo.drawingPattern(s, d)),
    "user_proximity"  -> ((s, d) => Komodo.userProximity(s, d)),
  )

  /** DuckDB oracle twins (same column names, same row order). */
  def oracleSql: Map[String, String] = Map(
    "agg_interaction" -> Komodo.aggInteractionSql,
    "agg_user"        -> Komodo.aggUserSql,
    "user_energy"     -> Komodo.userEnergySql,
    "drawing_pattern" -> Komodo.drawingPatternSql,
    "user_proximity"  -> Komodo.userProximitySql,
  )
}
