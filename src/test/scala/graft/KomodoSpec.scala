package graft

import graft.operators.Komodo
import org.apache.spark.sql.functions._

class KomodoSpec extends SparkSpec {

  test("entry smoke: flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("user_energy: energies are positive and finite, boundary rows dropped") {
    val e = Komodo.userEnergy(spark, sf)
    val bad = e.filter(col("energy") <= 0 || col("energy").isNull ||
      isnan(col("energy")) || col("energy") === Double.PositiveInfinity)
    assert(bad.count() === 0)
    // one LAG-boundary row dropped per user partition
    val users  = Tables.events(spark, sf).filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    val inputs = Tables.events(spark, sf).filter(col("event_type") === "view").count()
    assert(e.count() === inputs - users)
  }

  test("agg_interaction: counts sum to the filtered input cardinality") {
    val total = Komodo.aggInteraction(spark, sf)
      .agg(sum("interaction_count")).first().getLong(0)
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "click" && col("k") % 10 === 3).count()
    assert(total === expected)
  }

  test("agg_user: decode is total on codes 0-3 (no null labels)") {
    val r = Komodo.aggUser(spark, sf)
    assert(r.filter(col("entity_type").isNull).count() === 0)
    assert(r.count() <= 4)
  }

  test("user_proximity: distances fall inside the (0, diameter) range filter") {
    val p = Komodo.userProximity(spark, sf, diameter = 50.0)
    assert(p.filter(col("distance") <= 0 || col("distance") >= 50.0).count() === 0)
  }

  test("drawing_pattern: stroke counts never exceed bucket event counts") {
    val d = Komodo.drawingPattern(spark, sf)
    assert(d.filter(col("stroke_type_count") =!= col("stroke_id_count")).count() === 0)
  }
}
