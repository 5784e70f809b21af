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

  // Golden-value analog tests (SURVEY §5): the reference pins the exact
  // head rows of each analytic against its seeded capture
  // (test_user_energy.py:70-76, test_user_proximity.py:67-68); its data
  // blob is missing from the repo, so these pin the same assertion shape
  // against the sf0.001 fixture. Expected doubles were computed
  // INDEPENDENTLY in DuckDB (2026-08-12) and are asserted bit-exact —
  // the float-parity discipline (pinned expression shape, left-assoc
  // sums) is what makes cross-engine equality achievable at all.

  test("user_energy golden values: exact first-5 rows on sf0.001") {
    val expected = Seq(
      (0L, 258L, 1704699927119L, 7.14702337378845e-08),
      (0L, 336L, 1704916455557L, 1.354780770175466e-07),
      (0L, 529L, 1705384174602L, 2.361849669624389e-07),
      (0L, 581L, 1705496439002L, 1.1006879611571201e-06),
      (0L, 587L, 1705512555092L, 4.775216061662841e-06))
    val e = Komodo.userEnergy(spark, sf)
    assert(e.count() === 173)
    val got = e.limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("user_proximity golden values: exact first-5 rows on sf0.001") {
    val expected = Seq(
      (1705255200000L, 487L, 13L, 5.390380320533978),
      (1704873600000L, 319L, 6L, 5.456665648543987),
      (1704085200000L, 8L, 13L, 5.573939360990575),
      (1705600800000L, 625L, 5L, 5.803171546663083),
      (1704294000000L, 93L, 8L, 6.125699960004571))
    val p = Komodo.userProximity(spark, sf)
    assert(p.count() === 116)
    val got = p.limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }
}
