package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the FixtureKeys parse contract against the generated
  * OracleFixtures CTE (round-6 verdict #1): the key set is complete,
  * duplicate-free, and the semi-join restriction keeps exactly the rows
  * whose integer milli-degree key is frozen.
  */
class FixtureKeysSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("geoKeys parse the full CTE: one key per VALUES row, no dups") {
    val keys = FixtureKeys.geoKeys
    // the header contributes two '(' — `cells(…)` and `AS (VALUES` —
    // every other '(' opens exactly one VALUES row
    val rows = OracleFixtures.geoCellCte.count(_ == '(') - 2
    assert(keys.length == rows, s"parsed ${keys.length} keys, CTE has $rows rows")
    assert(keys.distinct.length == keys.length, "fixture keys must be unique")
    // the first CTE row, literally
    assert(OracleFixtures.geoCellCte.contains(
      s"(${keys.head._1}, ${keys.head._2},"))
  }

  test("restrictGeo keeps exactly the fixture-keyed rows") {
    import spark.implicits._
    val (lonK, latK) = FixtureKeys.geoKeys.head
    val geo = Seq(
      ("doc-a", 0, lonK, latK),   // frozen key → kept
      ("doc-b", 1, lonK, latK),   // same key, other doc → kept too
      ("doc-c", 0, lonK + 1, latK) // off-by-one-mdeg → dropped
    ).toDF("doc_id", "offset", "lon_mdeg", "lat_mdeg")
    val kept = FixtureKeys.restrictGeo(geo).select("doc_id")
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("doc-a", "doc-b"))
  }
}
