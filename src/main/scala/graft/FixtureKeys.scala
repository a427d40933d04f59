package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The frozen kernel fixture's KEY SET, derived from the fixture itself
  * (round-6 verdict #1 — scale-invariant fixture oracles).
  *
  * [[OracleFixtures.geoCellCte]] freezes the engine's point→cell mapping
  * for the sf0.01 corpus's distinct geo points. Queries whose DuckDB
  * oracle inner-joins that CTE are implicitly restricted to its key set
  * on the oracle side; at any other sf the live corpus has points the
  * fixture doesn't carry, so the two sides would diverge BY DESIGN.
  * Restricting the Spark side to the SAME key set (a broadcast semi-join
  * on the exact milli-degree integers) makes the comparison exercise the
  * identical frozen mapping at ANY scale factor — the 10× sweep reads
  * hash-green instead of "mismatch by design".
  *
  * The keys are PARSED from the generated CTE string rather than frozen
  * a second time: one artifact, zero drift — a FreezeFixtures
  * regeneration updates both sides by construction (format pinned by
  * FixtureKeysSpec).
  */
object FixtureKeys {

  /** (lon_mdeg, lat_mdeg) of every fixture row, in CTE order. */
  lazy val geoKeys: Seq[(Long, Long)] = {
    val row = raw"\((-?\d+), (-?\d+),".r
    val ks = row.findAllMatchIn(OracleFixtures.geoCellCte)
      .map(m => (m.group(1).toLong, m.group(2).toLong)).toVector
    require(ks.nonEmpty,
      "FixtureKeys: no (lon_mdeg, lat_mdeg) keys parsed from geoCellCte — " +
        "did the FreezeFixtures VALUES format change?")
    ks
  }

  /** Restrict a [[graft.ops.CorpusOps.geoSpans]] relation to the frozen
    * key set: broadcast LEFT-SEMI on the exact integer milli-degrees
    * (the ~700-key side is a few KB — always map-side; the corpus never
    * shuffles for the restriction). At the sf0.01 gate scale this is a
    * no-op by construction (the fixture was frozen from exactly that
    * corpus's distinct points).
    */
  def restrictGeo(geo: DataFrame): DataFrame = {
    val s = geo.sparkSession
    import s.implicits._
    val keys = geoKeys.toDF("lon_mdeg", "lat_mdeg")
    geo.join(broadcast(keys), Seq("lon_mdeg", "lat_mdeg"), "left_semi")
  }
}
