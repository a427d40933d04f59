package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct unit coverage for the raster helpers the driver queries only
  * exercise indirectly (round-2 verdict: R1/R4/R5 "untested directly")
  * plus a vector→raster round-trip smoke test.
  */
class RasterOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graft-raster-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val t = RasterOps.Affine(10.0, 0.01, 0.0, 55.0, 0.0, -0.01)

  test("R4 pixelEdgeLenM: 0.01° of longitude is ~1112 m at the equator, halves at 60°") {
    val atEquator = RasterOps.pixelEdgeLenM(t, 0.0)
    assert(math.abs(atEquator - 1111.95) < 0.2, atEquator.toString)
    val at60 = RasterOps.pixelEdgeLenM(t, 60.0)
    assert(math.abs(at60 - atEquator * 0.5) < 0.2, at60.toString)
  }

  test("R5 proposeDggsRes: matches the frozen raster fixture res; monotone in pixel size") {
    // the frozen rasterCellCte was generated at the proposed res for
    // this affine at lat 53.7 — res 11 (see OracleFixtures scaladoc)
    assert(RasterOps.proposeDggsRes(RasterOps.pixelEdgeLenM(t, 53.7)) == 11)
    val resFine = RasterOps.proposeDggsRes(100.0)
    val resCoarse = RasterOps.proposeDggsRes(10000.0)
    assert(resFine > resCoarse)
    // a pixel finer than any allowed res's CLS clamps to maxRes
    assert(RasterOps.proposeDggsRes(1e-9, maxRes = 10) == 10)
  }

  test("R1 suggestTilePx: sqrt sizing with a 64 px floor") {
    assert(RasterOps.suggestTilePx(64L * 1024 * 1024) == 1024)
    assert(RasterOps.suggestTilePx(0) == 64)
    assert(RasterOps.suggestTilePx(256L * 1024 * 1024, bytesPerPx = 64) == 2048)
  }

  test("vector→raster: sampling cell aggregates back onto pixels round-trips") {
    val px = RasterOps.syntheticRaster(spark, 16, 16, 8)
    val res = RasterOps.proposeDggsRes(RasterOps.pixelEdgeLenM(t, 53.7))
    val cellVals = RasterOps.rasterToCells(px, t, res)
      .select("cell_id", "value_mean")
    val back = RasterOps.cellsToRaster(px, t, res, cellVals)
    assert(back.count() == 256) // keepMasked: every pixel appears
    // at res 11 each non-null pixel is alone in its cell, so the
    // sampled-back mean equals the pixel value exactly
    assert(back.where(col("value").isNotNull &&
      col("value") =!= col("value_mean")).count() == 0)
    // masked pixels joined nothing (their cells hold no value) unless a
    // neighbouring non-null pixel shares the cell — at res 11 none do
    assert(back.where(col("value").isNull && col("value_mean").isNotNull)
      .count() == 0)
  }
}
