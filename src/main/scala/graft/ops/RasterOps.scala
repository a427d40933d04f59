package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dggs.Sphere

/** Raster↔vector tiling (SURVEY.md §2.4, reference igeo7_ext.py:159-408).
  * A raster is a long-form pixel DataFrame `(tile_id, row, col, value)`
  * plus an affine transform; tiles are the unit of parallelism (the
  * reference's block-aligned windows → our partitions).
  */
object RasterOps {

  /** affine geotransform (GDAL order): lon = a + col·b + row·c,
    * lat = d + col·e + row·f
    */
  final case class Affine(a: Double, b: Double, c: Double,
                          d: Double, e: Double, f: Double)

  /** deterministic synthetic raster as a pixel table — the sandbox
    * stand-in for a real reader (rasterio is not on the JVM; the Spark
    * side — schema, tiling, partitioning — is the real machinery).
    * Masked pixels (value null) follow a deterministic pattern.
    */
  def syntheticRaster(spark: SparkSession, widthPx: Int, heightPx: Int,
                      tilePx: Int): DataFrame = {
    val tilesX = (widthPx + tilePx - 1) / tilePx
    val tilesY = (heightPx + tilePx - 1) / tilePx
    spark.range(tilesX.toLong * tilesY)
      .select(col("id").cast("int").as("tile_id"))
      .repartition(col("tile_id"))
      .select(col("tile_id"),
        explode(sequence(lit(0), lit(tilePx - 1))).as("ty"))
      .select(col("tile_id"), col("ty"),
        explode(sequence(lit(0), lit(tilePx - 1))).as("tx"))
      .select(col("tile_id"),
        ((col("tile_id") / tilesX).cast("int") * tilePx + col("ty")).as("row"),
        ((col("tile_id") % tilesX) * tilePx + col("tx")).as("col"))
      .where(col("row") < heightPx && col("col") < widthPx)
      .withColumn("value",
        when((col("row") * 7 + col("col") * 13) % 17 === 0, lit(null).cast("double"))
          .otherwise(((col("row") * 31 + col("col") * 17) % 1000).cast("double")))
  }

  /** R3 create_geopoints_for_window: pixel centers → lon/lat points,
    * mask-aware (igeo7_ext.py:357-408). Pixel center at (col+0.5,
    * row+0.5) through the affine.
    */
  def pixelsToPoints(pixels: DataFrame, t: Affine, keepMasked: Boolean = false): DataFrame = {
    val cx = col("col") + 0.5; val cy = col("row") + 0.5
    val df = pixels
      .withColumn("lon", lit(t.a) + cx * t.b + cy * t.c)
      .withColumn("lat", lit(t.d) + cx * t.e + cy * t.f)
    if (keepMasked) df else df.where(col("value").isNotNull)
  }

  /** raster → DGGS: pixel centers assigned to cells, per-cell mean
    * (the raster sampling direction of O3 binning).
    */
  def rasterToCells(pixels: DataFrame, t: Affine, res: Int): DataFrame =
    GridOps.binPointVals(pixelsToPoints(pixels, t), "lon", "lat", "value", res)

  /** vector → raster: cell aggregates sampled back onto the pixel grid
    * (each pixel center looks up its cell's value) — a cell-id equi-join
    * against the aggregate table.
    */
  def cellsToRaster(pixels: DataFrame, t: Affine, res: Int,
                    cellValues: DataFrame): DataFrame = {
    val pts = pixelsToPoints(pixels, t, keepMasked = true)
    GridOps.cellsForGeoPoints(pts, "lon", "lat", res)
      .join(broadcast(cellValues), Seq("cell_id"), "left")
  }

  /** R4 pixel edge length in metres for a degree-unit affine at a given
    * latitude (haversine across one pixel — igeo7_ext.py:295-334).
    */
  def pixelEdgeLenM(t: Affine, atLatDeg: Double): Double = {
    val km = Sphere.EarthRadiusKm
    val lat = math.toRadians(atLatDeg)
    val dLon = math.toRadians(math.abs(t.b))
    2.0 * km * 1000.0 * math.asin(math.abs(math.cos(lat) * math.sin(dLon / 2.0)))
  }

  /** R5 propose_dggs_level_for_pixel_length: smallest resolution whose
    * CLS (m) is below pixelEdgeLen/factor (igeo7_ext.py:337-354).
    */
  def proposeDggsRes(pixelEdgeLenM: Double, pixSizeFactor: Double = 2.0,
                     maxRes: Int = 20): Int = {
    val R = Sphere.EarthRadiusKm
    val earthArea = 4.0 * math.Pi * R * R
    (0 to maxRes).find { r =>
      val cells = 10.0 * math.pow(7.0, r) + 2
      val area = earthArea / cells
      val clsM = 2.0 * R * math.acos(1.0 - area / (2.0 * math.Pi * R * R)) * 1000.0
      clsM < pixelEdgeLenM / pixSizeFactor
    }.getOrElse(maxRes)
  }

  /** R1 suggest window/tile size: pixels per tile so a tile's doubles
    * fit in memBytes (the reference's blocks-per-chunk heuristic,
    * igeo7_ext.py:159-179, expressed in pixels).
    */
  def suggestTilePx(memBytes: Long, bytesPerPx: Int = 64): Int =
    math.max(64, math.sqrt(memBytes.toDouble / bytesPerPx).toInt)
}
