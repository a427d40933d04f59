package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON FeatureCollection source (SURVEY.md §2.8: the reference
  * ingests clip/join geometries through geopandas `read_file` —
  * dggrid_runner.py:1376 — with GeoJSON as the portable GDAL format).
  * Output shape is `(poly_id, wkt)` — exactly what [[SpatialOps.coverCellsDf]]
  * and the point-in-polygon join consume.
  *
  * Fully distributed: Spark's multiLine JSON scan + per-feature parsing;
  * the geometry `coordinates` field is captured as its raw JSON text
  * (declared StringType in the explicit schema) and converted to WKT in
  * a Jackson UDF, so Polygon and MultiPolygon features coexist in one
  * collection despite their different nesting depths.
  */
object GeoSources {

  private val featureSchema = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        // raw JSON text of the coordinates array (depth varies by type)
        StructField("coordinates", StringType))))))))))

  /** geometry (type, raw-coordinates JSON) → WKT; Polygon, MultiPolygon,
    * Point, LineString supported (the clip/join geometry types).
    */
  private val toWkt = udf { (gtype: String, coords: String) =>
    if (gtype == null || coords == null) null
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(coords)
      def pt(n: com.fasterxml.jackson.databind.JsonNode): String =
        s"${n.get(0).asDouble} ${n.get(1).asDouble}"
      def ring(n: com.fasterxml.jackson.databind.JsonNode): String =
        (0 until n.size).map(i => pt(n.get(i))).mkString(", ")
      def rings(n: com.fasterxml.jackson.databind.JsonNode): String =
        (0 until n.size).map(i => s"(${ring(n.get(i))})").mkString(", ")
      gtype.toUpperCase match {
        case "POLYGON" => s"POLYGON (${rings(node)})"
        case "MULTIPOLYGON" =>
          s"MULTIPOLYGON (${(0 until node.size)
            .map(i => s"(${rings(node.get(i))})").mkString(", ")})"
        case "POINT" => s"POINT (${pt(node)})"
        case "LINESTRING" => s"LINESTRING (${ring(node)})"
        case other => throw new IllegalArgumentException(
          s"unsupported GeoJSON geometry type $other")
      }
    }
  }

  /** Read GeoJSON FeatureCollection file(s) into `(poly_id, wkt)`.
    * `idProp`: take the id from `properties[idProp]`; otherwise the
    * feature's position in its collection (deterministic — GeoJSON
    * features are an ordered array).
    */
  def readGeoJsonPolygons(spark: SparkSession, path: String,
                          idProp: Option[String] = None): DataFrame = {
    val raw = spark.read.schema(featureSchema)
      .option("multiLine", true).json(path)
      .select(posexplode(col("features")).as(Seq("pos", "f")))
    val id: Column = idProp
      .map(p => col("f.properties")(p))
      .getOrElse(col("pos").cast("string"))
    raw.select(id.as("poly_id"),
      toWkt(col("f.geometry.type"), col("f.geometry.coordinates")).as("wkt"))
  }
}
