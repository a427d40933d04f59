package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, Polygon}

/** H9 post_process_split_dateline — bit-faithful to the reference's pure
  * Python implementation (interrupt.py:26-68): a polygon crosses the
  * antimeridian iff some consecutive-vertex lon jump exceeds 180°;
  * negative lons are shifted +360, the shifted ring is clipped against
  * [0, 179.995]×[−90,90] (east piece, kept as-is) and
  * [180.005, 360]×[−90,90] (west piece, translated −360) — including the
  * reference's 0.005° epsilon gap at the seam.
  */
object DatelineOps {

  private val Eps = 0.005

  // hoisted out of splitRing: GeometryFactory is immutable-config and
  // thread-safe; a per-split-ring `new` is the allocation-rate pattern
  // measured as this box's 32-thread ceiling (round-3 verdict #3)
  @transient private lazy val gf = new GeometryFactory()

  /** split one ring: returns 1 or 2 rings of (lon, lat). */
  def splitRing(ring: Seq[(Double, Double)]): Seq[Seq[(Double, Double)]] = {
    val crosses = ring.indices.exists { i =>
      val a = ring(i)._1; val b = ring((i + 1) % ring.size)._1
      math.abs(b - a) > 180.0
    }
    if (!crosses) Seq(ring)
    else {
      val shifted = ring.map { case (lo, la) => (if (lo < 0) lo + 360.0 else lo, la) }
      val closed = if (shifted.head == shifted.last) shifted else shifted :+ shifted.head
      val poly = gf.createPolygon(closed.map { case (lo, la) => new Coordinate(lo, la) }.toArray)
      def box(x0: Double, x1: Double) = gf.createPolygon(Array(
        new Coordinate(x0, -90), new Coordinate(x1, -90), new Coordinate(x1, 90),
        new Coordinate(x0, 90), new Coordinate(x0, -90)))
      def rings(g: org.locationtech.jts.geom.Geometry, dx: Double): Seq[Seq[(Double, Double)]] =
        (0 until g.getNumGeometries).map(g.getGeometryN).collect {
          case p: Polygon if !p.isEmpty =>
            p.getExteriorRing.getCoordinates.toSeq.map(c => (c.x + dx, c.y))
        }
      val east = rings(poly.intersection(box(0.0, 180.0 - Eps)), 0.0)
      val west = rings(poly.intersection(box(180.0 + Eps, 360.0)), -360.0)
      val out = east ++ west
      if (out.isEmpty) Seq(ring) else out
    }
  }

  /** DataFrame form: explodes a boundary `array<struct<lon,lat>>` column
    * into 1-2 split pieces (`piece` index + new boundary + WKT).
    */
  def splitDateline(df: DataFrame, boundaryCol: String): DataFrame = {
    val splitUdf = udf { (ring: Seq[org.apache.spark.sql.Row]) =>
      val r = ring.map(x => (x.getDouble(0), x.getDouble(1)))
      splitRing(r)
    }
    df.withColumn("pieces", splitUdf(col(boundaryCol)))
      .select(col("*"), posexplode(col("pieces")).as(Seq("piece", "piece_ring")))
      .drop("pieces")
      .withColumn("piece_wkt",
        concat(lit("POLYGON (("),
          array_join(transform(col("piece_ring"),
            p => concat(p.getField("_1"), lit(" "), p.getField("_2"))), ", "),
          lit("))")))
  }
}
