package graft.dggs

import Sphere._
import scala.io.Source

/** Dev-time validation against DGGRID golden data (also mirrored in the
  * ScalaTest suite): the reference's res-9 IGEO7 cells
  * (examples/igeo7_res_9.gpkg → CSV fixture), the Oregon res-4 presence
  * golden (tests/test_dggrid.py:146-249), and a global all-cells
  * roundtrip.
  */
object Calibrate {

  case class Cell(z7: Long, ring: Array[(Double, Double)])

  def loadCells(): Seq[Cell] = {
    val src = Source.fromFile("src/test/resources/igeo7_res9_cells.csv")
    val cells = src.getLines().drop(1).map { line =>
      val Array(hexs, ringS) = line.split(",", 2)
      val ring = ringS.split(";").map { p =>
        val Array(lo, la) = p.split(" "); (lo.toDouble, la.toDouble)
      }
      Cell(Z7.fromHex(hexs), ring)
    }.toList
    src.close()
    cells
  }

  val oregonCities = Seq(
    (-123.28, 44.57), (-122.87, 45.49), (-122.77, 45.43), (-123.09, 44.62),
    (-122.70, 45.41), (-123.02, 45.00), (-123.19, 45.21), (-122.60, 45.34),
    (-123.32, 42.44), (-122.77, 45.38), (-122.64, 45.37), (-122.62, 45.44),
    (-121.17, 45.60), (-122.86, 45.15), (-123.36, 43.22))
  val oregonGolden = Set("021114", "021116", "014626")

  def main(args: Array[String]): Unit = {
    // 1. Estonia res-9 golden (default orientation)
    val grid = new IGeo7(58.28252559, 11.25, 0.0)
    val cells = loadCells()
    var okFwd = 0; var okCtr = 0; var okBnd = 0
    var maxBnd = 0.0
    for (c <- cells) {
      val r = Z7.resolution(c.z7)
      val ring = c.ring.dropRight(1)
      val ctr = toGeo(ring.map { case (lo, la) => toVec(GeoRad.fromDeg(la, lo)) }.reduce(_ + _))
      if (grid.cellForPoint(ctr, r) == c.z7) okFwd += 1
      if (distance(grid.cellCenter(c.z7), ctr) < 1e-5) okCtr += 1
      val myBnd = grid.cellBoundary(c.z7)
      if (myBnd.length == ring.length) {
        val err = ring.map { case (lo, la) =>
          val g = GeoRad.fromDeg(la, lo); myBnd.map(distance(g, _)).min
        }.max
        maxBnd = math.max(maxBnd, err)
        if (err < 1e-9) okBnd += 1
      }
    }
    println(s"estonia: fwd $okFwd/551 ctr $okCtr/551 bnd $okBnd/551 maxBndErr=$maxBnd")

    // 2. Oregon res-4 golden (test orientation)
    val tg = new IGeo7(58.282525588538994675786, 11.20, 0.0)
    val mine = oregonCities.map { case (lo, la) =>
      Z7.toZ7String(tg.cellForPoint(GeoRad.fromDeg(la, lo), 4))
    }.toSet
    println(s"oregon: mine=$mine golden=$oregonGolden match=${mine == oregonGolden}")

    // 3. global roundtrip: every cell at res 0..3, center -> cellForPoint
    for (r <- 0 to 3) {
      var all: Seq[Long] = (0 to 11).map(b => Z7.pack(b, Seq.empty))
      for (_ <- 1 to r) all = all.flatMap(Z7.children)
      val n = all.size
      val expected = 10 * math.pow(7, r).toLong + 2
      var rt = 0
      var centerDup = 0
      val seen = scala.collection.mutable.Set[(Long, Long)]()
      for (z <- all) {
        val c = grid.cellCenter(z)
        val key = (math.round(c.lat * 1e12), math.round(c.lon * 1e12))
        if (!seen.add(key)) centerDup += 1
        if (grid.cellForPoint(c, r) == z) rt += 1
      }
      println(s"res $r: cells $n (expect $expected) roundtrip $rt/$n dupCenters $centerDup")
    }
  }
}
