package graft.tools

import graft.dggs._
import Sphere._

/** scratch probe: engine lattice coords of the DGGRID SEQNUM anchors
  * (tests/test_dggrid.py:496-527 — vert0 11.20/58.2825255885..., res 5,
  * zones 51695 and 51548).
  */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val g = new IGeo7(58.282525588538994675786, 11.20, 0.0)
    for ((lon, lat, zone) <- Seq((20.5, 57.5, 51695L), (21.0, 58.0, 51548L))) {
      val z = g.cellForPoint(GeoRad.fromDeg(lat, lon), 5)
      val fix = g.decode(z)
      // DGGRID structural decomposition: seq = 2 + (q-1)*16807 + k
      val k = zone - 2 - ((zone - 2) / 16807) * 16807
      val q = (zone - 2) / 16807 + 1
      println(s"zone=$zone dggridQ=$q k=$k i49=${k / 49},${k % 49} i343=${k / 343},${k % 343} " +
        s"engine: quad=${fix.quad} a=${fix.v.a} b=${fix.v.b} z7=${Z7.toZ7String(z)}")
    }
    // engine quad corner extents at res 5 for reference
    println("factor5 = " + (0 to 5).map(r => g.cornerEis(3, r)).mkString(" | "))
  }
}
