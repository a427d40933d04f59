package graft.tools
import graft.dggs.{Sphere, Z7}
import graft.spark.Grids
import Sphere.GeoRad

/** throwaway: measure the exact exterior-distance lower bound for disk
  * radii k=1..4 over res 1..5 — the data for extending diskSafeKm past
  * its validated 1..2 range.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val g = Grids.default
    val R = Sphere.EarthRadiusKm
    for (res <- 1 to 5) {
      val pentas = (0 to 11).map(b => Z7.pack(b, Seq.fill(res)(0)))
      val pentaNbrs = pentas.flatMap(g.ring1)
      val seeded = (0 until 40).map { i =>
        val lon = -180.0 + (i * 9973 % 3600) / 10.0
        val lat = -85.0 + (i * 6271 % 1700) / 10.0
        g.cellForPoint(GeoRad.fromDeg(lat, lon), res)
      }
      val cells = (pentas ++ pentaNbrs ++ seeded).distinct
      val areaKm2 = 4.0 * math.Pi * R * R / (10.0 * math.pow(7.0, res))
      val rIn = math.sqrt(areaKm2 / (2.0 * math.sqrt(3.0)))
      for (k <- 1 to 4) {
        var worst = Double.MaxValue
        var skipped = 0
        for (z <- cells) {
          val disk = g.disk(z, k).toSet
          val outerAll = g.disk(z, k + 1)
          val outer = outerAll.filterNot(disk)
          if (outer.isEmpty) skipped += 1
          else {
            val circ = outer.map { c2 =>
              val ctr = g.cellCenter(c2)
              (ctr, g.cellBoundary(c2).map(v => Sphere.distance(ctr, v)).max)
            }
            val pts = g.cellCenter(z) +: g.cellBoundaryDensified(z, 3)
            for (p <- pts) {
              val lb = circ.map { case (ctr, cr) =>
                (Sphere.distance(p, ctr) - cr) * R }.min
              if (lb < worst) worst = lb
            }
          }
        }
        val naive = (2.0 * k - 1.0) * rIn
        println(f"res $res k $k: bound=$worst%10.3f km  rIn=$rIn%9.3f  " +
          f"(2k-1)rIn=$naive%10.3f  factor=${worst / naive}%5.3f  skipped=$skipped")
      }
    }
  }
}
