package graft.dggs
import Sphere._
object Dbg {
  def main(args: Array[String]): Unit = {
    val g = new IGeo7(58.28252559, 11.25, 0.0)
    val rnd = new scala.util.Random(7)
    val pts = Array.fill(400000)(GeoRad.fromDeg(rnd.nextDouble * 170 - 85, rnd.nextDouble * 360 - 180))
    var sink = 0L
    for (p <- pts.take(50000)) sink += g.cellForPoint(p, 9) // warmup
    for (nThreads <- Seq(1, 8, 32)) {
      val t0 = System.nanoTime
      val threads = (0 until nThreads).map { t =>
        val th = new Thread(() => {
          var s = 0L
          var rep = 0
          while (rep < 2) { // each thread does the full array twice
            var i = 0
            while (i < pts.length) { s += g.cellForPoint(pts(i), 9); i += 1 }
            rep += 1
          }
          sink += s
        })
        th.start(); th
      }
      threads.foreach(_.join())
      val dt = (System.nanoTime - t0) / 1e9
      val total = nThreads.toLong * pts.length * 2
      println(f"$nThreads threads: ${total / dt}%.0f pts/sec total (${total / dt / nThreads}%.0f /thread)")
    }
    println(sink)
  }
}
