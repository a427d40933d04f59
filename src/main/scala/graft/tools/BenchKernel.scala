package graft.tools

import graft.dggs._
import Sphere._

/** Pure-kernel microbenchmark (no Spark): phase breakdown of the
  * point→cell hot path so optimization is measured, not guessed.
  * Usage: runMain graft.tools.BenchKernel [nPoints] [res]
  */
object BenchKernel {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val res = if (args.length > 1) args(1).toInt else 9
    val g = new IGeo7()
    val pts = Array.tabulate(n) { i =>
      GeoRad.fromDeg(-90.0 + ((i * 6271L) % 180000L) / 1000.0,
        -180.0 + ((i * 9973L) % 360000L) / 1000.0)
    }
    def time(label: String, reps: Int = 1)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      var acc = 0L
      for (_ <- 0 until reps) acc ^= f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s ${reps * n / dt / 1e6}%8.3f M/s  (acc=$acc)")
    }
    time("snyder.forward") {
      var acc = 0L; var i = 0
      while (i < n) { val fp = g.snyder.forward(pts(i)); acc ^= fp.face; i += 1 }
      acc
    }
    time("sphereToQuad") {
      var acc = 0L; var i = 0
      while (i < n) { val (q, _, _) = g.quads.sphereToQuad(pts(i)); acc ^= q; i += 1 }
      acc
    }
    time("fixForPoint") {
      var acc = 0L; var i = 0
      while (i < n) { acc ^= g.fixForPoint(pts(i), res).v.a; i += 1 }
      acc
    }
    time("cellForPoint") {
      var acc = 0L; var i = 0
      while (i < n) { acc ^= g.cellForPoint(pts(i), res); i += 1 }
      acc
    }
    // fallback-rate diagnostic: how often the primitive walk rejects
    locally {
      var nFall = 0; var i = 0
      while (i < n) {
        val fix = g.fixForPoint(pts(i), res)
        if (g.fastWalkProbe(fix) == -1L) nFall += 1
        i += 1
      }
      println(f"[info] fastWalk fallback rate: ${100.0 * nFall / n}%.2f%%")
    }
    // T4/D4 for comparison
    val t4 = new Isea4T(); val d4 = new Isea4D()
    time("t4.cellForPoint") {
      var acc = 0L; var i = 0
      while (i < n) { acc ^= t4.cellForPoint(pts(i), res); i += 1 }
      acc
    }
    time("d4.cellForPoint") {
      var acc = 0L; var i = 0
      while (i < n) { acc ^= d4.cellForPoint(pts(i), res); i += 1 }
      acc
    }
  }
}
