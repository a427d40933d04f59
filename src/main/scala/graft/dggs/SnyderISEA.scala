package graft.dggs

import Sphere._

/** Snyder's 1992 equal-area projection for the icosahedron (ISEA),
  * implemented from the published equations ("An Equal-Area Map
  * Projection For Polyhedral Globes", Cartographica 29(1)). The
  * reference computes this inside the external DGGRID binary
  * (dggrid_runner.py:738-794); here it is pure Scala.
  *
  * All lengths are on the unit sphere (R = 1); callers scale as needed.
  * Face-local plane frame: origin at the face center, the face's
  * reference vertex at plane azimuth 0 = +y axis, azimuth clockwise
  * (x = ρ sin α, y = ρ cos α) — orientation-preserving vs the spherical
  * azimuth convention.
  *
  * All constants are derived, not hardcoded:
  *   g  = center→vertex arc, G = 36° (half the 72° vertex angle),
  *   θ  = 30° (plane angle center-vertex-to-edge),
  *   rc = plane center→vertex distance with exact equal-area tiling:
  *        (3√3/4)·rc² = π/5  (20 plane faces tile the 4π sphere)
  *   R′ = rc / tan g.
  */
final class SnyderISEA(val ico: Icosahedron) {

  import SnyderISEA._

  val g: Double = distance(ico.faceCenters(0), ico.vertices(ico.faceVerts(0)(0)))
  val tanG: Double = math.tan(g)
  val cosG36: Double = math.cos(G)
  val sinG36: Double = math.sin(G)
  val cosg: Double = math.cos(g)
  /** plane center→vertex distance for equal-area tiling */
  val rc: Double = math.sqrt(4.0 * math.Pi / (15.0 * math.sqrt(3.0)))
  val Rprime: Double = rc / tanG
  private val rc2 = rc * rc

  /** Plane point on a face, face-local frame. */
  final case class FacePoint(face: Int, x: Double, y: Double)

  /** Spherical edge distance from face center at spherical azimuth az
    * (az relative to the reference vertex).
    */
  @inline private def edgeDist(az: Double): Double =
    math.atan2(tanG, math.cos(az) + math.sin(az) * CotTheta)

  /** Forward: point → (face, x, y). Fast path: the nearest face center's
    * containment almost always passes; otherwise fall back to trying all
    * faces nearest-first.
    */
  def forward(p: GeoRad): FacePoint = {
    val f0 = ico.nearestFace(p)
    val z0 = distance(ico.faceCenters(f0), p)
    if (z0 < g + 1e-9) {
      var az = azimuth(ico.faceCenters(f0), p) - ico.faceAz0(f0)
      while (az < 0) az += TwoPi
      while (az >= TwoPi) az -= TwoPi
      val rot = math.floor(az / Deg120).toInt
      val azF = az - rot * Deg120
      if (z0 - edgeDist(azF) <= 1e-12) return project(f0, azF, z0, rot)
    }
    forwardSlow(p)
  }

  private def forwardSlow(p: GeoRad): FacePoint = {
    val order = ico.facesByCloseness(p)
    var i = 0
    var best: FacePoint = null
    var bestSlack = Double.MaxValue
    while (i < order.length && best == null) {
      val f = order(i)
      val z = distance(ico.faceCenters(f), p)
      if (z < g + 1e-9) {
        val azRaw = azimuth(ico.faceCenters(f), p) - ico.faceAz0(f)
        var az = azRaw
        while (az < 0) az += TwoPi
        while (az >= TwoPi) az -= TwoPi
        val rot = math.floor(az / Deg120).toInt
        val azF = az - rot * Deg120
        val q = edgeDist(azF)
        val slack = z - q
        if (slack <= 1e-12) {
          best = project(f, azF, z, rot)
        } else if (slack < bestSlack) {
          bestSlack = slack
        }
      }
      i += 1
    }
    if (best == null) {
      // numeric boundary: take the face with minimal slack
      val f = order.minBy { f =>
        val z = distance(ico.faceCenters(f), p)
        var az = azimuth(ico.faceCenters(f), p) - ico.faceAz0(f)
        while (az < 0) az += TwoPi
        val azF = az - math.floor(az / Deg120) * Deg120
        z - edgeDist(azF)
      }
      val z = distance(ico.faceCenters(f), p)
      var az = azimuth(ico.faceCenters(f), p) - ico.faceAz0(f)
      while (az < 0) az += TwoPi
      while (az >= TwoPi) az -= TwoPi
      val rot = math.floor(az / Deg120).toInt
      best = project(f, az - rot * Deg120, z, rot)
    }
    best
  }

  /** Snyder forward equations 5-9 for azF ∈ [0°,120°), z ≤ q(azF). */
  private def project(f: Int, azF: Double, z: Double, rot: Int): FacePoint = {
    if (z < 1e-15) return FacePoint(f, 0.0, 0.0)
    val H = math.acos(math.sin(azF) * sinG36 * cosg - math.cos(azF) * cosG36)
    val ag = azF + G + H - math.Pi // spherical excess of (center, v_ref, point-direction edge)
    val azP = math.atan2(2.0 * ag, rc2 - 2.0 * ag * CotTheta)
    val dP = Rprime * tanG / (math.cos(azP) + math.sin(azP) * CotTheta)
    val q = edgeDist(azF)
    val fScale = dP / (2.0 * Rprime * math.sin(q / 2.0))
    val rho = 2.0 * Rprime * fScale * math.sin(z / 2.0)
    val alpha = azP + rot * Deg120
    FacePoint(f, rho * math.sin(alpha), rho * math.cos(alpha))
  }

  /** Inverse: (face, x, y) → sphere. Newton iteration on Az
    * (Snyder's eq 19-21 reversal).
    */
  def inverse(fp: FacePoint): GeoRad = {
    val rho = math.hypot(fp.x, fp.y)
    if (rho < 1e-15) return ico.faceCenters(fp.face)
    var alpha = math.atan2(fp.x, fp.y) // clockwise from +y
    while (alpha < 0) alpha += TwoPi
    val rot = math.floor(alpha / Deg120).toInt
    val azP = alpha - rot * Deg120
    // AG from eq 7 inverted: AG = rc² / (2 (cot Az' + cot θ)); Az'=0 → 0
    val ag =
      if (azP < 1e-15) 0.0
      else rc2 / (2.0 * (1.0 / math.tan(azP) + CotTheta))
    // solve Az: F(Az) = Az + G + H(Az) - π - AG = 0
    var az = azP
    var it = 0
    while (it < 50) {
      val sinAz = math.sin(az); val cosAz = math.cos(az)
      val cosH = sinAz * sinG36 * cosg - cosAz * cosG36
      val h = math.acos(math.max(-1.0, math.min(1.0, cosH)))
      val fv = az + G + h - math.Pi - ag
      val sinH = math.sin(h)
      val dH = if (sinH < 1e-14) 0.0
        else -(cosAz * sinG36 * cosg + sinAz * cosG36) / sinH
      val deriv = 1.0 + dH
      val step = if (math.abs(deriv) < 1e-14) fv else fv / deriv
      az -= step
      it += 1
      if (math.abs(step) < 1e-15) it = 50
    }
    val q = edgeDist(az)
    val dP = Rprime * tanG / (math.cos(azP) + math.sin(azP) * CotTheta)
    val fScale = dP / (2.0 * Rprime * math.sin(q / 2.0))
    val z = 2.0 * math.asin(math.max(-1.0, math.min(1.0, rho / (2.0 * Rprime * fScale))))
    val sphAz = ico.faceAz0(fp.face) + az + rot * Deg120
    destination(ico.faceCenters(fp.face), sphAz, z)
  }
}

object SnyderISEA {
  val G: Double = math.Pi / 5.0 // 36°: half the 72° spherical vertex angle
  val Theta: Double = math.Pi / 6.0 // 30°
  val CotTheta: Double = 1.0 / math.tan(Theta) // √3
  val Deg120: Double = 2.0 * math.Pi / 3.0
  val TwoPi: Double = 2.0 * math.Pi
}
