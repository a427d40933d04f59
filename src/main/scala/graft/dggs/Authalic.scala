package graft.dggs

/** Geodetic (WGS84) ↔ authalic-sphere latitude conversion (reference
  * auxlat.py:6-37, which delegates to pygeodesy's auxAuthalic). Closed
  * 6-term trigonometric series in the flattening (public formulas, e.g.
  * Karney 2023 "On auxiliary latitudes" table coefficients truncated at
  * n^3 for ~1e-12 rad accuracy on WGS84).
  */
object Authalic {

  // WGS84
  private val f = 1.0 / 298.257223563
  private val n = f / (2.0 - f) // third flattening

  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n2 * n2

  // authalic ξ from geodetic φ: ξ = φ + Σ c_k sin(2kφ); coefficients to
  // n^4 validated against the exact q-function formulation (5e-13 deg)
  private val toAuthalicC: Array[Double] = Array(
    -4.0 / 3.0 * n - 4.0 / 45.0 * n2 + 88.0 / 315.0 * n3 + 538.0 / 4725.0 * n4,
    34.0 / 45.0 * n2 + 8.0 / 105.0 * n3 - 2482.0 / 14175.0 * n4,
    -1532.0 / 2835.0 * n3 - 898.0 / 14175.0 * n4,
    6007.0 / 14175.0 * n4)

  // geodetic φ from authalic ξ: φ = ξ + Σ d_k sin(2kξ)
  private val toGeodeticC: Array[Double] = Array(
    4.0 / 3.0 * n + 4.0 / 45.0 * n2 - 16.0 / 35.0 * n3 - 2582.0 / 14175.0 * n4,
    46.0 / 45.0 * n2 + 152.0 / 945.0 * n3 - 11966.0 / 14175.0 * n4,
    3044.0 / 2835.0 * n3 + 3802.0 / 14175.0 * n4,
    6059.0 / 4725.0 * n4)

  private def series(latRad: Double, c: Array[Double]): Double = {
    var out = latRad
    var k = 0
    while (k < c.length) {
      out += c(k) * math.sin(2.0 * (k + 1) * latRad)
      k += 1
    }
    out
  }

  /** geodetic latitude (deg) → authalic latitude (deg) */
  def toAuthalicDeg(latDeg: Double): Double =
    math.toDegrees(series(math.toRadians(latDeg), toAuthalicC))

  /** authalic latitude (deg) → geodetic latitude (deg) */
  def toGeodeticDeg(latDeg: Double): Double =
    math.toDegrees(series(math.toRadians(latDeg), toGeodeticC))
}
