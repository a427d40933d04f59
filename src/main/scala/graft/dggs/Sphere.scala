package graft.dggs

/** Spherical trigonometry on the unit/authalic sphere. All angles in
  * radians internally; lat/lon degrees at the API edge.
  *
  * Azimuth convention: measured at a point from true north, clockwise
  * positive toward east (standard geodesic convention), in (-π, π].
  */
object Sphere {

  val EarthRadiusKm: Double = 6371.00718091847 // authalic sphere, as in DGGRID's OUTPUT_STATS

  @inline def toRad(d: Double): Double = d * (math.Pi / 180.0)
  @inline def toDeg(r: Double): Double = r * (180.0 / math.Pi)

  /** A point on the sphere, radians. */
  final case class GeoRad(lat: Double, lon: Double) {
    def latDeg: Double = toDeg(lat)
    def lonDeg: Double = toDeg(lon)
  }
  object GeoRad {
    def fromDeg(latDeg: Double, lonDeg: Double): GeoRad =
      GeoRad(toRad(latDeg), toRad(lonDeg))
  }

  /** 3D unit vector. */
  final case class Vec3(x: Double, y: Double, z: Double) {
    def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
    def cross(o: Vec3): Vec3 =
      Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
    def norm: Double = math.sqrt(this.dot(this))
    def normalized: Vec3 = { val n = norm; Vec3(x / n, y / n, z / n) }
    def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
    def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
    def *(s: Double): Vec3 = Vec3(x * s, y * s, z * s)
  }

  def toVec(p: GeoRad): Vec3 = {
    val cl = math.cos(p.lat)
    Vec3(cl * math.cos(p.lon), cl * math.sin(p.lon), math.sin(p.lat))
  }

  def toGeo(v: Vec3): GeoRad = {
    val u = v.normalized
    GeoRad(math.asin(math.max(-1.0, math.min(1.0, u.z))), math.atan2(u.y, u.x))
  }

  /** Great-circle central angle between two points (numerically stable
    * atan2 form — accurate for both tiny and near-antipodal distances).
    */
  def distance(a: GeoRad, b: GeoRad): Double = {
    val va = toVec(a); val vb = toVec(b)
    math.atan2(va.cross(vb).norm, va.dot(vb))
  }

  /** Initial azimuth (bearing) from `a` to `b`, clockwise from north,
    * in (-π, π].
    */
  def azimuth(a: GeoRad, b: GeoRad): Double = {
    val dLon = b.lon - a.lon
    val y = math.cos(b.lat) * math.sin(dLon)
    val x = math.cos(a.lat) * math.sin(b.lat) -
      math.sin(a.lat) * math.cos(b.lat) * math.cos(dLon)
    math.atan2(y, x)
  }

  /** Direct problem: from `a`, travel central angle `dist` along initial
    * azimuth `az` (clockwise from north).
    */
  def destination(a: GeoRad, az: Double, dist: Double): GeoRad = {
    val sinLat = math.sin(a.lat) * math.cos(dist) +
      math.cos(a.lat) * math.sin(dist) * math.cos(az)
    val lat = math.asin(math.max(-1.0, math.min(1.0, sinLat)))
    val y = math.sin(az) * math.sin(dist) * math.cos(a.lat)
    val x = math.cos(dist) - math.sin(a.lat) * sinLat
    val lon = a.lon + math.atan2(y, x)
    GeoRad(lat, normalizeLon(lon))
  }

  def normalizeLon(lon: Double): Double = {
    var l = lon
    while (l > math.Pi) l -= 2 * math.Pi
    while (l <= -math.Pi) l += 2 * math.Pi
    l
  }
}
