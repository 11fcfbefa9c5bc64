package graft.core

/** Pure spherical/planar geometry kernel (no Spark deps).
  *
  * Earth radius matches the reference exactly: 6371.01 km
  * (/root/reference/src/diagonal.works/b6/units/units.go:8).
  */
object Geo {
  final val EarthRadiusMeters = 6371.01 * 1000.0

  @inline def toXYZ(latDeg: Double, lngDeg: Double): Array[Double] = {
    val la = math.toRadians(latDeg); val lo = math.toRadians(lngDeg)
    val c = math.cos(la)
    Array(c * math.cos(lo), c * math.sin(lo), math.sin(la))
  }

  @inline def dot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)

  @inline def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))

  @inline def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  /** Robust angle between two unit vectors (radians). */
  def angleBetween(a: Array[Double], b: Array[Double]): Double =
    math.atan2(norm(cross(a, b)), dot(a, b))

  /** Great-circle distance in meters via the haversine formula — numerically
    * equivalent to angle*R and expressible identically in ANSI SQL (the
    * oracle side uses the same formula). */
  def haversineMeters(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1); val dl = math.toRadians(lng2 - lng1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2.0 * EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Initial great-circle bearing from point 1 to point 2, degrees in
    * (-180, 180] (the standard forward-azimuth formula; 0 = north,
    * 90 = east). Shared kernel for the trajectory leg enrichment and its
    * golden (float policy). */
  def initialBearingDeg(lat1: Double, lng1: Double,
                        lat2: Double, lng2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dl = math.toRadians(lng2 - lng1)
    val y = math.sin(dl) * math.cos(p2)
    val x = math.cos(p1) * math.sin(p2) -
      math.sin(p1) * math.cos(p2) * math.cos(dl)
    math.toDegrees(math.atan2(y, x))
  }

  /** Angular distance (radians) from unit vector x to the geodesic arc a-b.
    * Conservative-accurate; used by the coverer's intersection tests. */
  def distToArc(x: Array[Double], a: Array[Double], b: Array[Double]): Double = {
    val ab = cross(a, b)
    val ab2 = dot(ab, ab)
    if (ab2 < 1e-30) return math.min(angleBetween(x, a), angleBetween(x, b))
    // projection of x onto the plane of the great circle through a,b
    val s = dot(x, ab) / ab2
    val p = Array(x(0) - s * ab(0), x(1) - s * ab(1), x(2) - s * ab(2))
    val pn = norm(p)
    if (pn < 1e-15) return math.Pi / 2
    val pu = Array(p(0) / pn, p(1) / pn, p(2) / pn)
    // is the closest great-circle point within the arc? (angle sum test)
    val onArc = angleBetween(a, pu) + angleBetween(pu, b) <= angleBetween(a, b) + 1e-12
    if (onArc) angleBetween(x, pu)
    else math.min(angleBetween(x, a), angleBetween(x, b))
  }

  /** Closest point of the geodesic arc a-b to unit vector x, as a unit
    * vector — the point-returning companion of distToArc (same plane
    * projection + angle-sum arc test), the s2.Polyline.Project primitive
    * behind the reference's snap-area-edges
    * (api/functions/geometry.go:100-122). */
  def closestPointOnArc(x: Array[Double], a: Array[Double], b: Array[Double]): Array[Double] = {
    val ab = cross(a, b)
    val ab2 = dot(ab, ab)
    if (ab2 < 1e-30)
      return if (angleBetween(x, a) <= angleBetween(x, b)) a else b
    val s = dot(x, ab) / ab2
    val p = Array(x(0) - s * ab(0), x(1) - s * ab(1), x(2) - s * ab(2))
    val pn = norm(p)
    if (pn < 1e-15) return a
    val pu = Array(p(0) / pn, p(1) / pn, p(2) / pn)
    val onArc = angleBetween(a, pu) + angleBetween(pu, b) <= angleBetween(a, b) + 1e-12
    if (onArc) pu
    else if (angleBetween(x, a) <= angleBetween(x, b)) a else b
  }

  /** Unit vector -> (lat, lng) degrees. */
  @inline def toLatLng(v: Array[Double]): (Double, Double) =
    (math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, v(2))))),
      math.toDegrees(math.atan2(v(1), v(0))))

  /** Planar even-odd ray-cast point-in-polygon in (lng, lat) coordinates.
    * Vertices on the boundary are implementation-defined (as in every
    * ray-cast); synthetic fixtures avoid boundary coincidence. Suitable for
    * polygons that do not cross the antimeridian or enclose a pole. The
    * identical arithmetic is emitted as the DuckDB oracle predicate, so
    * engine and oracle agree bit-for-bit. */
  def containsPlanar(lat: Double, lng: Double,
                     ringLat: Array[Double], ringLng: Array[Double]): Boolean = {
    var inside = false
    val n = ringLat.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = ringLat(i); val xi = ringLng(i)
      val yj = ringLat(j); val xj = ringLng(j)
      if (((yi > lat) != (yj > lat)) &&
          (lng < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd containment for a polygon with holes (planar). */
  def containsPlanarRings(lat: Double, lng: Double,
                          rings: Array[(Array[Double], Array[Double])]): Boolean = {
    var crossingsOdd = false
    var r = 0
    while (r < rings.length) {
      if (containsPlanar(lat, lng, rings(r)._1, rings(r)._2)) crossingsOdd = !crossingsOdd
      r += 1
    }
    crossingsOdd
  }

  /** Spherical even-odd containment with great-circle edges, in the spirit
    * of s2.Polygon.ContainsPoint as used by the reference refine step
    * (/root/reference/src/diagonal.works/b6/api/functions/features.go:46-56).
    * Counts strict crossings of the arc from the query point to a fixed
    * exterior point. Generic-position data only (no exact boundary hits). */
  def containsSpherical(lat: Double, lng: Double,
                        ringLat: Array[Double], ringLng: Array[Double]): Boolean = {
    val x = toXYZ(lat, lng)
    // exterior reference: antipode of the ring's first vertex, nudged
    val v0 = toXYZ(ringLat(0) + 0.000123, ringLng(0) + 0.000456)
    val o = Array(-v0(0), -v0(1), -v0(2))
    var crossings = 0
    val n = ringLat.length
    var i = 0
    while (i < n) {
      val a = toXYZ(ringLat(i), ringLng(i))
      val b = toXYZ(ringLat((i + 1) % n), ringLng((i + 1) % n))
      if (arcsCross(x, o, a, b)) crossings += 1
      i += 1
    }
    (crossings & 1) == 1
  }

  private def sign(a: Array[Double], b: Array[Double], c: Array[Double]): Int = {
    val d = dot(cross(a, b), c)
    if (d > 0) 1 else if (d < 0) -1 else 0
  }

  /** True if great-circle arcs x-o and a-b strictly cross. */
  def arcsCross(x: Array[Double], o: Array[Double],
                a: Array[Double], b: Array[Double]): Boolean = {
    val s1 = sign(x, o, a); val s2 = sign(x, o, b)
    if (s1 == s2 || s1 == 0 || s2 == 0) return false
    val s3 = sign(a, b, x); val s4 = sign(a, b, o)
    s3 != s4 && s3 != 0 && s4 != 0 && {
      // both midpoint-side checks: the crossing point must lie on both arcs,
      // not their antipodal extensions — test via hemisphere of midpoints
      val m1 = Array(x(0) + o(0), x(1) + o(1), x(2) + o(2))
      val m2 = Array(a(0) + b(0), a(1) + b(1), a(2) + b(2))
      val d = cross(cross(x, o), cross(a, b)) // candidate intersection dir
      val dd = if (dot(d, m1) < 0) Array(-d(0), -d(1), -d(2)) else d
      dot(dd, m1) > 0 && dot(dd, m2) > 0
    }
  }

  /** Polyline length in meters. */
  def polylineLengthMeters(lat: Array[Double], lng: Array[Double]): Double = {
    var total = 0.0
    var i = 1
    while (i < lat.length) {
      total += haversineMeters(lat(i - 1), lng(i - 1), lat(i), lng(i))
      i += 1
    }
    total
  }

  /** Point at fraction f (0..1 by arc length) along a polyline: (lat, lng). */
  def interpolate(lat: Array[Double], lng: Array[Double], f: Double): (Double, Double) = {
    val total = polylineLengthMeters(lat, lng)
    if (total == 0 || lat.length == 1) return (lat(0), lng(0))
    var remaining = math.max(0.0, math.min(1.0, f)) * total
    var i = 1
    while (i < lat.length) {
      val seg = haversineMeters(lat(i - 1), lng(i - 1), lat(i), lng(i))
      if (remaining <= seg && seg > 0) {
        val t = remaining / seg
        return (lat(i - 1) + (lat(i) - lat(i - 1)) * t, lng(i - 1) + (lng(i) - lng(i - 1)) * t)
      }
      remaining -= seg
      i += 1
    }
    (lat(lat.length - 1), lng(lng.length - 1))
  }

  /** Centroid of a point set (planar average; reference uses convex-hull
    * centroid for areas — adequate for synthetic fixtures). */
  def centroid(lat: Array[Double], lng: Array[Double]): (Double, Double) = {
    var sy = 0.0; var sx = 0.0
    var i = 0
    while (i < lat.length) { sy += lat(i); sx += lng(i); i += 1 }
    (sy / lat.length, sx / lat.length)
  }

  /** Spherical polygon area in m^2 via L'Huilier/spherical excess
    * (Girard sum of exterior angles form). */
  def sphericalAreaM2(ringLat: Array[Double], ringLng: Array[Double]): Double = {
    // Drop consecutive DUPLICATE vertices first (including the wrap-around
    // pair): polygon clipping routinely emits a repeated vertex when a
    // subject point lies exactly on the clip boundary, and a zero-length
    // edge turns the interior angle at both neighbours into atan2(0,0) = 0,
    // corrupting the excess by ~pi each — two sliver tiles of the z8 zonal
    // raster measured literally HALF THE SPHERE before this guard (caught
    // by RasterizeSpec's mass-conservation property, round 3).
    val keptLat = new Array[Double](ringLat.length)
    val keptLng = new Array[Double](ringLat.length)
    var n = 0
    var k = 0
    while (k < ringLat.length) {
      if (n == 0 || ringLat(k) != keptLat(n - 1) || ringLng(k) != keptLng(n - 1)) {
        keptLat(n) = ringLat(k); keptLng(n) = ringLng(k); n += 1
      }
      k += 1
    }
    if (n > 1 && keptLat(n - 1) == keptLat(0) && keptLng(n - 1) == keptLng(0)) n -= 1
    if (n < 3) return 0.0
    // spherical excess via the sum of tangent-plane turn angles
    var total = 0.0
    var i = 0
    while (i < n) {
      val a = toXYZ(keptLat(i), keptLng(i))
      val b = toXYZ(keptLat((i + 1) % n), keptLng((i + 1) % n))
      val c = toXYZ(keptLat((i + 2) % n), keptLng((i + 2) % n))
      // interior angle at b
      val ba = cross(b, a); val bc = cross(b, c)
      val ang = math.atan2(dot(cross(ba, bc), b), dot(ba, bc))
      total += (if (ang < 0) ang + 2 * math.Pi else ang)
      i += 1
    }
    val excess = math.abs(total - (n - 2) * math.Pi)
    val raw = excess * EarthRadiusMeters * EarthRadiusMeters
    // orientation-independent: a CW ring measures the complementary area;
    // our polygons are always far smaller than a hemisphere, so take the
    // smaller of the two complements
    val sphere = 4.0 * math.Pi * EarthRadiusMeters * EarthRadiusMeters
    math.min(raw, sphere - raw)
  }

  /** Sutherland–Hodgman polygon clip in the (lng, lat) plane: clip the
    * subject ring by a CONVEX clip ring given in CCW order. Returns the
    * clipped ring (possibly empty). This is the analytically load-bearing
    * slice of the reference's Foster polygon booleans
    * (geometry/foster.go:21-27): intersection against convex windows —
    * tile rects, bounding boxes, cap polygons. General non-convex booleans
    * remain out of scope (documented in COVERAGE.md).
    * @return (lat[], lng[]) of the clipped ring. */
  def clipRing(subjLat: Array[Double], subjLng: Array[Double],
               clipLat: Array[Double], clipLng: Array[Double])
      : (Array[Double], Array[Double]) = {
    var curLat = subjLat
    var curLng = subjLng
    val m = clipLat.length
    var e = 0
    while (e < m && curLat.length > 0) {
      val aLat = clipLat(e); val aLng = clipLng(e)
      val bLat = clipLat((e + 1) % m); val bLng = clipLng((e + 1) % m)
      // inside = left of the directed edge a->b (clip ring CCW in lng/lat)
      def inside(pLat: Double, pLng: Double): Boolean =
        (bLng - aLng) * (pLat - aLat) - (bLat - aLat) * (pLng - aLng) >= 0
      def intersect(p1Lat: Double, p1Lng: Double, p2Lat: Double, p2Lng: Double)
          : (Double, Double) = {
        val dLat = p2Lat - p1Lat; val dLng = p2Lng - p1Lng
        val den = (bLng - aLng) * dLat - (bLat - aLat) * dLng
        val t = ((bLng - aLng) * (aLat - p1Lat) - (bLat - aLat) * (aLng - p1Lng)) / den
        (p1Lat + t * dLat, p1Lng + t * dLng)
      }
      val outLat = scala.collection.mutable.ArrayBuffer.empty[Double]
      val outLng = scala.collection.mutable.ArrayBuffer.empty[Double]
      val n = curLat.length
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val pIn = inside(curLat(i), curLng(i))
        val qIn = inside(curLat(j), curLng(j))
        if (pIn) { outLat += curLat(i); outLng += curLng(i) }
        if (pIn != qIn) {
          val (xLat, xLng) = intersect(curLat(i), curLng(i), curLat(j), curLng(j))
          outLat += xLat; outLng += xLng
        }
        i += 1
      }
      curLat = outLat.toArray
      curLng = outLng.toArray
      e += 1
    }
    (curLat, curLng)
  }

  /** Clip a ring to a lat/lng rectangle (convex window; CCW in lng/lat). */
  def clipRingToRect(lat: Array[Double], lng: Array[Double],
                     latLo: Double, latHi: Double, lngLo: Double, lngHi: Double)
      : (Array[Double], Array[Double]) =
    clipRing(lat, lng,
      Array(latLo, latLo, latHi, latHi), Array(lngLo, lngHi, lngHi, lngLo))

  /** Signed planar shoelace area of a ring in the (lng, lat) plane, deg²:
    * positive for counter-clockwise winding. Orientation test for rings away
    * from the poles (geojson-areas inversion check). */
  def shoelaceSigned(lat: Array[Double], lng: Array[Double]): Double = {
    val n = lat.length
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += lng(i) * lat(j) - lng(j) * lat(i)
      i += 1
    }
    s / 2.0
  }

  /** Douglas-Peucker polyline simplification in the (lng, lat) plane with a
    * degree tolerance — the reference's tile-rendering simplification shape
    * (renderer/simplify.go:13-38). Returns kept vertex indices (ascending,
    * always includes endpoints). */
  def simplify(lat: Array[Double], lng: Array[Double], tolDeg: Double): Array[Int] = {
    val n = lat.length
    if (n <= 2) return Array.tabulate(n)(identity)
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    def perpDist(i: Int, a: Int, b: Int): Double = {
      val dx = lng(b) - lng(a); val dy = lat(b) - lat(a)
      val len = math.sqrt(dx * dx + dy * dy)
      if (len < 1e-15) math.hypot(lng(i) - lng(a), lat(i) - lat(a))
      else math.abs(dx * (lat(a) - lat(i)) - dy * (lng(a) - lng(i))) / len
    }
    def rec(a: Int, b: Int): Unit = {
      if (b - a < 2) return
      var worst = -1.0; var wi = -1
      var i = a + 1
      while (i < b) {
        val d = perpDist(i, a, b)
        if (d > worst) { worst = d; wi = i }
        i += 1
      }
      if (worst > tolDeg) { keep(wi) = true; rec(a, wi); rec(wi, b) }
    }
    rec(0, n - 1)
    (0 until n).filter(keep).toArray
  }

  /** 2D convex hull (lng,lat plane) via Andrew's monotone chain; returns
    * hull vertex indices in CCW order. */
  def convexHull(lat: Array[Double], lng: Array[Double]): Array[Int] = {
    val n = lat.length
    if (n <= 2) return Array.tabulate(n)(identity)
    val idx = Array.tabulate(n)(identity).sortBy(i => (lng(i), lat(i)))
    def crossP(o: Int, a: Int, b: Int): Double =
      (lng(a) - lng(o)) * (lat(b) - lat(o)) - (lat(a) - lat(o)) * (lng(b) - lng(o))
    val hull = new Array[Int](2 * n)
    var k = 0
    for (i <- idx) {
      while (k >= 2 && crossP(hull(k - 2), hull(k - 1), i) <= 0) k -= 1
      hull(k) = i; k += 1
    }
    val lower = k + 1
    for (ii <- (n - 2) to 0 by -1) {
      val i = idx(ii)
      while (k >= lower && crossP(hull(k - 2), hull(k - 1), i) <= 0) k -= 1
      hull(k) = i; k += 1
    }
    hull.take(k - 1)
  }
}
