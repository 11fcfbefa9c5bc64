package graft.core

/** Geohash base-32 encoding (the public spec, G. Niemeyer 2008): interleaved
  * lng/lat interval halving, 5 bits per character — the third public
  * spatial index next to S2 and the Hex7 hierarchy (string-prefix
  * containment instead of bit-prefix containment, so it composes with plain
  * SUBSTRING/LIKE pruning on any SQL engine).
  *
  * Determinism: every interval bound is of the form -180 + m·360/2^k
  * (resp. -90 + m·180/2^k) with small k — exactly representable doubles —
  * so the midpoints (lo+hi)/2 are exact and the >= comparisons are
  * bit-stable. The golden (graft.oracle.Golden.geohashG) recomputes with an
  * independent two-track bit construction over the same exact midpoints. */
object Geohash {
  val Base32: String = "0123456789bcdefghjkmnpqrstuvwxyz"

  def encode(lat: Double, lng: Double, precision: Int): String = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision $precision outside [1, 12]")
    val sb = new java.lang.StringBuilder(precision)
    var latLo = -90.0; var latHi = 90.0
    var lngLo = -180.0; var lngHi = 180.0
    var even = true; var ch = 0; var bits = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lngLo + lngHi) / 2
        if (lng >= mid) { ch = (ch << 1) | 1; lngLo = mid }
        else { ch = ch << 1; lngHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bits += 1
      if (bits == 5) { sb.append(Base32.charAt(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Bounding box of a geohash cell: (latLo, latHi, lngLo, lngHi) — the
    * decode side (prefix pruning needs the box, not a point). */
  def bounds(gh: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lngLo = -180.0; var lngHi = 180.0
    var even = true
    gh.foreach { c =>
      val v = Base32.indexOf(c.toLower)
      require(v >= 0, s"invalid geohash char '$c'")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (even) {
          val mid = (lngLo + lngHi) / 2
          if (bit == 1) lngLo = mid else lngHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
    }
    (latLo, latHi, lngLo, lngHi)
  }
}
