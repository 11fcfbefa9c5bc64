package graft

import graft.core.{Geo, PolyBool}
import org.scalatest.funsuite.AnyFunSuite

/** Greiner-Hormann polygon booleans: hand-computed vectors, the
  * Sutherland-Hodgman convex cross-check (an INDEPENDENT clipping
  * algorithm), and area-additivity sweeps over the region fixtures. */
class PolyBoolSpec extends AnyFunSuite {

  private def rect(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double) =
    (Array(latLo, latLo, latHi, latHi), Array(lngLo, lngHi, lngHi, lngLo))

  private def areaOf(lat: Array[Double], lng: Array[Double]): Double =
    math.abs(PolyBool.signedArea(lat, lng))

  test("overlapping rectangles: intersection/union/difference areas exact") {
    val (aLat, aLng) = rect(0, 2, 0, 3)   // area 6
    val (bLat, bLng) = rect(1, 4, 1, 5)   // area 12, overlap = [1,2]x[1,3] = 2
    val inter = PolyBool.intersection(aLat, aLng, bLat, bLng)
    assert(inter.length == 1)
    assert(math.abs(PolyBool.totalArea(inter) - 2.0) < 1e-12)
    val uni = PolyBool.union(aLat, aLng, bLat, bLng)
    assert(math.abs(PolyBool.totalArea(uni) - (6 + 12 - 2)) < 1e-12)
    val diff = PolyBool.difference(aLat, aLng, bLat, bLng)
    assert(math.abs(PolyBool.totalArea(diff) - (6 - 2)) < 1e-12)
  }

  test("disjoint / containment cases") {
    val (aLat, aLng) = rect(0, 1, 0, 1)
    val (bLat, bLng) = rect(5, 6, 5, 6)
    assert(PolyBool.intersection(aLat, aLng, bLat, bLng).isEmpty)
    assert(math.abs(PolyBool.totalArea(PolyBool.union(aLat, aLng, bLat, bLng)) - 2.0) < 1e-12)
    assert(math.abs(PolyBool.totalArea(PolyBool.difference(aLat, aLng, bLat, bLng)) - 1.0) < 1e-12)
    // b inside a
    val (oLat, oLng) = rect(0, 10, 0, 10)   // 100
    val (iLat, iLng) = rect(2, 4, 2, 4)     // 4
    assert(math.abs(PolyBool.totalArea(PolyBool.intersection(oLat, oLng, iLat, iLng)) - 4.0) < 1e-12)
    assert(math.abs(PolyBool.totalArea(PolyBool.union(oLat, oLng, iLat, iLng)) - 100.0) < 1e-12)
    // difference keeps the outer ring + a CW hole: signed areas add to 96
    val d = PolyBool.difference(oLat, oLng, iLat, iLng)
    assert(d.length == 2)
    assert(math.abs(PolyBool.totalArea(d) - 96.0) < 1e-12)
    // a inside b -> difference empty
    assert(PolyBool.difference(iLat, iLng, oLat, oLng).isEmpty)
  }

  test("plus-shape: crossing bars produce multi-ring difference") {
    val (hLat, hLng) = rect(4, 6, 0, 10)   // horizontal bar, area 20
    val (vLat, vLng) = rect(0, 10, 4, 6)   // vertical bar, area 20
    val inter = PolyBool.intersection(hLat, hLng, vLat, vLng)
    assert(inter.length == 1)
    assert(math.abs(PolyBool.totalArea(inter) - 4.0) < 1e-12) // center 2x2
    val uni = PolyBool.union(hLat, hLng, vLat, vLng)
    assert(math.abs(PolyBool.totalArea(uni) - 36.0) < 1e-12)
    val diff = PolyBool.difference(hLat, hLng, vLat, vLng)
    assert(diff.length == 2, s"left+right pieces, got ${diff.length}")
    assert(math.abs(PolyBool.totalArea(diff) - 16.0) < 1e-12)
  }

  test("non-convex subject: L-shape against a square") {
    // L = [0,3]x[0,3] minus the quadrant (lat>1 AND lng<2) => area 9-4=5
    val lLat = Array(0.0, 0.0, 3.0, 3.0, 1.0, 1.0)
    val lLng = Array(0.0, 3.0, 3.0, 2.0, 2.0, 0.0)
    assert(math.abs(areaOf(lLat, lLng) - 5.0) < 1e-12)
    // clip square overlapping the notch corner
    val (cLat, cLng) = rect(0.5, 2.5, 0.5, 2.5)   // area 4
    // L ∩ C = C minus lat(1,2.5)xlng(0.5,2) = 4 - 1.5*1.5 = 1.75
    val inter = PolyBool.intersection(lLat, lLng, cLat, cLng)
    assert(math.abs(PolyBool.totalArea(inter) - 1.75) < 1e-12)
    val uni = PolyBool.union(lLat, lLng, cLat, cLng)
    assert(math.abs(PolyBool.totalArea(uni) - (5.0 + 4.0 - 1.75)) < 1e-12)
    val diff = PolyBool.difference(lLat, lLng, cLat, cLng)
    assert(math.abs(PolyBool.totalArea(diff) - (5.0 - 1.75)) < 1e-12)
  }

  test("convex cross-check: GH intersection equals Sutherland-Hodgman clip") {
    // irregular convex clip hexagon vs an irregular convex subject pentagon
    val subLat = Array(0.0, -1.0, 0.5, 2.5, 2.0)
    val subLng = Array(0.0, 2.0, 4.0, 3.0, 0.5)
    val clpLat = Array(-0.5, 0.0, 1.5, 2.8, 2.0, 0.2)
    val clpLng = Array(1.5, 3.5, 4.2, 2.0, 0.2, 0.0)
    val gh = PolyBool.totalArea(PolyBool.intersection(subLat, subLng, clpLat, clpLng))
    val (shLat, shLng) = Geo.clipRing(subLat, subLng, clpLat, clpLng)
    val sh = areaOf(shLat, shLng)
    assert(math.abs(gh - sh) < 1e-10, s"GH $gh vs SH $sh")
    assert(gh > 0.1)
  }

  test("random convex pairs: GH equals Sutherland-Hodgman across 60 seeds") {
    import graft.core.Hashes
    // deterministic convex ring: convex hull of 12 seeded random points
    def convexRing(seed: Long): (Array[Double], Array[Double]) = {
      def u(i: Long) = (Hashes.splitmix64(seed * 1000 + i) >>> 11).toDouble / (1L << 53).toDouble
      val lat = Array.tabulate(12)(i => u(i * 2) * 4.0)
      val lng = Array.tabulate(12)(i => u(i * 2 + 1) * 4.0)
      val idx = Geo.convexHull(lat, lng)
      (idx.map(lat(_)), idx.map(lng(_)))
    }
    var checked = 0
    (0 until 60).foreach { s =>
      val (aLat, aLng) = convexRing(s * 2 + 1)
      // shift the second ring so overlap is frequent but not guaranteed
      val (bLat0, bLng0) = convexRing(s * 2 + 2)
      val bLat = bLat0.map(_ + 1.0); val bLng = bLng0.map(_ + 1.0)
      if (aLat.length >= 3 && bLat.length >= 3) {
        val gh = PolyBool.totalArea(PolyBool.intersection(aLat, aLng, bLat, bLng))
        val (sLat, sLng) = Geo.clipRing(aLat, aLng, bLat, bLng)
        val sh = if (sLat.length >= 3) areaOf(sLat, sLng) else 0.0
        assert(math.abs(gh - sh) < 1e-9 * math.max(1.0, sh),
          s"seed $s: GH $gh vs SH $sh")
        if (gh > 0) checked += 1
        // additivity on the same pair
        val aA = areaOf(aLat, aLng); val aB = areaOf(bLat, bLng)
        val uni = PolyBool.totalArea(PolyBool.union(aLat, aLng, bLat, bLng))
        val dif = PolyBool.totalArea(PolyBool.difference(aLat, aLng, bLat, bLng))
        val tol = 1e-9 * math.max(1.0, aA + aB)
        assert(math.abs(gh + dif - aA) < tol, s"seed $s: inter+diff != areaA")
        assert(math.abs(uni - (aA + aB - gh)) < tol, s"seed $s: union identity")
      }
    }
    assert(checked >= 20, s"sweep must exercise real overlaps, got $checked")
  }

  test("fixture sweep: additivity holds for every overlapping region pair") {
    val rs = graft.model.Synth.regions
    var overlapping = 0
    for (i <- rs.indices; j <- rs.indices if i < j) {
      val (aLat, aLng) = rs(i).rings(0)
      val (bLat, bLng) = rs(j).rings(0)
      val inter = PolyBool.totalArea(PolyBool.intersection(aLat, aLng, bLat, bLng))
      if (inter > 0) {
        overlapping += 1
        val aA = areaOf(aLat, aLng); val aB = areaOf(bLat, bLng)
        val uni = PolyBool.totalArea(PolyBool.union(aLat, aLng, bLat, bLng))
        val dif = PolyBool.totalArea(PolyBool.difference(aLat, aLng, bLat, bLng))
        val tol = 1e-9 * math.max(1.0, aA + aB)
        assert(math.abs(inter + dif - aA) < tol,
          s"pair ($i,$j): inter+diff=${inter + dif} != areaA=$aA")
        assert(math.abs(uni - (aA + aB - inter)) < tol,
          s"pair ($i,$j): union=$uni != ${aA + aB - inter}")
        assert(inter <= math.min(aA, aB) + tol && uni >= math.max(aA, aB) - tol)
      }
    }
    assert(overlapping > 0, "fixture must contain overlapping region pairs")
  }

  test("large polygons stay in scope: 16000-vertex circle pair (guard is input-sized)") {
    // Regression for the review-r03 traversal guard: the old fixed 10000-step
    // cap rejected legitimately large inputs. Two 16000-vertex circles offset
    // by d=0.8 emit a ~11.8k-vertex lens in ONE traversal run — over the old
    // cap; the input-sized bound must accept it and the lens area must match
    // the analytic circle-overlap formula.
    val n = 16000; val r = 1.0; val d = 0.8
    def circle(cx: Double): (Array[Double], Array[Double]) = {
      val lat = new Array[Double](n); val lng = new Array[Double](n)
      var i = 0
      while (i < n) {
        val t = 2.0 * math.Pi * i / n
        lat(i) = r * math.sin(t); lng(i) = cx + r * math.cos(t); i += 1
      }
      (lat, lng)
    }
    val (aLat, aLng) = circle(0.0)
    val (bLat, bLng) = circle(d)
    val inter = PolyBool.intersection(aLat, aLng, bLat, bLng)
    val got = PolyBool.totalArea(inter)
    val lens = 2.0 * r * r * math.acos(d / (2 * r)) -
      (d / 2.0) * math.sqrt(4 * r * r - d * d)
    assert(inter.map(_.lat.length).sum > 10000,
      "fixture must exceed the old fixed step cap to exercise the new bound")
    assert(math.abs(got - lens) < 1e-4 * lens, s"lens area $got vs analytic $lens")
    val uni = PolyBool.totalArea(PolyBool.union(aLat, aLng, bLat, bLng))
    val circleArea = math.abs(PolyBool.signedArea(aLat, aLng))
    assert(math.abs(uni - (2 * circleArea - got)) < 1e-9 * uni)
  }

  // ---- holes (round 4, VERDICT r03 #5): inclusion-exclusion areas ----

  private def hrect(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double)
      : (Array[Double], Array[Double]) =
    (Array(latLo, latLo, latHi, latHi), Array(lngLo, lngHi, lngHi, lngLo))

  test("holes: courtyard straddling the overlap — hand-computed areas") {
    // the q_poly_bool courtyard fixture verified against INDEPENDENT hand
    // arithmetic (axis-aligned products), not the kernel:
    //   As = [10.00,10.20]^2  hole Ah = [10.08,10.14]^2
    //   Bs = [10.10,10.30]^2  hole Bh = [10.22,10.26]^2
    //   inter = |AsnBs| - |AsnBh| - |AhnBs| + |AhnBh|
    //         = 0.10^2 - 0 - 0.04^2 + 0 = 0.0084
    val a = Seq(hrect(10.00, 10.20, 10.00, 10.20), hrect(10.08, 10.14, 10.08, 10.14))
    val b = Seq(hrect(10.10, 10.30, 10.10, 10.30), hrect(10.22, 10.26, 10.22, 10.26))
    val (areaA, areaB, inter, uni, diff) = PolyBool.areasWithHoles(a, b)
    assert(math.abs(areaA - (0.04 - 0.0036)) < 1e-12)
    assert(math.abs(areaB - (0.04 - 0.0016)) < 1e-12)
    assert(math.abs(inter - 0.0084) < 1e-12)
    assert(math.abs(uni - (areaA + areaB - inter)) < 1e-15)
    assert(math.abs(diff - (areaA - inter)) < 1e-15)
  }

  test("holes: hole-on-hole overlap exercises the +term") {
    // general position: B's lat span strictly inside A's (no collinear
    // shared edge lines — the documented GH restriction)
    //   As = lat[0,10]xlng[0,10] hole Ah = lat[2,6]xlng[2,6]
    //   Bs = lat[1,9]xlng[4,14]  hole Bh = lat[3,7]xlng[5,8]
    //   AsnBs = lat[1,9]xlng[4,10] = 48 ; AsnBh = 12 (Bh inside As)
    //   AhnBs = lat[2,6]xlng[4,6] = 8 ; AhnBh = lat[3,6]xlng[5,6] = 3
    //   inter = 48 - 12 - 8 + 3 = 31
    val a = Seq(hrect(0, 10, 0, 10), hrect(2, 6, 2, 6))
    val b = Seq(hrect(1, 9, 4, 14), hrect(3, 7, 5, 8))
    val (areaA, areaB, inter, uni, diff) = PolyBool.areasWithHoles(a, b)
    assert(math.abs(areaA - (100 - 16)) < 1e-12)
    assert(math.abs(areaB - (80 - 12)) < 1e-12)
    assert(math.abs(inter - 31.0) < 1e-12)
    assert(math.abs(uni - (84 + 68 - 31)) < 1e-12)
    assert(math.abs(diff - (84 - 31)) < 1e-12)
  }

  test("holes: overlap entirely inside a hole -> zero intersection") {
    // B overlaps A only where A has its courtyard: measure must vanish
    val a = Seq(hrect(0, 10, 0, 10), hrect(3, 7, 3, 7))
    val b = Seq(hrect(4, 6, 4, 6))
    val (_, _, inter, _, _) = PolyBool.areasWithHoles(a, b)
    assert(math.abs(inter) < 1e-12, s"expected 0, got $inter")
  }

  test("holes: no-hole inputs reduce to the shell kernel exactly") {
    val a = Seq(hrect(0, 2, 0, 3))
    val b = Seq(hrect(1, 3, 1, 5))
    val (areaA, areaB, inter, uni, diff) = PolyBool.areasWithHoles(a, b)
    val shell = PolyBool.totalArea(PolyBool.intersection(a.head._1, a.head._2,
      b.head._1, b.head._2))
    assert(inter === shell)
    assert(math.abs(areaA - 6.0) < 1e-12 && math.abs(areaB - 8.0) < 1e-12)
    assert(math.abs(uni - (6 + 8 - inter)) < 1e-15)
    assert(math.abs(diff - (6 - inter)) < 1e-15)
  }
}
