package graft.ops

import graft.core.{Geo, S2}

/** A point-containment probe usable from the native codegen expression
  * (`ContainmentProbeExpr`): cell + exact coordinates -> region ordinals.
  * Implementations ship to executors via the expression's reference array. */
trait PointProbe extends Serializable {
  def probe(cell: Long, lat: Double, lng: Double): Array[Int]
  def regionIds: Array[String]
}

/** Serializable, allocation-free containment probe index: the b6 per-point
  * index probe (api/functions/features.go:96-113) as flat primitive arrays.
  *
  * Layout: covering cells sorted in `cells`; `offsets(i)..offsets(i+1)` in
  * `cands` are the region ordinals whose covering contains `cells(i)`.
  * Probing does |levels| binary searches and exact ray-casts — zero boxing,
  * zero allocation on the (overwhelmingly common) no-match path. Ships to
  * executors inside the expression's reference array. */
final class ProbeIndex(regions: Array[graft.model.Synth.Region])
    extends PointProbe {

  val levels: Array[Int] = regions.flatMap(_.cells.map(S2.level)).distinct.sorted
  val regionIds: Array[String] = regions.map(_.regionId)

  private val (cells, offsets, cands): (Array[Long], Array[Int], Array[Int]) = {
    val byCell = scala.collection.mutable.TreeMap.empty[Long, List[Int]]
    regions.zipWithIndex.foreach { case (r, i) =>
      r.cells.foreach(c => byCell(c) = i :: byCell.getOrElse(c, Nil))
    }
    val cs = byCell.keys.toArray
    val off = new Array[Int](cs.length + 1)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < cs.length) {
      off(i) = buf.length
      byCell(cs(i)).reverse.foreach(buf += _)
      i += 1
    }
    off(cs.length) = buf.length
    (cs, off, buf.toArray)
  }

  private val ringsLat: Array[Array[Array[Double]]] = regions.map(_.rings.map(_._1))
  private val ringsLng: Array[Array[Array[Double]]] = regions.map(_.rings.map(_._2))

  private val EmptyInts = Array.empty[Int]

  def contains(ri: Int, lat: Double, lng: Double): Boolean = {
    var odd = false
    val rl = ringsLat(ri); val rg = ringsLng(ri)
    var k = 0
    while (k < rl.length) {
      if (Geo.containsPlanar(lat, lng, rl(k), rg(k))) odd = !odd
      k += 1
    }
    odd
  }

  /** Region ordinals containing the point; EmptyInts when none. */
  def probe(cell16: Long, lat: Double, lng: Double): Array[Int] = {
    var n = 0
    var first = -1
    var li = 0
    while (li < levels.length) {
      val p = S2.parent(cell16, levels(li))
      val idx = java.util.Arrays.binarySearch(cells, p)
      if (idx >= 0) {
        var c = offsets(idx)
        while (c < offsets(idx + 1)) {
          val ri = cands(c)
          if (contains(ri, lat, lng)) { n += 1; if (first < 0) first = ri }
          c += 1
        }
      }
      li += 1
    }
    if (n == 0) EmptyInts
    else if (n == 1) Array(first)
    else {
      val out = new Array[Int](n)
      var w = 0
      li = 0
      while (li < levels.length) {
        val p = S2.parent(cell16, levels(li))
        val idx = java.util.Arrays.binarySearch(cells, p)
        if (idx >= 0) {
          var c = offsets(idx)
          while (c < offsets(idx + 1)) {
            val ri = cands(c)
            if (contains(ri, lat, lng)) { out(w) = ri; w += 1 }
            c += 1
          }
        }
        li += 1
      }
      out
    }
  }
}

/** The Hex7 twin of `ProbeIndex`: per-region size-adaptive hex coverings
  * (coarsest resolution whose estimated covering stays under ~400 cells,
  * same rule as the UDF path it replaces), flat sorted-array layout, probe =
  * |resolutions| binary searches + exact ray-casts. Hex7 ids encode their
  * resolution, so a region is only ever discovered at its own covering
  * resolution — no cross-resolution dedup needed. */
final class Hex7ProbeIndex(regions: Array[graft.model.Synth.Region], imageRes: Int)
    extends PointProbe {
  import graft.core.Hex7

  private def resFor(r: graft.model.Synth.Region): Int = {
    val lats = r.rings(0)._1; val lngs = r.rings(0)._2
    val extDeg = math.max(lats.max - lats.min,
      (lngs.max - lngs.min) * math.cos(math.toRadians(lats.head)))
    var res = imageRes
    while (res > 1 &&
      math.pow(extDeg / math.toDegrees(Hex7.edgeLen(res)), 2) > 400) res -= 1
    res
  }

  val regionIds: Array[String] = regions.map(_.regionId)
  // one resolution derivation per region, shared by the level set and the
  // covering build (review r03e: resFor re-scans ring extents)
  private val regionRes: Array[Int] = regions.map(resFor)
  val resolutions: Array[Int] = regionRes.distinct.sorted

  private val (cells, offsets, cands): (Array[Long], Array[Int], Array[Int]) = {
    val byCell = scala.collection.mutable.TreeMap.empty[Long, List[Int]]
    regions.zipWithIndex.foreach { case (r, i) =>
      Hex7.polygonCovering(r.rings(0)._1, r.rings(0)._2, regionRes(i))
        .foreach(c => byCell(c) = i :: byCell.getOrElse(c, Nil))
    }
    val cs = byCell.keys.toArray
    val off = new Array[Int](cs.length + 1)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < cs.length) {
      off(i) = buf.length
      byCell(cs(i)).reverse.foreach(buf += _)
      i += 1
    }
    off(cs.length) = buf.length
    (cs, off, buf.toArray)
  }

  private val ringsLat: Array[Array[Array[Double]]] = regions.map(_.rings.map(_._1))
  private val ringsLng: Array[Array[Array[Double]]] = regions.map(_.rings.map(_._2))
  private val EmptyInts = Array.empty[Int]

  private def contains(ri: Int, lat: Double, lng: Double): Boolean = {
    var odd = false
    val rl = ringsLat(ri); val rg = ringsLng(ri)
    var k = 0
    while (k < rl.length) {
      if (Geo.containsPlanar(lat, lng, rl(k), rg(k))) odd = !odd
      k += 1
    }
    odd
  }

  def probe(hex: Long, lat: Double, lng: Double): Array[Int] = {
    var out: List[Int] = Nil
    var ri = 0
    while (ri < resolutions.length) {
      val idx = java.util.Arrays.binarySearch(cells, Hex7.parent(hex, resolutions(ri)))
      if (idx >= 0) {
        var c = offsets(idx)
        while (c < offsets(idx + 1)) {
          val reg = cands(c)
          if (contains(reg, lat, lng) && !out.contains(reg)) out = reg :: out
          c += 1
        }
      }
      ri += 1
    }
    if (out.isEmpty) EmptyInts else out.toArray
  }
}

object ProbeIndex {
  /** Packed tile chain (shared by the native expression): TileIDs from zMax
    * down to zMin for a point. */
  def tileChain(lat: Double, lng: Double, zMin: Int, zMax: Int): Array[Long] = {
    var (x, y) = graft.core.Tiles.tileFromLatLng(lat, lng, zMax)
    val out = new Array[Long](zMax - zMin + 1)
    var z = zMax
    while (z >= zMin) {
      out(zMax - z) = graft.core.Tiles.tileId(x, y, z)
      x /= 2; y /= 2; z -= 1
    }
    out
  }
}
