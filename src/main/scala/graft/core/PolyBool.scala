package graft.core

/** General (non-convex) polygon booleans — intersection, union, difference —
  * via the Greiner-Hormann clipping algorithm (Greiner & Hormann, "Efficient
  * clipping of arbitrary polygons", ACM TOG 17(2), 1998 — public algorithm).
  * This covers the role of the reference's Foster polygon booleans
  * (/root/reference/src/diagonal.works/b6/geometry/foster.go) for the shapes
  * the target engine processes.
  *
  * Geometry model: the planar lat/lng chart, consistent with the engine's
  * ray-cast containment (Geo.containsPlanar) and the DuckDB oracle
  * arithmetic — suitable for polygons away from the poles/antimeridian,
  * which is the documented domain of the planar kernels throughout.
  *
  * Scope (documented):
  *   - simple (non-self-intersecting) SHELL rings without holes as inputs;
  *   - general position: shared vertices / collinear overlapping edges are
  *     not handled (the classic GH restriction) — the deterministic
  *     fixtures avoid them;
  *   - a difference that fully encloses the clip emits the clip ring
  *     REVERSED (clockwise) as a hole ring: signed shoelace areas then add
  *     up correctly (CCW positive, CW negative).
  *
  * Output rings are CCW for outer boundaries, CW for holes; callers sum
  * signed areas.
  */
object PolyBool {

  /** One output ring. */
  final case class Ring(lat: Array[Double], lng: Array[Double])

  /** Signed planar area of a ring in the (lng, lat) plane: CCW positive
    * (Geo.shoelaceSigned already includes the 1/2 factor). */
  def signedArea(lat: Array[Double], lng: Array[Double]): Double =
    Geo.shoelaceSigned(lat, lng)

  private final class Node(
      val x: Double, val y: Double, // x = lng, y = lat
      val isIntersection: Boolean,
      val alpha: Double) {
    var next: Node = null
    var prev: Node = null
    var neighbor: Node = null
    var entry: Boolean = false
    var visited: Boolean = false
  }

  /** Build a circular doubly-linked list from a CCW ring. */
  private def buildList(lat: Array[Double], lng: Array[Double]): Node = {
    val nodes = lat.indices.map(i => new Node(lng(i), lat(i), false, 0.0))
    val n = nodes.length
    var i = 0
    while (i < n) {
      nodes(i).next = nodes((i + 1) % n)
      nodes(i).prev = nodes((i + n - 1) % n)
      i += 1
    }
    nodes(0)
  }

  private def ccw(lat: Array[Double], lng: Array[Double]): (Array[Double], Array[Double]) =
    if (Geo.shoelaceSigned(lat, lng) < 0) (lat.reverse, lng.reverse) else (lat, lng)

  private def verticesOf(head: Node): Seq[Node] = {
    val out = Seq.newBuilder[Node]
    var cur = head
    do { out += cur; cur = cur.next } while (cur ne head)
    out.result()
  }

  /** Insert an intersection node into the edge starting at `from`, keeping
    * intersections on one edge ordered by alpha. */
  private def insertAfter(from: Node, node: Node): Unit = {
    var cur = from
    while (cur.next.isIntersection && cur.next.alpha < node.alpha) cur = cur.next
    node.next = cur.next
    node.prev = cur
    cur.next.prev = node
    cur.next = node
  }

  private def pointInRing(x: Double, y: Double, head: Node): Boolean = {
    val vs = verticesOf(head).filter(!_.isIntersection)
    Geo.containsPlanar(y, x, vs.map(_.y).toArray, vs.map(_.x).toArray)
  }

  /** Core GH run. invS/invC flip the entry/exit marks: (false,false) =
    * intersection, (true,true) = union, (true,false) = S minus C —
    * inverting the SUBJECT's marks yields subject-minus-clip (the polarity
    * `difference` below verifies against the hand vectors). */
  private def run(sLat0: Array[Double], sLng0: Array[Double],
                  cLat0: Array[Double], cLng0: Array[Double],
                  invS: Boolean, invC: Boolean,
                  mode: Int): Seq[Ring] = {
    val (sLat, sLng) = ccw(sLat0, sLng0)
    val (cLat, cLng) = ccw(cLat0, cLng0)
    val sHead = buildList(sLat, sLng)
    val cHead = buildList(cLat, cLng)

    // phase 1: find + insert all intersections
    var found = false
    val sOrig = verticesOf(sHead).toIndexedSeq // original vertices only here
    val cOrig = verticesOf(cHead).toIndexedSeq
    sOrig.indices.foreach { si =>
      val sv = sOrig(si)
      val (x1, y1) = (sv.x, sv.y)
      val sEnd = sOrig((si + 1) % sOrig.length)
      val (x2, y2) = (sEnd.x, sEnd.y)
      cOrig.indices.foreach { ci =>
        val cv = cOrig(ci)
        val (x3, y3) = (cv.x, cv.y)
        val cEnd = cOrig((ci + 1) % cOrig.length)
        val (x4, y4) = (cEnd.x, cEnd.y)
        val den = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        if (math.abs(den) > 1e-18) {
          val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / den
          val u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / den
          if (t > 1e-12 && t < 1 - 1e-12 && u > 1e-12 && u < 1 - 1e-12) {
            found = true
            val ix = x1 + t * (x2 - x1)
            val iy = y1 + t * (y2 - y1)
            val ns = new Node(ix, iy, true, t)
            val nc = new Node(ix, iy, true, u)
            ns.neighbor = nc; nc.neighbor = ns
            insertAfter(sv, ns)
            insertAfter(cv, nc)
          }
        }
      }
    }

    if (!found) {
      // no crossings: containment / disjoint cases
      val sInC = pointInRing(sLng(0), sLat(0), cHead) // note: (x=lng, y=lat)
      val cInS = pointInRing(cLng(0), cLat(0), sHead)
      return mode match {
        case 0 => // intersection
          if (sInC) Seq(Ring(sLat, sLng))
          else if (cInS) Seq(Ring(cLat, cLng))
          else Seq.empty
        case 1 => // union
          if (sInC) Seq(Ring(cLat, cLng))
          else if (cInS) Seq(Ring(sLat, sLng))
          else Seq(Ring(sLat, sLng), Ring(cLat, cLng))
        case 2 => // S minus C
          if (sInC) Seq.empty
          else if (cInS) Seq(Ring(sLat, sLng), Ring(cLat.reverse, cLng.reverse)) // hole
          else Seq(Ring(sLat, sLng))
      }
    }

    // phase 2: entry/exit marks (alternate along each ring, seeded by
    // whether the ring's start lies inside the other polygon)
    def mark(head: Node, other: Node, invert: Boolean): Unit = {
      var status = !pointInRing(head.x, head.y, other) // outside -> first is entry
      if (invert) status = !status
      var cur = head
      do {
        if (cur.isIntersection) { cur.entry = status; status = !status }
        cur = cur.next
      } while (cur ne head)
    }
    mark(sHead, cHead, invS)
    mark(cHead, sHead, invC)

    // phase 3: traversal
    val out = Seq.newBuilder[Ring]
    def nextUnvisited(): Node = {
      var cur = sHead
      do {
        if (cur.isIntersection && !cur.visited) return cur
        cur = cur.next
      } while (cur ne sHead)
      null
    }
    // Runaway-loop guard: a valid GH traversal appends each node O(1) times
    // across ALL output rings, so total steps are bounded by a small multiple
    // of the node count (originals + inserted intersections). Sizing the
    // bound from the input — not a fixed constant — keeps legitimately large
    // polygons (e.g. 5000-vertex coastlines) in scope while still failing
    // loudly on a genuinely non-terminating traversal (review r03).
    val maxSteps =
      4 * (verticesOf(sHead).length + verticesOf(cHead).length) + 16
    var start = nextUnvisited()
    var guard = 0
    while (start != null && guard < maxSteps) {
      val xs = Array.newBuilder[Double]
      val ys = Array.newBuilder[Double]
      var cur = start
      do {
        cur.visited = true
        if (cur.neighbor != null) cur.neighbor.visited = true
        if (cur.entry) {
          do { cur = cur.next; xs += cur.x; ys += cur.y; guard += 1 }
          while (!cur.isIntersection && guard < maxSteps)
        } else {
          do { cur = cur.prev; xs += cur.x; ys += cur.y; guard += 1 }
          while (!cur.isIntersection && guard < maxSteps)
        }
        cur.visited = true
        cur = cur.neighbor
        guard += 1
      } while ((cur ne start) && guard < maxSteps)
      val lat = ys.result(); val lng = xs.result()
      if (lat.length >= 3) out += Ring(lat, lng)
      start = nextUnvisited()
    }
    if (guard >= maxSteps)
      throw new IllegalStateException(
        "PolyBool: traversal did not close (degenerate input outside the documented general-position scope)")
    // Orientation normalization: traversal direction depends on the parity
    // of each ring's starting node, so raw output orientation is not
    // meaningful. For intersection and difference of crossing SHELLS every
    // component is simply connected (a would-be hole needs a fully-enclosed
    // clip, i.e. the no-crossing case) — normalize each ring CCW. For union,
    // interlocking shapes CAN enclose holes: normalize CCW first, then
    // reverse (to CW) any ring whose representative vertex lies inside
    // another ring. (Verified by PolyBoolSpec hand vectors + the additivity
    // sweep.)
    val normalized = out.result().map { r =>
      if (Geo.shoelaceSigned(r.lat, r.lng) < 0) Ring(r.lat.reverse, r.lng.reverse) else r
    }
    if (mode != 1 || normalized.length <= 1) normalized
    else normalized.map { r =>
      val isHole = normalized.exists(o =>
        (o ne r) && Geo.containsPlanar(r.lat(0), r.lng(0), o.lat, o.lng))
      if (isHole) Ring(r.lat.reverse, r.lng.reverse) else r
    }
  }

  /** A ∩ B. */
  def intersection(aLat: Array[Double], aLng: Array[Double],
                   bLat: Array[Double], bLng: Array[Double]): Seq[Ring] =
    run(aLat, aLng, bLat, bLng, invS = false, invC = false, mode = 0)

  /** A ∪ B. */
  def union(aLat: Array[Double], aLng: Array[Double],
            bLat: Array[Double], bLng: Array[Double]): Seq[Ring] =
    run(aLat, aLng, bLat, bLng, invS = true, invC = true, mode = 1)

  /** A \ B (holes emitted as CW rings). Mark polarity determined
    * empirically against the hand vectors: inverting the SUBJECT's marks
    * yields A \ B; inverting the clip's yields B \ A. */
  def difference(aLat: Array[Double], aLng: Array[Double],
                 bLat: Array[Double], bLng: Array[Double]): Seq[Ring] =
    run(aLat, aLng, bLat, bLng, invS = true, invC = false, mode = 2)

  /** Sum of signed areas over a boolean result (holes subtract). */
  def totalArea(rings: Seq[Ring]): Double =
    rings.map(r => signedArea(r.lat, r.lng)).sum

  /** Boolean AREAS for polygons WITH HOLES (the Foster role for measures,
    * VERDICT r03 #5), by inclusion-exclusion over the shell kernel above.
    *
    * Model: a polygon is `rings.head` = the shell, `rings.tail` = holes that
    * are pairwise disjoint and strictly inside the shell (the standard
    * valid-polygon precondition — assumed, not checked; a violating input
    * double-subtracts overlapped hole area exactly as its indicator algebra
    * says). Under it the indicator function factors EXACTLY:
    *
    *   1_A = 1_shellA - sum_i 1_holeA_i
    *   area(A n B) = 1_A * 1_B integrated
    *     = area(As n Bs) - sum_j area(As n Bh_j) - sum_i area(Ah_i n Bs)
    *       + sum_ij area(Ah_i n Bh_j)
    *
    * — every term a SHELL-pair intersection computed by the gated
    * Greiner-Hormann kernel, so hole-aware areas inherit its verification
    * (hand vectors + the Sutherland-Hodgman cross-check) with no new
    * geometry code. union/difference follow from the measure identities
    * area(AuB) = a + b - i and area(A\B) = a - i. Exact for measures; RING
    * output for hole-bearing inputs remains out of scope (the remaining
    * Foster gap is geometry output only, narrowed from "holes ignored").
    * Deterministic: terms accumulate in ring-list order — callers that need
    * bit-equality (engine gate vs golden) share THIS function.
    *
    * @param a,b ring lists (lat[], lng[]): head = shell, tail = holes.
    * @return (area_a, area_b, area_inter, area_union, area_diff). */
  def areasWithHoles(a: Seq[(Array[Double], Array[Double])],
                     b: Seq[(Array[Double], Array[Double])])
      : (Double, Double, Double, Double, Double) = {
    require(a.nonEmpty && b.nonEmpty, "areasWithHoles: empty ring list")
    def interArea(x: (Array[Double], Array[Double]),
                  y: (Array[Double], Array[Double])): Double = {
      val r = intersection(x._1, x._2, y._1, y._2)
      if (r.isEmpty) 0.0 else totalArea(r)
    }
    val as = a.head; val ahs = a.tail
    val bs = b.head; val bhs = b.tail
    val areaA = areaOf(a)
    val areaB = areaOf(b)
    var inter = interArea(as, bs)
    bhs.foreach(bh => inter -= interArea(as, bh))
    ahs.foreach(ah => inter -= interArea(ah, bs))
    ahs.foreach(ah => bhs.foreach(bh => inter += interArea(ah, bh)))
    (areaA, areaB, inter, areaA + areaB - inter, areaA - inter)
  }

  /** Polygon area under the shell-minus-holes model (|shell| - sum |holes|). */
  def areaOf(rings: Seq[(Array[Double], Array[Double])]): Double = {
    require(rings.nonEmpty, "areaOf: empty ring list")
    math.abs(signedArea(rings.head._1, rings.head._2)) -
      rings.tail.map(r => math.abs(signedArea(r._1, r._2))).sum
  }
}
