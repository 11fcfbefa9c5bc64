package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Core kernel tests. Golden vectors are the reference's own test
  * expectations (/root/reference/src/diagonal.works/b6/tiles_test.go),
  * so passing here means bit-compatibility with b6's tile/cell math. */
class CoreSpec extends AnyFunSuite {

  // --- TileID packing & tokens (tiles_test.go:110-129) ---
  test("TileID packing round-trips and matches the reference token") {
    val tid = Tiles.tileId(65490, 43568, 17)
    assert(Tiles.token(tid) == "8g00005a61vui")
    assert(Tiles.tileIdToXYZ(tid) == ((65490L, 43568L, 17)))
    assert(Tiles.fromToken("8g00005a61vui") == tid)
  }

  test("parent tile id is always smaller than child id (unsigned, as uint64)") {
    for (z <- 2 to 20; k <- 1 to 10) {
      val x = (Hashes.splitmix64(z * 31 + k) >>> 40) % (1L << z)
      val y = (Hashes.splitmix64(z * 37 + k) >>> 40) % (1L << z)
      val (px, py, pz) = Tiles.parent(x, y, z)
      assert(java.lang.Long.compareUnsigned(
        Tiles.tileId(px, py, pz), Tiles.tileId(x, y, z)) < 0)
    }
  }

  // --- Mercator projection (tiles_test.go:205-214) ---
  test("TileFromLatLng matches the reference") {
    assert(Tiles.tileFromLatLng(51.53531, -0.12434, 16) == ((32745L, 21784L)))
  }

  // --- S2 cell -> tile cover (tiles_test.go:216-245) ---
  test("CoverCellIDWithTiles matches the reference (Granary Square)") {
    val gs = S2.fromToken("48761b3dc")
    assert(Tiles.coverCellWithTiles(gs, 16).toSeq == Seq((32744L, 21784L), (32745L, 21784L)))
  }

  test("CoverCellUnionWithTiles matches the reference") {
    val gs = S2.fromToken("48761b3dc")
    val kc = S2.fromToken("48761b3c4")
    assert(Tiles.coverCellUnionWithTiles(Array(gs, kc), 16).toSeq ==
      Seq((32744L, 21784L, 16), (32745L, 21784L, 16), (32745L, 21785L, 16)))
  }

  test("robust tile cover equals the reference port on equatorial faces") {
    val gs = S2.fromToken("48761b3dc")
    assert(Tiles.coverCellWithTilesRobust(gs, 16).toSeq == Tiles.coverCellWithTiles(gs, 16).toSeq)
  }

  test("robust tile cover is non-empty in the southern hemisphere (reference port yields zero there)") {
    val cell = S2.parent(S2.fromLatLngDegrees(-62.376, -172.218), 11)
    assert(Tiles.coverCellWithTiles(cell, 14).isEmpty)      // reference behavior, replicated
    val robust = Tiles.coverCellWithTilesRobust(cell, 14)
    assert(robust.nonEmpty)
    val (x, y) = Tiles.tileFromLatLng(-62.376, -172.218, 14)
    assert(robust.contains((x, y)))
  }

  test("CoverCellUnionWithTilesAcrossZooms matches the reference count (Chiswick)") {
    val cells = Array("48760da19", "48760da1f", "48760da23", "48760da25",
      "48760da31", "48760da33", "48760da3b").map(S2.fromToken)
    assert(Tiles.coverCellUnionAcrossZooms(cells, 8, 18).length == 48)
  }

  // --- S2 cell id invariants ---
  test("S2 token round-trip and leaf round-trip accuracy") {
    val pts = Seq((51.53531, -0.12434), (0.0, 0.0), (-33.86, 151.21), (71.0, -156.8), (-85.0, 179.9))
    for ((lat, lng) <- pts) {
      val id = S2.fromLatLngDegrees(lat, lng)
      assert(S2.isLeaf(id))
      assert(S2.level(id) == 30)
      assert(S2.fromToken(S2.token(id)) == id)
      val c = S2.centerXYZ(id)
      val rlat = math.toDegrees(math.asin(c(2)))
      val rlng = math.toDegrees(math.atan2(c(1), c(0)))
      assert(math.abs(rlat - lat) < 1e-6, s"lat $lat -> $rlat")
      assert(math.abs(rlng - lng) < 1e-6, s"lng $lng -> $rlng")
    }
  }

  test("parent/children/contains invariants hold for random points") {
    var k = 0
    while (k < 200) {
      val h = Hashes.splitmix64(k)
      val lat = -85 + 170.0 * ((h >>> 1).toDouble / (1L << 62).toDouble / 2.0)
      val lng = -180 + 360.0 * ((Hashes.splitmix64(h) >>> 1).toDouble / (1L << 62).toDouble / 2.0)
      val leaf = S2.fromLatLngDegrees(lat, lng)
      for (l <- 0 to 29) {
        val p = S2.parent(leaf, l)
        assert(S2.level(p) == l)
        assert(S2.contains(p, leaf))
        assert(S2.contains(p, S2.parent(leaf, l + 1)))
        if (l > 0) assert(!S2.contains(S2.parent(leaf, l), S2.parent(leaf, l - 1)))
        val kids = S2.children(p)
        assert(kids.count(S2.contains(_, leaf)) == 1)
        assert(kids.forall(c => S2.level(c) == l + 1 && S2.contains(p, c)))
      }
      k += 1
    }
  }

  test("cell vertices surround the cell center") {
    val id = S2.parent(S2.fromLatLngDegrees(51.5, -0.12), 12)
    val c = S2.centerXYZ(id)
    val vs = S2.vertices(id)
    assert(vs.length == 4)
    val circum = S2.circumAngle(id)
    assert(circum > 0 && circum < 0.1)
    vs.foreach(v => assert(Geo.angleBetween(c, v) <= circum + 1e-15))
  }

  // --- coverer soundness: covering contains sampled region points ---
  test("cap covering is sound (contains all sampled points of the cap)") {
    val center = Geo.toXYZ(51.5353, -0.1243)
    val radiusM = 1000.0
    val angle = radiusM / Geo.EarthRadiusMeters
    val cov = S2.covering(S2.Cap(center, angle), maxCells = 5, maxLevel = 16)
    assert(cov.nonEmpty && cov.length <= 8)
    // sample points inside the cap: all must be inside some covering cell
    for (k <- 0 until 500) {
      val t = 2 * math.Pi * k / 500.0
      val r = angle * ((k % 10) + 1) / 10.0
      val lat = 51.5353 + math.toDegrees(r) * math.cos(t)
      val lng = -0.1243 + math.toDegrees(r) * math.sin(t) / math.cos(math.toRadians(51.5353))
      if (Geo.haversineMeters(51.5353, -0.1243, lat, lng) <= radiusM) {
        val leaf = S2.fromLatLngDegrees(lat, lng)
        assert(cov.exists(S2.contains(_, leaf)), s"point $lat,$lng escaped covering")
      }
    }
  }

  test("polygon covering is sound") {
    val ringLat = Array(51.50, 51.52, 51.53, 51.51, 51.49)
    val ringLng = Array(-0.15, -0.16, -0.11, -0.08, -0.12)
    val cov = S2.covering(S2.Poly(ringLat, ringLng), maxCells = 5, maxLevel = 16)
    assert(cov.nonEmpty)
    for (k <- 0 until 400) {
      val lat = 51.488 + 0.044 * ((k * 7919) % 101) / 101.0
      val lng = -0.162 + 0.085 * ((k * 104729) % 103) / 103.0
      if (Geo.containsPlanar(lat, lng, ringLat, ringLng)) {
        val leaf = S2.fromLatLngDegrees(lat, lng)
        assert(cov.exists(S2.contains(_, leaf)), s"interior point $lat,$lng escaped covering")
      }
    }
  }

  test("coveringAtLevel cells are at the level and cover the cap") {
    val center = Geo.toXYZ(40.0, 20.0)
    val angle = 5000.0 / Geo.EarthRadiusMeters
    val cov = S2.coveringAtLevel(S2.Cap(center, angle), 12)
    assert(cov.nonEmpty)
    assert(cov.forall(S2.level(_) == 12))
    assert(cov.exists(S2.contains(_, S2.fromLatLngDegrees(40.0, 20.0))))
  }

  // --- geometry ---
  test("haversine matches known distance (London->Paris ~343.5km)") {
    val d = Geo.haversineMeters(51.5074, -0.1278, 48.8566, 2.3522)
    assert(math.abs(d - 343500) < 1500, s"got $d")
  }

  test("planar and spherical containment agree away from edges") {
    val ringLat = Array(10.0, 10.0, 11.0, 11.0)
    val ringLng = Array(20.0, 21.0, 21.0, 20.0)
    assert(Geo.containsPlanar(10.5, 20.5, ringLat, ringLng))
    assert(Geo.containsSpherical(10.5, 20.5, ringLat, ringLng))
    assert(!Geo.containsPlanar(9.5, 20.5, ringLat, ringLng))
    assert(!Geo.containsSpherical(9.5, 20.5, ringLat, ringLng))
    assert(!Geo.containsPlanar(10.5, 22.5, ringLat, ringLng))
    assert(!Geo.containsSpherical(10.5, 22.5, ringLat, ringLng))
  }

  test("containment with a hole (even-odd rings)") {
    val shell = (Array(0.0, 0.0, 4.0, 4.0), Array(0.0, 4.0, 4.0, 0.0))
    val hole = (Array(1.0, 1.0, 3.0, 3.0), Array(1.0, 3.0, 3.0, 1.0))
    val rings = Array(shell, hole)
    assert(Geo.containsPlanarRings(0.5, 0.5, rings))
    assert(!Geo.containsPlanarRings(2.0, 2.0, rings)) // in the hole
    assert(!Geo.containsPlanarRings(5.0, 5.0, rings))
  }

  test("convex hull of a square plus interior point is the square") {
    val lat = Array(0.0, 0.0, 1.0, 1.0, 0.5)
    val lng = Array(0.0, 1.0, 1.0, 0.0, 0.5)
    val hull = Geo.convexHull(lat, lng)
    assert(hull.length == 4)
    assert(!hull.contains(4))
  }

  test("polyline length and interpolation") {
    val lat = Array(0.0, 0.0)
    val lng = Array(0.0, 1.0)
    val len = Geo.polylineLengthMeters(lat, lng)
    // one degree of longitude at the equator with R=6371.01km
    assert(math.abs(len - 2 * math.Pi * Geo.EarthRadiusMeters / 360.0) < 1.0)
    val (mlat, mlng) = Geo.interpolate(lat, lng, 0.5)
    assert(math.abs(mlat) < 1e-9 && math.abs(mlng - 0.5) < 1e-9)
  }

  // --- hashes ---
  test("FNV-1 64 known vectors") {
    assert(Hashes.fnv1(Array.empty[Byte]) == Hashes.FnvOffset)
    assert(Hashes.fnv1("a".getBytes("UTF-8")) == 0xaf63bd4c8601b7beL)
    assert(Hashes.fnv1a("a") == 0xaf63dc4c8601ec8cL)
  }

  test("splitmix64 known vector") {
    // first output of SplitMix64 with seed 0 (public reference sequence)
    assert(Hashes.splitmix64(0L) == 0xe220a8397b1dcdafL)
  }

  test("simhash of identical token sets is identical; near sets are near") {
    val a = Array("the", "quick", "brown", "fox").map(Hashes.fnv1a)
    val b = Array("the", "quick", "brown", "fox").map(Hashes.fnv1a)
    assert(Hashes.simhash(a) == Hashes.simhash(b))
    val c = Array("the", "quick", "brown", "cat").map(Hashes.fnv1a)
    val dist = java.lang.Long.bitCount(Hashes.simhash(a) ^ Hashes.simhash(c))
    assert(dist < 32, s"hamming $dist")
  }

  test("minhash jaccard estimate is sane") {
    val a = (0 until 100).map(i => Hashes.fnv1a(s"tok$i")).toArray
    val b = (50 until 150).map(i => Hashes.fnv1a(s"tok$i")).toArray
    val sa = Hashes.minhash(a, 128)
    val sb = Hashes.minhash(b, 128)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"est $est") // true jaccard = 50/150
  }

  test("cell center round-trips: center of cellAt(p) stays inside the cell") {
    val spark2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val pts = Seq((51.5074, -0.1278), (-33.8688, 151.2093), (0.01, 0.01))
    val df = pts.toDF("lat", "lng")
      .withColumn("cell", graft.functions.Udfs.cellAtLevel(col("lat"), col("lng"), lit(12)))
      .withColumn("c", graft.functions.Udfs.cellCenter(col("cell")))
    df.collect().foreach { r =>
      val cell = r.getAs[Long]("cell")
      val c = r.getStruct(r.fieldIndex("c"))
      val back = S2.cellAt(c.getDouble(0), c.getDouble(1), 12)
      assert(back == cell, s"center must map back to its cell")
    }
  }

  test("cap-polygon: n-gon ring at the requested radius") {
    val spark2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val ring = Seq((51.5, -0.1, 1000.0)).toDF("lat", "lng", "r")
      .select(graft.ops.Geometry.capPolygon(32)(col("lat"), col("lng"), col("r")).as("p"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(ring.length == 32)
    ring.foreach { v =>
      val d = Geo.haversineMeters(51.5, -0.1, v.getDouble(0), v.getDouble(1))
      assert(math.abs(d - 1000.0) < 15.0, s"vertex at $d m, wanted ~1000")
    }
  }

  test("tile ids stay in range at the poles (Mercator clamp)") {
    // without the clamp, |lat| > ~85.05 yields y < 0 (or >= 2^z) and the
    // packed TileID's bit fields silently corrupt (r03c audit)
    for (z <- Seq(1, 8, 16); (lat, lng) <- Seq((89.9, 10.0), (-89.9, -170.0),
        (90.0, 180.0), (-90.0, -180.0))) {
      val (x, y) = Tiles.tileFromLatLng(lat, lng, z)
      val n = 1L << z
      assert(x >= 0 && x < n && y >= 0 && y < n, s"z=$z lat=$lat lng=$lng -> ($x,$y)")
    }
    // polar SEGMENTS stay on the grid too (r03d2: the endpoint clamp in
    // tilesOnSegment, not in the faithful project() port)
    for (z <- Seq(4, 12)) {
      val n = 1L << z
      Tiles.tilesOnSegment(89.0, -10.0, 86.0, 40.0, z).foreach { case (x, y) =>
        assert(x >= 0 && x < n && y >= 0 && y < n, s"z=$z polar segment tile ($x,$y)")
      }
      Tiles.tilesOnSegment(-89.5, 170.0, -84.0, 179.9, z).foreach { case (x, y) =>
        assert(x >= 0 && x < n && y >= 0 && y < n, s"z=$z south polar segment tile ($x,$y)")
      }
    }
    // clamped polar chains still decode consistently
    val chain = graft.ops.ProbeIndex.tileChain(89.5, 0.0, 10, 14)
    chain.foreach { tid =>
      val z = (tid >>> 59).toInt
      assert(z >= 10 && z <= 14, s"corrupt zoom field $z in polar tile id")
    }
  }
}
