package graft.model

import graft.core.{Hashes, S2}

/** Deterministic synthesis of the engine's input tables from the driver's
  * parquet test data (TESTDATA.md), per BASELINE.json `input_hint`: an
  * image+caption table whose rows are geotagged point features.
  *
  * The geotag derivation is expressed ONCE as ANSI SQL text (`imagesSelect`)
  * and evaluated by BOTH Spark and the DuckDB oracle, using only exact IEEE
  * operations (integer *,%,- and one double division per coordinate), so
  * engine and oracle agree bit-for-bit (SURVEY.md §7.4 "keep operation order
  * identical").
  *
  * Layout mirrors the reference's world model: each row is a point feature
  * (b6 `PointFeature`, /root/reference/src/diagonal.works/b6/world.go:428-463)
  * whose S2 leaf/level-16 cell is the index key
  * (/root/reference/src/diagonal.works/b6/search/spatial.go:10,30-32).
  *
  * Skew: 20% of rows land in 3 "urban" hot caps (~±550 m jitter) — the dense
  * cells the salting/AQE path must handle (north rule).
  */
object Synth {

  /** Hot-cluster centers (London, New York, Tokyo). */
  val hotCenters: Array[(Double, Double)] =
    Array((51.5074, -0.1278), (40.7128, -74.0060), (35.6762, 139.6503))

  def dlit(d: Double): String = s"CAST(${d} AS DOUBLE)"

  /** The images table body: SELECT over the `orders` parquet table.
    * o_orderkey is unique at every scale factor (TESTDATA.md).
    * All arithmetic is exact: bigint *,%,- then a single double division. */
  val imagesSelect: String = {
    val latHot = hotCenters.map(_._1)
    val lngHot = hotCenters.map(_._2)
    s"""SELECT o_orderkey AS image_id,
       |  CONCAT('caption-', CAST(o_orderkey AS STRING), ' ', o_orderpriority) AS caption,
       |  o_orderstatus AS status, o_orderpriority AS priority,
       |  o_totalprice AS price,
       |  CASE WHEN o_orderkey % 5 = 0 THEN
       |    (CASE WHEN o_orderkey % 3 = 0 THEN ${dlit(latHot(0))}
       |          WHEN o_orderkey % 3 = 1 THEN ${dlit(latHot(1))}
       |          ELSE ${dlit(latHot(2))} END)
       |    + (((o_orderkey * 48271) % 2000) - 1000) / CAST(200000 AS DOUBLE)
       |  ELSE (120 * ((o_orderkey * 48271) % 99991) - 5999460) / CAST(99991 AS DOUBLE) END AS lat,
       |  CASE WHEN o_orderkey % 5 = 0 THEN
       |    (CASE WHEN o_orderkey % 3 = 0 THEN ${dlit(lngHot(0))}
       |          WHEN o_orderkey % 3 = 1 THEN ${dlit(lngHot(1))}
       |          ELSE ${dlit(lngHot(2))} END)
       |    + (((o_orderkey * 69621) % 2000) - 1000) / CAST(125000 AS DOUBLE)
       |  ELSE (340 * ((o_orderkey * 69621) % 99989) - 16998130) / CAST(99989 AS DOUBLE) END AS lng
       |FROM orders""".stripMargin
  }

  /** Dup-structured perceptual hash over image_id — the fixture for the
    * phash near-dup operator (Media.withPayload's splitmix64 phash is
    * uniform, so true near-dup pairs would never exist to test against).
    * Groups of 8 consecutive ids share a 62-bit base (four small-multiplier
    * LCG chunks — no 64-bit overflow, so DuckDB's checked BIGINT arithmetic
    * accepts it); member m = id%8 flips the m bits [8m, 8m+m), so pairwise
    * hamming INSIDE a group is exactly m_a + m_b (disjoint flip ranges) and
    * across groups ~31 expected. XOR is spelled overflow-free as
    * (base - (base&mask)) + (mask - (base&mask)) because DuckDB has no `^`
    * XOR operator (its `^` is power) — one shared SQL text, evaluated by
    * BOTH engines, the imagesSelect discipline. */
  def phashDupExpr(idCol: String): String = {
    val gid = s"CAST(floor($idCol / 8) AS BIGINT)"
    def chunk(k: Long, b: Long, m: Long) = s"(($gid * $k + $b) % $m)"
    val base = s"(${chunk(48271, 11, 65536)}" +
      s" + ${chunk(69621, 23, 65536)} * 65536" +
      s" + ${chunk(40692, 37, 65536)} * 4294967296" +
      s" + ${chunk(52711, 53, 16384)} * 281474976710656)"
    // mask(m) = (2^m - 1) << 8m, precomputed so the text stays portable
    val mask = s"(CASE CAST($idCol % 8 AS INT)" +
      " WHEN 0 THEN 0 WHEN 1 THEN 256 WHEN 2 THEN 196608" +
      " WHEN 3 THEN 117440512 WHEN 4 THEN 64424509440" +
      " WHEN 5 THEN 34084860461056 WHEN 6 THEN 17732923532771328" +
      " ELSE 9151314442816847872 END)"
    s"(($base - ($base & $mask)) + ($mask - ($base & $mask)))"
  }

  /** Same derivation over a synthetic key range — the bench-scale generator
    * (no test-data dependency; BASELINE.json: "synthesise it
    * deterministically"). Used with spark.range(n).withColumnRenamed("id",...)
    * registered as a view named `orders` with o_orderkey = id+1. */
  val imagesSelectFromRange: String =
    imagesSelect // identical text; the `orders` view supplies the columns

  // =====================================================================
  // Trajectories — deterministic per-event locations over the events table
  // (the stay-point fixture: q_staypoints)
  // =====================================================================

  /** Trajectory block width: events are ~8.6 h apart per user (TESTDATA),
    * so 2-day blocks hold ~5-6 points — enough to form a stay. */
  val TrajBlockSeconds = 172800L

  def trajBlock(sec: Long): Long = Math.floorDiv(sec, TrajBlockSeconds)

  /** Deterministic trajectory location for an event: the user's home plus a
    * per-block anchor; blocks with block % 3 != 2 are DWELL blocks (±11 m
    * jitter around the anchor — a stay point once the user's events span
    * the min duration), every third block is TRAVEL (±2.2 km scatter —
    * breaks stays and never reaches the 100 m gate radius). Pure exact
    * arithmetic (integer mul/mod, one double division per term), shared by
    * the engine's UDF and the golden — the imagesSelect discipline in
    * kernel form. */
  def trajLat(userId: Long, eventId: Long, sec: Long): Double = {
    val home = (((userId * 7919L) % 12000L) - 6000L) / 100.0
    val b = trajBlock(sec)
    val anchor = ((((b * 48271L + userId * 131L) % 2000L) - 1000L)) / 50000.0
    val off =
      if (b % 3L != 2L) (((eventId * 40507L) % 200L) - 100L) / 1000000.0
      else (((eventId * 48271L) % 4000L) - 2000L) / 100000.0
    home + anchor + off
  }

  def trajLng(userId: Long, eventId: Long, sec: Long): Double = {
    val home = (((userId * 104729L) % 30000L) - 15000L) / 100.0
    val b = trajBlock(sec)
    val anchor = ((((b * 69621L + userId * 137L) % 2000L) - 1000L)) / 50000.0
    val off =
      if (b % 3L != 2L) (((eventId * 69621L) % 200L) - 100L) / 1000000.0
      else (((eventId * 40507L) % 4000L) - 2000L) / 100000.0
    home + anchor + off
  }

  /** URBAN trajectory variant (the q_geofence_trans fixture): homes sit ~1 km
    * from a hot center and block anchors wander ±2.8 km — straddling the
    * 3 km urban region shells (regions 0-2), so per-block anchor moves and
    * travel scatter cross the fence both ways. Same exact-arithmetic
    * discipline and block structure as trajLat/trajLng. */
  def urbanTrajLat(userId: Long, eventId: Long, sec: Long): Double = {
    val cLat = hotCenters((userId % 3).toInt)._1
    val b = trajBlock(sec)
    val home = (((userId * 131L) % 200L) - 100L) / 100000.0
    val anchor = ((((b * 48271L + userId * 131L) % 5000L) - 2500L)) / 100000.0
    val off =
      if (b % 3L != 2L) (((eventId * 40507L) % 200L) - 100L) / 1000000.0
      else (((eventId * 48271L) % 5000L) - 2500L) / 100000.0
    cLat + home + anchor + off
  }

  def urbanTrajLng(userId: Long, eventId: Long, sec: Long): Double = {
    val cLng = hotCenters((userId % 3).toInt)._2
    val b = trajBlock(sec)
    val home = (((userId * 137L) % 200L) - 100L) / 62000.0
    val anchor = ((((b * 69621L + userId * 137L) % 5000L) - 2500L)) / 62000.0
    val off =
      if (b % 3L != 2L) (((eventId * 69621L) % 200L) - 100L) / 620000.0
      else (((eventId * 40507L) % 5000L) - 2500L) / 62000.0
    cLng + home + anchor + off
  }

  // =====================================================================
  // Regions — the polygon side of the containment join (FIXTURES.md §2)
  // =====================================================================

  /** One polygon region: shell ring (+ optional hole), tag-style attrs, and
    * its S2 covering (MaxLevel 16 / MaxCells 5, mirroring
    * /root/reference/src/diagonal.works/b6/search/spatial.go:30-32). */
  final case class Region(
      regionId: String,
      kind: String,          // tag: #kind=urban|rural
      zone: String,          // tag: zone name
      rings: Array[(Array[Double], Array[Double])], // (lat[], lng[]) per ring
      cells: Array[Long])

  private def mkRing(cLat: Double, cLng: Double, rMeters: Double, n: Int,
                     seed: Long): (Array[Double], Array[Double]) = {
    val lat = new Array[Double](n)
    val lng = new Array[Double](n)
    var i = 0
    while (i < n) {
      val u = (Hashes.splitmix64(seed * 1000 + i) >>> 11).toDouble / (1L << 53).toDouble
      val r = rMeters * (0.72 + 0.28 * u)
      val th = 2 * math.Pi * i / n
      val dLat = r * math.cos(th) / 111320.0
      val dLng = r * math.sin(th) / (111320.0 * math.cos(math.toRadians(cLat)))
      // 5-decimal rounding: exact decimal literals on both engine and oracle
      lat(i) = math.rint((cLat + dLat) * 100000.0) / 100000.0
      lng(i) = math.rint((cLng + dLng) * 100000.0) / 100000.0
      i += 1
    }
    (lat, lng)
  }

  /** 24 deterministic regions: 3 urban polygons over the hot caps (one with
    * >16 vertices — the reference's index-vs-direct crossover pin,
    * spatial.go:228-230), 21 scattered large regions; 2 carry a hole
    * (even-odd semantics). */
  val regions: Array[Region] = {
    val out = Array.newBuilder[Region]
    // urban: radius 3 km so they capture their entire hot cluster (±550 m)
    val urbanN = Array(20, 8, 12) // one >16-vertex pin
    var k = 0
    while (k < 3) {
      val (cLat, cLng) = hotCenters(k)
      val shell = mkRing(cLat, cLng, 3000.0, urbanN(k), seed = 7 * (k + 1))
      val rings =
        if (k == 0) Array(shell, mkRing(cLat, cLng, 700.0, 6, seed = 977)) // hole
        else Array(shell)
      val cov = S2.covering(S2.Poly(shell._1, shell._2))
      out += Region(f"reg-$k%04d", "urban", s"zone-$k", rings, cov)
      k += 1
    }
    // scattered: radius 150-650 km, centers away from poles/antimeridian
    var j = 3
    while (j < 24) {
      val s1 = Hashes.splitmix64(j * 31L)
      val s2 = Hashes.splitmix64(j * 31L + 1)
      val s3 = Hashes.splitmix64(j * 31L + 2)
      val cLat = -52.0 + 104.0 * ((s1 >>> 11).toDouble / (1L << 53).toDouble)
      val cLng = -155.0 + 310.0 * ((s2 >>> 11).toDouble / (1L << 53).toDouble)
      val rM = 150000.0 + 500000.0 * ((s3 >>> 11).toDouble / (1L << 53).toDouble)
      val n = 5 + (Hashes.splitmix64(j * 31L + 3) >>> 60).toInt // 5..20
      val shell = mkRing(cLat, cLng, rM, n, seed = 13L * j)
      val rings =
        if (j == 11) Array(shell, mkRing(cLat, cLng, rM * 0.3, 5, seed = 1013L * j))
        else Array(shell)
      val cov = S2.covering(S2.Poly(shell._1, shell._2))
      out += Region(f"reg-$j%04d", "rural", s"zone-$j", rings, cov)
      j += 1
    }
    out.result()
  }

  /** Unrolled even-odd ray-cast over the region's rings as a SQL predicate on
    * columns `lat`/`lng` — the EXACT arithmetic of Geo.containsPlanarRings
    * ((yi>lat)!=(yj>lat) && lng < (xj-xi)*(lat-yi)/(yj-yi)+xi), reference
    * refine semantics (features.go:46-56). */
  def rayCastSql(r: Region): String = {
    val terms = r.rings.flatMap { case (ys, xs) =>
      val n = ys.length
      (0 until n).map { i =>
        val j = (i + n - 1) % n
        val yi = dlit(ys(i)); val xi = dlit(xs(i))
        val yj = dlit(ys(j)); val xj = dlit(xs(j))
        s"(CASE WHEN (($yi > lat) != ($yj > lat)) AND (lng < ($xj - $xi) * (lat - $yi) / ($yj - $yi) + $xi) THEN 1 ELSE 0 END)"
      }
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  // =====================================================================
  // kNN query points (FIXTURES.md §3 golden_knn)
  // =====================================================================

  final case class KnnQuery(queryId: Int, lat: Double, lng: Double) {
    /** cos(lat) as a pinned literal: the equirectangular x-scale. */
    val cosLat: Double = math.cos(math.toRadians(lat))
    /** Squared equirectangular distance in deg² — exact-arithmetic SQL on
      * columns lat/lng, identical text for engine and oracle. */
    def d2Sql: String = {
      val l = dlit(lat); val g = dlit(lng); val c = dlit(cosLat)
      s"((lat - $l) * (lat - $l) + ((lng - $g) * $c) * ((lng - $g) * $c))"
    }
  }

  /** Batch-kNN query-point generator (pure; shared by the engine's
    * executor-side UDF over spark.range and the driver-side golden): the
    * 10^4-query fixture behind q_knn_batch — the "nearest landmark for every
    * city" workload shape where the query side is itself a table. 5-decimal
    * rounding keeps literals exact on both engines. */
  def batchQueryLat(i: Long): Double =
    math.rint((-55.0 + 110.0 *
      ((Hashes.splitmix64(i * 101L + 11) >>> 11).toDouble / (1L << 53).toDouble)) * 100000.0) / 100000.0

  def batchQueryLng(i: Long): Double =
    math.rint((-160.0 + 320.0 *
      ((Hashes.splitmix64(i * 101L + 23) >>> 11).toDouble / (1L << 53).toDouble)) * 100000.0) / 100000.0

  /** The batch-kNN query side as a DataFrame — (query_id int, qlat, qlng)
    * over `spark.range(n)` with the generators above evaluated executor-side.
    * One definition for SparkEntry's gates, Bench's warmup and OpsSpec
    * (review r03 deduplicated three copies). */
  def batchQueryDf(spark: org.apache.spark.sql.SparkSession, n: Int): org.apache.spark.sql.DataFrame =
    queryDfOf(spark, n, batchQueryLat, batchQueryLng)

  /** REGIONAL batch-kNN query points — a 5°x5° box around the London hot
    * cap: the workload where the store-backed batch probe
    * (Knn.knnBatchFromStore) reads a strict subset of the buckets. Same
    * 5-decimal rounding contract as the global generators. */
  def regionalQueryLat(i: Long): Double =
    math.rint((49.0 + 5.0 *
      ((Hashes.splitmix64(i * 197L + 31) >>> 11).toDouble / (1L << 53).toDouble)) * 100000.0) / 100000.0

  def regionalQueryLng(i: Long): Double =
    math.rint((-3.0 + 5.0 *
      ((Hashes.splitmix64(i * 197L + 43) >>> 11).toDouble / (1L << 53).toDouble)) * 100000.0) / 100000.0

  def regionalBatchQueryDf(spark: org.apache.spark.sql.SparkSession, n: Int): org.apache.spark.sql.DataFrame =
    queryDfOf(spark, n, regionalQueryLat, regionalQueryLng)

  private def queryDfOf(spark: org.apache.spark.sql.SparkSession, n: Int,
                        latOf: Long => Double, lngOf: Long => Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val qlat = udf((i: Long) => latOf(i))
    val qlng = udf((i: Long) => lngOf(i))
    spark.range(n).select(col("id").cast("int").as("query_id"),
      qlat(col("id")).as("qlat"), qlng(col("id")).as("qlng"))
  }

  // =====================================================================
  // Paths — deterministic polylines ("roads") for the polyline operators
  // =====================================================================

  final case class Path(pathId: String, lats: Array[Double], lngs: Array[Double])

  /** 40 seeded random-walk polylines: 20 short ones around the hot caps
    * (the nearest-path-join fixtures), 20 scattered long ones. */
  val paths: Array[Path] = {
    def walk(id: Int, cLat: Double, cLng: Double, stepM: Double, n: Int): Path = {
      val lats = new Array[Double](n)
      val lngs = new Array[Double](n)
      var lat = cLat + (((Hashes.splitmix64(id * 131L) >>> 11) % 1000) - 500) / 50000.0
      var lng = cLng + (((Hashes.splitmix64(id * 131L + 1) >>> 11) % 1000) - 500) / 50000.0
      var i = 0
      while (i < n) {
        lats(i) = math.rint(lat * 1000000) / 1000000.0
        lngs(i) = math.rint(lng * 1000000) / 1000000.0
        val h = Hashes.splitmix64(id * 1000003L + i)
        val ang = 2 * math.Pi * ((h >>> 11).toDouble / (1L << 53).toDouble)
        lat += stepM * math.cos(ang) / 111320.0
        lng += stepM * math.sin(ang) / (111320.0 * math.cos(math.toRadians(lat)))
        i += 1
      }
      Path(f"path-$id%04d", lats, lngs)
    }
    val b = Array.newBuilder[Path]
    for (k <- 0 until 20) {
      val (cLat, cLng) = hotCenters(k % 3)
      b += walk(k, cLat, cLng, stepM = 400.0, n = 6 + (k % 5))
    }
    for (k <- 20 until 40) {
      val s1 = Hashes.splitmix64(k * 17L)
      val s2 = Hashes.splitmix64(k * 17L + 1)
      val cLat = -50.0 + 100.0 * ((s1 >>> 11).toDouble / (1L << 53).toDouble)
      val cLng = -150.0 + 300.0 * ((s2 >>> 11).toDouble / (1L << 53).toDouble)
      b += walk(k, cLat, cLng, stepM = 5000.0, n = 8)
    }
    b.result()
  }

  /** Crossing-probe fixture: 4 radial "spokes" per hot center, 0 -> 6 km
    * outward — each MUST cross its 3 km urban shell, giving the crossing
    * join a dense deterministic gate (q_crossing). */
  val spokePaths: Array[Path] = {
    val b = Array.newBuilder[Path]
    for (k <- 0 until 3; d <- 0 until 4) {
      val (cLat, cLng) = hotCenters(k)
      val ang = math.Pi / 2 * d + 0.3
      val lats = new Array[Double](4)
      val lngs = new Array[Double](4)
      var i = 0
      while (i < 4) {
        val rM = 2000.0 * i
        lats(i) = math.rint((cLat + rM * math.cos(ang) / 111320.0) * 1000000) / 1000000.0
        lngs(i) = math.rint((cLng + rM * math.sin(ang) /
          (111320.0 * math.cos(math.toRadians(cLat)))) * 1000000) / 1000000.0
        i += 1
      }
      b += Path(f"spoke-$k%02d$d%02d", lats, lngs)
    }
    b.result()
  }

  /** GeoJSON-breadth fixture (shared INPUT for q_geojson_full; the golden's
    * expected OUTPUT is derived from the underlying arrays independently):
    * 5 LineStrings from the path fixtures, a MultiPoint of the hot centers,
    * a Polygon with region 0's shell REVERSED (flips winding, exercising the
    * geojson-areas inversion), and a MultiPolygon of regions 1+2 shells. */
  val geojsonFullFixture: String = {
    def pos(lat: Double, lng: Double) = s"[$lng,$lat]"
    def ring(lats: Array[Double], lngs: Array[Double], rev: Boolean) = {
      val idx = if (rev) lats.indices.reverse else lats.indices
      idx.map(i => pos(lats(i), lngs(i))).mkString("[", ",", "]")
    }
    val lines = paths.take(5).map { p =>
      s"""{"type":"Feature","id":"line-${p.pathId}","properties":{},"geometry":{"type":"LineString","coordinates":${p.lats.indices.map(i => pos(p.lats(i), p.lngs(i))).mkString("[", ",", "]")}}}"""
    }
    val mp = s"""{"type":"Feature","id":"mp-0","properties":{},"geometry":{"type":"MultiPoint","coordinates":${hotCenters.map { case (la, lo) => pos(la, lo) }.mkString("[", ",", "]")}}}"""
    val mline = {
      val ps = paths.slice(5, 7)
      val coords = ps.map(p => p.lats.indices.map(i => pos(p.lats(i), p.lngs(i)))
        .mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""{"type":"Feature","id":"mline-56","properties":{},"geometry":{"type":"MultiLineString","coordinates":$coords}}"""
    }
    val r0 = regions(0).rings(0)
    val polyRev = s"""{"type":"Feature","id":"poly-rev","properties":{},"geometry":{"type":"Polygon","coordinates":[${ring(r0._1, r0._2, rev = true)}]}}"""
    val mpoly = {
      val p1 = regions(1).rings(0); val p2 = regions(2).rings(0)
      s"""{"type":"Feature","id":"mpoly-12","properties":{},"geometry":{"type":"MultiPolygon","coordinates":[[${ring(p1._1, p1._2, rev = false)}],[${ring(p2._1, p2._2, rev = false)}]]}}"""
    }
    // GeometryCollection: a Point member + a LineString member (paths(7))
    val gc = {
      val p7 = paths(7)
      val line = p7.lats.indices.map(i => pos(p7.lats(i), p7.lngs(i))).mkString("[", ",", "]")
      s"""{"type":"Feature","id":"gc-0","properties":{},"geometry":{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":${pos(hotCenters(0)._1, hotCenters(0)._2)}},{"type":"LineString","coordinates":$line}]}}"""
    }
    (lines :+ mp :+ mline :+ polyRev :+ mpoly :+ gc)
      .mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
  }

  /** 25 pinned query points: 6 inside the hot caps (dense path), 19
    * scattered (sparse path — nearest neighbours can be 1000s of km away). */
  val knnQueries: Array[KnnQuery] = {
    val b = Array.newBuilder[KnnQuery]
    var id = 0
    for (k <- 0 until 3; d <- 0 until 2) {
      val (cLat, cLng) = hotCenters(k)
      b += KnnQuery(id, math.rint((cLat + 0.004 * (d * 2 - 1)) * 100000) / 100000.0,
        math.rint((cLng + 0.006 * (1 - d * 2)) * 100000) / 100000.0)
      id += 1
    }
    while (id < 25) {
      val s1 = Hashes.splitmix64(id * 77L)
      val s2 = Hashes.splitmix64(id * 77L + 5)
      val qLat = math.rint((-50.0 + 100.0 * ((s1 >>> 11).toDouble / (1L << 53).toDouble)) * 100000) / 100000.0
      val qLng = math.rint((-150.0 + 300.0 * ((s2 >>> 11).toDouble / (1L << 53).toDouble)) * 100000) / 100000.0
      b += KnnQuery(id, qLat, qLng)
      id += 1
    }
    b.result()
  }

  /** Courtyard fixture (q_poly_bool hole coverage): two overlapping
    * axis-aligned squares, EACH with a square hole — court-a's courtyard
    * straddles the overlap boundary (its area must come OUT of the
    * intersection), court-b's sits outside it (must not). Remote from the
    * other regions (lat/lng ~10) so the pair is self-contained; exact
    * decimal literals; general position vs each other (all edge crossings
    * transversal, no shared vertices). Kept SEPARATE from `regions` — that
    * fixture feeds a dozen other gates whose goldens must not re-pin. */
  val courtyardRegions: Array[Region] = {
    def rect(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double)
        : (Array[Double], Array[Double]) =
      (Array(latLo, latLo, latHi, latHi), Array(lngLo, lngHi, lngHi, lngLo))
    def mk(id: String, shell: (Array[Double], Array[Double]),
           hole: (Array[Double], Array[Double])): Region =
      Region(id, "court", "court", Array(shell, hole),
        S2.covering(S2.Poly(shell._1, shell._2)))
    Array(
      mk("court-a", rect(10.00, 10.20, 10.00, 10.20), rect(10.08, 10.14, 10.08, 10.14)),
      mk("court-b", rect(10.10, 10.30, 10.10, 10.30), rect(10.22, 10.26, 10.22, 10.26)))
  }

  /** Degenerate-position fixture (round 5, VERDICT r04 #2): rectilinear
    * polygons whose pairwise booleans hit collinear shared-edge runs,
    * vertex-on-edge and vertex-on-vertex meets — the party-wall
    * configurations the round-1..4 Greiner-Hormann kernel excluded by
    * fixture discipline. Remote from the other fixtures (lat/lng ~20) so
    * the pairs are self-contained; exact decimal literals. Overlapping
    * pairs and their degeneracies:
    *   a-b: lng-shifted twin — top/bottom edges share collinear runs, four
    *        corners sit ON the partner's edges;
    *   a-c: lat-shifted twin — same shape rotated;
    *   b-c: generic transversal overlap (control);
    *   a-d: d inside a sharing the corner VERTEX and two boundary runs;
    *   e-f: hole-bearing pair with collinear shell runs and e's courtyard
    *        straddling f's edge (hole term + degeneracy in one pair).
    * Touching-only pairs (a's party wall with f, d against b) yield empty
    * intersections and are exercised-but-filtered like any disjoint pair. */
  val degenRegions: Array[Region] = {
    def rect(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double)
        : (Array[Double], Array[Double]) =
      (Array(latLo, latLo, latHi, latHi), Array(lngLo, lngHi, lngHi, lngLo))
    def mk(id: String, rings: (Array[Double], Array[Double])*): Region =
      Region(id, "degen", "degen", rings.toArray,
        S2.covering(S2.Poly(rings.head._1, rings.head._2)))
    Array(
      mk("degen-a", rect(20.00, 20.10, 20.00, 20.10)),
      mk("degen-b", rect(20.00, 20.10, 20.05, 20.15)),
      mk("degen-c", rect(20.05, 20.15, 20.00, 20.10)),
      mk("degen-d", rect(20.00, 20.05, 20.00, 20.05)),
      mk("degen-e", rect(20.00, 20.10, 19.85, 19.95), rect(20.02, 20.06, 19.88, 19.92)),
      mk("degen-f", rect(20.00, 20.10, 19.90, 20.00)))
  }

  // =====================================================================
  // Routed grid — the ROUTABLE street-network fixture (q_map_match_routed):
  // a GridN x GridN lattice of nodes centered on hotCenters(0); every
  // lattice edge is BOTH a 2-vertex road segment (the map-matching
  // candidate geometry) and a directed graph edge pair (the routing
  // substrate). The existing 40 random-walk paths are deliberately
  // topology-free — this fixture is what makes route-distance transitions
  // testable. Edge costs are rint()'d to exact integer-valued doubles so
  // shortest-path SUMS are exact and the engine's min-plus flood and the
  // golden's binary-heap Dijkstra agree bit-for-bit.
  // =====================================================================

  /** One road segment of the routable grid: a 2-vertex polyline whose
    * endpoints are graph nodes. */
  final case class GridSeg(pathId: String, lats: Array[Double], lngs: Array[Double],
                           nodeA: Long, nodeB: Long)

  /** 16x16 nodes, ~334 m pitch: spans ±2.5 km around the London hot center,
    * matching urbanTraj's anchor wander, so most urban fixes see 2-6
    * candidate segments at the gate's 250 m radius while edge-of-grid fixes
    * exercise the no-candidate contract. */
  val GridN = 16

  def gridNodeId(r: Int, c: Int): Long = (r * GridN + c).toLong
  def gridNodeLat(r: Int): Double =
    math.rint((51.4849 + r * 0.003) * 1000000) / 1000000.0
  def gridNodeLng(c: Int): Double =
    math.rint((-0.1638 + c * 0.0048) * 1000000) / 1000000.0

  /** 480 segments: horizontal gseg-h-r-c = node(r,c)->(r,c+1), vertical
    * gseg-v-r-c = node(r,c)->(r+1,c). */
  val gridSegs: Array[GridSeg] = {
    val b = Array.newBuilder[GridSeg]
    for (r <- 0 until GridN; c <- 0 until GridN) {
      if (c + 1 < GridN)
        b += GridSeg(f"gseg-h-$r%02d-$c%02d",
          Array(gridNodeLat(r), gridNodeLat(r)),
          Array(gridNodeLng(c), gridNodeLng(c + 1)),
          gridNodeId(r, c), gridNodeId(r, c + 1))
      if (r + 1 < GridN)
        b += GridSeg(f"gseg-v-$r%02d-$c%02d",
          Array(gridNodeLat(r), gridNodeLat(r + 1)),
          Array(gridNodeLng(c), gridNodeLng(c)),
          gridNodeId(r, c), gridNodeId(r + 1, c))
    }
    b.result()
  }

  /** Deterministic route-request endpoints near the grid (q_route): ±2.4 km
    * lat / ±2.4 km lng around the London center — mostly inside the grid
    * (snap succeeds), a tail beyond the 300 m snap radius (exercising the
    * null-row contract). 6-decimal rounding keeps literals exact. */
  def routePairLat(i: Long, side: Int): Double =
    math.rint((51.5074 +
      (((Hashes.splitmix64(i * 131L + side * 7L + 3L) >>> 11) % 4400L) - 2200L) / 100000.0)
      * 1000000) / 1000000.0
  def routePairLng(i: Long, side: Int): Double =
    math.rint((-0.1278 +
      (((Hashes.splitmix64(i * 137L + side * 11L + 5L) >>> 11) % 7000L) - 3500L) / 100000.0)
      * 1000000) / 1000000.0

  /** Route-request endpoints for the PROJECTED variant (q_route_proj): a
    * point a fraction 0.15..0.85 along a random horizontal grid edge,
    * pushed 25..145 m off the row — the nearest network point is strictly
    * MID-SEGMENT, so endpoint-node snapping and split-edge projection give
    * different answers and the gate pins the projection semantics. Every
    * 7th pair's destination lands in the mid-Atlantic (unsnappable-row
    * contract). */
  def routeProjPairLat(i: Long, side: Int): Double = {
    if (i % 7 == 3 && side == 1) return 40.0
    val r = ((Hashes.splitmix64(i * 211L + side * 13L + 7L) >>> 11) % GridN).toInt
    val offM = (((Hashes.splitmix64(i * 223L + side * 17L + 9L) >>> 11) % 121L) + 25L).toDouble
    val sign = if ((Hashes.splitmix64(i * 227L + side * 19L + 11L) >>> 11) % 2L == 0L) 1.0 else -1.0
    math.rint((gridNodeLat(r) + sign * offM / 111320.0) * 1000000) / 1000000.0
  }
  def routeProjPairLng(i: Long, side: Int): Double = {
    if (i % 7 == 3 && side == 1) return -30.0
    val c = ((Hashes.splitmix64(i * 229L + side * 23L + 13L) >>> 11) % (GridN - 1)).toInt
    val f = 0.15 + 0.7 * (((Hashes.splitmix64(i * 233L + side * 29L + 15L) >>> 11) % 1000L) / 1000.0)
    math.rint((gridNodeLng(c) + f * (gridNodeLng(c + 1) - gridNodeLng(c))) * 1000000) / 1000000.0
  }

  /** Directed both ways; cost = rint(haversine) meters — integral doubles,
    * the exact-sum discipline of SparkEntry.graphEdges. */
  val gridEdges: Array[(Long, Long, Double)] =
    gridSegs.flatMap { s =>
      val cost = math.rint(graft.core.Geo.haversineMeters(
        s.lats(0), s.lngs(0), s.lats(1), s.lngs(1)))
      Array((s.nodeA, s.nodeB, cost), (s.nodeB, s.nodeA, cost))
    }
}
