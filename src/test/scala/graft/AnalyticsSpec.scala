package graft

import graft.core.Tiles
import graft.ops.{Dedup, Tiling, Trajectory}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Spatial-analytics + incremental-dedup operators (round-3 additions):
  * Bloom new-vs-corpus, OD flow matrix, Getis-Ord Gi*. */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("analytics-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("newAgainstCorpus = exact anti-join semantics, any fpp, nulls kept") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    // batch: dup-of-corpus (alpha), new (gamma), batch-internal dup (delta x2),
    // null text (corpus HAS a null row -> not new)
    val batch = Seq((10L, "alpha"), (11L, "gamma"), (12L, "delta"),
      (13L, "delta"), (14L, null.asInstanceOf[String])).toDF("id", "text")
    for (fpp <- Seq(0.5, 0.01)) { // high fpp forces the confirm-join path
      val got = Dedup.newAgainstCorpus(corpus, batch, "text", fpp)
        .select("id").as[Long].collect().sorted
      assert(got.toSeq == Seq(11L, 12L, 13L))
    }
    // corpus WITHOUT a null row: the null-text batch row is new
    val got2 = Dedup.newAgainstCorpus(corpus.where(col("text").isNotNull),
      batch, "text").select("id").as[Long].collect().sorted
    assert(got2.toSeq == Seq(11L, 12L, 13L, 14L))
  }

  test("odMatrix counts tile-changing transitions per user in (sec, id) order") {
    import spark.implicits._
    val zoom = 8
    // three well-separated anchors -> three distinct z8 tiles
    val a = (51.5, -0.1); val b = (48.85, 2.35); val c = (40.7, -74.0)
    val pts = Seq(
      // user 1: a -> b -> b (dwell, dropped) -> c
      (1L, 1L, 100L, a._1, a._2), (1L, 2L, 200L, b._1, b._2),
      (1L, 3L, 300L, b._1 + 1e-4, b._2 + 1e-4), (1L, 4L, 400L, c._1, c._2),
      // user 2: stays in a (no transitions)
      (2L, 5L, 100L, a._1, a._2), (2L, 6L, 200L, a._1 + 1e-4, a._2),
      // user 3: a -> b, out-of-order ingestion (sec decides, not row order)
      (3L, 8L, 900L, b._1, b._2), (3L, 7L, 800L, a._1, a._2)
    ).toDF("user_id", "event_id", "sec", "lat", "lng")
    val got = Trajectory.odMatrix(pts, zoom)
      .orderBy("from_x", "from_y", "to_x", "to_y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val ta = Tiles.tileFromLatLng(a._1, a._2, zoom)
    val tb = Tiles.tileFromLatLng(b._1, b._2, zoom)
    val tc = Tiles.tileFromLatLng(c._1, c._2, zoom)
    val want = Seq(
      (ta._1, ta._2, tb._1, tb._2, 2L, 2L), // u1 and u3
      (tb._1, tb._2, tc._1, tc._2, 1L, 1L)  // u1 only
    ).sortBy(t => (t._1, t._2, t._3, t._4))
    assert(got == want)
  }

  test("bm25TopK equals the driver recomputation bit-for-bit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark fast spark join window"),
      (2L, "the table scan merge batch stream window window"),
      (3L, "vector vector vector small hash"),
      (4L, "spark window vector customer"),
      (5L, "the a of and or but"), // no query terms -> excluded
      (6L, "customer customer spark")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "vector", "window", "customer")
    val got = graft.ops.TextOps.bm25TopK(docs, "doc_id", "text", terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      .sortBy(_._3)
    val want = graft.oracle.Golden.bm25G(
      docs.collect().map(r => (r.getLong(0), r.getString(1))), terms, 10)
    assert(got.map(_._1) == want.map(_._1))
    // bit-exact float agreement (the oracle hash compare relies on this)
    got.zip(want).foreach { case ((gi, gs, gr), (wi, ws, wr)) =>
      assert(gi == wi && gr == wr)
      assert(java.lang.Double.doubleToLongBits(gs) ==
        java.lang.Double.doubleToLongBits(ws), s"doc $gi: $gs vs $ws")
    }
    // doc 5 (no query terms) excluded; all others present
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 6L))
  }

  test("viterbi DP: switch cost holds the matched path through noise") {
    import graft.ops.MapMatch
    import graft.ops.MapMatch.CandRow
    def step(eid: Long, cands: (String, Double)*): (Long, Array[CandRow]) =
      (eid, cands.map { case (p, d) => CandRow(1L, eid, eid, p, d) }.toArray)
    // fix 2 is marginally closer to B, but switching A->B->A costs 2*switch:
    // staying on A wins
    val steps = Array(
      step(1L, ("A", 10.0), ("B", 120.0)),
      step(2L, ("A", 60.0), ("B", 50.0)),
      step(3L, ("A", 10.0), ("B", 120.0)))
    val got = MapMatch.viterbi(steps, sigmaMeters = 50.0, switchCost = 2.0)
    assert(got.map(_._2) == Seq("A", "A", "A"))
    // with free switching the pointwise nearest wins
    val free = MapMatch.viterbi(steps, sigmaMeters = 50.0, switchCost = 0.0)
    assert(free.map(_._2) == Seq("A", "B", "A"))
    // tie on every cost -> smallest path_id at each step
    val tie = Array(step(1L, ("B", 10.0), ("C", 10.0), ("A", 10.0)))
    assert(MapMatch.viterbi(tie, 50.0, 2.0).map(_._2) == Seq("A"))
  }

  test("viterbiMatch equals the golden brute-force+fold recomputation") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    graft.model.Tables.registerBase(spark, sfDir)
    val latU = udf((u: Long, e: Long, sec: Long) => graft.model.Synth.urbanTrajLat(u, e, sec))
    val lngU = udf((u: Long, e: Long, sec: Long) => graft.model.Synth.urbanTrajLng(u, e, sec))
    val ev = spark.table("events").select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("sec"))
      .withColumn("lat", latU(col("user_id"), col("event_id"), col("sec")))
      .withColumn("lng", lngU(col("user_id"), col("event_id"), col("sec")))
      .withColumn("cell16", graft.functions.S2Expressions.s2Cell16(col("lat"), col("lng")))
    val got = graft.ops.MapMatch.viterbiMatch(
        ev, graft.model.Tables.paths(spark), 500.0, 50.0, 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = graft.oracle.Golden.mapMatchG(
        graft.oracle.Golden.loadEvents(spark, sfDir), 500.0, 50.0, 2.0)
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty, "fixture must produce matches")
    assert(got == want)
    // multiple users and both matched/unmatched fixes present
    assert(got.map(_._1).distinct.size > 3)
  }

  test("hausdorffMeters kernel: identity, symmetry, hand case") {
    import graft.ops.TrajSim.hausdorffMeters
    val aLat = Array(51.50, 51.51); val aLng = Array(-0.12, -0.11)
    val bLat = Array(51.50, 51.52); val bLng = Array(-0.12, -0.11)
    assert(hausdorffMeters(aLat, aLng, aLat, aLng) == 0.0)
    assert(hausdorffMeters(aLat, aLng, bLat, bLng) ==
      hausdorffMeters(bLat, bLng, aLat, aLng))
    // singleton vs singleton = plain haversine
    val d = hausdorffMeters(Array(51.5), Array(-0.1), Array(51.5), Array(0.1))
    assert(math.abs(d - graft.core.Geo.haversineMeters(51.5, -0.1, 51.5, 0.1)) == 0.0)
  }

  test("hausdorffPairs equals the golden brute force (all users, sf0.001)") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    graft.model.Tables.registerBase(spark, sfDir)
    val latU = udf((u: Long, e: Long, sec: Long) => graft.model.Synth.urbanTrajLat(u, e, sec))
    val lngU = udf((u: Long, e: Long, sec: Long) => graft.model.Synth.urbanTrajLng(u, e, sec))
    val ev = spark.table("events").select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("sec"))
      .withColumn("lat", latU(col("user_id"), col("event_id"), col("sec")))
      .withColumn("lng", lngU(col("user_id"), col("event_id"), col("sec")))
    for (dM <- Seq(1500.0, 2500.0, 4000.0)) {
      val got = graft.ops.TrajSim.hausdorffPairs(ev, dM)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val want = graft.oracle.Golden.trajHausdorffG(
        graft.oracle.Golden.loadEvents(spark, sfDir), dM)
        .sortBy(t => (t._1, t._2))
      assert(got == want, s"D=$dM")
    }
    // the widest radius must produce pairs on this fixture
    assert(graft.oracle.Golden.trajHausdorffG(
      graft.oracle.Golden.loadEvents(spark, sfDir), 4000.0).nonEmpty)
  }

  test("geohash: public-spec vectors, bounds roundtrip, golden agreement") {
    import graft.core.Geohash
    // the canonical spec example and the classic decode example
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(42.605, -5.603, 5) == "ezs42")
    assert(Geohash.encode(0.0, 0.0, 6) == "s00000")
    for (gh <- Seq("u4pru", "ezs42", "9q8yy", "r3gx2")) {
      val (latLo, latHi, lngLo, lngHi) = Geohash.bounds(gh)
      assert(Geohash.encode((latLo + latHi) / 2, (lngLo + lngHi) / 2, gh.length) == gh)
    }
    // kernel encode == the golden's independent two-track construction
    val pts = Seq((51.5074, -0.1278), (-33.86, 151.21), (85.0, 179.9),
      (-89.9, -179.9), (0.0, 0.0), (42.605, -5.603))
    val viaGolden = graft.oracle.Golden.geohashG(
      pts.zipWithIndex.map { case ((la, lo), i) =>
        graft.oracle.Golden.Img(i.toLong, la, lo) }.toArray, 7, 7)
    val viaKernel = pts.map { case (la, lo) => Geohash.encode(la, lo, 7) }
      .groupBy(identity).toSeq.map { case (g, v) => (g, v.size.toLong) }
      .sortBy(_._1)
    assert(viaGolden == viaKernel)
  }

  test("trajectory legs: hand kinematics and golden agreement at sf0.001") {
    import spark.implicits._
    import graft.core.Geo
    // hand fixture: due-east leg then due-north leg -> turn ~ -90 (left)
    val pts = Seq(
      (1L, 1L, 0L, 0.0, 0.0), (1L, 2L, 100L, 0.0, 0.1), (1L, 3L, 300L, 0.1, 0.1),
      (2L, 4L, 0L, 10.0, 10.0), (2L, 5L, 0L, 10.0, 10.1) // tied sec -> null speed
    ).toDF("user_id", "event_id", "sec", "lat", "lng")
    val got = graft.ops.Trajectory.legs(pts)
      .orderBy("user_id", "sec", "event_id").collect()
    assert(got.length == 3)
    val leg1 = got(0); val leg2 = got(1); val leg3 = got(2)
    assert(leg1.getLong(3) == 100L && !leg1.isNullAt(5)) // dt, speed present
    assert(math.abs(leg1.getDouble(6) - 90.0) < 1e-6)    // east
    assert(leg1.isNullAt(7))                             // first leg: no turn
    assert(math.abs(leg2.getDouble(6) - 0.0) < 1e-6)     // north
    assert(math.abs(leg2.getDouble(7) + 90.0) < 1e-6)    // left turn
    assert(leg3.isNullAt(5) && leg3.getLong(3) == 0L)    // tied sec
    // engine == golden over the gate fixture
    val sfDir = "/root/testdata/sf0.001"
    graft.model.Tables.registerBase(spark, sfDir)
    val latU = udf((u: Long, e: Long, sec: Long) => graft.model.Synth.trajLat(u, e, sec))
    val lngU = udf((u: Long, e: Long, sec: Long) => graft.model.Synth.trajLng(u, e, sec))
    val ev = spark.table("events").select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("sec"))
      .withColumn("lat", latU(col("user_id"), col("event_id"), col("sec")))
      .withColumn("lng", lngU(col("user_id"), col("event_id"), col("sec")))
    val eng = graft.ops.Trajectory.legs(ev).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
      .sortBy(t => (t._1, t._3, t._2)).toSeq
    val gold = graft.oracle.Golden.trajLegsG(
        graft.oracle.Golden.loadEvents(spark, sfDir))
      .sortBy(t => (t._1, t._3, t._2))
    assert(eng == gold)
    // kernel pin: bearing north/east conventions
    assert(math.abs(Geo.initialBearingDeg(0, 0, 1, 0) - 0.0) < 1e-9)
    assert(math.abs(Geo.initialBearingDeg(0, 0, 0, 1) - 90.0) < 1e-9)
  }

  test("giStar equals the naive Gi* recomputation (same op order)") {
    import spark.implicits._
    val zoom = 10
    // a hot 2x2 cluster + scattered singles, built from real lat/lngs
    val anchors = Seq(
      (51.50, -0.12, 40), (51.50, 0.24, 30), (51.15, -0.12, 20), (51.15, 0.24, 10),
      (-33.86, 151.2, 5), (35.68, 139.7, 3), (40.7, -74.0, 1))
    val pts = anchors.zipWithIndex.flatMap { case ((la, lg, n), k) =>
      (0 until n).map(i => (k * 1000L + i, la + i * 1e-6, lg + i * 1e-6))
    }.toDF("image_id", "lat", "lng")
    val got = Tiling.giStar(pts, zoom)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap

    // naive: counts via the shared tile kernel, stats via the documented
    // formula in the SAME op order as Tiling.GiStarZSql
    val counts = pts.collect().map(r =>
        Tiles.tileFromLatLng(r.getDouble(1), r.getDouble(2), zoom))
      .groupBy(identity).map { case (t, v) => (t, v.length.toLong) }
    val nn = counts.size.toLong
    val s1 = counts.values.sum
    val s2 = counts.values.map(v => v * v).sum
    val side = 1L << zoom
    val want = counts.keys.flatMap { case (x, y) =>
      val nbs = for {
        dx <- -1 to 1; dy <- -1 to 1
        k = (((x + dx) % side + side) % side, y + dy)
        v <- counts.get(k)
      } yield v
      val gi = nbs.sum; val wi = nbs.size.toLong
      if (wi < nn && s2 * nn > s1 * s1) {
        val xbar = s1.toDouble / nn.toDouble
        val z = (gi.toDouble - xbar * wi.toDouble) /
          (math.sqrt(s2.toDouble / nn.toDouble - xbar * xbar) *
            math.sqrt((nn.toDouble * wi.toDouble - wi.toDouble * wi.toDouble) /
              (nn.toDouble - 1.0)))
        Some(((x, y), z))
      } else None
    }.toMap
    assert(got.keySet == want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) <= 1e-12 * math.max(1.0, math.abs(v)),
        s"tile $k: got ${got(k)} want $v")
    // the hot cluster's tiles must be the extreme positive z-scores
    val hot = Tiles.tileFromLatLng(51.50, -0.12, zoom)
    assert(got(hot) == got.values.max)
  }
}
