package graft

import graft.core.Geo
import graft.model.{Synth, Tables}
import graft.ops.{Elevation, Polyline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PolylineSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("polyline-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("distance to polyline: endpoint, interior projection, single point") {
    // straight segment along the equator from lng 0 to 0.01
    val la = Array(0.0, 0.0)
    val lo = Array(0.0, 0.01)
    // point due north of the middle: distance = |lat| in meters
    val dMid = Polyline.distanceToPolylineMeters(0.005, 0.005, la, lo)
    assert(math.abs(dMid - Geo.haversineMeters(0.005, 0.005, 0, 0.005)) < 1.0)
    // point beyond the end: distance to the endpoint
    val dEnd = Polyline.distanceToPolylineMeters(0.0, 0.02, la, lo)
    assert(math.abs(dEnd - Geo.haversineMeters(0, 0.02, 0, 0.01)) < 1.0)
  }

  test("polylines cross iff their segments strictly cross") {
    val x1 = (Array(-0.01, 0.01), Array(0.0, 0.0))
    val x2 = (Array(0.0, 0.0), Array(-0.01, 0.01))
    assert(Polyline.polylinesCross(x1._1, x1._2, x2._1, x2._2))
    val far = (Array(1.0, 1.02), Array(1.0, 1.0))
    assert(!Polyline.polylinesCross(x1._1, x1._2, far._1, far._2))
  }

  test("nearest-path join equals brute force within the radius") {
    val points = Tables.images(spark, sfDir)
      .select(col("image_id").as("id"), col("lat"), col("lng"), col("cell16"))
    val got = Polyline.nearestPathJoin(points, Tables.paths(spark), 500.0)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap

    val pts = points.select("id", "lat", "lng").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = pts.flatMap { case (id, lat, lng) =>
      val cands = Synth.paths.map(p =>
          (p.pathId, Polyline.distanceToPolylineMeters(lat, lng, p.lats, p.lngs)))
        .filter(_._2 <= 500.0)
      if (cands.isEmpty) None
      else Some(id -> cands.minBy(c => (c._2, c._1)))
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (pid, d)) =>
      assert(pid == want(id)._1 && math.abs(d - want(id)._2) < 1e-9, s"point $id")
    }
    assert(got.nonEmpty, "fixture should produce matches near hot caps")
  }

  test("path ops: sample-points, vertex table, degree") {
    val paths = Tables.paths(spark)
    val nPaths = Synth.paths.length

    val samples = Polyline.samplePointsAlongPaths(paths, 5)
    assert(samples.count() <= nPaths * 5L && samples.count() >= nPaths.toLong)
    // the first sample of each path is its first vertex
    val first = samples.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    Synth.paths.take(3).foreach { p =>
      assert(first.exists { case (id, la, lo) =>
        id == p.pathId && la == p.lats(0) && lo == p.lngs(0) })
    }

    val verts = Polyline.vertices(paths)
    assert(verts.count() == Synth.paths.map(_.lats.length).sum)

    val deg = Polyline.degree(paths).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    // every vertex has degree >= 1; totals match the vertex table
    assert(deg.values.sum == verts.count())

    val p0 = Synth.paths(0)
    val through = Polyline.pointPaths(paths, p0.lats(2), p0.lngs(2))
      .collect().map(_.getString(0))
    assert(through.contains(p0.pathId))
  }

  test("elevation IDW equals brute force") {
    val imgs = Tables.images(spark, sfDir)
    val sampleDf = imgs.where(col("image_id") % 40 === 0)
      .select(col("lat").as("s_lat"), col("lng").as("s_lng"),
        (col("image_id") % 1000).cast("double").as("height"))
    val sampleRows = sampleDf.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val points = imgs.select(col("image_id").as("id"), col("lat"), col("lng"), col("cell16"))
    val got = Elevation.elevations(points, sampleDf, 3000.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

    val pts = points.select("id", "lat", "lng").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = pts.flatMap { case (id, lat, lng) =>
      val in = sampleRows.map { case (sa, so, h) =>
        (Geo.haversineMeters(lat, lng, sa, so), h)
      }.filter(_._1 <= 3000.0)
      if (in.isEmpty) None
      else {
        // replicate the operator's fixed-point accumulation exactly (the
        // quantization makes the distributed sum order-independent, so the
        // brute force must quantize identically for a bit-exact compare)
        val ws = in.map { case (d, h) => (1.0 / math.max(d, 1.0), h) }
        val sumWq = ws.map { case (w, _) => math.floor(w * (1L << 24).toDouble).toLong }.sum
        val sumCq = ws.map { case (w, h) => math.floor(w * h * (1L << 20).toDouble).toLong }.sum
        Some(id -> (sumCq.toDouble / (1L << 20).toDouble) / (sumWq.toDouble / (1L << 24).toDouble))
      }
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) =>
      assert(v == want(id), s"point $id: $v vs ${want(id)}")
    }
    assert(got.nonEmpty)
  }

  test("path join drops the shared vertex; keeps both otherwise") {
    val (la1, lo1) = Polyline.joinPathsKernel(
      Array(0.0, 1.0), Array(0.0, 0.0), Array(1.0, 2.0), Array(0.0, 0.0))
    assert(la1.toSeq == Seq(0.0, 1.0, 2.0))
    val (la2, _) = Polyline.joinPathsKernel(
      Array(0.0, 1.0), Array(0.0, 0.0), Array(5.0, 6.0), Array(0.0, 0.0))
    assert(la2.toSeq == Seq(0.0, 1.0, 5.0, 6.0))
    assert(lo1.length == 3)
  }

  test("ordered-join fixes orientation in all four cases and rejects disjoint") {
    val a = (Array(0.0, 1.0), Array(0.0, 0.0))
    def oj(b: (Array[Double], Array[Double])) =
      Polyline.orderedJoinKernel(a._1, a._2, b._1, b._2).map(_._1.toSeq)
    assert(oj((Array(1.0, 2.0), Array(0.0, 0.0))) == Some(Seq(0.0, 1.0, 2.0)))   // FF
    assert(oj((Array(2.0, 1.0), Array(0.0, 0.0))) == Some(Seq(0.0, 1.0, 2.0)))   // FT
    assert(oj((Array(0.0, -1.0), Array(0.0, 0.0))) == Some(Seq(1.0, 0.0, -1.0))) // TF
    assert(oj((Array(-1.0, 0.0), Array(0.0, 0.0))) == Some(Seq(1.0, 0.0, -1.0))) // TT
    assert(oj((Array(5.0, 6.0), Array(5.0, 5.0))).isEmpty)
  }

  test("snap-area-edges kernel: near edge snaps onto the path, far edges stay") {
    // straight path along the equator; square ring whose bottom edge is
    // ~55 m north of it and whose top edge is ~222 m away
    val pLat = Array(0.0, 0.0)
    val pLng = Array(-0.01, 0.01)
    val ringLat = Array(0.0005, 0.0005, 0.002, 0.002)
    val ringLng = Array(-0.005, 0.005, 0.005, -0.005)
    val (sla, slo, n) = Polyline.snapRingKernel(ringLat, ringLng,
      Array((pLat, pLng)), thresholdM = 100.0, joinM = 0.1)
    assert(n == 1, "exactly the bottom edge should snap")
    // snapped bottom edge endpoints project onto the equator path
    assert(math.abs(sla(0)) < 1e-9 && math.abs(slo(0) - (-0.005)) < 1e-9)
    assert(math.abs(sla(1)) < 1e-9 && math.abs(slo(1) - 0.005) < 1e-9)
    // stitch keeps the gap endpoints -> 6 vertices total
    assert(sla.length == 6)
    // unchanged corners survive verbatim
    assert(sla.contains(0.002) && slo.contains(-0.005))
    // no candidate in range -> ring unchanged, zero snaps
    val (ula, ulo, u) = Polyline.snapRingKernel(ringLat, ringLng,
      Array((Array(5.0, 5.0), Array(5.0, 5.1))), thresholdM = 100.0, joinM = 0.1)
    assert(u == 0 && ula.toSeq == ringLat.toSeq && ulo.toSeq == ringLng.toSeq)
  }

  test("snap-area-edges operator: pruned candidate join equals brute force") {
    val spokes = spark.createDataFrame(Synth.spokePaths.toSeq.map(p =>
        (p.pathId, p.lats.toSeq, p.lngs.toSeq)))
      .toDF("path_id", "lats", "lngs")
    val got = Polyline.snapAreaEdges(
        Tables.regions(spark), Tables.paths(spark).unionByName(spokes), 2000.0)
      .collect().map(r => (r.getString(0),
        (r.getSeq[Double](1).toSeq, r.getSeq[Double](2).toSeq, r.getInt(3)))).toMap
    // path_id order, matching the engine's deterministic candidate sort
    val cands = (Synth.paths ++ Synth.spokePaths).sortBy(_.pathId)
      .map(p => (p.lats, p.lngs))
    var snappedRegions = 0
    Synth.regions.foreach { r =>
      val (la, lo) = r.rings(0)
      val (wla, wlo, wn) = Polyline.snapRingKernel(la, lo, cands, 2000.0, 0.1)
      val (gla, glo, gn) = got(r.regionId)
      assert(gn == wn, s"${r.regionId}: snapped-edge count")
      assert(gla == wla.toSeq && glo == wlo.toSeq, s"${r.regionId}: ring mismatch")
      if (wn > 0) snappedRegions += 1
    }
    assert(snappedRegions > 0, "fixture must exercise actual snapping")
  }
}
