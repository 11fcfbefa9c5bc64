package graft

import graft.core.Geo
import graft.model.{Synth, Tables}
import graft.ops.Sightline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SightlineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("sightline-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("empty scene yields the full cap ring at the radius") {
    val poly = Sightline.visibilityPolygon(Array.empty, 100.0)
    assert(poly.length == 32)
    poly.foreach { case (x, y) =>
      assert(math.abs(math.hypot(x, y) - 100.0) < 1e-6)
    }
  }

  test("a wall occludes points behind it, leaves the rest at the radius") {
    // vertical wall at x=50 spanning y in [-100, 100]; origin at (0,0)
    val wall = Array(((50.0, -100.0), (50.0, 100.0)))
    val poly = Sightline.visibilityPolygon(wall, 200.0)
    poly.foreach { case (x, y) =>
      val r = math.hypot(x, y)
      val ang = math.atan2(y, x)
      // rays toward the wall (|ang| < atan(100/50)-margin) stop at x≈50
      if (math.abs(ang) < math.atan2(100, 50) - 0.05)
        assert(math.abs(x - 50.0) < 1e-6 || r < 200.0 - 1e-6,
          s"ray at $ang should hit the wall: ($x,$y)")
      else if (math.abs(ang) > math.atan2(100, 50) + 0.05)
        assert(math.abs(r - 200.0) < 1e-6, s"ray at $ang should be free: r=$r")
    }
    // the point straight ahead is exactly on the wall
    val ahead = poly.minBy { case (x, y) => math.abs(math.atan2(y, x)) }
    assert(math.abs(ahead._1 - 50.0) < 1e-6 && math.abs(ahead._2) < 1.0)
  }

  test("sightlines operator: urban origin is occluded, remote origin is free") {
    val (cLat, cLng) = Synth.hotCenters(0) // London urban polygon around it
    val origins = Seq((1L, cLat, cLng), (2L, 10.0, 10.0)) // 2: open ocean
    val out = Sightline.sightlines(spark, origins, Tables.regions(spark), 5000.0)
      .collect().map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)))
      .toMap
    // origin 1 sits inside reg-0000 (3 km shell): some rays must terminate
    // before the 5 km radius
    val rs1 = out(1L).map(p => math.hypot(p.getDouble(0), p.getDouble(1)))
    assert(rs1.exists(_ < 5000.0 - 1.0), "urban origin should be occluded")
    // origin 2 has no barriers within 5 km -> still emitted, as the full
    // 32-vertex cap at the radius (left-join semantics, ADVICE r01 — matches
    // visibilityPolygon's empty-scene behavior)
    val rs2 = out(2L).map(p => math.hypot(p.getDouble(0), p.getDouble(1)))
    assert(out(2L).length == 32)
    rs2.foreach(r => assert(math.abs(r - 5000.0) < 1e-6))
  }

  test("cell-pruned barrier selection equals brute force over all segments") {
    val origins = Seq((1L, Synth.hotCenters(0)._1, Synth.hotCenters(0)._2),
      (2L, Synth.hotCenters(1)._1 + 0.02, Synth.hotCenters(1)._2 - 0.01))
    val radius = 5000.0
    val out = Sightline.sightlines(spark, origins, Tables.regions(spark), radius)
      .collect().map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1).length)).toMap
    // brute force: exact segNear over every region shell segment, no prune
    origins.foreach { case (id, oLat, oLng) =>
      val cosO = math.cos(math.toRadians(oLat))
      def local(lat: Double, lng: Double) =
        ((lng - oLng) * 111320.0 * cosO, (lat - oLat) * 111320.0)
      val barriers = Synth.regions.flatMap { reg =>
        val (ys, xs) = reg.rings(0)
        ys.indices.flatMap { i =>
          val j = (i + 1) % ys.length
          val d = graft.ops.Polyline.distanceToPolylineMeters(oLat, oLng,
            Array(ys(i), ys(j)), Array(xs(i), xs(j)))
          if (d <= radius) Some((local(ys(i), xs(i)), local(ys(j), xs(j)))) else None
        }
      }
      val expected = Sightline.visibilityPolygon(barriers, radius).length
      assert(out(id) == expected, s"origin $id: pruned join must equal brute force")
    }
  }

  test("a scene denser than maxBarriers fails loudly instead of sweeping") {
    val (cLat, cLng) = Synth.hotCenters(0)
    val e = intercept[org.apache.spark.SparkException] {
      Sightline.sightlines(spark, Seq((1L, cLat, cLng)), Tables.regions(spark),
          5000.0, maxBarriers = 2)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("maxBarriers")))
    // and the identical scene under the default bound is unchanged
    val ok = Sightline.sightlines(spark, Seq((1L, cLat, cLng)), Tables.regions(spark), 5000.0)
      .collect()
    assert(ok.length == 1)
  }
}
