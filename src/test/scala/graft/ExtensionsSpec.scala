package graft

import graft.core.Geo
import graft.model.Tables
import graft.plans.{GraftExtensions, PruneWithinCap}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("extensions-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val qLat = 51.5074; val qLng = -0.1278; val r = 5000.0

  test("capBounds is sound: every cap-boundary point stays inside the box") {
    // destination point at distance r, bearing b (standard great-circle)
    def dest(lat: Double, lng: Double, rM: Double, bearing: Double): (Double, Double) = {
      val d = rM / Geo.EarthRadiusMeters
      val p1 = math.toRadians(lat); val l1 = math.toRadians(lng)
      val p2 = math.asin(math.sin(p1) * math.cos(d) +
        math.cos(p1) * math.sin(d) * math.cos(bearing))
      val l2 = l1 + math.atan2(math.sin(bearing) * math.sin(d) * math.cos(p1),
        math.cos(d) - math.sin(p1) * math.sin(p2))
      (math.toDegrees(p2), math.toDegrees(l2))
    }
    val rnd = new scala.util.Random(7)
    var checked = 0
    (0 until 400).foreach { _ =>
      val la = -88.0 + 176.0 * rnd.nextDouble()
      val lo = -179.0 + 358.0 * rnd.nextDouble()
      val rr = math.pow(10.0, 2 + 4.3 * rnd.nextDouble()) // 100 m .. ~2000 km
      graft.plans.PruneWithinCap.capBounds(la, lo, rr).foreach {
        case (latLo, latHi, lngLo, lngHi) =>
          checked += 1
          (0 until 64).foreach { k =>
            val (pla, plo) = dest(la, lo, rr * 0.999, 2 * math.Pi * k / 64.0)
            assert(pla >= latLo && pla <= latHi, s"lat $pla outside [$latLo,$latHi] cap=($la,$lo,$rr)")
            assert(plo >= lngLo && plo <= lngHi, s"lng $plo outside [$lngLo,$lngHi] cap=($la,$lo,$rr)")
          }
      }
    }
    assert(checked > 100) // most random caps must still get the rewrite
    // pole-reaching and antimeridian-crossing caps must skip the rewrite
    assert(graft.plans.PruneWithinCap.capBounds(89.0, 0.0, 500000.0).isEmpty)
    assert(graft.plans.PruneWithinCap.capBounds(10.0, 179.9, 100000.0).isEmpty)
  }

  test("within_cap evaluates the exact haversine predicate") {
    val images = Tables.images(spark, sfDir)
    val got = images
      .where(GraftExtensions.withinCap(col("lat"), col("lng"), qLat, qLng, r))
      .select("image_id").collect().map(_.getLong(0)).toSet
    val want = images.select("image_id", "lat", "lng").collect()
      .filter(rw => Geo.haversineMeters(rw.getDouble(1), rw.getDouble(2), qLat, qLng) <= r)
      .map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("PruneWithinCap injects the bounding-box guard into the plan") {
    val images = Tables.images(spark, sfDir)
    val q = images.where(GraftExtensions.withinCap(col("lat"), col("lng"), qLat, qLng, r))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("within_cap"), optimized)
    assert(optimized.contains(">=") && optimized.contains("<="),
      s"bbox prune conjuncts missing:\n$optimized")
    // the guard bounds must be the exact sound cap bounds
    val (latLo, _, lngLo, _) = PruneWithinCap.capBounds(qLat, qLng, r).get
    assert(optimized.contains(latLo.toString.take(8)), optimized)
    assert(optimized.contains(lngLo.toString.take(8)), optimized)
  }

  test("two cap predicates in one filter both get pruned") {
    val images = Tables.images(spark, sfDir)
    val q = images.where(
      GraftExtensions.withinCap(col("lat"), col("lng"), qLat, qLng, r) ||
        GraftExtensions.withinCap(col("lat"), col("lng"), 40.7128, -74.006, r))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert("within_cap".r.findAllIn(optimized).size == 2, optimized)
    assert(optimized.contains(
      PruneWithinCap.capBounds(40.7128, -74.006, r).get._1.toString.take(7)), optimized)
    val n = q.count()
    val manual = images.where(
      graft.functions.Udfs.haversineMeters(col("lat"), col("lng"), lit(qLat), lit(qLng)) <= r ||
        graft.functions.Udfs.haversineMeters(col("lat"), col("lng"), lit(40.7128), lit(-74.006)) <= r)
      .count()
    assert(n == manual && n > 0)
  }

  test("rule rewrite preserves results exactly") {
    // same predicate WITHOUT extensions (plain column haversine)
    val plain = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val images = Tables.images(spark, sfDir)
    val withRule = images
      .where(GraftExtensions.withinCap(col("lat"), col("lng"), qLat, qLng, r))
      .select("image_id").collect().map(_.getLong(0)).toSet
    val manual = images
      .where(graft.functions.Udfs.haversineMeters(
        col("lat"), col("lng"), lit(qLat), lit(qLng)) <= r)
      .select("image_id").collect().map(_.getLong(0)).toSet
    assert(withRule == manual)
  }
}
