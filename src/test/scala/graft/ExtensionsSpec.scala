package graft

import graft.core.Geo
import graft.model.Tables
import graft.plans.GraftExtensions
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
    // the guard bounds must be the expected literals
    val dLat = r / 111000.0
    assert(optimized.contains((qLat - dLat).toString.take(8)), optimized)
  }

  test("two cap predicates in one filter both get pruned") {
    val images = Tables.images(spark, sfDir)
    val q = images.where(
      GraftExtensions.withinCap(col("lat"), col("lng"), qLat, qLng, r) ||
        GraftExtensions.withinCap(col("lat"), col("lng"), 40.7128, -74.006, r))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert("within_cap".r.findAllIn(optimized).size == 2, optimized)
    assert(optimized.contains((40.7128 - r / 111000.0).toString.take(7)), optimized)
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
