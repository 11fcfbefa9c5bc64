package graft

import graft.core.Geo
import graft.model.Tables
import graft.ops.DistanceJoin
import graft.oracle.Golden
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Distance-bounded self-join vs brute-force all-pairs, plus plan shape. */
class DistanceJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("distjoin-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def points(): Array[(Long, Double, Double)] =
    Tables.images(spark, sfDir).select("image_id", "lat", "lng")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

  private def run(radius: Double, pts: Array[(Long, Double, Double)]): Set[(Long, Long)] = {
    import spark.implicits._
    DistanceJoin.withinDistancePairs(
      pts.toSeq.toDF("id", "lat", "lng"), radius)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def brute(radius: Double, pts: Array[(Long, Double, Double)]): Set[(Long, Long)] =
    (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      d = Golden.haversineColumn(pts(i)._2, pts(i)._3, pts(j)._2, pts(j)._3)
      if d <= radius
    } yield (math.min(pts(i)._1, pts(j)._1), math.max(pts(i)._1, pts(j)._1))).toSet

  test("within-distance pairs equal brute force (dense urban subset, 150/200/1000 m)") {
    val pts = points().filter(p =>
      p._2 >= DistanceJoin.GateLatLo && p._2 <= DistanceJoin.GateLatHi &&
        p._3 >= DistanceJoin.GateLngLo && p._3 <= DistanceJoin.GateLngHi)
    assert(pts.length > 50, s"fixture degenerate: ${pts.length} points")
    for (r <- Seq(150.0, 200.0, 1000.0)) {
      val got = run(r, pts)
      val want = brute(r, pts)
      assert(got === want, s"radius $r: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty, s"radius $r produced no pairs — fixture degenerate")
    }
  }

  test("within-distance pairs equal brute force on the sparse global table") {
    // the full sf0.001 table (6k points, mostly ~uniform): exercises cell
    // boundaries far from the hot caps; 20 km keeps brute force meaningful
    val pts = points()
    val got = run(20000.0, pts)
    val want = brute(20000.0, pts)
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("golden sweep equals brute force (independent recomputation check)") {
    val imgs = Golden.loadImages(spark, sfDir)
    val g = Golden.distPairsG(imgs, DistanceJoin.GateLatLo, DistanceJoin.GateLatHi,
      DistanceJoin.GateLngLo, DistanceJoin.GateLngHi, DistanceJoin.GateRadiusMeters)
      .map(p => (p._1, p._2)).toSet
    val pts = points().filter(p =>
      p._2 >= DistanceJoin.GateLatLo && p._2 <= DistanceJoin.GateLatHi &&
        p._3 >= DistanceJoin.GateLngLo && p._3 <= DistanceJoin.GateLngHi)
    assert(g === brute(DistanceJoin.GateRadiusMeters, pts))
  }

  test("levelForRadius: coverings stay small across radii") {
    for (r <- Seq(10.0, 60.0, 500.0, 5000.0, 100000.0)) {
      val angle = r / Geo.EarthRadiusMeters
      val lvl = DistanceJoin.levelForRadius(angle)
      assert(lvl >= 0 && lvl <= 16)
      // a cap of radius r at the London center covers few level-lvl cells
      val cells = graft.core.S2.coveringAtLevel(
        graft.core.S2.Cap(Geo.toXYZ(51.5074, -0.1278), angle), lvl)
      assert(cells.nonEmpty && cells.length <= 12,
        s"radius $r -> level $lvl covering ${cells.length} cells")
    }
  }

  private def runJoin(radius: Double, l: Array[(Long, Double, Double)],
                      r: Array[(Long, Double, Double)]): Set[(Long, Long)] = {
    import spark.implicits._
    DistanceJoin.withinDistanceJoin(
      l.toSeq.toDF("id", "lat", "lng"), r.toSeq.toDF("id", "lat", "lng"), radius)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  private def bruteJoin(radius: Double, l: Array[(Long, Double, Double)],
                        r: Array[(Long, Double, Double)]): Set[(Long, Long)] =
    (for {
      a <- l; b <- r
      if Golden.haversineColumn(a._2, a._3, b._2, b._3) <= radius
    } yield (a._1, b._1)).toSet

  test("two-table join equals brute force (disjoint id split, 150/1000 m)") {
    val pts = points().filter(p =>
      p._2 >= DistanceJoin.GateLatLo && p._2 <= DistanceJoin.GateLatHi &&
        p._3 >= DistanceJoin.GateLngLo && p._3 <= DistanceJoin.GateLngHi)
    val (l, r) = pts.partition(_._1 % DistanceJoin.GateJoinMod == 0)
    assert(l.length > 5 && r.length > 2 * l.length,
      s"fixture degenerate: ${l.length}/${r.length}")
    for (rad <- Seq(150.0, 1000.0)) {
      val got = runJoin(rad, l, r)
      val want = bruteJoin(rad, l, r)
      assert(got === want, s"radius $rad: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty, s"radius $rad produced no pairs — fixture degenerate")
    }
  }

  test("two-table join with overlapping tables keeps directed + self pairs") {
    val pts = points().filter(p =>
      p._2 >= DistanceJoin.GateLatLo && p._2 <= DistanceJoin.GateLatHi &&
        p._3 >= DistanceJoin.GateLngLo && p._3 <= DistanceJoin.GateLngHi)
    val got = runJoin(150.0, pts, pts)
    // documented contract: same table on both sides → every self pair at
    // distance 0, and both directions of every undirected pair
    assert(pts.forall(p => got.contains((p._1, p._1))))
    val undirected = run(150.0, pts)
    assert(got.filter(p => p._1 != p._2) ===
      undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) })
  }

  test("two-table golden sweep equals brute force (independent recomputation)") {
    val imgs = Golden.loadImages(spark, sfDir)
    val d = DistanceJoin
    val g = Golden.distJoinG(imgs, d.GateLatLo, d.GateLatHi, d.GateLngLo,
      d.GateLngHi, d.GateRadiusMeters, d.GateJoinMod)
      .map(p => (p._1, p._2)).toSet
    val pts = points().filter(p =>
      p._2 >= d.GateLatLo && p._2 <= d.GateLatHi &&
        p._3 >= d.GateLngLo && p._3 <= d.GateLngHi)
    val (l, r) = pts.partition(_._1 % d.GateJoinMod == 0)
    assert(g === bruteJoin(d.GateRadiusMeters, l, r))
  }

  test("plan: equi-join, no cartesian/BNLJ, and the pair emit needs no distinct") {
    import spark.implicits._
    val pts = points().take(500).toSeq.toDF("id", "lat", "lng")
    for (plan <- Seq(
      DistanceJoin.withinDistancePairs(pts, 60.0)
        .queryExecution.executedPlan.toString,
      DistanceJoin.withinDistanceJoin(
          pts.where(col("id") % 10 === 0), pts.where(col("id") % 10 =!= 0), 60.0)
        .queryExecution.executedPlan.toString)) {
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("HashAggregate"),
        "unexpected aggregate (distinct?) in the pair plan:\n" + plan)
    }
  }
}
