package graft

import graft.ops.{CoVisit, DistanceJoin}
import graft.oracle.Golden
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Spatio-temporal co-visit join vs brute-force all-pairs, boundary and
  * bucket-straddle semantics, and plan shape. */
class CoVisitSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("covisit-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(id: Long): Long = (id * 40507L) % 86400L

  private def rectPts(): Seq[(Long, Double, Double, Long)] =
    graft.model.Tables.images(spark, sfDir).select("image_id", "lat", "lng")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), ts(r.getLong(0))))
      .filter(p => p._2 >= DistanceJoin.GateLatLo && p._2 <= DistanceJoin.GateLatHi &&
        p._3 >= DistanceJoin.GateLngLo && p._3 <= DistanceJoin.GateLngHi).toSeq

  private def run(pts: Seq[(Long, Double, Double, Long)], r: Double,
                  w: Long): Set[(Long, Long, Long)] = {
    import spark.implicits._
    CoVisit.covisitPairs(pts.toDF("id", "lat", "lng", "ts"), r, w)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3))).toSet
  }

  private def brute(pts: Seq[(Long, Double, Double, Long)], r: Double,
                    w: Long): Set[(Long, Long, Long)] =
    (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      dt = math.abs(pts(i)._4 - pts(j)._4)
      if dt <= w
      if Golden.haversineColumn(pts(i)._2, pts(i)._3, pts(j)._2, pts(j)._3) <= r
      (a, b) = if (pts(i)._1 < pts(j)._1) (pts(i)._1, pts(j)._1)
               else (pts(j)._1, pts(i)._1)
    } yield (a, b, dt)).toSet

  test("co-visit pairs equal brute force (urban fixture, 3 param sets)") {
    val pts = rectPts()
    assert(pts.length > 50)
    for ((r, w) <- Seq((150.0, 600L), (150.0, 3600L), (1000.0, 600L))) {
      val got = run(pts, r, w)
      val want = brute(pts, r, w)
      assert(got === want, s"r=$r w=$w: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty, s"r=$r w=$w produced no pairs — fixture degenerate")
      // the time filter must actually cut relative to the pure spatial join
      assert(want.size < brute(pts, r, Long.MaxValue / 4).size,
        s"r=$r w=$w: window did not filter anything — fixture degenerate")
    }
  }

  test("golden sweep equals brute force (independent recomputation check)") {
    val imgs = Golden.loadImages(spark, sfDir)
    val d = DistanceJoin; val c = CoVisit
    val g = Golden.covisitG(imgs, d.GateLatLo, d.GateLatHi, d.GateLngLo,
        d.GateLngHi, c.GateRadiusMeters, c.GateWindowSeconds)
      .map(p => (p._1, p._2, p._4)).toSet
    assert(g === brute(rectPts(), c.GateRadiusMeters, c.GateWindowSeconds))
  }

  test("time boundary inclusive; bucket straddle; negative ts floor division") {
    // colocated points (dist 0) with hand-placed timestamps around w=100:
    // dt=100 in, dt=101 out; (250, 349) straddles the 300 bucket edge — the
    // probe's 3-bucket explode must catch it; negative ts exercises pmod
    // floor semantics (-50 is in bucket -1, 40 in bucket 0, dt=90 <= 100)
    val pts = Seq(
      (1L, 10.0, 20.0, 1000L), (2L, 10.0, 20.0, 1100L), // dt=100 -> in
      (3L, 10.0, 20.0, 1201L),                          // dt(2,3)=101 -> out
      (4L, 10.0, 20.0, 250L), (5L, 10.0, 20.0, 349L),   // straddle -> in
      (6L, 10.0, 20.0, -50L), (7L, 10.0, 20.0, 40L))    // negative ts -> in
    val got = run(pts, 10.0, 100L)
    val want = brute(pts, 10.0, 100L)
    assert(got === want)
    assert(got.contains((1L, 2L, 100L)) && !got.exists(p => p._1 == 2 && p._2 == 3))
    assert(got.contains((4L, 5L, 99L)) && got.contains((6L, 7L, 90L)))
  }

  test("plan: composite equi-join, no cartesian/BNLJ, no distinct aggregate") {
    import spark.implicits._
    val pts = rectPts().take(200).toDF("id", "lat", "lng", "ts")
    val plan = CoVisit.covisitPairs(pts, 150.0, 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("HashAggregate"),
      "unexpected aggregate (distinct?) in the pair plan:\n" + plan)
  }
}
