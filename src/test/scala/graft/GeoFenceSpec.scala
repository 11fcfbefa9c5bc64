package graft

import graft.ops.GeoFence
import graft.oracle.Golden
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Geofence enter/exit transitions: engine (pruned probe + window diff) vs
  * the no-prune golden, hand-built boundary semantics, plan shape. */
class GeoFenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("geofence-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(pts: Seq[(Long, Long, Long, Double, Double)]): Seq[(Long, Long, Long, String, String)] = {
    import spark.implicits._
    GeoFence.transitions(pts.toDF("user_id", "event_id", "sec", "lat", "lng"),
        graft.model.Synth.regions)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
      .sortBy(t => (t._1, t._3, t._2, t._4, t._5)).toSeq
  }

  test("engine equals the no-prune golden on the urban trajectory fixture") {
    val evs = Golden.loadEvents(spark, sfDir)
    val want = Golden.geofenceTransG(evs)
      .sortBy(t => (t._1, t._3, t._2, t._4, t._5))
    assert(want.size > 50, s"fixture degenerate: ${want.size} transitions")
    assert(want.map(_._5).toSet === Set("enter", "exit"))
    assert(want.map(_._4).toSet.size >= 3, "should touch all three urban fences")
    val pts = evs.map(e => (e.userId, e.eventId, e.sec,
      graft.model.Synth.urbanTrajLat(e.userId, e.eventId, e.sec),
      graft.model.Synth.urbanTrajLng(e.userId, e.eventId, e.sec))).toSeq
    assert(run(pts) === want)
  }

  test("semantics: first-point-inside enters, re-entry, no trailing exit, hole excluded") {
    val (cLat, cLng) = graft.model.Synth.hotCenters(0)
    val in = (cLat + 0.015, cLng)   // 1.7 km N: outside the 700 m hole, inside the shell
    val out = (cLat + 0.05, cLng)   // 5.5 km N: outside
    val hole = (cLat, cLng)         // region 0 has an even-odd hole at its center
    // user 1: out, in, in, out, in (trailing inside -> no exit)
    val u1 = Seq((1L, 1L, 10L, out), (1L, 2L, 20L, in), (1L, 3L, 30L, in),
      (1L, 4L, 40L, out), (1L, 5L, 50L, in))
    // user 2: starts inside -> enter at first point; hole point = exit
    val u2 = Seq((2L, 6L, 10L, in), (2L, 7L, 20L, hole))
    val pts = (u1 ++ u2).map { case (u, e, s, (la, lo)) => (u, e, s, la, lo) }
    val got = run(pts).filter(_._4 == "reg-0000")
    assert(got === Seq(
      (1L, 2L, 20L, "reg-0000", "enter"), (1L, 4L, 40L, "reg-0000", "exit"),
      (1L, 5L, 50L, "reg-0000", "enter"),
      (2L, 6L, 10L, "reg-0000", "enter"), (2L, 7L, 20L, "reg-0000", "exit")))
  }

  test("plan: one window exchange, no join node anywhere") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 10L, 51.5074, -0.1278)).toDF("user_id", "event_id", "sec", "lat", "lng")
    val plan = GeoFence.transitions(pts, graft.model.Synth.regions)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith(":- Exchange")) <= 1, plan)
  }
}
