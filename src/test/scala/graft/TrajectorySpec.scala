package graft

import graft.core.Geo
import graft.ops.Trajectory
import graft.oracle.Golden
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stay-point detection: engine (distributed scan) vs the independent
  * recursive golden vs hand-built semantics fixtures. */
class TrajectorySpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("trajectory-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(pts: Seq[(Long, Long, Long, Double, Double)], r: Double,
                  minDur: Long): Seq[(Long, Long, Long, Int, Double, Double)] = {
    import spark.implicits._
    Trajectory.stayPoints(pts.toDF("user_id", "event_id", "sec", "lat", "lng"),
        r, minDur)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getInt(3), x.getDouble(4), x.getDouble(5)))
      .sortBy(s => (s._1, s._2)).toSeq
  }

  test("engine equals independent golden on the synthetic trajectory fixture") {
    val evs = Golden.loadEvents(spark, sfDir)
    val t = Trajectory
    val want = Golden.stayPointsG(evs, t.GateRadiusMeters, t.GateMinDurationSeconds)
    assert(want.size > 20, s"fixture degenerate: ${want.size} stays")
    val pts = evs.map(e => (e.userId, e.eventId, e.sec,
      graft.model.Synth.trajLat(e.userId, e.eventId, e.sec),
      graft.model.Synth.trajLng(e.userId, e.eventId, e.sec))).toSeq
    val got = run(pts, t.GateRadiusMeters, t.GateMinDurationSeconds)
    assert(got === want.sortBy(s => (s._1, s._2)))
    // fixture sanity: travel blocks must break runs — more than one stay
    // per active user on average, and not every event inside a stay
    assert(want.map(_._4).sum < evs.length)
  }

  test("greedy semantics: duration gate, anchor drift, i+=1 re-anchoring") {
    // user 1: 3 colocated points spanning exactly minDur -> one stay
    // (boundary inclusive); user 2: span 1s short -> none; user 3: a drift
    // chain where each step is within r of the PREVIOUS point but the run
    // breaks against the ANCHOR (anchor semantics, not chain semantics)
    def at(m: Double) = 10.0 + m / 111194.93
    val pts = Seq(
      (1L, 1L, 0L, at(0), 20.0), (1L, 2L, 500L, at(10), 20.0), (1L, 3L, 1000L, at(20), 20.0),
      (2L, 4L, 0L, at(0), 20.0), (2L, 5L, 999L, at(10), 20.0),
      (3L, 6L, 0L, at(0), 20.0), (3L, 7L, 400L, at(60), 20.0),
      (3L, 8L, 800L, at(120), 20.0), (3L, 9L, 1200L, at(180), 20.0))
    val got = run(pts, 100.0, 1000L)
    // user 1: one stay of 3 points, centroid = mean
    val u1 = got.filter(_._1 == 1L)
    assert(u1.size === 1 && u1.head._4 === 3 && u1.head._2 === 0L && u1.head._3 === 1000L)
    assert(math.abs(u1.head._5 - (at(0) + at(10) + at(20)) / 3) < 1e-12)
    assert(got.count(_._1 == 2L) === 0)
    // user 3: anchor at 0 reaches only 60 m (120 is out of r=100); run of 2
    // spans 400 s < 1000 -> no stay from anchor 6; re-anchored at 7: reaches
    // 120,180? dist(60,120)=60 ok, dist(60,180)=120 out -> span 800-400=400
    // -> no stay; chain semantics would have produced one
    assert(got.count(_._1 == 3L) === 0)
  }

  test("out-of-order and tied-ts input resolves by (sec, event_id)") {
    // same rows shuffled: the operator must sort internally; two points at
    // the same sec break ties by event_id for the deterministic scan order
    def at(m: Double) = 10.0 + m / 111194.93
    val base = Seq(
      (1L, 11L, 100L, at(0), 20.0), (1L, 10L, 100L, at(5), 20.0),
      (1L, 12L, 2000L, at(10), 20.0))
    val got1 = run(base, 100.0, 1000L)
    val got2 = run(base.reverse, 100.0, 1000L)
    assert(got1 === got2 && got1.size === 1 && got1.head._4 === 3)
    // centroid summed in (sec, event_id) order: 10 then 11 then 12
    assert(got1.head._5 === (at(5) + at(0) + at(10)) / 3)
  }

  test("odometer equals the fold golden; singleton and leg semantics") {
    val evs = Golden.loadEvents(spark, sfDir)
    val want = Golden.trackStatsG(evs)
    val pts = evs.map(e => (e.userId, e.eventId, e.sec,
      graft.model.Synth.trajLat(e.userId, e.eventId, e.sec),
      graft.model.Synth.trajLng(e.userId, e.eventId, e.sec))).toSeq
    import spark.implicits._
    val got = Trajectory.trackStats(
        pts.toDF("user_id", "event_id", "sec", "lat", "lng"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(got === want)
    assert(want.forall(s => s._3 >= s._5), "total must dominate net displacement")
    assert(want.exists(s => s._3 > 0), "fixture degenerate: nobody moved")
    // singleton user: zero legs, zero everything but the count
    val single = Trajectory.trackStats(
        Seq((9L, 1L, 5L, 10.0, 20.0)).toDF("user_id", "event_id", "sec", "lat", "lng"))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(single.toSeq === Seq((1L, 0.0, 0.0, 0.0)))
    // out-of-order input sums identically (sorted scan order)
    val shuffled = Trajectory.trackStats(
        pts.reverse.toDF("user_id", "event_id", "sec", "lat", "lng"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(shuffled === want)
  }

  test("haversine kernel shared with the engine scan (float policy pin)") {
    // Geo.haversineMeters is the kernel both scan and golden call; pin one
    // value so an accidental swap to the Column-mirroring variant is caught
    val d = Geo.haversineMeters(51.5074, -0.1278, 51.5075, -0.1278)
    assert(d > 11.0 && d < 11.3)
  }
}
