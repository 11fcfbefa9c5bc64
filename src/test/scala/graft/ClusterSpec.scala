package graft

import graft.ops.{Cluster, DistanceJoin}
import graft.oracle.Golden
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DBSCAN vs an in-memory brute force (a THIRD implementation, distinct from
  * both the engine's join plan and Golden's plane-sweep), plus the
  * deterministic border/noise contract and plan shape. */
class ClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("cluster-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(pts: Seq[(Long, Double, Double)], eps: Double,
                  minPts: Int): Map[Long, (Option[Long], String)] = {
    import spark.implicits._
    Cluster.dbscan(pts.toDF("id", "lat", "lng"), eps, minPts)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(2))).toMap
  }

  /** All-pairs brute force: neighbor sets, core flags, BFS components
    * relabeled to min id, border = min label among core neighbors. */
  private def brute(pts: Seq[(Long, Double, Double)], eps: Double,
                    minPts: Int): Map[Long, (Option[Long], String)] = {
    val nbr = pts.map { p =>
      p._1 -> pts.filter(q => q._1 != p._1 &&
        Golden.haversineColumn(p._2, p._3, q._2, q._3) <= eps).map(_._1).toSet
    }.toMap
    val core = pts.map(_._1).filter(id => nbr(id).size + 1 >= minPts).toSet
    val label = scala.collection.mutable.Map.empty[Long, Long]
    core.foreach { s =>
      if (!label.contains(s)) {
        var seen = Set(s); var frontier = Set(s)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(nbr).filter(core).diff(seen)
          seen ++= frontier
        }
        val m = seen.min
        seen.foreach(v => label(v) = m)
      }
    }
    pts.map { p =>
      if (core(p._1)) p._1 -> (Some(label(p._1)): Option[Long], "core")
      else {
        val cn = nbr(p._1).filter(core)
        if (cn.nonEmpty) p._1 -> (Some(cn.map(label).min): Option[Long], "border")
        else p._1 -> (None: Option[Long], "noise")
      }
    }.toMap
  }

  private def rectPts(): Seq[(Long, Double, Double)] =
    graft.model.Tables.images(spark, sfDir).select("image_id", "lat", "lng")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(p => p._2 >= DistanceJoin.GateLatLo && p._2 <= DistanceJoin.GateLatHi &&
        p._3 >= DistanceJoin.GateLngLo && p._3 <= DistanceJoin.GateLngHi).toSeq

  test("dbscan equals brute force on the dense urban fixture (3 param sets)") {
    val pts = rectPts()
    assert(pts.length > 50, s"fixture degenerate: ${pts.length}")
    // sf0.001-tuned: the lattice degree range there is ~1-6 at eps 150 and
    // ~3-11 at eps 200, so these sets mix all three roles
    for ((eps, minPts) <- Seq((150.0, 4), (200.0, 2), (200.0, 6))) {
      val got = run(pts, eps, minPts)
      val want = brute(pts, eps, minPts)
      assert(got === want, s"eps=$eps minPts=$minPts")
      val roles = want.values.map(_._2).toSet
      assert(roles.contains("core"), s"eps=$eps minPts=$minPts: no cores — degenerate")
    }
  }

  test("gate fixture is rich at the driver's gate scale (sf0.01): 3 roles, >1 cluster, engine==brute") {
    val c = Cluster
    val pts = graft.model.Tables.images(spark, "/root/testdata/sf0.01")
      .select("image_id", "lat", "lng")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(p => p._2 >= c.GateLatLo && p._2 <= c.GateLatHi &&
        p._3 >= c.GateLngLo && p._3 <= c.GateLngHi).toSeq
    assert(pts.length > 900, s"fixture degenerate: ${pts.length}")
    val want = brute(pts, c.GateEpsMeters, c.GateMinPts)
    val roles = want.values.groupBy(_._2).map { case (k, v) => k -> v.size }
    assert(roles.keySet === Set("core", "border", "noise"), s"roles: $roles")
    assert(want.values.flatMap(_._1).toSet.size > 5, "too few clusters — degenerate")
    assert(run(pts, c.GateEpsMeters, c.GateMinPts) === want)
  }

  test("golden BFS recomputation equals brute force (independent check)") {
    val imgs = Golden.loadImages(spark, sfDir)
    val d = DistanceJoin
    // the TIGHT urban box + sf0.001-rich params: the structure-heavy case
    val g = Golden.dbscanG(imgs, d.GateLatLo, d.GateLatHi, d.GateLngLo,
        d.GateLngHi, 150.0, 4)
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(g === brute(rectPts(), 150.0, 4))
    // and the gate's own wide-box params (all-noise at this scale)
    val c = Cluster
    val g2 = Golden.dbscanG(imgs, c.GateLatLo, c.GateLatHi, c.GateLngLo,
        c.GateLngHi, c.GateEpsMeters, c.GateMinPts)
    assert(g2.nonEmpty)
  }

  test("border/noise contract: min-label attach, isolated core, noise") {
    // two 4-point chains (300 m spacing, all core at minPts=4), a border
    // point 900 m from both chains' ends, and a far-away noise point; a
    // lone pair is sub-core. 1 deg lat = 111.19 km; lng fixed.
    def at(m: Double) = 10.0 + m / 111194.93
    val pts = Seq.tabulate(4)(i => (1L + i, at(i * 300.0), 20.0)) ++
      Seq((5L, at(1800.0), 20.0)) ++
      Seq.tabulate(4)(i => (6L + i, at(2700.0 + i * 300.0), 20.0)) ++
      Seq((10L, at(500000.0), 20.0), (11L, at(500100.0), 20.0))
    val got = run(pts, 1000.0, 4)
    assert((1L to 4L).forall(got(_) == (Some(1L), "core")))
    assert((6L to 9L).forall(got(_) == (Some(6L), "core")))
    // border of BOTH clusters -> deterministic min label, not scan order
    assert(got(5L) === (Some(1L), "border"))
    assert(got(10L) === (None, "noise") && got(11L) === (None, "noise"))
    // minPts=1: everything is core; the isolated pair becomes its own
    // cluster and the singleton-core coalesce path is exercised
    val all = run(pts.take(1) ++ pts.drop(9), 1000.0, 1)
    assert(all(1L) === (Some(1L), "core"))
    assert(all(10L) === (Some(10L), "core") && all(11L) === (Some(10L), "core"))
  }

  test("plan: no cartesian/BNLJ anywhere in the dbscan plan") {
    import spark.implicits._
    val pts = rectPts().take(200).toDF("id", "lat", "lng")
    val plan = Cluster.dbscan(pts, 150.0, 4).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
