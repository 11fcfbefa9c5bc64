package graft

import graft.ops.Tiling
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** KDE-smoothed tile density: brute-force convolution equality, mass
  * conservation, antimeridian wrap, and the aggregate-before-explode plan. */
class HeatmapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("heatmap-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(pts: Seq[(Long, Double, Double)], zoom: Int,
                  k: Int): Map[(Long, Long), Long] =
    Tiling.smoothedDensity(
        { import spark.implicits._; pts.toDF("image_id", "lat", "lng") },
        zoom, k)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap

  /** Brute force: per-point tile via an independent mercator computation,
    * then a direct dense convolution. */
  private def brute(pts: Seq[(Long, Double, Double)], zoom: Int,
                    k: Int): Map[(Long, Long), Long] = {
    val n = 1L << zoom
    def tile(lat: Double, lng: Double): (Long, Long) = {
      val s = (1 << (zoom - 1)).toDouble
      (math.floor(s + s * math.toRadians(lng) / math.Pi).toLong,
        math.floor(s - s * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)) / math.Pi).toLong)
    }
    val counts = pts.groupBy(p => tile(p._2, p._3)).map { case (t, v) => t -> v.size.toLong }
    val out = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for (((x, y), c) <- counts; dx <- -k to k; dy <- -k to k) {
      val ty = y + dy
      if (ty >= 0 && ty < n) {
        val w = (k + 1 - math.abs(dx)).toLong * (k + 1 - math.abs(dy))
        out((((x + dx) % n + n) % n, ty)) += c * w
      }
    }
    out.toMap
  }

  test("smoothed density equals brute-force convolution (sf0.001 images, z12 k2 / z10 k1)") {
    val pts = graft.model.Tables.images(spark, "/root/testdata/sf0.001")
      .select("image_id", "lat", "lng")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    for ((z, k) <- Seq((12, 2), (10, 1))) {
      val got = run(pts, z, k)
      val want = brute(pts, z, k)
      assert(got === want, s"z=$z k=$k")
      assert(want.size > pts.size / 2, s"z=$z k=$k: degenerate fan-out")
    }
  }

  test("mass conservation: interior points sum to count x kernel mass") {
    // all points far from poles and the antimeridian -> nothing clamped;
    // triangular kernel mass = (sum_{-k..k} (k+1-|d|))^2 = ((k+1)^2)^2
    val pts = Seq.tabulate(50)(i => (i.toLong, 10.0 + i * 0.04, 20.0 + (i % 7) * 0.04))
    for (k <- 0 to 3) {
      val got = run(pts, 12, k)
      val mass = ((k + 1) * (k + 1)).toLong * ((k + 1) * (k + 1))
      assert(got.values.sum === pts.size * mass, s"k=$k")
    }
  }

  test("x wraps across the antimeridian, y clamps at the pole edge") {
    // a point in tile x=0 (lng just above -180): with k=1 its weight-1
    // column lands at x = 4095 via the wrap
    val got = run(Seq((1L, 0.0, -179.99)), 12, 1)
    assert(got.keySet.map(_._1) === Set(0L, 1L, 4095L))
    // y=0 tile (lat near the mercator top): dy=-1 rows are dropped, so the
    // total mass is 2/3 of the full kernel (k=1 mass 16 -> 12 kept; lat 85.05
    // is just inside tile row 0 at z12)
    val top = run(Seq((2L, 85.05, 0.0)), 12, 1)
    assert(top.keySet.map(_._2) === Set(0L, 1L))
    assert(top.values.sum === 12L)
  }

  test("plan: counts aggregate BEFORE the offset explode (fan-out rides the small table)") {
    import spark.implicits._
    val pts = Seq((1L, 10.0, 20.0)).toDF("image_id", "lat", "lng")
    val plan = Tiling.smoothedDensity(pts, 12, 2).queryExecution.executedPlan.toString
    // the Generate (offset explode) must appear ABOVE an aggregate in the
    // tree string: the first Generate line comes before (smaller index than)
    // the LAST aggregate only if aggregation happens upstream of it —
    // assert the tile-count aggregate exists below the generate
    val lines = plan.linesIterator.toVector
    val genIdx = lines.indexWhere(_.contains("Generate explode"))
    val aggBelow = lines.drop(genIdx + 1).exists(l => l.contains("HashAggregate"))
    assert(genIdx >= 0 && aggBelow,
      "offset explode must sit above the per-tile count aggregate:\n" + plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
