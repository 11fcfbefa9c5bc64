package graft.ops

import graft.core.{Geo, S2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trajectory-similarity join: user pairs whose fix sequences are within a
  * symmetric discrete Hausdorff distance — the "same route / same place
  * coverage" pair primitive (co-traveler detection, burst-photographer
  * grouping before a diversity cap; the trajectory-level analogue of the
  * point-level q_dist_pairs join).
  *
  *   h(A,B) = max_{a∈A} min_{b∈B} d(a,b);  H = max(h(A,B), h(B,A))
  *
  * Float policy: H is a MAX of MINs of shared-kernel haversines — pure
  * selections, no accumulation — so the value is bit-identical under ANY
  * loop/partition order (the golden recomputes with independent functional
  * loops and agrees exactly).
  *
  * Scale shape: ONE groupBy-user shuffle builds per-user (array, probe cell,
  * candidate covering); candidates are a CELL EQUI-JOIN — each user emits
  * its FIRST fix's level-L cell (probe side) and the level-L covering of the
  * cap(trajectory centroid, max point angle + D/R) (build side). Soundness:
  * H ≤ D ⇒ h(A,B) ≤ D ⇒ A's first fix is within D of some b∈B, so by the
  * spherical triangle inequality it lies in B's inflated cap and its level-L
  * cell is in B's may-intersect covering. The exact Hausdorff refine then
  * rides an id-keyed re-attach of the two arrays (the MinHash refine shape).
  * Per-user trajectories follow the Trajectory/EventStream memory contract
  * (human-scale, MBs); a trajectory whose inflated cap needs more than
  * `maxCoverCells` level-L cells fails LOUDLY instead of exploding the
  * build side (a trajectory that large has no ≤D-Hausdorff partner of sane
  * size anyway — shrink D or split the trajectory).
  */
object TrajSim {

  /** public: Dataset encoders fail codegen on private case classes. */
  final case class TrajRow(user_id: Long, lats: Array[Double],
                           lngs: Array[Double], pcell: Long,
                           cover: Array[Long])

  /** Exact symmetric discrete Hausdorff in meters (shared haversine
    * kernel; max-of-min selections only — order-independent). */
  def hausdorffMeters(aLat: Array[Double], aLng: Array[Double],
                      bLat: Array[Double], bLng: Array[Double]): Double = {
    def directed(xLat: Array[Double], xLng: Array[Double],
                 yLat: Array[Double], yLng: Array[Double]): Double = {
      var worst = 0.0
      var i = 0
      while (i < xLat.length) {
        var best = Double.MaxValue
        var j = 0
        while (j < yLat.length) {
          val d = Geo.haversineMeters(xLat(i), xLng(i), yLat(j), yLng(j))
          if (d < best) best = d
          j += 1
        }
        if (best > worst) worst = best
        i += 1
      }
      worst
    }
    math.max(directed(aLat, aLng, bLat, bLng), directed(bLat, bLng, aLat, aLng))
  }

  /** @param points (user_id, event_id, sec, lat, lng)
    * @return (user_a, user_b, hausdorff_m) with user_a < user_b, H <= D. */
  def hausdorffPairs(points: DataFrame, maxDistMeters: Double,
                     maxCoverCells: Int = 4096): DataFrame = {
    require(maxDistMeters > 0, "maxDistMeters must be positive")
    import points.sparkSession.implicits._
    val level = DistanceJoin.levelForRadius(maxDistMeters / Geo.EarthRadiusMeters)
    val ds = points.select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("sec").cast("long"), col("lat").cast("double"), col("lng").cast("double"))
      .as[Trajectory.TrajPoint]
    val trajs = ds.groupByKey(_.user_id).mapGroups { (uid: Long, it: Iterator[Trajectory.TrajPoint]) =>
      val pts = it.toArray.sortBy(p => (p.sec, p.event_id))
      val lats = pts.map(_.lat); val lngs = pts.map(_.lng)
      // cap center = normalized XYZ centroid; angle = exact max point angle
      var cx = 0.0; var cy = 0.0; var cz = 0.0
      var i = 0
      while (i < lats.length) {
        val p = Geo.toXYZ(lats(i), lngs(i))
        cx += p(0); cy += p(1); cz += p(2)
        i += 1
      }
      val n = math.sqrt(cx * cx + cy * cy + cz * cz)
      val c = if (n > 0) Array(cx / n, cy / n, cz / n)
              else Geo.toXYZ(lats(0), lngs(0)) // antipodal-degenerate fallback
      var maxAng = 0.0
      i = 0
      while (i < lats.length) {
        val a = Geo.angleBetween(c, Geo.toXYZ(lats(i), lngs(i)))
        if (a > maxAng) maxAng = a
        i += 1
      }
      val capAng = maxAng + maxDistMeters / Geo.EarthRadiusMeters + 1e-12
      val cover = S2.coveringAtLevel(S2.Cap(c, capAng), level)
      if (cover.length > maxCoverCells)
        throw new IllegalStateException(
          s"hausdorffPairs: user $uid needs ${cover.length} level-$level " +
            s"candidate cells > maxCoverCells=$maxCoverCells (trajectory " +
            "span >> maxDistMeters); shrink the radius or split the user")
      TrajRow(uid, lats, lngs, S2.cellAt(lats(0), lngs(0), level), cover)
    }
    val probes = trajs.toDF().select(col("user_id").as("ua"), col("pcell"))
    val builds = trajs.toDF().select(col("user_id").as("ub"),
      explode(col("cover")).as("pcell"))
    val cands = probes.join(builds, "pcell")
      .where(col("ua") =!= col("ub"))
      .select(least(col("ua"), col("ub")).as("user_a"),
        greatest(col("ua"), col("ub")).as("user_b"))
      .distinct()
    val h = udf((aLat: Seq[Double], aLng: Seq[Double],
                 bLat: Seq[Double], bLng: Seq[Double]) =>
      hausdorffMeters(aLat.toArray, aLng.toArray, bLat.toArray, bLng.toArray))
    val arrays = trajs.toDF().select(col("user_id"), col("lats"), col("lngs"))
    cands
      .join(arrays.select(col("user_id").as("user_a"),
        col("lats").as("a_lats"), col("lngs").as("a_lngs")), "user_a")
      .join(arrays.select(col("user_id").as("user_b"),
        col("lats").as("b_lats"), col("lngs").as("b_lngs")), "user_b")
      .withColumn("hausdorff_m",
        h(col("a_lats"), col("a_lngs"), col("b_lats"), col("b_lngs")))
      .where(col("hausdorff_m") <= maxDistMeters)
      .select("user_a", "user_b", "hausdorff_m")
  }
}
