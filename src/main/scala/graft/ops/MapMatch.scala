package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HMM map matching: snap each user's geotagged fix sequence onto the path
  * network — the operator that turns raw GPS/EXIF points into road-aligned
  * trajectories (Newson & Krakauer, "Hidden Markov map matching through
  * noise and sparseness", GIS'09; the reference's nearest-path join,
  * api/functions/geometry.go:100-122, is the per-point special case).
  *
  * Model (the classic HMM reduced to deterministic costs — documented
  * divergences from the paper: switch cost is a CONSTANT per path change
  * rather than route-distance difference, because the fixture network has no
  * routable topology; probabilities become negative-log costs so the DP is
  * pure additions/comparisons):
  *   emission(point, path) = d² / (2σ²)    d = meters to the path
  *   transition(p → q)     = 0 if p == q else `switchCost`
  *   match = per-user Viterbi min-cost assignment over the (sec, event_id)-
  *           ordered fixes, candidates = paths within `radiusMeters`.
  * Deterministic contract: candidates iterate in path_id order and argmin is
  * strictly-less, so ties break to the SMALLEST path_id at every step; the
  * cost doubles are sums in fixed DP order (golden mirrors the op order and
  * the shared Polyline.distanceToPolylineMeters kernel bit-for-bit).
  * Fixes with NO candidate in range produce no output row (they are also
  * invisible to the DP — the chain jumps over them with the same one-step
  * transition; documented contract).
  *
  * Scale shape: candidate generation is the SOUND shared-cell equi-join of
  * [[Polyline.pathCandidates]] (the point side never shuffles for it —
  * broadcast network; or shuffle_hash for a huge network), then ONE
  * groupBy-user shuffle and an in-memory DP per user — the
  * Trajectory/EventStream per-user memory contract: a user's candidate rows
  * fit in MBs (fix count × candidates within radius); a pathological key
  * fails loudly (`maxCandidatesPerUser`) rather than OOMing the task.
  */
object MapMatch {

  /** public: Dataset encoders fail codegen on private case classes. */
  final case class CandRow(user_id: Long, event_id: Long, sec: Long,
                           path_id: String, dist_m: Double)

  /** @param points (user_id, event_id, sec, lat, lng, cell16)
    * @param paths  (path_id, lats ARRAY<DOUBLE>, lngs ARRAY<DOUBLE>)
    * @return (user_id, event_id, path_id) one row per fix with >=1 candidate. */
  def viterbiMatch(points: DataFrame, paths: DataFrame, radiusMeters: Double,
                   sigmaMeters: Double = 50.0, switchCost: Double = 2.0,
                   level: Int = 12, broadcastPaths: Boolean = true,
                   maxCandidatesPerUser: Int = 2000000): DataFrame = {
    require(radiusMeters > 0 && sigmaMeters > 0 && switchCost >= 0,
      "radius/sigma must be positive, switchCost non-negative")
    import points.sparkSession.implicits._
    val cands = Polyline.pathCandidates(points, paths, radiusMeters, level,
        broadcastPaths)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("sec").cast("long"), col("path_id"), col("dist_m"))
      .as[CandRow]
    cands.groupByKey(_.user_id).flatMapGroups { (uid: Long, it: Iterator[CandRow]) =>
      val rows = it.toArray
      if (rows.length > maxCandidatesPerUser)
        throw new IllegalStateException(
          s"mapMatch: user $uid has ${rows.length} candidate rows > " +
            s"maxCandidatesPerUser=$maxCandidatesPerUser; shrink the radius " +
            "or raise the bound")
      val steps = rows.groupBy(r => (r.sec, r.event_id)).toArray.sortBy(_._1)
        .map { case (k, cs) => (k._2, cs) }
      viterbi(steps, sigmaMeters, switchCost)
        .map { case (eid, pid) => (uid, eid, pid) }.iterator
    }.toDF("user_id", "event_id", "path_id")
  }

  /** The per-user DP: steps in time order; candidates are sorted into
    * path_id order HERE (the determinism anchor), and argmin is
    * strictly-less, so ties break to the smallest path_id. */
  private[graft] def viterbi(rawSteps: Array[(Long, Array[CandRow])],
                             sigmaMeters: Double, switchCost: Double)
      : Seq[(Long, String)] = {
    val steps = rawSteps.map { case (eid, cs) => (eid, cs.sortBy(_.path_id)) }
    if (steps.isEmpty) return Nil
    def emit(d: Double): Double = (d * d) / (2.0 * sigmaMeters * sigmaMeters)
    var cost = steps(0)._2.map(c => emit(c.dist_m))
    val back = new Array[Array[Int]](steps.length)
    var i = 1
    while (i < steps.length) {
      val cur = steps(i)._2
      val prev = steps(i - 1)._2
      val nc = new Array[Double](cur.length)
      val nb = new Array[Int](cur.length)
      var j = 0
      while (j < cur.length) {
        var best = Double.MaxValue; var bestP = -1
        var p = 0
        while (p < prev.length) {
          val t = cost(p) +
            (if (prev(p).path_id == cur(j).path_id) 0.0 else switchCost)
          if (t < best) { best = t; bestP = p }
          p += 1
        }
        nc(j) = best + emit(cur(j).dist_m)
        nb(j) = bestP
        j += 1
      }
      back(i) = nb
      cost = nc
      i += 1
    }
    // final argmin, then walk the pointers back
    var best = 0
    var j = 1
    while (j < cost.length) { if (cost(j) < cost(best)) best = j; j += 1 }
    val out = new Array[(Long, String)](steps.length)
    var k = steps.length - 1
    var cur = best
    while (k >= 0) {
      out(k) = (steps(k)._1, steps(k)._2(cur).path_id)
      if (k > 0) cur = back(k)(cur)
      k -= 1
    }
    out.toSeq
  }
}
