package graft.ops

import graft.core.{Geo, S2}
import graft.functions.{S2Expressions, Udfs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-bounded spatial SELF-join: all unordered pairs of point features
  * within `radiusMeters` great-circle meters of each other — the geotag
  * near-duplicate candidate generator for an image corpus (two photos shot
  * from the same spot), and the b6 idiom "features within distance d of a
  * feature" turned into a set-at-a-time operator (the reference evaluates it
  * one origin at a time through its S2 index,
  * /root/reference/src/diagonal.works/b6/search/spatial.go:10-32 +
  * api/functions/geometry.go distance predicates).
  *
  * Scale shape (the 100 TB contract):
  *   - one side keys each point by its OWN level-L S2 cell (a scalar parent
  *     of the indexed cell16 — no explode, no kernel);
  *   - the other side explodes each point's cap(p, r) covering at the SAME
  *     fixed level L (sound: `S2.coveringAtLevel` returns every level-L cell
  *     that may intersect the cap), so a candidate pair meets on an exact
  *     equi-key and the join is a plain shuffled hash join — no
  *     CartesianProduct, no BroadcastNestedLoop, both sides partition by
  *     cell.
  *   - refine with the exact haversine INSIDE the join projection (codegen
  *     Column arithmetic, Udfs.haversineMeters).
  *
  * Each qualifying pair is emitted EXACTLY once, no distinct needed: the
  * level-L cell of point q is unique, a covering is a set (so (p,q) matches
  * on at most one cell), and the `id_a < id_b` filter keeps one of the two
  * directed matches. Soundness: dist(p,q) <= r puts q inside cap(p,r), so
  * q's level-L cell intersects the cap and is in the covering.
  *
  * L is the coarsest level whose cells are at least one cap-diameter wide
  * (S2 kMinWidth = 2*sqrt(2)/3 * 2^-L), so coverings stay O(1) cells (~4-6)
  * regardless of radius. Dense urban cells (the north rule's skew case) make
  * single join keys hot; the join is a standard shuffled equi-join, so AQE
  * skew-join splitting applies, and callers can salt by subdividing L.
  */
object DistanceJoin {

  /** q_dist_pairs gate fixture: a rectangle around the London hot cap
    * (Synth.hotCenters(0)) — rectangle, not cap, so the engine/golden subset
    * predicate is four exact double comparisons with no distance kernel —
    * and a 150 m pair radius (the synthetic jitter lattice has a 62.8 m
    * minimum pair spacing, so 150 m yields a dense, nonempty pair set). The subset is the SKEW case on purpose: every
    * surviving point lives in a handful of level-15 cells. */
  val GateLatLo = 51.49; val GateLatHi = 51.53
  val GateLngLo = -0.15; val GateLngHi = -0.10
  val GateRadiusMeters = 150.0

  /** q_dist_join gate fixture: the same rectangle split into DISJOINT sides
    * by id — left (the exploded, smaller side) = id % GateJoinMod == 0,
    * right = the rest — so the two-table path is exercised with no
    * self-pairs and a ~1:9 size asymmetry (the intended usage: explode the
    * small side). 150, not 10: every synthetic London hot-cap point has
    * id % 15 == 0 (Synth's orderkey%5=0 x %3=0 placement), so mod must be a
    * multiple of 15 to cut WITHIN that population — 150 keeps every 10th. */
  val GateJoinMod = 150L

  /** Coarsest S2 level whose min cell width >= 2*`angleRad` (cap diameter),
    * clamped to [0, 16] — 16 is the indexed cell16 floor. */
  def levelForRadius(angleRad: Double): Int = {
    val kMinWidthDeriv = 2.0 * math.sqrt(2.0) / 3.0
    val l = math.floor(math.log(kMinWidthDeriv / math.max(2.0 * angleRad, 1e-14)) / math.log(2.0)).toInt
    math.max(0, math.min(16, l))
  }

  /** All pairs (id_a < id_b) with great-circle distance <= radiusMeters.
    * Input: (id LONG, lat DOUBLE, lng DOUBLE). Output: (id_a, id_b, dist_m).
    */
  def withinDistancePairs(points: DataFrame, radiusMeters: Double): DataFrame =
    joinImpl(points, points, radiusMeters)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "dist_m")

  /** Two-table form: every (left, right) pair with great-circle distance
    * <= radiusMeters — the reference's "find features within d of each
    * feature in this set" evaluated set-at-a-time. Directed output, one row
    * per qualifying (left, right): (id_a = left id, id_b = right id,
    * dist_m). Self-pairs are NOT removed (left and right may be unrelated
    * tables); callers joining a table to itself filter `id_a =!= id_b`.
    * Scale shape identical to the self-join: the LEFT side explodes its
    * O(1)-cell cap covering, the RIGHT side keys by its own scalar level-L
    * cell, so put the larger table on the right to explode the smaller one.
    */
  def withinDistanceJoin(left: DataFrame, right: DataFrame,
                         radiusMeters: Double): DataFrame =
    joinImpl(left, right, radiusMeters).select("id_a", "id_b", "dist_m")

  /** Shared kernel: covering-explode (left) ⋈ own-cell (right) equi-join,
    * exact haversine refine in the projection. Exactly-once per directed
    * pair: the right point's level-L cell is unique and a covering is a
    * set, so (l, r) meets on at most one cell — no distinct needed. */
  private def joinImpl(left: DataFrame, right: DataFrame,
                       radiusMeters: Double): DataFrame = {
    require(radiusMeters > 0, "radiusMeters must be positive")
    val angle = radiusMeters / Geo.EarthRadiusMeters
    val lvl = levelForRadius(angle)
    // covering side: level-L cells the cap may touch (sound, set-valued)
    val covUdf = udf((lat: Double, lng: Double) =>
      S2.coveringAtLevel(S2.Cap(Geo.toXYZ(lat, lng), angle), lvl))
    val probe = left
      .select(col("id").as("id_a"), col("lat").as("lat_a"), col("lng").as("lng_a"),
        explode(covUdf(col("lat"), col("lng"))).as("cell"))
    // keyed side: the point's own level-L cell — scalar codegen parent
    val build = right
      .select(col("id").as("id_b"), col("lat").as("lat_b"), col("lng").as("lng_b"),
        S2Expressions.s2Ancestors(
          S2Expressions.s2Cell16(col("lat"), col("lng")), Array(lvl)).getItem(0).as("cell"))
    probe.join(build, Seq("cell"))
      .withColumn("dist_m",
        Udfs.haversineMeters(col("lat_a"), col("lng_a"), col("lat_b"), col("lng_b")))
      .where(col("dist_m") <= lit(radiusMeters))
  }
}
