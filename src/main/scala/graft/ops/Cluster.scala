package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based spatial clustering (DBSCAN, Ester et al. KDD'96) over a
  * geotagged point table — the geo-clustering step a training-data pipeline
  * runs to find landmark/hotspot groups (cap images per landmark, diversity
  * sampling, POI discovery). The reference exposes the primitives this
  * composes — within-distance search through its S2 index
  * (/root/reference/src/diagonal.works/b6/search/spatial.go:10-32) and
  * per-origin distance predicates (api/functions/geometry.go) — b6 users run
  * exactly this loop one origin at a time; here it is one declarative plan.
  *
  * Scale shape (the 100 TB contract): every stage is a keyed equi-join or
  * aggregation — NO all-pairs step anywhere.
  *   1. eps-neighbor pairs via `DistanceJoin.withinDistancePairs` (the
  *      covering-explode x own-cell equi-join, O(1) cells per point);
  *   2. degrees = one groupBy over the pair list;
  *   3. core-core edges -> `Components.connectedComponents` (Kiveris et al.
  *      two-phase star contraction, O(log^2 n) rounds, lineage-truncated);
  *   4. border attach = one equi-join + min aggregation.
  * Dense urban cells make hot join keys; the pair join is a plain shuffled
  * equi-join so AQE skew splitting applies (the DistanceJoin contract).
  *
  * Determinism contract (no "first scan wins" order dependence, unlike
  * textbook sequential DBSCAN):
  *   - core iff |N_eps(p)| >= minPts, where the neighborhood INCLUDES p
  *     itself (the original paper's definition; dist(p,p)=0 <= eps);
  *   - a cluster's label is the MINIMUM core id in it (the Components
  *     convention shared with `Dedup.keepCanonicalByPairs`);
  *   - a border point (non-core with >= 1 core eps-neighbor) joins the
  *     smallest cluster label among its core neighbors — sequential DBSCAN
  *     assigns it to whichever cluster scans it first, which is an artifact
  *     of visit order; min-label is the canonical deterministic choice;
  *   - noise rows get a NULL cluster.
  */
object Cluster {

  /** q_dbscan gate fixture: a WIDE box around the London hot cap so the
    * input mixes the dense jitter lattice (the skew case) with the ~uniform
    * global scatter — at the driver's gate scale (sf0.01) eps 80 m / minPts
    * 10 yields 15 clusters, ~920 core / ~80 border lattice points, and the
    * scatter points (nearest neighbors km apart) classify as noise, so all
    * three roles are exercised. (At sf0.001 the lattice thins below minPts
    * and the gate degenerates to all-noise — still oracle-checked; the rich
    * small-scale structure is pinned by ClusterSpec with sf0.001-tuned
    * parameters instead.) */
  val GateLatLo = 49.0; val GateLatHi = 54.0
  val GateLngLo = -5.0; val GateLngHi = 5.0
  val GateEpsMeters = 80.0
  val GateMinPts = 10

  /** DBSCAN over (id LONG, lat, lng DOUBLE) -> (id, cluster LONG nullable,
    * role STRING in core|border|noise). `cluster` is the minimum core id of
    * the density-connected component (NULL for noise). */
  def dbscan(points: DataFrame, epsMeters: Double, minPts: Int): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val pts = points.select(col("id"), col("lat"), col("lng"))
    val pairs = DistanceJoin.withinDistancePairs(pts, epsMeters)
      .select("id_a", "id_b") // id_a < id_b, exactly once per pair

    // |N_eps(p)| - 1 (self excluded): one occurrence per pair endpoint
    val deg = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("_deg"))
    val flagged = pts.select("id").join(deg, Seq("id"), "left")
      .withColumn("_core", coalesce(col("_deg"), lit(0L)) + 1 >= minPts)
    val coreIds = flagged.where(col("_core")).select("id")

    // density-connected core graph -> min-id components; a core point with
    // no core neighbor is absent from Components' output (self-pairs carry
    // no connectivity) = its own singleton cluster
    val coreEdges = pairs
      .join(coreIds.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
    val coreLabeled = coreIds
      .join(Components.connectedComponents(coreEdges), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))

    // border = non-core with a core eps-neighbor; min label deterministically
    val nbrs = pairs.select(col("id_a").as("id"), col("id_b").as("nbr"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nbr")))
    val borderLabeled = flagged.where(!col("_core")).select("id")
      .join(nbrs, Seq("id"))
      .join(coreLabeled.select(col("id").as("nbr"), col("cluster")), Seq("nbr"))
      .groupBy("id").agg(min("cluster").as("cluster"))

    val labeled = coreLabeled.withColumn("role", lit("core"))
      .unionByName(borderLabeled.withColumn("role", lit("border")))
    pts.select("id").join(labeled, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("role"), lit("noise")).as("role"))
  }
}
