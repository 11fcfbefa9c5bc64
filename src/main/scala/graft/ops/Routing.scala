package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-to-point network routing — the reference's routing surface
  * (graph/graph.go Dijkstra + api routing demos) as a set-at-a-time
  * operator: a TABLE of (origin, destination) point pairs is snapped onto
  * the network and routed in bulk, instead of one driver-side Dijkstra per
  * request.
  *
  * Semantics per pair:
  *   1. snap each endpoint to the nearest network NODE within
  *      `snapRadiusMeters` (ties break to the smaller node id;
  *      the [[MapMatch.viterbiMatchRouted]] endpoint discretization);
  *   2. route_m = network shortest-path distance between the snapped nodes
  *      (<= maxRouteMeters);
  *   3. total_m = gc(a, nodeA) + route_m + gc(nodeB, b) in that exact op
  *      order (golden-mirrored).
  * A pair with an unsnappable endpoint or no route within the cutoff keeps
  * its row with null node/route columns — requests never silently vanish.
  *
  * Scale shape: snapping is the gated [[DistanceJoin.withinDistanceJoin]]
  * kernel (covering-explode x own-cell equi-join — no all-pairs, no
  * broadcast of the pair table), then ONE multi-origin
  * [[Reachability.reachableMulti]] flood from the DISTINCT snapped origin
  * nodes — cost scales with distinct origins x reached nodes, not with the
  * request count, and the per-pair lookup is a keyed join against the
  * settled distance table. The origin collect is driver-bounded with a
  * loud failure (`maxNetworkNodes`, the bounded-network contract shared
  * with routed map matching).
  */
object Routing {

  /** @param pairs    (route_id LONG >= 0, a_lat, a_lng, b_lat, b_lng)
    * @param segments (path_id, lats, lngs, node_a, node_b) — road geometry
    *                 whose endpoints are graph nodes (Tables.gridSegments
    *                 shape)
    * @param edges    (src, dst, cost DOUBLE) the routable graph
    * @return (route_id, node_a, node_b, snap_a_m, snap_b_m, route_m,
    *         total_m), one row per input pair. */
  def routeDistance(spark: SparkSession, pairs: DataFrame, segments: DataFrame,
                    edges: DataFrame, snapRadiusMeters: Double,
                    maxRouteMeters: Double,
                    maxNetworkNodes: Int = 200000): DataFrame = {
    require(snapRadiusMeters > 0 && maxRouteMeters > 0,
      "snapRadius/maxRoute must be positive")
    import spark.implicits._
    // the snap key is route_id * 2 + side: a NEGATIVE route_id would
    // silently alias two different pairs' endpoints — enforce the scaladoc
    // contract in-plan so bad input fails loudly wherever the frame runs
    val pairsChecked = pairs.withColumn("route_id",
      when(col("route_id").cast("long") < 0,
        raise_error(concat(lit("routeDistance: route_id must be >= 0, got "),
          col("route_id").cast("string"))).cast("long"))
        .otherwise(col("route_id").cast("long")))
    val nodes = segments
      .select(col("node_a").cast("long").as("id"),
        col("lats").getItem(0).as("lat"), col("lngs").getItem(0).as("lng"))
      .unionByName(segments.select(col("node_b").cast("long").as("id"),
        element_at(col("lats"), -1).as("lat"), element_at(col("lngs"), -1).as("lng")))
      .dropDuplicates("id")
    // both endpoints ride ONE snap join, keyed (route_id * 2 + side)
    val eps = pairsChecked.select(col("route_id"),
        lit(0L).as("side"), col("a_lat").as("lat"), col("a_lng").as("lng"))
      .unionByName(pairsChecked.select(col("route_id"),
        lit(1L).as("side"), col("b_lat").as("lat"), col("b_lng").as("lng")))
      .select((col("route_id") * 2 + col("side")).as("id"), col("lat"), col("lng"))
    // nearest node: min of (dist, node) structs — lexicographic struct
    // ordering = min distance, node-id tiebreak, deterministic
    val snapped = DistanceJoin.withinDistanceJoin(eps, nodes, snapRadiusMeters)
      .groupBy(col("id_a").as("id"))
      .agg(min(struct(col("dist_m"), col("id_b"))).as("s"))
      .select(col("id"), col("s.dist_m").as("snap_m"), col("s.id_b").as("node"))
    val a = snapped.where(col("id") % 2 === 0)
      .select((col("id") / 2).cast("long").as("route_id"),
        col("node").as("node_a"), col("snap_m").as("snap_a_m"))
    val b = snapped.where(col("id") % 2 === 1)
      .select((col("id") / 2).cast("long").as("route_id"),
        col("node").as("node_b"), col("snap_m").as("snap_b_m"))
    val origins = a.select("node_a").distinct().as[Long].collect().toSeq.sorted
    if (origins.size > maxNetworkNodes)
      throw new IllegalStateException(
        s"routeDistance: ${origins.size} distinct origin nodes > " +
          s"maxNetworkNodes=$maxNetworkNodes; shard the request batch by region")
    val dist =
      if (origins.isEmpty)
        Seq.empty[(Long, Long, Double)].toDF("origin", "node", "dist")
      else Reachability.reachableMulti(spark, edges, origins, cutoff = maxRouteMeters)
    pairsChecked.select(col("route_id"))
      .join(a, Seq("route_id"), "left")
      .join(b, Seq("route_id"), "left")
      .join(dist.select(col("origin").as("node_a"), col("node").as("node_b"),
        col("dist").as("route_m")), Seq("node_a", "node_b"), "left")
      .select(col("route_id"), col("node_a"), col("node_b"),
        col("snap_a_m"), col("snap_b_m"), col("route_m"),
        (col("snap_a_m") + col("route_m") + col("snap_b_m")).as("total_m"))
  }
}
