package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph reachability — b6's `reachable` family (SURVEY.md §2.4;
  * Dijkstra flood /root/reference/src/diagonal.works/b6/graph/graph.go:258-541)
  * re-expressed as Pregel-style frontier expansion over an edge DataFrame:
  *
  *   frontier_{i+1} = min_dist( frontier_i JOIN edges ON src ) under cutoff
  *
  * Each iteration is one distributed join + aggregation; bounded-radius
  * queries converge in ~10-30 iterations (SURVEY.md §2.4). The distance
  * table accumulates the per-node minimum. Deterministic: pure min-plus
  * algebra, no tie-dependent state.
  *
  * Scale notes: edges should be pre-partitioned by `src` so the iterated
  * join co-locates (at design scale: bucketed Iceberg table); the frontier
  * is usually small — broadcast it when it fits. Every per-round table is
  * rebuilt from a persisted RDD (Tracker.materialize): without lineage
  * truncation the plan (and Catalyst's planning time) grows with the
  * iteration count — the classic iterative-Spark trap; intermediates are
  * released when the call returns (only the result stays persisted).
  */
object Reachability {

  // iteration-table materialization lives in the shared ops.Tracker
  // (lineage truncation; see its scaladoc)

  /** The shared min-plus fixpoint: `init` carries `keyCols :+ "dist"` where
    * the last key column is the frontier node. Returns the settled table. */
  private def flood(spark: SparkSession, edges: DataFrame, init: DataFrame,
                    keyCols: Seq[String], cutoff: Double, maxIters: Int,
                    tracker: Tracker, cacheEdges: Boolean = true): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    // cacheEdges=false for a data-sized edge table (the bucketed design-
    // scale deployment): materializing the FULL table into executor storage
    // per query evicts other cached state, while the iterated join only
    // probes the frontier's keys each round (r03c audit) — let the bucketed
    // source scans serve each round instead.
    val eProj = edges.select(col("src"), col("dst"), col("cost").cast("double"))
    val e = if (cacheEdges) eProj.cache() else eProj
    var (dist, _, distRdd) = tracker.materialize(init)
    var frontier = dist
    var i = 0
    var done = false
    val carry = keyCols.filterNot(_ == "node")
    while (i < maxIters && !done) {
      val expanded = frontier
        .withColumnRenamed("node", "fnode").withColumnRenamed("dist", "fdist")
        .join(e, col("fnode") === col("src"))
        .select(carry.map(col) ++ Seq(col("dst").as("node"),
          (col("fdist") + col("cost")).as("dist")): _*)
        .where(col("dist") <= cutoff)
        .groupBy(keyCols.map(col): _*).agg(min("dist").as("dist"))
      // keep only genuine improvements over the settled table
      val (improved, nImproved, _) = tracker.materialize(expanded.as("x")
        .join(dist.as("s"),
          keyCols.map(c => col(s"x.$c") === col(s"s.$c")).reduce(_ && _), "left")
        .where(col("s.dist").isNull || col("x.dist") < col("s.dist"))
        .select(keyCols.map(c => col(s"x.$c").as(c)) :+ col("x.dist").as("dist"): _*))
      if (nImproved == 0) done = true
      else {
        val (d, _, r) = tracker.materialize(dist.unionByName(improved)
          .groupBy(keyCols.map(col): _*).agg(min("dist").as("dist")))
        dist = d; distRdd = r
        frontier = improved
      }
      i += 1
    }
    // LOUD truncation (ADVICE r02): exiting at maxIters without a proven
    // fixpoint means `dist` MAY not be settled — downstream consumers
    // (pathsToReach pred derivation, closest argmin) would silently compute
    // from non-settled distances. A run that converges in EXACTLY maxIters
    // improving rounds is still correct, so run one read-only confirmation
    // expansion before deciding (review r03): only a genuinely pending
    // improvement throws. Same policy as the pathsToReach maxDepth guard;
    // callers' catch blocks release the tracked RDDs.
    if (!done) {
      val pending = frontier
        .withColumnRenamed("node", "fnode").withColumnRenamed("dist", "fdist")
        .join(e, col("fnode") === col("src"))
        .select(carry.map(col) ++ Seq(col("dst").as("node"),
          (col("fdist") + col("cost")).as("dist")): _*)
        .where(col("dist") <= cutoff)
        .groupBy(keyCols.map(col): _*).agg(min("dist").as("dist"))
        .as("x")
        .join(dist.as("s"),
          keyCols.map(c => col(s"x.$c") === col(s"s.$c")).reduce(_ && _), "left")
        .where(col("s.dist").isNull || col("x.dist") < col("s.dist"))
        .limit(1).count()
      if (pending > 0) {
        e.unpersist()
        throw new IllegalStateException(
          s"flood: no fixpoint after maxIters=$maxIters iterations " +
            "(improvements still pending); raise maxIters")
      }
    }
    e.unpersist()
    (dist, distRdd)
  }

  /** All nodes within `cutoff` cost of the origin set.
    * @param edges (src LONG, dst LONG, cost DOUBLE) directed; undirected
    *              graphs pass both directions.
    * @return (node LONG, dist DOUBLE) minimal cost per reached node. */
  def reachable(spark: SparkSession, edges: DataFrame, origins: Seq[Long],
                cutoff: Double, maxIters: Int = 50,
                cacheEdges: Boolean = true): DataFrame = {
    import spark.implicits._
    val init = origins.distinct.map(o => (o, 0.0)).toDF("node", "dist")
    val t = new Tracker
    try {
      val (dist, distRdd) = flood(spark, edges, init, Seq("node"), cutoff, maxIters, t, cacheEdges)
      t.releaseExcept(distRdd)
      Tracker.registerSurvivor(distRdd) // EngineCaches releases it later
      dist
    } catch { case e: Throwable => t.releaseAll(); throw e }
  }

  /** Per-origin distances: same min-plus loop keyed by (origin, node) —
    * the substrate for `closest` and `building-access`.
    * @return (origin LONG, node LONG, dist DOUBLE). */
  def reachableMulti(spark: SparkSession, edges: DataFrame, origins: Seq[Long],
                     cutoff: Double, maxIters: Int = 50,
                     cacheEdges: Boolean = true): DataFrame = {
    import spark.implicits._
    val init = origins.distinct.map(o => (o, o, 0.0)).toDF("origin", "node", "dist")
    val t = new Tracker
    try {
      val (dist, distRdd) = flood(spark, edges, init, Seq("origin", "node"), cutoff, maxIters, t, cacheEdges)
      t.releaseExcept(distRdd)
      Tracker.registerSurvivor(distRdd) // EngineCaches releases it later
      dist
    } catch { case e: Throwable => t.releaseAll(); throw e }
  }

  /** `connect` (reference api/functions/graph.go:218-239: add a path
    * between two points as a Change): the edge-table delta — append both
    * directed rows; evaluate any reachability query over the union for
    * with-change semantics. */
  def connect(edges: DataFrame, src: Long, dst: Long, cost: Double): DataFrame = {
    import edges.sparkSession.implicits._
    edges.unionByName(
      Seq((src, dst, cost), (dst, src, cost)).toDF("src", "dst", "cost"))
  }

  /** Network-distance `closest` / `closest-distance` (SURVEY.md §2.4;
    * reference api/functions/graph.go:106-153 floods to the cutoff then
    * takes the matching feature of minimal distance): per origin, the target
    * node of minimal network distance, ties broken by node id.
    * @param targets (node LONG) the "query" side (e.g. tagged features).
    * @return (origin, node, dist) one row per origin that reaches >=1
    *         target. */
  def closest(spark: SparkSession, edges: DataFrame, origins: Seq[Long],
              targets: DataFrame, cutoff: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    reachableMulti(spark, edges, origins, cutoff)
      .join(targets.select(col("node")), Seq("node"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("origin").orderBy(col("dist"), col("node"))))
      .where(col("rn") === 1)
      .select(col("origin"), col("node"), col("dist"))
  }

  /** `building-access` (reference api/functions/access.go:9-43: which
    * "buildings" each origin can reach within the cutoff): per-origin flood
    * joined against the building->node table, minimal distance per
    * (origin, building).
    * @param buildings (node LONG, building_id LONG).
    * @return (origin, building_id, dist). */
  def buildingAccess(spark: SparkSession, edges: DataFrame, origins: Seq[Long],
                     buildings: DataFrame, cutoff: Double): DataFrame =
    reachableMulti(spark, edges, origins, cutoff)
      .join(buildings, Seq("node"))
      .groupBy("origin", "building_id").agg(min("dist").as("dist"))

  /** Isochrone / catchment polygon — the composition b6's accessibility
    * demos run (flood to a cost cutoff, then `reachable-area` over the
    * reached features: api/functions/graph.go:106-153 + 202-216): per
    * origin, the convex-hull area of every reached node that has a
    * location, plus the reached-with-location count.
    *
    * Scale shape: the flood is the shared min-plus fixpoint (lineage-
    * truncated); the hull runs through the BOUNDED compacting aggregator
    * (partial aggregation, 256-point buffers), so a metro-sized catchment
    * with 10^8 reached nodes never collects per group. One aggregation
    * computes count and hull together — no second shuffle.
    *
    * @param coords (node LONG, lat, lng); reached nodes absent from it are
    *               excluded from BOTH the count and the hull (inner join).
    * @return (origin, n_nodes LONG, hull_area_m2 DOUBLE). */
  def isochrone(spark: SparkSession, edges: DataFrame, origins: Seq[Long],
                cutoff: Double, coords: DataFrame): DataFrame =
    reachableMulti(spark, edges, origins, cutoff)
      .join(coords.select(col("node"), col("lat"), col("lng")), Seq("node"))
      .groupBy("origin")
      .agg(count(lit(1)).as("n_nodes"),
        Geometry.hullAreaAgg(col("lat"), col("lng")).as("hull_area_m2"))

  /** `paths-to-reach` (reference api/functions/graph.go:155-200: for every
    * reached node, walk its shortest path back to the origin and count each
    * edge's usage): re-expressed distributed —
    *
    *   1. settled distances from one origin (min-plus fixpoint);
    *   2. deterministic shortest-path tree: pred(v) = the edge (u,v) with
    *      dist(u) + cost == dist(v), ties -> min u (exact double equality
    *      holds at the fixpoint because dist(v) IS one of those sums);
    *   3. edge usage by iterative climb: each node contributes one use to
    *      every tree edge on its path — `depth` rounds of joining the
    *      climbing frontier with the (broadcastable) pred map.
    *
    * @return (src, dst, uses LONG) tree edges with their usage counts. */
  def pathsToReach(spark: SparkSession, edges: DataFrame, origin: Long,
                   cutoff: Double, maxDepth: Int = 64,
                   broadcastNodeLimit: Long = 5000000L): DataFrame = {
    import spark.implicits._
    val t = new Tracker
    try {
    val e = edges.select(col("src"), col("dst"), col("cost").cast("double"))
    val (dist, _) = flood(spark, edges,
      Seq((origin, 0.0)).toDF("node", "dist"), Seq("node"), cutoff, 50, t)
    // pred(v): min src among edges attaining dist(v) = dist(src) + cost
    val (pred, nPred, _) = t.materialize(
      dist.select(col("node").as("dst"), col("dist").as("ddst"))
        .where(col("dst") =!= origin)
        .join(e, Seq("dst"))
        .join(dist.select(col("node").as("src"), col("dist").as("dsrc")), Seq("src"))
        .where(col("dsrc") + col("cost") === col("ddst"))
        .groupBy("dst").agg(min("src").as("pred")))
    // pred has one row per reached node — data-sized for a large cutoff on
    // a big graph. Broadcast it only while it fits (the count is free from
    // the snapshot); beyond the limit the climb joins shuffle-hash, which
    // repartitions the (same-sized) frontier instead of pushing a
    // multi-GB broadcast to every executor each hop (r03c audit).
    val predSide =
      if (nPred <= broadcastNodeLimit) broadcast(pred) else pred.hint("shuffle_hash")
    // climb: frontier (leaf = every non-origin node, cur); one use per hop
    var (frontier, nFrontier, _) = t.materialize(dist.where(col("node") =!= origin)
      .select(col("node").as("leaf"), col("node").as("cur")))
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var depth = 0
    while (depth < maxDepth && nFrontier > 0) {
      val (hop, _, _) = t.materialize(
        frontier.join(predSide, frontier("cur") === pred("dst"))
          .select(col("leaf"), col("pred"), col("cur")))
      rounds += hop.groupBy(col("pred").as("src"), col("cur").as("dst"))
        .agg(count(lit(1)).as("uses"))
      val (next, nNext, _) = t.materialize(hop.where(col("pred") =!= origin)
        .select(col("leaf"), col("pred").as("cur")))
      frontier = next
      nFrontier = nNext
      depth += 1
    }
    // LOUD truncation (review r02): silently capping the climb would return
    // undercounted uses for trees deeper than maxDepth
    if (nFrontier > 0)
      throw new IllegalStateException(
        s"pathsToReach: shortest-path tree deeper than maxDepth=$maxDepth; raise maxDepth")
    val out = rounds.reduceOption(_ unionByName _)
      .map(_.groupBy("src", "dst").agg(sum("uses").as("uses")))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dst", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("uses", org.apache.spark.sql.types.LongType)))))
    val (outM, _, outRdd) = t.materialize(out)
    t.releaseExcept(outRdd)
    Tracker.registerSurvivor(outRdd) // EngineCaches releases it later
    outM
    } catch {
      // release EVERYTHING on failure — the maxDepth throw (and any Spark
      // error mid-climb) must not leak the per-round persisted RDDs
      case e: Throwable => t.releaseAll(); throw e
    }
  }
}
