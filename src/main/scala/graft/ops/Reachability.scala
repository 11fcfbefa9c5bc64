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
  * is usually small — broadcast it when it fits. Checkpointing every ~10
  * rounds truncates the lineage chain.
  */
object Reachability {

  /** All nodes within `cutoff` cost of the origin set.
    * @param edges (src LONG, dst LONG, cost DOUBLE) directed; undirected
    *              graphs pass both directions.
    * @return (node LONG, dist DOUBLE) minimal cost per reached node. */
  def reachable(spark: SparkSession, edges: DataFrame, origins: Seq[Long],
                cutoff: Double, maxIters: Int = 50): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("cost").cast("double")).cache()
    var dist = origins.distinct.map(o => (o, 0.0)).toDF("node", "dist").cache()
    var frontier = dist
    var i = 0
    var done = false
    while (i < maxIters && !done) {
      val f = frontier.select(col("node").as("fnode"), col("dist").as("fdist"))
      val expanded = f.join(e, col("fnode") === col("src"))
        .select(col("dst").as("node"), (col("fdist") + col("cost")).as("dist"))
        .where(col("dist") <= cutoff)
        .groupBy("node").agg(min("dist").as("dist"))
      // keep only genuine improvements over the settled table
      val improved = expanded.join(dist.withColumnRenamed("dist", "old")
          .withColumnRenamed("node", "onode"),
          expanded("node") === col("onode"), "left")
        .where(col("old").isNull || col("dist") < col("old"))
        .select(col("node"), col("dist"))
        .cache()
      if (improved.isEmpty) { improved.unpersist(); done = true }
      else {
        val newDist = dist.unionByName(improved)
          .groupBy("node").agg(min("dist").as("dist")).cache()
        newDist.count() // materialize before releasing parents
        dist.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist = newDist
        frontier = improved
      }
      i += 1
    }
    e.unpersist()
    dist
  }
}
