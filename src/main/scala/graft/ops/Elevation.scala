package graft.ops

import graft.core.S2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Elevation field — inverse-distance-weighted interpolation over spot
  * heights (SURVEY.md §2.8; reference elevation.go:14-64 walks a sorted
  * cell array; here the same IDW over a cell-pruned candidate join).
  *
  * Samples within `radiusMeters` of the query point contribute with weight
  * 1/d (matching the reference's 1/distance weighting); a query with no
  * sample in range yields no row (the reference returns ok=false).
  */
object Elevation {

  /** @param points  (id, lat, lng, cell16) query side (big)
    * @param samples (s_lat, s_lng, height) spot heights (broadcast-sized)
    * @return (id, elevation) IDW height per point with >=1 sample in range. */
  def elevations(points: DataFrame, samples: DataFrame,
                 radiusMeters: Double, level: Int = 10): DataFrame = {
    // prune soundness: the 3x3 offset grid covers every level-`level` cell
    // intersecting the radius box as long as radius <= ~half the cell edge
    // at `level` (level 10 cells are ~8-10 km across -> radius <= ~4 km);
    // lng offsets scale by 1/cos(lat)
    val dDeg = radiusMeters / 111000.0
    val cellsUdf = udf((lat: Double, lng: Double) => {
      val gDeg = dDeg / math.max(0.2, math.cos(math.toRadians(lat)))
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      var i = -1
      while (i <= 1) {
        var j = -1
        while (j <= 1) {
          out += S2.cellAt(lat + i * dDeg, lng + j * gDeg, level)
          j += 1
        }
        i += 1
      }
      out.toArray
    })
    val sampleCells = samples
      .withColumn("scell", explode(cellsUdf(col("s_lat"), col("s_lng"))))
    val probes = points.withColumn("scell",
      graft.functions.S2Expressions.s2Ancestors(col("cell16"), Array(level))(0))
    // Fixed-point accumulation: quantize each weight / contribution to a
    // long BEFORE the sum, so the distributed aggregation is exact integer
    // arithmetic — bit-deterministic under any partitioning / merge order
    // (double sums are not associative; a hash-gated result must not depend
    // on shuffle order). elevation = (sum c_q / 2^20) / (sum w_q / 2^24).
    probes.join(broadcast(sampleCells), "scell")
      .withColumn("d", graft.functions.Udfs.haversineMeters(
        col("lat"), col("lng"), col("s_lat"), col("s_lng")))
      .where(col("d") <= radiusMeters)
      .withColumn("w", lit(1.0) / greatest(col("d"), lit(1.0)))
      .withColumn("wq", floor(col("w") * lit((1L << 24).toDouble)).cast("long"))
      .withColumn("cq", floor(col("w") * col("height") * lit((1L << 20).toDouble)).cast("long"))
      .groupBy("id")
      .agg(((sum("cq").cast("double") / lit((1L << 20).toDouble)) /
        (sum("wq").cast("double") / lit((1L << 24).toDouble))).as("elevation"))
  }
}
