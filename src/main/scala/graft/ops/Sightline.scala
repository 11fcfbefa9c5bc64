package graft.ops

import graft.core.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sightline / viewshed (SURVEY.md §2.8; reference
  * api/functions/sightline.go — `SightlineUsingPolarCoordinates2` computes
  * the visibility polygon from a point with a radius cutoff, occluded by
  * building edges).
  *
  * Re-expressed Spark-first: cap-join collects each origin's barrier edges
  * (cell-pruned, broadcast origins), then a per-origin ANGULAR SWEEP runs
  * inside one task (flatMapGroups shape via groupBy + UDF): cast a ray at
  * every critical angle (edge endpoints ± epsilon), keep the nearest
  * intersection, and stitch the visible boundary in polar order — the same
  * algorithmic skeleton as the reference, independently implemented in a
  * local tangent plane (meters), which matches the reference's small-radius
  * regime (it uses planar-ish polar coordinates too).
  *
  * Output: one row per origin with the visibility polygon vertices
  * (closed implicitly), ordered by angle.
  */
object Sightline {

  /** Visibility polygon in the local tangent plane.
    * @param barriers segments ((x1,y1),(x2,y2)) in meters around the origin
    * @param radius   cutoff in meters
    * @return polygon vertices (x, y) in angular order. */
  def visibilityPolygon(barriers: Array[((Double, Double), (Double, Double))],
                        radius: Double): Array[(Double, Double)] = {
    val eps = 1e-9
    val angles = scala.collection.mutable.ArrayBuffer.empty[Double]
    barriers.foreach { case ((x1, y1), (x2, y2)) =>
      val a1 = math.atan2(y1, x1); val a2 = math.atan2(y2, x2)
      angles += a1 - eps; angles += a1; angles += a1 + eps
      angles += a2 - eps; angles += a2; angles += a2 + eps
    }
    // always include a ring of base angles so an empty scene yields the cap
    var k = 0
    while (k < 32) { angles += -math.Pi + 2 * math.Pi * k / 32; k += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    angles.sortInPlace()
    var last = Double.NaN
    angles.foreach { ang =>
      if (last.isNaN || math.abs(ang - last) > 1e-12) {
        last = ang
        val dx = math.cos(ang); val dy = math.sin(ang)
        var best = radius
        barriers.foreach { case ((x1, y1), (x2, y2)) =>
          // ray (t*d) x segment (p + u*(q-p)) intersection
          val rx = x2 - x1; val ry = y2 - y1
          val den = dx * ry - dy * rx
          if (math.abs(den) > 1e-15) {
            val t = (x1 * ry - y1 * rx) / den
            val u = (x1 * dy - y1 * dx) / den
            if (t > 1e-9 && u >= -1e-12 && u <= 1 + 1e-12 && t < best) best = t
          }
        }
        out += ((best * dx, best * dy))
      }
    }
    out.toArray
  }

  /** Spark operator: for each origin (id, lat, lng), the visibility polygon
    * against barrier segments drawn from region boundary edges within
    * `radius` meters. Origins are few (broadcast); barrier collection is a
    * map-side prune; each sweep runs in one task. */
  def sightlines(spark: SparkSession, origins: Seq[(Long, Double, Double)],
                 regions: DataFrame, radius: Double): DataFrame = {
    import spark.implicits._
    val originDf = origins.toDF("origin_id", "o_lat", "o_lng")
    // explode region shells into segments
    val segs = regions.select(col("region_id"),
        col("rings_lat")(0).as("ring_lat"), col("rings_lng")(0).as("ring_lng"))
      .withColumn("i", explode(transform(col("ring_lat"), (_, i) => i)))
      .select(
        col("ring_lat")(col("i")).as("a_lat"), col("ring_lng")(col("i")).as("a_lng"),
        col("ring_lat")((col("i") + 1) % size(col("ring_lat"))).as("b_lat"),
        col("ring_lng")((col("i") + 1) % size(col("ring_lng"))).as("b_lng"))
    val withOrigin = segs.crossJoin(broadcast(originDf))
      .where(Udf.segNear(col("a_lat"), col("a_lng"), col("b_lat"), col("b_lng"),
        col("o_lat"), col("o_lng"), lit(radius)))
    val sweep = udf((oLat: Double, oLng: Double,
                     aLat: Seq[Double], aLng: Seq[Double],
                     bLat: Seq[Double], bLng: Seq[Double]) => {
      val cosO = math.cos(math.toRadians(oLat))
      def toLocal(lat: Double, lng: Double): (Double, Double) =
        ((lng - oLng) * 111320.0 * cosO, (lat - oLat) * 111320.0)
      val barriers = aLat.indices.map { i =>
        (toLocal(aLat(i), aLng(i)), toLocal(bLat(i), bLng(i)))
      }.toArray
      visibilityPolygon(barriers, radius).toSeq
    })
    withOrigin.groupBy("origin_id", "o_lat", "o_lng")
      .agg(collect_list("a_lat").as("a_lat"), collect_list("a_lng").as("a_lng"),
        collect_list("b_lat").as("b_lat"), collect_list("b_lng").as("b_lng"))
      .select(col("origin_id"),
        sweep(col("o_lat"), col("o_lng"), col("a_lat"), col("a_lng"),
          col("b_lat"), col("b_lng")).as("polygon"))
  }

  private object Udf {
    import org.apache.spark.sql.expressions.UserDefinedFunction
    /** Is the segment within `radius` meters of the origin? (coarse prune:
      * endpoint or midpoint within radius + half segment length). */
    val segNear: UserDefinedFunction = udf(
      (aLat: Double, aLng: Double, bLat: Double, bLng: Double,
       oLat: Double, oLng: Double, radius: Double) => {
        val d = Polyline.distanceToPolylineMeters(oLat, oLng,
          Array(aLat, bLat), Array(aLng, bLng))
        d <= radius
      })
  }
}
