package graft.ops

import graft.core.{Geo, S2}
import graft.functions.Udfs
import graft.model.Synth.KnnQuery
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Geometric kNN via iterative S2 cell-ring (cap-covering) expansion — the
  * north star's kNN operator (SURVEY.md §2.4 "closest"; the reference's own
  * `closest` walks the street graph, api/functions/graph.go:106-153 — the
  * target engine's semantics are geometric per BASELINE.json).
  *
  * Round r: cover cap(q, radius_r) with S2 cells (driver-side pure math on
  * the tiny query side), broadcast the per-query coverings, probe the image
  * table map-side (no shuffle of the big side), rank candidates per query
  * with a distance-bounded top-k window. A query resolves when it has >= k
  * candidates whose k-th distance, inflated to a sound great-circle bound,
  * fits inside the probed radius; unresolved queries expand the radius 8x
  * (terminates at the full sphere).
  *
  * Metric: squared equirectangular degrees (exact arithmetic shared with the
  * oracle, Synth.KnnQuery.d2Sql). Soundness of the stop rule: a point with
  * d2 < T has |dlat| < sqrt(T) and |dlng| < sqrt(T)/cosLat, so its
  * great-circle distance is < sqrt(T) * (1 + 1/cosLat) degrees.
  */
object Knn {

  private val resultSchema = StructType(Seq(
    StructField("query_id", IntegerType, nullable = false),
    StructField("image_id", LongType, nullable = false),
    StructField("rank", IntegerType, nullable = false)))

  /** Shared expansion loop for the squared-equirectangular metric: the two
    * public forms differ ONLY in where each round's probe rows come from
    * (cached projection vs CellStore range read) — one loop, no drift
    * (review r02). */
  private def knnRounds(spark: SparkSession, queries: Seq[KnnQuery], k: Int,
                        initialRadiusDeg: Double,
                        imagesForRound: (Boolean, Seq[(Long, Long)]) => DataFrame): DataFrame = {
    var remaining = queries
    var radiusDeg = initialRadiusDeg
    val resolved = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (remaining.nonEmpty) {
      val full = radiusDeg >= 180.0
      val qRows = remaining.map { q =>
        val covering: Seq[Long] =
          if (full) (0 until 6).map(f => S2.parent(f.toLong << S2.PosBits | (1L << (S2.PosBits - 1)), 0))
          else S2.covering(
            S2.Cap(Geo.toXYZ(q.lat, q.lng), math.toRadians(radiusDeg)),
            maxCells = 12, maxLevel = 16).toSeq
        (q.queryId, q.lat, q.lng, q.cosLat, covering)
      }
      val qDf = spark.createDataFrame(qRows.map(q => (q._1, q._2, q._3, q._4)))
        .toDF("query_id", "qlat", "qlng", "qcos")
      val ranges = qRows.flatMap(_._5).map(c => (S2.rangeMin(c), S2.rangeMax(c)))
      val imgs = imagesForRound(full, ranges)
      // map-side interval stab instead of a nested-loop join condition: one
      // pass over the (tiny, driver-built) covering-interval table per row,
      // emitting matching query ids — no |imgs| x |queries| row-pair
      // generation; the broadcast join after the explode is a plain equi-join
      val intervals = qRows.flatMap { case (qid, _, _, _, cov) =>
        cov.map(c => (S2.rangeMin(c), S2.rangeMax(c), qid))
      }.sortBy(_._1).toArray
      val los = intervals.map(_._1)
      val his = intervals.map(_._2)
      val qids = intervals.map(_._3)
      val stab = udf((cell: Long) => {
        val lo = S2.rangeMin(cell); val hi = S2.rangeMax(cell)
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < los.length) {
          if (los(i) <= lo && hi <= his(i) && !out.contains(qids(i))) out += qids(i)
          i += 1
        }
        out.toArray
      })
      val d2 = (col("lat") - col("qlat")) * (col("lat") - col("qlat")) +
        ((col("lng") - col("qlng")) * col("qcos")) * ((col("lng") - col("qlng")) * col("qcos"))
      val cands = imgs
        .withColumn("query_id", explode(stab(col("cell16"))))
        .join(broadcast(qDf), "query_id")
        .withColumn("d2", d2)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("d2"), col("image_id"))))
        .where(col("rank") <= k)
        .select(col("query_id"), col("image_id"), col("rank"), col("d2"))
        .collect() // <= |queries| * k tiny rows; heavy filter+topk ran distributed
      val byQuery = cands.groupBy(_.getInt(0))
      val still = scala.collection.mutable.ArrayBuffer.empty[KnnQuery]
      remaining.foreach { q =>
        val rows = byQuery.getOrElse(q.queryId, Array.empty)
        val kthBoundDeg =
          if (rows.length < k) Double.MaxValue
          else math.sqrt(rows.map(_.getDouble(3)).max) * (1.0 + 1.0 / q.cosLat)
        if (full || (rows.length >= k && kthBoundDeg <= radiusDeg))
          rows.foreach(r => resolved += Row(r.getInt(0), r.getLong(1), r.getInt(2)))
        else still += q
      }
      remaining = still.toSeq
      radiusDeg *= 8
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(resolved.toSeq, 1), resultSchema)
      .orderBy("query_id", "rank")
  }

  def knn(spark: SparkSession, images: DataFrame, queries: Seq[KnnQuery],
          k: Int = 10, initialRadiusDeg: Double = 2.0): DataFrame = {
    // cache the probe projection: every expansion round re-probes it, and
    // without the cache the upstream cell-assignment UDF re-runs per round
    val imgs = images.select(col("image_id"), col("lat"), col("lng"), col("cell16")).cache()
    try knnRounds(spark, queries, k, initialRadiusDeg, (_, _) => imgs)
    finally imgs.unpersist()
  }

  /** CellStore-backed kNN: identical semantics and results to `knn`, but
    * each expansion round READS ONLY the store buckets overlapping the
    * round's cap coverings (`CellStore.readRanges`) instead of re-scanning
    * the full projection — the design-scale shape (VERDICT r01 hazard):
    * early rounds touch only the files under the query caps, so a 10^12-row
    * table costs IO proportional to the caps, not the table. */
  def knnFromStore(spark: SparkSession, storeDir: String, queries: Seq[KnnQuery],
                   k: Int = 10, initialRadiusDeg: Double = 2.0): DataFrame = {
    import graft.lineage.CellStore
    knnRounds(spark, queries, k, initialRadiusDeg, (full, ranges) =>
      if (full) CellStore.readAll(spark, storeDir)
      else CellStore.readRanges(spark, storeDir, ranges)._1)
  }

  private val resultSchemaM = StructType(Seq(
    StructField("query_id", IntegerType, nullable = false),
    StructField("image_id", LongType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("dist_m", DoubleType, nullable = false)))

  /** Great-circle kNN — the production metric (b6 distance semantics,
    * units/units.go). The stop rule is direct: the probed cap has
    * great-circle radius r, so once the k-th candidate's haversine distance
    * is <= r the result is complete. */
  def knnHaversine(spark: SparkSession, images: DataFrame, queries: Seq[KnnQuery],
                   k: Int = 10, initialRadiusMeters: Double = 200000.0): DataFrame = {
    var remaining = queries
    var radiusM = initialRadiusMeters
    val resolved = scala.collection.mutable.ArrayBuffer.empty[Row]
    val imgs = images.select(col("image_id"), col("lat"), col("lng"), col("cell16")).cache()

    while (remaining.nonEmpty) {
      val angle = radiusM / Geo.EarthRadiusMeters
      val full = angle >= math.Pi
      val qRows = remaining.map { q =>
        val covering: Seq[Long] =
          if (full) (0 until 6).map(f => S2.parent(f.toLong << S2.PosBits | (1L << (S2.PosBits - 1)), 0))
          else S2.covering(S2.Cap(Geo.toXYZ(q.lat, q.lng), angle),
            maxCells = 12, maxLevel = 16).toSeq
        (q.queryId, q.lat, q.lng, covering)
      }
      val qDf = spark.createDataFrame(qRows.map(q => (q._1, q._2, q._3)))
        .toDF("query_id", "qlat", "qlng")
      // same map-side interval stab as the d2 loop (no nested-loop join)
      val intervals = qRows.flatMap { case (qid, _, _, cov) =>
        cov.map(c => (S2.rangeMin(c), S2.rangeMax(c), qid))
      }.sortBy(_._1).toArray
      val los = intervals.map(_._1)
      val his = intervals.map(_._2)
      val qids = intervals.map(_._3)
      val stab = udf((cell: Long) => {
        val lo = S2.rangeMin(cell); val hi = S2.rangeMax(cell)
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < los.length) {
          if (los(i) <= lo && hi <= his(i) && !out.contains(qids(i))) out += qids(i)
          i += 1
        }
        out.toArray
      })
      val cands = imgs
        .withColumn("query_id", explode(stab(col("cell16"))))
        .join(broadcast(qDf), "query_id")
        .withColumn("dist_m", Udfs.haversineMeters(
          col("lat"), col("lng"), col("qlat"), col("qlng")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("dist_m"), col("image_id"))))
        .where(col("rank") <= k)
        .select(col("query_id"), col("image_id"), col("rank"), col("dist_m"))
        .collect()

      val byQuery = cands.groupBy(_.getInt(0))
      val still = scala.collection.mutable.ArrayBuffer.empty[KnnQuery]
      remaining.foreach { q =>
        val rows = byQuery.getOrElse(q.queryId, Array.empty)
        val complete = full ||
          (rows.length >= k && rows.map(_.getDouble(3)).max <= radiusM)
        if (complete) rows.foreach(r =>
          resolved += Row(r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        else still += q
      }
      remaining = still.toSeq
      radiusM *= 4
    }
    imgs.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(resolved.toSeq, 1), resultSchemaM)
      .orderBy("query_id", "rank")
  }
}
