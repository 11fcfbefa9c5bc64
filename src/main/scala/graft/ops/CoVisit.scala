package graft.ops

import graft.core.{Geo, S2}
import graft.functions.{S2Expressions, Udfs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatio-TEMPORAL co-visit join: all unordered pairs of geotagged, timestamped
  * rows within `radiusMeters` great-circle meters AND `windowSeconds` seconds
  * of each other — "two photos shot at the same place at the same time", the
  * burst/event detector an image-corpus pipeline runs before near-dup refine,
  * and the time-sliced form of the reference's within-distance search (b6
  * evaluates distance predicates against a world snapshot, i.e. one time
  * slice at a time, /root/reference/src/diagonal.works/b6/search/spatial.go
  * + ingest/mutable.go snapshot reads; this operator makes the time bound a
  * join dimension instead).
  *
  * Scale shape (the 100 TB contract): the q_dist_pairs covering-explode x
  * own-cell equi-join (DistanceJoin) CROSSED with time banding, so a
  * candidate pair must meet on an exact (cell, bucket) composite key:
  *   - probe side: explodes its cap covering at fixed level L (O(1) ~4-6
  *     cells) x the <=3 width-w buckets overlapping [ts-w, ts+w] — <=18
  *     keys per row, constant;
  *   - build side: its OWN (level-L cell, floor(ts/w) bucket) — one scalar
  *     codegen key;
  *   - exact refine (haversine + abs time delta) in the join projection.
  * Each qualifying pair emits EXACTLY once, no distinct: the build key is
  * unique per row and the probe keys form a set (distinct cells x distinct
  * buckets), so a pair meets on at most one composite key. Soundness: if
  * dist <= r then b's cell is in a's cap covering (the DistanceJoin
  * argument), and if |ts_a - ts_b| <= w then floor(ts_b/w) lies in
  * [floor((ts_a-w)/w), floor((ts_a+w)/w)] — the 3 probe buckets.
  * Time banding multiplies the number of DISTINCT join keys by the number
  * of occupied buckets, so hot urban cells shard across time — the skew is
  * strictly milder than the pure spatial join's; what remains is a plain
  * shuffled equi-join under AQE skew splitting.
  */
object CoVisit {

  /** q_covisit gate fixture: the London hot rectangle with a synthetic
    * seconds-of-day timestamp (exact integer arithmetic, evaluated by both
    * engine and golden) — adjacent lattice ids land ~2805 s apart, so the
    * window keeps id-local bursts and drops the rest. */
  val GateRadiusMeters = 150.0
  val GateWindowSeconds = 600L

  /** All pairs (id_a < id_b) with dist <= radiusMeters AND
    * |ts_a - ts_b| <= windowSeconds. Input: (id LONG, lat, lng DOUBLE,
    * ts LONG seconds). Output: (id_a, id_b, dist_m DOUBLE, dt_s LONG). */
  def covisitPairs(points: DataFrame, radiusMeters: Double,
                   windowSeconds: Long): DataFrame = {
    require(radiusMeters > 0, "radiusMeters must be positive")
    require(windowSeconds > 0, "windowSeconds must be positive")
    val angle = radiusMeters / Geo.EarthRadiusMeters
    val lvl = DistanceJoin.levelForRadius(angle)
    val covUdf = udf((lat: Double, lng: Double) =>
      S2.coveringAtLevel(S2.Cap(Geo.toXYZ(lat, lng), angle), lvl))
    val w = lit(windowSeconds)
    // exact integer floor division (pmod keeps it floor-, not truncate-,
    // semantics for negative ts; the intermediate double division is exact
    // because the numerator is a multiple of w and |ts| < 2^53 — epoch
    // seconds/millis are far below that)
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, w)) / w).cast("long")

    // probe: O(1) covering cells x the (<=3, distinct) buckets that can hold
    // a partner — one generator per projection (Spark's limit), so chained
    val probe = points
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lng").as("lng_a"), col("ts").as("ts_a"),
        explode(covUdf(col("lat"), col("lng"))).as("cell"))
      .select(col("id_a"), col("lat_a"), col("lng_a"), col("ts_a"), col("cell"),
        explode(array_distinct(array(
          bucketOf(col("ts_a") - w), bucketOf(col("ts_a")),
          bucketOf(col("ts_a") + w)))).as("bucket"))

    // build: the row's own (cell, bucket) — scalar codegen key
    val build = points
      .select(col("id").as("id_b"), col("lat").as("lat_b"),
        col("lng").as("lng_b"), col("ts").as("ts_b"),
        S2Expressions.s2Ancestors(
          S2Expressions.s2Cell16(col("lat"), col("lng")), Array(lvl))
          .getItem(0).as("cell"),
        bucketOf(col("ts")).as("bucket"))

    probe.join(build, Seq("cell", "bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dt_s", abs(col("ts_a") - col("ts_b")))
      .where(col("dt_s") <= w)
      .withColumn("dist_m",
        Udfs.haversineMeters(col("lat_a"), col("lng_a"), col("lat_b"), col("lng_b")))
      .where(col("dist_m") <= lit(radiusMeters))
      .select("id_a", "id_b", "dist_m", "dt_s")
  }
}
