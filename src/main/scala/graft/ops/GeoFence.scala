package graft.ops

import graft.functions.S2Expressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geofence ENTER/EXIT transition extraction over per-user trajectories —
  * the event-shaped form of the reference's containment surface: b6 answers
  * "which features are inside this area NOW" (search/spatial.go + the
  * ray-cast refine, api/functions/geometry.go); this operator differences
  * consecutive membership snapshots along each user's timeline and emits the
  * moments the answer CHANGES — the alerting/attribution primitive
  * ("photographer entered the stadium at t") a geotagged event pipeline
  * builds on top of containment.
  *
  * Semantics (deterministic): points are ordered per user by (sec,
  * event_id); a region appearing in a point's membership set but not the
  * previous point's emits `enter` AT that point, and one disappearing emits
  * `exit` AT the first point observed outside. The first point's previous
  * set is empty (a user starting inside a fence emits `enter` at their
  * first point); trailing membership emits no exit (the trajectory hasn't
  * left as far as the data shows).
  *
  * Scale shape: membership comes from the SAME pruned native containment
  * probe the containment join family uses (S2Expressions.containmentProbe —
  * broadcast region index, candidate cells pruned before the exact ray
  * cast, zero joins, codegen); then ONE window shuffle keyed by user, an
  * array set-difference against the lagged membership set, and ONE explode
  * of the per-point transition structs. No per-region pass, no join node —
  * cost is O(points) + O(transitions) regardless of |regions|.
  */
object GeoFence {

  /** Input: (user_id LONG, event_id LONG, sec LONG, lat, lng DOUBLE).
    * Output: (user_id, event_id, sec, region_id, kind in enter|exit). */
  def transitions(points: DataFrame,
                  regions: Array[graft.model.Synth.Region]): DataFrame = {
    val index = new ProbeIndex(regions)
    val flagged = points
      .withColumn("cell16", S2Expressions.s2Cell16(col("lat"), col("lng")))
      .withColumn("ridxs", sort_array(S2Expressions.containmentProbe(
        col("cell16"), col("lat"), col("lng"), index)))
      .drop("cell16")
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val trans = concat(
      transform(array_except(col("ridxs"), col("prev")),
        x => struct(x.as("ridx"), lit("enter").as("kind"))),
      transform(array_except(col("prev"), col("ridxs")),
        x => struct(x.as("ridx"), lit("exit").as("kind"))))
    flagged
      .withColumn("prev",
        coalesce(lag(col("ridxs"), 1).over(w), typedLit(Array.empty[Int])))
      .withColumn("t", explode(trans))
      .select(col("user_id"), col("event_id"), col("sec"),
        element_at(lit(index.regionIds), col("t.ridx") + 1).as("region_id"),
        col("t.kind").as("kind"))
  }
}
