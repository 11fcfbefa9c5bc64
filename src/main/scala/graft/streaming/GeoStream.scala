package graft.streaming

import graft.model.Synth
import graft.ops.Containment
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the geospatial core: continuous ingestion of geotagged
  * image rows -> geofence matches / tile manifests, via Structured Streaming.
  *
  * The reference serves its spatial queries over a STATIC world (SURVEY.md
  * §2.9 — the only incremental construct is the overlay world); this module
  * is the engine's forward surface for the north star's ingest side: a
  * continuous feed of (image_id, ts, lat, lng) rows geofenced against the
  * polygon regions and rolled into per-window tile/region manifests.
  *
  * Why this is safe to run streaming UNCHANGED from the batch operators:
  * `Containment.containmentProbe` and the tile-chain assignment are pure
  * map-side plans (scan -> native codegen expression -> generate — zero
  * shuffle, zero state), so they run per-micro-batch in append mode with
  * no watermark at all; correctness is literally the batch operator's,
  * which is oracle-gated (q_containment / q_tiles_points). The windowed
  * counts below add the one genuinely stateful piece (event-time windows +
  * watermark-bounded state), and the SAME function body serves as its own
  * batch oracle: `withWatermark` is a documented no-op under batch
  * execution, so GeoStreamSpec asserts stream == batch on identical rows
  * split across micro-batches.
  *
  * State discipline at design scale: the windowed aggregates keep one state
  * row per (window, region) / (window, z, x, y) — bounded by the watermark
  * delay, NOT by the corpus (the dedupStreaming trade, EventStream.scala).
  * The geofence itself keeps NO state.
  */
object GeoStream {

  /** Per-arrival geofence: emit one row per (image, containing region) with
    * the input columns preserved — the streaming form of the oracle-gated
    * containment probe (map-side, append mode, no watermark needed).
    * Adds `cell16` from (lat, lng) when the feed doesn't carry the
    * write-time cell assignment. */
  def geofence(images: DataFrame, regions: Array[Synth.Region]): DataFrame = {
    val withCell =
      if (images.columns.contains("cell16")) images
      else images.withColumn("cell16",
        graft.functions.S2Expressions.s2Cell16(col("lat"), col("lng")))
    Containment.containmentProbe(withCell, regions)
  }

  /** Windowed per-region arrival counts (geofence occupancy): tumbling
    * event-time windows of `windowDur`, state evicted once the watermark
    * (max event time - `delay`) passes a window's end. Emits in append mode
    * only after eviction — each (window, region) row is final when it
    * appears, the contract a downstream manifest sink wants.
    *
    * Run on a BATCH DataFrame this is its own oracle (watermark no-op).
    *
    * The watermark is taken BEFORE the geofence, on the raw arrival stream:
    * the probe is a filter (most arrivals match no region), and a watermark
    * placed after it would only advance on MATCHING rows — a quiet spell
    * inside the fences would hold every open window hostage to traffic that
    * happens to land in a region. Event time is a property of the feed, not
    * of the matches (GeoStreamSpec pins this with a no-match flusher). */
  def regionWindowCounts(images: DataFrame, regions: Array[Synth.Region],
                         tsCol: String, windowDur: String,
                         delay: String): DataFrame =
    geofence(images.withWatermark(tsCol, delay), regions)
      .groupBy(window(col(tsCol), windowDur), col("region_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("region_id"), col("n"))

  /** Windowed per-tile feature counts: the continuous tile-manifest feed
    * (the reference's serving-path counts, renderer/query.go:34, rolled per
    * event-time window instead of per static world). Tile assignment is the
    * SAME packed-TileID chain expression as the oracle-gated batch manifest
    * (Tiling.pointManifest); the window/watermark shape matches
    * `regionWindowCounts`.
    *
    * No 10k cap here: the batch cap ranks by id WITHIN a finished tile
    * (Tiling.tileCounts), which under streaming would need per-tile top-k
    * state; a serving layer caps at read time instead. */
  def tileWindowCounts(images: DataFrame, zMin: Int, zMax: Int,
                       tsCol: String, windowDur: String,
                       delay: String): DataFrame =
    images
      .withColumn("tid", explode(graft.functions.S2Expressions.tileChain(
        col("lat"), col("lng"), zMin, zMax)))
      .withColumn("z", expr("CAST(shiftrightunsigned(tid, 59) AS INT)"))
      .withColumn("x", expr("tid & (shiftleft(1L, z) - 1)"))
      .withColumn("y", expr("shiftrightunsigned(tid, z) & (shiftleft(1L, z) - 1)"))
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur), col("z"), col("x"), col("y"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("z"), col("x"), col("y"), col("n"))
}
