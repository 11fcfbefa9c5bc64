package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingestion surface.
  *
  * The reference has NO streaming (SURVEY.md §2.9) — its only incremental
  * construct is the overlay world. This module is the engine's forward
  * surface for continuous ingestion of the same event/feature rows: file
  * source -> watermark -> windowed aggregation, with state kept by Spark.
  * The batch equivalent of the aggregation (hour buckets over epoch
  * seconds) is oracle-checked as q_events_window; the streaming path is
  * asserted equal to the batch path in StreamSpec via the memory sink. */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Windowed per-type counts over a streaming file source. */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** The batch-equivalent aggregation (same buckets, deterministic outputs
    * only: counts + exact distincts). */
  def batchWindowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("bucket", expr("CAST(FLOOR(UNIX_TIMESTAMP(ts) / 3600) AS BIGINT)"))
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
}
