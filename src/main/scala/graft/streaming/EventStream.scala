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

  // ---- streaming exact-dedup ------------------------------------------------

  /** Streaming exact-dedup for continuous corpus ingestion: drop rows whose
    * content key was already seen within the watermark delay — the streaming
    * face of `Dedup.keepCanonical` (first ARRIVAL wins instead of min id;
    * for an id-ordered ingest the two agree). State is BOUNDED by the
    * watermark via `dropDuplicatesWithinWatermark`: a plain
    * `dropDuplicates` would pin every key ever seen, which at continuous
    * corpus-ingest scale grows without limit; within-watermark expiry keeps
    * state proportional to the delay window, the documented trade (a dup
    * arriving AFTER its original has aged past the delay is re-admitted —
    * callers choose the delay to cover their ingest reordering bound, and a
    * periodic batch keepCanonical sweep catches stragglers). Null content
    * keys dedup as one group via the SHARED sentinel expression
    * (Dedup.dedupKey — one definition, so batch/streaming agreement cannot
    * drift), under the uniquified internal column name (a plain "dedup_key"
    * would clobber, then drop, a caller's same-named column). */
  def dedupStreaming(rows: DataFrame, tsCol: String, keyCol: String,
                     delay: String): DataFrame = {
    import graft.ops.Dedup
    rows.withColumn(Dedup.DedupKeyCol, Dedup.dedupKey(col(keyCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Dedup.DedupKeyCol)
      .drop(Dedup.DedupKeyCol)
  }

  // ---- custom state: per-user sessionization -------------------------------

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

  /** Stateful sessionization via flatMapGroupsWithState: events grouped per
    * user; a gap > `gapSeconds` closes the session and emits it. The custom
    * per-key state surface (KeyValueGroupedDataset.flatMapGroupsWithState,
    * builder brief / SURVEY §2.9 "UDF surface"). The batch oracle below
    * computes identical sessions with a window gap-and-island query.
    *
    * BATCH-ONLY (ADVICE r01): this form flushes the open session at the end
    * of its single invocation — correct when all of a user's events arrive
    * in one pass (batch execution), wrong across micro-batches. The
    * streaming-correct form is `sessionizeStreaming` below, which holds the
    * open session in GroupState under an event-time timeout.
    *
    * Memory contract: one user's events for the invocation are sorted in
    * memory (flatMapGroupsWithState does not guarantee sorted input). For
    * batch workloads where single keys can hold millions of events, use the
    * declarative `sessionizeBatch` (window functions, spillable) instead. */
  def sessionize(events: org.apache.spark.sql.Dataset[Event],
                 gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var st = state.getOption.orNull
      evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val sec = e.ts.getTime / 1000
        if (st == null) st = SessionState(sec, sec, 1)
        else if (sec - st.last > gapSeconds) {
          out += Session(userId, st.start, st.last, st.n)
          st = SessionState(sec, sec, 1)
        } else st = SessionState(st.start, sec, st.n + 1)
      }
      if (st != null) out += Session(userId, st.start, st.last, st.n) // batch: flush
      state.remove()
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Streaming-correct sessionization (ADVICE r01): the open session stays
    * in GroupState with an EVENT-TIME TIMEOUT at last+gap, so a session
    * spanning micro-batches is extended, not split; it is emitted only when
    * the watermark passes its gap expiry. Callers must set
    * `.withWatermark("ts", ...)` upstream. Asserted equal to the batch form
    * across a two-batch split in StreamSpec. */
  def sessionizeStreaming(events: org.apache.spark.sql.Dataset[Event],
                          gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator.single(Session(userId, st.start, st.last, st.n))
      } else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Session]
        var st = state.getOption.orNull
        evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val sec = e.ts.getTime / 1000
          if (st == null) st = SessionState(sec, sec, 1)
          else if (sec - st.last > gapSeconds) {
            out += Session(userId, st.start, st.last, st.n)
            st = SessionState(sec, sec, 1)
          } else st = SessionState(st.start, sec, st.n + 1)
        }
        if (st != null) {
          state.update(st)
          // fires once the event-time watermark passes the gap expiry.
          // Clamp to watermark+1 (ADVICE r02): a group whose events are all
          // late can have expiry <= current watermark, and Spark throws
          // (killing the query) on a timeout at-or-before the watermark —
          // the clamp emits such a session at the next timeout sweep instead.
          val expiry = (st.last + gapSeconds) * 1000L + 1L
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs() + 1L, expiry))
        }
        out.iterator
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** The same sessions via the declarative gap-and-island form (lag +
    * cumulative sum) — the batch oracle for `sessionize`. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    events
      .withColumn("sec", expr("CAST(UNIX_TIMESTAMP(ts) AS BIGINT)"))
      .withColumn("prev", lag("sec", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("sec") - col("prev") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("sec").as("start_s"), max("sec").as("end_s"), count(lit(1)).as("n_events"))
      .drop("session_id")
  }
}
