package graft

import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming-correctness gate for sessionizeStreaming (ADVICE r01): a
  * session whose events span micro-batches must be EXTENDED, not split, and
  * is emitted only when the event-time watermark passes its gap expiry. */
class StreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("stream-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ev(id: Long, user: Long, sec: Long): EventStream.Event =
    EventStream.Event(id, new java.sql.Timestamp(sec * 1000L), user, "t", 1.0, "{}")

  test("session spanning micro-batches is extended and emitted on gap expiry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionizeStreaming(
      ms.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 3600)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      // batch 1: user 1, two events 10 min apart
      ms.addData(ev(1, 1L, 100000), ev(2, 1L, 100600))
      q.processAllAvailable()
      // batch 2: user 1 again 20 min later — same session, must extend
      ms.addData(ev(3, 1L, 101800))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0,
        "open session must NOT be emitted before the watermark passes its expiry")
      // batches 3+4: another user far in the future advances the watermark
      // past user 1's expiry (101800 + 3600); the timeout then fires
      ms.addData(ev(4, 2L, 120000))
      q.processAllAvailable()
      ms.addData(ev(5, 2L, 120001))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.contains((1L, 100000L, 101800L, 3L)),
        s"expected user 1 session (100000,101800,3) after expiry; got ${got.toSeq}")
    } finally q.stop()
  }

  test("a group arriving entirely late does not kill the query (timeout clamp)") {
    // Spark's FlatMapGroupsWithStateExec filters rows older than the
    // watermark before they reach the state function, so a fully-late group
    // is DROPPED (standard watermark semantics); the setTimeoutTimestamp
    // clamp (ADVICE r02) is defense-in-depth for any path where a kept
    // event's expiry lands at/below the watermark. The gate here: the query
    // keeps running through the late batch and on-time groups are unharmed.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionizeStreaming(
      ms.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 60)
    val q = sessions.writeStream.format("memory")
      .queryName("late_out").outputMode("append").start()
    try {
      // batch 1 pushes the watermark to ~199990
      ms.addData(ev(1, 1L, 200000))
      q.processAllAvailable()
      // batch 2: user 2's only event is far BEFORE the watermark
      ms.addData(ev(2, 2L, 100))
      q.processAllAvailable()
      assert(q.isActive, "late-only batch must not kill the query")
      // advance the watermark; on-time sessions flush normally
      ms.addData(ev(3, 1L, 200200))
      q.processAllAvailable()
      ms.addData(ev(4, 1L, 200500))
      q.processAllAvailable()
      assert(q.isActive)
      val got = spark.table("late_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.contains((1L, 200000L, 200000L, 1L)),
        s"on-time session must flush; got ${got.toSeq}")
      assert(!got.exists(_._1 == 2L), "fully-late group is dropped by the watermark filter")
    } finally q.stop()
  }

  test("batch sessionize and gap-and-island batch oracle agree (regression)") {
    import spark.implicits._
    val events = Seq(ev(1, 1L, 0), ev(2, 1L, 600), ev(3, 1L, 9000), ev(4, 2L, 50))
    val got = EventStream.sessionize(events.toDS(), gapSeconds = 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventStream.sessionizeBatch(events.toDF(), gapSeconds = 3600)
      .select("user_id", "start_s", "end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got == Set((1L, 0L, 600L, 2L), (1L, 9000L, 9000L, 1L), (2L, 50L, 50L, 1L)))
  }

  test("streaming dedup: first arrival wins across micro-batches, state expires with the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStream.Event]
    // props carries the content key; 10 s watermark delay bounds the state
    val deduped = EventStream.dedupStreaming(ms.toDS().toDF(), "ts", "props", "10 seconds")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      def evK(id: Long, sec: Long, key: String) =
        EventStream.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, "t", 1.0, key)
      // batch 1: duplicate key "A" within one batch -> first arrival only
      ms.addData(evK(1, 100, "A"), evK(2, 101, "A"), evK(3, 102, "B"))
      q.processAllAvailable()
      // batch 2: "A" again within the delay window -> dropped
      ms.addData(evK(4, 103, "A"))
      q.processAllAvailable()
      def ids() = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids() == Set(1L, 3L), s"within-delay duplicates must drop, got ${ids()}")
      // advance the watermark far past A's expiry (102 + 10 s), then "A"
      // re-admits — the documented bounded-state trade
      ms.addData(evK(5, 5000, "C"))
      q.processAllAvailable()
      ms.addData(evK(6, 5001, "A"))
      q.processAllAvailable()
      assert(ids() == Set(1L, 3L, 5L, 6L),
        s"expired key must re-admit (bounded state), got ${ids()}")
    } finally q.stop()
  }

  test("containment probe runs unchanged under Structured Streaming") {
    import org.apache.spark.sql.functions._
    // the probe is a stateless map-side operator, so the SAME code drives a
    // readStream source; per-region counts must equal the batch run
    val images = graft.model.Tables.images(spark, "/root/testdata/sf0.001")
      .select("image_id", "lat", "lng", "cell16")
    val dir = java.nio.file.Files.createTempDirectory("stream-img").toString
    images.write.mode("overwrite").parquet(dir)
    val batchCounts = graft.ops.Containment
      .containmentProbe(images, graft.model.Synth.regions)
      .groupBy("region_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val streamIn = spark.readStream
      .schema(images.schema)
      .parquet(dir)
    val q = graft.ops.Containment.containmentProbe(streamIn, graft.model.Synth.regions)
      .groupBy("region_id").count()
      .writeStream.format("memory").queryName("contain_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("contain_out")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == batchCounts && got.nonEmpty)
    } finally q.stop()
  }
}
