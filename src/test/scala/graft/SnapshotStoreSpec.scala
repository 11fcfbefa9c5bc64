package graft

import graft.lineage.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Snapshot-versioned store (Iceberg table-format role): time-travel
  * isolation, bucket-granular copy-on-write (untouched files carried BY
  * REFERENCE), snapshot-scoped pruning, expiry, loud contracts. */
class SnapshotStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("snapshot-store-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshDir(tag: String): String = {
    val d = new java.io.File(s"target/snapspec_$tag").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  // rows spread across two far-apart buckets: London-ish and Sydney-ish
  private def rows(ids: Seq[Long], flag: String): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val (lat, lng) = if (i % 2 == 0) (51.5 + i * 1e-4, -0.12) else (-33.8 + i * 1e-4, 151.2)
      (i, flag, lat, lng)
    }.toDF("image_id", "status", "lat", "lng")
      .withColumn("cell16",
        graft.functions.S2Expressions.s2Cell16(col("lat"), col("lng")))
  }

  private def content(df: DataFrame): Set[(Long, String)] =
    df.select("image_id", "status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("time travel: v1 unchanged across append and upsert commits") {
    val dir = freshDir("tt")
    assert(SnapshotStore.create(spark, rows(1L to 10L, "a"), dir) == 1)
    assert(SnapshotStore.append(spark, rows(11L to 14L, "b"), dir) == 2)
    val delta = rows(Seq(2L, 4L), "u").withColumn("_deleted", lit(false))
      .unionByName(rows(Seq(3L), "x").withColumn("_deleted", lit(true)))
    assert(SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted")) == 3)
    assert(SnapshotStore.headVersion(spark, dir) == 3)
    // v1 is bit-identical to the original base
    assert(content(SnapshotStore.readVersion(spark, dir, 1)) ==
      (1L to 10L).map(i => (i, "a")).toSet)
    // v2 = base + append
    assert(content(SnapshotStore.readVersion(spark, dir, 2)) ==
      ((1L to 10L).map(i => (i, "a")) ++ (11L to 14L).map(i => (i, "b"))).toSet)
    // HEAD = v2 with 2,4 replaced and 3 deleted
    val want = ((1L to 10L).filterNot(Set(2L, 3L, 4L)).map(i => (i, "a")) ++
      (11L to 14L).map(i => (i, "b")) ++ Seq((2L, "u"), (4L, "u"))).toSet
    assert(content(SnapshotStore.read(spark, dir)) == want)
  }

  test("copy-on-write is bucket-granular: untouched files carry by reference") {
    val dir = freshDir("cow")
    SnapshotStore.create(spark, rows(1L to 20L, "a"), dir)
    // delta touches ONLY the London bucket (even ids)
    val delta = rows(Seq(2L), "u").withColumn("_deleted", lit(false))
    SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
    val m1 = SnapshotStore.manifest(spark, dir, 1)
    val m2 = SnapshotStore.manifest(spark, dir, 2)
    val carried = m2.files.toSet intersect m1.files.toSet
    assert(carried.nonEmpty, "no v1 file carried by reference into v2")
    // the touched bucket's files must differ (rewritten)
    assert(m2.files.toSet != m1.files.toSet)
    // row content is the CoW result
    assert(content(SnapshotStore.read(spark, dir)) ==
      ((1L to 20L).filterNot(_ == 2L).map(i => (i, "a")) :+ ((2L, "u"))).toSet)
  }

  test("snapshot-scoped range pruning reads fewer buckets than the table") {
    val dir = freshDir("prune")
    SnapshotStore.create(spark, rows(1L to 40L, "a"), dir)
    val m = SnapshotStore.manifest(spark, dir, 1)
    assert(m.stats.size >= 2, "fixture must span >= 2 buckets")
    // range = one bucket's own [min,max]
    val b0 = m.stats.minBy(_.bucket)
    val (df, nRead) = SnapshotStore.readRanges(spark, dir, 1,
      Seq((b0.cellMin, b0.cellMax)))
    assert(nRead < m.stats.size, s"pruning read all $nRead buckets")
    assert(df.count() >= b0.rows)
  }

  test("expireSnapshots deletes unreferenced files; kept snapshots still read") {
    val dir = freshDir("expire")
    SnapshotStore.create(spark, rows(1L to 10L, "a"), dir)
    val delta = rows(Seq(2L), "u").withColumn("_deleted", lit(false))
    SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
    val headBefore = content(SnapshotStore.read(spark, dir))
    val deleted = SnapshotStore.expireSnapshots(spark, dir, keepFrom = 2)
    assert(deleted > 0, "the rewritten v1 bucket's old file should be orphaned")
    assert(content(SnapshotStore.read(spark, dir)) == headBefore)
    intercept[Throwable](SnapshotStore.readVersion(spark, dir, 1).count())
  }

  test("changelog: insert/delete/update classified; rewritten-but-unchanged rows silent") {
    val dir = freshDir("cdc")
    SnapshotStore.create(spark, rows(1L to 10L, "a"), dir)
    val delta = rows(Seq(2L), "u").withColumn("_deleted", lit(false))
      .unionByName(rows(Seq(3L), "x").withColumn("_deleted", lit(true)))
      .unionByName(rows(Seq(21L), "b").withColumn("_deleted", lit(false)))
    SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
    val got = SnapshotStore.changelog(spark, dir, 1, 2)
      .select("image_id", "op").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // ids 4,6,8,10 share bucket(s) with 2/3 and were REWRITTEN unchanged —
    // they must not appear in the delta
    assert(got === Set((2L, "update"), (3L, "delete"), (21L, "insert")))
    // appended-only commit surfaces as pure inserts
    SnapshotStore.append(spark, rows(Seq(31L, 33L), "c"), dir)
    val got2 = SnapshotStore.changelog(spark, dir, 2, 3)
      .select("image_id", "op").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 === Set((31L, "insert"), (33L, "insert")))
  }

  test("streaming ingest: one snapshot per micro-batch, replayed batch ids are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir("stream")
    SnapshotStore.create(spark, rows(1L to 4L, "a"), dir)
    val ms = MemoryStream[Long]
    val stream = ms.toDF().select(col("value").as("image_id"))
      .withColumn("status", lit("s"))
      .withColumn("lat", lit(51.5) + col("image_id") * 1e-4)
      .withColumn("lng", lit(-0.12))
      .withColumn("cell16",
        graft.functions.S2Expressions.s2Cell16(col("lat"), col("lng")))
    // checkpoint must be as fresh as the MemoryStream: a leftover
    // checkpoint from a previous run carries committed offsets the new
    // stream doesn't have (observed: sliceEnd -1 STREAM_FAILED)
    val ckpt = freshDir("stream_ckpt")
    val q = SnapshotStore.ingestStream(stream, dir, ckpt).start()
    try {
      ms.addData(11L, 12L); q.processAllAvailable()
      ms.addData(13L); q.processAllAvailable()
    } finally q.stop()
    // stream == batch: HEAD holds base + every streamed row
    assert(content(SnapshotStore.read(spark, dir)) ==
      ((1L to 4L).map(i => (i, "a")) ++ Seq((11L, "s"), (12L, "s"), (13L, "s"))).toSet)
    // each non-empty micro-batch committed ONE snapshot; the idempotence
    // cursor tracks the highest batch id
    val head = SnapshotStore.headVersion(spark, dir)
    assert(head >= 3, s"expected >= 3 versions, got $head")
    val last = SnapshotStore.manifest(spark, dir, head).lastBatch
    assert(last >= 1)
    // at-least-once replay: re-delivering an already-committed batch id
    // must not append (no new version, content unchanged)
    val replay = rows(Seq(99L), "x")
    assert(SnapshotStore.appendBatch(spark, replay, dir, last).isEmpty)
    assert(SnapshotStore.headVersion(spark, dir) == head)
    // and the NEXT id commits normally
    assert(SnapshotStore.appendBatch(spark, replay, dir, last + 1).contains(head + 1))
  }

  test("model check: random commit sequences — every snapshot equals the map model") {
    // deterministic pseudo-random op sequence (splitmix64-seeded) replayed
    // against an in-memory Map[id -> status] model; after every commit the
    // model's snapshot is recorded, and at the end EVERY version is read
    // back and compared — time travel over arbitrary histories, not just
    // the hand fixtures
    import graft.core.Hashes
    val dir = freshDir("model")
    var model = (1L to 12L).map(i => i -> "a").toMap
    SnapshotStore.create(spark, rows(1L to 12L, "a"), dir)
    val history = scala.collection.mutable.ArrayBuffer(model)
    var nextId = 100L
    for (step <- 0 until 6) {
      val r = Hashes.splitmix64(7919L * (step + 1))
      if (r % 3 == 0) {
        // append fresh ids
        val ids = Seq(nextId, nextId + 1); nextId += 2
        SnapshotStore.append(spark, rows(ids, s"ap$step"), dir)
        model = model ++ ids.map(_ -> s"ap$step")
      } else {
        // upsert: update 2 existing (pseudo-randomly picked), delete 1,
        // insert 1 fresh
        val existing = model.keys.toSeq.sorted
        def pick(k: Long) = existing(((Hashes.splitmix64(r + k) >>> 11) % existing.size).toInt)
        val (u1, u2, d1) = (pick(1), pick(2), pick(3))
        val ins = nextId; nextId += 1
        val ups = Seq(u1, u2).distinct.filterNot(_ == d1)
        val delta = rows(ups, s"up$step").withColumn("_deleted", lit(false))
          .unionByName(rows(Seq(d1), "x").withColumn("_deleted", lit(true)))
          .unionByName(rows(Seq(ins), s"in$step").withColumn("_deleted", lit(false)))
        SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
        model = (model -- (ups :+ d1)) ++ ups.map(_ -> s"up$step") + (ins -> s"in$step")
      }
      history += model
    }
    assert(SnapshotStore.headVersion(spark, dir) == history.size)
    history.zipWithIndex.foreach { case (m, i) =>
      val got = content(SnapshotStore.readVersion(spark, dir, i + 1))
      assert(got == m.toSet, s"version ${i + 1} diverged from the model")
    }
    // changelog composes: replaying every consecutive delta over the model
    // of v1 must reproduce HEAD
    var replay = history.head
    (1 until history.size).foreach { v =>
      val delta = SnapshotStore.changelog(spark, dir, v, v + 1)
        .select("image_id", "status", "op").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      delta.foreach {
        case (id, _, "delete") => replay -= id
        case (id, st, _) => replay += (id -> st)
      }
    }
    assert(replay == history.last, "changelog replay diverged from HEAD")
  }

  test("create on an existing table fails loudly") {
    val dir = freshDir("dup")
    SnapshotStore.create(spark, rows(1L to 4L, "a"), dir)
    val e = intercept[IllegalArgumentException](
      SnapshotStore.create(spark, rows(5L to 6L, "a"), dir))
    assert(e.getMessage.contains("HEAD"))
  }

  test("bloom merge stays conservative: pre-bloom data never acquires a delta-only bloom") {
    // review r05: a bucket holding data from a bloom-less (legacy) commit
    // must STAY bloom-less after an append, or victim discovery would
    // probe a bloom that only covers the delta's keys and silently skip
    // deletes/updates of the older rows
    val dir = freshDir("legacy")
    SnapshotStore.create(spark, rows(1L to 10L, "a"), dir)
    val m1 = SnapshotStore.manifest(spark, dir, 1)
    // simulate a legacy v2: same files, no bloom lines in the manifest
    SnapshotStore.commit(spark, dir,
      m1.copy(version = 2, blooms = Map.empty, bloomCol = None))
    SnapshotStore.append(spark, rows(Seq(12L), "b"), dir)
    val m3 = SnapshotStore.manifest(spark, dir, 3)
    assert(m3.blooms.isEmpty,
      "buckets with pre-bloom data must carry no bloom after the merge")
    // the behavioral stake: deleting a pre-bloom row must still land
    val delta = rows(Seq(2L), "x").withColumn("_deleted", lit(true))
    SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
    assert(!content(SnapshotStore.read(spark, dir)).exists(_._1 == 2L),
      "delete of a pre-bloom row was silently skipped")
  }

  test("bloom column mismatch fails loudly instead of probing wrong values") {
    val dir = freshDir("bloomcol")
    SnapshotStore.create(spark, rows(1L to 4L, "a"), dir) // blooms over image_id
    val delta = rows(Seq(2L), "u").withColumnRenamed("image_id", "other_id")
      .withColumn("_deleted", lit(false))
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.upsert(spark, delta, dir, idCol = "other_id",
        deletedCol = Some("_deleted"))
    }
    assert(e.getMessage.contains("bloom"))
  }

  test("optimistic arbitration: a stale writer's commit conflicts; content survives") {
    // Iceberg catalog-CAS role (round 5): two writers race for v2 — the
    // loser must get CommitConflictException, never clobber the winner
    val dir = freshDir("race")
    SnapshotStore.create(spark, rows(1L to 6L, "a"), dir)
    SnapshotStore.append(spark, rows(Seq(7L), "b"), dir) // the winner's v2
    val m1 = SnapshotStore.manifest(spark, dir, 1)
    // the stale writer computed its own v2 from base v1 and now commits
    val e = intercept[SnapshotStore.CommitConflictException] {
      SnapshotStore.commit(spark, dir, m1.copy(version = 2))
    }
    assert(e.version == 2)
    assert(SnapshotStore.headVersion(spark, dir) == 2)
    assert(content(SnapshotStore.read(spark, dir)) ==
      ((1L to 6L).map(i => (i, "a")) :+ ((7L, "b"))).toSet)
  }

  test("optimistic arbitration: data-dir collision conflicts BEFORE damage; release + retry recovers") {
    val dir = freshDir("race2")
    SnapshotStore.create(spark, rows(1L to 6L, "a"), dir)
    // a crashed committer left a half-written v2 attempt (data dir only)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/data_v2"))
    intercept[SnapshotStore.CommitConflictException] {
      SnapshotStore.append(spark, rows(Seq(7L), "b"), dir)
    }
    assert(SnapshotStore.headVersion(spark, dir) == 1, "table must stay at v1")
    SnapshotStore.releaseFailedCommit(spark, dir, 2)
    assert(SnapshotStore.append(spark, rows(Seq(7L), "b"), dir) == 2)
    assert(content(SnapshotStore.read(spark, dir)) ==
      ((1L to 6L).map(i => (i, "a")) :+ ((7L, "b"))).toSet)
    // a COMMITTED version must never be releasable
    val g = intercept[IllegalArgumentException](
      SnapshotStore.releaseFailedCommit(spark, dir, 2))
    assert(g.getMessage.contains("refusing"))
  }

  test("withCommitRetries: lost races retry; exhaustion rethrows") {
    var calls = 0
    val got = SnapshotStore.withCommitRetries(maxRetries = 3) {
      calls += 1
      if (calls < 3) throw new SnapshotStore.CommitConflictException(9, "test")
      "ok"
    }
    assert(got == "ok" && calls == 3)
    intercept[SnapshotStore.CommitConflictException] {
      SnapshotStore.withCommitRetries(maxRetries = 1) {
        throw new SnapshotStore.CommitConflictException(9, "always")
      }
    }
  }

  test("bloom prune: a targeted delta reads fewer head files than the snapshot holds") {
    // VERDICT r04 #6: victim discovery is manifest-bloom-only and the
    // rewrite reads ONLY touched buckets' files — on a one-bucket delta the
    // scan telemetry must show a strict subset
    val dir = freshDir("bloom")
    SnapshotStore.create(spark, rows(1L to 20L, "a"), dir) // two buckets
    val delta = rows(Seq(2L), "u").withColumn("_deleted", lit(false))
    SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
    val scan = SnapshotStore.lastUpsertScan
    assert(scan.filesTotal > 0 && scan.filesScanned < scan.filesTotal,
      s"expected a strict file-scan subset, got $scan")
    // content identical to the full-scan semantics
    val want = ((1L to 20L).filterNot(_ == 2L).map(i => (i, "a")) :+ ((2L, "u"))).toSet
    assert(content(SnapshotStore.read(spark, dir)) == want)
  }

  test("delete-only merge that empties every touched bucket commits cleanly") {
    // ADVICE r04: zero part files are written for the empty rewrite, so the
    // new-bucket stats read must be skipped, not fail schema inference
    val dir = freshDir("delonly")
    // two buckets: Sydney {1}, London {2, 4}
    SnapshotStore.create(spark, rows(Seq(1L, 2L, 4L), "a"), dir)
    val delta = rows(Seq(2L, 4L), "x").withColumn("_deleted", lit(true))
    val v = SnapshotStore.upsert(spark, delta, dir, deletedCol = Some("_deleted"))
    assert(content(SnapshotStore.read(spark, dir)) == Set((1L, "a")))
    // the emptied bucket's stats are gone from the manifest
    val m = SnapshotStore.manifest(spark, dir, v)
    assert(m.stats.map(_.rows).sum == 1L)
  }
}
