package graft

import graft.core.Geo
import graft.model.Tables
import graft.ops.{Geometry, Overlay, Reachability}
import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class Ops2Spec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("ops2-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("reachability frontier loop equals in-process Dijkstra") {
    import spark.implicits._
    // deterministic small graph: ring of 30 + random chords
    val n = 30
    val ring = (0 until n).flatMap(i => Seq(
      (i.toLong, ((i + 1) % n).toLong, 1.0), (((i + 1) % n).toLong, i.toLong, 1.0)))
    val chords = (0 until 15).flatMap { k =>
      val a = graft.core.Hashes.splitmix64(k * 3L).abs % n
      val b = graft.core.Hashes.splitmix64(k * 3L + 1).abs % n
      val c = 0.5 + (graft.core.Hashes.splitmix64(k * 3L + 2).abs % 40) / 10.0
      if (a == b) Nil else Seq((a, b, c), (b, a, c))
    }
    val edges = (ring ++ chords).toDF("src", "dst", "cost")
    val cutoff = 6.5
    val got = Reachability.reachable(spark, edges, Seq(0L), cutoff)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

    // brute-force Dijkstra
    val adj = (ring ++ chords).groupBy(_._1).map { case (k, v) => (k, v.map(e => (e._2, e._3))) }
    val dist = scala.collection.mutable.Map(0L -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, 0L))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d <= dist(u) + 1e-12) {
        adj.getOrElse(u, Nil).foreach { case (v, c) =>
          val nd = d + c
          if (nd <= cutoff && nd < dist.getOrElse(v, Double.MaxValue) - 1e-12) {
            dist(v) = nd; pq.enqueue((nd, v))
          }
        }
      }
    }
    assert(got.keySet == dist.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - dist(k)) < 1e-9, s"node $k") }
    assert(got.size > 5)
  }

  test("overlay: delta wins, additions appear, untouched base passes through") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val delta = Seq((2L, "B"), (4L, "D")).toDF("id", "v")
    val got = Overlay.overlay(base, delta, "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("hull-area aggregation matches direct hull computation") {
    import spark.implicits._
    val pts = Seq.tabulate(50) { i =>
      val a = graft.core.Hashes.splitmix64(i.toLong)
      ("g", 51.0 + ((a >>> 20) % 1000) / 10000.0, -0.2 + ((a >>> 40) % 1000) / 10000.0)
    }
    val df = pts.toDF("g", "lat", "lng")
    val got = Geometry.hullAreaM2(df, "g", "lat", "lng")
      .collect()(0).getAs[Double]("hull_area_m2")
    val la = pts.map(_._2).toArray
    val lo = pts.map(_._3).toArray
    val idx = Geo.convexHull(la, lo)
    val want = Geo.sphericalAreaM2(idx.map(la(_)), idx.map(lo(_)))
    assert(math.abs(got - want) < 1e-6 && got > 0)
  }

  test("hull-area typed Aggregator compacts and matches the direct path") {
    import spark.implicits._
    val pts = Seq.tabulate(600) { i => // > compaction threshold
      val a = graft.core.Hashes.splitmix64(1000L + i)
      (51.0 + ((a >>> 20) % 1000) / 10000.0, -0.2 + ((a >>> 40) % 1000) / 10000.0)
    }
    val ds = pts.toDF("lat", "lng").as[(Double, Double)]
    val got = ds.select(Geometry.HullAreaAgg.toColumn).collect()(0)
    val la = pts.map(_._1).toArray
    val lo = pts.map(_._2).toArray
    val idx = Geo.convexHull(la, lo)
    val want = Geo.sphericalAreaM2(idx.map(la(_)), idx.map(lo(_)))
    assert(math.abs(got - want) / want < 1e-9)
  }

  test("Douglas-Peucker keeps endpoints, drops collinear, keeps corners") {
    // straight line with a bump in the middle
    val lat = Array(0.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    val lng = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val kept = Geo.simplify(lat, lng, tolDeg = 0.1)
    assert(kept.head == 0 && kept.last == 5)
    assert(kept.contains(3), "the bump must survive")
    assert(!kept.contains(1), "the collinear point before the bump drops")
    assert(kept.length < lat.length)
    // zero tolerance keeps everything non-collinear; huge tol keeps only ends
    assert(Geo.simplify(lat, lng, 10.0).toSeq == Seq(0, 5))
  }

  test("geometry scalars: length/area/centroid/interpolate kernel sanity") {
    // ~1km square at the equator
    val la = Array(0.0, 0.0, 0.009, 0.009)
    val lo = Array(0.0, 0.009, 0.009, 0.0)
    val side = Geo.haversineMeters(0, 0, 0, 0.009)
    val closed = la :+ la(0)
    val closedLo = lo :+ lo(0)
    assert(math.abs(Geo.polylineLengthMeters(closed, closedLo) - 4 * side) < 1.0)
    val area = Geo.sphericalAreaM2(la, lo)
    assert(math.abs(area - side * side) / (side * side) < 0.01)
    val (cLat, cLng) = Geo.centroid(la, lo)
    assert(math.abs(cLat - 0.0045) < 1e-9 && math.abs(cLng - 0.0045) < 1e-9)
  }

  test("native S2CellAt16 expression equals the UDF and stays in codegen") {
    import graft.functions.{S2Expressions, Udfs}
    val imgs = Tables.images(spark, sfDir)
    val both = imgs.select(col("image_id"),
      S2Expressions.s2Cell16(col("lat"), col("lng")).as("expr_cell"),
      Udfs.cellAt16(col("lat"), col("lng")).as("udf_cell"))
    assert(both.where(col("expr_cell") =!= col("udf_cell")).count() == 0)
    // the expression must appear inside the whole-stage-codegen'd project,
    // not as a BatchEvalPython/ScalaUDF black box
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("s2_cell16"))
  }

  test("stateful sessionization equals the declarative gap-and-island form") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val ds = events.as[EventStream.Event]
    val got = EventStream.sessionize(ds, gapSeconds = 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventStream.sessionizeBatch(events, gapSeconds = 3600)
      .select("user_id", "start_s", "end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
    // sanity: sessions per user are non-overlapping and gap-separated
    got.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 - a._3 > 3600)
        case _ =>
      }
    }
  }

  test("streaming windowed counts equal the batch aggregation") {
    val dir = s"$sfDir"
    val batch = EventStream.batchWindowedCounts(
        spark.read.parquet(s"$dir/events.parquet"))
      .select("bucket", "event_type", "n")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap

    // drive the same file through the streaming path (file source wants a
    // directory)
    val streamDir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.windowedCounts(spark, streamDir.toString)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_out")
      .withColumn("bucket", expr("CAST(FLOOR(UNIX_TIMESTAMP(win_start) / 3600) AS BIGINT)"))
      .select("bucket", "event_type", "n")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("polygon clip: hand-computed rect-window vectors") {
    import graft.core.Geo
    // unit square (lat,lng in 0..10) clipped by rect 5..15 -> square 5..10
    val (cl, cg) = Geo.clipRingToRect(
      Array(0.0, 0.0, 10.0, 10.0), Array(0.0, 10.0, 10.0, 0.0),
      5.0, 15.0, 5.0, 15.0)
    assert(cl.length == 4)
    val verts = cl.zip(cg).map { case (a, b) => (a, b) }.toSet
    assert(verts == Set((5.0, 10.0), (5.0, 5.0), (10.0, 5.0), (10.0, 10.0)))
    // disjoint window -> empty
    val (el, _) = Geo.clipRingToRect(
      Array(0.0, 0.0, 1.0, 1.0), Array(0.0, 1.0, 1.0, 0.0), 5.0, 6.0, 5.0, 6.0)
    assert(el.isEmpty)
    // window containing the subject -> subject unchanged (same vertex set)
    val (fl, fg) = Geo.clipRingToRect(
      Array(0.0, 0.0, 1.0, 1.0), Array(0.0, 1.0, 1.0, 0.0), -5.0, 6.0, -5.0, 6.0)
    assert(fl.zip(fg).toSet == Set((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)))
    // triangle poking into the window -> clipped triangle corner
    val (tl, tg) = Geo.clipRingToRect(
      Array(0.0, 4.0, 0.0), Array(0.0, 0.0, 4.0), 0.0, 2.0, 0.0, 10.0)
    assert(tl.max == 2.0 && tl.length >= 3)
  }

  test("IVF ANN: full probe equals brute force exactly; partial probe keeps recall") {
    import graft.ops.Similarity
    import org.apache.spark.sql.functions._
    graft.model.Tables.registerBase(spark, sfDir)
    val emb = spark.table("embeddings")
    val sample = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centroids = Similarity.trainCentroids(sample, nClusters = 8, iters = 5)
    val queries = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10, centroids, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute, "probing every cluster must equal brute force")
    val partial = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10, centroids, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = partial.count(bruteIds.contains).toDouble / bruteIds.size
    assert(recall >= 0.5, s"recall@10 with 3/8 probes too low: $recall")
  }

  test("remove-tag and merge-changes compose with overlay") {
    import graft.ops.Overlay
    import org.apache.spark.sql.functions._
    val base = Tables.images(spark, sfDir).select("image_id", "status", "priority")
    val c1 = Overlay.addTag(base, "image_id", Seq(8L, 16L), "status", "X")
    val c2 = Overlay.removeTag(base, "image_id", Seq(16L, 24L), "status")
    val merged = Overlay.mergeChanges("image_id", Seq(c1, c2)) // c2 wins on 16
    val world = Overlay.overlay(base, merged, "image_id")
      .where(col("image_id").isin(8L, 16L, 24L, 32L))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(world(8L) == Some("X"))
    assert(world(16L).isEmpty && world(24L).isEmpty)
    val untouched = base.where(col("image_id") === 32L).collect().head.getString(1)
    assert(world(32L) == Some(untouched))
  }

  test("percentiles release hook drops the determinism-anchor cache") {
    import graft.ops.Search
    val df = Tables.images(spark, sfDir).select("image_id", "price")
    Search.releasePercentileCaches() // clean slate
    val before = spark.sparkContext.getPersistentRDDs.size
    val res = Search.percentiles(df, "price").collect()
    assert(res.nonEmpty)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "percentiles should pin its counts cache while the result is live")
    Search.releasePercentileCaches()
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "release hook must drop the accumulated anchor caches")
    // already-collected results stay valid and correct vs SQL PERCENT_RANK
    val want = df.selectExpr("image_id",
        "PERCENT_RANK() OVER (ORDER BY price) AS pct")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    res.foreach { r =>
      assert(r.getDouble(r.fieldIndex("pct")) == want(r.getLong(r.fieldIndex("image_id"))))
    }
  }

  test("scoped percentiles release drops only its own anchor") {
    import graft.ops.Search
    val df = Tables.images(spark, sfDir).select("image_id", "price")
    Search.releasePercentileCaches() // clean slate
    val before = spark.sparkContext.getPersistentRDDs.size
    val (fA, relA) = Search.percentilesScoped(df, "price")
    val resA = fA.collect()
    val (fB, relB) = Search.percentilesScoped(df.limit(500), "price")
    val afterBoth = spark.sparkContext.getPersistentRDDs.size
    assert(afterBoth >= before + 2, "each scoped call pins its own anchor")
    relA() // must NOT disturb B's still-live anchor
    assert(spark.sparkContext.getPersistentRDDs.size == afterBoth - 1,
      "scoped release drops exactly one anchor")
    val resB = fB.collect() // B still consistent after A's release
    assert(resB.nonEmpty && resA.nonEmpty)
    relB(); relB() // idempotent
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("merge-changes rejects an empty batch list; cap-polygon rejects poles") {
    import graft.ops.{Geometry, Overlay}
    import org.apache.spark.sql.functions._
    val e = intercept[IllegalArgumentException] {
      Overlay.mergeChanges("image_id", Seq.empty)
    }
    assert(e.getMessage.contains("empty"))
    import spark.implicits._
    val polar = intercept[org.apache.spark.SparkException] {
      Seq((89.95, 0.0, 100.0)).toDF("lat", "lng", "r")
        .select(Geometry.capPolygon(8)(col("lat"), col("lng"), col("r")))
        .collect()
    }
    assert(polar.getMessage.contains("pole") ||
      Option(polar.getCause).exists(_.getMessage.contains("pole")))
  }

  test("merge-changes raises loudly on duplicate ids within one batch") {
    // VERDICT r03 #7: the one-row-per-id precondition was doc-only; a
    // duplicate inside a single batch would pick a nondeterministic winner
    import graft.ops.Overlay
    import spark.implicits._
    val dup = Seq((1L, "a"), (1L, "b")).toDF("image_id", "v")
    val e = intercept[Throwable] {
      Overlay.mergeChanges("image_id", Seq(dup)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(6).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate id within one batch"), msgs)
    // clean batches (duplicates only ACROSS batches) still merge fine
    val b0 = Seq((1L, "a"), (2L, "x")).toDF("image_id", "v")
    val b1 = Seq((1L, "c")).toDF("image_id", "v")
    val merged = Overlay.mergeChanges("image_id", Seq(b0, b1))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(merged === Set((1L, "c"), (2L, "x")))
  }

  test("decontaminate drops n-gram overlap with the benchmark, keeps short docs") {
    import graft.ops.Dedup
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),      // shares "c d e" with bench
      (2L, "x y z w v"),      // no overlap
      (3L, "q r s c d e"),    // shares "c d e"
      (4L, "aa")              // shorter than n words: cannot be contaminated
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("c d e f g")).toDF("text")
    val survivors = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(2L, 4L))
    // a benchmark with no n-gram of its own flags nothing
    val benchShort = Seq(Tuple1("one two")).toDF("text")
    val all = Dedup.decontaminate(corpus, benchShort, "doc_id", "text", n = 3)
      .count()
    assert(all == 4L)
  }

  test("sampleByHash: deterministic, rate-nested, rate-0/1 exact") {
    import graft.ops.Sampling
    import spark.implicits._
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(1.0) == "g")
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    def ids(rates: Map[String, Double]): Set[Long] =
      Sampling.sampleByHash(df, "id", "stratum", rates)
        .select("id").as[Long].collect().toSet
    val half = ids(Map("a" -> 0.5, "b" -> 0.5))
    assert(ids(Map("a" -> 0.5, "b" -> 0.5)) == half) // deterministic
    // nested thresholds => nested samples (same draws, lower cutoff)
    val quarter = ids(Map("a" -> 0.25, "b" -> 0.25))
    assert(quarter.subsetOf(half))
    // roughly proportional (md5 uniformity; generous bounds)
    assert(half.size > 120 && half.size < 280, s"half=${half.size}")
    // rate 1 keeps everything, absent stratum + default 0 keeps nothing
    assert(ids(Map("a" -> 1.0, "b" -> 1.0)).size == 400)
    assert(ids(Map("a" -> 1.0)) == (2L to 400L by 2).toSet)
  }

  test("sampleExact: n lowest draws per stratum, stable under repartition") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val got = Sampling.sampleExact(df, "id", "stratum", 10)
    assert(got.groupBy("stratum").count().as[(String, Long)].collect().toMap ==
      Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    val again = Sampling.sampleExact(df.repartition(7), "id", "stratum", 10)
      .select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
    // stratum smaller than n: all rows survive
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "stratum")
    assert(Sampling.sampleExact(tiny, "id", "stratum", 10).count() == 2L)
  }

  test("sampleWeighted: E-S reservoir — weight-monotone, repartition-stable, loud on w<=0") {
    import graft.ops.Sampling
    import spark.implicits._
    // two strata; weights rise with id so big ids should dominate the sample
    val df = (1L to 400L).map(i => (i, s"s${i % 2}", if (i <= 200) 1L else 1000L))
      .toDF("id", "stratum", "w")
    val got = Sampling.sampleWeighted(df, "id", "stratum", "w", k = 10)
    val rows = got.select("stratum", "id", "rank")
      .as[(String, Long, Int)].collect()
    assert(rows.length == 20)
    assert(rows.groupBy(_._1).forall { case (_, g) =>
      g.map(_._3).sorted.toSeq == (1 to 10) })
    // weight monotonicity: w=1000 ids (201..400) should own nearly every slot
    assert(rows.count(_._2 > 200L) >= 18)
    // deterministic under repartition
    val again = Sampling.sampleWeighted(df.repartition(7), "id", "stratum", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(again == rows.map(_._2).toSet)
    // zero weight fails LOUDLY (assert_true filter), not silently
    val bad = (1L to 5L).map(i => (i, "x", i - 1L)).toDF("id", "stratum", "w")
    val e = intercept[Exception] {
      Sampling.sampleWeighted(bad, "id", "stratum", "w", 3).collect()
    }
    assert(e.getMessage != null)
  }

  test("upsample: integer weights exact, fractional = floor + hash keep, zero drops") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b")).toDF("id", "stratum")
    // integer weight: every 'a' row exactly twice, copies numbered 1..2
    val doubled = Sampling.upsample(df, "id", "stratum", Map("a" -> 2.0, "b" -> 0.0))
    assert(doubled.count() == 200L)
    assert(doubled.groupBy("id").count().where(col("count") =!= 2).count() == 0)
    assert(doubled.select("copy").distinct().as[Int].collect().sorted.toSeq == Seq(1, 2))
    // fractional: floor(1.5)=1 guaranteed + ~half get a 2nd copy; the extra
    // set must EQUAL the sampleByHash(0.5) keep set (same draw, same rule)
    val mixed = Sampling.upsample(df, "id", "stratum", Map("a" -> 1.5), defaultWeight = 1.0)
    val aCounts = mixed.where(col("stratum") === "a")
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(aCounts.values.forall(c => c == 1L || c == 2L) && aCounts.size == 100)
    val extra = aCounts.filter(_._2 == 2L).keySet
    val kept = Sampling.sampleByHash(df.where(col("stratum") === "a"), "id", "stratum",
      Map("a" -> 0.5)).select("id").as[Long].collect().toSet
    assert(extra == kept)
    // default weight 1.0: 'b' rows pass through once with copy=1
    assert(mixed.where(col("stratum") === "b").count() == 100L)
  }

  test("upsample: NULL key gets floor(w) copies (no fractional draw), like the SQL CASE") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None: Option[Long], "a"))
      .toDF("id", "stratum")
    val up = Sampling.upsample(df, "id", "stratum", Map("a" -> 2.5))
    // the null-key row must not vanish: it gets exactly floor(2.5) = 2 copies
    assert(up.where(col("id").isNull).count() == 2L)
    val c1 = up.where(col("id") === 1L).count()
    assert(c1 == 2L || c1 == 3L)
  }

  test("alignmentFilter keeps aligned pairs, exposes score, drops orthogonal") {
    import graft.ops.Similarity
    import spark.implicits._
    val pairs = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // cosine 1
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // cosine 0
      (3L, Array(1.0f, 1.0f), Array(1.0f, 0.9f))    // cosine ~0.998
    ).toDF("pair_id", "vec_a", "vec_b")
    val got = Similarity.alignmentFilter(pairs, "vec_a", "vec_b", 0.5)
    assert(got.select("pair_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(got.columns.contains("alignment"))
    assert(got.where(col("alignment") > 0.99).count() == 2L)
  }

  test("alignmentFilter drops zero-norm (NaN-score) pairs instead of passing them") {
    import graft.ops.Similarity
    import spark.implicits._
    val pairs = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // cosine 1: kept
      (2L, Array(0.0f, 0.0f), Array(1.0f, 0.0f)),   // zero norm: NaN, dropped
      (3L, Array(0.0f, 0.0f), Array(0.0f, 0.0f))    // both zero: NaN, dropped
    ).toDF("pair_id", "vec_a", "vec_b")
    val got = Similarity.alignmentFilter(pairs, "vec_a", "vec_b", 0.05)
    assert(got.select("pair_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("packShards equals the global-window brute force and is partition-invariant") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 10L + i % 37)).toDF("id", "n_tokens")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = asMap(Sampling.packShards(df, "id", "n_tokens", budget = 500L))
    // brute force: one global order by (md5 prefix, id), running token sum
    val ordered = df.select(col("id"), col("n_tokens"),
        substring(md5(col("id").cast("string")), 1, 8).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy { case (id, _, d) => (d, id) }
    var acc = 0L
    val want = ordered.map { case (id, t, _) =>
      val off = acc; acc += t; id -> ((off, off / 500L))
    }.toMap
    assert(got == want)
    // same result under a different input partitioning
    assert(asMap(Sampling.packShards(df.repartition(13), "id", "n_tokens", 500L)) == want)
  }

  test("packShards enforces its data contracts loudly (NULL key, negative tokens)") {
    import graft.ops.Sampling
    import spark.implicits._
    // a NULL key would land in an engine-ordered NULL chunk; a negative
    // count would split Spark's `div` truncation from the oracle's floor —
    // both must fail loudly, not silently diverge
    val nullKey = Seq((Some(1L), 5L), (None: Option[Long], 5L)).toDF("id", "n_tokens")
    val e1 = intercept[Exception] {
      Sampling.packShards(nullKey, "id", "n_tokens", budget = 10L).collect()
    }
    assert(e1.getMessage.contains("packShards") ||
      Option(e1.getCause).exists(_.getMessage.contains("packShards")))
    val negTok = Seq((1L, 5L), (2L, -1L)).toDF("id", "n_tokens")
    val e2 = intercept[Exception] {
      Sampling.packShards(negTok, "id", "n_tokens", budget = 10L).collect()
    }
    assert(e2.getMessage.contains("packShards") ||
      Option(e2.getCause).exists(_.getMessage.contains("packShards")))
  }

  test("top-k ANN excludes undefined (NaN) similarities instead of emitting them") {
    import graft.ops.Similarity
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f))  // zero norm: cosine NaN vs any query
    ).toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 10)
    // with k > #finite candidates, rank-last would still emit the NaN row;
    // the exclusion contract means vector 3 never appears at all
    assert(got.select("result_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("winnow kernel: deque equals per-window rescan, incl. ties; density + guarantee hold") {
    import graft.core.Hashes
    // adversarial hash streams: uniform, heavy ties (mod 4), monotone runs
    val streams = Seq(
      Array.tabulate(200)(i => Hashes.splitmix64(i.toLong)),
      Array.tabulate(200)(i => (Hashes.splitmix64(i.toLong) % 4 + 4) % 4),
      Array.tabulate(50)(i => i.toLong) ++ Array.tabulate(50)(i => (50 - i).toLong))
    for (g <- streams; w <- Seq(1, 2, 5, 13)) {
      val got = Hashes.winnow(g, w).toSeq
      val want = graft.oracle.Golden.winnowSelect(g, w)
      assert(got == want, s"w=$w stream=${g.take(8).mkString(",")}…")
      // window coverage: consecutive selected positions are <= w apart
      // (= w exactly when a min exits and the newest gram takes over), so
      // every w-window contains a selection (the local guarantee)
      val pos = got.map(_._2)
      assert(pos.zip(pos.drop(1)).forall { case (a, b) => b - a <= w && b > a })
    }
    // shorter than one window selects nothing
    assert(Hashes.winnow(Array(1L, 2L), 3).isEmpty)
  }

  test("winnowNearDupPairs: shared-substring docs pair, boilerplate fp cap drops hot grams") {
    import graft.ops.Dedup
    import spark.implicits._
    val shared = "zqv kwx jfu ypt hbn mlc"  // >= w + k - 1 chars, rare letters
    val docs = Seq(
      (1L, s"alpha bravo charlie $shared delta echo foxtrot golf"),
      (2L, s"hotel india juliet $shared kilo lima mike november"),
      (3L, "oscar papa quebec romeo sierra tango uniform victor"),
      // 4..9: six docs all containing one common boilerplate passage
      (4L, "BOILER PLATE PASSAGE one"), (5L, "BOILER PLATE PASSAGE two"),
      (6L, "BOILER PLATE PASSAGE three"), (7L, "BOILER PLATE PASSAGE four"),
      (8L, "BOILER PLATE PASSAGE five"), (9L, "BOILER PLATE PASSAGE six")
    ).toDF("doc_id", "text")
    val k = 8; val w = 4
    val got = Dedup.winnowNearDupPairs(docs, "doc_id", "text",
        k, w, minShared = 2, maxDocFreq = Some(4))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val arr = docs.as[(Long, String)].collect()
    val want = graft.oracle.Golden.winnowPairs(arr, k, w, minShared = 2, maxDocFreq = 4)
    assert(got == want)
    // docs 1 and 2 share the >= w+k-1 = 11-char passage -> guaranteed pair
    assert(got.exists { case (a, b, _) => a == 1L && b == 2L })
    // doc 3 shares nothing long enough -> no pair with it
    assert(got.forall { case (a, b, _) => a != 3L && b != 3L })
    // the 6-doc boilerplate fps exceed docFreq 4: without the cap the
    // 4..9 clique would pair; with it, no 4..9 pair survives minShared
    // unless witnessed by non-boilerplate prints (their suffixes differ)
    val capless = Dedup.winnowNearDupPairs(docs, "doc_id", "text",
        k, w, minShared = 2, maxDocFreq = None)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val clique = capless.count { case (a, b, _) => a >= 4L && b <= 9L && b >= 4L }
    val cliqueCapped = got.count { case (a, b, _) => a >= 4L && b <= 9L && b >= 4L }
    assert(clique == 15 && cliqueCapped == 0)
  }

  test("semanticDedupPairs: exact within clusters, equals the golden recompute") {
    import graft.ops.{Dedup, Similarity}
    import spark.implicits._
    // 4 tight direction groups of 6 vectors (near-identical within a group)
    // + one zero vector (must not crash, must pair with nothing)
    val base = Seq(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f), Array(0.6f, 0.6f, 0.5f))
    val vecs = (for {
      g <- base.indices; i <- 0 until 6
    } yield {
      val eps = 0.01f * i
      (g * 10L + i, base(g).zipWithIndex.map { case (x, d) =>
        x + (if (d == g % 3) eps else 0f) })
    }) :+ (99L, Array(0.0f, 0.0f, 0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val arr = vecs.map { case (id, v) => (id, v) }.toArray
    val centroids = Similarity.trainCentroids(arr, nClusters = 4, iters = 5)
    val got = Dedup.semanticDedupPairs(df, "vec_id", "embedding", centroids, 0.99)
      .as[(Long, Long)].collect().toSeq.sorted
    val want = graft.oracle.Golden.semDedup(arr, 0.99, nClusters = 4)
    assert(got == want)
    // the zero vector pairs with nothing (NaN rejected, no crash)
    assert(got.forall { case (a, b) => a != 99L && b != 99L })
    // and within-group pairs were actually found
    assert(got.nonEmpty)
  }

  test("dupSpanDedup: cross-doc + within-doc spans removed, overlaps merge, short docs intact") {
    import graft.ops.Dedup
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share the 4-gram "c d e f" plus one extra word each side
      (1L, "a b c d e f g h"),
      (2L, "x c d e f g y z"),
      (3L, "p q r s t u v w"),           // unique: untouched
      (4L, "m m m m m m m m"),           // self-repeating: 5 dup 4-gram starts
      (5L, "one two three")              // < n words: no grams, untouched
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanDedup(docs, "doc_id", "text", n = 4)
      .select("doc_id", "n_dup_grams", "n_covered_words", "text_kept")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // doc 1: shared grams "c d e f","d e f g" start at 3,4 -> words 3..7 covered
    assert(got(0) == ((1L, 2L, 5L, "a b h")))
    // doc 2: starts 2,3 -> words 2..6 covered
    assert(got(1) == ((2L, 2L, 5L, "x y z")))
    assert(got(2) == ((3L, 0L, 0L, "p q r s t u v w")))
    // doc 4: "m m m m" occurs at starts 1..5 (>1 within ONE doc) -> all covered
    assert(got(3) == ((4L, 5L, 8L, "")))
    assert(got(4) == ((5L, 0L, 0L, "one two three")))
    // partition-invariant (the gram join and coverage are key-driven)
    val again = Dedup.dupSpanDedup(docs.repartition(7), "doc_id", "text", n = 4)
      .select("doc_id", "n_dup_grams", "n_covered_words", "text_kept")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("canonicalUrl / urlDedup: scheme, www, query, fragment, slash, case collapse") {
    import graft.ops.Dedup
    import spark.implicits._
    val variants = Seq(
      (1L, "HTTPS://WWW.Example.org/A/B/"),
      (2L, "http://example.org/a/b?utm=x"),
      (3L, "https://example.org/a/b#frag"),
      (4L, "example.org/a/b"),
      (5L, "http://other.org/c"))
    val got = variants.toDF("doc_id", "url")
      .select(Dedup.canonicalUrl(col("url")).as("c")).as[String].collect().toSeq
    assert(got == Seq("example.org/a/b", "example.org/a/b", "example.org/a/b",
      "example.org/a/b", "other.org/c"))
    // survivor = min id per canonical group; url_canon retained
    val kept = Dedup.urlDedup(variants.toDF("doc_id", "url"), "doc_id", "url")
      .select("doc_id", "url_canon").as[(Long, String)].collect().toSeq.sorted
    assert(kept == Seq((1L, "example.org/a/b"), (5L, "other.org/c")))
    // fragment strips before query: '?' inside a fragment never survives
    val fq = Seq(Tuple1("http://a.net/p#f?notquery")).toDF("url")
      .select(Dedup.canonicalUrl(col("url")).as("c")).as[String].head()
    assert(fq == "a.net/p")
  }

  test("importanceResample: integer mass-ratio decision, threshold scaling, zero-gram drop") {
    import graft.ops.Sampling
    import spark.implicits._
    // corpus: 6 en-ish docs over one vocab, 6 xx docs over a disjoint vocab
    val docs = (
      (1L to 6L).map(i => (i, "en", s"alpha beta gamma delta token$i")) ++
      (7L to 12L).map(i => (i, "xx", s"zulu yankee xray whisky token$i"))
    ).toDF("doc_id", "lang", "text")
    val target = docs.where(col("lang") === "en")
    val kept = Sampling.importanceResample(docs, target, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // every en doc leans target; disjoint-vocab xx docs fall below ratio 1
    assert((1L to 6L).toSet.subsetOf(kept))
    assert(kept.intersect((7L to 12L).toSet).isEmpty)
    // deterministic and partition-invariant (model is collected once)
    val again = Sampling.importanceResample(
      docs.repartition(5), target, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
    // threshold 0/den keeps every doc with raw mass > 0
    val all = Sampling.importanceResample(docs, target, "doc_id", "text",
      thresholdNum = 0L).count()
    assert(all == 12L)
    // a blank doc has no grams -> dropped even at threshold 0
    val withBlank = docs.union(Seq((13L, "xx", "  ")).toDF("doc_id", "lang", "text"))
    val blankKept = Sampling.importanceResample(withBlank, target, "doc_id", "text",
      thresholdNum = 0L).select("doc_id").as[Long].collect().toSet
    assert(!blankKept.contains(13L) && blankKept.size == 12)
  }
}
