package graft

import graft.ops.AsOf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Temporal as-of join: semantics vs a hand-computed predecessor table,
  * the determinism contract at ties, the tolerance cut, and the single
  * scale invariant that matters — ONE exchange, NO join node. */
class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("asof-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import scala.jdk.CollectionConverters._
  private def df(rows: Seq[(Long, Double, String)], tsName: String = "ts") = {
    import spark.implicits._
    rows.toDF("key", tsName, "tag")
  }

  private def leftDf(rows: Seq[(Long, Double)]) = {
    import spark.implicits._
    rows.toDF("key", "ts")
  }

  test("each left row picks its most recent predecessor; none -> null") {
    val left = leftDf(Seq((1L, 1.0), (1L, 5.0), (1L, 9.0), (2L, 3.0), (3L, 7.0)))
    val right = df(Seq((1L, 2.0, "a"), (1L, 5.0, "b"), (1L, 8.0, "c"), (2L, 4.0, "d")))
      .withColumnRenamed("tag", "state")
    val out = AsOf.asofJoin(left, right, Seq("key"), "ts", Seq("state"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(out === Set(
      (1L, 1.0, None),       // before any state
      (1L, 5.0, Some("b")),  // equal ts: the state AT the event's ts is visible
      (1L, 9.0, Some("c")),
      (2L, 3.0, None),       // state at 4.0 is in the future
      (3L, 7.0, None)))      // key with no states at all
  }

  test("tolerance nulls matches older than the cut") {
    val left = leftDf(Seq((1L, 10.0), (1L, 100.0)))
    val right = df(Seq((1L, 8.0, "s"))).withColumnRenamed("tag", "state")
    val out = AsOf.asofJoin(left, right, Seq("key"), "ts", Seq("state"),
        toleranceSeconds = Some(5.0))
      .collect().map(r => (r.getDouble(1), Option(r.getString(2)))).toSet
    assert(out === Set((10.0, Some("s")), (100.0, None)))
  }

  test("equal-ts right rows resolve atomically to the largest payload tuple") {
    val left = leftDf(Seq((1L, 5.0)))
    val right = spark.createDataFrame(Seq(
      (1L, 5.0, "aa", 1L), (1L, 5.0, "zz", 0L)))
      .toDF("key", "ts", "s1", "s2")
    val out = AsOf.asofJoin(left, right, Seq("key"), "ts", Seq("s1", "s2"))
      .collect().map(r => (r.getString(2), r.getLong(3)))
    // one struct wins whole — never ("zz", 1) mixing fields across rows
    assert(out.toSeq === Seq(("zz", 0L)))
  }

  test("payload colliding with a left column fails loudly") {
    val left = leftDf(Seq((1L, 1.0))).withColumn("state", lit("x"))
    val right = df(Seq((1L, 0.5, "y"))).withColumnRenamed("tag", "state")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, Seq("key"), "ts", Seq("state"))
    }
    assert(e.getMessage.contains("collides"))
  }

  test("random worlds equal in-memory brute force (incl. ts ties + tolerance)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      // coarse ts grid (0..19) forces plenty of left-right and right-right ties
      val lefts = Seq.tabulate(120)(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(20).toDouble))
      val rights = Seq.tabulate(40)(j =>
        (rnd.nextInt(6).toLong, rnd.nextInt(20).toDouble, 1000L + j))
      val tol = if (trial % 2 == 0) Some(4.0) else None

      import spark.implicits._
      val l = lefts.toDF("event_id", "key", "ts")
      val r = rights.toDF("key", "ts", "state_id")
      val got = AsOf.asofJoin(l, r, Seq("key"), "ts", Seq("state_id"),
          toleranceSeconds = tol)
        .collect().map(row => row.getLong(0) -> Option(row.get(3)).map(_.asInstanceOf[Long])).toMap

      val want = lefts.map { case (eid, k, ts) =>
        val cand = rights.filter(rr => rr._1 == k && rr._2 <= ts &&
          tol.forall(t => ts - rr._2 <= t))
        // contract: most recent wins; at equal ts the largest payload tuple
        eid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(rr => (rr._2, rr._3))._3))
      }.toMap
      assert(got === want, s"trial $trial (tol=$tol)")
    }
  }

  test("plan is ONE exchange + window — no join node") {
    val left = leftDf(Seq((1L, 1.0), (2L, 2.0)))
    val right = df(Seq((1L, 0.5, "a"))).withColumnRenamed("tag", "state")
    val p = AsOf.asofJoin(left, right, Seq("key"), "ts", Seq("state"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n${p.take(1200)}")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n${p.take(1200)}")
  }
}
