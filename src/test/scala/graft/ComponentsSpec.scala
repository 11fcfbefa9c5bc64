package graft

import graft.ops.Components
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Connected components (alternating star algorithm) vs an in-process
  * union-find oracle, plus the diameter-independence and loud-truncation
  * contracts. */
class ComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("components-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Plain union-find with path compression — the independent oracle. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are already minimal: we always attach the larger root under the
    // smaller, so find() lands on the component minimum
    pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(x => x -> find(x)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs equal union-find across seeds and densities") {
    for ((seed, nEdges) <- Seq((1, 60), (2, 250), (3, 800))) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(nEdges)(
        (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      val got = run(pairs)
      // oracle over the same graph with self-loops dropped (the operator's
      // documented behavior: self-pairs are tolerated and ignored)
      val want = unionFind(pairs.filter(p => p._1 != p._2))
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size} nodes")
      // star-forest sanity: exactly one component per id
      assert(got.keySet.size == got.size)
    }
  }

  test("a 500-link chain converges in logarithmic rounds, not diameter") {
    import spark.implicits._
    val chain = (0L until 500L).map(i => (i, i + 1))
    val (df, rounds) = Components.connectedComponentsCounted(
      chain.toDF("a", "b"), maxIters = 50)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 501 && got.values.forall(_ == 0L))
    // hash-min label propagation would need ~500 rounds here; the
    // alternating star contract is O(log^2 n) — regression-pin a bound
    assert(rounds <= 12, s"chain took $rounds rounds (diameter leak?)")
  }

  test("maxIters truncation fails loudly, never returns unsettled labels") {
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Components.connectedComponents(chain.toDF("a", "b"), maxIters = 1)
    }
  }

  test("keepCanonicalByPairs keeps component minima and untouched rows") {
    import spark.implicits._
    // components {1,2,3} and {10,11}; 99 is in no pair
    val rows = Seq(1L, 2L, 3L, 10L, 11L, 99L).map(i => (i, s"p$i")).toDF("id", "v")
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val kept = graft.ops.Dedup.keepCanonicalByPairs(rows, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))
  }

  test("empty and self-loop-only inputs yield empty results") {
    import spark.implicits._
    assert(Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    assert(Components.connectedComponents(
      Seq((7L, 7L), (9L, 9L)).toDF("a", "b")).count() == 0)
  }
}
