package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Survivor snapshots outliving their SparkSession: the global registry
  * (Tracker.survivors / EngineCaches) spans sessions by design, so a
  * release issued from a LATER session must treat earlier sessions' dead
  * snapshots as already-freed — not reach into their stopped contexts and
  * NPE (the exact full-suite failure mode: one suite registers survivors,
  * stops its session in afterAll, the next suite calls
  * releaseIterationSnapshots). */
class TrackerReleaseSpec extends AnyFunSuite {

  private def session(name: String): SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .appName(name).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("release survives survivors from a stopped session; live ones still free") {
    import org.apache.spark.sql.functions.col
    // session 1: leave one survivor behind (connectedComponents registers
    // exactly one persisted snapshot under its returned frame), then stop
    val s1 = session("tracker-rel-1")
    val pairs1 = s1.range(4).select(col("id").as("a"), (col("id") + 1).as("b"))
    ops.Components.connectedComponents(pairs1).collect()
    assert(ops.Tracker.survivorCount >= 1)
    s1.stop()

    // session 2: register a LIVE survivor on top of the dead one, then
    // release — must not throw, must clear the registry, and the live
    // frame must stay readable (unpersist only drops cache)
    val s2 = session("tracker-rel-2")
    val pairs2 = s2.range(4).select(col("id").as("a"), (col("id") + 1).as("b"))
    val comp = ops.Components.connectedComponents(pairs2)
    assert(comp.count() == 5)
    ops.EngineCaches.releaseIterationSnapshots()
    assert(ops.Tracker.survivorCount == 0)
    assert(comp.count() == 5) // recomputes through lineage after release
    s2.stop()
  }
}
