package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}

/** Iteration-loop lineage truncation, shared by every iterative operator
  * (Reachability's flood/climb, Knn.knnBatch — review r03 deduplicated the
  * two copies).
  *
  * Materialize a (small) iteration table and REBUILD it from the persisted
  * RDD: the returned frame's logical plan is a flat LogicalRDD scan, so the
  * per-round analysis/optimization cost stays CONSTANT across iterations.
  * Plain cache() is not enough — the Dataset's LOGICAL plan still grows each
  * round and Catalyst re-walks (and re-canonicalizes) the whole accumulated
  * tree, which turned quadratic-plus in practice (round 4 of a 5-round flood
  * spent 15 s planning 3 rows). (`localCheckpoint` would do the same but
  * trips a constraint-rewrite bug under unionByName in Spark 4.1.) */
private[graft] object Tracker {
  /** Test-only plan capture: materialized frames execute through raw RDD
    * actions, invisible to QueryExecutionListener — a plan-shape spec sets a
    * buffer here and every materialize on the SAME THREAD appends its
    * executed-plan string. Null (the default) costs nothing. */
  private[graft] val capturePlans =
    new ThreadLocal[scala.collection.mutable.Buffer[String]]

  private def capture(df: DataFrame): Unit = {
    val buf = capturePlans.get()
    if (buf != null) buf += df.queryExecution.executedPlan.toString
  }

  /** Surviving-snapshot registry. Every iterative operator deliberately
    * leaves exactly ONE persisted RDD alive under the frame it returns
    * (the frame is a flat scan of it); a long-lived session issuing many
    * such calls accumulates dead snapshots once the results are consumed,
    * with no handle to free them (review r03g). Callers that keep a session
    * open call `EngineCaches.releaseIterationSnapshots()` between requests:
    * results already computed stay correct — an unpersisted snapshot
    * recomputes through its RDD lineage if re-read, just slower. Same
    * single-owner caveat as Search.releasePercentileCaches: don't release
    * while another thread's returned frame is mid-action. */
  /** Best-effort unpersist for EVERY release path: an RDD whose
    * SparkContext has been stopped died WITH the context (its blocks are
    * already gone); unpersist would reach into the dead BlockManagerMaster
    * and NPE. Seen when survivors outlive their session (one session per
    * test suite, a server cycling sessions) — and the per-call release
    * paths hit the same thing when a session stops MID-OPERATOR and the
    * operator's catch block releases: the NPE would then mask the real
    * error. A stop racing mid-release hits the same dead endpoint, so the
    * guard also swallows that (correctness unaffected either way: releasing
    * is only ever a cache drop). */
  private[ops] def safeUnpersist(r: RDD[Row]): Unit =
    if (!r.sparkContext.isStopped)
      try r.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }

  private val survivors = scala.collection.mutable.ArrayBuffer.empty[RDD[Row]]
  private[graft] def registerSurvivor(r: RDD[Row]): Unit =
    Tracker.synchronized { survivors += r }
  private[graft] def releaseSurvivors(): Unit = Tracker.synchronized {
    survivors.foreach(safeUnpersist)
    survivors.clear()
  }
  private[graft] def survivorCount: Int = Tracker.synchronized(survivors.size)
}

/** Cache-hygiene surface for long-lived sessions (the library-boundary
  * face of the snapshot registry above). */
object EngineCaches {
  /** Unpersist every iteration snapshot left alive by completed
    * kNN-batch / reachability calls (one per call by design). */
  def releaseIterationSnapshots(): Unit = Tracker.releaseSurvivors()
}

private[ops] final class Tracker {
  private val rdds = scala.collection.mutable.ArrayBuffer.empty[RDD[Row]]

  def materialize(df: DataFrame): (DataFrame, Long, RDD[Row]) = {
    Tracker.capture(df)
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // register BEFORE the materializing count: if the count's job fails, the
    // caller's releaseAll() must still see (and unpersist) this RDD —
    // registering after would leak whatever partitions were already cached
    // (review r03)
    rdds += rdd
    val n = rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), n, rdd)
  }

  /** Like `materialize`, but the materializing pass ALSO counts the rows
    * satisfying `pred` (and returns THAT count instead of the total): the
    * caller's "how many rows need another round" question rides the same
    * job as the snapshot instead of paying a separate count job per
    * iteration. Exact — the fold runs over the freshly-persisted partitions,
    * no accumulator retry ambiguity. */
  def materializeCounting(df: DataFrame)(pred: Row => Boolean): (DataFrame, Long, RDD[Row]) = {
    Tracker.capture(df)
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdds += rdd
    val n = rdd.mapPartitions { it =>
      var m = 0L
      while (it.hasNext) { if (pred(it.next())) m += 1 }
      Iterator.single(m)
    }.fold(0L)(_ + _)
    (df.sparkSession.createDataFrame(rdd, df.schema), n, rdd)
  }

  /** Unpersist every tracked intermediate except the result the caller
    * hands out — without this, each round leaks one persisted RDD for the
    * session's lifetime. */
  def releaseExcept(keep: RDD[Row]): Unit =
    rdds.foreach(r => if (r ne keep) Tracker.safeUnpersist(r))

  def releaseAll(): Unit = rdds.foreach(Tracker.safeUnpersist)
}
