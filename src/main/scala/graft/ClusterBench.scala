package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence with SEPARATE EXECUTOR JVMS — the closest
  * in-sandbox proxy to the north rule's "N and 4N executors": Spark's
  * `local-cluster[n, coresPerExec, memMB]` master forks n real executor
  * processes (own heap, own GC, own JIT — exactly what extra cluster nodes
  * bring), unlike `local[N]`, which only widens a thread pool inside one
  * JVM. The flagship pipeline and the steal-gated pair protocol are the
  * SAME as graft.Bench's (BenchProtocol); only the arm definition changes:
  * 1 executor x 4 cores vs 4 executors x 4 cores.
  *
  * Run via tools/spark_submit_cluster_bench.sh — executors fetch the
  * library from spark.jars, which spark-submit sets to the packaged jar
  * (ClusterSmoke proves the class-shipping and the in-JVM cluster-size
  * restart). Prints ONE FLAT JSON line (same splice style as Bench):
  *   {"metric":"cluster_scaling","unit":"efficiency","pipeline":...,
  *    "rows":...,"executors_n":1,...,"executors_4n":4,"efficiency":...,
  *    "clean_pairs":...,"steal_polluted":...,"cores_per_executor":4}
  */
object ClusterBench {

  private val CoresPerExec = 4

  private def session(executors: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$executors,$CoresPerExec,6144]")
      // worker memory above is MB per forked worker; executor heap must fit
      .config("spark.executor.memory", "5g")
      .config("spark.sql.shuffle.partitions", executors * CoresPerExec)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "64000000").toLong
    val budgetMs = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET_MS", "600000").toLong
    val nExec = sys.env.getOrElse("SPARK_GRAFT_EXECUTORS_N", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    /** One rep at `executors` forked executor JVMs: open the cluster, warm
      * codegen/JIT in it, time the flagship pipeline, tear the cluster down.
      * Cluster startup/teardown stays OUTSIDE the timed window. */
    def oneRep(executors: Int): (Double, Long) = {
      val s = session(executors)
      try {
        // warm codegen/JIT on these executors — each rep forks FRESH
        // executor JVMs, so unlike Bench's shared-JVM reps every rep here
        // pays full C2 compilation; two 4M-row passes give each executor
        // core well past the compile threshold before the timed window
        // (same fix as Bench.oneRep, see its comment for the r3 evidence)
        Bench.pipeline(s, 4000000)
        Bench.pipeline(s, 4000000)
        val s0 = BenchProtocol.stealCs()
        val t0 = System.nanoTime()
        Bench.pipeline(s, scaleRows)
        ((System.nanoTime() - t0) / 1e9, BenchProtocol.stealCs() - s0)
      } finally s.stop()
    }

    val deadline = System.currentTimeMillis() + budgetMs
    val (_, pair) = BenchProtocol.measurePair(
      nExec, 4 * nExec, deadline, minClean = 3, scaleRows, armKey = "executors",
      // 4N executors x 4 cores = half the box at nExec=1: full refill idle
      // for that load, short idle after/before small loads (see Bench.cool;
      // host size from the same env var Bench uses, not a hardcoded 32)
      coolDownMs = e => if (e * CoresPerExec * 2 >= cpus) 15000L else 6000L)(oneRep)
    // splice the pair fragment FLAT into the line (drop its braces), the
    // same style Bench uses for "scaling" — a nested "body" key diverged
    // from both the scaladoc and Bench's shape (review r03f)
    println(s"""{"metric":"cluster_scaling","unit":"efficiency","pipeline":"assign->probe->manifest",""" +
      pair.drop(1).dropRight(1) +
      s""","cores_per_executor":$CoresPerExec}""")
  }
}
