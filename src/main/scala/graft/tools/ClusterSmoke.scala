package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Smoke check for `local-cluster[n,c,mem]` runs (separate executor JVMs):
  * proves (a) graft classes load on FORKED executors via the shipped app
  * jar, and (b) one driver JVM can stop a session and reopen at a different
  * cluster size — the two preconditions for ClusterBench's N-vs-4N
  * executor-process pairs. Run through tools/spark_submit_cluster_bench.sh
  * (spark-submit sets spark.jars so executors can fetch the library). */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    Seq(1, 2).foreach { n =>
      val s = SparkSession.builder()
        .master(s"local-cluster[$n,2,2048]")
        .config("spark.sql.shuffle.partitions", 2 * n)
        .config("spark.executor.memory", "1536m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        s.sparkContext.setLogLevel("WARN")
        // executor-side use of a graft class (native expression + S2 kernel
        // inside imagesSynth's cell16): fails with ClassNotFoundException on
        // the forked executors if the app jar didn't ship
        val df = graft.model.Tables.imagesSynth(s, 100000L)
        val distinct = df.select(col("cell16")).distinct().count()
        val execs = s.sparkContext.getExecutorMemoryStatus.size - 1 // minus driver
        println(s"[cluster-smoke] n=$n executors=$execs distinct_cells=$distinct")
        require(distinct > 0, "no cells computed")
      } finally s.stop()
    }
    println("[cluster-smoke] OK")
  }
}
