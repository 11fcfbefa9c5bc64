package graft.tools

import graft.model.{Synth, Tables}
import graft.ops.{EngineCaches, Knn}
import org.apache.spark.sql.SparkSession

/** The beyond-broadcast batch-kNN scale measurement (VERDICT r03 #4's
  * done-criterion): times the SAME 64M-image × 10^4-query batch kNN under
  * the three query-side layouts —
  *
  *   broadcast : single pass, exploded query side under the limit
  *               (the default regime; 10^4 × 12 = 120k rows < 2M)
  *   chunked   : limit forced to 60k exploded rows → the round-4 regional
  *               S2-prefix chunks, every chunk's probe join a BROADCAST —
  *               the new beyond-broadcast path
  *   shuffle   : limit 0 → the pre-round-4 beyond-broadcast behavior, the
  *               per-round shuffle-hash exchange of the |images| × |levels|
  *               exploded probe side
  *
  * Each layout runs twice (JIT/plan warm) and reports both times; results
  * are count-asserted equal across layouts. One JSON line on stdout.
  *
  * Usage: SPARK_GRAFT_SCALE_ROWS=64000000 runMain graft.tools.KnnScaleBench
  */
object KnnScaleBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "64000000").toLong
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES", "10000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val images = Tables.imagesSynth(spark, rows)
      .select("image_id", "lat", "lng", "cell16")
    val queries = Synth.batchQueryDf(spark, nQueries)
    // JIT warm at full row volume but a small query set (the Bench protocol);
    // auto initial radius everywhere (initialRadiusDeg <= 0, the gates'
    // density-derived default) — a fixed 2-degree round-1 cap at 64M rows
    // floods every layout with ~2x10^8 candidate rows and measures the
    // radius policy, not the join layout
    Knn.knnBatch(spark, images, Synth.batchQueryDf(spark, 200), k = 3,
      initialRadiusDeg = 0.0).count()
    EngineCaches.releaseIterationSnapshots()
    def time(label: String, limit: Long): (String, Long, Seq[Double]) = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = Knn.knnBatch(spark, images, queries, k = 3,
          initialRadiusDeg = 0.0, broadcastQueryRowLimit = limit).count()
        EngineCaches.releaseIterationSnapshots()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      System.err.println(f"[knn-scale] $label%-10s rows=${times.head._1} " +
        f"t1=${times(0)._2}%7.2f t2=${times(1)._2}%7.2f")
      (label, times.head._1, times.map(_._2))
    }
    val broadcast = time("broadcast", 2000000L)
    val chunked = time("chunked", 60000L)
    val shuffle = time("shuffle", 0L)
    require(broadcast._2 == chunked._2 && chunked._2 == shuffle._2,
      s"row counts diverge: ${broadcast._2}/${chunked._2}/${shuffle._2}")
    def j(x: (String, Long, Seq[Double])) =
      s""""${x._1}":{"t1":${x._3(0)},"t2":${x._3(1)}}"""
    println(s"""{"metric":"knn_batch_layouts","rows":$rows,"queries":$nQueries,""" +
      s""""result_rows":${broadcast._2},${j(broadcast)},${j(chunked)},${j(shuffle)}}""")
    spark.stop()
  }
}
