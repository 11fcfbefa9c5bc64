package graft

import graft.model.{Synth, Tables}
import graft.ops.{Containment, Tiling}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end resumable pipeline (north rule): kill between commits, resume,
  * verify the final manifest equals the direct (non-lineage) computation and
  * the metrics account for every row. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("pipeline-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pipeline runs, crashes, resumes, and matches the direct computation") {
    val dir = java.nio.file.Files.createTempDirectory("pipeline").toString

    val r1 = Pipeline.run(spark, sfDir, dir, "run-a", buckets = 4)
    assert(r1.bucketsRun.size == 8 && r1.bucketsSkipped.isEmpty)

    // simulate a crash that lost one commit in each stage
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/index/_committed_2"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/spatial/_committed_1"))
    val r2 = Pipeline.run(spark, sfDir, dir, "run-a", buckets = 4)
    assert(r2.bucketsRun.sorted == Seq(1, 2) && r2.bucketsSkipped.size == 6)

    // final manifest equals the direct pipeline
    val got = Pipeline.manifest(spark, dir)
      .select("image_id", "z", "x", "y").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val direct = Tiling.pointManifest(
        Containment.containmentProbe(
          Tables.images(spark, sfDir).select("image_id", "lat", "lng", "cell16"),
          Synth.regions), 10, 14)
      .select("image_id", "z", "x", "y").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == direct && got.nonEmpty)

    // metrics: per-bucket rows sum to the totals; checksums present
    val m = Pipeline.metrics(spark, dir).collect()
    assert(m.length == 8)
    val indexRows = m.filter(_.getAs[String]("stage") == "index")
      .map(_.getAs[Long]("output_rows")).sum
    assert(indexRows == Tables.images(spark, sfDir).count())
    val spatialRows = m.filter(_.getAs[String]("stage") == "spatial")
      .map(_.getAs[Long]("output_rows")).sum
    assert(spatialRows == direct.size)
  }

  test("range-bucketed stage: contiguous cell units, resume, complete+disjoint output") {
    import graft.lineage.Lineage
    val dir = java.nio.file.Files.createTempDirectory("pipeline-range").toString
    val images = Tables.images(spark, sfDir).select("image_id", "lat", "lng", "cell16")
    val n = images.count()
    def run() = Lineage.runStage(spark, images, identity, "run-b", "index",
      s"$dir/index", bucketKey = "image_id", cellCol = "cell16", buckets = 4,
      rangeBuckets = true)
    val r1 = run()
    assert(r1.bucketsRun.size == 4 && r1.bucketsSkipped.isEmpty)
    // crash-resume at unit granularity
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/index/_committed_3"))
    val r2 = run()
    assert(r2.bucketsRun == Seq(3) && r2.bucketsSkipped.sorted == Seq(0, 1, 2))
    // the quantile ranges must partition the id space: complete AND disjoint
    val out = Lineage.output(spark, s"$dir/index")
    assert(out.count() == n)
    assert(out.select("image_id").distinct().count() == n)
    // one-job input histogram feeds the metrics
    val m = Lineage.metrics(spark, s"$dir/index").collect()
    assert(m.map(_.getAs[Long]("input_rows")).sum == n)
    assert(m.map(_.getAs[Long]("output_rows")).sum == n)
    // the quantile boundaries are PERSISTED: the resume above MUST have
    // reused the first run's bounds file (recomputed approx-quantiles could
    // shift a row across a committed unit boundary — review r03d)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/index/_bounds")))
    // a fully committed stage is a pure no-op resume (no stats jobs, no runs)
    val r3 = run()
    assert(r3.bucketsRun.isEmpty && r3.bucketsSkipped.size == 4)
  }
}
