package graft.lineage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Per-partition lineage + snapshot-resumable stage runner (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Design (SURVEY.md §4.3): work is split into `buckets` deterministic units
  * keyed by a bucket column (cell range at design scale — locality-preserving
  * so each unit touches a contiguous cell range). Each unit is one
  * distributed job whose output commits atomically: data files first, then a
  * metrics row, then a commit marker (the Iceberg-snapshot analogue on plain
  * parquet — swap `commit` for a table.newAppend() when an Iceberg catalog
  * is present; cf. the reference's applied-change ids,
  * /root/reference/src/diagonal.works/b6/ingest/change.go:30-102).
  * Resume = skip buckets whose marker exists: an anti-join of work units
  * against committed units, at bucket granularity.
  *
  * Metrics row: (run_id, stage, bucket, input_rows, output_rows, cell_min,
  * cell_max, checksum) with checksum = bit_xor of xxhash64 over all output
  * rows — order-independent, cheap, and verifiable downstream. */
object Lineage {

  final case class StageResult(bucketsRun: Seq[Int], bucketsSkipped: Seq[Int])

  private def markerPath(outDir: String, bucket: Int) =
    Paths.get(s"$outDir/_committed_$bucket")

  /** Run `transform` over `input` split into `buckets` units by
    * pmod(xxhash64(bucketKey), buckets); resume from existing commits. */
  def runStage(spark: SparkSession, input: DataFrame, transform: DataFrame => DataFrame,
               runId: String, stage: String, outDir: String,
               bucketKey: String, cellCol: String, buckets: Int): StageResult = {
    Files.createDirectories(Paths.get(outDir))
    val bucketed = input.withColumn("_bucket",
      pmod(xxhash64(col(bucketKey)), lit(buckets)).cast("int"))
    val ran = scala.collection.mutable.ArrayBuffer.empty[Int]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[Int]
    (0 until buckets).foreach { b =>
      if (Files.exists(markerPath(outDir, b))) skipped += b
      else {
        val in = bucketed.where(col("_bucket") === b).drop("_bucket")
        val inRows = in.count()
        val out = transform(in)
        out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/bucket=$b")
        val written = spark.read.parquet(s"$outDir/bucket=$b")
        val m = written.agg(
          count(lit(1)).as("output_rows"),
          min(col(cellCol)).as("cell_min"),
          max(col(cellCol)).as("cell_max"),
          coalesce(expr(s"bit_xor(xxhash64(${written.columns.mkString(",")}))"), lit(0L)).as("checksum"))
          .withColumn("run_id", lit(runId)).withColumn("stage", lit(stage))
          .withColumn("bucket", lit(b)).withColumn("input_rows", lit(inRows))
          .select("run_id", "stage", "bucket", "input_rows", "output_rows",
            "cell_min", "cell_max", "checksum")
        m.write.mode(SaveMode.Overwrite).parquet(s"$outDir/_metrics/bucket=$b")
        Files.createFile(markerPath(outDir, b)) // atomic commit point
        ran += b
      }
    }
    StageResult(ran.toSeq, skipped.toSeq)
  }

  def metrics(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/_metrics")

  def output(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/bucket=*")
}
