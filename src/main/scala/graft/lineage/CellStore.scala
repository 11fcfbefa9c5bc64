package graft.lineage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cell-clustered storage with file-level pruning — the SURVEY §1.4 "index"
  * made concrete on plain parquet: the compact-index role of the reference's
  * mmap file (cell-ordered feature blocks,
  * /root/reference/src/diagonal.works/b6/ingest/compact/build.go:150-628)
  * maps to (a) bucketing rows by their S2 cell-id PREFIX (spatially
  * contiguous ranges — an id prefix is exactly a cell-range predicate) and
  * (b) per-bucket min/max stats consulted before listing files. With an
  * Iceberg catalog this is `WRITE ORDERED BY cell16` + metadata pruning;
  * the read contract is identical.
  *
  * A spatial query (cap/rect/polygon covering) becomes cell ranges; `read`
  * scans only buckets whose [min,max] overlaps a range. At 10^12 rows this
  * is the difference between touching ~everything and touching the files
  * under the query's cells.
  */
object CellStore {

  val PrefixBits = 8 // bucket = top 8 bits of the cell id (face + 5 levels)

  def bucketOf(cell: Long): Long = cell >>> (64 - PrefixBits)

  def write(df: DataFrame, dir: String, cellCol: String = "cell16"): Unit = {
    val bucketed = df.withColumn("_bucket",
      shiftrightunsigned(col(cellCol), 64 - PrefixBits))
    bucketed.write.mode(SaveMode.Overwrite)
      .partitionBy("_bucket").parquet(s"$dir/data")
    bucketed.groupBy("_bucket")
      .agg(min(col(cellCol)).as("cell_min"), max(col(cellCol)).as("cell_max"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_stats")
  }

  final case class BucketStat(bucket: Long, cellMin: Long, cellMax: Long, rows: Long)

  def stats(spark: SparkSession, dir: String): Seq[BucketStat] =
    spark.read.parquet(s"$dir/_stats").collect().map(r =>
      BucketStat(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  /** One reader for every prune strategy: scan exactly the `keep` buckets
    * (empty -> an empty frame with the store's schema). */
  private def readKept(spark: SparkSession, dir: String,
                       keep: Seq[BucketStat]): (DataFrame, Int) = {
    val paths = keep.map(b => s"$dir/data/_bucket=${b.bucket}")
    val df =
      if (paths.isEmpty)
        spark.read.parquet(s"$dir/data").where(lit(false))
      else
        spark.read.option("basePath", s"$dir/data").parquet(paths: _*)
    (df.drop("_bucket"), keep.size)
  }

  /** Read only the buckets whose stats overlap any of the [lo, hi] cell
    * ranges (e.g. S2.rangeMin/rangeMax of a covering's cells). Returns the
    * pruned DataFrame and the number of buckets actually read. */
  def readRanges(spark: SparkSession, dir: String,
                 ranges: Seq[(Long, Long)]): (DataFrame, Int) =
    readKept(spark, dir, stats(spark, dir).filter(b =>
      ranges.exists { case (lo, hi) => b.cellMin <= hi && lo <= b.cellMax }))

  /** Read exactly the listed buckets (intersected with those that exist).
    * The batch-kNN store probe derives its bucket set distributively from
    * the round's covering cells (a fixed-size bucket-mask accumulator) —
    * bounded by the store's bucket count (2^PrefixBits), never by the query
    * count. `preloaded` lets an iterative caller read the _stats file once
    * per call instead of once per round. */
  def readBuckets(spark: SparkSession, dir: String, buckets: Set[Long],
                  preloaded: Option[Seq[BucketStat]] = None): (DataFrame, Int) =
    readKept(spark, dir,
      preloaded.getOrElse(stats(spark, dir)).filter(b => buckets.contains(b.bucket)))

  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data").drop("_bucket")
}
