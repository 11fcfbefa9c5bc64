package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The b6 Query algebra and collection combinators as thin Dataset
  * combinators (SURVEY.md §2.2/§2.5/§2.6). Each maps a reference operator to
  * the declarative Spark primitive so Catalyst keeps pushdown/pruning:
  *
  *   tagged/keyed  -> Column predicates          (search.go:79-134)
  *   and/or        -> && / ||                    (search.go:189-275)
  *   within rect   -> range predicates           (spatial.go:16-46 prune)
  *   within cap    -> exact distance predicate   (spatial.go:168-305 refine)
  *   find          -> where                      (api/functions/search.go:11-80)
  *   take          -> orderBy(id).limit          (collections.go:88-119; id
  *                    order pins b6's FeatureID iteration, world.go:157-177)
  *   top           -> orderBy(desc).limit        (collections.go:121-208)
  *   count-values  -> groupBy(value).count       (collections.go:274-297)
  *   sum-by-key    -> groupBy(key).sum           (collections.go:248-272)
  *   percentiles   -> percent_rank window        (math.go:57-103, exact)
  */
object Search {

  /** `[#key=value]` — b6 Tagged query. */
  def tagged(key: String, value: String): Column = col(key) === value

  /** `[#key]` — b6 Keyed query. */
  def keyed(key: String): Column = col(key).isNotNull

  /** Lat/lng rectangle prune (MightIntersect analogue for rects). */
  def withinRect(latLo: Double, latHi: Double, lngLo: Double, lngHi: Double): Column =
    col("lat").between(latLo, latHi) && col("lng").between(lngLo, lngHi)

  /** Exact squared-equirectangular cap predicate (shared arithmetic with the
    * oracle; the engine's haversine cap lives in Udfs.haversineMeters). */
  def withinCapD2(qLat: Double, qLng: Double, cosLat: Double, d2Max: Double): Column = {
    val d2 = (col("lat") - lit(qLat)) * (col("lat") - lit(qLat)) +
      ((col("lng") - lit(qLng)) * lit(cosLat)) * ((col("lng") - lit(qLng)) * lit(cosLat))
    d2 < lit(d2Max)
  }

  def find(df: DataFrame, pred: Column): DataFrame = df.where(pred)

  /** First n in id order — b6 `take` semantics need an explicit total order
    * (SURVEY.md §7.4), never a bare limit. */
  def take(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.orderBy(col(idCol)).limit(n)

  /** Top n by value, id tie-break — TakeOrderedAndProject, no full sort. */
  def top(df: DataFrame, valueCol: String, idCol: String, n: Int): DataFrame =
    df.orderBy(col(valueCol).desc, col(idCol)).limit(n)

  def countValues(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(valueCol).agg(count(lit(1)).as("n"))

  def sumByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(keyCol).agg(sum(valueCol).as("total"))

  /** Exact percentile of each value (full-sort semantics of math.go:57-103)
    * without a global single-partition window: aggregate to distinct values
    * (hash agg, partial+final), cumulative-sum over the DISTINCT values only
    * (tiny), then join the ranks back. percent_rank(v) =
    * (#rows strictly below v) / (n - 1) — identical doubles to the window
    * form and to SQL PERCENT_RANK. */
  def percentiles(df: DataFrame, valueCol: String): DataFrame = {
    val n = df.count()
    val counts = df.groupBy(valueCol).agg(count(lit(1)).as("_cnt"))
    val cum = counts.withColumn("_cum",
      sum("_cnt").over(Window.orderBy(col(valueCol))))
    val pct = cum.withColumn("pct",
      (col("_cum") - col("_cnt")).cast("double") / lit(math.max(1L, n - 1)).cast("double"))
      .select(col(valueCol).as("_v"), col("pct"))
    df.join(broadcast(pct), df(valueCol) === col("_v")).drop("_v")
  }
}
