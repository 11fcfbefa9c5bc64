package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines: reproducible
  * draws derived from md5 of a key column, never from RNG state, so a
  * sample is stable across runs, engines, partitionings and retries — the
  * property corpus-mixing pipelines actually need (re-running a 100 TB mix
  * job must not re-roll the dice).
  *
  * Two shapes, deliberately separate:
  *  - [[sampleByHash]]: rate-per-stratum as a PURE FILTER over the scan —
  *    no shuffle, no state, whole-stage codegen; the 100 TB default.
  *  - [[sampleExact]]: exactly n rows per stratum via a per-stratum window
  *    sort — right for bounded strata (eval carve-outs, per-language caps);
  *    a skewed open-ended stratum funnels through one task's sort, which is
  *    why the rate form exists.
  */
object Sampling {

  /** A uniform 32-bit draw for a key, as the FIRST 8 LOWERCASE HEX CHARS of
    * md5(key). Kept as a string so the keep test is a plain string compare
    * reproducible bit-exactly in any engine with md5 (the DuckDB oracle
    * shares the threshold literal). */
  def hashDraw(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Threshold literal for a keep rate: floor(rate * 2^32) as 8 lowercase
    * hex chars; keep iff hashDraw(key) < threshold. rate 0 keeps nothing
    * ("00000000" is strictly above no draw); rate 1 returns "g", which
    * sorts after every hex digit and so keeps everything. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Shuffle-free deterministic stratified sampling: keep a row iff its md5
    * draw falls under its stratum's rate. Strata not in `rates` use
    * `defaultRate`. */
  def sampleByHash(df: DataFrame, keyCol: String, stratumCol: String,
                   rates: Map[String, Double],
                   defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdHex(defaultRate)): Column) {
      case (acc, (k, r)) =>
        when(col(stratumCol) === lit(k), lit(thresholdHex(r))).otherwise(acc)
    }
    df.where(hashDraw(col(keyCol)) < thr)
  }

  /** Deterministic fractional upsampling for corpus mixing (Pile/Dolma-style
    * per-source weights): a row appears floor(w) times, plus once more iff
    * its md5 draw falls under frac(w) — expected multiplicity exactly w,
    * with NO RNG, byte-stable across runs, partitionings and engines.
    * Weights below 1 degrade to deterministic downsampling (floor 0 +
    * fractional keep = the sampleByHash rule). Adds `copy` (INT, 1..reps);
    * a map-side explode of a tiny int sequence — no shuffle. */
  def upsample(df: DataFrame, keyCol: String, stratumCol: String,
               weights: Map[String, Double],
               defaultWeight: Double = 1.0): DataFrame = {
    def repsFor(w: Double): Column = {
      require(w >= 0.0, s"upsample: weight must be >= 0, got $w")
      val whole = math.floor(w).toInt
      lit(whole) +
        (hashDraw(col(keyCol)) < lit(thresholdHex(w - whole))).cast("int")
    }
    val reps = weights.foldLeft(repsFor(defaultWeight)) {
      case (acc, (k, w)) =>
        when(col(stratumCol) === lit(k), repsFor(w)).otherwise(acc)
    }
    // the when-guard matters: sequence(1, 0) DESCENDS rather than erroring,
    // and explode of the empty array is what drops a reps=0 row
    df.withColumn("copy", explode(
      when(reps >= 1, sequence(lit(1), reps))
        .otherwise(array().cast("array<int>"))))
  }

  /** Exactly-n-per-stratum deterministic sample: the n rows with the LOWEST
    * md5 draws in each stratum, ties broken by the key itself. */
  def sampleExact(df: DataFrame, keyCol: String, stratumCol: String,
                  n: Int): DataFrame = {
    require(n > 0, s"sampleExact: n must be positive, got $n")
    val rk = "__graft_sample_rk"
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashDraw(col(keyCol)), col(keyCol))
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= n)
      .drop(rk)
  }
}
