package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal AS-OF join: for every left row, the single most recent right row
  * with the same key and right.ts <= left.ts (optionally no older than a
  * tolerance) — "attach the label/state snapshot that was current when this
  * event happened", the point-in-time join every training-data pipeline
  * needs and the reference's world-snapshot semantics (a b6 query always
  * reads features AS OF the world version it runs against,
  * /root/reference/src/diagonal.works/b6/ingest/mutable.go snapshot reads)
  * turned into a per-row temporal operator.
  *
  * Scale shape (the 100 TB contract): NOT a join at all. Both inputs are
  * tagged and unioned, shuffled ONCE by key, and a single running
  * `last(non-null, ignoreNulls)` window ordered by (ts, side) resolves every
  * left row to its predecessor right row in one streaming pass per key —
  * no range-join explosion, no per-row probe, no driver state. Window
  * evaluation is append-only over the sorted run, so memory is O(1) per key
  * regardless of how many left rows share a key; the single shuffle is the
  * same exchange a plain groupBy would pay. (This union-window formulation
  * is the standard distributed as-of shape — e.g. Flint's LeftJoin — chosen
  * over a range join because Spark's range joins are O(n·m) per key.)
  *
  * Determinism contract: at equal (key, ts) the RIGHT row wins (right sorts
  * before left, so a state written at exactly the event's timestamp is
  * visible to it), and equal-ts right rows resolve to the one with the
  * LARGEST payload tuple (the window orders by the match struct; struct
  * ordering is field-lexicographic). The match is picked atomically as one
  * struct — payload columns can never mix values from different right rows.
  */
object AsOf {

  /** Left columns are preserved verbatim; `payload` columns (from `right`)
    * are appended, null where no right row qualifies. `right` must contain
    * `keys :+ tsCol :+ payload`; payload names must not collide with left
    * columns (alias the right side first — including right's ts, if wanted
    * in the output, e.g. `.withColumn("state_ts", col("ts"))`).
    *
    * @param toleranceSeconds if set, a match older than this many seconds
    *   before the left row's ts is discarded (all payload columns null) —
    *   the "state too stale to use" cut.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               toleranceSeconds: Option[Double] = None): DataFrame = {
    require(keys.nonEmpty && payload.nonEmpty, "keys and payload must be non-empty")
    val leftCols = left.columns.toSeq
    require(keys.forall(leftCols.contains) && leftCols.contains(tsCol),
      s"left must contain keys $keys and ts column $tsCol")
    payload.foreach(c => require(!leftCols.contains(c),
      s"payload column '$c' collides with a left column — alias the right side"))
    val sideCol = "_asof_side"; val matchCol = "_asof_m"
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == tsCol)

    // right rows carry their candidate match as ONE struct (rts first, so
    // the deterministic tie-break orders by recency then payload tuple);
    // left-only columns ride the union as nulls on the right side — the
    // whole operator is ONE exchange + one window, no join node anywhere
    val r0 = leftOnly.foldLeft(
      right
        .select((keys :+ tsCol).map(col) ++ payload.map(col): _*)
        .withColumn(matchCol, struct(col(tsCol).as("_rts") +: payload.map(col): _*))
        .withColumn(sideCol, lit(0))
        .drop(payload: _*)
    )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val matchType = r0.schema(matchCol).dataType
    val l0 = left
      .withColumn(matchCol, lit(null).cast(matchType))
      .withColumn(sideCol, lit(1))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc, col(matchCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = l0.unionByName(r0)
      .withColumn(matchCol, last(col(matchCol), ignoreNulls = true).over(w))
      .where(col(sideCol) === 1)

    // TIMESTAMP_NTZ has no direct double cast; route through TIMESTAMP
    // (both sides shift by the same session offset, so differences are exact)
    import org.apache.spark.sql.types.NumericType
    def secs(c: org.apache.spark.sql.Column) = left.schema(tsCol).dataType match {
      case _: NumericType => c.cast("double")
      case _              => c.cast("timestamp").cast("double")
    }
    val tooStale = toleranceSeconds.map { tol =>
      secs(col(tsCol)) - secs(col(matchCol).getField("_rts")) > tol
    }.getOrElse(lit(false))
    resolved
      .withColumn(matchCol, when(col(matchCol).isNotNull && !tooStale, col(matchCol)))
      .select(leftCols.map(col) ++
        payload.map(c => col(matchCol).getField(c).as(c)): _*)
  }
}
