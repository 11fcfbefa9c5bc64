package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutation / overlay-world semantics (SURVEY.md §2.9):
  *
  *   b6 `Change` batches (add-tag/remove-tag, ingest/change.go:14-16) become
  *   delta DataFrames; `MutableOverlayWorld` (ingest/mutable.go:16-45) — a
  *   delta layer over an immutable base where the overlay wins — becomes
  *   unionByName + latest-snapshot-wins window, i.e. the merged-world k-way
  *   iterator (merged.go:7-81) as one window over the union. `with-change`
  *   (api/functions/change.go:80-88) = evaluating any query over the view
  *   returned here, without committing anything.
  *
  * At design scale the same shape is an Iceberg MERGE/snapshot read; this
  * view form is the read-side equivalent and is what hypothetical-world
  * evaluation uses either way. */
object Overlay {

  /** base overlaid with delta: rows joined by `idCol`, delta rows win;
    * delta rows with no base row are additions; base rows absent from delta
    * pass through. Schemas must match (unionByName). */
  def overlay(base: DataFrame, delta: DataFrame, idCol: String): DataFrame = {
    val tagged = base.withColumn("_snap", lit(0))
      .unionByName(delta.withColumn("_snap", lit(1)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_snap").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_snap", "_rn")
  }

  /** add-tags as a Change: produce the delta rows for `ids` with `tagCol`
    * set to `value` (the b6 add-tag function shape, change.go:11-40). */
  def addTag(base: DataFrame, idCol: String, ids: Seq[Long],
             tagCol: String, value: String): DataFrame =
    base.where(col(idCol).isin(ids: _*)).withColumn(tagCol, lit(value))

  /** remove-tags as a Change (change.go:42-60): delta rows for `ids` with
    * `tagCol` nulled — under `overlay` the delta wins, so the tag reads as
    * absent in the hypothetical world. */
  def removeTag(base: DataFrame, idCol: String, ids: Seq[Long],
                tagCol: String): DataFrame =
    base.where(col(idCol).isin(ids: _*))
      .withColumn(tagCol, lit(null).cast(base.schema(tagCol).dataType))

  /** merge-changes (change.go:62-78): combine Change batches into one delta;
    * later batches win on id collision (the reference applies in order).
    *
    * Precondition — ENFORCED loudly (VERDICT r03 #7; was doc-only): each
    * batch carries AT MOST ONE row per id (the shape `addTag`/`removeTag`
    * produce — the reference's Change is a map keyed by FeatureID,
    * ingest/change.go:14-16, so duplicates within one batch cannot exist
    * there either). With duplicate ids inside a single batch the `_batch`
    * tie would pick a nondeterministic winner (ADVICE r02), so a violating
    * input now raises from inside the merge plan itself (a per-(id, batch)
    * count window + raise_error — lazy, no extra job; referenced in the
    * final filter so column pruning cannot drop the check). */
  def mergeChanges(idCol: String, changes: Seq[DataFrame]): DataFrame = {
    require(changes.nonEmpty, "mergeChanges: empty change list (nothing to merge)")
    val tagged = changes.zipWithIndex
      .map { case (c, i) => c.withColumn("_batch", lit(i)) }
      .reduce(_ unionByName _)
    val wDup = Window.partitionBy(col(idCol), col("_batch"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_batch").desc)
    tagged
      .withColumn("_dupchk",
        when(count(lit(1)).over(wDup) > 1,
          raise_error(concat(
            lit("mergeChanges: duplicate id within one batch: "),
            col(idCol).cast("string")))))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("_dupchk").isNull)
      .drop("_batch", "_rn", "_dupchk")
  }
}
