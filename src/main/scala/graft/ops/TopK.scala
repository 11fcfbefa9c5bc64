package graft.ops

/** Bounded top-k as parallel arrays (rank order = array order). */
final case class TopK(ids: Seq[Long], d2s: Seq[Double])

/** Bounded per-group top-k aggregator: the k-smallest (score, id) pairs
  * under the total tuple order (for LARGEST-score semantics pass the
  * negated score). Runs as a PARTIAL ObjectHashAggregate — map-side
  * combiners shrink every partition's candidates to <= k per group BEFORE
  * the shuffle, so the exchange carries O(groups * k) rows instead of every
  * candidate, and no group ever funnels its full candidate set into one
  * window partition (the row_number shape this replaces sorts ALL of a
  * group's rows in a single task — the r03c full-source audit found that
  * shape in the ANN paths at data scale). Deterministic: insertion/merge
  * are order-independent under the total order; ids are unique.
  *
  * Shared by the kNN family (distance ascending) and the ANN/similarity
  * family (cosine descending via negation). */
private[graft] final class TopKAgg(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[(Long, Double), List[(Double, Long)], TopK] {
  private val ord = implicitly[Ordering[(Double, Long)]]
  // Buffer invariant: ASCENDING under `ord`, length <= k — so reduce is a
  // single-pass ordered insert and merge a linear two-list merge; the
  // original sort-the-whole-buffer forms paid O(k log k) + a full rebuild
  // per ACCEPTED ROW on the hottest per-candidate path in the engine
  // (review r03g).
  def zero: List[(Double, Long)] = Nil
  def reduce(b: List[(Double, Long)], a: (Long, Double)): List[(Double, Long)] = {
    val x = (a._2, a._1)
    if (b.length >= k && ord.compare(x, b.last) >= 0) b
    else {
      val (lt, ge) = b.span(e => ord.compare(e, x) < 0) // one pass, stays sorted
      (lt ::: (x :: ge)).take(k)
    }
  }
  def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    val out = List.newBuilder[(Double, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.compare(x.head, y.head) <= 0)) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }
  def finish(b: List[(Double, Long)]): TopK =
    TopK(b.map(_._2), b.map(_._1))
  def bufferEncoder: org.apache.spark.sql.Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.Encoders.kryo[List[(Double, Long)]]
  def outputEncoder: org.apache.spark.sql.Encoder[TopK] =
    org.apache.spark.sql.Encoders.product[TopK]
}

private[graft] object TopKAgg {
  /** The aggregator as a usable Column function. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
}
