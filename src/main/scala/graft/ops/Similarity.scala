package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (builder brief): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH-bucketed
  * variant as the scale path. The dot product is a higher-order-function
  * expression (zip_with + aggregate) — codegen-friendly, no UDF. */
object Similarity {

  /** L2 norm of a float vector, accumulated left-to-right in double. */
  def l2Norm(c: Column): Column = sqrt(aggregate(c, lit(0.0d),
    (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Normalize to (id, vec, norm) with a double L2 norm. */
  def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("norm", l2Norm(col("vec")))

  /** Cosine similarity of two float vectors with precomputed norms; products
    * accumulate left-to-right in double. TOTAL by construction: a zero-norm
    * (degenerate) vector yields NaN rather than evaluating 0/0 — under
    * Spark's default ANSI mode a literal 0/0 THROWS DIVIDE_BY_ZERO and
    * kills the whole query, so one failed-decode embedding in a 100 TB
    * corpus must not crash the job; NaN is then EXCLUDED by [[rankTopK]]
    * and every thresholding site (Spark orders NaN above all doubles, so
    * a bare `> t` would otherwise pass it). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    val denom = normA * normB
    when(denom === 0.0d, lit(Double.NaN)).otherwise(dot / denom)
  }

  /** CLIP-score-style alignment filter for paired multimodal embeddings
    * (the LAION/DataComp pipeline stage): keep rows whose two embedding
    * columns agree above the threshold, exposing the score for downstream
    * quality buckets. Pure map-side after whatever join built the pairs —
    * norms and the dot product are higher-order-function expressions over
    * the arrays (no UDF, no shuffle), so the filter rides the pair-build
    * stage at any scale.
    *
    * Zero-norm vectors (failed decodes — exactly what an alignment filter
    * exists to drop) give cosine 0/0 = NaN; Spark's nan-safe comparison
    * would rank NaN ABOVE the threshold, so the filter explicitly rejects
    * NaN scores (same adjudication as [[rankTopK]]: an undefined
    * similarity must not pass a quality bar). */
  def alignmentFilter(pairs: DataFrame, vecACol: String, vecBCol: String,
                      threshold: Double,
                      scoreCol: String = "alignment"): DataFrame = {
    pairs
      .withColumn(scoreCol,
        cosine(col(vecACol), col(vecBCol), l2Norm(col(vecACol)), l2Norm(col(vecBCol))))
      .where(col(scoreCol) > threshold && !isnan(col(scoreCol)))
  }

  /** Rank joined (query_id, id, cosine) candidates to per-query top-k via
    * the shared BOUNDED partial aggregate (largest cosine first, id
    * tie-break — for finite scores the negated score gives exactly the old
    * `orderBy(cosine desc, id)` window order). Map-side combiners cut every
    * partition to <= k rows per query BEFORE the shuffle; the row_number
    * window this replaces funneled a query's ENTIRE candidate set into one
    * window partition — a single task sorting ~nProbe/nClusters of the
    * corpus at data scale (r03c audit).
    *
    * NaN cosines (zero-norm vectors: 0/0) are EXCLUDED before ranking —
    * an undefined similarity must not beat defined ones (review r03d),
    * and excluding beats rank-last: rank-last still emitted NaN rows when
    * a query had < k finite candidates, and the UDAF (Java total order,
    * NaN greatest), the old desc window (NaN first) and the SQL oracle
    * (DuckDB desc, NaN first) all disagreed on where those rows land
    * (review r03i) — exclusion is the one contract every engine states
    * identically. */
  private def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val topkUdaf = TopKAgg.udafFor(k)
    cand
      .where(!isnan(col("cosine")))
      .groupBy("query_id")
      .agg(topkUdaf(col("id"), -col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top.ids")).as(Seq("pos", "result_id")))
      .select(col("query_id"), col("result_id"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Exact brute-force cosine top-k: broadcast the (small) query side; the
    * corpus is probed map-side and collapses to <= k rows per query via the
    * bounded partial aggregate — no shuffle of the big side, no per-query
    * window sort. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
    rankTopK(c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec"), col("norm"), col("qnorm"))), k)
  }

  /** Recall@k of an approximate ANN result against the exact baseline —
    * the index-quality eval join a training pipeline runs continuously
    * (is the IVF/LSH index still finding what brute force finds?). Inputs
    * are two ranked result sets (query_id, result_id[, rank]); output one
    * row per query in `exact`: (query_id, n_hits, recall) with n_hits =
    * |approx ∩ exact| and recall = n_hits / k. One keyed shuffle on
    * (query_id, result_id) — both sides are O(queries × k) regardless of
    * corpus size, so the eval costs nothing next to the searches. recall
    * is an exact small-integer division, bit-stable across engines. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"recallAtK: k must be positive, got $k")
    exact.select(col("query_id"), col("result_id"))
      .join(approx.select(col("query_id"), col("result_id"), lit(1).as("_hit")),
        Seq("query_id", "result_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("recall", col("n_hits") / lit(k.toDouble))
  }

  /** Quantizer-training sample bound, ONE definition shared by the gate
    * closures and the Golden driver recomputation: [[trainCentroids]]'
    * contract is a bounded sample (scaladoc below), but the gates used to
    * collect the FULL embedding table to feed it — fine at gate scale, a
    * driver OOM at 10^12 rows (VERDICT r03 #2). 512 = 32 training vectors
    * per centroid at the gates' nClusters = 16. */
  val QuantizerSampleRows: Int = 512

  /** The bounded deterministic training sample: the `limit` LOWEST ids.
    * orderBy + limit plans as TakeOrderedAndProject — each scan task keeps
    * only its local top rows and the driver receives exactly `limit` rows
    * regardless of corpus size, so this is the collect-shape the quantizer
    * contract allows at design scale. */
  def quantizerSample(emb: DataFrame, idCol: String, vecCol: String,
                      limit: Int = QuantizerSampleRows): Array[(Long, Array[Float])] = {
    val sel = emb.select(col(idCol).cast("long").as("__qid"), col(vecCol).as("__qvec"))
      .orderBy(col("__qid"))
      .limit(limit)
    sel.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }

  /** Array-side twin of [[quantizerSample]] for the Golden recomputation —
    * the same lowest-id subset, the same bound, one definition. */
  def quantizerTrainingSubset(
      emb: Array[(Long, Array[Float])]): Array[(Long, Array[Float])] =
    emb.sortBy(_._1).take(QuantizerSampleRows)

  /** Deterministic spherical k-means for the IVF coarse quantizer: trained
    * driver-side on a BOUNDED sample (rows sorted by id; init = the first
    * nClusters vectors; fixed iteration count; cosine assignment with
    * lowest-index tie-break; empty clusters keep their centroid). At design
    * scale the sample is a `.limit(...)` over the corpus ([[quantizerSample]])
    * — the quantizer is a constant-size model, never a full pass. */
  def trainCentroids(sample: Array[(Long, Array[Float])], nClusters: Int,
                     iters: Int): Array[Array[Double]] = {
    def normalize(v: Array[Float]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      val n = math.sqrt(s)
      v.map(x => if (n == 0) 0.0 else x.toDouble / n)
    }
    val data = sample.sortBy(_._1).map(p => normalize(p._2))
    var centroids = data.take(nClusters).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nClusters)(new Array[Double](data(0).length))
      val counts = new Array[Int](nClusters)
      data.foreach { v =>
        val c = nearestCentroid(v, centroids)
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
        counts(c) += 1
      }
      centroids = centroids.indices.toArray.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          var s = 0.0; var d = 0
          while (d < sums(c).length) { s += sums(c)(d) * sums(c)(d); d += 1 }
          val n = math.sqrt(s)
          if (n == 0) centroids(c) else sums(c).map(_ / n)
        }
      }
      it += 1
    }
    centroids
  }

  /** Index of the max-dot centroid (ties -> lowest index). */
  def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      var s = 0.0; var d = 0
      val ct = centroids(c)
      while (d < ct.length && d < v.length) { s += ct(d) * v(d); d += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }

  /** The nProbe nearest centroids for a query vector (dot desc, index asc). */
  def probeList(v: Array[Double], centroids: Array[Array[Double]], nProbe: Int): Array[Int] = {
    centroids.indices.map { c =>
      var s = 0.0; var d = 0
      val ct = centroids(c)
      while (d < ct.length && d < v.length) { s += ct(d) * v(d); d += 1 }
      (c, s)
    }.sortBy { case (c, s) => (-s, c) }.take(nProbe).map(_._1).toArray
  }

  /** IVF ANN (builder brief "IVF ... as the scale path"): corpus rows carry
    * their nearest-centroid cluster id (a write-time assignment — the
    * bucketing/partition key at scale, so a probe reads only its clusters'
    * files); queries explode their nProbe probe clusters and the exact
    * cosine top-k runs over ONLY the joined clusters. With
    * nProbe == nClusters the result equals bruteForceTopK exactly
    * (tested); smaller nProbe trades recall for a nClusters/nProbe scan
    * cut. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val assign = udf((v: Seq[Float]) =>
      nearestCentroid(v.map(_.toDouble).toArray, centroids))
    val probes = udf((v: Seq[Float]) =>
      probeList(v.map(_.toDouble).toArray, centroids, nProbe))
    val c = withNorm(corpus, idCol, vecCol).withColumn("cluster", assign(col("vec")))
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("norm").as("qnorm"))
      .withColumn("cluster", explode(probes(col("qvec"))))
    rankTopK(c.join(broadcast(q), Seq("cluster"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("vec"), col("qvec"), col("norm"), col("qnorm"))), k)
  }

  /** Signed random-hyperplane sketch: `bits` sign bits from deterministic
    * pseudo-random planes (seeded, no data dependence). */
  def hyperplaneSketch(df: DataFrame, idCol: String, vecCol: String,
                       bits: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val planes: Array[Array[Double]] = Array.tabulate(bits, dim) { (b, d) =>
      val h = graft.core.Hashes.splitmix64(seed + b * 1000003L + d)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val sketch = udf((v: Seq[Float]) => {
      var sig = 0L
      var b = 0
      while (b < planes.length) {
        var s = 0.0; var d = 0
        val p = planes(b)
        while (d < p.length && d < v.length) { s += p(d) * v(d); d += 1 }
        if (s >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    })
    df.withColumn("sketch", sketch(col(vecCol)))
  }

  /** ANN via LSH buckets: pairs colliding on >= 1 of `bands` sketch bands,
    * refined by exact cosine >= threshold. Approximate-by-design (recall
    * depends on bands x bits); the exact baseline above is the oracle. */
  def cosineLshPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double, bits: Int = 32, bands: Int = 4): DataFrame = {
    val rows = bits / bands
    val base = withNorm(df, idCol, vecCol)
    // band join carries ONLY (id, band_key) — the vectors do NOT ride the
    // x`bands` replication through the shuffle (same restructure as the
    // minhash path); they re-attach per candidate id for the exact refine
    val keys = hyperplaneSketch(base.select("id", "vec"), "id", "vec", bits, dim)
      .withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("band_key",
        expr(s"concat(band, ':', shiftrightunsigned(sketch, band * $rows) & ${(1L << rows) - 1}L)"))
      .select("id", "band_key")
    val candPairs = keys.select(col("id").as("id_a"), col("band_key"))
      .join(keys.select(col("id").as("id_b"), col("band_key")), "band_key")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candPairs
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")).as("cosine"))
      // explicit NaN reject: Spark orders NaN above all doubles, so a
      // zero-norm vector sharing a bucket would otherwise pass the refine
      .where(col("cosine") >= threshold && !isnan(col("cosine")))
  }
}
