package graft.ops

import graft.functions.Udfs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (builder brief):
  * exact (hash-groupBy), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard refine. All pair generation is band-bucketed equi-join — never an
  * all-pairs cross join — so the plan scales: candidates shuffle only within
  * identical band buckets (same shape as the S2 cell-prune join).
  */
object Dedup {

  /** Exact duplicate groups by content hash: every row mapped to the group's
    * canonical (minimum) id; rows in singleton groups are dropped.
    *
    * A real HashAggregate (partial+final) + equi-join back, NOT a window
    * over the key: training corpora routinely carry one massively repeated
    * key (empty text, boilerplate), and a window shape funnels that entire
    * group through a single partition's sort — the aggregate's map-side
    * combiners collapse the hot key to one row per partition instead, and
    * AQE's skew handling applies to the join (r03c audit). */
  /** The shared null-SAFE content key: md5(null) is null, and a plain
    * equi-join/groupBy would silently drop or isolate the null-key
    * duplicate group (review r03d) — map null content to a sentinel digest
    * instead (no md5 collision: real digests are 32 hex chars). ONE
    * definition for the batch forms AND the streaming form
    * (EventStream.dedupStreaming) so batch/streaming agreement cannot
    * drift. */
  private[graft] def dedupKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(md5(c), lit("<null>"))

  /** Internal column name, uniquified: a plain "dedup_key" would CLOBBER a
    * caller's same-named column before the row struct is captured (silent
    * data corruption — review r03f). */
  private[graft] val DedupKeyCol = "__graft_dedup_key"

  def exactDuplicates(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val keyed = df.withColumn(DedupKeyCol, dedupKey(col(keyCol)))
    val groups = keyed.groupBy(DedupKeyCol)
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_n"))
      .where(col("group_n") > 1)
    keyed.join(groups.hint("shuffle_hash"), Seq(DedupKeyCol))
      .select(col(idCol), col("canonical_id"))
  }

  /** Keep exactly one row per content key — the group's canonical
    * (minimum-id) member; singleton groups pass through untouched. The
    * composition-friendly complement of `exactDuplicates` (which reports the
    * duplicate groups): a filtering pipeline plugs this in to DROP the
    * non-canonical members and keep flowing.
    *
    * ONE PASS, NO JOIN: `min_by(struct(row), id)` computes the canonical
    * row per key in a single partial+final aggregation — the
    * winners-then-join-back shape scans (and re-evaluates every upstream
    * filter over) the input TWICE, which a plan audit showed as two full
    * parquet scans of the corpus (review r03e). Plan note: the struct
    * buffer is not hash-agg mutable, so Spark picks SortAggregate — a
    * per-partition, spillable sort of the SURVIVING rows; at corpus scale
    * that is cheaper than the second full scan + filter re-evaluation the
    * join shape pays (upstream stages are the expensive part of a cleaning
    * pipeline). Partial aggregation still collapses a massively repeated
    * key (empty text, boilerplate) map-side, and the exchange carries at
    * most one surviving row per key per partition.
    *
    * NULL ids never win `min_by`'s ordering, so a row with a NULL id is
    * never selected as a group's representative; a group whose ids are ALL
    * null is DROPPED (filtered) rather than emitted as the fabricated
    * all-NULL row min_by's empty buffer would otherwise produce
    * (review r03f). */
  def keepCanonical(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val cols = df.columns.toIndexedSeq
    df.withColumn(DedupKeyCol, dedupKey(col(keyCol)))
      .groupBy(DedupKeyCol)
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .where(col("_row").isNotNull)
      .select(cols.map(c => col(s"_row.`$c`").as(c)): _*)
  }

  /** Incremental corpus dedup: rows of `batch` whose content key does NOT
    * already exist in `corpus` — the day-2 ingestion primitive (dedupe a new
    * crawl slice against an existing 100 TB corpus without re-shuffling the
    * corpus for every slice).
    *
    * Scale shape: ONE aggregate scan of the corpus keys builds a Bloom
    * filter (sized by a cheap columnar count) that is broadcast to the
    * batch. Definite-negatives — the vast majority of genuinely new rows —
    * short-circuit with NO join at all; only Bloom-POSITIVES (true dups plus
    * the filter's false positives, an `fpp` fraction of the new rows) are
    * confirmed by an exact LEFT ANTI equi-join against the corpus keys. The
    * result is EXACT regardless of `fpp`: a false positive only costs a row
    * riding the confirm join, never a wrong answer. At design scale the
    * confirm join's corpus side prunes to matching key buckets (the corpus
    * is stored key-bucketed, same discipline as CellStore).
    *
    * Batch-INTERNAL duplicates are deliberately passed through — compose
    * with [[keepCanonical]] when the slice itself needs deduping. NULL
    * content maps to the shared sentinel key ([[dedupKey]]), so a null-text
    * batch row is "new" iff the corpus has no null-text row. */
  def newAgainstCorpus(corpus: DataFrame, batch: DataFrame, keyCol: String,
                       fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp $fpp outside (0, 1)")
    val ck = corpus.select(dedupKey(col(keyCol)).as(DedupKeyCol))
    val nKeys = math.max(1L, ck.count())
    val bloom = ck.stat.bloomFilter(DedupKeyCol, nKeys, fpp)
    val bc = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) => bc.value.mightContainString(k))
    val keyed = batch.withColumn(DedupKeyCol, dedupKey(col(keyCol)))
    val definiteNew = keyed.where(!mightContain(col(DedupKeyCol)))
    val confirmed = keyed.where(mightContain(col(DedupKeyCol)))
      .join(ck, Seq(DedupKeyCol), "left_anti")
    definiteNew.unionByName(confirmed).drop(DedupKeyCol)
  }

  /** MinHash + LSH banded candidate pairs with exact n-gram Jaccard refine.
    *
    * shingle (word 3-gram) -> 64-perm minhash -> `bands` band keys -> equi-
    * join on (band, key) -> exact Jaccard on sorted shingle hashes >= threshold.
    * Guarantee: a pair is produced iff it collides in >= 1 band AND its exact
    * Jaccard passes — the standard LSH recall/precision trade documented for
    * the chosen (k=64, bands, rows) operating point. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    // band join carries ONLY (id, band_key) — the shingle arrays do NOT ride
    // the x`bands` row replication through the shuffle (VERDICT r01: ~16x
    // shuffle-volume cut); they re-attach per candidate id for the refine.
    val keys = base.select(col("id"), Udfs.minhashSig(k)(col("text")).as("sig"))
      .withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("band_key", xxhash64(col("band"), slice(col("sig"), col("band") * lit(rows) + lit(1), lit(rows))))
      .select("id", "band_key")
    val candPairs = keys.select(col("id").as("id_a"), col("band_key"))
      .join(keys.select(col("id").as("id_b"), col("band_key")), "band_key")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val sh = base.select(col("id"), Udfs.docShingles(col("text")).as("shingles"))
    candPairs
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Udfs.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }


  /** Edit-distance VERIFICATION of near-dup candidate pairs — the precision
    * refine a production dedup runs after any probabilistic generator
    * (MinHash/SimHash/phash): texts re-attach by id (the pair frame rides
    * the shuffles keys-only, the minhash discipline) and a pair survives iff
    * `levenshtein(a, b) <= maxDist`. The metric is the exact unit-cost
    * Wagner-Fischer distance over UNICODE CODEPOINTS (Spark's semantics).
    * Cross-engine caveat: DuckDB's `levenshtein` counts BYTE edits, so the
    * SQL oracle matches bit-exactly only on ASCII text (the fixture corpus
    * is ASCII; a non-ASCII corpus needs a golden-side recomputation
    * instead — do not extend the SQL oracle to one). Cost is O(|a|·|b|) per CANDIDATE pair, affordable
    * precisely because the generator bounded the candidate set (never run
    * this all-pairs). Output: id_a, id_b, edit_dist (LONG). */
  def editDistanceRefine(pairs: DataFrame, df: DataFrame, idCol: String,
                         textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"editDistanceRefine: maxDist must be >= 0, got $maxDist")
    val ta = df.select(col(idCol).as("id_a"), col(textCol).as("_ta"))
    val tb = df.select(col(idCol).as("id_b"), col(textCol).as("_tb"))
    // strength reduction, two tiers: (1) edit distance >= |len(a) - len(b)|,
    // so a length-difference compare (pure codegen arithmetic) discards the
    // hopeless pairs before any DP; (2) the survivors run the
    // THRESHOLD-banded Levenshtein (O(maxDist * n) band, returns -1 above
    // the threshold) instead of the full O(n * m) table — exact for every
    // kept pair, so the oracle's unbanded recomputation still matches
    // bit-for-bit
    pairs.select("id_a", "id_b")
      .join(ta, Seq("id_a"))
      .join(tb, Seq("id_b"))
      .where(abs(length(col("_ta")) - length(col("_tb"))) <= maxDist)
      .withColumn("edit_dist",
        levenshtein(col("_ta"), col("_tb"), maxDist).cast("long"))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("edit_dist"))
  }

  /** Keep one canonical row per near-dup CLUSTER: connected components over
    * the pair list (Components.connectedComponents — near-duplication is
    * not transitive at the pair level, so clusters, not pairs, decide what
    * survives), then drop every row whose id is a NON-MINIMUM member of its
    * component. Rows not in any pair pass through untouched. The cluster
    * analogue of `keepCanonical` (same smallest-id convention); feed it the
    * output of any pair operator here (phash / minhash / simhash / n-gram
    * Jaccard / cosine LSH).
    * @param pairs two LONG columns of ids — the near-dup edges. */
  def keepCanonicalByPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(
      Components.connectedComponents(pairs)
        .where(col("id") =!= col("component"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** EXACT n-gram Jaccard near-duplicate pairs via PREFIX FILTERING — the
    * AllPairs/PPJoin family (Chaudhuri, Ganti & Kaushik, "A primitive
    * operator for similarity joins", ICDE 2006; Bayardo, Ma & Srikant,
    * "Scaling up all pairs similarity search", WWW 2007 — public
    * algorithms). Returns every (id_a, id_b, jaccard) with exact word-3-gram
    * Jaccard >= threshold — EQUAL to the all-pairs brute force (the gate's
    * oracle recomputes exactly that) — while the plan stays a
    * shingle-bucketed equi-join, never a CartesianProduct.
    *
    * Prefix filter: order every document's distinct shingles under ONE
    * global total order — ascending document frequency, ties by hash — and
    * index only the first m - ceil(t*m) + 1 of a document's m shingles.
    * Soundness: J(A,B) >= t implies |A∩B| >= t*|A∪B| >= ceil(t*|A|) =: α;
    * if the prefixes were disjoint, the smallest common element would sit
    * beyond one side's prefix, leaving at most |A| - p_A = α - 1 < α
    * elements to hold the whole intersection — contradiction. So every
    * qualifying pair collides on >= 1 prefix shingle, and the refine (exact
    * sorted-merge Jaccard, full shingle sets re-attached BY ID — the
    * key-only discipline of `minhashLshPairs`) loses nothing.
    *
    * Scale shape: the rarest-first order means the candidate join's posting
    * lists are the SHORT ones (a stopword shingle shared by half the corpus
    * lands at the back of every prefix and is rarely indexed); residual hot
    * buckets fall to AQE skew splitting like every hot-key join here. Two
    * bounded shuffles of (id, shingle_hash) pairs — by shingle for the
    * frequency attach and candidate join, by id for the per-doc prefix
    * window (group size = one document's shingle count). Unlike
    * `minhashLshPairs` this pays no recall trade: it is the exact
    * counterpart at ~the cost of one extra postings shuffle. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"ngramJaccardPairs: threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    // zero-shingle documents are excluded from pairing (documented: with
    // t > 0 an empty set can only tie another empty set, a degenerate
    // "duplicate" no cleaning pipeline wants)
    val sh = df.select(col(idCol).as("id"), Udfs.docShingles(col(textCol)).as("shingles"))
      .where(size(col("shingles")) > 0)
    val posts = sh.select(col("id"), size(col("shingles")).as("m"),
      explode(col("shingles")).as("sh"))
    val freq = posts.groupBy("sh").agg(count(lit(1)).as("df_sh"))
    // prefix length m - α + 1 with α = ceil(t*m); the 1e-9 backoff keeps an
    // exactly-integral t*m from rounding UP through FP noise (a too-large α
    // would shorten the prefix and break soundness; one-too-small only adds
    // candidates)
    val w = Window.partitionBy("id").orderBy(col("df_sh"), col("sh"))
    val prefix = posts.join(freq, "sh")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)) + lit(1))
      .select("id", "sh")
    val cand = prefix.select(col("id").as("id_a"), col("sh"))
      .join(prefix.select(col("id").as("id_b"), col("sh")), "sh")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Udfs.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Winnowing near-duplicate pairs (Schleimer et al. 2003 — the MOSS
    * pipeline as a distributed join): per document, the winnowed
    * fingerprint set ([[TextOps.winnowFingerprints]]: char k-grams,
    * window w, rightmost-min selection); pairs are documents sharing
    * >= `minShared` DISTINCT selected fingerprints. Deterministic and
    * LOCAL (unlike MinHash there is no probabilistic recall knob): any
    * shared substring of length >= w + k - 1 forces a shared fingerprint,
    * so minShared=m means >= m independently-witnessed shared passages.
    *
    * Scale shape: the join carries ONLY (id, fp) — two longs — per
    * selected print (~2/(w+1) per char, the paper's density), the same
    * key-only discipline as [[minhashLshPairs]]; the pair count is a
    * partial-aggregated groupBy. `maxDocFreq` drops fingerprints selected
    * by more than that many documents BEFORE pairing — MOSS's boilerplate
    * suppression, and at web scale the posting-list cap that bounds any
    * one bucket's quadratic contribution (a fp shared by d docs yields
    * d(d-1)/2 candidate rows); residual skew falls to AQE like every
    * hot-key join here. */
  def winnowNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int, minShared: Int,
                         maxDocFreq: Option[Int] = None): DataFrame = {
    require(minShared >= 1, s"winnowNearDupPairs: minShared must be >= 1, got $minShared")
    maxDocFreq.foreach(m => require(m >= 2,
      s"winnowNearDupPairs: maxDocFreq must be >= 2 (pairs need two docs), got $m"))
    val fps = TextOps.winnowFingerprints(
        df.select(col(idCol).as("id"), col(textCol).as("_text")), "_text", k, w)
      .select(col("id"), col("fp")).distinct()
    val kept = maxDocFreq match {
      case Some(m) =>
        val hot = fps.groupBy("fp").agg(count(lit(1)).as("_df"))
          .where(col("_df") > m).select("fp")
        fps.join(hot, Seq("fp"), "left_anti")
      case None => fps
    }
    kept.select(col("id").as("id_a"), col("fp"))
      .join(kept.select(col("id").as("id_b"), col("fp")), "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Shared 64-bit banded-Hamming candidate kernel: `keyed` carries
    * (id LONG, h LONG); split h into `bands` contiguous bands, equi-join on
    * (band, band_key), exact popcount refine. The join replicates only
    * (id, h) — two longs — per band, the key-only discipline of
    * `minhashLshPairs`.
    *
    * Recall contract (pigeonhole): a pair differing in <= bands-1 bits
    * cannot differ in every band, so it ALWAYS collides in >= 1 band —
    * the kernel is EXACT (equals brute force) for maxHamming <= bands-1,
    * and trades recall in the usual LSH way above that (callers document
    * their operating point). */
  private[graft] def hammingBandPairs(keyed: DataFrame, bands: Int,
                                      maxHamming: Int): DataFrame = {
    val width = 64 / bands
    val mask = (1L << width) - 1L
    val banded = keyed
      .withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("band_key",
        expr(s"shiftrightunsigned(h, band * $width) & $mask"))
    val a = banded.select(col("id").as("id_a"), col("h").as("h_a"),
      col("band"), col("band_key"))
    val b = banded.select(col("id").as("id_b"), col("h").as("h_b"),
      col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** SimHash near-duplicate pairs: 64-bit simhash, candidates from 4x16-bit
    * band buckets (exact for maxHamming <= 3 by the kernel's pigeonhole; the
    * default radius 6 trades recall as usual — documented operating point),
    * exact popcount refine. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6): DataFrame =
    hammingBandPairs(
      df.select(col(idCol).as("id"), Udfs.simhash(col(textCol)).as("h")),
      bands = 4, maxHamming = maxHamming)

  /** Perceptual-hash near-duplicate pairs over the image corpus — the
    * canonical image near-dup operator for a training-data pipeline (the
    * input_hint carries `phash` for exactly this): all (id_a, id_b, hamming)
    * with popcount(phash_a XOR phash_b) <= maxHamming.
    *
    * EXACT by construction, not probabilistic: `maxHamming < bands` is
    * required, so the pigeonhole guarantee applies and the banded equi-join
    * sees every qualifying pair — the result equals the all-pairs brute
    * force (the oracle for q_phash_neardup) while the plan stays a
    * shuffle-bounded equi-join (no CartesianProduct; the band buckets are
    * the only replication, x`bands` rows of two longs each). Skewed buckets
    * (a constant phash region — black frames, test cards) fall to AQE
    * skew-join splitting like every other hot-key join in the engine. */
  def phashNearDup(images: DataFrame, idCol: String = "image_id",
                   phashCol: String = "phash", maxHamming: Int = 3,
                   bands: Int = 4): DataFrame = {
    require(maxHamming < bands,
      s"phashNearDup is exact only for maxHamming < bands (got $maxHamming >= $bands); " +
        "raise bands or use simhashPairs' documented recall trade")
    hammingBandPairs(
      images.select(col(idCol).as("id"), col(phashCol).cast("long").as("h")),
      bands = bands, maxHamming = maxHamming)
  }

  /** Image-side benchmark DECONTAMINATION — the perceptual-hash twin of the
    * n-gram `decontaminate`: corpus images within `maxHamming` bits of ANY
    * benchmark image's phash are dropped (evaluation images and their
    * near-verbatim re-encodes must not reach the training set). Bipartite
    * band join: corpus bands ⋈ benchmark bands on (band, chunk) — exact for
    * maxHamming < bands by the pigeonhole — popcount refine, distinct hit
    * ids, LEFT ANTI re-attach. The benchmark side is benchmark-sized
    * (small), so its banded form broadcasts; the corpus never self-joins. */
  def phashDecontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                         phashCol: String, maxHamming: Int = 3,
                         bands: Int = 4): DataFrame = {
    require(maxHamming < bands,
      s"phashDecontaminate is exact only for maxHamming < bands " +
        s"(got $maxHamming >= $bands)")
    val width = 64 / bands
    val mask = (1L << width) - 1L
    def banded(df: DataFrame, i: String, h: String) = df
      .select(col(idCol).as(i), col(phashCol).cast("long").as(h))
      .withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("band_key",
        expr(s"shiftrightunsigned($h, band * $width) & $mask"))
    val hits = banded(corpus, "cid", "h_c")
      .join(broadcast(banded(bench, "bid", "h_b")), Seq("band", "band_key"))
      .where(bit_count(col("h_c").bitwiseXOR(col("h_b"))) <= maxHamming)
      .select(col("cid").as(idCol)).distinct()
    corpus.join(hits, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs, exact (brute-force baseline; the
    * LSH-bucketed scale path is Similarity.cosineLshPairs). */
  def embeddingNearDupExact(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val withNorm = Similarity.withNorm(df, idCol, vecCol)
    val a = withNorm.select(col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a"))
    val b = withNorm.select(col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")))
      // NaN (zero-norm vector) must be rejected explicitly — Spark orders
      // NaN above all doubles, so `NaN > threshold` alone is TRUE
      .where(col("cosine") > threshold && !isnan(col("cosine")))
      .select("id_a", "id_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-duplicate
    * pairs found ONLY within k-means clusters of the embedding space — the
    * web-scale shape for embedding dedup. The all-pairs quadratic is bounded
    * per cluster (the paper's trick: with C clusters of ~N/C rows each, work
    * drops from N² to N²/C while near-identical vectors still collide,
    * because a cosine-ε duplicate pair is far closer to each other than to
    * any centroid boundary at the thresholds dedup uses, ≥0.9). Plan shape:
    * map-side centroid assignment over a broadcast constant-size quantizer
    * (same model as [[Similarity.ivfTopK]] — at design scale `cluster` is
    * the write-time bucket key and this join is co-located), then a plain
    * equi-join on `cluster` with the exact-cosine refine in the condition.
    * DELIBERATELY approximate across clusters, exact within: a pair split
    * by the quantizer is missed — that is SemDeDup's published contract,
    * and the exact baseline ([[embeddingNearDupExact]]) plus the LSH path
    * ([[Similarity.cosineLshPairs]]) remain for recall-critical uses.
    * Zero-norm vectors score NaN, which must be rejected EXPLICITLY:
    * Spark SQL orders NaN above every double, so a bare `> threshold`
    * would pair every degenerate vector with its whole cluster. */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                         centroids: Array[Array[Double]],
                         threshold: Double): DataFrame = {
    val assign = udf((v: Seq[Float]) =>
      Similarity.nearestCentroid(v.map(_.toDouble).toArray, centroids))
    val n = Similarity.withNorm(df, idCol, vecCol)
      .withColumn("cluster", assign(col("vec")))
    val a = n.select(col("cluster"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("norm").as("norm_a"))
    val b = n.select(col("cluster"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("norm").as("norm_b"))
    a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(
        col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")))
      .where(col("cosine") > threshold && !isnan(col("cosine")))
      .select("id_a", "id_b")
  }

  /** Exact duplicated-span detection + removal — the Spark-native shape of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499) ExactSubstr dedup: find every word n-gram
    * that occurs MORE THAN ONCE in the whole corpus (across documents or
    * repeated within one), mark the words any duplicated gram covers, and
    * emit the document with those spans removed. The paper builds one giant
    * suffix array on a single machine; the distributed re-expression is a
    * sliding n-gram join — a fixed window instead of arbitrary-length
    * suffixes (n plays the paper's min-match-length role: any duplicated
    * substring of >= n words is found EXACTLY, via its constituent grams,
    * and overlapping duplicated grams merge into maximal spans for free
    * because coverage is per word index).
    *
    * Adds to each input row: `n_dup_grams` (this doc's duplicated-gram
    * starts), `n_covered_words`, and `text_kept` (the surviving words
    * re-joined with single spaces — the training-ready residue).
    *
    * Plan shape at scale: the gram frame carries ONLY (id, start, gram) —
    * document bodies never ride the gram shuffle; duplicated grams come
    * from one partial-aggregated count and re-attach by a LEFT SEMI
    * equi-join on the gram (two shuffles keyed by the n-word gram string;
    * a boilerplate hot gram collapses map-side in the count and falls to
    * AQE skew splitting in the semi join). Per-document duplicated-start
    * lists are bounded by the document's own word count — the same
    * row-sized-state contract as holding the text column itself — and the
    * span removal is pure map-side array arithmetic (no UDF). */
  def dupSpanDedup(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 8): DataFrame = {
    require(n >= 1, s"dupSpanDedup: n must be >= 1, got $n")
    val words = filter(split(col(textCol), "[ \\n\\t]"), w => length(w) > 0)
    val grams = df.select(col(idCol).as("_id"), explode(
        when(size(words) >= n,
          transform(sequence(lit(1), size(words) - lit(n - 1)), i =>
            struct(i.as("s"), array_join(slice(words, i, lit(n)), " ").as("g"))))
          .otherwise(array().cast("array<struct<s:int,g:string>>"))).as("sg"))
      .select(col("_id"), col("sg.s").as("_start"), col("sg.g").as("_gram"))
    val dupGrams = grams.groupBy("_gram")
      .agg(count(lit(1)).as("_n")).where(col("_n") > 1).select("_gram")
    val perDoc = grams.join(dupGrams, Seq("_gram"), "left_semi")
      .groupBy("_id")
      .agg(sort_array(collect_list("_start")).as("_starts"),
        count(lit(1)).as("_ndup"))
    // a word index i (1-based) is covered iff some duplicated gram starting
    // at s spans it: s <= i < s + n — overlap merging is implicit
    df.join(perDoc, col(idCol) === col("_id"), "left").drop("_id")
      .withColumn("_starts", coalesce(col("_starts"), array().cast("array<int>")))
      .withColumn("n_dup_grams", coalesce(col("_ndup"), lit(0L)))
      .withColumn("_kept", filter(words, (w, i0) =>
        !exists(col("_starts"), s => s <= i0 + lit(1) && i0 + lit(1) < s + lit(n))))
      .withColumn("n_covered_words", (size(words) - size(col("_kept"))).cast("long"))
      .withColumn("text_kept", array_join(col("_kept"), " "))
      .drop("_starts", "_ndup", "_kept")
  }

  /** URL canonicalization — the key every URL-level web-corpus dedup
    * (C4, RefinedWeb, Dolma) groups by before picking a survivor:
    * lowercase, strip the fragment, the query string, the scheme, a
    * leading `www.`, and a trailing slash. Pure codegen regexp chain in
    * the Java∩RE2 dialect-safe subset (anchors + classes only), so the
    * DuckDB oracle canonicalizes bit-identically; each pattern can match
    * at most once, so Java's replace-all and DuckDB's replace-first
    * agree by construction. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lower(url), "#.*", ""), "[?].*", ""), "^https?://", ""), "^www[.]", ""),
      "/$", "")

  /** URL-level dedup: keep one row (the minimum-id member) per canonical
    * URL. Composition: [[canonicalUrl]] + [[keepCanonical]], so the plan is
    * the same one-pass min_by aggregate — no join, no window. The canonical
    * URL is kept on the output as `url_canon`. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    keepCanonical(
      df.withColumn("url_canon", canonicalUrl(col(urlCol))), idCol, "url_canon")

  /** Benchmark decontamination (the GPT-3/PaLM n-gram overlap rule): drop
    * every corpus row whose text shares ANY word n-gram with the benchmark
    * set. Corpus docs shorter than n words carry no n-gram and always
    * survive.
    *
    * Plan shape at scale: both sides explode to grams with the text payload
    * projected away FIRST, so document bodies never ride a shuffle. The
    * benchmark side is small by nature (eval sets are ~10^4..10^6 grams
    * even for big benchmark suites), so its distinct gram set is BROADCAST
    * and the corpus probe is a map-side LeftSemi — zero shuffle of corpus
    * data to find hits. Hit ids collapse through a partial-aggregated
    * distinct (one id per doc, not one per matching gram) before the
    * left_anti re-attach returns the surviving ORIGINAL rows. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(TextOps.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol), explode(TextOps.wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
