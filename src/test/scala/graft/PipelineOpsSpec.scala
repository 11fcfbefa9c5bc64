package graft

import graft.ops.{Media, Sampling, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-3 wave: CCNet-style cross-doc boilerplate removal, bigram
  * stupid-backoff LM scoring, aspect-ratio bucketing. Hand vectors plus an
  * engine-vs-golden equality check (the same cross-engine discipline the
  * driver gate applies at sf scale). */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("pipeline-ops-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("boilerplateRemove strikes lines in >= minDocs distinct docs, keeps order") {
    import spark.implicits._
    // "cookie" appears in docs 1,2,3 (>=3 distinct) -> struck everywhere;
    // "menu" in 1,2 only -> kept; doc-internal repetition ("hello" twice in
    // doc 1) does NOT make a line boilerplate (distinct-doc counting)
    val docs = Seq(
      (1L, "hello\ncookie\nmenu\nhello"),
      (2L, "cookie\nmenu\nbody two"),
      (3L, "cookie\n\nbody three"),
      (4L, "all original\n\n")).toDF("doc_id", "text")
    val got = TextOps.boilerplateRemove(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 3L, "hello\nmenu\nhello"),
      (2L, 3L, 2L, "menu\nbody two"),
      (3L, 2L, 1L, "body three"),
      (4L, 1L, 1L, "all original")))
    // every line struck -> doc still present with empty text_kept
    val docs2 = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val got2 = TextOps.boilerplateRemove(docs2, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got2 == Seq((1L, 1L, 0L, ""), (2L, 1L, 0L, ""), (3L, 1L, 0L, "")))
  }

  test("ngramLmScores: hand-checked counts and backoff on a tiny corpus") {
    import spark.implicits._
    // train = even ids. Model: doc 0 "a b a b", doc 2 "a c".
    //   c1: a=3, b=2, c=1; T=6
    //   c12: (a,b)=2, (b,a)=1, (a,c)=1
    val docs = Seq(
      (0L, "a b a b"),
      (2L, "a c"),
      (1L, "a b z"), // (a,b) seen; (b,z) backoff with z unseen (c2 -> 0.5)
      (3L, "q"), //    single word -> no bigrams
      (5L, "")).toDF("doc_id", "text")
    val got = TextOps.ngramLmScores(docs, docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq

    def fp(lp: Double): Long = math.floor(lp * 1e6).toLong
    val lpAB = StrictMath.log(2.0 / 3.0) // c12(a,b)/c1(a)
    val lpBA = StrictMath.log(1.0 / 2.0)
    val lpAC = StrictMath.log(1.0 / 3.0)
    val lpBZ = StrictMath.log(0.4) + StrictMath.log(0.5 / 6.0)
    val exp = Seq(
      (0L, 3L, 0L, fp(lpAB) + fp(lpBA) + fp(lpAB)),
      (1L, 2L, 1L, fp(lpAB) + fp(lpBZ)),
      (2L, 1L, 0L, fp(lpAC)),
      (3L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L))
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == exp)
    assert(got.map(_._5) == exp.map { case (_, n, _, s) =>
      if (n > 0) Some(s.toDouble / 1e6 / n.toDouble) else None })
  }

  test("ngramLmScores == Golden.ngramLmG on a mixed corpus (cross-engine bit parity)") {
    import spark.implicits._
    val corpus: Array[(Long, String)] = (0L until 40L).toArray.map { i =>
      val ws = (0 to (i % 7).toInt).map(k => s"w${(i * 31 + k * 17) % 23}") ++
        // odd docs carry a token the even-id train slice never sees, so the
        // unseen-unigram backoff arm (c2 -> 0.5) is exercised as well as the
        // seen-unigram backoff arm
        (if (i % 2 == 1) Seq(s"u$i") else Seq.empty)
      (i, ws.mkString(" "))
    }
    val df = corpus.toSeq.toDF("doc_id", "text")
    val engine = TextOps.ngramLmScores(df, df.where(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    val golden = graft.oracle.Golden.ngramLmG(corpus)
    assert(engine == golden)
    assert(engine.exists(_._3 > 0), "fixture must exercise the backoff path")
  }

  test("mergeNgramModels: split-trained merge scores == whole-trained scores") {
    import spark.implicits._
    val corpus = (0L until 30L).map { i =>
      (i, (0 to (i % 5).toInt).map(k => s"t${(i * 13 + k * 7) % 11}").mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val whole = TextOps.ngramLmScores(df, df.where(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    val merged = TextOps.mergeNgramModels(Seq(
      TextOps.ngramLmModel(df.where(col("doc_id") % 4 === 0), "text"),
      TextOps.ngramLmModel(df.where(col("doc_id") % 4 === 2), "text")))
    val got = TextOps.scoreWithNgramModel(df, "doc_id", "text", merged)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == whole)
    // loud empty-merge contract
    intercept[IllegalArgumentException] {
      TextOps.mergeNgramModels(Seq.empty)
    }
    // loud empty-MODEL contract (an empty train slice would otherwise
    // coalesce into plausible all-zero scores)
    intercept[IllegalArgumentException] {
      TextOps.scoreWithNgramModel(df, "doc_id", "text",
        TextOps.ngramLmModel(df.where(lit(false)), "text"))
    }
  }

  test("aspectBucket: hand vectors, exact-ratio hits, first-bucket tie-break") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1024L, 1024L), // exact 1:1
      (2L, 1920L, 1080L), // exact 16:9
      (3L, 768L, 512L), //   exact 3:2
      (4L, 512L, 768L), //   exact 2:3
      (5L, 2100L, 900L), //  exact 21:9
      (6L, 1000L, 1010L), // near-square -> 1:1
      (7L, 1300L, 1000L)) // 1.30: closest of the list is 4:3 (1.333)
      .toDF("image_id", "w", "h")
    val got = Media.aspectBucket(rows, "w", "h")
      .select("image_id", "bucket").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "1:1", 2L -> "16:9", 3L -> "3:2", 4L -> "2:3",
      5L -> "21:9", 6L -> "1:1", 7L -> "4:3"))

    // tie: w/h exactly midway between 1:1 and 4:3 -> 7/6: |7/6-1|=1/6,
    // |7/6-4/3|=1/6 -> first bucket in list order ("1:1") wins
    val tie = Seq((9L, 7L, 6L)).toDF("image_id", "w", "h")
    val gotTie = Media.aspectBucket(tie, "w", "h")
      .select("bucket").as[String].collect().head
    assert(gotTie == "1:1")

    // composes with sampleExact: cap 2 per bucket keeps the lowest md5 draws
    val many = (1L to 50L).map(i => (i, 100L + i, 100L)).toDF("image_id", "w", "h")
    val capped = Sampling.sampleExact(
      Media.aspectBucket(many, "w", "h"), "image_id", "bucket", 2)
    val perBucket = capped.groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(perBucket.values.forall(_ <= 2))
  }

  test("hashedTfIdf == Golden.tfidfG (cross-engine bit parity) + hand checks") {
    import spark.implicits._
    val corpus: Array[(Long, String)] = Array(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, ""), //                        token-less doc must survive
      (4L, "apple apple apple"),
      (5L, "unique words only here"))
    val df = corpus.toSeq.toDF("doc_id", "text")
    val engine = TextOps.hashedTfIdf(df, "doc_id", "text")
      .select(col("doc_id"), col("nnz"), col("norm"),
        posexplode_outer(arrays_zip(col("buckets"), col("weights"))))
      .select(col("doc_id"), col("nnz"), col("norm"), col("pos"),
        col("col.buckets").as("bucket"), col("col.weights").as("weight"))
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Double, Option[Int], Option[String], Option[Double])]
      .collect().toSeq
    val golden = graft.oracle.Golden.tfidfG(corpus)
    assert(engine == golden)
    // hand: doc 3 survives empty; doc 4 has one bucket; weights L2-normalize
    assert(engine.filter(_._1 == 3L) == Seq((3L, 0L, 0.0, None, None, None)))
    assert(engine.count(_._1 == 4L) == 1)
    val d1norm = engine.filter(_._1 == 1L).flatMap(_._6).map(w => w * w).sum
    assert(math.abs(d1norm - 1.0) < 1e-12, s"L2 norm of weights must be 1, got $d1norm")
  }

  test("splitByGroupHash: group-atomic assignment, full coverage, SQL mirror") {
    import spark.implicits._
    val fracs = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val rows = (1L to 400L).map(i => (i, i % 40)).toDF("id", "grp")
    val got = Sampling.splitByGroupHash(rows, "grp", fracs)
      .select("grp", "split").as[(Long, String)].collect().toSeq
    // every member of a group lands in the SAME split
    assert(got.groupBy(_._1).forall { case (_, xs) => xs.map(_._2).distinct.size == 1 })
    // total assignment, only declared names
    assert(got.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    assert(got.size == 400)
    // the big split dominates on 40 groups
    val byName = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byName.getOrElse("train", 0) > byName.getOrElse("val", 0))
    // SQL mirror carries the SAME cumulative thresholds
    val sql = Sampling.splitByGroupHashSql("grp", fracs)
    assert(sql.contains(Sampling.thresholdHex(0.8)) &&
      sql.contains(Sampling.thresholdHex(0.9)) && sql.endsWith("ELSE 'test' END"))
    // degenerate one-split case assigns everything to it
    val one = Sampling.splitByGroupHash(rows, "grp", Seq(("all", 1.0)))
      .select("split").distinct().as[String].collect().toSeq
    assert(one == Seq("all"))
    // non-positive fractions fail loudly (non-monotonic thresholds would
    // silently starve a split)
    intercept[IllegalArgumentException] {
      Sampling.splitByGroupHash(rows, "grp",
        Seq(("a", 0.5), ("b", -0.2), ("c", 0.7)))
    }
  }

  test("stripHtml: tags out, entities single-pass decoded, whitespace collapsed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<p>Hello  <b>world</b></p>"),
      (2L, "a &amp;lt; b &lt;tag&gt; &quot;q&quot; &#39;s &amp; done"),
      (3L, "plain text, no markup"),
      (4L, "<a href=\"#x\">link</a>\n\t<br/>end")).toDF("doc_id", "text")
    val got = TextOps.stripHtml(docs, "text")
      .select("doc_id", "n_tags", "text_plain")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, "Hello world"),
      // &amp;lt; decodes ONCE to the literal text "&lt;" (single-pass);
      // &lt;tag&gt; decodes to literal <tag> TEXT (tags were already
      // stripped before entity decode, so it is not markup)
      (2L, 0L, "a &lt; b <tag> \"q\" 's & done"),
      (3L, 0L, "plain text, no markup"),
      (4L, 3L, "link end")))
  }

  test("qualityOfPixels: flat image scores zero entropy/contrast; kernel hand checks") {
    // constant mid-gray: every pixel lum = 128 -> one occupied bin
    val flat = Array.fill(4 * 4 * 3)(128.toByte)
    val (n, ls, lq, ent, con) = Media.qualityOfPixels(flat)
    assert(n == 16L && ls == 16L * 128 && lq == 16L * 128 * 128)
    assert(ent == 0.0 && con == 0.0)
    // half black / half white: two equi-probable bins -> entropy exactly 1
    // bit; lum 0 and 255 -> contrast 127.5
    val twoTone = Array.tabulate(8 * 3)(i => if (i < 4 * 3) 0.toByte else 255.toByte)
    val (_, _, _, e2, c2) = Media.qualityOfPixels(twoTone)
    assert(math.abs(e2 - 1.0) < 1e-12)
    assert(math.abs(c2 - 127.5) < 1e-9)
  }

  test("imageQuality plumbing == shared kernel over the decoded payload") {
    import spark.implicits._
    val ids = Seq(5L, 7L, 16L, 23L) // mix of 8x8/16x16 and png/jpeg
    val df = Media.withPayload(ids.toDF("image_id"))
    val got = Media.imageQuality(df, minEntropy = 3.9)
      .select("image_id", "n_px", "lum_sum", "lum_sq", "entropy", "contrast", "keep")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)]
      .collect().sortBy(_._1).toSeq
    val want = ids.sorted.map { id =>
      val (_, _, _, px) = Media.decode(Media.encode(id))
      val (n, ls, lq, e, c) = Media.qualityOfPixels(px)
      (id, n, ls, lq, e, c, e >= 3.9)
    }
    assert(got == want)
  }

  test("cropPlan: maximal exact-ratio centered crops (hand vectors)") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1920L, 1080L), // 16:9 exact -> full frame, no offsets
      (2L, 1000L, 1000L), // 1:1 exact
      (3L, 1300L, 1000L)) // bucket 4:3: k=min(1300/4,1000/3)=325 -> 1300x975, oy=12
      .toDF("image_id", "w", "h")
    val got = Media.cropPlan(Media.aspectBucket(rows, "w", "h"), "w", "h")
      .select("image_id", "bucket", "cw", "ch", "ox", "oy")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, "16:9", 1920L, 1080L, 0L, 0L)))
    assert(got(2L) == ((2L, "1:1", 1000L, 1000L, 0L, 0L)))
    assert(got(3L) == ((3L, "4:3", 1300L, 975L, 0L, 12L)))
    // crops always fit and carry exactly the bucket ratio
    val all = Media.cropPlan(Media.aspectBucket(
        (1L to 200L).map(i => (i, 256L + i * 7 % 1792, 256L + i * 11 % 1792))
          .toDF("image_id", "w", "h"), "w", "h"), "w", "h")
      .select("bucket", "w", "h", "cw", "ch", "ox", "oy")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val ratio = Media.AspectBuckets.map(b => b._1 -> (b._2.toLong, b._3.toLong)).toMap
    all.foreach { case (b, w, h, cw, ch, ox, oy) =>
      val (bn, bd) = ratio(b)
      assert(cw * bd == ch * bn, s"crop not on ratio $b: ${cw}x$ch")
      assert(cw <= w && ch <= h && ox >= 0 && oy >= 0 &&
        ox + cw <= w && oy + ch <= h)
    }
  }

  test("editDistanceRefine keeps only within-distance candidate pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox!"), // dist 1 from 1
      (3L, "a completely different document"),
      (4L, "the quick brown cat")) // dist 3 from 1, 4 from 2
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L)).toDF("id_a", "id_b")
    val got = graft.ops.Dedup.editDistanceRefine(pairs, docs, "doc_id", "text", 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 4L, 3L)))
  }

  test("blocklistFilter: whole-token matches only, kept iff zero hits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "a bad word appears"),
      (3L, "bad bad badly"), //   "badly" is NOT a whole-token match
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.blocklistFilter(docs, "text", Seq("bad", "worse"))
      .select("doc_id", "n_blocked", "kept")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 0L, true), (2L, 1L, false), (3L, 2L, false),
      (4L, 0L, true)))
  }

  test("phashDecontaminate drops corpus rows within hamming of any benchmark hash") {
    import spark.implicits._
    val corpus = Seq(
      (1L, 0x0L), //          == bench hash -> dropped
      (2L, 0x3L), //          hamming 2 from bench 0x0 -> dropped
      (3L, 0xFFL), //         hamming 8 -> kept
      (4L, 0xF0L), //         hamming 4 from 0x0, 5 from the other -> kept
      (5L, 0x8000000000000001L)) // hamming 2 from bench(5) below -> dropped
      .toDF("image_id", "ph")
    val bench = Seq((100L, 0x0L), (101L, 0x8000000000000000L)).toDF("image_id", "ph")
    val got = graft.ops.Dedup.phashDecontaminate(corpus, bench, "image_id", "ph")
      .select("image_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 4L))
  }

  test("new ops are partition-invariant (repartition(7) changes nothing)") {
    import spark.implicits._
    val docs = (0L until 25L).map { i =>
      (i, (0 to (i % 6).toInt).map(k => s"w${(i * 7 + k * 3) % 9}").mkString(" "))
    }.toDF("doc_id", "text")
    val docs7 = docs.repartition(7)
    def run(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = Seq(
      TextOps.boilerplateRemove(d, "doc_id", "text", 3)
        .orderBy("doc_id").collect().map(_.toString).toSeq,
      TextOps.hashedTfIdf(d, "doc_id", "text")
        .orderBy("doc_id").drop("buckets", "weights").collect().map(_.toString).toSeq,
      TextOps.ngramLmScores(d, d.where(col("doc_id") % 2 === 0), "doc_id", "text")
        .orderBy("doc_id").collect().map(_.toString).toSeq)
    assert(run(docs) == run(docs7))
  }

  test("aspectBucketSql mirrors the when-chain (spot formula check)") {
    val sql = Media.aspectBucketSql("w", "h")
    assert(sql.contains("ABS(CAST(w AS BIGINT) * 3 - CAST(h AS BIGINT) * 4) / CAST(3 AS DOUBLE)"))
    assert(sql.startsWith("CASE WHEN") && sql.endsWith("END"))
    assert(Media.AspectBuckets.map(_._1).forall(n => sql.contains(s"'$n'")))
  }
}
