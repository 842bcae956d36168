package graft.llmops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Selection-family coverage: DSIR importance scores and the NB quality
  * classifier are checked against INDEPENDENT plain-Scala references
  * (same discipline as BpeSpec) — the reference reimplements the math
  * from the papers' formulas with java.security MD5, sharing no code
  * with the Spark operators. winnowPairs and centroidAffinity are
  * checked on planted fixtures with hand-derived expectations.
  */
class SelectionSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def flog2(c: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(c)

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x")
      .mkString

  private def bucketOf(f: String, buckets: Int): Long =
    java.lang.Long.parseLong(md5hex(f).take(7), 16) % buckets

  // Target docs (first two) share English-ish filler; off-target docs a
  // disjoint vocabulary — so bucket distributions genuinely differ.
  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat", true),
    (2L, "the dog sat on the rug", true),
    (3L, "zzq qqx vvk zzq qqx", false),
    (4L, "vvk qqx zzq vvk qqx", false),
    (5L, "the cat sat on the mat", false) // target-identical text, raw label
  ).toDF("doc_id", "text", "is_tgt")

  /** Plain-Scala DSIR reference: hashed unigram+bigram buckets, quantized
    * floor-log2 LLR per bucket, summed per doc.
    */
  private def dsirReference(
      docs: Seq[(Long, String, Boolean)],
      buckets: Int
  ): Map[Long, (Long, Long)] = {
    def feats(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val occ = docs.flatMap { case (id, text, tgt) => feats(text).map(f => (id, tgt, bucketOf(f, buckets))) }
    val craw = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ctgt = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nraw = occ.size.toLong
    val ntgt = occ.count(_._2).toLong
    def qlr(b: Long): Long =
      (flog2(ctgt.getOrElse(b, 0L) + 1) - flog2(ntgt + buckets)) -
        (flog2(craw(b) + 1) - flog2(nraw + buckets))
    occ.groupBy(_._1).map { case (id, os) => id -> (os.size.toLong, os.map(o => qlr(o._3)).sum) }
  }

  test("dsirScores matches the plain-Scala reference exactly") {
    val got = Selection
      .dsirScores(corpus, col("is_tgt"), buckets = 256)
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    val want = dsirReference(
      Seq(
        (1L, "the cat sat on the mat", true),
        (2L, "the dog sat on the rug", true),
        (3L, "zzq qqx vvk zzq qqx", false),
        (4L, "vvk qqx zzq vvk qqx", false),
        (5L, "the cat sat on the mat", false)
      ),
      buckets = 256
    )
    assert(got == want)
  }

  test("dsirScores: target-vocabulary docs outscore off-target docs; identical text, identical score") {
    val got = Selection
      .dsirScores(corpus, col("is_tgt"), buckets = 256)
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    // doc 5 has the exact text of target doc 1: same features, same score —
    // scoring depends on content, not on the label of the row being scored.
    assert(got(5L) == got(1L))
    // target-like docs strictly outscore the disjoint-vocabulary docs
    assert(math.min(got(1L), got(2L)) > math.max(got(3L), got(4L)))
  }

  /** Plain-Scala NB reference (multinomial, Laplace-smoothed, quantized). */
  private def nbReference(
      docs: Seq[(Long, String, Boolean)]
  ): Map[Long, (Long, Long, Boolean)] = {
    val occ = docs.flatMap { case (id, text, pos) => text.split(" ", -1).toSeq.map(t => (id, pos, t)) }
    val cpos = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cneg = occ.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tpos = occ.count(_._2).toLong
    val tneg = occ.count(!_._2).toLong
    val v = occ.map(_._3).distinct.size.toLong
    def w(t: String): Long =
      (flog2(cpos.getOrElse(t, 0L) + 1) - flog2(tpos + v)) -
        (flog2(cneg.getOrElse(t, 0L) + 1) - flog2(tneg + v))
    val prior = flog2(docs.count(_._3).toLong + 1) - flog2(docs.count(!_._3).toLong + 1)
    docs.map { case (id, text, _) =>
      val toks = text.split(" ", -1).toSeq
      val s = prior + toks.map(w).sum
      id -> (toks.size.toLong, s, s > 0)
    }.toMap
  }

  test("nbQualityScores matches the plain-Scala reference and separates the classes") {
    // class-conditional counts must clear a power-of-2 boundary for the
    // quantized (floor-log2) weights to see them — repetition does that
    val fixture = Seq(
      (1L, "good good good clean clean prose prose with structure", true),
      (2L, "good good clean prose prose with with words", true),
      (3L, "spam spam buy now spam spam buy", false),
      (4L, "buy now buy now spam buy now", false),
      (5L, "good clean prose with words", false) // positive-looking raw doc
    )
    val got = Selection
      .nbQualityScores(fixture.toDF("doc_id", "text", "is_pos"), col("is_pos"))
      .select("doc_id", "n_tokens", "nb_score", "nb_positive")
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .map(r => r._1 -> (r._2, r._3, r._4))
      .toMap
    val want = nbReference(fixture)
    assert(got == want)
    // the classifier generalizes: doc 5 carries positive-class vocabulary
    // despite its negative label, and must be flagged positive
    assert(got(5L)._3, "positive-vocabulary raw doc should classify positive")
    assert(!got(3L)._3 && !got(4L)._3, "spam docs should classify negative")
  }

  test("nbScoreAgainst scores unseen batch tokens with the OOV weight and known tokens with trained weights") {
    val corpus = Seq(
      (1L, "good good good clean clean prose prose with structure", true),
      (2L, "good good clean prose prose with with words", true),
      (3L, "spam spam buy now spam spam buy", false),
      (4L, "buy now buy now spam buy now", false)
    ).toDF("doc_id", "text", "is_pos")
    val batch = Seq(
      (10L, "good clean prose"),     // all known, positive vocabulary
      (11L, "spam buy now"),         // all known, negative vocabulary
      (12L, "novelA novelB novelC")  // all OOV
    ).toDF("doc_id", "text")
    val got = Selection
      .nbScoreAgainst(corpus, batch, col("is_pos"))
      .select("doc_id", "n_tokens", "n_oov", "nb_score", "nb_positive")
      .as[(Long, Long, Long, Long, Boolean)]
      .collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5))
      .toMap
    // plain-Scala constants: tpos=17, tneg=14, V=9 -> oovW = flog2(23)-flog2(26) = 4-4 = 0;
    // prior = flog2(3)-flog2(3) = 0
    val oovW = flog2(14 + 9) - flog2(17 + 9)
    val prior = 0L
    assert(got(10L)._2 == 0L && got(10L)._4, "known positive-vocab batch doc classifies positive")
    assert(got(11L)._2 == 0L && !got(11L)._4, "known negative-vocab batch doc classifies negative")
    assert(got(12L) == ((3L, 3L, prior + 3 * oovW, prior + 3 * oovW > 0)), "all-OOV doc scores n·oovW + prior")
  }

  test("nbFitMulti/nbScoreMulti match the plain-Scala multiclass reference (incl. OOV and tie-break)") {
    // class a dominates x STRONGLY (7 of 8 occurrences): the flog2
    // quantization is coarse (a 3:1 count edge can vanish into the same
    // integer bucket), so the separation fixture needs a decisive margin
    val train = Seq(
      (1L, "a", Seq("x", "x", "x", "x", "x", "x", "x", "y")),
      (2L, "a", Seq("x", "z")),
      (3L, "b", Seq("y", "y")),
      (4L, "b", Seq("y", "z", "z")),
      (5L, "c", Seq("w", "w", "x"))
    ).toDF("doc_id", "lab", "feats")
    val batch = Seq(
      (10L, Seq("x", "x", "q")), // q is OOV
      (11L, Seq("y", "z")),
      (12L, Seq("w")),
      (13L, Seq("q1", "q2")) // all OOV: priors + OOV mass decide
    ).toDF("doc_id", "feats")
    val model = Selection.nbFitMulti(train, "lab", col("feats"))
    val got = Selection
      .nbScoreMulti(batch, model, "doc_id", col("feats"))
      .select("doc_id", "nb_lang", "nb_score", "n_feats")
      .as[(Long, String, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3, r._4))
      .toMap

    // plain-Scala reference, reimplemented from the formulas
    val trainRows = Seq(
      ("a", Seq("x", "x", "x", "x", "x", "x", "x", "y")), ("a", Seq("x", "z")),
      ("b", Seq("y", "y")), ("b", Seq("y", "z", "z")),
      ("c", Seq("w", "w", "x"))
    )
    val occ = trainRows.flatMap { case (l, fs) => fs.map(l -> _) }
    val labs = trainRows.map(_._1).distinct.sorted
    val vocab = occ.map(_._2).distinct
    val v = vocab.size.toLong
    val tC = labs.map(l => l -> occ.count(_._1 == l).toLong).toMap
    val nC = labs.map(l => l -> trainRows.count(_._1 == l).toLong).toMap
    def w(f: String, l: String): Long =
      flog2(occ.count(o => o._1 == l && o._2 == f).toLong + 1L) - flog2(tC(l) + v)
    def score(fs: Seq[String], l: String): Long = {
      val inv = fs.filter(vocab.contains)
      flog2(nC(l) + 1L) + inv.map(w(_, l)).sum + (fs.size - inv.size) * (0L - flog2(tC(l) + v))
    }
    def predict(fs: Seq[String]): (String, Long, Long) = {
      val best = labs.map(l => (l, score(fs, l))).minBy { case (l, s) => (-s, l) }
      (best._1, best._2, fs.size.toLong)
    }
    val batches = Map(
      10L -> Seq("x", "x", "q"), 11L -> Seq("y", "z"),
      12L -> Seq("w"), 13L -> Seq("q1", "q2"))
    batches.foreach { case (id, fs) =>
      assert(got(id) == predict(fs), s"doc $id: got ${got(id)} want ${predict(fs)}")
    }
    // non-vacuous: the three in-vocab docs separate into three classes
    assert(Seq(10L, 11L, 12L).map(got(_)._1) == Seq("a", "b", "c"))
    model.release()
  }

  test("llm_lang_id_ledger: the char-trigram NB beats the stopword baseline on the held-out slice") {
    // the driver-verified ledger (sf0.001): NB should be at/near perfect —
    // suffix trigrams are near-perfect class evidence — while the stopword
    // argmax is capped at the share of 'en' docs (only bare English
    // function words survive the fixture transform)
    val led = graft.SparkEntry
      .queries("llm_lang_id_ledger")(spark, "/root/testdata/sf0.001")
      .select("n", "nb_correct", "stop_correct")
      .as[(Long, Long, Long)]
      .head()
    assert(led._2 > led._3, s"NB must beat the baseline: $led")
    assert(led._2 >= (led._1 * 9) / 10, s"NB should be near-perfect on the fixture: $led")
    assert(led._3 > 0, s"baseline must not be degenerate (some 'en' docs detected): $led")
  }

  test("winnowPairs detects a planted excerpt with full coverage and honors the guarantee length") {
    // doc 11 = 12-token excerpt of doc 10; doc 12 shares a run of exactly
    // w+k-1 = 6 tokens with doc 10 (guaranteed >= 1 shared fingerprint);
    // doc 13 is disjoint.
    val docs = Seq(
      (10L, "a b c d e f g h i j k l m n o p q r"),
      (11L, "a b c d e f g h i j k l"),
      (12L, "x y z w f g h i j k zz yy xx"),
      (13L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10")
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .winnowPairs(docs, "doc_id", "text", k = 3, w = 4, tau = 0.0, maxDf = 0)
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(p => (p._1, p._2) -> (p._3, p._4))
      .toMap
    // excerpt: every fingerprint of 11 comes from the shared prefix run
    assert(pairs((11L, 10L))._2 == 1.0, "excerpt coverage must be 1.0")
    // 6-token shared run: the winnowing guarantee fires
    assert(pairs((12L, 10L))._1 >= 1L, "w+k-1 shared run must share a fingerprint")
    // disjoint doc pairs never appear
    assert(!pairs.keySet.exists { case (a, b) => a == 13L || b == 13L })
  }

  test("winnowPairs maxDf drops boilerplate-hot fingerprints from the join") {
    // the same 6-token run planted in 5 docs: fp df = 5 > maxDf = 3 — all
    // cross pairs from that run must vanish under the cap
    val docs = (1L to 5L)
      .map(i => (i, s"u$i v$i common1 common2 common3 common4 common5 common6 t$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(docs, "doc_id", "text", k = 3, w = 4, tau = 0.0, maxDf = 3)
    val uncapped = Dedup.winnowPairs(docs, "doc_id", "text", k = 3, w = 4, tau = 0.0, maxDf = 0)
    assert(uncapped.count() > 0, "shared run must pair without the cap")
    assert(capped.count() == 0, "df-capped join must drop the boilerplate fingerprints")
  }

  /** Deterministic scalacheck sampling (the FingerprintPropertiesSpec
    * idiom — scalatestplus isn't in the offline cache).
    */
  private def sampleGen[A](gen: org.scalacheck.Gen[A], n: Int): Seq[A] = {
    var seed = org.scalacheck.rng.Seed(314159L)
    (1 to n).map { _ =>
      val a = gen.pureApply(org.scalacheck.Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  private lazy val randomLabeledCorpus: Seq[(Long, String, Boolean)] = {
    import org.scalacheck.Gen
    val tokenGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.oneOf("the", "of", "fox", "über", "東京", "x@y.io", "#", "九州")
    )
    val docGen: Gen[(String, Boolean)] = for {
      n <- Gen.chooseNum(0, 25)
      toks <- Gen.listOfN(n, tokenGen)
      label <- Gen.oneOf(true, false)
    } yield (toks.mkString(" "), label)
    sampleGen(docGen, 250).zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
  }

  test("property: dsirScores matches the plain-Scala reference on random labeled corpora") {
    val df = randomLabeledCorpus.toDF("doc_id", "text", "is_tgt")
    val got = Selection
      .dsirScores(df, col("is_tgt"), buckets = 64)
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    val want = dsirReference(randomLabeledCorpus, buckets = 64)
    assert(got == want)
  }

  test("property: nbQualityScores matches the plain-Scala reference on random labeled corpora") {
    val df = randomLabeledCorpus.toDF("doc_id", "text", "is_pos")
    val got = Selection
      .nbQualityScores(df, col("is_pos"))
      .select("doc_id", "n_tokens", "nb_score", "nb_positive")
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .map(r => r._1 -> (r._2, r._3, r._4))
      .toMap
    val want = nbReference(randomLabeledCorpus)
    assert(got == want)
  }

  test("centroidAffinity scores direction-aligned vectors at 1 and orthogonal at 0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), true),
      (2L, Array(0.5f, 0.0f, 0.0f), true),  // same direction, different scale
      (3L, Array(0.0f, 1.0f, 0.0f), false), // orthogonal
      (4L, Array(-1.0f, 0.0f, 0.0f), false), // anti-aligned
      (5L, Array(0.0f, 0.0f, 0.0f), false)  // zero vector -> affinity 0
    ).toDF("vec_id", "embedding", "is_q")
    val got = Embeddings
      .centroidAffinity(vecs, col("is_q"), "vec_id", "embedding")
      .select("vec_id", "dot_c", "affinity")
      .as[(Long, Long, Double)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    // centroid sum = (254, 0, 0): quantized (127,0,0) + (127,0,0)
    assert(got(1L) == ((127L * 254L, 1.0)))
    assert(got(2L)._2 == 1.0) // cosine is scale-invariant
    assert(got(3L) == ((0L, 0.0)))
    assert(got(4L)._2 == -1.0)
    assert(got(5L) == ((0L, 0.0)))
  }
}
