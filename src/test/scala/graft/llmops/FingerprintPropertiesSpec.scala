package graft.llmops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the fingerprint expressions over random corpora:
  * native-vs-reference bit identity (the invariant the driver gate checks
  * on real data via `llm_native_consistency`), banding exactness
  * (pigeonhole), and redaction idempotence. Random docs are batched into
  * one DataFrame per property — one Spark job, hundreds of samples.
  */
class FingerprintPropertiesSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Deterministic scalacheck sampling (scalatestplus isn't in the offline
    * dependency cache, so Gens are driven manually with a fixed seed).
    */
  private def sample[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(271828L)
    (1 to n).map { _ =>
      val a = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  private val tokenGen: Gen[String] =
    Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.oneOf("the", "fox", "über", "łódź", "東京", "a1-b", "#", "+49", "x@y.io")
    )

  private val docGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString(" "))

  private lazy val corpus =
    sample(docGen, 300).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("property: simhash64, simhash56Md5 and shingles native expressions match their references") {
    val mismatches = corpus
      .select(
        (Fingerprints.simhash64(col("text")) === Fingerprints.simhash64Hof(col("text"))).as("a"),
        (Fingerprints.simhash56Md5(col("text")) === Fingerprints.simhash56Md5Hof(col("text"))).as("b"),
        (Fingerprints.shingles(col("text"), 3) === Fingerprints.shinglesHof(col("text"), 3)).as("c"),
        (Fingerprints.shingles(col("text"), 5) === Fingerprints.shinglesHof(col("text"), 5)).as("d")
      )
      .filter(!col("a") || !col("b") || !col("c") || !col("d"))
      .count()
    assert(mismatches == 0L)
  }

  test("property: simhash56Md5 stays within 56 bits for arbitrary text") {
    val bad = corpus
      .select(Fingerprints.simhash56Md5(col("text")).as("s"))
      .filter(col("s") < 0L || col("s") >= lit(1L << 56))
      .count()
    assert(bad == 0L)
  }

  test("property: normalizeText is idempotent and canonical-form stable") {
    val out = corpus
      .select(
        TextStats.normalizeText(col("text")).as("n1"),
        TextStats.normalizeText(TextStats.normalizeText(col("text"))).as("n2")
      )
    assert(out.filter(col("n1") =!= col("n2")).count() == 0L)
    // canonical form never contains uppercase, punctuation or double spaces
    assert(out.filter(col("n1").rlike("[^a-z0-9 ]|  ")).count() == 0L)
  }

  test("property: packSequences tiles each shard's token stream exactly (random sizes/budgets)") {
    val sizesGen = Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 700L)))
    sample(Gen.zip(sizesGen, Gen.chooseNum(16, 1024)), 12).foreach { case (sizes, budget) =>
      val df = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n_tokens")
      val packed = Corpus
        .packSequences(df, "doc_id", "n_tokens", budgetTokens = budget, shards = 3)
        .select("shard", "doc_id", "n_tokens", "seq_id", "seq_offset", "n_seqs")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect()
      assert(packed.length == sizes.length)
      packed.groupBy(_._1).values.foreach { shardRows =>
        var cum = 0L
        shardRows.sortBy(_._2).foreach { case (_, _, n, seqId, off, nSeqs) =>
          assert(seqId * budget + off == cum, s"gap/overlap at budget=$budget")
          assert(nSeqs == (cum + n - 1) / budget - cum / budget + 1)
          cum += n
        }
      }
    }
  }

  test("property: decontaminate survivors shrink monotonically as minShared drops") {
    val half = corpus.filter(col("doc_id") < 150)
    val held = corpus.filter(col("doc_id") >= 150)
    val counts = Seq(1, 2, 4).map { m =>
      Dedup.decontaminate(half, held, "doc_id", "text", k = 3, minShared = m).count()
    }
    assert(counts == counts.sorted) // stricter threshold keeps more docs
    // an empty held-out set never drops anything
    val none = Dedup.decontaminate(half, held.filter(lit(false)), "doc_id", "text", k = 3, minShared = 1)
    assert(none.count() == half.count())
  }

  test("property: simhash banding finds exactly the brute-force Hamming ball") {
    val banded = Dedup
      .simhashNearDupPairs(corpus, "doc_id", "text", bands = 4, maxHamming = 3,
        simFn = Fingerprints.simhash56Md5, simBits = 56)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .sorted
    val sims = corpus
      .select(col("doc_id"), Fingerprints.simhash56Md5(col("text")).as("s"))
      .as[(Long, Long)]
      .collect()
      .toMap
    val brute = (for {
      a <- sims.keys; b <- sims.keys
      if a < b && java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
    } yield (a, b)).toSeq.sorted
    assert(banded.toSeq == brute)
  }

  test("property: c4CleanLines' regex equals the line-by-line model on random pages") {
    // random line structure: tokens (some punctuation-terminated, some page
    // flags), joined by single or occasionally double spaces, lines joined
    // by newlines — exercises the word-count rule, the terminal-punct rule,
    // the double-space corner (breaks the \S+-chain), and the page flags
    val wordGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.oneOf("fox.", "run!", "ok?", "say\"", "x.", ".", "!", "mid.dle", "{", "JavaScript", "lorem", "ipsum")
    )
    val lineGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 9)
      ws <- Gen.listOfN(n, wordGen)
      doubled <- Gen.prob(0.15)
    } yield ws.mkString(if (doubled) "  " else " ")
    val pageGen: Gen[String] =
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))

    val punct = Set('.', '!', '?', '"')
    def modelKeep(line: String): Boolean = {
      val parts = line.split(" ", -1)
      parts.length >= 5 && parts.forall(_.nonEmpty) &&
      parts.last.length >= 2 && punct(parts.last.last)
    }
    val pages = sample(pageGen, 250).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val expected = pages.map { case (id, t) =>
      val kept = t.split("\n", -1).filter(modelKeep)
      val low = t.toLowerCase
      id -> (
        (
          kept.length.toLong,
          kept.mkString("\n"),
          kept.length >= 3 && !low.contains("javascript") && !t.contains("{") && !low.contains("lorem ipsum")
        )
      )
    }.toMap
    val got = TextStats
      .c4CleanLines(pages.toDF("doc_id", "text"))
      .select("doc_id", "n_kept", "clean_text", "keep")
      .as[(Long, Long, String, Boolean)]
      .collect()
    assert(got.length == expected.size)
    got.foreach { case (id, nk, ct, keep) =>
      val (enk, ect, ekeep) = expected(id)
      assert(nk == enk && ct == ect && keep == ekeep, s"doc $id: got ($nk, $keep, '$ct'), want ($enk, $ekeep, '$ect')")
    }
  }

  test("property: redactPii is idempotent (tags never re-match any pattern)") {
    val piiGen: Gen[String] = Gen.oneOf(
      "mail me at first.last@example.com today",
      "ping 192.168.0.1 and 10.0.0.255 please",
      "call +1 (212) 555-0187 or 030 1234567 now",
      "mixed a@b.io 8.8.8.8 +44 20 7946 0958 end"
    )
    val docs = (sample(docGen, 100) ++ sample(piiGen, 20)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = TextStats.redactPii(col("text"))
    val diff = docs
      .select(once.as("r1"), TextStats.redactPii(once).as("r2"))
      .filter(col("r1") =!= col("r2"))
      .count()
    assert(diff == 0L)
  }
}
