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
