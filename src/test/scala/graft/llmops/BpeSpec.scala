package graft.llmops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE learning/encoding against an independent plain-Scala reference
  * implementation of Sennrich et al. 2016 (greedy leftmost fold, count
  * desc / left asc / right asc tie-break) — the same semantics the DuckDB
  * oracle replays, but derived here a third way so a shared bug in the
  * two SQL engines' replication can't hide.
  */
class BpeSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val Eow = "</w>"

  // ---- plain-Scala reference BPE ------------------------------------

  private def refSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** Greedy leftmost non-overlapping single-scan merge. */
  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.tail.foldLeft(Vector(syms.head)) { (acc, x) =>
      if (acc.last == l && x == r) acc.init :+ (l + r) else acc :+ x
    }

  private def refLearn(
      corpus: Seq[String],
      numMerges: Int
  ): (Seq[(Int, String, String)], Map[String, Vector[String]]) = {
    val freqs = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    var words: Map[String, (Long, Vector[String])] =
      freqs.map { case (w, f) => w -> (f, refSymbols(w)) }
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.values.foreach { case (f, syms) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _         => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((step + 1, l, r))
        words = words.map { case (w, (f, syms)) => w -> (f, refApply(syms, l, r)) }
        step += 1
      }
    }
    (merges.toSeq, words.map { case (w, (_, syms)) => w -> syms })
  }

  // ---- fixtures ------------------------------------------------------

  /** Edge-case-dense corpus: identical-symbol runs (odd + even), an
    * immediately-repeated pair (abab), tie candidates, single-char words,
    * and enough repetition for stable frequency ordering.
    */
  private val corpus = Seq(
    "aaaaa abab the the the cat",
    "aaaa abab the cat sat on a mat",
    "low lower lowest the a a",
    "newest newest widest the cat"
  )

  private lazy val docsDF = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("applyMerge is the greedy leftmost fold on identical-symbol runs") {
    val rows = Seq(Seq("a", "a", "a", "a", "a"), Seq("a", "b", "a", "b"), Seq("x"))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]]
      .collect()
    assert(rows(0) == Seq("aa", "aa", "a")) // never [aa, a, aa]
    assert(rows(1) == Seq("a", "b", "a", "b"))
    assert(rows(2) == Seq("x"))
    val ab = Seq(Seq("a", "b", "a", "b"))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[Seq[String]]
      .collect()
    assert(ab(0) == Seq("ab", "ab"))
  }

  test("learn reproduces the reference merge sequence (ties included)") {
    val (expected, _) = refLearn(corpus, numMerges = 20)
    val model = Bpe.learn(docsDF, numMerges = 20)
    val got = model.merges
      .orderBy("rank")
      .select("rank", "l", "r")
      .as[(Long, String, String)]
      .collect()
      .map { case (k, l, r) => (k.toInt, l, r) }
      .toSeq
    assert(got == expected)
  }

  test("learned wordPieces match the reference segmentation of every word") {
    val (_, refPieces) = refLearn(corpus, numMerges = 20)
    val model = Bpe.learn(docsDF, numMerges = 20)
    val got = model.wordPieces
      .select("word", "syms")
      .as[(String, Seq[String])]
      .collect()
      .map { case (w, s) => w -> s.toVector }
      .toMap
    assert(got == refPieces)
  }

  test("encode flattens per-doc pieces in word order and counts them") {
    val model = Bpe.learn(docsDF, numMerges = 20)
    val (_, refPieces) = refLearn(corpus, numMerges = 20)
    val got = Bpe
      .encode(docsDF, model)
      .select("doc_id", "n_pieces", "pieces_str")
      .as[(Long, Long, String)]
      .collect()
      .map(t => t._1 -> (t._2, t._3))
      .toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      val pieces = text.split(" ").filter(_.nonEmpty).toSeq.flatMap(refPieces)
      assert(got(i.toLong) == (pieces.size.toLong, pieces.mkString(" ")), s"doc $i")
    }
  }

  test("encode falls back to char+eow symbols for out-of-model words") {
    val model = Bpe.learn(docsDF, numMerges = 4)
    val oov = Seq((99L, "zq the")).toDF("doc_id", "text")
    val row = Bpe.encode(oov, model).select("n_pieces", "pieces_str").as[(Long, String)].head()
    // "zq" is not in the corpus: chars z, q, </w>; "the" is in-model
    assert(row._2.startsWith("z q </w> "))
  }

  test("encodeIds maps pieces through the frequency-ranked vocab in order") {
    val model = Bpe.learn(docsDF, numMerges = 20)
    val idOf = Bpe.vocab(model).select("piece", "piece_id").as[(String, Long)].collect().toMap
    val (_, refPieces) = refLearn(corpus, numMerges = 20)
    val got = Bpe
      .encodeIds(docsDF, model)
      .select("doc_id", "ids_str", "n_oov")
      .as[(Long, String, Long)]
      .collect()
      .map(t => t._1 -> (t._2, t._3))
      .toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      val pieces = text.split(" ").filter(_.nonEmpty).toSeq.flatMap(refPieces)
      val expected = pieces.map(idOf).mkString(" ")
      assert(got(i.toLong) == (expected, 0L), s"doc $i")
    }
    // vocab ids are dense 0..n-1 with rank-0 = most frequent symbol
    val ids = idOf.values.toSeq.sorted
    assert(ids == (0L until ids.length).toSeq)
  }

  test("learnLocal (driver merge loop) is identical to learn and to the reference") {
    val (expected, refPieces) = refLearn(corpus, numMerges = 20)
    val model = Bpe.learnLocal(docsDF, numMerges = 20)
    val got = model.merges
      .orderBy("rank")
      .select("rank", "l", "r")
      .as[(Long, String, String)]
      .collect()
      .map { case (k, l, r) => (k.toInt, l, r) }
      .toSeq
    assert(got == expected)
    val gotPieces = model.wordPieces
      .select("word", "syms")
      .as[(String, Seq[String])]
      .collect()
      .map { case (w, s) => w -> s.toVector }
      .toMap
    assert(gotPieces == refPieces)
    // and the engine-side learner agrees wholesale (same Model surface)
    val engine = Bpe.learn(docsDF, numMerges = 20)
    val enginePieces = engine.wordPieces
      .select("word", "freq", "syms")
      .as[(String, Long, Seq[String])]
      .collect()
      .toSet
    val localPieces = model.wordPieces
      .select("word", "freq", "syms")
      .as[(String, Long, Seq[String])]
      .collect()
      .toSet
    assert(localPieces == enginePieces)
  }

  test("learnLocal stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val model = Bpe.learnLocal(tiny, numMerges = 50)
    assert(model.merges.count() == 2L)
  }

  test("learn stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val model = Bpe.learn(tiny, numMerges = 50)
    // "ab" -> [a,b,</w>]: merges (a,b),(ab,</w>) then nothing mergeable
    assert(model.merges.count() == 2L)
  }
}
