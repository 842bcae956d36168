package graft.relational

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // left: (key, ts, tag); right: (key, ts, price)
  private lazy val quotes = Seq(
    (1L, 10L, 100L),
    (1L, 20L, 110L),
    (1L, 20L, 115L), // same-ts duplicate: greatest value wins
    (2L, 5L, 900L)
  ).toDF("k", "qts", "price")

  private lazy val trades = Seq(
    (1L, 5L, "before-any"),
    (1L, 10L, "at-first"),
    (1L, 15L, "between"),
    (1L, 25L, "after-all"),
    (2L, 5L, "exact"),
    (3L, 50L, "no-quotes")
  ).toDF("k", "tts", "label")

  test("asofJoin attaches the latest right value at or before each left ts") {
    val out = AsOf
      .asofJoin(trades, quotes, key = "k", leftTs = "tts", rightTs = "qts",
        valCol = "price", outCol = "last_price")
      .select("label", "last_price")
      .as[(String, Option[Long])]
      .collect()
      .toMap
    assert(out("before-any").isEmpty)          // no quote yet -> null
    assert(out("at-first").contains(100L))     // inclusive match at equal ts
    assert(out("between").contains(100L))
    assert(out("after-all").contains(115L))    // same-ts dup resolved to max
    assert(out("exact").contains(900L))
    assert(out("no-quotes").isEmpty)           // key with no right rows
  }

  test("asofJoin equals the brute-force per-row lookup on random-ish data") {
    val l = (1L to 60L).map(i => (i % 7, i * 41 % 499, i)).toDF("k", "tts", "id")
    val rRows = (1L to 90L).map(i => (i % 7, i * 57 % 499, i * 13 % 997))
    val r = rRows.toDF("k", "qts", "price")
    val out = AsOf
      .asofJoin(l, r, "k", "tts", "qts", "price", "p")
      .select("id", "p")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    // brute reference: per left row, max-ts right row at or before; ties on
    // ts resolve to the greatest value (the operator's documented rule)
    val byKey = rRows.groupBy(_._1)
    (1L to 60L).foreach { i =>
      val (k, ts) = (i % 7, i * 41 % 499)
      val eligible = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
      val expected =
        if (eligible.isEmpty) None
        else {
          val maxTs = eligible.map(_._2).max
          Some(eligible.filter(_._2 == maxTs).map(_._3).max)
        }
      assert(out(i) == expected, s"left row $i (k=$k, ts=$ts)")
    }
  }

  test("asofJoin plans one shuffle + window: no range join, no BNLJ") {
    val plan = AsOf
      .asofJoin(trades, quotes, "k", "tts", "qts", "price", "p")
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
