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
