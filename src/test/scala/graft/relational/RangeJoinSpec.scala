package graft.relational

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private lazy val left = Seq(
    (1L, 100L, "a"),
    (1L, 250L, "b"),
    (2L, 100L, "c")
  ).toDF("k", "lts", "tag")

  private lazy val right = Seq(
    (1L, 90L), (1L, 110L), (1L, 160L), (1L, 400L), (2L, 500L)
  ).toDF("k", "rts")

  test("rangeJoin finds exactly the rows inside [lts+lower, lts+upper], inclusive") {
    val out = RangeJoin
      .rangeJoin(left, right, "k", "lts", "rts", lower = -10L, upper = 60L)
      .select("tag", "rts")
      .as[(String, Long)]
      .collect()
      .sorted
    // a@100 window [90,160]: 90, 110, 160; b@250 window [240,310]: none;
    // c@(k=2)100 window [90,160]: none (500 out of range)
    assert(out.toSeq == Seq(("a", 90L), ("a", 110L), ("a", 160L)))
  }

  test("rangeJoin equals the brute-force theta join on random-ish data") {
    val l = (1L to 50L).map(i => (i % 5, i * 37 % 997, i)).toDF("k", "lts", "id")
    val r = (1L to 80L).map(i => (i % 5, i * 53 % 997)).toDF("k", "rts")
    val binned = RangeJoin
      .rangeJoin(l, r, "k", "lts", "rts", lower = -25L, upper = 40L)
      .select("id", "rts").as[(Long, Long)].collect().sorted
    val brute = l
      .join(r, l("k") === r("k") && r("rts").between(l("lts") - 25, l("lts") + 40))
      .select("id", "rts").as[(Long, Long)].collect().sorted
    assert(binned.toSeq == brute.toSeq)
  }

  test("rangeJoin plans an equi-join: no BNLJ, no cartesian") {
    val plan = RangeJoin
      .rangeJoin(left, right, "k", "lts", "rts", -10L, 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
