package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's failed-late accounting invariant (round-6 advisor finding,
  * now encoded instead of manually re-read each round): a query with
  * samples from early passes AND an error from a later pass must settle
  * into NO tier — a broken query must never look like a fast one.
  */
class BenchAccountingSpec extends AnyFunSuite {

  private val samples = Map(
    "q_ok" -> List(1.0, 1.1, 0.9),
    "q_failed_late" -> List(0.2), // succeeded pass 1, failed pass 2
    "q_never_ran" -> Nil
  ).filter(_._2.nonEmpty)
  private val errors = Map(
    "q_failed_late" -> "boom on pass 2",
    "q_failed_immediately" -> "boom on pass 1"
  )

  test("a query that failed on a later pass contributes to no total") {
    val names = Seq("q_ok", "q_failed_late", "q_failed_immediately", "q_unknown")
    assert(Bench.settled(names, samples, errors) == Seq("q_ok"))
  }

  test("order and duplicates of the tier list are preserved for the settled subset") {
    assert(Bench.settled(Seq("q_ok", "q_ok"), samples, errors) == Seq("q_ok", "q_ok"))
    assert(Bench.settled(Seq.empty, samples, errors).isEmpty)
  }
}
