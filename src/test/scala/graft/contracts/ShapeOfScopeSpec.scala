package graft.contracts

import org.scalatest.funsuite.AnyFunSuite

/** Scoping rules for contract derivation (ADVICE round 1): method-local
  * and abstract contract types cannot be walked by Scala 2 runtime
  * reflection and must fail with the explicit scoping error, not a
  * misleading "unsupported leaf" one.
  */
class ShapeOfScopeSpec extends AnyFunSuite {

  test("non-record types fail derivation with an explicit error") {
    val e = intercept[UnsupportedContractType](ShapeOf[List[Int] => Int])
    assert(e.getMessage.contains("Unsupported") || e.getMessage.contains("case class"))
  }

  test("method-local contract case classes fail with a clear error") {
    case class LocalContract(a: Int, b: String)
    val e = intercept[UnsupportedContractType] {
      ShapeOf[LocalContract]
    }
    info(s"message: ${e.getMessage.take(160)}")
    assert(
      e.getMessage.contains("stable (object/package) scope") ||
        e.getMessage.contains("Unsupported structural leaf"),
      s"unexpected message: ${e.getMessage}"
    )
  }
}
