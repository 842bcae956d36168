package graft.contracts

/** What "conforms" means at a checked boundary. Eight policies, capability
  * parity with the reference enum (reference: ContractsCore.scala:43-62) and
  * its flag derivation (ContractsCore.scala:224-234, 402-416):
  *
  *   - Exact / ExactUnorderedCI — unordered by name, case-insensitive,
  *     field nullability ignored, nested collection optionality compared.
  *   - ExactOrdered / ExactOrderedCI — ordered by name (CS / CI resolver).
  *   - ExactByPosition — positional, names ignored.
  *   - Backward — producer extras allowed; contract fields may be missing
  *     only if optional or defaulted. Case-sensitive by design.
  *   - Forward — producer must be a subset of the contract. Case-sensitive.
  *   - Full — escape hatch; accepts everything, including duplicate field
  *     names (all diff categories are dropped, so nothing surfaces).
  *
  * Each policy is a singleton object so it can be used both at the value
  * level (`SchemaPolicy.Backward`) and the type level (`Backward.type`,
  * summoned via `ValueOf`) for phantom-typed pipeline state.
  */
sealed trait SchemaPolicy extends Product with Serializable {
  /** Fold field names before comparing. */
  def caseInsensitive: Boolean = false
  /** Compare fields pairwise by position, names must match. */
  def orderedByName: Boolean = false
  /** Compare fields pairwise by position, names ignored. */
  def byPosition: Boolean = false
  def isBackward: Boolean = false
  def isForward: Boolean = false
  def isFull: Boolean = false
  def name: String = productPrefix
}

object SchemaPolicy {

  case object Exact extends SchemaPolicy {
    override val caseInsensitive = true
  }

  case object ExactUnorderedCI extends SchemaPolicy {
    override val caseInsensitive = true
  }

  case object ExactOrdered extends SchemaPolicy {
    override val orderedByName = true
  }

  case object ExactOrderedCI extends SchemaPolicy {
    override val caseInsensitive = true
    override val orderedByName = true
  }

  case object ExactByPosition extends SchemaPolicy {
    override val byPosition = true
  }

  case object Backward extends SchemaPolicy {
    override val isBackward = true
  }

  case object Forward extends SchemaPolicy {
    override val isForward = true
  }

  case object Full extends SchemaPolicy {
    override val isFull = true
  }

  /** Internal: case-sensitive unordered-by-name comparison. Not part of the
    * reference's 8-policy surface (none of its public policies is
    * CS-unordered); it gives `RuntimeSchemaComparator.unordered(found,
    * expected, caseInsensitive = false)` a real policy instead of a
    * name-set + Forward encoding, so the comparator micro-bench times the
    * actual code path.
    */
  private[graft] case object ExactUnorderedCS extends SchemaPolicy

  // Short type aliases for call sites: addSink[Contract, SchemaPolicy.BackwardT](...)
  type ExactT = Exact.type
  type ExactUnorderedCIT = ExactUnorderedCI.type
  type ExactOrderedT = ExactOrdered.type
  type ExactOrderedCIT = ExactOrderedCI.type
  type ExactByPositionT = ExactByPosition.type
  type BackwardT = Backward.type
  type ForwardT = Forward.type
  type FullT = Full.type

  val all: List[SchemaPolicy] = List(
    Exact, ExactUnorderedCI, ExactOrdered, ExactOrderedCI, ExactByPosition,
    Backward, Forward, Full
  )
}
