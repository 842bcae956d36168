package graft.contracts

import org.apache.spark.sql.types._

/** Normalized structural model of a record shape at a checked boundary.
  *
  * This is the single IR both conformance layers compare over:
  *   - contract shapes derived from Scala case-class types (see [[ShapeOf]]), and
  *   - runtime shapes derived from an actual `DataFrame` schema
  *     (see [[TypeShape.fromStructType]]).
  *
  * Capability parity with the reference's internal model
  * (reference: ContractsCore.scala:70-76), re-homed from a Scala 3 macro IR to a
  * plain runtime ADT. One deliberate divergence: leaves are Spark [[DataType]]s
  * rather than Scala type names, so `java.sql.Date` and `java.time.LocalDate`
  * contracts are equivalent (both are `DateType` on the data plane) — contract
  * equivalence here *is* Spark-schema equivalence. For type-vs-type
  * construction checks the reference's stricter Scala-type identity is
  * available opt-in via [[ShapeOf.strictShape]] /
  * `SchemaConforms.checkStrict` (round 17), which tag the legacy java.*
  * twins as distinct `ObjectType` leaves.
  */
sealed trait TypeShape

object TypeShape {

  /** Atomic leaf carried as the Spark data type it lowers to. */
  final case class Leaf(dataType: DataType) extends TypeShape

  /** Nested optionality (`Option[T]` inside a collection, or a nullable
    * array element / map value). Field-level optionality is NOT modelled as a
    * wrapper — it lives in [[FieldShape.isOptional]] and is ignored by
    * comparison, matching Spark's lax field nullability
    * (reference: README.md:193-197, SparkCore.scala:286-290).
    */
  final case class Optional(inner: TypeShape) extends TypeShape

  /** Any of List/Seq/Vector/Array/Set — one "sequence" shape, so a `Set`
    * producer conforms to a `Seq` contract (reference: CtdcPoc.scala:41-55).
    */
  final case class Sequence(elem: TypeShape) extends TypeShape

  /** Map with an atomic key. */
  final case class MapOf(key: Leaf, value: TypeShape) extends TypeShape

  final case class Struct(fields: List[FieldShape]) extends TypeShape

  /** Render a shape for drift reports: `optional X`, `seq[X]`,
    * `map[K -> V]`, `{a: T, ...}` (reference: ContractsCore.scala:211-221).
    */
  def render(shape: TypeShape): String = shape match {
    case Leaf(dt)          => dt.simpleString
    case Optional(inner)   => s"optional ${render(inner)}"
    case Sequence(elem)    => s"seq[${render(elem)}]"
    case MapOf(key, value) => s"map[${render(key)} -> ${render(value)}]"
    case Struct(fields) =>
      fields.map(f => s"${f.name}: ${render(f.shape)}").mkString("{", ", ", "}")
  }

  /** Runtime walk `StructType => TypeShape` — the df.schema side of the pin.
    * Field nullability becomes [[FieldShape.isOptional]]; nested
    * `containsNull` / `valueContainsNull` become [[Optional]] wrappers that
    * ARE compared (Spark's own comparators ignore them; the reference makes a
    * point of preserving them: SparkCore.scala:137-144).
    */
  def fromStructType(st: StructType): Struct = Struct(
    st.fields.toList.map { f =>
      FieldShape(
        name = f.name,
        shape = fromDataType(f.dataType),
        hasDefault = FieldShape.hasDefaultMetadata(f),
        isOptional = f.nullable
      )
    }
  )

  def fromDataType(dt: DataType): TypeShape = dt match {
    case st: StructType => fromStructType(st)
    case ArrayType(elem, containsNull) =>
      Sequence(wrapIf(containsNull, fromDataType(elem)))
    case MapType(k, v, valueContainsNull) =>
      MapOf(Leaf(k), wrapIf(valueContainsNull, fromDataType(v)))
    case leaf => Leaf(leaf)
  }

  private def wrapIf(optional: Boolean, shape: TypeShape): TypeShape =
    if (optional) Optional(shape) else shape

  /** Lower a shape back to a Spark [[DataType]] (contract -> read schema). */
  def toDataType(shape: TypeShape): DataType = shape match {
    case Leaf(dt)        => dt
    case Optional(inner) => toDataType(inner) // optionality is carried by the container
    case Sequence(elem) =>
      ArrayType(toDataType(elem), containsNull = isOptionalShape(elem))
    case MapOf(key, value) =>
      MapType(key.dataType, toDataType(value), valueContainsNull = isOptionalShape(value))
    case Struct(fields) => toStructType(Struct(fields))
  }

  def toStructType(struct: Struct): StructType = StructType(
    struct.fields.map { f =>
      StructField(
        f.name,
        toDataType(f.shape),
        nullable = f.isOptional,
        metadata = FieldShape.defaultMetadata(f.hasDefault)
      )
    }
  )

  private def isOptionalShape(shape: TypeShape): Boolean = shape match {
    case Optional(_) => true
    case _           => false
  }
}

/** One struct field: unwrapped shape + flags. `isOptional` is stripped from
  * the shape and ignored by comparison; `hasDefault` feeds the Backward
  * policy's missing-field allowance (reference: ContractsCore.scala:75,
  * 189-197; SparkCore.scala:285-290).
  */
final case class FieldShape(
    name: String,
    shape: TypeShape,
    hasDefault: Boolean,
    isOptional: Boolean
)

object FieldShape {

  /** Metadata key marking contract fields that have a Scala default value,
    * so the allowance survives a round trip through `StructType`
    * (reference: SparkCore.scala:20).
    */
  val HasDefaultMetadataKey = "graft.hasDefault"

  def hasDefaultMetadata(f: StructField): Boolean =
    f.metadata.contains(HasDefaultMetadataKey) && f.metadata.getBoolean(HasDefaultMetadataKey)

  def defaultMetadata(hasDefault: Boolean): Metadata =
    new MetadataBuilder().putBoolean(HasDefaultMetadataKey, hasDefault).build()
}
