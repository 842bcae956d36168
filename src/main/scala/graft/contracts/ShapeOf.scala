package graft.contracts

import org.apache.spark.sql.types._

import java.util.concurrent.ConcurrentHashMap
import scala.reflect.runtime.{universe => ru}

/** A contract definition error: the Scala type cannot model a Spark record
  * (unsupported leaf, non-case-class, non-atomic map key). Raised eagerly the
  * first time a contract is summoned — the Scala-2 stand-in for the
  * reference's compile-time `report.errorAndAbort`
  * (reference: ContractsCore.scala:153-156, SparkCore.scala:252-255).
  */
final class UnsupportedContractType(message: String) extends IllegalArgumentException(message)

/** Typeclass: the normalized [[TypeShape]] and Spark `StructType` of a
  * contract case class `T`.
  *
  * The reference derives this with a Scala 3 `quotes.reflect` macro
  * (reference: ContractsCore.scala:116-203, SparkCore.scala:200-299). On
  * Scala 2.13 we walk the same type structure with `scala.reflect.runtime`
  * at first summon (driver-side, O(schema), memoized per type) — the
  * documented compile-time ⇒ construction-time mechanism shift.
  */
trait ShapeOf[T] extends Serializable {
  def shape: TypeShape.Struct
  def struct: StructType
}

object ShapeOf {

  def apply[T](implicit ev: ShapeOf[T]): ShapeOf[T] = ev

  private val cache = new ConcurrentHashMap[String, ShapeOf[_]]()

  // WeakTypeTag rather than TypeTag so derivation also works where a full
  // TypeTag can't materialize; note that method-local case classes reify as
  // free types under Scala 2 runtime reflection and are rejected with an
  // explicit error in `materialize` — contracts must live at a stable
  // (object/package) scope, unlike the reference's compile-time macro which
  // handles local classes.
  implicit def derive[T](implicit tt: ru.WeakTypeTag[T]): ShapeOf[T] = {
    val key = tt.tpe.toString
    cache
      .computeIfAbsent(key, _ => materialize(tt.tpe))
      .asInstanceOf[ShapeOf[T]]
  }

  private def materialize(tpe: ru.Type): ShapeOf[Any] = {
    // Method-local / abstract contract types reify as free types under
    // Scala 2 runtime reflection and cannot be walked — fail with a clear
    // scoping error instead of a misleading "unsupported leaf" one.
    def isFree(s: ru.Symbol): Boolean =
      s.toString.startsWith("free ") || (s != ru.NoSymbol && s.owner == ru.NoSymbol && !s.isClass)
    if (tpe.exists(t => isFree(t.typeSymbol)))
      throw new UnsupportedContractType(
        s"Contract type $tpe is method-local or abstract; Scala 2 runtime " +
          "reflection cannot derive its shape. Define contract case classes " +
          "at a stable (object/package) scope."
      )
    val s = ru.synchronized { // runtime reflection: serialize walks defensively
      shapeOfType(tpe) match {
        case struct: TypeShape.Struct => struct
        case other =>
          throw new UnsupportedContractType(
            s"Contract must be a case class, got: $tpe (${TypeShape.render(other)})"
          )
      }
    }
    val st = TypeShape.toStructType(s)
    new ShapeOf[Any] {
      val shape: TypeShape.Struct = s
      val struct: StructType = st
    }
  }

  /** STRICT (reference-parity) shape of `T`, opt-in (round 17): leaf types
    * that collapse to the same Spark `DataType` but are DIFFERENT Scala
    * types — `java.sql.Date` vs `java.time.LocalDate`, `java.sql.Timestamp`
    * vs `java.time.Instant`, `java.math.BigDecimal` vs `BigDecimal` — stay
    * distinct: the legacy `java.*` twin is carried as `ObjectType(<class>)`
    * so [[SchemaConforms.checkStrict]] rejects the swaps exactly as the
    * reference macro does (reference: ContractsCore.scala:158-173, which
    * compares Scala types, not lowered Spark types). Type-vs-type
    * CONSTRUCTION checks only: on the data plane the twins are genuinely
    * indistinguishable (both lower to `DateType` in the files — SURVEY
    * §7.4), so the default [[derive]] and every `DataFrame` pin keep
    * Spark-schema leaf identity, and no `StructType` is ever built from a
    * strict shape.
    */
  def strictShape[T](implicit tt: ru.WeakTypeTag[T]): TypeShape.Struct = {
    derive[T](tt) // default derivation first: same validation, same errors
    strictCache.computeIfAbsent(
      tt.tpe.toString,
      _ =>
        ru.synchronized {
          // safe cast: the default walk above proved the top level is a
          // case class, and strictness only changes leaf tagging
          shapeOfType(tt.tpe, strict = true).asInstanceOf[TypeShape.Struct]
        }
    )
  }

  private val strictCache = new ConcurrentHashMap[String, TypeShape.Struct]()

  private val supportedLeafTypes =
    "String, Int, Long, Short, Byte, Double, Float, Boolean, BigDecimal, " +
      "java.math.BigDecimal, java.sql.Date, java.time.LocalDate, " +
      "java.sql.Timestamp, java.time.Instant, java.time.LocalDateTime, " +
      "Array[Byte]"

  /** Leaf table per SURVEY.md §1.2 (reference: SparkCore.scala:238-255).
    * Under `strict` the legacy `java.*` twin of each Spark-identical pair
    * is tagged as `ObjectType` instead of the shared lowered type — see
    * [[strictShape]].
    */
  private def leafDataType(t: ru.Type, strict: Boolean = false): Option[DataType] = {
    import ru._
    if (strict && t =:= typeOf[java.sql.Date]) Some(ObjectType(classOf[java.sql.Date]))
    else if (strict && t =:= typeOf[java.sql.Timestamp]) Some(ObjectType(classOf[java.sql.Timestamp]))
    else if (strict && t =:= typeOf[java.math.BigDecimal]) Some(ObjectType(classOf[java.math.BigDecimal]))
    else if (t =:= typeOf[String]) Some(StringType)
    else if (t =:= typeOf[Int]) Some(IntegerType)
    else if (t =:= typeOf[Long]) Some(LongType)
    else if (t =:= typeOf[Short]) Some(ShortType)
    else if (t =:= typeOf[Byte]) Some(ByteType)
    else if (t =:= typeOf[Double]) Some(DoubleType)
    else if (t =:= typeOf[Float]) Some(FloatType)
    else if (t =:= typeOf[Boolean]) Some(BooleanType)
    else if (t =:= typeOf[BigDecimal] || t =:= typeOf[java.math.BigDecimal])
      Some(DecimalType.SYSTEM_DEFAULT)
    else if (t =:= typeOf[java.sql.Date] || t =:= typeOf[java.time.LocalDate])
      Some(DateType)
    else if (t =:= typeOf[java.sql.Timestamp] || t =:= typeOf[java.time.Instant])
      Some(TimestampType)
    else if (t =:= typeOf[java.time.LocalDateTime]) Some(TimestampNTZType)
    else None
  }

  private def isAtomicKey(t: ru.Type): Boolean = {
    import ru._
    t =:= typeOf[String] || t =:= typeOf[Int] || t =:= typeOf[Long] ||
    t =:= typeOf[Short] || t =:= typeOf[Byte] || t =:= typeOf[Boolean]
  }

  private def isSeqLike(t: ru.Type): Boolean = {
    import ru._
    t <:< typeOf[Seq[_]] || t <:< typeOf[Set[_]] || t <:< typeOf[Array[_]]
  }

  private def isCaseClass(t: ru.Type): Boolean = {
    val sym = t.typeSymbol
    sym.isClass && sym.asClass.isCaseClass
  }

  /** `Type => TypeShape` walk mirroring the reference macro's classification
    * order: Option, then sequence family, then Map[atomic, _], then nested
    * case class, then leaf (reference: ContractsCore.scala:176-203).
    */
  private def shapeOfType(raw: ru.Type, strict: Boolean = false): TypeShape = {
    import ru._
    val t = raw.dealias
    if (t <:< typeOf[Option[_]]) TypeShape.Optional(shapeOfType(t.typeArgs.head, strict))
    // Array[Byte] is BinaryType on the data plane (matches Spark's encoder
    // mapping), NOT ArrayType(ByteType) — checked before the sequence family.
    // This is the multimodal payload leaf (opaque image/audio/video bytes).
    else if (t =:= typeOf[Array[Byte]]) TypeShape.Leaf(BinaryType)
    else if (isSeqLike(t)) {
      val elem = t.typeArgs.headOption.getOrElse(
        throw new UnsupportedContractType(s"Missing type arg for sequence in $t")
      )
      TypeShape.Sequence(shapeOfType(elem, strict))
    } else if (t <:< typeOf[Map[_, _]]) {
      t.typeArgs match {
        case k :: v :: Nil =>
          if (!isAtomicKey(k))
            throw new UnsupportedContractType(
              s"Unsupported Map key type for $t. Allowed keys: String, Int, Long, Short, Byte, Boolean."
            )
          val keyLeaf = TypeShape.Leaf(leafDataType(k).get) // atomic keys have no strict twins
          TypeShape.MapOf(keyLeaf, shapeOfType(v, strict))
        case _ =>
          throw new UnsupportedContractType(s"Map requires two type args: $t")
      }
    } else if (leafDataType(t).isDefined) {
      // Leaf before case-class: BigDecimal & friends are case-class-like but atomic.
      TypeShape.Leaf(leafDataType(t, strict).get)
    } else if (isCaseClass(t)) {
      structShapeOf(t, strict)
    } else {
      throw new UnsupportedContractType(
        s"Unsupported structural leaf type in contract derivation: $t. " +
          s"Supported leaf types: $supportedLeafTypes. Supported container shapes: " +
          "case classes, Option, List/Seq/Vector/Array/Set, and Map[atomic, _]."
      )
    }
  }

  private def structShapeOf(t: ru.Type, strict: Boolean = false): TypeShape.Struct = {
    import ru._
    val ctor = t
      .decl(termNames.CONSTRUCTOR)
      .alternatives
      .collectFirst { case m: MethodSymbol if m.isPrimaryConstructor => m }
      .getOrElse(throw new UnsupportedContractType(s"No primary constructor for $t"))
    val fields = ctor.paramLists.flatten.map { p =>
      val name = p.name.decodedName.toString
      val ptpe = p.typeSignatureIn(t).dealias
      val hasDefault = p.asTerm.isParamWithDefault
      val (unwrapped, isOpt) =
        if (ptpe <:< typeOf[Option[_]]) (ptpe.typeArgs.head, true) else (ptpe, false)
      FieldShape(name, shapeOfType(unwrapped, strict), hasDefault, isOpt)
    }
    TypeShape.Struct(fields)
  }
}
