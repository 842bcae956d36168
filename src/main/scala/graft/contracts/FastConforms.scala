package graft.contracts

import org.apache.spark.sql.types._

import java.util.Locale

/** Zero-allocation, early-exit boolean conformance check — the hot path for
  * runtime pins ([[PolicyRuntime]]/[[SchemaCheck]]). Compares two
  * `StructType`s directly (the contract side comes pre-lowered and memoized
  * from [[ShapeOf.struct]], carrying field nullability as optionality and
  * `graft.hasDefault` metadata), with NO intermediate conversion, NO path
  * strings, NO diff lists. Semantics are exactly
  * [[SchemaCompare.diff]].conforms — a scalacheck property in the test
  * suite asserts the equivalence on random shape pairs. The full diff
  * engine runs only on the failure path, where rendering cost is
  * irrelevant.
  *
  * Matches the reference's boolean comparator design (direct StructType
  * recursion, SparkCore.scala:31-147) and its cost class
  * (BASELINE.md: 0.1–8 µs/op).
  */
object FastConforms {

  def ok(found: StructType, expected: StructType, policy: SchemaPolicy): Boolean =
    if (policy.isFull) true else compareStruct(found, expected, policy)

  private def norm(s: String, ci: Boolean): String = if (ci) s.toLowerCase(Locale.ROOT) else s

  private def compareStruct(out: StructType, contract: StructType, p: SchemaPolicy): Boolean = {
    val outs = out.fields
    val ins = contract.fields
    if (p.byPosition) {
      if (outs.length != ins.length) return false
      var i = 0
      while (i < outs.length) {
        if (!compareDt(outs(i).dataType, ins(i).dataType, p)) return false
        i += 1
      }
      true
    } else if (p.orderedByName) {
      if (outs.length != ins.length) return false
      var i = 0
      while (i < outs.length) {
        val (of, inf) = (outs(i), ins(i))
        val nameOk = if (p.caseInsensitive) of.name.equalsIgnoreCase(inf.name) else of.name == inf.name
        if (!nameOk || !compareDt(of.dataType, inf.dataType, p)) return false
        i += 1
      }
      true
    } else {
      // name-resolved unordered family: Exact/ExactUnorderedCI/
      // ExactUnorderedCS (strict), Backward (extras ok, missing needs
      // optional-or-default), Forward (missing ok, extras fatal).
      val ci = p.caseInsensitive
      val outMap = new java.util.HashMap[String, StructField](outs.length * 2)
      var i = 0
      while (i < outs.length) {
        // case-folded duplicate names make a name-resolved match impossible
        if (outMap.put(norm(outs(i).name, ci), outs(i)) != null) return false
        i += 1
      }
      val inSeen = new java.util.HashSet[String](ins.length * 2)
      var matched = 0
      i = 0
      while (i < ins.length) {
        val inf = ins(i)
        if (!inSeen.add(norm(inf.name, ci))) return false // contract-side duplicate
        val of = outMap.get(norm(inf.name, ci))
        if (of == null) {
          // contract field absent from the producer: optionality is the
          // contract field's nullability; defaults ride in metadata.
          val missingAllowed =
            p.isForward || (p.isBackward && (inf.nullable || FieldShape.hasDefaultMetadata(inf)))
          if (!missingAllowed) return false
        } else {
          matched += 1
          if (!compareDt(of.dataType, inf.dataType, p)) return false
        }
        i += 1
      }
      val extras = outs.length - matched
      extras == 0 || p.isBackward
    }
  }

  /** Deep type equality with the contract semantics: field nullability is
    * never compared (handled one level up), nested `containsNull` /
    * `valueContainsNull` ARE compared, map keys compare as whole DataTypes.
    */
  private def compareDt(out: DataType, contract: DataType, p: SchemaPolicy): Boolean =
    (out, contract) match {
      case (ArrayType(oe, ocn), ArrayType(ie, icn)) =>
        ocn == icn && compareDt(oe, ie, p)
      case (MapType(ok, ov, ocn), MapType(ik, iv, icn)) =>
        ocn == icn && ok == ik && compareDt(ov, iv, p)
      case (os: StructType, is: StructType) => compareStruct(os, is, p)
      case (o, i)                           => o == i
    }
}
