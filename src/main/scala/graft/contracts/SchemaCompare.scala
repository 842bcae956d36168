package graft.contracts

import java.util.Locale

/** Structural diff engine over [[TypeShape]] — the computational core of the
  * contract layer. One implementation serves both conformance directions the
  * reference splits across its macro (ContractsCore.scala:237-416) and its
  * runtime comparator (SparkCore.scala:31-147): contract-vs-contract at
  * pipeline construction, and df.schema-vs-contract at runtime boundaries.
  *
  * Semantics preserved from the reference:
  *   - field-level optionality is never compared (Spark-lax nullability);
  *   - nested collection optionality (`Optional` inside `Sequence`/`MapOf`)
  *     IS compared — drift there is a mismatch;
  *   - Backward drops Missing where the contract field is optional or has a
  *     default; Forward/Full drop all Missing; Backward/Full drop all Extra;
  *     Full drops everything (ContractsCore.scala:402-416);
  *   - name-resolved policies reject case-folded duplicate field names with a
  *     diagnostic (SparkCore.scala:60-64, 73-78).
  *
  * Paths use the reference's grammar: `items[].payload<value>.code`,
  * `@i(name)` for ordered name drift, `@i` for positional drift.
  */
object SchemaCompare {

  final case class Missing(path: String, field: FieldShape)
  final case class Extra(path: String, name: String)
  final case class Mismatch(path: String, expected: String, found: String)

  final case class DriftReport(
      policy: SchemaPolicy,
      missing: List[Missing],
      extra: List[Extra],
      mismatch: List[Mismatch],
      duplicates: List[DuplicateNames]
  ) {
    def conforms: Boolean = missing.isEmpty && extra.isEmpty && mismatch.isEmpty

    def render(outLabel: String, contractLabel: String): String = {
      def renderField(f: FieldShape): String = {
        val opt = if (f.isOptional) " (optional)" else ""
        val dflt = if (f.hasDefault) " (default)" else ""
        s"${TypeShape.render(f.shape)}$opt$dflt"
      }
      val fmtMissing = missing.map(m => s"${m.path} : ${renderField(m.field)}").mkString(", ")
      val fmtExtra = extra.map(_.path).mkString(", ")
      val fmtMis = mismatch
        .map(x => s"${x.path} expected ${x.expected}, found ${x.found}")
        .mkString("; ")
      val dupBlock =
        if (duplicates.isEmpty) ""
        else duplicates.map(_.render).mkString("\n", "\n", "")
      s"""Contract drift (policy: ${policy.name}).
         |Out: $outLabel vs Contract: $contractLabel
         |Missing attributes: $fmtMissing
         |Extra attributes: $fmtExtra
         |Mismatch attributes: $fmtMis$dupBlock
         |""".stripMargin
    }
  }

  final case class DuplicateNames(side: String, path: String, clusters: List[List[String]]) {
    def render: String = {
      val rendered = clusters.map(_.mkString("[", ", ", "]")).mkString(", ")
      s"$side at '${if (path.isEmpty) "<root>" else path}' has case-insensitive duplicate field names: $rendered"
    }
  }

  /** Diff `out` against `contract` under `policy`, post-filtered. */
  def diff(out: TypeShape, contract: TypeShape, policy: SchemaPolicy): DriftReport = {
    val acc = new Acc
    if (policy.byPosition) compareByPos(acc, "", out, contract)
    else if (policy.orderedByName) compareOrdered(acc, "", out, contract, policy.caseInsensitive)
    else compareByName(acc, "", out, contract, policy.caseInsensitive)

    val miss =
      if (policy.isBackward) acc.missing.filterNot(m => m.field.hasDefault || m.field.isOptional)
      else if (policy.isForward || policy.isFull) Nil
      else acc.missing
    val extra = if (policy.isBackward || policy.isFull) Nil else acc.extra
    val mism = if (policy.isFull) Nil else acc.mismatch
    val dups = if (policy.isFull) Nil else acc.duplicates
    DriftReport(policy, miss, extra, mism ++ dups.map(dupMismatch), dups)
  }

  def conforms(out: TypeShape, contract: TypeShape, policy: SchemaPolicy): Boolean =
    diff(out, contract, policy).conforms

  /** Duplicate names make a name-resolved match impossible; surface as a
    * mismatch so `conforms` is false (the reference runtime comparator
    * likewise refuses to match: SparkCore.scala:93-127).
    */
  private def dupMismatch(d: DuplicateNames): Mismatch =
    Mismatch(d.path, "unique field names", d.clusters.map(_.mkString("[", ", ", "]")).mkString(", "))

  def duplicateNames(fields: List[FieldShape], caseInsensitive: Boolean): List[List[String]] =
    fields
      .groupBy(f => norm(f.name, caseInsensitive))
      .valuesIterator
      .collect { case fs if fs.lengthCompare(1) > 0 => fs.map(_.name).sorted }
      .toList
      .sortBy(_.headOption.getOrElse(""))

  private def norm(s: String, ci: Boolean): String =
    if (ci) s.toLowerCase(Locale.ROOT) else s

  private final class Acc {
    var missing: List[Missing] = Nil
    var extra: List[Extra] = Nil
    var mismatch: List[Mismatch] = Nil
    var duplicates: List[DuplicateNames] = Nil
    def addMissing(m: Missing): Unit = missing = missing :+ m
    def addExtra(e: Extra): Unit = extra = extra :+ e
    def addMismatch(x: Mismatch): Unit = mismatch = mismatch :+ x
  }

  private def pathOf(base: String, seg: String): String =
    if (base.isEmpty) seg else s"$base.$seg"

  private def shapesMismatch(acc: Acc, path: String, out: TypeShape, contract: TypeShape): Unit =
    acc.addMismatch(Mismatch(path, TypeShape.render(contract), TypeShape.render(out)))

  /** Shared handling of the non-struct shape pairs; returns false when the
    * pair was not handled (i.e. both sides are structs, caller recurses).
    */
  private def compareCommon(
      acc: Acc,
      path: String,
      out: TypeShape,
      contract: TypeShape,
      ci: Boolean,
      recurse: (Acc, String, TypeShape, TypeShape) => Unit
  ): Boolean = (out, contract) match {
    case (TypeShape.Optional(ao), TypeShape.Optional(ai)) =>
      recurse(acc, path, ao, ai); true
    case (o @ TypeShape.Optional(_), other) =>
      acc.addMismatch(Mismatch(path, TypeShape.render(other), TypeShape.render(o))); true
    case (other, i @ TypeShape.Optional(_)) =>
      acc.addMismatch(Mismatch(path, TypeShape.render(i), TypeShape.render(other))); true
    case (TypeShape.Leaf(ao), TypeShape.Leaf(ai)) =>
      if (ao != ai) acc.addMismatch(Mismatch(path, ai.simpleString, ao.simpleString))
      true
    case (TypeShape.Sequence(ao), TypeShape.Sequence(ai)) =>
      recurse(acc, s"$path[]", ao, ai); true
    case (TypeShape.MapOf(ko, vo), TypeShape.MapOf(ki, vi)) =>
      if (ko.dataType != ki.dataType)
        acc.addMismatch(Mismatch(s"$path<key>", ki.dataType.simpleString, ko.dataType.simpleString))
      recurse(acc, s"$path<value>", vo, vi)
      true
    case (_: TypeShape.Struct, _: TypeShape.Struct) => false
    case (ao, ai) =>
      shapesMismatch(acc, path, ao, ai); true
  }

  /** Unordered by-name compare (reference: ContractsCore.scala:237-284). */
  private def compareByName(acc: Acc, path: String, out: TypeShape, contract: TypeShape, ci: Boolean): Unit = {
    val handled = compareCommon(acc, path, out, contract, ci, compareByName(_, _, _, _, ci))
    if (handled) return
    val (outs, ins) = (out.asInstanceOf[TypeShape.Struct].fields, contract.asInstanceOf[TypeShape.Struct].fields)

    val outDups = duplicateNames(outs, ci)
    val inDups = duplicateNames(ins, ci)
    if (outDups.nonEmpty) acc.duplicates :+= DuplicateNames("Out", path, outDups)
    if (inDups.nonEmpty) acc.duplicates :+= DuplicateNames("Contract", path, inDups)
    if (outDups.nonEmpty || inDups.nonEmpty) return

    val outMap = outs.map(f => norm(f.name, ci) -> f).toMap
    val inMap = ins.map(f => norm(f.name, ci) -> f).toMap
    ins.foreach { f =>
      if (!outMap.contains(norm(f.name, ci))) acc.addMissing(Missing(pathOf(path, f.name), f))
    }
    outs.foreach { f =>
      if (!inMap.contains(norm(f.name, ci))) acc.addExtra(Extra(pathOf(path, f.name), f.name))
    }
    ins.foreach { f =>
      outMap.get(norm(f.name, ci)).foreach { of =>
        compareByName(acc, pathOf(path, f.name), of.shape, f.shape, ci)
      }
    }
  }

  /** Ordered by-name compare (reference: ContractsCore.scala:286-340). */
  private def compareOrdered(acc: Acc, path: String, out: TypeShape, contract: TypeShape, ci: Boolean): Unit = {
    val handled = compareCommon(acc, path, out, contract, ci, compareOrdered(_, _, _, _, ci))
    if (handled) return
    val (outs, ins) = (out.asInstanceOf[TypeShape.Struct].fields, contract.asInstanceOf[TypeShape.Struct].fields)
    val min = math.min(outs.length, ins.length)
    (0 until min).foreach { i =>
      val (of, inf) = (outs(i), ins(i))
      val okName = if (ci) of.name.equalsIgnoreCase(inf.name) else of.name == inf.name
      if (!okName) acc.addMismatch(Mismatch(s"$path.@$i(name)", inf.name, of.name))
      compareOrdered(acc, pathOf(path, inf.name), of.shape, inf.shape, ci)
    }
    ins.drop(min).foreach(f => acc.addMissing(Missing(pathOf(path, f.name), f)))
    outs.drop(min).foreach(f => acc.addExtra(Extra(pathOf(path, f.name), f.name)))
  }

  /** Positional, name-blind compare (reference: ContractsCore.scala:342-381). */
  private def compareByPos(acc: Acc, path: String, out: TypeShape, contract: TypeShape): Unit = {
    val handled = compareCommon(acc, path, out, contract, ci = false, compareByPos(_, _, _, _))
    if (handled) return
    val (outs, ins) = (out.asInstanceOf[TypeShape.Struct].fields, contract.asInstanceOf[TypeShape.Struct].fields)
    val min = math.min(outs.length, ins.length)
    (0 until min).foreach { i =>
      compareByPos(acc, s"$path.@$i", outs(i).shape, ins(i).shape)
    }
    ins.drop(min).foreach(f => acc.addMissing(Missing(s"$path.@$min", f)))
    outs.drop(min).foreach(f => acc.addExtra(Extra(s"$path.@$min", f.name)))
  }
}
