package graft.contracts

import graft.SparkTestSession
import graft.queries.ContractQueries
import org.scalatest.funsuite.AnyFunSuite

/** Local guard for `oref_conformance_matrix`: the engine's replay of the
  * reference's 20-test conformance spec must equal the hand-authored
  * expectations BEFORE the driver's DuckDB gate sees it. The expected set
  * here restates (not parses) the oracle's VALUES rows; any drift between
  * engine semantics and the reference's published matrix fails both.
  */
class RefMatrixSpec extends AnyFunSuite with SparkTestSession {

  private val expected: Set[(String, String, String, String)] = Set(
    ("ref01_exact_unordered_ci", "conforms", "true", ""),
    ("ref02_exact_option_field", "conforms", "true", ""),
    ("ref03_backward_relaxed", "conforms", "true", ""),
    ("ref04_backward_nested", "conforms", "true", ""),
    ("ref05_exact_nested_opt_ok", "conforms", "true", ""),
    ("ref06_forward_subset", "conforms", "true", ""),
    ("ref07_ordered_reorder", "conforms", "false", ""),
    ("ref07_ordered_reorder", "mismatch", ".@0(name)", "expected id, found email"),
    ("ref07_ordered_reorder", "mismatch", "id", "expected bigint, found string"),
    ("ref07_ordered_reorder", "mismatch", ".@1(name)", "expected email, found id"),
    ("ref07_ordered_reorder", "mismatch", "email", "expected string, found bigint"),
    ("ref08_ordered_ci_reorder", "conforms", "false", ""),
    ("ref08_ordered_ci_reorder", "mismatch", ".@0(name)", "expected id, found EMAIL"),
    ("ref08_ordered_ci_reorder", "mismatch", "id", "expected bigint, found string"),
    ("ref08_ordered_ci_reorder", "mismatch", ".@1(name)", "expected email, found ID"),
    ("ref08_ordered_ci_reorder", "mismatch", "email", "expected string, found bigint"),
    ("ref09_by_position_reorder", "conforms", "false", ""),
    ("ref09_by_position_reorder", "mismatch", ".@0", "expected bigint, found string"),
    ("ref09_by_position_reorder", "mismatch", ".@1", "expected string, found bigint"),
    ("ref10_backward_missing_required", "conforms", "false", ""),
    ("ref10_backward_missing_required", "missing", "email", "string"),
    ("ref11_rejects_uuid", "rejects", "java.util.UUID", "true"),
    ("ref12_rejects_trait", "rejects", "Ref12Contract", "true"),
    ("ref13_rejects_tuple", "rejects", "(Int, String)", "true"),
    ("ref14_nested_mismatch_paths", "conforms", "false", ""),
    ("ref14_nested_mismatch_paths", "mismatch", "shipTo.zip", "expected string, found int"),
    ("ref14_nested_mismatch_paths", "mismatch", "tags[]", "expected string, found int"),
    ("ref15_seq_optionality_drift", "conforms", "false", ""),
    ("ref15_seq_optionality_drift", "mismatch", "values[]", "expected int, found optional int"),
    ("ref16_map_optionality_drift", "conforms", "false", ""),
    ("ref16_map_optionality_drift", "mismatch", "values<value>", "expected int, found optional int"),
    ("ref17_unordered_ci_type_drift", "conforms", "false", ""),
    ("ref17_unordered_ci_type_drift", "mismatch", "email", "expected string, found int"),
    ("ref18_full_unrelated", "conforms", "true", ""),
    ("ref19_deep_nested_ok", "conforms", "true", ""),
    ("ref20_deep_nested_mismatch", "conforms", "false", ""),
    ("ref20_deep_nested_mismatch", "mismatch", "items[].payload<value>.code", "expected int, found string")
  )

  test("reference conformance matrix replays exactly as hand-authored") {
    val q = ContractQueries.all.find(_.name == "oref_conformance_matrix").get
    val got = q
      .fn(spark, "")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val missing = expected -- got
    val extra = got -- expected
    assert(missing.isEmpty && extra.isEmpty, s"missing=$missing extra=$extra")
  }
}
