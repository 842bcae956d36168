package graft.model

import java.time.LocalDateTime

/** Contract case classes for the driver-generated testdata tables
  * (/root/testdata/sf*, see TESTDATA.md). These are *contracts* in the
  * engine's sense: schemas at checked pipeline boundaries, derived via
  * [[graft.contracts.ShapeOf]].
  *
  * Shape notes (verified against the parquet files):
  *   - `orders.o_orderdate` / `lineitem.l_shipdate` are parquet timestamps
  *     with isAdjustedToUTC=false → Spark `TimestampNTZType` → contract leaf
  *     `java.time.LocalDateTime`.
  *   - `events.ts` is epoch nanoseconds as `Long` AFTER the shared read
  *     path ([[graft.queries.QueryDef.normalizeTs]]): the physical parquet
  *     encoding has drifted between TIMESTAMP(NANOS) (read as Long under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
  *     (read as a timestamp type, normalized to Long ns at read) → contract
  *     leaf `Long` (nanoseconds since epoch) either way.
  *   - `embeddings.embedding` is `list<element: float>` with nullable
  *     elements → `Seq[Option[Float]]` so the contract carries
  *     `containsNull=true`, which the comparators check (nested optionality
  *     is compared, unlike Spark's built-ins).
  */
object Tables {

  final case class RegionRow(r_regionkey: Int, r_name: String)

  final case class NationRow(n_nationkey: Int, n_name: String, n_regionkey: Int)

  final case class CustomerRow(
      c_custkey: Long,
      c_name: String,
      c_nationkey: Int,
      c_acctbal: Double,
      c_mktsegment: String
  )

  final case class SupplierRow(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)

  final case class PartRow(
      p_partkey: Long,
      p_name: String,
      p_brand: String,
      p_type: String,
      p_size: Int,
      p_retailprice: Double
  )

  final case class OrdersRow(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double,
      o_orderdate: LocalDateTime,
      o_orderpriority: String
  )

  final case class LineitemRow(
      l_orderkey: Long,
      l_partkey: Long,
      l_suppkey: Long,
      l_linenumber: Int,
      l_quantity: Double,
      l_extendedprice: Double,
      l_discount: Double,
      l_tax: Double,
      l_returnflag: String,
      l_linestatus: String,
      l_shipdate: LocalDateTime
  )

  final case class EventRow(
      event_id: Long,
      ts: Long, // nanoseconds since epoch (see scaladoc above)
      user_id: Long,
      event_type: String,
      value: Double,
      props: String
  )

  final case class DocumentRow(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class EmbeddingRow(vec_id: Long, embedding: Seq[Option[Float]], label: Int)
}
