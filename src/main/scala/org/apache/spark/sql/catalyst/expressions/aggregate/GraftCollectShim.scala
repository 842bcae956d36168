package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-scoped bounded top-k collector
  * (`CollectTopK`, the aggregate behind the engine's own TakeOrdered-style
  * rewrites): exposes the SMALLEST-k form as a plain aggregate Expression
  * so graft code can take per-GROUP bottom-k in one aggregation pass with
  * map-side partial aggregation and bounded state (≤ k elements per group
  * per task). This replaces the only scale-safe alternative Spark's public
  * API offers for per-group top-k — one `orderBy(...).limit(k)` pass PER
  * GROUP — with a single pass over the input for any number of groups
  * (a per-group window would shuffle every row to one task per group).
  *
  * Exactness: the merge of per-partition bottom-k sets IS the group's
  * bottom-k (top-k selection is a semilattice), so partial aggregation
  * changes nothing; with a total order on the collected element
  * (callers order by a struct whose prefix fields are unique) the result
  * SET is deterministic. Output order is NOT defined — callers must
  * `sort_array` the result before relying on positions.
  *
  * Lives in the aggregate package purely for access; keep it to this one
  * factory call (the graftshim discipline).
  */
object GraftCollectShim {

  /** The bottom-`k` elements of each group by `child`'s natural ordering
    * (struct ordering = lexicographic over fields, Spark's SQL semantics,
    * NaN greatest / nulls per SQL ordering — identical to what
    * `orderBy(asc).limit(k)` uses). Unordered output; `sort_array` it.
    */
  def collectBottomK(child: Expression, k: Int): Expression =
    CollectTopK(child, k, reverse = true).toAggregateExpression()
}
