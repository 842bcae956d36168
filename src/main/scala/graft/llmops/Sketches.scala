package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch operators for corpus statistics at scale.
  *
  * KMV (k-minimum-values) distinct-count sketch: hash every value to a
  * 56-bit md5-derived point, keep the k smallest distinct hashes, estimate
  * |D| ≈ (k-1) · 2^56 / max(kept). Chosen over HLL on purpose: the
  * estimate is a *deterministic pure function of the data* (no RNG, no
  * engine-specific register layout), so DuckDB recomputes the exact same
  * number and the driver hash-gate applies to an approximate sketch — the
  * same verify-the-algorithm trick as the LSH oracles. Scale shape:
  * hash + distinct + global top-k; Spark's sort-limit takes per-partition
  * k then merges, so the shuffle carries k values per partition, not the
  * corpus.
  *
  * Exact heavy hitters: two-phase hash aggregation + deterministic top-k
  * (count desc, value asc) — the partial map-side combine means the
  * shuffle carries one row per distinct value per partition.
  */
object Sketches {

  /** 56-bit md5-derived hash point (same construction as
    * [[Fingerprints.simhash56Md5]]'s token hash — first 14 hex chars).
    */
  def hash56(v: Column): Column =
    shiftleft(conv(substring(md5(v), 1, 7), 16, 10).cast("long"), 28)
      .bitwiseOR(conv(substring(md5(v), 8, 7), 16, 10).cast("long"))

  /** One-row KMV estimate over a column of values (after the caller's
    * explode/projection): (n_distinct_est, n_distinct_exact ships alongside
    * in the driver query for an honest error ledger).
    */
  def kmvDistinctEstimate(values: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val kept = values
      .select(hash56(col(valueCol)).as("__h"))
      .distinct()
      .orderBy("__h")
      .limit(k)
    kept
      .agg(count(lit(1)).as("__c"), max(col("__h")).as("__m"))
      .select(
        when(col("__c") < k, col("__c").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(72057594037927936.0) / col("__m").cast("double"))
          .as("n_distinct_est")
      )
  }

  /** Exact top-k frequent values: (value, cnt), count desc then value asc. */
  def heavyHitters(values: DataFrame, valueCol: String, k: Int): DataFrame =
    values
      .groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value"))
      .limit(k)

  /** Deterministic per-group quantile estimates over a content-hash
    * Bernoulli sample, with the exact full-data quantiles alongside as the
    * error ledger. The sample is taken by md5 bucket of a stable row id —
    * reproducible across runs AND engines (so an approximate operator
    * passes an exact hash gate), and mergeable: the union of shard
    * samples IS the sample of the union, unlike rate-limited `df.sample`.
    * Quantiles use Spark's exact `percentile` (R-7, identical to DuckDB's
    * `quantile_cont`). At 100 TB the exact side is what stops scaling
    * (per-group value buffers); the hash-sampled side keeps the buffer at
    * rate × group size, tunable down to any memory budget.
    */
  def hashSampledQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      samplePercent: Int,
      qs: Seq[Double]
  ): DataFrame = {
    require(samplePercent > 0 && samplePercent <= 100, "need 0 < samplePercent <= 100")
    def tag(q: Double): String = s"p${(q * 100).round}"
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long") % 100
    val est = df
      .filter(bucket < samplePercent)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_sample"),
        qs.map(q => percentile(col(valueCol), lit(q)).as(s"est_${tag(q)}")): _*
      )
    val exact = df
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_total"),
        qs.map(q => percentile(col(valueCol), lit(q)).as(s"exact_${tag(q)}")): _*
      )
    est.join(exact, groupCol)
  }
}
