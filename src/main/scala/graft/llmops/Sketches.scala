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

  /** Deterministic count-min sketch (Cormode & Muthukrishnan 2005): `depth`
    * hash rows × `width` counters; value v increments counter
    * (j, md5-hash_j(v) mod width) for each row j. Returned as the sparse
    * (row_j, col_j, cnt) table — at most depth·width rows REGARDLESS of
    * corpus size, which is the 100 TB story: the two-phase hash agg's
    * map-side combine collapses each partition to sketch size before the
    * shuffle, and two sketches merge by adding counters (the same groupBy),
    * so per-shard sketches union exactly. Like KMV, the sketch is a pure
    * function of the data (seeded md5 row hashes, no RNG), so a cross-engine
    * oracle recomputes identical counters and the driver hash gate applies
    * to an approximate structure.
    */
  def cmsSketch(values: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1, "CMS needs depth >= 1")
    require(width >= 2, "CMS needs width >= 2")
    values
      .select(explode(array((0 until depth).map(lit): _*)).as("row_j"), col(valueCol).cast("string").as("__v"))
      .select(
        col("row_j").cast("long").as("row_j"),
        pmod(
          hash56(concat(col("row_j").cast("string"), lit(":"), col("__v"))),
          lit(width.toLong)
        ).as("col_j")
      )
      .groupBy("row_j", "col_j")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates from a count-min sketch: for each distinct value
    * in `queries`, cnt_est = min over the depth rows of that value's counter
    * (missing counter = 0). CMS guarantees cnt_est >= true count, with
    * overestimate bounded by ~(corpus size / width) per row; callers ship
    * the exact count alongside as the error ledger where affordable. The
    * sketch is broadcast (≤ depth·width rows), so the query side never
    * shuffles for the lookup; the only shuffle is the per-value min — query-
    * set-sized, not corpus-sized.
    */
  def cmsEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      valueCol: String,
      depth: Int,
      width: Int
  ): DataFrame =
    queries
      .select(col(valueCol), explode(array((0 until depth).map(lit): _*)).as("__j"))
      .select(
        col(valueCol),
        col("__j").cast("long").as("row_j"),
        pmod(
          hash56(concat(col("__j").cast("string"), lit(":"), col(valueCol).cast("string"))),
          lit(width.toLong)
        ).as("col_j")
      )
      .join(broadcast(sketch), Seq("row_j", "col_j"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cnt_est"))

  /** Per-shard count-min sketches in ONE corpus pass: identical to
    * [[cmsSketch]] with `shardCol` added to the group key, so every shard
    * owns an independent (row_j, col_j, cnt) table — the form a 1000-node
    * ingest emits per partition/day/source before [[cmsMerge]] folds them.
    */
  def cmsSketchBy(
      values: DataFrame,
      valueCol: String,
      shardCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    require(depth >= 1, "CMS needs depth >= 1")
    require(width >= 2, "CMS needs width >= 2")
    values
      .select(
        col(shardCol),
        explode(array((0 until depth).map(lit): _*)).as("row_j"),
        col(valueCol).cast("string").as("__v")
      )
      .select(
        col(shardCol),
        col("row_j").cast("long").as("row_j"),
        pmod(
          hash56(concat(col("row_j").cast("string"), lit(":"), col("__v"))),
          lit(width.toLong)
        ).as("col_j")
      )
      .groupBy(shardCol, "row_j", "col_j")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge count-min sketches by counter ADDITION — CMS's defining
    * algebra: the sketch of a union is the counter-wise sum of the
    * sketches. Input: any union of (row_j, col_j, cnt) tables (extra
    * shard columns dropped by the caller). Sketch-sized work only.
    */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("row_j", "col_j").agg(sum(col("cnt")).as("cnt"))

  /** Per-shard HLL register tables in one pass ([[hllRegisters]] with
    * `shardCol` in the group key); fold with [[hllMerge]].
    */
  def hllRegistersBy(
      values: DataFrame,
      valueCol: String,
      shardCol: String,
      p: Int
  ): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision p must be in [4, 16]")
    val h = hash56(col(valueCol))
    values
      .select(
        col(shardCol),
        shiftright(h, 56 - p).as("bucket"),
        h.bitwiseAND(lit(0xFFFFFFFFL)).as("__w")
      )
      .select(
        col(shardCol),
        col("bucket"),
        when(col("__w") === 0L, lit(33L))
          .otherwise(lit(33L) - length(conv(col("__w"), 10, 2)).cast("long"))
          .as("rho")
      )
      .groupBy(shardCol, "bucket")
      .agg(max(col("rho")).as("m_j"))
  }

  /** Merge HLL register tables by per-bucket MAX — idempotent and
    * order-free, so shard unions, retries, and re-merges all land on the
    * same registers. ≤ 2^p rows shuffle regardless of input count.
    */
  def hllMerge(registers: DataFrame): DataFrame =
    registers.groupBy("bucket").agg(max(col("m_j")).as("m_j"))

  /** Raw HLL estimate from a REGISTER table (the mergeable form) — the
    * lookup half of [[hllDistinctEstimate]], for callers that maintain
    * registers incrementally via [[hllMerge]]. Same exact-integer harmonic
    * sum; absent buckets count M_j = 0 via the dense 2^p scaffold.
    */
  def hllEstimateFromRegisters(registers: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val all = registers.sparkSession
      .range(m)
      .select(col("id").as("bucket"))
      .join(registers, Seq("bucket"), "left")
      .select(coalesce(col("m_j"), lit(0L)).as("m_j"))
    all
      .agg(sum(expr("shiftleft(1L, CAST(33 - m_j AS INT))")).as("__s"))
      .select((lit(hllAlphaScaled(p)) / col("__s").cast("double")).as("n_distinct_est"))
  }

  /** HyperLogLog registers (Flajolet et al. 2007) over a value column:
    * bucket = top `p` bits of the 56-bit md5 hash point, rho = 1 + number of
    * leading zeros in the low 32 bits (the rank window), register M_j =
    * max rho per bucket. The register table is the MERGEABLE form — two
    * sketches union by per-bucket max (idempotent, order-free), which is
    * exactly what the groupBy's map-side partial max already does per
    * partition, so the shuffle carries ≤ 2^p rows per partition at any
    * corpus size. Deterministic (md5, no RNG): both engines derive
    * identical registers, so the driver hash gate covers the sketch.
    * rho is computed from the BINARY-DIGIT COUNT of the rank window
    * (33 - bitlength via base-2 string length) — integer-exact, no
    * floating log2 near power-of-two boundaries.
    */
  def hllRegisters(values: DataFrame, valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision p must be in [4, 16]")
    val h = hash56(col(valueCol))
    values
      .select(shiftright(h, 56 - p).as("bucket"), h.bitwiseAND(lit(0xFFFFFFFFL)).as("__w"))
      .select(
        col("bucket"),
        when(col("__w") === 0L, lit(33L))
          .otherwise(lit(33L) - length(conv(col("__w"), 10, 2)).cast("long"))
          .as("rho")
      )
      .groupBy("bucket")
      .agg(max(col("rho")).as("m_j"))
  }

  /** Raw HyperLogLog distinct estimate: alpha_m · m² / Σ_j 2^(−M_j) over all
    * m = 2^p buckets (absent buckets count M_j = 0). The harmonic sum is
    * kept EXACT-INTEGER — Σ 2^(33−M_j) as a long (≤ 2^(33+p), safe for
    * p ≤ 16) — with a single trailing double division, so the estimate is
    * deterministic under any aggregation order (a naive Σ 2^−M_j double sum
    * spans 2^56 in magnitude and is order-dependent). Implements the RAW
    * branch only: callers choose p so the expected cardinality is well above
    * 2.5·m (no linear-counting small-range correction — `ln` is not
    * bit-portable across engines; KMV [[kmvDistinctEstimate]] covers the
    * small regime exactly). Ship the exact count alongside as the error
    * ledger where affordable; standard error ≈ 1.04/√m.
    */
  def hllDistinctEstimate(values: DataFrame, valueCol: String, p: Int): DataFrame =
    hllEstimateFromRegisters(hllRegisters(values, valueCol, p), p)

  /** alpha_m · m² · 2^33 — the numerator of the raw HLL estimate with the
    * integer harmonic sum as denominator. Public constants from Flajolet
    * et al. 2007 §4; exposed so oracle SQL can embed the identical double
    * literal (toString round-trips, so both engines parse the same bits).
    */
  private[graft] def hllAlphaScaled(p: Int): Double = {
    val m = (1 << p).toDouble
    val alpha =
      if (p == 4) 0.673
      else if (p == 5) 0.697
      else if (p == 6) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * 8589934592.0
  }

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
