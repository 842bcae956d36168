package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the correctness baseline,
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Scale notes:
  *   - brute-force is O(n²) — correct and fine up to ~10⁴ vectors per
  *     partition-side; it exists as the baseline/oracle and for re-ranking
  *     candidate sets. At 100 TB use `lshTopK` (bucketed join) or shard the
  *     brute force per LSH bucket.
  *   - cosine math is done in double with a single left-to-right
  *     `aggregate` pass — deterministic for a given element order.
  *   - hyperplanes are pseudo-random from a fixed seed and ride into the
  *     plan as literals: no fit step, no driver collect, identical across
  *     executors by construction. Because they are plan literals, the
  *     driver's DuckDB oracle can replay the *same* algorithm in SQL (same
  *     planes, same bucket keys, same re-rank) — the approximate operators
  *     are hash-verified cross-engine, not merely spot-checked.
  *   - cache lifecycle: intermediate projections that are read twice
  *     (banded keys, probed cells) are snapshotted with
  *     `localCheckpoint(eager = true)` instead of `persist()`. The blocks
  *     live in the block manager and are released by the ContextCleaner
  *     when the returned DataFrame is garbage-collected — a library user
  *     never needs `spark.catalog.clearCache()`. (Trade-off: local
  *     checkpoints don't survive executor loss; for a multi-hour 100 TB
  *     job prefer `checkpoint()` with a reliable dir — same shape.)
  *
  * Recall physics worth stating honestly (and why the registered queries
  * also publish recall, SQL-verified): sign-LSH collision probability for a
  * pair at angle θ is (1 − θ/π)^r per table, and low thresholds on
  * near-orthogonal data are the hard regime. Multi-probe (probeBits > 0)
  * XORs flip masks into the query-side key — extra bucket lookups per
  * (vector, table), zero extra dot products; `probeDepth = 2` adds the
  * 2-bit flips (Lv et al.'s perturbation sets, sign-LSH form). Measured on
  * the driver corpus: pair recall 71% → 100% at τ=0.4 (8 tables × 4 bits,
  * depth 1); top-5 recall 32% → 88% (6 bits, depth 1) → 99% (5 bits,
  * depth 2). The driver-verified `llm_cosine_recall` / `llm_ann_recall`
  * queries keep those numbers in the open, and the oracle replays the
  * identical mask set.
  */
object Similarity {

  /** Dot product of two numeric-array columns, accumulated left-to-right
    * in double (native expression; [[dotHof]] is the bit-identical HOF
    * reference).
    */
  def dot(a: Column, b: Column): Column = graft.functions.native.arrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision (native expression; identical
    * accumulation order to `dotHof`-based cosine — the spec asserts bit
    * equality).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.native.arrayCosine(a, b)

  /** HOF reference formulation of [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  /** HOF reference formulation of [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Brute-force cosine top-k self-join: every pair within `df`, ranked per
    * query vector. Baseline only — see scaladoc for the 100 TB path.
    *
    * k == 1 specializes to a hash aggregation (`max` over a
    * (cos, tie-break) struct): partial map-side agg instead of sorting the
    * full pair set through a window — same deterministic result (highest
    * cosine, lowest nid on ties).
    */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = df.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val c = df.select(col(idCol).as("nid"), col(vecCol).as("__cv"))
    val pairs = q
      .join(c, col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    if (k == 1) {
      pairs
        .groupBy("qid")
        .agg(max(struct(col("cos"), (-col("nid")).as("__tb"), col("nid").as("nid"))).as("__m"))
        .select(col("qid"), col("__m.nid").as("nid"), lit(1L).as("rank"), col("__m.cos").as("cos"))
    } else {
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
      pairs
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("qid", "nid", "rank", "cos")
    }
  }

  /** Deterministic random hyperplanes (seeded) as a plan literal.
    *
    * PREFIX-CONSISTENT by construction: the seeded generator fills plane 0
    * completely before plane 1, so `hyperplanes(p, d, s)` is exactly the
    * first `p` rows of `hyperplanes(P, d, s)` for any P >= p. The
    * auto-sized LSH oracle depends on this — it embeds a capped plane set
    * as SQL literals and gates each sign bit on the data-derived plane
    * count, which only replays the Spark plan if prefixes agree (asserted
    * by LlmOpsSpec).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Knob sentinel: `planesPerTable = AutoPlanes` (0) asks the LSH entry
    * points to size the key width from the data via [[suggestedPlanes]].
    */
  val AutoPlanes: Int = 0

  /** Knob sentinel: `dim = AutoDim` (0) asks the LSH entry points to infer
    * the embedding dimensionality with a one-row probe job. Callers that
    * know their dim (any production pipeline does — it's a model constant)
    * pass it explicitly and the ANN plan launches zero driver probe jobs.
    */
  val AutoDim: Int = 0

  /** Smallest key width (planes per table) that keeps the EXPECTED sign
    * bucket occupancy n/2^planes at or below `targetBucket`: the integer
    * form of ceil(log2(n / targetBucket)), clamped to >= 1.
    *
    * Why this is the scale knob that must NOT be fixed: at a fixed width,
    * bucket occupancy grows linearly in n, so candidate pairs grow ~n² —
    * the round-7 shuffle audit measured 13-15× candidate-shuffle growth
    * across the gate SFs at fixed knobs. Sizing the width so expected
    * occupancy stays ~targetBucket bounds RAW candidate volume at
    * n·tables·masks·targetBucket — linear in n BY CONSTRUCTION (measured:
    * bench_results/round8_lsh_knobs.md, including the honest caveats —
    * distinct-candidate counts saturate at n² on small corpora, and on
    * STRUCTURELESS data 99%-class recall inherently needs near-all-pairs
    * candidates; on clusterable data — real embeddings — deep keys hold
    * recall 1.0 while candidates track true near-pair density).
    *
    * Pure integer arithmetic (a doubling loop, no floating log): the
    * DuckDB oracle replays the identical count with integer shifts, so a
    * one-ULP log2 difference at a power-of-two boundary can never split
    * the engines.
    *
    * The recall trade is real and priced by the ledgers: a wider key
    * lowers per-table collision probability, so auto-sizing keeps recall
    * ledgers (`llm_ann_recall`) registered at the same knobs — recall is
    * a measured, driver-verified number, never assumed.
    */
  def suggestedPlanes(n: Long, targetBucket: Long = 32L): Int = {
    require(n > 0, "suggestedPlanes needs a positive row count")
    require(targetBucket > 0, "targetBucket must be positive")
    var p = 1
    while (p < 62 && (targetBucket << p) < n) p += 1
    p
  }

  /** Resolve the effective key width: explicit when > 0, else
    * [[suggestedPlanes]] from a count of `base` (ids+vectors projection —
    * one cheap job, amortized across the whole candidate build).
    */
  private def resolvePlanes(base: DataFrame, planesPerTable: Int, targetBucket: Long): Int =
    if (planesPerTable > 0) planesPerTable
    else suggestedPlanes(base.count(), targetBucket)

  /** The classic IVF cell-count rule: smallest c >= 1 with c² >= n
    * (⌈√n⌉), making candidates per query ~nprobe·√n — sublinear in corpus
    * size at FIXED nprobe, where a fixed cell count degrades to
    * O(n·nprobe/cells). Integer-exact (FP sqrt only seeds the search; the
    * two fix-up loops settle the boundary), so the DuckDB oracle replays
    * the identical count with integer comparisons — same contract as
    * [[suggestedPlanes]]. The recall trade at fixed nprobe (probed
    * fraction shrinks as n grows) is priced by the registered ledgers; on
    * structureless data flat IVF recall falls with corpus size by nature
    * (bench_results/round8_lsh_knobs.md discusses the regime), while
    * clustered corpora keep recall through [[kmeansCentroids]].
    */
  def suggestedCells(n: Long): Int = {
    require(n > 0, "suggestedCells needs a positive row count")
    var c = math.max(1L, math.sqrt(n.toDouble).floor.toLong - 1L)
    while (c * c < n) c += 1
    while (c > 1 && (c - 1) * (c - 1) >= n) c -= 1
    c.toInt
  }

  /** Knob sentinel: `cells = AutoCells` (0) asks the cell-bucketed entry
    * points ([[semDedup]]) to size the cell count from the data via
    * [[suggestedCells]] — the same fixed-knob-degrades-quadratically story
    * as [[AutoPlanes]]: within-cell pair work is O(Σ cell_size²), so a
    * FIXED cell count makes per-cell population — and with it pair work —
    * grow linearly in n (quadratically in aggregate), where ⌈√n⌉ cells
    * keep expected within-cell pair work ~n·√n-bounded.
    */
  val AutoCells: Int = 0

  /** Resolve the effective cell count: explicit when > 0, else
    * [[suggestedCells]] from a count of `base` (one cheap job, amortized
    * across the fit + assignment + pair join).
    */
  private def resolveCells(base: DataFrame, cells: Int): Int =
    if (cells > 0) cells else suggestedCells(base.count())

  /** Knob sentinel: `maxCell = AutoMaxCell` (−1) asks [[semDedup]] to size
    * the skew cap from the data: 4·⌈n/cells⌉ — four times the MEAN cell
    * occupancy (integer ceiling, no floating point — the [[suggestedCells]]
    * /auto-LSH boundary-exactness contract). Balanced-within-4× cells fit
    * one block (identical results to the exact rule); a degenerate cell's
    * pair work is bounded at cap² per block. 0 opts out (exact baseline).
    */
  val AutoMaxCell: Int = -1

  /** The [[AutoMaxCell]] rule, exposed for its oracle replay and spec. */
  def autoMaxCell(n: Long, cells: Int): Int = {
    require(n > 0 && cells > 0, "autoMaxCell needs positive n and cells")
    (4L * ((n + cells - 1) / cells)).toInt
  }

  /** Sign-bit signature under `planes`: bit p = (v · plane_p) > 0. */
  def planeSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeLit = array(plane.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** XOR probe masks for multi-probe LSH: the identity, every 1-bit flip
    * among the first `probeBits` key bits, and — at `probeDepth >= 2` —
    * every 2-bit flip. Shared by the Spark plan and the DuckDB oracle
    * generator so the replay probes the exact same buckets.
    */
  private[graft] def probeMasks(probeBits: Int, probeDepth: Int): Seq[Long] = {
    val singles = (0 until probeBits).map(p => 1L << p)
    val pairs =
      if (probeDepth >= 2)
        for { i <- 0 until probeBits; j <- (i + 1) until probeBits } yield (1L << i) | (1L << j)
      else Seq.empty[Long]
    0L +: (singles ++ pairs)
  }

  /** LSH candidate pairs for `base` = (__id, __v): vectors sharing a sign
    * bucket in any of `tables` independent hash tables, as bare (qid, nid)
    * id pairs with qid != nid — the shared generator behind [[lshTopK]] and
    * [[cosineNearDupPairs]].
    *
    * The banded (id, table, key) projection is read by both sides of the
    * candidate self-join, so it is snapshotted with an eager local
    * checkpoint (ids + keys only — the wide embedding arrays never ride
    * through the candidate shuffle/dedup); the snapshot is freed by the
    * ContextCleaner once unreferenced — no session-level cache is left
    * behind. The candidate pair set itself is consumed exactly once
    * downstream, so it stays lazy (a snapshot there would be a pure extra
    * materialization pass).
    */
  /** Embedding dimensionality probe (one driver job on one row), with a
    * named failure instead of a bare NoSuchElementException on an empty
    * table. Only runs at `dim = AutoDim`; explicit-dim callers skip it.
    */
  private def probeDim(base: DataFrame): Int = {
    probeDimCalls.incrementAndGet()
    val row = base.select(size(col("__v"))).limit(1).collect()
    require(row.nonEmpty, "cannot infer embedding dimensionality from an empty vector table")
    row(0).getInt(0)
  }

  /** Count of dim-probe driver jobs launched on this JVM — observability
    * for the no-probe gate (every registered ANN query passes `dim`
    * explicitly, so the ANN family must leave this untouched).
    */
  private[graft] val probeDimCalls = new java.util.concurrent.atomic.AtomicLong(0L)

  private[llmops] def resolveDim(base: DataFrame, dim: Int): Int =
    if (dim > 0) dim else probeDim(base)

  /** Sign-bucket keys for every (vector, table) pair, snapshotted (both
    * the probe side and the index side read it).
    */
  private def bandedKeys(base: DataFrame, tables: Int, planesPerTable: Int, seed: Long, dim: Int): DataFrame = {
    val keysPerTable: Seq[Column] = (0 until tables).map { t =>
      planeSignature(col("__v"), hyperplanes(planesPerTable, dim, seed + t))
    }
    base
      .select(col("__id"), posexplode(array(keysPerTable: _*)).as(Seq("__table", "__key")))
      .localCheckpoint(true)
  }

  /** Multi-probe expansion (Lv et al., VLDB'07): the query side also
    * probes the `probeBits` buckets up to `probeDepth` sign-flips away —
    * pure XOR arithmetic on the already-computed key, no extra dot
    * products; the index side stays at base keys, so recall rises at the
    * cost of extra equi-join lookups per (vector, table), never a wider
    * scan.
    */
  private def probeExpand(banded: DataFrame, probeBits: Int, probeDepth: Int): DataFrame =
    if (probeBits <= 0) banded
    else {
      val flips = probeMasks(probeBits, probeDepth).map(lit)
      banded.select(
        col("__id"),
        col("__table"),
        explode(array(flips.map(f => col("__key").bitwiseXOR(f)): _*)).as("__key")
      )
    }

  private[graft] def lshCandidates(
      base: DataFrame,
      tables: Int,
      planesPerTable: Int,
      seed: Long,
      probeBits: Int = 0,
      probeDepth: Int = 1,
      dim: Int = AutoDim
  ): DataFrame = {
    // hyperplane dimensionality must match the data: a wrong dim nulls the
    // signature dots (ArrayDot rejects length mismatches). Explicit `dim`
    // skips the probe job entirely.
    val d = resolveDim(base, dim)
    val banded = bandedKeys(base, tables, planesPerTable, seed, d)
    val a = probeExpand(banded, probeBits, probeDepth)
      .select(col("__table"), col("__key"), col("__id").as("qid"))
    val b = banded.select(col("__table").as("__t2"), col("__key").as("__k2"), col("__id").as("nid"))
    a.join(b, col("__table") === col("__t2") && col("__key") === col("__k2") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")
  }

  /** LSH-bucketed approximate top-k: multiple independent hash tables
    * (band = one table of `planesPerTable` sign bits); vectors sharing a
    * bucket in any table become candidates; candidates are exact-ranked by
    * cosine. Recall grows with `tables`; all joins are bucketed equi-joins.
    *
    * `planesPerTable = AutoPlanes` (0) sizes the key width from the data
    * ([[suggestedPlanes]] at `targetBucket`) so expected bucket occupancy
    * — and with it candidate-shuffle volume per row — stays constant as
    * the corpus grows, instead of the fixed-knob ~n² candidate blowup.
    * `probeBits` above the effective width is clamped (flipping a bit the
    * index side never sets can only probe empty buckets — identical
    * result, wasted lookups).
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      planesPerTable: Int = AutoPlanes,
      seed: Long = 42L,
      probeBits: Int = 0,
      probeDepth: Int = 1,
      targetBucket: Long = 32L,
      dim: Int = AutoDim
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val planes = resolvePlanes(base, planesPerTable, targetBucket)
    val candidates = lshCandidates(base, tables, planes, seed, math.min(probeBits, planes), probeDepth, dim)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    candidates
      // candidate-vector fetch first, query-vector fetch LAST: the final
      // join's hash(qid) partitioning satisfies the rank window — one
      // exchange fewer per top-k (round 18; inner joins commute)
      .join(base.select(col("__id").as("nid"), col("__v").as("__cv")), "nid")
      .join(base.select(col("__id").as("qid"), col("__v").as("__qv")), "qid")
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }

  /** Cross-table LSH top-k: approximate `k` nearest `corpus` vectors for
    * every `queries` vector — the retrieval shape (query set ⋈ corpus),
    * where [[lshTopK]] is the self-join shape (near-neighbor graph over
    * one table). Embedding-based benchmark decontamination, eval-set
    * retrieval, and hard-negative mining all consume this form: the query
    * side is typically orders of magnitude smaller than the corpus, so
    * banding it (plus multi-probe expansion) is cheap while the corpus is
    * banded once at base keys and joined by bucket — identical scale shape
    * to [[lshTopK]], no corpus self-join, no BNLJ.
    *
    * Both sides must carry `idCol`/`vecCol` with the same embedding
    * dimensionality (a mismatch nulls the signature dots — ArrayDot
    * rejects length mismatches — and the query returns nothing rather
    * than garbage). Ids may overlap across tables: a query matching its
    * own corpus copy is reported (rank 1, cos 1.0) — callers that index
    * the query set itself filter `qid =!= nid` downstream.
    */
  /** Two-sided (retrieval-shaped) LSH candidate pairs: query side banded
    * and multi-probe-expanded, corpus side banded once at base keys,
    * joined by bucket — the shared generator behind [[lshTopKAgainst]] and
    * [[cosineNearDupAgainst]]. Width from the CORPUS side when auto
    * (occupancy — hence candidate volume — is driven by the indexed side;
    * the query side only probes).
    */
  private[graft] def lshCandidatesAgainst(
      qbase: DataFrame,
      cbase: DataFrame,
      tables: Int,
      planesPerTable: Int,
      seed: Long,
      probeBits: Int,
      probeDepth: Int,
      targetBucket: Long,
      dim: Int
  ): DataFrame = {
    val planes = resolvePlanes(cbase, planesPerTable, targetBucket)
    val effBits = math.min(probeBits, planes)
    val d = resolveDim(cbase, dim)
    val a = probeExpand(bandedKeys(qbase, tables, planes, seed, d), effBits, probeDepth)
      .select(col("__table"), col("__key"), col("__id").as("qid"))
    val b = bandedKeys(cbase, tables, planes, seed, d)
      .select(col("__table").as("__t2"), col("__key").as("__k2"), col("__id").as("nid"))
    a.join(b, col("__table") === col("__t2") && col("__key") === col("__k2"))
      .select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")
  }

  def lshTopKAgainst(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      planesPerTable: Int = AutoPlanes,
      seed: Long = 42L,
      probeBits: Int = 0,
      probeDepth: Int = 1,
      targetBucket: Long = 32L,
      dim: Int = AutoDim
  ): DataFrame = {
    val qbase = queries.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cbase = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val candidates =
      lshCandidatesAgainst(qbase, cbase, tables, planesPerTable, seed, probeBits, probeDepth, targetBucket, dim)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    candidates
      // corpus-vector fetch first, query-vector fetch LAST — the window
      // rides the final join's hash(qid) exchange (round 18)
      .join(cbase.select(col("__id").as("nid"), col("__v").as("__cv")), "nid")
      .join(qbase.select(col("__id").as("qid"), col("__v").as("__qv")), "qid")
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }

  /** IVF-style approximate top-k: a deterministic coarse quantizer (the
    * `cells` vectors with the smallest ids act as centroids — no k-means
    * fit, no driver collect) assigns every vector to its nearest cell;
    * queries probe their `nprobe` nearest cells; candidates are exact-ranked
    * by cosine within probed cells.
    *
    * Scale shape: the vectors⋈centroids assignment is a broadcast join
    * (centroids are tiny), the candidate join is a bucketed equi-join on
    * cell id — the O(n²) scan becomes O(n²/cells × nprobe). Swap the
    * centroid selection for a real k-means fit when vectors are clustered;
    * the join structure is unchanged.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 2
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val centroids =
      base.orderBy("__id").limit(cells)
        .select(col("__id").as("__cid"), col("__v").as("__cv"))
    // nearest `nprobe` cells per vector (rank 1 = home cell for indexing),
    // map-side since round 18 (no cells× corpus shuffle — see the
    // assignment block comment below); snapshotted because both the index
    // side and the query side read it.
    val probed = explodeTopCells(base, centroids, col("__v"), nprobe, Seq(col("__id"), col("__v")))
      .select(col("__id"), col("__v"), col("__cid"), col("__crank"))
      .localCheckpoint(true)
    ivfProbeRank(probed, k)
  }

  /** Cross-table IVF top-k — the standard vector-index query mode: the
    * corpus is indexed ONCE (each vector filed in its home cell under the
    * deterministic smallest-id coarse quantizer, as [[ivfTopK]]), and the
    * query table — not part of the index — probes its `nprobe` nearest
    * cells. Candidates are the cell-id equi-join, exact-ranked by cosine.
    * Same scale shape as [[ivfTopK]]: broadcast centroid assignment, then
    * O(|q|·|corpus|/cells × nprobe) bucketed candidates instead of the
    * brute O(|q|·|corpus|). Recall behavior matches [[ivfTopK]] at the
    * same (cells, nprobe) — see `llm_ann_recall`; for clustered corpora,
    * fit real centroids with [[kmeansCentroids]] (public) and feed the
    * same probe join. Ids may overlap across tables: a query matching its
    * own corpus copy is reported (callers filter `qid =!= nid` if the
    * query set is indexed too).
    */
  def ivfTopKAgainst(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 2
  ): DataFrame = {
    val cbase = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val qbase = queries.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val centroids =
      cbase.orderBy("__id").limit(cells)
        .select(col("__id").as("__cid"), col("__v").as("__cv"))
    def assign(b: DataFrame, n: Int): DataFrame =
      explodeTopCells(b, centroids, col("__v"), n, Seq(col("__id"), col("__v")))
        .select(col("__id"), col("__v"), col("__cid"))
        .localCheckpoint(true)
    val indexed = assign(cbase, 1).select(col("__cid"), col("__id").as("nid"), col("__v").as("__cvv"))
    val probes = assign(qbase, nprobe).select(col("__cid").as("__qcid"), col("__id").as("qid"), col("__v").as("__qv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    probes
      .join(indexed, col("__qcid") === col("__cid"))
      .withColumn("cos", cosine(col("__qv"), col("__cvv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }

  /** Shared IVF tail: given the probed (__id, __v, __cid, __crank) cell
    * assignments, join queries (all probed cells) against the index side
    * (home cell only) on cell id and exact-rank candidates by cosine.
    */
  private def ivfProbeRank(probed: DataFrame, k: Int): DataFrame = {
    val indexed =
      probed.filter(col("__crank") === 1).select(col("__cid"), col("__id").as("nid"), col("__v").as("__cvv"))
    val queries = probed.select(col("__cid").as("__qcid"), col("__id").as("qid"), col("__v").as("__qv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    queries
      .join(indexed, col("__qcid") === col("__cid") && col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qv"), col("__cvv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }

  /** Deterministic spherical k-means centroids (fixed Lloyd iterations)
    * over int8-quantized vectors — the "real fit" upgrade to [[ivfTopK]]'s
    * identity quantizer for clustered data.
    *
    * Everything is engine-replayable, which is what makes the fit
    * verifiable rather than trusted:
    *   - vectors are symmetric-int8 quantized per row
    *     ([[Embeddings.quantizeInt8]]) so the update step's per-dimension
    *     means are exact integer sums into ONE IEEE division — identical
    *     under any partitioning or reduction order (a float mean is not);
    *   - init is the `cells` vectors first in portable md5-hash order
    *     (seeded — same ordering expression evaluates in DuckDB);
    *   - `iters` is a FIXED count (no convergence test — a data-dependent
    *     stop would make the plan shape data-dependent);
    *   - assignment is argmax cosine with a cid tie-break.
    *
    * Scale shape per iteration: one broadcast of `cells` centroids against
    * the quantized base (map-side argmax via `max_by`, no window), one
    * (cells × dim)-row aggregation for the update. The quantized base is
    * snapshotted once with an eager local checkpoint and reused by every
    * iteration; centroid sets are snapshotted because iteration N+1's plan
    * would otherwise recompute iteration N from scratch (lineage doubles
    * per iteration without it). Empty cells simply drop out (both engines
    * replay that identically).
    *
    * `fitSamplePercent` < 100 fits on a deterministic md5-bucket sample of
    * the corpus (same RNG-free idiom as
    * [[graft.llmops.Corpus.stratifiedSampleByHash]]) — the standard move
    * at 100 TB, where two extra full-corpus passes just to place `cells`
    * centroids is wasted I/O: centroid positions converge on a sample
    * orders of magnitude smaller than the corpus, and the full corpus
    * still gets assigned/probed exactly as before (only the FIT sees the
    * sample; callers' assignment joins are unchanged). The sample must
    * still contain at least `cells` rows — ENFORCED with a named error
    * (one cheap count on the checkpointed sample), never a silent
    * fewer-centroids degradation. Default 100 = fit on everything
    * (bit-identical to the pre-knob behavior, and what the registered
    * oracle replays).
    */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int = 16,
      iters: Int = 2,
      seed: Long = 42L,
      fitSamplePercent: Int = 100
  ): DataFrame = {
    require(cells > 0 && iters >= 0, "cells must be positive, iters non-negative")
    require(
      fitSamplePercent > 0 && fitSamplePercent <= 100,
      "fitSamplePercent must be in (0, 100]"
    )
    val qvd = transform(Embeddings.quantizeInt8(col(vecCol)), x => x.cast("double"))
    val sampled =
      if (fitSamplePercent == 100) df
      else {
        val bucket = conv(
          substring(md5(concat_ws(":", lit("fit"), lit(seed.toString), col(idCol).cast("string"))), 1, 8),
          16,
          10
        ).cast("long") % 100
        df.filter(bucket < fitSamplePercent)
      }
    val qbase = sampled.select(col(idCol).as("__id"), qvd.as("__qv")).localCheckpoint(true)
    // Enforce the documented invariant instead of silently degrading: a
    // too-aggressive fitSamplePercent (or an empty input) would otherwise
    // produce fewer than `cells` centroids via the init below and quietly
    // change ivfTopKKmeans' nprobe semantics. One cheap guard job on the
    // already-checkpointed sample — it ships `cells` INTs (the projected
    // vector sizes), and the first row doubles as the dimensionality
    // probe the fused update aggregation below needs (round 19): same
    // single job the former `limit(cells).count()` guard paid.
    val guard = qbase.limit(cells).select(size(col("__qv")).as("__d")).collect()
    val sampleRows = guard.length
    require(
      sampleRows == cells,
      s"kmeansCentroids: fit sample has only $sampleRows rows but cells=$cells — " +
        s"raise fitSamplePercent (=$fitSamplePercent) or lower cells"
    )
    val d = guard.head.getInt(0)
    val h = conv(
      substring(md5(concat_ws(":", lit(seed.toString), col("__id").cast("string"))), 1, 8),
      16,
      10
    ).cast("long")
    // Seeded init = the `cells` smallest rows by (md5 hash, id), cid in
    // that order. One bounded aggregation pass (round 19): Spark's own
    // bottom-k collector with map-side partial aggregation — ≤ cells
    // rows of state per task, ONE exchange of tasks×cells rows — where
    // the former orderBy+limit+window form paid a TakeOrdered pass PLUS
    // a single-partition window (two plan stages for the same rows).
    // Ordering is identical: struct (h, id, qv) compares h then the
    // unique id, so the selected set and its order match
    // orderBy(__h, __id).limit(cells) exactly.
    val init = qbase
      .withColumn("__h", h)
      .groupBy()
      .agg(
        sort_array(
          graft.functions.native.collectBottomK(struct(col("__h"), col("__id"), col("__qv")), cells)
        ).as("__top")
      )
      .select(posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("__p").cast("int").as("__cid"), col("__e.__qv").as("__cv"))
    // NO eager checkpoint between rounds (round 11): each round's
    // centroid table is `cells` rows and rides into the next round as a
    // broadcast exchange, so the whole fit collapses into the consumer's
    // single job DAG — the former round-by-round localCheckpoints cost a
    // scheduled job each (~0.5 s fixed overhead per round at bench scale)
    // and bought nothing at practical `iters`. qbase (read every round)
    // stays checkpointed above; callers broadcast the returned centroids,
    // which materializes the fit exactly once.
    //
    // Assignment is MAP-SIDE since round 18: the pre-r18 round scored
    // cells via crossJoin(broadcast) and re-grouped by vector id (map-
    // side max_by, but still one full-corpus exchange per round, vector
    // payload included). The argmax is a pure per-row function of the
    // broadcast centroids, so it now rides a transform lambda
    // ([[bestCellCol]] — identical (sim desc, cid asc) ordering as the
    // former max_by struct) and the only exchange per round is the
    // partial-aggregated update — the corpus is read, never shuffled.
    //
    // Update aggregation is ONE exchange per round (round 19): per-dim
    // running sums as `d` codegen'd sum() aggregates over element_at —
    // the former posexplode + groupBy(cid, dim) + regroup-to-array shape
    // paid TWO exchanges per round and pushed dim× the rows through the
    // partial hash agg just to reassemble the array it exploded. Shuffled
    // state per task: cells rows × (d sums + count) — the same bytes as
    // before in dim× fewer rows.
    // int8 values summed as integral doubles: exact below 2^53 — no
    // reduction-order dependence (per-dim sums are identical to the
    // exploded form's), and the single division is the only rounding
    // step, performed once per (cell, dim) in both shapes.
    val sumCols = (0 until d).map(i => sum(element_at(col("__qv"), i + 1)).as(s"__s$i"))
    (1 to iters).foldLeft(init) { (centroids, _) =>
      qbase
        .withColumn("__one", oneKey(col("__id")))
        .join(centroidEntriesRow(centroids), Seq("__one"))
        .select((-bestCellCol(col("__qv")).getField("__ncid")).cast("int").as("__cid"), col("__qv"))
        .groupBy("__cid")
        .agg(count(lit(1)).as("__n"), sumCols: _*)
        .select(col("__cid"), array((0 until d).map(i => col(s"__s$i") / col("__n")): _*).as("__cv"))
    }
  }

  /** IVF top-k with k-means centroids ([[kmeansCentroids]]): cell
    * assignment/probing runs on the quantized vectors (consistent with the
    * space the centroids were fit in); the final candidate ranking is
    * exact cosine on the ORIGINAL vectors. Join structure is identical to
    * [[ivfTopK]] — broadcast assignment, bucketed equi-join on cell id —
    * only the centroid source differs, which is exactly the upgrade the
    * [[ivfTopK]] scaladoc promises for clustered data.
    *
    * EMPTY-CELL INVARIANT (when `cells` exceeds the data's distinct
    * cluster count): [[kmeansCentroids]] drops a cell whose assignment set
    * empties during an update — deterministically, identically in both
    * engines — so the index can hold FEWER than `cells` cells and `nprobe`
    * then probes a larger fraction of the corpus than `nprobe/cells`
    * suggests (recall rises, candidate volume rises with it). Spec-covered
    * (LlmOpsSpec "kmeans empty cells"); size `cells` below the expected
    * cluster count if candidate volume must stay bounded.
    */
  def ivfTopKKmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 2,
      iters: Int = 2,
      seed: Long = 42L,
      fitSamplePercent: Int = 100
  ): DataFrame = {
    val base = df.select(
      col(idCol).as("__id"),
      col(vecCol).as("__v"),
      transform(Embeddings.quantizeInt8(col(vecCol)), x => x.cast("double")).as("__qv")
    )
    val centroids =
      kmeansCentroids(df, idCol, vecCol, cells, iters, seed, fitSamplePercent)
    val probed = explodeTopCells(base, centroids, col("__qv"), nprobe, Seq(col("__id"), col("__v")))
      .select(col("__id"), col("__v"), col("__cid"), col("__crank"))
      .localCheckpoint(true)
    ivfProbeRank(probed, k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup inside
    * k-means cells. Near-dup pairs are only sought WITHIN a cell — the
    * pair join is a bucketed equi-join on cell id, never all-pairs — and
    * of each duplicate group the doc with the LOWEST centroid similarity
    * survives (the paper's keep-the-least-prototypical rule: it preserves
    * diversity, dropping the redundant cluster-core copies).
    *
    * Greedy pairwise form (the same survivor rule family as
    * [[Dedup.dropNearDuplicates]]): a doc is dropped iff some same-cell
    * neighbor at cosine >= tau is more keepable — (csim, id)
    * lexicographically smaller. On a duplicate clique this keeps exactly
    * the (csim, id)-minimal element; on chains it keeps every local
    * minimum (deterministic in both engines, SQL-replayable).
    *
    * Scale shape: centroid assignment is a broadcast join (cells rows);
    * the pair search shuffles on cell id only — but the per-task pair
    * work is O(Σ cell_size²), so `cells` MUST scale with the corpus: at a
    * fixed cell count, within-cell population grows linearly in n and the
    * pair join degrades to ~n²/cells (the paper runs ~10⁵ clusters at
    * LAION scale for exactly this reason). The default is therefore
    * [[AutoCells]] — ⌈√n⌉ cells via [[suggestedCells]], the IVF family's
    * rule, bounding expected within-cell pair work at ~n·√n; pass an
    * explicit `cells` only when the true cluster count is known.
    * Assignment runs on the quantized vectors (the space the centroids
    * were fit in); the pair cosine is exact on the ORIGINAL vectors —
    * both consistent with the IVF family.
    *
    * SKEW CAP (`maxCell`): AutoCells bounds EXPECTED within-cell pair
    * work at ~n·√n, but a skewed corpus can still blow one cell — a
    * degenerate centroid that catches a constant fraction of the corpus
    * makes that cell's pair join quadratic regardless of the cell count
    * (the same failure mode `maxDf` guards in [[Dedup.containmentJoin]]).
    * With `maxCell` set, each cell's members are ranked by (csim desc, id)
    * and pairs are only sought within consecutive blocks of `maxCell`
    * rows ("similarity-ordered blocking"): per-task pair work is bounded
    * at maxCell² per block and total pair work at n·maxCell, whatever the
    * skew. Recall degrades only across block boundaries, and the ordering
    * is chosen to make that rare: near-duplicate vectors have near-equal
    * centroid similarity, so they land in the same block unless they
    * straddle a boundary. The rank window is per-CELL (one task sorts one
    * cell, O(P log P)) — never a global sort.
    *
    * The cap is ON BY DEFAULT ([[AutoMaxCell]]): `maxCell` auto-sizes to
    * 4·⌈n/cells⌉ — four times the MEAN cell occupancy, so on a corpus
    * whose cells stay within 4× of balanced every cell is a single block
    * and the result is IDENTICAL to the exact rule, while a degenerate
    * cell (the measured failure mode: 57.3 s → 1.65 s at one 32k-row
    * cell, bench_results/round12_shuffle_notes.md) gets blocked. Recall
    * price of blocking under worst-case skew was driver-verified at
    * 96.0–96.6% per-doc fate agreement (`llm_semdedup_cap_ledger`). Pass
    * an explicit `maxCell` to pin the cap, or `maxCell = 0` to opt OUT —
    * the exact-rule form is a BASELINE for oracles and ledgers; at a
    * fixed cell count its per-cell pair work is unbounded under skew, so
    * never register it on a 100×-scale path (the same baseline-only
    * status as brute-force ANN).
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      cells: Int = AutoCells,
      iters: Int = 2,
      seed: Long = 42L,
      fitSamplePercent: Int = 100,
      maxCell: Int = AutoMaxCell
  ): DataFrame = {
    // at most ONE count job feeds both auto knobs; any cells <= 0 resolves
    // as auto (matching resolveCells' "explicit when > 0" rule), so a
    // non-sentinel non-positive value can't reach suggestedCells with the
    // skipped count's -1 and throw its unrelated row-count message
    val n: Long =
      if (cells <= 0 || maxCell == AutoMaxCell) df.count() else -1L
    val resolvedCells = if (cells > 0) cells else suggestedCells(n)
    val resolvedMaxCell =
      if (maxCell == AutoMaxCell) autoMaxCell(n, resolvedCells) else maxCell
    val base = df.select(
      col(idCol).as("__id"),
      col(vecCol).as("__v"),
      transform(Embeddings.quantizeInt8(col(vecCol)), x => x.cast("double")).as("__qv")
    )
    val centroids =
      kmeansCentroids(df, idCol, vecCol, resolvedCells, iters, seed, fitSamplePercent)
    val asg = explodeTopCells(base, centroids, col("__qv"), 1, Seq(col("__id"), col("__v")))
      .select(col("__id"), col("__v"), col("__cid"), col("__csim"))
      .localCheckpoint(true) // both sides of the pair join + the survivor anti-join read it
    // skew cap: block key = rank within cell / maxCell (similarity-ordered
    // blocking; see scaladoc). Uncapped, every cell is one block.
    val blocked =
      if (resolvedMaxCell <= 0) asg.withColumn("__blk", lit(0L))
      else {
        val wRank = Window.partitionBy("__cid").orderBy(col("__csim").desc, col("__id"))
        asg.withColumn(
          "__blk",
          floor((row_number().over(wRank) - lit(1)).cast("double") / lit(resolvedMaxCell.toDouble)).cast("long")
        )
      }
    val dropped = blocked
      .select(col("__id").as("__xid"), col("__v").as("__xv"), col("__cid"), col("__blk"), col("__csim").as("__xsim"))
      .join(
        blocked
          .select(col("__id").as("__yid"), col("__v").as("__yv"), col("__cid"), col("__blk"), col("__csim").as("__ysim")),
        Seq("__cid", "__blk")
      )
      .filter(col("__xid") =!= col("__yid"))
      .filter(cosine(col("__xv"), col("__yv")) >= tau)
      .filter(
        col("__ysim") < col("__xsim") ||
          (col("__ysim") === col("__xsim") && col("__yid") < col("__xid"))
      )
      .select(col("__xid").as("__id"))
      .distinct()
    asg
      .join(dropped, Seq("__id"), "left_anti")
      .select(col("__id").as(idCol), col("__cid").cast("long").as("cell"), col("__csim").as("centroid_sim"))
  }

  /** Embedding-cosine near-dup pairs: all pairs with cosine >= tau, via the
    * LSH candidate generator when `tables > 0` (the scale path: bucketed
    * equi-joins, no window — a threshold filter needs no rank sort), or
    * brute force when `tables == 0` (baseline/oracle; BroadcastNestedLoop —
    * never register this side at scale).
    *
    * Precision is exact either way (candidates are re-checked against the
    * true cosine); recall of the `tables > 0` path is the LSH collision
    * probability at tau — see the object scaladoc, and the driver-verified
    * `llm_cosine_recall` query which measures it.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      tables: Int = 0,
      planesPerTable: Int = AutoPlanes,
      seed: Long = 42L,
      probeBits: Int = 0,
      probeDepth: Int = 1,
      targetBucket: Long = 32L,
      dim: Int = AutoDim
  ): DataFrame = {
    val pairs =
      if (tables <= 0) {
        val a = df.select(col(idCol).as("a"), col(vecCol).as("__va"))
        val b = df.select(col(idCol).as("b"), col(vecCol).as("__vb"))
        a.join(b, col("a") < col("b"))
          .withColumn("cos", cosine(col("__va"), col("__vb")))
      } else {
        val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
        val planes = resolvePlanes(base, planesPerTable, targetBucket)
        // 1-bit flips are symmetric (a probes b's bucket ⟺ b probes a's),
        // so the candidate set stays symmetric and the a<b filter is safe
        lshCandidates(base, tables, planes, seed, math.min(probeBits, planes), probeDepth, dim)
          .filter(col("qid") < col("nid"))
          .join(base.select(col("__id").as("qid"), col("__v").as("__va")), "qid")
          .join(base.select(col("__id").as("nid"), col("__v").as("__vb")), "nid")
          .select(col("qid").as("a"), col("nid").as("b"), cosine(col("__va"), col("__vb")).as("cos"))
      }
    pairs.filter(col("cos") >= tau).select("a", "b", "cos")
  }

  /** Cross-table embedding near-dup pairs (batch `a` vs corpus `b`,
    * cosine >= tau) — the ingest-time semantic-duplicate check, completing
    * the cross-table family ([[minhashNearDupAgainst]] for token overlap,
    * [[Dedup.simhashNearDupAgainst]] for Hamming, this for embeddings).
    * `tables > 0` runs the two-sided banded candidate generator of
    * [[lshTopKAgainst]] (batch side multi-probed, corpus banded once at
    * base keys — no self-joins); `tables == 0` is the brute cross join
    * (baseline/oracle only — never register at scale). Precision is exact
    * either way (every candidate re-checked against the true cosine);
    * banded recall at tau is the LSH collision probability — see the
    * object scaladoc and `llm_cosine_recall`.
    */
  def cosineNearDupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      tables: Int = 0,
      planesPerTable: Int = AutoPlanes,
      seed: Long = 42L,
      probeBits: Int = 0,
      probeDepth: Int = 1,
      targetBucket: Long = 32L,
      dim: Int = AutoDim
  ): DataFrame = {
    val qbase = batch.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val cbase = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val pairs =
      if (tables <= 0) {
        qbase
          .select(col("__id").as("a"), col("__v").as("__va"))
          .crossJoin(cbase.select(col("__id").as("b"), col("__v").as("__vb")))
          .withColumn("cos", cosine(col("__va"), col("__vb")))
      } else {
        lshCandidatesAgainst(qbase, cbase, tables, planesPerTable, seed, probeBits, probeDepth, targetBucket, dim)
          .select(col("qid").as("a"), col("nid").as("b"))
          .join(qbase.select(col("__id").as("a"), col("__v").as("__va")), "a")
          .join(cbase.select(col("__id").as("b"), col("__v").as("__vb")), "b")
          .withColumn("cos", cosine(col("__va"), col("__vb")))
      }
    pairs.filter(col("cos") >= tau).select("a", "b", "cos")
  }

  // -------------------------------------------------------------------
  // Product quantization (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search")
  // -------------------------------------------------------------------

  /** Exact squared L2 between two integer-valued double arrays: every
    * difference, square, and partial sum is an exact integer below 2^53,
    * so comparisons are reduction-order-independent and bit-identical
    * across engines — the reason PQ assignment runs in the QUANTIZED
    * space (same rationale as the k-means family's quantized fit).
    * Native codegen'd expression (round 15): this is the PQ fit/encode
    * inner loop, evaluated n·m·ks times per assignment pass — the HOF
    * form ([[l2sqHof]], kept as the spec's bit-identity reference) paid
    * an interpreted lambda + a materialized zip array per comparison.
    */
  private def l2sq(a: Column, b: Column): Column =
    graft.functions.native.arrayL2Sq(a, b)

  /** HOF reference formulation of [[l2sq]] (spec-only). */
  private[llmops] def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Per-subspace PQ codebooks: split each int8-quantized vector into `m`
    * contiguous subvectors of `dim / m` dims and run deterministic
    * Lloyd's independently per subspace — md5-order seeded init
    * (TakeOrdered-style per-subspace top-`ks`, no global window), argmin
    * squared-L2 assignment with cid tie-break, exact integer-sum means.
    * Returns (`__m`, `__cid`, `__cv`).
    *
    * Scale shape: the fit is `iters + 1` passes over (id, subvector)
    * rows — `m`·n rows of `dim/m` doubles, the same bytes as the corpus,
    * with broadcast codebooks (m·ks rows) on the assignment side and a
    * (m, cid, dim)-keyed exact-mean shuffle on the update side. At 100 TB
    * fit on a sample (`fitSamplePercent`, standard PQ practice — the
    * paper fits codebooks on ~10⁵–10⁶ vectors) and ENCODE the full
    * corpus; encoding is one broadcast join, no shuffle.
    */
  def pqCodebooks(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 4,
      ks: Int = 8,
      iters: Int = 2,
      seed: Long = 42L,
      fitSamplePercent: Int = 100
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ks > 0 && iters >= 0, "ks must be positive, iters non-negative")
    val sub = dim / m
    val sampled =
      if (fitSamplePercent == 100) df
      else {
        val bucket = conv(
          substring(md5(concat_ws(":", lit("fit"), lit(seed.toString), col(idCol).cast("string"))), 1, 8),
          16,
          10
        ).cast("long") % 100
        df.filter(bucket < fitSamplePercent)
      }
    val qvd = transform(Embeddings.quantizeInt8(col(vecCol)), x => x.cast("double"))
    val subs = sampled
      .select(col(idCol).as("__id"), qvd.as("__qv"))
      .select(
        col("__id"),
        explode(
          transform(
            sequence(lit(0), lit(m - 1)),
            mm => struct(mm.as("m"), slice(col("__qv"), mm * sub + 1, lit(sub)).as("sv"))
          )
        ).as("__e")
      )
      .select(col("__id"), col("__e.m").as("__m"), col("__e.sv").as("__sv"))
      .localCheckpoint(true) // read by init + every Lloyd round
    val h = conv(
      substring(
        md5(concat_ws(":", lit(seed.toString), col("__m").cast("string"), col("__id").cast("string"))),
        1,
        8
      ),
      16,
      10
    ).cast("long")
    // Per-subspace seeded init = the ks smallest (md5 hash, id) rows of
    // EACH subspace, cid in that order. ONE bounded aggregation pass over
    // `subs` (round 19): groupBy(__m) with Spark's bottom-k collector —
    // map-side partial aggregation keeps ≤ ks rows of state per (task,
    // subspace), the only exchange ships tasks×m×ks rows. The former
    // shape ran m SEPARATE TakeOrdered passes (each a full scan of the
    // n·m-row subs table: m reads of the corpus bytes where one
    // suffices) unioned into a window that re-shuffled by __m anyway —
    // at bench scale ~2·m extra plan stages per fit, at 100 TB m−1
    // redundant corpus scans. Ordering is identical: struct
    // (h, id, sv) compares h then the unique-per-subspace id, so each
    // subspace's selected set and order match orderBy(__h, __id).limit(ks)
    // exactly, and cid = position matches the former per-__m row_number.
    val init = subs
      .withColumn("__h", h)
      .groupBy(col("__m"))
      .agg(
        sort_array(
          graft.functions.native.collectBottomK(struct(col("__h"), col("__id"), col("__sv")), ks)
        ).as("__top")
      )
      .select(col("__m"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("__m"), col("__p").cast("int").as("__cid"), col("__e.__sv").as("__cv"))
    // NO eager checkpoint between rounds: each round's codebook is tiny
    // (m·ks rows) and rides into the next round as a broadcast exchange,
    // so the whole fit collapses into the consumer's single job DAG —
    // round-by-round localCheckpoints here cost one scheduled job each
    // (~0.5 s of fixed overhead per round at bench scale) and buy nothing
    // at `iters` this small. The one materialization that matters (subs,
    // read iters+1 times) is checkpointed above; the CALLER checkpoints
    // the returned codebooks if it reads them more than once.
    // Assignment is MAP-SIDE since round 18 (the k-means round's move,
    // see [[kmeansCentroids]]): the pre-r18 round broadcast-joined the
    // codebooks onto the n·m subvector rows and re-grouped by (id, m) —
    // a full corpus-sized exchange per round just to take each row's own
    // argmin. The per-m codeword lists ride in one broadcast map and the
    // argmin is a transform lambda with the identical (d, cid) ordering
    // as the former min_by struct; the only exchange per round is the
    // partial-aggregated update.
    // Update aggregation is ONE exchange per round (round 19, the k-means
    // round's move — see [[kmeansCentroids]]): `sub` codegen'd per-dim
    // sum() aggregates over element_at replace the posexplode +
    // groupBy(m, cid, dim) + regroup-to-array pair of exchanges.
    // Integer-valued doubles summed exactly (per-dim sums identical to
    // the exploded form's); the single division is the only rounding
    // step, performed once on both engines.
    val sumCols = (0 until sub).map(i => sum(element_at(col("__sv"), i + 1)).as(s"__s$i"))
    (1 to iters).foldLeft(init) { (cb, _) =>
      subs
        .withColumn("__one", oneKey(col("__id")))
        .join(codebookEntriesByM(cb), Seq("__one"))
        .select(
          col("__m"),
          graft.functions.native
            .codewordArgmin(col("__sv"), element_at(col("__cbm"), col("__m")))
            .getField("__cid")
            .as("__cid"),
          col("__sv")
        )
        .groupBy("__m", "__cid")
        .agg(count(lit(1)).as("__n"), sumCols: _*)
        .select(
          col("__m"),
          col("__cid"),
          array((0 until sub).map(i => col(s"__s$i") / col("__n")): _*).as("__cv")
        )
    }
  }

  /** PQ-encode + reconstruct: assign every vector's subvectors to their
    * nearest codeword (argmin exact squared L2, cid tie-break) and return
    * (`__id`, `__codes` array of m code ids, `__rv` the reconstructed
    * vector — the m codewords concatenated in subspace order). The codes
    * column IS the 100 TB storage answer (m bytes per vector at ks <=
    * 256 vs 4·dim for float32); the reconstruction is what asymmetric-
    * distance scoring compares queries against.
    */
  def pqEncode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: DataFrame,
      dim: Int,
      m: Int
  ): DataFrame = {
    val sub = dim / m
    val qvd = transform(Embeddings.quantizeInt8(col(vecCol)), x => x.cast("double"))
    // Map-side since round 18: the pre-r18 shape exploded every vector to
    // m subvector rows, broadcast-joined the codebooks, and re-grouped
    // TWICE (argmin per (id, m), then collect per id) — two full-corpus
    // shuffles per encode pass for a decision that is a pure function of
    // the row. The per-m codeword lists now ride in one broadcast map
    // ([[codebookEntriesByM]]) and each row computes its m argmins in a
    // transform lambda (same native l2sq kernel, same (d, cid) ordering
    // as the former min_by struct) — encode is now genuinely "one
    // broadcast join, no shuffle" at any corpus size.
    df.select(col(idCol).as("__id"), qvd.as("__qv"))
      .withColumn("__one", oneKey(col("__id")))
      .join(codebookEntriesByM(codebooks), Seq("__one"))
      .withColumn("__mc", pqBestPerSubspace(col("__qv"), m, sub))
      .select(
        col("__id"),
        transform(col("__mc"), s => s.getField("__cid")).as("__codes"),
        flatten(transform(col("__mc"), s => s.getField("__cv"))).as("__rv")
      )
  }

  /** The PQ codebooks as ONE broadcastable row: (`__cbm` map from
    * subspace id to its codeword entries array<struct<__cid, __cv>>
    * sorted by cid, `__one` = 0). The per-m MAP (not a positional array)
    * for the same reason as [[pqCodebookMap]]: Lloyd's can drop emptied
    * cells, so (m, cid) keys may be sparse.
    */
  private def codebookEntriesByM(cb: DataFrame): DataFrame =
    broadcast(
      cb.groupBy(col("__m"))
        .agg(array_sort(collect_list(struct(col("__cid").as("__cid"), col("__cv").as("__cv")))).as("__es"))
        .groupBy()
        .agg(
          map_from_entries(collect_list(struct(col("__m").as("k"), col("__es").as("v")))).as("__cbm"),
          min(lit(0)).as("__one")
        )
    )

  /** Per-row array of the m winning codewords:
    * array<struct<__cid, __cv>> in subspace order, each the argmin
    * codeword by (exact squared L2, cid) of that subspace's slice of
    * `vec` — exactly the former min_by(struct(cid, cv), struct(d, cid))
    * per (id, m) group, evaluated without the explode/join/regroup.
    * Requires `__cbm` in scope (join [[codebookEntriesByM]] first).
    *
    * Two-level transform so each subspace SLICE materializes once per
    * (row, subspace): with the slice inline in the inner lambda it is
    * re-evaluated (and re-allocated) once per CODEWORD — m·ks slices per
    * row instead of m, measured at ~1.5× the whole encode pass. The
    * per-subspace argmin is the native [[graft.functions.CodewordArgmin]]
    * kernel — one compiled ks×sub loop per (row, subspace) instead of an
    * interpreted lambda dispatch per codeword.
    */
  private def pqBestPerSubspace(vec: Column, m: Int, sub: Int): Column =
    transform(
      transform(
        sequence(lit(0), lit(m - 1)),
        mm => struct(mm.as("__m"), slice(vec, mm * sub + 1, lit(sub)).as("__sv"))
      ),
      p =>
        graft.functions.native
          .codewordArgmin(p.getField("__sv"), element_at(col("__cbm"), p.getField("__m")))
    )

  /** (`__cid`, `__nid`, `__codes`) for every row of `df` in ONE map-side
    * projection against the broadcast fit tables — the fused
    * assignment+encode pass shared by [[graft.llmops.AnnIndex.fitIvfPq]]
    * and [[graft.llmops.AnnIndex.encodeAgainst]]. Replaces the pre-r18
    * assignment⋈encode equi-join on vector id (two corpus-sized shuffle
    * sides) with zero exchanges: nearest cell and the m code ids are both
    * pure functions of (vector, centroids, codebooks).
    */
  private[llmops] def assignAndEncode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebooks: DataFrame,
      dim: Int,
      m: Int
  ): DataFrame = {
    val sub = dim / m
    quantizedBase(df, idCol, vecCol)
      .withColumn("__one", oneKey(col("__id")))
      .join(centroidEntriesRow(centroids), Seq("__one"))
      .join(codebookEntriesByM(codebooks), Seq("__one"))
      .select(
        (-bestCellCol(col("__qv")).getField("__ncid")).cast(centroids.schema("__cid").dataType).as("__cid"),
        col("__id").as("__nid"),
        transform(pqBestPerSubspace(col("__qv"), m, sub), s => s.getField("__cid")).as("__codes")
      )
  }

  /** IVF-PQ top-k: the [[ivfTopKKmeans]] probe join with the candidate
    * side stored as PQ codes — ranking is ASYMMETRIC distance (the
    * query's full quantized vector vs each candidate's reconstruction),
    * never candidate-vs-candidate. Identical coarse structure (broadcast
    * k-means centroids, nprobe cell probing, bucketed equi-join on cell
    * id); the only change is what the index side carries: `m` code bytes
    * per vector instead of the vector itself — the difference between a
    * 100 TB float32 index and a ~3 TB one at m=4/ks=256 over 64 dims.
    *
    * The probe join moves the CODES, not reconstructions: the candidate
    * side of the cell-id equi-join carries only (id, cell, m small ints),
    * and the codeword reconstruction happens AFTER the join via a
    * broadcast (m·ks)-entry codebook map attached as a 1-row cross join
    * (the centroid-table idiom) — per-pair cost is the same m map
    * lookups an ADC lookup table would do, and the shuffle payload is
    * the production index payload, ~6× smaller than shipping float
    * reconstructions at the registered (m=8, dim=64) shape. Scores are
    * bit-identical to reconstruction-before-join (same codewords,
    * concatenated in the same subspace order, same cosine arithmetic).
    *
    * `rerank > k` enables the production refinement: take the ADC top-
    * `rerank` shortlist, fetch those candidates' ORIGINAL vectors by id
    * (an O(shortlist)-row join back to the corpus — the index stays
    * codes-only), and return the exact-cosine top-`k` of the shortlist.
    * ADC-only recall cost is priced by `llm_ann_ivf_pq_recall`.
    */
  def ivfPqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 2,
      iters: Int = 2,
      seed: Long = 42L,
      pqM: Int = 4,
      pqKs: Int = 8,
      pqIters: Int = 2,
      rerank: Int = 0,
      dim: Int = AutoDim
  ): DataFrame = {
    val d = resolveDim(df.select(col(idCol).as("__id"), col(vecCol).as("__v")), dim)
    val base = quantizedBase(df, idCol, vecCol)
    val centroids = kmeansCentroids(df, idCol, vecCol, cells, iters, seed)
    // ONE nprobe-deep centroid scoring pass serves both roles of the
    // self-probe: crank = 1 assigns index cells, crank ≤ nprobe probes
    val probed = cellRanks(base, centroids, nprobe).localCheckpoint(true)
    // read twice (encode + the post-join reconstruction map): snapshot
    // per this file's cache-lifecycle idiom
    val cb = pqCodebooks(df, idCol, vecCol, d, pqM, pqKs, pqIters, seed).localCheckpoint(true)
    // the INDEX side of the probe join: (cell, id, m code ids) — nothing
    // vector-sized rides the shuffle. Codes are computed MAP-SIDE on the
    // home-cell rows (round 18): the pre-r18 shape pqEncode'd the corpus
    // separately and equi-joined it back on vector id — a two-sided
    // corpus shuffle for a per-row pure function of the broadcast
    // codebooks.
    val index = probed
      .filter(col("__crank") === 1)
      .withColumn("__one", oneKey(col("__id")))
      .join(codebookEntriesByM(cb), Seq("__one"))
      .select(
        col("__id").as("__nid"),
        col("__cid"),
        transform(pqBestPerSubspace(col("__qv"), pqM, d / pqM), s => s.getField("__cid")).as("__codes")
      )
    pqAdcRank(
      probed.select(col("__id").as("__qid"), col("__qv"), col("__cid")),
      index,
      pqCodebookMap(cb, pqKs),
      pqM,
      pqKs,
      k,
      rerank,
      df.select(col(idCol).as("__oid"), col(vecCol).as("__ov")),
      excludeSelf = true
    )
  }

  // -------------------------------------------------------------------
  // IVF-PQ building blocks, shared between the fused self-probe above and
  // the persisted-index lifecycle (graft.llmops.AnnIndex)
  // -------------------------------------------------------------------

  /** (id, int8-quantized-as-double vector) projection — the space every
    * IVF/PQ fit, assignment, and probe runs in.
    */
  private[llmops] def quantizedBase(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol).as("__id"),
      transform(Embeddings.quantizeInt8(col(vecCol)), x => x.cast("double")).as("__qv")
    )

  // -------------------------------------------------------------------
  // Map-side cell assignment (round 18). The pre-r18 shape scored cells
  // via crossJoin(broadcast centroids) and ranked them with a
  // row_number() window partitioned by vector id — which SHUFFLES the
  // cells×-expanded corpus (vector payload included) once per
  // assignment/probe pass, purely to pick each row's own top cells. The
  // decision needs nothing from other rows, so it is computable per row:
  // attach ALL centroids as one broadcast single-row array (the
  // pqCodebookMap idiom), score them in a `transform` lambda (the same
  // native `cosine` kernel — interpreted dispatch per centroid, compiled
  // loop per evaluation), order with the struct that replicates the
  // window's (csim DESC, cid ASC) exactly, and posexplode the top slice.
  // Zero exchanges where the window form shuffled cells× corpus bytes
  // (guide §2.4: remove shuffles outright). Bit-identical ordering:
  // sort_array(struct(csim, −cid), desc) compares csim desc then −cid
  // desc ⇔ cid asc, with Spark's total double ordering (NaN greatest =
  // first under desc) — the same ordering the window used.
  // -------------------------------------------------------------------

  /** Non-foldable always-0 join key derived from an attribute — a literal
    * key would be pushed down as a filter and degrade the attach join to
    * a nested loop (see [[pqCodebookMap]]).
    */
  private def oneKey(c: Column): Column = pmod(xxhash64(c), lit(1)).cast("int")

  /** All centroids as ONE broadcastable row:
    * (`__cents` array<struct<__ncid, __cv>> sorted, `__one` = 0). `__ncid`
    * is the NEGATED cell id so the per-row top-k sort is a plain struct
    * sort_array desc (csim desc, cid asc) with no per-element negation.
    */
  private def centroidEntriesRow(centroids: DataFrame): DataFrame =
    broadcast(
      centroids
        .groupBy()
        .agg(
          array_sort(
            collect_list(struct((-col("__cid")).cast("long").as("__ncid"), col("__cv").as("__cv")))
          ).as("__cents"),
          min(lit(0)).as("__one")
        )
    )

  /** Per-row top-`upTo` cells of `__cents` by (cosine desc, cid asc) —
    * array<struct<__csim, __ncid>>, already ordered. Requires `__cents`
    * in scope (join [[centroidEntriesRow]] first). Native kernel (one
    * compiled loop per row); the interpreted HOF form
    * `slice(sort_array(transform(cents, struct(cosine, ncid)), desc), 1,
    * upTo)` is bit-identical but pays a lambda dispatch per CENTROID —
    * measured ~0.4 µs each, which at the √n production cell-count rule
    * would dominate the pass (KernelEquivalenceSpec pins kernel ≡ HOF
    * equality on adversarial inputs, interpreted AND codegen).
    */
  private def topCellsCol(vec: Column, upTo: Int): Column =
    graft.functions.native.cellTopK(vec, col("__cents"), upTo)

  /** HOF reference formulation of [[topCellsCol]] — spec-only, the
    * bit-identity oracle for the native kernel.
    */
  private[llmops] def topCellsHof(vec: Column, cents: Column, upTo: Int): Column =
    slice(
      sort_array(
        transform(
          cents,
          e => struct(cosine(vec, e.getField("__cv")).as("__csim"), e.getField("__ncid").as("__ncid"))
        ),
        asc = false
      ),
      1,
      upTo
    )

  /** The single best cell by (cosine desc, cid asc) as one
    * struct<__csim, __ncid> — [[topCellsCol]] at upTo = 1. Requires
    * `__cents` in scope.
    */
  private def bestCellCol(vec: Column): Column =
    element_at(graft.functions.native.cellTopK(vec, col("__cents"), 1), 1)

  /** Explicit partition count for the probe-side repartition below:
    * the configured shuffle width, floored at the cluster's core count.
    * Derived from the session, never a constant — scales with the
    * deployment, and an explicit count is exactly what keeps AQE from
    * coalescing it away (see [[explodeTopCells]]).
    */
  private def probeParallelism(df: DataFrame): Int = {
    val ss = df.sparkSession
    math.max(ss.sparkContext.defaultParallelism, ss.sessionState.conf.numShufflePartitions)
  }

  /** Append (`__cid`, `__crank`, `__csim`) per kept row by exploding the
    * per-row top-`upTo` cells — the shared assignment/probe pass. `keep`
    * lists the base columns to carry through; `vec` is the column scored
    * against the centroids (quantized or original, caller's contract).
    *
    * Ends with ONE explicit-width repartition on `__cid` — the key every
    * downstream candidate join uses. This is the pass's only exchange,
    * and it REPLACES exchanges rather than adding one: the pre-r18 shape
    * paid the window's cells×-payload exchange here PLUS the candidate
    * join's own two exchanges; now both join sides inherit this
    * hash(__cid) partitioning and the join plans with no exchange at
    * all. The width is explicit ([[probeParallelism]]) because AQE's
    * byte-based coalescing would fold the compact probe table into one
    * partition and serialize the candidate-pair expansion downstream —
    * the classic AQE blind spot: it sizes by exchange bytes, not by the
    * join fan-out behind them (measured: the whole IVF pair join ran as
    * a single task at bench scale, 1.5× the query's wall time).
    */
  private def explodeTopCells(
      base: DataFrame,
      centroids: DataFrame,
      vec: Column,
      upTo: Int,
      keep: Seq[Column]
  ): DataFrame = {
    // the kernel's ncid rides as long; restore the caller's cid type
    // (int for k-means fits, long for the identity quantizer) exactly
    val cidType = centroids.schema("__cid").dataType
    base
      .withColumn("__one", oneKey(col("__id")))
      .join(centroidEntriesRow(centroids), Seq("__one"))
      .select(keep :+ posexplode(topCellsCol(vec, upTo)).as(Seq("__pos", "__tc")): _*)
      .select(
        keep ++ Seq(
          (-col("__tc.__ncid")).cast(cidType).as("__cid"),
          (col("__pos") + 1).as("__crank"),
          col("__tc.__csim").as("__csim")
        ): _*
      )
      .repartition(probeParallelism(base), col("__cid"))
  }

  /** Rank centroids per vector by quantized cosine (deterministic cid
    * tie-break) and keep ranks ≤ `upTo`: `upTo = 1` is index-side cell
    * assignment, `upTo = nprobe` is query-side probing. Map-side since
    * round 18 (see the block comment above); the output is
    * (`__id`, `__qv`, `__cid`, `__crank`), bit-identical to the former
    * crossJoin+window form.
    */
  private[llmops] def cellRanks(base: DataFrame, centroids: DataFrame, upTo: Int): DataFrame =
    explodeTopCells(base, centroids, col("__qv"), upTo, Seq(col("__id"), col("__qv")))
      .select(col("__id"), col("__qv"), col("__cid"), col("__crank"))

  /** The PQ codebooks as a single-row broadcast (m·ks)-entry map keyed by
    * `m·ks + cid` (a MAP, not a positional array — Lloyd's can drop
    * emptied cells, so (m, cid) keys may be sparse), plus a NON-FOLDABLE
    * constant join key `__one` (an aggregate output, not a literal: a
    * literal key on either join side gets pushed down as a filter and the
    * attach join degrades to a nested loop).
    */
  private[llmops] def pqCodebookMap(cb: DataFrame, pqKs: Int): DataFrame =
    broadcast(
      cb.groupBy()
        .agg(
          map_from_entries(
            collect_list(
              struct((col("__m") * pqKs + col("__cid")).cast("int").as("k"), col("__cv").as("v"))
            )
          ).as("__cb"),
          min(lit(0)).as("__one")
        )
    )

  /** ADC-rank probed queries against a codes-only index, with the
    * optional exact fetch-and-rerank refinement. `probedQueries` is
    * (`__qid`, `__qv`, `__cid`) — one row per (query, probed cell);
    * `index` is (`__cid`, `__nid`, `__codes`); `cbMap` is
    * [[pqCodebookMap]]'s single row; `orig` supplies the rerank fetch as
    * (`__oid`, `__ov`). Candidates are reconstructed AFTER the cell-id
    * equi-join from the broadcast codeword map — the join ships m code
    * ids per candidate, never a vector.
    */
  private[llmops] def pqAdcRank(
      probedQueries: DataFrame,
      index: DataFrame,
      cbMap: DataFrame,
      pqM: Int,
      pqKs: Int,
      k: Int,
      rerank: Int,
      orig: DataFrame,
      excludeSelf: Boolean
  ): DataFrame = {
    val shortlist = math.max(k, rerank)
    val w = Window.partitionBy("__qid").orderBy(col("__adc").desc, col("__nid"))
    // Reconstruction placement (round-12 fix of a self-inflicted 3×
    // regression): the EXPLICIT repartition on cell id puts the exchange
    // BELOW the reconstruction projection, so the shuffle ships the m-byte
    // codes (the production payload) while each candidate's codeword
    // concatenation is computed ONCE PER INDEX ROW after landing — the
    // per-(query, candidate) pair join above it pays only the cosine.
    // Reconstructing after the pair join instead (the first form of this
    // change) multiplied the m map lookups + array build by the pair
    // count (~nprobe·cell_size per query) and tripled the query's
    // wall-clock at sf0.1. The candidate join reuses this partitioning
    // (same key), so the repartition adds no extra exchange.
    val reconIndex = index
      // explicit width (round 18): matches the probe side's hash(__cid, P)
      // from [[explodeTopCells]], so the candidate join plans with no
      // exchange on either side; a width-less repartition here would be
      // AQE-coalesced to one partition at small exchange sizes and
      // serialize the pair expansion (see [[explodeTopCells]])
      .repartition(probeParallelism(index), col("__cid"))
      // non-foldable constant key on BOTH sides (pmod(attr, 1) ≡ 0): see
      // [[pqCodebookMap]] — plans as a 1-row BroadcastHashJoin,
      // constant-cost at any scale
      .withColumn("__one", pmod(col("__cid"), lit(1)).cast("int"))
      .join(cbMap, Seq("__one"))
      .withColumn(
        "__rv", // reconstruct from codes; same subspace order ⇒ bit-identical scores
        flatten(
          transform(
            sequence(lit(0), lit(pqM - 1)),
            mm => element_at(col("__cb"), (mm * pqKs + element_at(col("__codes"), mm + 1)).cast("int"))
          )
        )
      )
      .select(col("__cid"), col("__nid"), col("__rv"))
    val joined = probedQueries.join(reconIndex, Seq("__cid"))
    val adcTop = (if (excludeSelf) joined.filter(col("__qid") =!= col("__nid")) else joined)
      .withColumn("__adc", cosine(col("__qv"), col("__rv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= shortlist)
    if (rerank <= k)
      adcTop
        .filter(col("rank") <= k)
        .select(col("__qid").as("qid"), col("__nid").as("nid"), col("rank").cast("long").as("rank"))
    else {
      // exact re-rank of the ADC shortlist: fetch the shortlist's ORIGINAL
      // vectors back from the corpus by id (the index side stays codes-
      // only — this is the production fetch-and-rerank, O(shortlist) rows
      // per query, never a second scan) and rank by exact cosine.
      val wr = Window.partitionBy("__qid").orderBy(col("__exact").desc, col("__nid"))
      adcTop
        .select(col("__qid"), col("__nid"))
        // candidate-vector fetch FIRST, query-vector fetch LAST (round 18):
        // the final join's hash(__qid) partitioning satisfies the rank
        // window's partitionBy(__qid), so the window rides the join's
        // exchange instead of adding its own (guide §2.4 — two operations
        // keyed the same way share one exchange). Inner joins commute;
        // results are identical.
        .join(orig.withColumnRenamed("__oid", "__nid").withColumnRenamed("__ov", "__nfull"), Seq("__nid"))
        .join(orig.withColumnRenamed("__oid", "__qid").withColumnRenamed("__ov", "__qfull"), Seq("__qid"))
        .withColumn("__exact", cosine(col("__qfull"), col("__nfull")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= k)
        .select(col("__qid").as("qid"), col("__nid").as("nid"), col("rank").cast("long").as("rank"))
    }
  }
}
