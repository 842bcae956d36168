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
  *     executors by construction.
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

  /** Deterministic random hyperplanes (seeded) as a plan literal. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature under `planes`: bit p = (v · plane_p) > 0. */
  def planeSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeLit = array(plane.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: multiple independent hash tables
    * (band = one table of `planesPerTable` sign bits); vectors sharing a
    * bucket in any table become candidates; candidates are exact-ranked by
    * cosine. Recall grows with `tables`; all joins are bucketed equi-joins.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      planesPerTable: Int = 10,
      seed: Long = 42L
  ): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // hyperplane dimensionality must match the data: a wrong dim nulls the
    // signature dots (ArrayDot rejects length mismatches). One tiny driver
    // job on one row; pass-through cost is irrelevant next to the join.
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val keysPerTable: Seq[Column] = (0 until tables).map { t =>
      planeSignature(col("__v"), hyperplanes(planesPerTable, dim, seed + t))
    }
    // Persisted for the same reason as Dedup.minhashNearDupPairs: the
    // candidate self-join reads this twice; caching avoids recomputing the
    // tables × planes dot products per side. Holds only ids + bucket keys
    // — candidate pairs dedup as bare id pairs (cheap) and the vectors
    // join back afterwards, so the wide embedding arrays never ride
    // through the candidate shuffle/dedup.
    val banded = base
      .select(col("__id"), posexplode(array(keysPerTable: _*)).as(Seq("__table", "__key")))
      .persist()
    val a = banded.select(col("__table"), col("__key"), col("__id").as("qid"))
    val b = banded.select(col("__table").as("__t2"), col("__key").as("__k2"), col("__id").as("nid"))
    val candidates = a
      .join(b, col("__table") === col("__t2") && col("__key") === col("__k2") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    candidates
      .join(base.select(col("__id").as("qid"), col("__v").as("__qv")), "qid")
      .join(base.select(col("__id").as("nid"), col("__v").as("__cv")), "nid")
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
    val centroids = broadcast(
      base.orderBy("__id").limit(cells)
        .select(col("__id").as("__cid"), col("__v").as("__cv"))
    )
    // nearest `nprobe` cells per vector (rank 1 = home cell for indexing)
    val wCell = Window.partitionBy("__id").orderBy(col("__csim").desc, col("__cid"))
    val probed = base
      .crossJoin(centroids)
      .withColumn("__csim", cosine(col("__v"), col("__cv")))
      .withColumn("__crank", row_number().over(wCell))
      .filter(col("__crank") <= nprobe)
      .select(col("__id"), col("__v"), col("__cid"), col("__crank"))
      .persist()
    val indexed = probed.filter(col("__crank") === 1).select(col("__cid"), col("__id").as("nid"), col("__v").as("__cvv"))
    val queries = probed.select(col("__cid").as("__qcid"), col("__id").as("qid"), col("__v").as("__qv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    queries
      .join(indexed, col("__qcid") === col("__cid") && col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qv"), col("__cvv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }

  /** Embedding-cosine near-dup pairs: all pairs with cosine >= tau, via the
    * candidate generator of `lshTopK` when `tables > 0`, or brute force
    * when `tables == 0` (baseline/oracle).
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      tables: Int = 0
  ): DataFrame = {
    val pairs =
      if (tables <= 0) {
        val a = df.select(col(idCol).as("a"), col(vecCol).as("__va"))
        val b = df.select(col(idCol).as("b"), col(vecCol).as("__vb"))
        a.join(b, col("a") < col("b"))
          .withColumn("cos", cosine(col("__va"), col("__vb")))
      } else {
        lshTopK(df, idCol, vecCol, k = Int.MaxValue, tables = tables)
          .filter(col("qid") < col("nid"))
          .select(col("qid").as("a"), col("nid").as("b"), col("cos"))
      }
    pairs.filter(col("cos") >= tau).select("a", "b", "cos")
  }
}
