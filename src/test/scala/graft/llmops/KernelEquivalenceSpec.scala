package graft.llmops

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The equivalence specs VERDICT r18 #3 found missing, plus the round-19
  * Lloyd-round rewrites' references:
  *
  *   1. `CellTopK` kernel ≡ [[Similarity.topCellsHof]] (the HOF oracle its
  *      scaladoc claims is pinned) over adversarial generated inputs —
  *      NaN, ±0.0, zero-norm vectors (null/NaN cosine), exact csim ties,
  *      empty and shorter-than-upTo centroid arrays — under BOTH the
  *      interpreted and codegen expression paths.
  *   2. `CodewordArgmin` ≡ `array_min(transform(entries, struct(l2sq,
  *      cid, cv)))`, same regime (incl. the null-distance-first edge and
  *      the empty-entries → null edge).
  *   3. [[Similarity.kmeansCentroids]] ≡ an independent window/explode
  *      Lloyd reference (the pre-r18 crossJoin+max_by formulation,
  *      rebuilt from public primitives) on random data — pins the
  *      round-19 bounded-top-k init AND the fused single-exchange update.
  *   4. [[Similarity.pqCodebooks]] ≡ the explode/min_by Lloyd reference,
  *      same purpose.
  *
  * All equality assertions go through Spark's null-safe `<=>` (SQL
  * semantics: NaN equals NaN, ±0.0 equal — exactly the ordering-contract
  * the kernels replicate).
  */
class KernelEquivalenceSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Run `body` under the interpreted-only and codegen-only expression
    * factories (both kernels dispatch to the same NativeMath call in
    * `eval` and `doGenCode`, and this proves it).
    */
  private def underBothCodegenPaths(body: => Unit): Unit = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      for (mode <- Seq("NO_CODEGEN", "CODEGEN_ONLY")) {
        spark.conf.set(key, mode)
        body
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val rnd = new Random(42)

  /** Adversarial doubles: ordinary values, ±0.0, NaN, huge/tiny. */
  private def advDouble(): Double = rnd.nextInt(10) match {
    case 0 => 0.0
    case 1 => -0.0
    case 2 => Double.NaN
    case 3 => 1e300
    case 4 => -1e300
    case _ => math.rint(rnd.nextDouble() * 254 - 127) // the quantized regime
  }

  private def advVec(d: Int, zeroNorm: Boolean): Seq[Double] =
    if (zeroNorm) Seq.fill(d)(0.0) else Seq.fill(d)(advDouble())

  // ------------------------------------------------------------------
  // 1. CellTopK ≡ topCellsHof
  // ------------------------------------------------------------------

  private def cellTopKFixture(dim: Int, rows: Int): DataFrame = {
    val data = (1 to rows).map { i =>
      val nCents = rnd.nextInt(6) // includes 0 (empty) and < upTo counts
      val base = advVec(dim, zeroNorm = i % 7 == 0)
      // zero-norm centroid vectors → NULL cosine (the kernel's null-
      // scored tail path); duplicated centroid VECTORS → exact csim ties
      // the ncid tie-break must resolve identically. Null __cv itself is
      // outside the contract: centroids are Lloyd means, never null.
      var prev: Seq[Double] = null
      val cents = (0 until nCents).map { c =>
        val cv =
          if (c % 3 == 2 && prev != null) prev // exact tie with previous
          else advVec(dim, zeroNorm = c % 5 == 4 || rnd.nextInt(8) == 0)
        prev = cv
        (-c.toLong, cv)
      }
      // production order is ncid ASC (centroidEntriesRow sorts); shuffle
      // some rows to prove the kernel is input-order independent like the
      // HOF it mirrors
      val ordered = if (i % 4 == 0) rnd.shuffle(cents) else cents.sortBy(_._1)
      (i.toLong, base, ordered)
    }
    data.toDF("__id", "__qv", "__cents")
  }

  test("CellTopK kernel is bit-identical to the HOF oracle on adversarial inputs (interpreted and codegen)") {
    val df = cellTopKFixture(dim = 6, rows = 400)
      .select(
        col("__qv"),
        transform(
          col("__cents"),
          e => struct(e.getField("_1").as("__ncid"), e.getField("_2").as("__cv"))
        ).as("__cents")
      )
      .localCheckpoint(true)
    underBothCodegenPaths {
      for (upTo <- Seq(1, 2, 4, 7)) {
        val both = df.select(
          graft.functions.native.cellTopK(col("__qv"), col("__cents"), upTo).as("ker"),
          Similarity.topCellsHof(col("__qv"), col("__cents"), upTo).as("hof")
        )
        val diff = both.filter(!(col("ker") <=> col("hof"))).count()
        assert(diff == 0L, s"cellTopK != topCellsHof on $diff rows at upTo=$upTo")
      }
    }
  }

  // ------------------------------------------------------------------
  // 2. CodewordArgmin ≡ array_min(transform(entries, struct(l2sq, cid, cv)))
  // ------------------------------------------------------------------

  private def argminFixture(sub: Int, rows: Int): DataFrame = {
    val data = (1 to rows).map { i =>
      val sv = advVec(sub, zeroNorm = i % 11 == 0)
      val nE = rnd.nextInt(6) // includes 0 → null result
      val entries = (0 until nE).map { c =>
        // duplicate vectors → exact distance ties; occasional
        // length-mismatched cv → null l2sq (nulls-first ordering edge)
        val cv =
          if (c % 4 == 3) advVec(sub + 1, zeroNorm = false)
          else if (c % 2 == 1 && c > 0) advVec(sub, zeroNorm = false)
          else advVec(sub, zeroNorm = c % 5 == 4)
        (c, cv)
      }
      (i.toLong, sv, entries)
    }
    data.toDF("__id", "__sv", "__entries")
  }

  test("CodewordArgmin is bit-identical to the array_min HOF oracle on adversarial inputs (interpreted and codegen)") {
    val df = argminFixture(sub = 4, rows = 400).localCheckpoint(true)
    // duplicate an entry VECTOR under a new cid explicitly so at least
    // some rows carry a guaranteed tie
    val withTie = df.withColumn(
      "__entries",
      when(
        size(col("__entries")) > 0,
        concat(
          col("__entries"),
          array(struct(lit(99).as("_1"), element_at(col("__entries"), 1).getField("_2").as("_2")))
        )
      ).otherwise(col("__entries"))
    )
    underBothCodegenPaths {
      val hofWin = array_min(
        transform(
          col("__entries"),
          e =>
            struct(
              Similarity.l2sqHof(col("__sv"), e.getField("_2")).as("__d"),
              e.getField("_1").as("__cid"),
              e.getField("_2").as("__cv")
            )
        )
      )
      val both = withTie.select(
        graft.functions.native
          .codewordArgmin(
            col("__sv"),
            transform(col("__entries"), e => struct(e.getField("_1").as("__cid"), e.getField("_2").as("__cv")))
          )
          .as("ker"),
        struct(hofWin.getField("__cid").as("__cid"), hofWin.getField("__cv").as("__cv")).as("hofRaw")
      )
      // empty entries: kernel yields null, array_min of empty yields null
      // struct whose fields are null — normalize through the same shape
      val normalized = both.withColumn(
        "hof",
        when(col("hofRaw.__cid").isNull && col("hofRaw.__cv").isNull, lit(null)).otherwise(col("hofRaw"))
      )
      val diff = normalized.filter(!(col("ker") <=> col("hof"))).count()
      assert(diff == 0L, s"codewordArgmin != array_min HOF on $diff rows")
    }
  }

  // ------------------------------------------------------------------
  // 3. kmeansCentroids ≡ independent window/explode Lloyd reference
  // ------------------------------------------------------------------

  /** The pre-r18 Lloyd formulation rebuilt from public primitives: score
    * every (row, centroid) pair via explode, rank with a window
    * ((csim desc, cid asc) — the original ordering), update means via
    * posexplode + per-(cid, dim) avg. Structurally everything the
    * round-18/19 rewrites removed, which is the point: same numbers, by
    * construction, through a completely different plan.
    */
  private def kmeansReference(df: DataFrame, cells: Int, iters: Int, seed: Long): DataFrame = {
    val qvd = transform(Embeddings.quantizeInt8(col("v")), x => x.cast("double"))
    val qbase = df.select(col("id").as("__id"), qvd.as("__qv")).localCheckpoint(true)
    val h = conv(
      substring(md5(concat_ws(":", lit(seed.toString), col("__id").cast("string"))), 1, 8),
      16,
      10
    ).cast("long")
    val winit = Window.orderBy(col("__h"), col("__id"))
    val init = qbase
      .withColumn("__h", h)
      .orderBy(col("__h"), col("__id"))
      .limit(cells)
      .withColumn("__cid", (row_number().over(winit) - 1).cast("int"))
      .select(col("__cid"), col("__qv").as("__cv"))
    (1 to iters).foldLeft(init) { (centroids, _) =>
      val w = Window.partitionBy("__id").orderBy(col("__csim").desc, col("__cid"))
      val assigned = qbase
        .crossJoin(broadcast(centroids))
        .withColumn("__csim", Similarity.cosine(col("__qv"), col("__cv")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("__cid"), col("__qv"))
      assigned
        .select(col("__cid"), posexplode(col("__qv")).as(Seq("__dim", "__x")))
        .groupBy("__cid", "__dim")
        .agg((sum(col("__x")) / count(lit(1))).as("__m"))
        .groupBy("__cid")
        .agg(collect_list(struct(col("__dim"), col("__m"))).as("__dm"))
        .select(col("__cid"), transform(array_sort(col("__dm")), s => s.getField("__m")).as("__cv"))
    }
  }

  private def randomVecs(n: Int, dim: Int): DataFrame =
    (1 to n)
      .map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")

  test("kmeansCentroids (bounded-top-k init + fused update) matches the window/explode Lloyd reference") {
    val df = randomVecs(220, dim = 8).localCheckpoint(true)
    for (iters <- Seq(0, 2)) {
      val got = Similarity
        .kmeansCentroids(df, "id", "v", cells = 5, iters = iters, seed = 42L)
        .select(col("__cid"), col("__cv"))
      val ref = kmeansReference(df, cells = 5, iters = iters, seed = 42L)
      val joined = got.as("g").join(ref.as("r"), Seq("__cid"), "full_outer")
      val diff = joined.filter(!(col("g.__cv") <=> col("r.__cv"))).count()
      assert(diff == 0L, s"kmeansCentroids != reference at iters=$iters on $diff cells")
      assert(got.count() == ref.count())
    }
  }

  // ------------------------------------------------------------------
  // 4. pqCodebooks ≡ explode/min_by Lloyd reference
  // ------------------------------------------------------------------

  private def pqReference(df: DataFrame, dim: Int, m: Int, ks: Int, iters: Int, seed: Long): DataFrame = {
    val sub = dim / m
    val qvd = transform(Embeddings.quantizeInt8(col("v")), x => x.cast("double"))
    val subs = df
      .select(col("id").as("__id"), qvd.as("__qv"))
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
      .localCheckpoint(true)
    val h = conv(
      substring(
        md5(concat_ws(":", lit(seed.toString), col("__m").cast("string"), col("__id").cast("string"))),
        1,
        8
      ),
      16,
      10
    ).cast("long")
    val init = (0 until m)
      .map(mm => subs.filter(col("__m") === mm).withColumn("__h", h).orderBy(col("__h"), col("__id")).limit(ks))
      .reduce(_ unionByName _)
      .withColumn(
        "__cid",
        (row_number().over(Window.partitionBy("__m").orderBy(col("__h"), col("__id"))) - 1).cast("int")
      )
      .select(col("__m"), col("__cid"), col("__sv").as("__cv"))
    (1 to iters).foldLeft(init) { (cb, _) =>
      subs
        .join(broadcast(cb), Seq("__m"))
        .withColumn("__d", Similarity.l2sqHof(col("__sv"), col("__cv")))
        .groupBy("__id", "__m")
        .agg(
          min_by(struct(col("__cid"), col("__sv")), struct(col("__d"), col("__cid"))).as("__w")
        )
        .select(col("__m"), col("__w.__cid").as("__cid"), col("__w.__sv").as("__sv"))
        .select(col("__m"), col("__cid"), posexplode(col("__sv")).as(Seq("__dim", "__x")))
        .groupBy("__m", "__cid", "__dim")
        .agg((sum(col("__x")) / count(lit(1))).as("__mn"))
        .groupBy("__m", "__cid")
        .agg(collect_list(struct(col("__dim"), col("__mn"))).as("__dm"))
        .select(col("__m"), col("__cid"), transform(array_sort(col("__dm")), s => s.getField("__mn")).as("__cv"))
    }
  }

  test("pqCodebooks (one-pass bounded-top-k init + fused update) matches the explode/min_by Lloyd reference") {
    val df = randomVecs(180, dim = 8).localCheckpoint(true)
    for (iters <- Seq(0, 2)) {
      val got = Similarity.pqCodebooks(df, "id", "v", dim = 8, m = 4, ks = 6, iters = iters, seed = 42L)
      val ref = pqReference(df, dim = 8, m = 4, ks = 6, iters = iters, seed = 42L)
      val joined = got.as("g").join(ref.as("r"), Seq("__m", "__cid"), "full_outer")
      val diff = joined.filter(!(col("g.__cv") <=> col("r.__cv"))).count()
      assert(diff == 0L, s"pqCodebooks != reference at iters=$iters on $diff codewords")
      assert(got.count() == ref.count())
    }
  }
}
