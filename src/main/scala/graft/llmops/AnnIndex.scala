package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle — the production shape of
  * [[Similarity.ivfPqTopK]]: fit ONCE over the corpus, write the three
  * index tables to storage, `load` in any later session (batch or the
  * scoring side of a stream), and `probe` arbitrary query batches without
  * ever re-reading corpus vectors. [[Similarity.ivfPqTopK]] is the fused
  * self-probe special case; fit + probe here share its exact building
  * blocks ([[Similarity.cellRanks]] / [[Similarity.pqAdcRank]]), so a
  * save → load → probe round-trip over the same corpus returns
  * bit-identical (qid, nid, rank) rows — spec- and oracle-gated.
  *
  * On-disk layout under `dir`:
  *   - `meta/`       one row: (version, dim, cells, pq_m, pq_ks, seed)
  *   - `centroids/`  coarse k-means centroids (`__cid`, `__cv`) — cells rows
  *   - `codebooks/`  PQ codewords (`__m`, `__cid`, `__cv`) — ≤ m·ks rows
  *   - `codes/`      the corpus index (`__nid`, `__codes`), PARTITIONED BY
  *                   `__cid`: m small ints per vector (m bytes at
  *                   ks ≤ 256) — the ~30× compression vs float32 that
  *                   makes a 100 TB corpus a ~3 TB index — laid out so a
  *                   probe of `nprobe` cells prunes to `nprobe/cells` of
  *                   the index files. A small online query batch can
  *                   collect its probed cell list and filter
  *                   `__cid IN (...)` for static partition pruning; the
  *                   registered batch query keeps the join form (dynamic
  *                   pruning / AQE territory) because its query side is
  *                   corpus-sized.
  *
  * Everything persisted is engine-portable parquet: doubles round-trip
  * bit-exact, so a loaded index probes identically to the in-memory fit.
  */
object AnnIndex {

  /** A fitted (or loaded) IVF-PQ index. The DataFrames are lazy — after
    * [[load]] they are plain parquet scans; after [[fitIvfPq]] they are
    * snapshotted fit outputs.
    */
  final case class IvfPqIndex(
      dim: Int,
      cells: Int,
      pqM: Int,
      pqKs: Int,
      seed: Long,
      centroids: DataFrame,
      codebooks: DataFrame,
      codes: DataFrame
  )

  /** v2 (round 13) adds `occupancy/` — the fit-time per-cell code counts
    * that anchor the [[staleness]] ledger after [[append]]s.
    */
  private val FormatVersion = 2

  /** Fit the index: coarse k-means ([[Similarity.kmeansCentroids]]) +
    * per-subspace PQ codebooks ([[Similarity.pqCodebooks]]), then ONE
    * assignment pass producing the codes-only corpus index (nearest cell
    * + m code ids per vector). Fit tables are snapshotted (each feeds
    * both the assignment pass and [[save]]). At 100 TB fit on a sample
    * via the underlying `fitSamplePercent` knobs' discipline and pass the
    * full corpus here only for the assignment/encode pass — both are
    * single broadcast-join passes, no corpus shuffle.
    */
  def fitIvfPq(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int = 16,
      iters: Int = 2,
      seed: Long = 42L,
      pqM: Int = 4,
      pqKs: Int = 8,
      pqIters: Int = 2,
      dim: Int = Similarity.AutoDim
  ): IvfPqIndex = {
    val d = Similarity.resolveDim(df.select(col(idCol).as("__id"), col(vecCol).as("__v")), dim)
    val centroids = Similarity
      .kmeansCentroids(df, idCol, vecCol, cells, iters, seed)
      .localCheckpoint(true) // feeds assignment AND save
    val cb = Similarity
      .pqCodebooks(df, idCol, vecCol, d, pqM, pqKs, pqIters, seed)
      .localCheckpoint(true) // feeds encode AND save
    val assigned = Similarity
      .cellRanks(Similarity.quantizedBase(df, idCol, vecCol), broadcast(centroids), 1)
      .select(col("__id").as("__nid"), col("__cid"))
    val codes = Similarity
      .pqEncode(df, idCol, vecCol, cb, d, pqM)
      .select(col("__id").as("__nid"), col("__codes"))
    IvfPqIndex(
      dim = d,
      cells = cells,
      pqM = pqM,
      pqKs = pqKs,
      seed = seed,
      centroids = centroids,
      codebooks = cb,
      codes = assigned.join(codes, Seq("__nid")).select("__cid", "__nid", "__codes")
    )
  }

  /** Persist the index under `dir` (overwrite). Codes are partitioned by
    * cell id — the probe-side pruning layout documented on the object.
    * Also snapshots `occupancy/` (per-cell code counts counted from the
    * WRITTEN files — the physical truth, one cheap codes-only scan): the
    * fit-time reference [[staleness]] diffs against after [[append]]s.
    */
  def save(index: IvfPqIndex, dir: String): Unit = {
    val spark = index.centroids.sparkSession
    import spark.implicits._
    Seq((FormatVersion, index.dim, index.cells, index.pqM, index.pqKs, index.seed))
      .toDF("version", "dim", "cells", "pq_m", "pq_ks", "seed")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/meta")
    index.centroids.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    index.codebooks.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    index.codes.write.mode("overwrite").partitionBy("__cid").parquet(s"$dir/codes")
    spark.read
      .parquet(s"$dir/codes")
      .groupBy(col("__cid").cast("int").as("__cid"))
      .agg(count(lit(1)).as("fit_n"))
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/occupancy")
  }

  /** Encode a NEW batch against the FROZEN fit — nearest frozen centroid
    * (cell id) + per-subspace nearest frozen codeword (m code ids) —
    * producing index-shaped rows (`__cid`, `__nid`, `__codes`). The same
    * two broadcast-join passes as [[fitIvfPq]]'s assignment/encode, with
    * the fit step skipped: at 100 TB an arriving batch costs
    * O(batch · (cells + m·ks)) comparisons and touches neither the
    * corpus nor the existing index files. A corpus row's code is a pure
    * function of (vector, centroids, codebooks), so encoding the corpus
    * itself through this path reproduces the fit-time index rows exactly
    * — the property the `llm_ann_index_append` oracle is built on.
    */
  def encodeAgainst(
      index: IvfPqIndex,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val assigned = Similarity
      .cellRanks(Similarity.quantizedBase(batch, idCol, vecCol), broadcast(index.centroids), 1)
      .select(col("__id").as("__nid"), col("__cid"))
    val codes = Similarity
      .pqEncode(batch, idCol, vecCol, index.codebooks, index.dim, index.pqM)
      .select(col("__id").as("__nid"), col("__codes"))
    assigned.join(codes, Seq("__nid")).select("__cid", "__nid", "__codes")
  }

  /** Incremental index maintenance: encode `batch` against the persisted
    * index's frozen centroids/codebooks ([[encodeAgainst]]) and APPEND
    * the rows to the cell-partitioned `codes/` layout — new files land
    * inside the touched cells' partitions only; existing files, the
    * centroids, codebooks, and the fit-time `occupancy/` snapshot are
    * untouched. Probing the appended index is identical to probing a
    * fresh fit-free index built from corpus ∪ batch under the same
    * frozen fit (oracle-gated by `llm_ann_index_append`).
    *
    * Caller contract: batch ids must be disjoint from already-indexed
    * ids (append never dedups — an id indexed twice is returned twice by
    * probes, like any multi-writer parquet sink). Staleness — how far
    * cell occupancy has drifted from the fit — is priced by
    * [[staleness]]; refit when the drift ledger says the frozen
    * centroids no longer describe the data.
    */
  def append(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String
  ): Unit =
    encodeAgainst(load(spark, dir), batch, idCol, vecCol)
      .write
      .mode("append")
      .partitionBy("__cid")
      .parquet(s"$dir/codes")

  /** Compact the `codes/` layout: every [[append]] lands one parquet
    * file per micro-batch per touched cell, so a long-lived index under
    * streaming ingest accumulates small files and probe cost grows with
    * FILE count while row count stands still. One codes-only pass
    * rewrites each cell partition into a single file (hash repartition
    * on `__cid`: all of a cell's rows land in one task → one file per
    * cell). Logically the identity — probing a compacted index is
    * bit-identical to probing the fragmented one (spec- and
    * oracle-gated) — and NOT a refit: centroids, codebooks, meta, and
    * the fit-time `occupancy/` snapshot are untouched, so [[staleness]]
    * reads the same drift before and after (spec-asserted invariant).
    *
    * Write-then-swap via the Hadoop FileSystem API (tmp dir → delete old
    * → rename), the same sequence a cluster deployment runs on HDFS; on
    * object stores without atomic rename, front the swap with a manifest
    * the way any parquet compactor does. Readers loaded BEFORE the swap
    * hold lazy scans of the old files and must re-[[load]] — same
    * contract as any non-transactional parquet rewrite.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val codesPath = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$dir/.codes_compacting")
    spark.read
      .parquet(codesPath.toString)
      .select("__cid", "__nid", "__codes")
      .repartition(col("__cid"))
      .write
      .mode("overwrite")
      .partitionBy("__cid")
      .parquet(tmpPath.toString)
    val fs = codesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(codesPath, true)
    require(fs.rename(tmpPath, codesPath), s"compact: rename $tmpPath -> $codesPath failed")
  }

  /** Staleness ledger: per-cell occupancy NOW (one codes-only scan) vs
    * the fit-time `occupancy/` snapshot. `added` > 0 marks cells grown by
    * [[append]]s since the fit; a cell whose occupancy has multiplied is
    * the refit signal (its probe cost grows linearly with occupancy, and
    * the frozen centroid that used to describe it may no longer). Cells
    * that gained their FIRST rows post-fit appear with fit_n = 0.
    */
  def staleness(spark: SparkSession, dir: String): DataFrame = {
    val fit = spark.read
      .parquet(s"$dir/occupancy")
      .select(col("__cid").cast("int").as("cell"), col("fit_n"))
    val now = spark.read
      .parquet(s"$dir/codes")
      .groupBy(col("__cid").cast("int").as("cell"))
      .agg(count(lit(1)).as("now_n"))
    fit
      .join(now, Seq("cell"), "full_outer")
      .select(
        col("cell"),
        coalesce(col("fit_n"), lit(0L)).as("fit_n"),
        coalesce(col("now_n"), lit(0L)).as("now_n"),
        (coalesce(col("now_n"), lit(0L)) - coalesce(col("fit_n"), lit(0L))).as("added")
      )
  }

  /** Load a persisted index. The returned DataFrames are lazy parquet
    * scans — nothing is read until a probe runs, and a probe touching
    * `nprobe` cells reads only those code partitions.
    */
  def load(spark: SparkSession, dir: String): IvfPqIndex = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val version = meta.getAs[Int]("version")
    require(version == FormatVersion, s"unsupported AnnIndex format version $version")
    IvfPqIndex(
      dim = meta.getAs[Int]("dim"),
      cells = meta.getAs[Int]("cells"),
      pqM = meta.getAs[Int]("pq_m"),
      pqKs = meta.getAs[Int]("pq_ks"),
      seed = meta.getAs[Long]("seed"),
      centroids = spark.read.parquet(s"$dir/centroids"),
      codebooks = spark.read.parquet(s"$dir/codebooks"),
      // partition-discovered __cid comes back as INT (written from int
      // cids); select the documented column order explicitly
      codes = spark.read.parquet(s"$dir/codes").select("__cid", "__nid", "__codes")
    )
  }

  /** Probe the index with a query batch: rank each query's `nprobe`
    * nearest cells (broadcast centroids), equi-join the codes-only index
    * on cell id, ADC-rank via the broadcast codeword map, and optionally
    * exact-rerank the top-`rerank` shortlist against `rerankFrom`
    * (id → original vector — the corpus, a feature store, ...).
    * `excludeSelf` drops qid = nid matches when the query batch IS the
    * indexed corpus (the [[Similarity.ivfPqTopK]] semantics — with it,
    * fit → save → load → probe over the same corpus is bit-identical to
    * the fused operator).
    */
  def probeIvfPq(
      index: IvfPqIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 2,
      rerank: Int = 0,
      rerankFrom: Option[DataFrame] = None,
      excludeSelf: Boolean = false
  ): DataFrame = {
    require(
      rerank <= k || rerankFrom.nonEmpty,
      "rerank > k needs rerankFrom (id, vector) to fetch originals from"
    )
    val probed = Similarity
      .cellRanks(
        Similarity.quantizedBase(queries, idCol, vecCol),
        broadcast(index.centroids),
        nprobe
      )
      .localCheckpoint(true) // snapshot the broadcast-scoring pass (the ivfPqTopK idiom)
    val orig = rerankFrom
      .getOrElse(queries)
      .select(col(idCol).as("__oid"), col(vecCol).as("__ov"))
    Similarity.pqAdcRank(
      probed.select(col("__id").as("__qid"), col("__qv"), col("__cid")),
      index.codes,
      Similarity.pqCodebookMap(index.codebooks, index.pqKs),
      index.pqM,
      index.pqKs,
      k,
      rerank,
      orig,
      excludeSelf
    )
  }

  /** [[probeIvfPq]] for SMALL query batches — the online-serving shape:
    * collect the batch's probed cell ids on the driver and filter the
    * codes scan with a LITERAL cell-id IN list. The collect itself is
    * bounded by the DISTINCT probed-cell count (≤ index.cells, never the
    * batch size); `maxProbedCells` caps the resulting IN-list size — the
    * guard fires AFTER the cell-rank pass and collect have run (both
    * bounded by cell count), so it protects plan quality (a huge literal
    * IN list defeats the pruning win), not driver memory. Because [[save]] partitions the codes by `__cid`,
    * the filter becomes STATIC partition pruning at planning time: the
    * scan touches only the probed cells' files — for a 10-vector batch at
    * nprobe = 2 over 1,024 cells, at most 20/1,024 of a ~3 TB index —
    * where [[probeIvfPq]]'s join form leaves file pruning to runtime
    * (DPP/AQE) and is the right call only when the batch is corpus-sized.
    * Results are identical to [[probeIvfPq]] on the same batch (same
    * building blocks; the filter only removes cells no query probes).
    */
  def probeIvfPqPruned(
      index: IvfPqIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 2,
      rerank: Int = 0,
      rerankFrom: Option[DataFrame] = None,
      excludeSelf: Boolean = false,
      maxProbedCells: Int = 4096
  ): DataFrame = {
    require(
      rerank <= k || rerankFrom.nonEmpty,
      "rerank > k needs rerankFrom (id, vector) to fetch originals from — " +
        "a small online batch is almost never a valid rerank vector source"
    )
    val probed = Similarity
      .cellRanks(
        Similarity.quantizedBase(queries, idCol, vecCol),
        broadcast(index.centroids),
        nprobe
      )
      .localCheckpoint(true) // read by the cell-list collect AND the rank
    val probedCells = probed.select(col("__cid").cast("int")).distinct().collect().map(_.getInt(0))
    require(
      probedCells.length <= maxProbedCells,
      s"batch probes ${probedCells.length} cells > maxProbedCells=$maxProbedCells — " +
        "use probeIvfPq (join form) for corpus-sized batches"
    )
    val prunedCodes = index.codes.filter(col("__cid").isin(probedCells.toIndexedSeq: _*))
    val orig = rerankFrom
      .getOrElse(queries)
      .select(col(idCol).as("__oid"), col(vecCol).as("__ov"))
    Similarity.pqAdcRank(
      probed.select(col("__id").as("__qid"), col("__qv"), col("__cid")),
      prunedCodes,
      Similarity.pqCodebookMap(index.codebooks, index.pqKs),
      index.pqM,
      index.pqKs,
      k,
      rerank,
      orig,
      excludeSelf
    )
  }
}
