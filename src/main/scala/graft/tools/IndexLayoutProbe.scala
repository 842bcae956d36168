package graft.tools

import graft.llmops.AnnIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 measurement probe for the AnnIndex v4 on-disk layout: builds a
  * persisted IVF-PQ index from the embeddings table, fragments it with
  * three appends, and measures the two physical properties the versioned
  * `__batch=/__cid=` layout claims:
  *
  *   1. STATIC partition pruning survives the two-level layout AND the
  *      committed-layer multi-path read: the pruned probe's codes scan
  *      must carry a `__cid IN (...)` PartitionFilter and read only the
  *      probed cells' files (numFiles ≪ total index files);
  *   2. probe cost is FILE-COUNT-FLAT across compact: after three
  *      appends the same probe reads one file per (probed cell × layer),
  *      after compact exactly one file per probed cell — row count
  *      unchanged.
  *
  *   IndexLayoutProbe [sfDir]   → human-readable report on stdout
  */
object IndexLayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // plain physical plans: the probe reads per-scan metrics off the
      // exact executed instance, which AQE's stage wrappers would hide
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .localCheckpoint(true)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_layoutprobe").toString

    val idx = AnnIndex.fitIvfPq(corpus, "vec_id", "v", cells = 16, iters = 2, pqM = 4, pqKs = 8, pqIters = 2)
    AnnIndex.save(idx, dir)
    (0 until 3).foreach { i =>
      AnnIndex.append(spark, dir, batch.filter(col("vec_id") % 3 === i), "vec_id", "v", batchId = i.toLong)
    }

    // external view of the commit rule: highest codes_v<N> carrying both
    // the root _SUCCESS and the _ABSORBED_<hwm> marker
    def currentGen(): java.io.File =
      new java.io.File(dir)
        .listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("codes_v"))
        .filter(f =>
          new java.io.File(f, "_SUCCESS").exists &&
            f.listFiles().exists(_.getName.startsWith("_ABSORBED_"))
        )
        .maxBy(_.getName.stripPrefix("codes_v").toInt)

    def indexFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(currentGen()).count(_.getName.endsWith(".parquet"))
    }

    def probeStats(tag: String): Unit = {
      val loaded = AnnIndex.load(spark, dir)
      val probeBatch = emb.filter(col("vec_id") % 97 === 0)
      val probed = AnnIndex.probeIvfPqPruned(
        loaded, probeBatch, "vec_id", "v", k = 5, nprobe = 2, rerank = 20, rerankFrom = Some(emb), excludeSelf = true)
      val qe = probed.queryExecution
      // execute THIS plan instance so its scan metrics are the ones filled
      val rows = qe.executedPlan.execute().count()
      val scans = qe.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(dir)) =>
          s
      }
      val numFiles = scans.map(_.metrics("numFiles").value).sum
      val pf = scans
        .flatMap(_.toString.linesIterator.filter(_.contains("PartitionFilters")))
        .mkString(" | ")
        .take(300)
      println(s"[$tag] generation=${currentGen().getName} " +
        s"index_files_total=${indexFiles()} probe_files_read=$numFiles probe_rows=$rows")
      println(s"[$tag] $pf")
    }

    println(s"== IndexLayoutProbe @ $sfDir (cells=16, 3 append layers) ==")
    probeStats("fragmented")
    AnnIndex.compact(spark, dir)
    // full reclaim so index_files_total reflects ONLY the compacted
    // generation (the retention default would keep the superseded one)
    AnnIndex.vacuum(spark, dir, keepGenerations = 0)
    probeStats("compacted")
    spark.stop()
  }
}
