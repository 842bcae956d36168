package graft.queries

import org.apache.spark.sql.SparkSession

/** Diagnostic main (round 19): dump `.explain("formatted")` for the
  * IVF/PQ FIT dataframes themselves — [[graft.llmops.Similarity.kmeansCentroids]]
  * and [[graft.llmops.Similarity.pqCodebooks]] — which registered query
  * plans cannot show because [[graft.llmops.AnnIndex.fitIvfPq]] snapshots
  * both behind a `localCheckpoint` (the fit executes eagerly while the
  * query is being BUILT, so its exchanges never appear in the query's own
  * plan dump). plans/r19 uses this for the Lloyd-round fuse before/after
  * evidence. Not part of any gate or bench; run by hand via
  * `sbt "Test/runMain graft.queries.FitPlanAudit [sfDir]"`.
  */
object FitPlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llmops.Similarity
    val fx = LlmQueries.clusteredFixture(spark, sfDir).localCheckpoint(true)
    println("\n================ fit_kmeans_centroids ================")
    Similarity
      .kmeansCentroids(fx, "vec_id", "v", cells = 8, iters = 2, seed = 42L)
      .explain("formatted")
    println("\n================ fit_pq_codebooks ================")
    Similarity
      .pqCodebooks(fx, "vec_id", "v", dim = LlmQueries.EmbDim, m = 8, ks = 32, iters = 2, seed = 42L)
      .explain("formatted")
    spark.stop()
  }
}
