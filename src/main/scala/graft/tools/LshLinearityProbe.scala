package graft.tools

import graft.llmops.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Auto-LSH linearity measurement in an UNSATURATED regime (round-8 verdict
  * #1): at the gate SFs (n = 500 / 2,000) the distinct-candidate count
  * saturates near all-pairs (249,448 of 249,500 possible at n = 500), so a
  * two-point shuffle audit cannot show that auto-width candidate volume
  * grows ≈ linearly — the denominator physically can't go lower. This
  * probe synthesizes deterministic dim-64 corpora at n = 2,000 / 8,000 /
  * 32,000 (4× steps; 2,000 matches the sf0.1 real-table scale) and
  * measures, for each of the three REGISTERED auto shapes
  * (self top-k = llm_ann_lsh_auto, threshold pairs =
  * llm_cosine_neardup_auto, retrieval = llm_ann_lsh_auto_xtable):
  * auto-chosen planes, distinct candidate pairs, and candidate-build
  * shuffle bytes — on the structureless gaussian regime AND the clustered
  * fixture construction (center[id % 8] + 0.25·noise).
  *
  * Linearity claim under test: expected bucket occupancy is pinned at
  * targetBucket for any n ([[Similarity.suggestedPlanes]]), so raw
  * candidate volume is bounded by n · tables · masks · targetBucket —
  * candidates and shuffle bytes should grow ≈ the 4× data factor between
  * consecutive sizes once saturation no longer floors the ratio.
  *
  * Usage: runMain graft.tools.LshLinearityProbe [outCsv]
  * (synthetic vectors: fixed 32-partition `randn(colSeed)` layout —
  * deterministic for a fixed partitioning, independent of the testdata
  * parquet so n can exceed the driver tables).
  */
object LshLinearityProbe {
  private val Dim = 64
  private val Tables = 8
  private val ProbeBits = 5
  private val ProbeDepth = 2
  private val TargetBucket = 32L

  def main(args: Array[String]): Unit = {
    val outCsv = args.headOption.getOrElse("bench_results/round9_lsh_linearity.csv")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq else Seq(2000L, 8000L, 32000L, 128000L)
    val explain = sys.env.contains("LSH_PROBE_EXPLAIN")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val written = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          if (sys.env.contains("LSH_PROBE_STAGES"))
            println(
              s"[stage] id=${sc.stageInfo.stageId} name=${sc.stageInfo.name.takeWhile(_ != '\n').take(80)} " +
                s"write=${m.shuffleWriteMetrics.bytesWritten} read=${m.shuffleReadMetrics.totalBytesRead} " +
                s"records=${m.shuffleWriteMetrics.recordsWritten}"
            )
        }
      }
    })

    /** Deterministic synthetic corpus: 32 fixed partitions, one randn column
      * seed per dimension — same layout ⇒ same vectors on every run.
      */
    def synth(n: Long): DataFrame = {
      val cols = (0 until Dim).map(j => randn(1000L + j))
      spark.range(0L, n, 1L, 32)
        .select(col("id").as("vec_id"), array(cols: _*).as("embedding"))
        .localCheckpoint(true)
    }

    /** The clustered-fixture construction over the same synthetic base. */
    def clustered(e: DataFrame): DataFrame = {
      val centers = Similarity.hyperplanes(8, Dim, seed = 7L)
      val centerArr = array(centers.map(cv => array(cv.map(lit): _*)): _*)
      val cIdx = (conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10).cast("long") % 8).cast("int")
      e.select(
        col("vec_id"),
        zip_with(element_at(centerArr, cIdx + 1), col("embedding"), (c, x) => c + lit(0.25) * x).as("v")
      ).localCheckpoint(true)
    }

    /** (distinct candidates, explicit pair-dedup shuffle bytes). The SQL
      * count itself shuffles almost nothing — the banded ids+keys index
      * broadcasts and every copy of a pair lives in its qid's partition,
      * so Spark's dedup exchange carries count partials only. The
      * well-defined byte measure is therefore an EXPLICIT pair-level
      * distinct (RDD shuffle): the bytes any pair-materializing consumer
      * (threshold filter, cluster build) must move.
      */
    def measure(label: String, n: Long, cand: DataFrame): (String, Long, Long) = {
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      if (explain) println(s"=== $label n=$n ===\n" + cand.queryExecution.executedPlan.toString.take(6000))
      written.set(0)
      // 128-way distinct keeps per-task dedup maps heap-safe at the
      // ~1e9-pair sizes (the 16-way default OOMs a 24 GB heap at n=128k)
      val c = cand.rdd.map(r => (r.getLong(0), r.getLong(1))).distinct(128).count()
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      (label, c, written.get)
    }

    /** Whole-query shuffle bytes of a registered auto-shape query run to a
      * noop sink — what llm_ann_lsh_auto itself moves.
      */
    def measureQuery(df: => DataFrame): Long = {
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      written.set(0)
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      written.get
    }

    val rows = scala.collection.mutable.ListBuffer.empty[String]
    rows += "regime,shape,n,auto_planes,candidates,pair_shuffle_bytes,topk_query_shuffle_bytes"
    for (n <- sizes) {
      val planes = Similarity.suggestedPlanes(n, TargetBucket)
      val e = synth(n)
      val cf = clustered(e)
      val regimes = Seq(
        ("structureless", e, "embedding"),
        ("clustered", cf, "v")
      ).filter(r => sys.env.get("LSH_PROBE_REGIME").forall(_ == r._1))
      for ((regime, tbl, vcol) <- regimes) {
        val base = tbl.select(col("vec_id").as("__id"), col(vcol).as("__v"))
        // self-join shape (llm_ann_lsh_auto / llm_cosine_neardup_auto share
        // this generator — the threshold filter consumes the same pairs)
        val (_, selfC, selfB) = measure(
          "self", n,
          Similarity.lshCandidates(base, Tables, planes, 42L, math.min(ProbeBits, planes), ProbeDepth, Dim)
        )
        // the registered query end-to-end (candidates + exact re-rank
        // window) — capped at 32k where the exact re-rank stays local-box
        // affordable; pair-level numbers carry the 128k point
        val topkB =
          if (n <= 32000L)
            measureQuery(
              Similarity.lshTopK(tbl, "vec_id", vcol, k = 5, tables = Tables, probeBits = ProbeBits, probeDepth = ProbeDepth, dim = Dim)
            )
          else -1L
        rows += s"$regime,self,$n,$planes,$selfC,$selfB,$topkB"
        println(s"[linearity] $regime self n=$n planes=$planes candidates=$selfC pairShufB=$selfB topkB=$topkB")
        // retrieval shape (llm_ann_lsh_auto_xtable): 5% query side vs the rest
        val qb = base.filter(col("__id") % 20 === 0)
        val cb = base.filter(col("__id") % 20 =!= 0)
        val (_, xC, xB) = measure(
          "xtable", n,
          Similarity.lshCandidatesAgainst(qb, cb, Tables, Similarity.AutoPlanes, 42L, ProbeBits, ProbeDepth, TargetBucket, Dim)
        )
        rows += s"$regime,xtable,$n,$planes,$xC,$xB,-1"
        println(s"[linearity] $regime xtable n=$n planes=$planes candidates=$xC pairShufB=$xB")
      }
      e.unpersist()
      cf.unpersist()
    }
    val out = java.nio.file.Paths.get(outCsv)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, rows.mkString("\n") + "\n")
    println(s"[linearity] wrote $outCsv")
    spark.stop()
  }
}
