package graft.tools

import graft.llmops.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Throwaway sizing probe (not part of the library surface): candidate
  * counts + shuffle bytes for the LSH family at explicit plane widths vs
  * the auto-sized width, at one SF dir. Usage: LshSizingProbe [sfDir].
  */
object LshSizingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
        if (m != null) written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    for (tb <- Seq(8L, 16L, 32L))
      println(s"n=$n targetBucket=$tb -> auto_planes=${Similarity.suggestedPlanes(n, tb)}")
    val base = e.select(col("vec_id").as("__id"), col("embedding").as("__v"))
    val brute = Similarity.bruteTopK(e, "vec_id", "embedding", k = 5).select("qid", "nid").localCheckpoint(true)
    val bruteN = brute.count()
    for (planes <- Seq(4, 5, 6, 7, 8, 9, 10)) {
      written.set(0)
      val c = Similarity.lshCandidates(base, tables = 8, planesPerTable = planes, seed = 42L, probeBits = math.min(5, planes), probeDepth = 2).count()
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      val candShuffle = written.get
      written.set(0)
      val top = Similarity
        .lshTopK(e, "vec_id", "embedding", k = 5, tables = 8, planesPerTable = planes, probeBits = 5, probeDepth = 2)
        .select("qid", "nid")
      val hits = top.join(brute, Seq("qid", "nid")).count()
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      println(
        f"planes=$planes candidates=$c%d cand_shuffle=$candShuffle%d topk_shuffle=${written.get}%d recall=${hits.toDouble / bruteN}%.4f"
      )
    }
    // Same sweep on the CLUSTERED fixture (the kmeans-gate construction:
    // v = center[md5(id) % 8] + 0.25 * embedding): real embeddings have
    // cluster structure, and this is where deep keys keep recall.
    val centers = Similarity.hyperplanes(8, 64, seed = 7L)
    val centerArr = array(centers.map(cv => array(cv.map(lit): _*)): _*)
    val cIdx = (conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10).cast("long") % 8).cast("int")
    val cf = e.select(
      col("vec_id"),
      zip_with(element_at(centerArr, cIdx + 1), col("embedding"), (c, x) => c + lit(0.25) * x.cast("double")).as("v")
    ).localCheckpoint(true)
    val cbase = cf.select(col("vec_id").as("__id"), col("v").as("__v"))
    val cbrute = Similarity.bruteTopK(cf, "vec_id", "v", k = 5).select("qid", "nid").localCheckpoint(true)
    val cbruteN = cbrute.count()
    for (planes <- Seq(4, 6, 8, 10, 12)) {
      written.set(0)
      val c = Similarity.lshCandidates(cbase, tables = 8, planesPerTable = planes, seed = 42L, probeBits = math.min(5, planes), probeDepth = 2).count()
      org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark.sparkContext)
      val candShuffle = written.get
      val hits = Similarity
        .lshTopK(cf, "vec_id", "v", k = 5, tables = 8, planesPerTable = planes, probeBits = 5, probeDepth = 2)
        .select("qid", "nid")
        .join(cbrute, Seq("qid", "nid"))
        .count()
      println(
        f"clustered planes=$planes candidates=$c%d cand_shuffle=$candShuffle%d recall=${hits.toDouble / cbruteN}%.4f"
      )
    }
    spark.stop()
  }
}
