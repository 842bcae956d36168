package graft.tools

import graft.llmops.Bpe
import org.apache.spark.sql.SparkSession

/** Measure a REALISTIC merge schedule (round-11 verdict watch item): the
  * registered BPE gates run at toy merge counts, so the wall-clock of the
  * per-merge driver loop had never been measured. This probe trains both
  * learners at `numMerges` (default 200) over sf documents and prints
  * wall-clock + the merge tables' agreement, quantifying what
  * [[Bpe.learnLocal]] buys over the engine-side loop's 2-jobs-per-merge
  * schedule.
  *
  * With sfDir = `synthetic`, trains over a generated corpus of 6,000
  * DISTINCT words (base-20 letter encodings of 0..5999, so pair
  * statistics stay rich) — the testdata documents' small synthetic
  * vocabulary exhausts its pair space at ~106 rules, which can't sustain
  * a realistic ≥200-merge schedule.
  *
  *   sbt "runMain graft.tools.BpeMergeProbe [sfDir|synthetic] [numMerges] [engineToo]"
  */
object BpeMergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(200)
    val engineToo = args.lift(2).forall(_.toBoolean)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (sfDir == "synthetic") {
        // 6,000 distinct words, Zipf-ish frequencies (word i appears in
        // ~6000/(i+1) docs): base-20 letter encoding keeps characters
        // overlapping so pair statistics stay rich deep into the schedule
        import org.apache.spark.sql.functions._
        val words = udf { (id: Long) =>
          def enc(n: Long): String =
            if (n == 0) "a" else Iterator.iterate(n)(_ / 20).takeWhile(_ > 0).map(x => ('a' + (x % 20).toInt).toChar).mkString
          (0 until 40).map(j => enc((id * 37 + j * j + 11) % 6000)).mkString(" ")
        }
        spark.range(3000).select(col("id").as("doc_id"), words(col("id")).as("text")).localCheckpoint(true)
      } else spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint(true)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (localModel, localSec) = time {
      val m = Bpe.learnLocal(docs, numMerges = numMerges)
      m.merges.count() // materialize
      m
    }
    val localMerges = localModel.merges.orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    println(f"[bpe-probe] learnLocal: $numMerges merges in $localSec%.2f s (${localMerges.length} rules)")

    if (engineToo) {
      val (engineModel, engineSec) = time {
        val m = Bpe.learn(docs, numMerges = numMerges)
        m.merges.count()
        m
      }
      val engineMerges = engineModel.merges.orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
      println(f"[bpe-probe] learn (engine loop): $numMerges merges in $engineSec%.2f s (${engineMerges.length} rules)")
      println(s"[bpe-probe] merge tables identical: ${localMerges.sameElements(engineMerges)}")
      println(f"[bpe-probe] speedup: ${engineSec / localSec}%.1fx")
    }
    spark.stop()
  }
}
