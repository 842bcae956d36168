package graft.tools

import graft.llmops._
import org.apache.spark.sql.SparkSession

/** Edge-case probe for llmops operators: docs shorter than the shingle
  * width, empty text, exact duplicates. Run: sbt "runMain graft.tools.EdgeProbe"
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, ""), (2L, "x y z w"), (3L, "x y z w"), (4L, "one"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", k = 3, numHashes = 16, bands = 4, tau = 0.8)
    println("minhash pairs: " + pairs.collect().mkString(", "))
    val ng = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.5)
    println("ngram pairs: " + ng.collect().mkString(", "))
    val stats = TextStats.withStats(docs).select("doc_id", "n_tokens", "avg_token_len").collect()
    println("stats: " + stats.mkString(", "))
    val sim = docs.select($"doc_id", Fingerprints.simhash64($"text").as("sh")).collect()
    println("simhash: " + sim.mkString(", "))
    val media = Multimodal.attachBinary(docs).as[Multimodal.MediaRow]
    val decoded = Multimodal
      .decodeBatched(media)(() => (m: Multimodal.MediaRow) => (m.doc_id, m.meta.byte_len))
      .collect()
      .sortBy(_._1)
    println("decoded: " + decoded.mkString(", "))
    spark.stop()
  }
}
