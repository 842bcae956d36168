package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries over SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds. Failures are reported under
  * "errors" and excluded from the total (a broken query must never look
  * like a fast one).
  *
  * Execution is forced through the noop sink so every output column is
  * materialized — `count()` would let Spark skip projection work entirely.
  */
object Bench {

  /** Heavy/representative subset of the registry — every query family is
    * timed. The O(n²) brute ANN baseline (`llm_ann_top1`) and the
    * recall/consistency verification queries are deliberately NOT here:
    * the bucketed LSH/IVF paths are the registered scale entries.
    */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q12_flag_priority",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q6_forecast_revenue",
    "q18_large_orders",
    "q2_min_price_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_volume_shippers",
    "q21_sole_returner",
    "q22_idle_customers",
    "q_window_top_orders",
    "q_sessionize",
    "q_event_stats",
    "q_json_extract",
    "q_monthly_orders",
    "q_salted_join",
    "q_bucketed_join",
    "q_typed_udaf",
    "q_asof_join",
    "q_range_join",
    "q_retention_cohorts",
    "q_percentiles",
    "o1_typed_scan",
    "o2_typed_sink",
    "o1b_format_roundtrip",
    "o2b_partitioned_sink",
    "llm_text_stats",
    "llm_simhash",
    "llm_dedup_exact",
    "llm_dedup_incremental",
    "llm_dedup_normalized",
    "llm_source_mix",
    "llm_dedup_minhash",
    "llm_dedup_ngram",
    "llm_dedup_ngram_capped",
    "llm_dedup_clusters",
    "llm_simhash_pairs",
    "llm_ann_lsh",
    "llm_ann_ivf",
    "llm_cosine_neardup",
    "llm_train_split",
    "llm_seq_pack",
    "llm_vocab",
    "llm_tfidf",
    "llm_contamination",
    "llm_decontaminate",
    "llm_pii_scrub",
    "llm_gopher_rules",
    "llm_repetition",
    "llm_stratified_sample",
    "llm_chunking",
    "llm_corpus_pipeline",
    "llm_corpus_pipeline_v2",
    "llm_distinct_sketch",
    "llm_heavy_hitters",
    "llm_quantile_sketch",
    "llm_embed_quantize",
    "llm_embed_centroids",
    "llm_multimodal",
    "llm_multimodal_decode",
    "llm_multimodal_audio",
    "llm_multimodal_video",
    "t2_windowed_counts_batch_eq",
    "t3_sessionize_batch_eq",
    "t4_stream_dedup_batch_eq",
    "t6_stream_enrich_batch_eq",
    "t7_stream_stream_join_batch_eq",
    "t5_stream_textstats_batch_eq"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Session warmup: absorb codegen/classloading/parquet-footer costs so
    // the first timed query isn't charged for them.
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()

    val queries = SparkEntry.queries
    // optional args: subset of headline names (exact or prefix) for fast
    // local iteration; the driver passes none = full headline
    val selected =
      if (args.isEmpty) headline
      else headline.filter(n => args.exists(a => n == a || n.startsWith(a)))
    val results: Seq[(String, Either[String, Double])] = selected.map { name =>
      queries.get(name) match {
        case None =>
          // an unknown headline name must surface as an error, never make
          // the benchmark silently smaller (and faster-looking)
          name -> Left("not in SparkEntry.queries"): (String, Either[String, Double])
        case Some(fn) =>
          System.err.println(s"[bench] running $name")
          val t0 = System.nanoTime()
          val r: Either[String, Double] =
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              Right((System.nanoTime() - t0) / 1e9)
            } catch {
              case e: Throwable =>
                Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
            }
          // operators persist candidate projections; release between queries
          // so one query's cache can't skew the next one's timing
          spark.catalog.clearCache()
          r.foreach(s => System.err.println(f"[bench] $name: $s%.2f s"))
          r.left.foreach(m => System.err.println(s"[bench] $name FAILED: $m"))
          name -> r
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case '\n'         => "\\n"
        case '\r'         => "\\r"
        case '\t'         => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      } + "\""

    val ok = results.collect { case (n, Right(s)) => n -> s }
    val errs = results.collect { case (n, Left(m)) => n -> m }
    val qs = ok.map { case (k, v) => s"${jstr(k)}:${"%.3f".format(v)}" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}"""
    )
    spark.stop()
  }
}
