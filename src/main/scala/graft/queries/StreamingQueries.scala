package graft.queries

import graft.contracts.SchemaPolicy
import graft.streaming.TypedStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-verifiable Structured Streaming queries: each runs a real stream
  * (file source → watermarked stateful aggregation → contract-pinned
  * parquet sink) to completion with `Trigger.AvailableNow`, reads the sink
  * back, and must hash-match a batch SQL oracle — the batch-equivalence
  * guarantee Structured Streaming promises, checked cross-engine.
  *
  * Determinism note: the staged input directory holds ONE parquet file, so
  * the stream is a single data micro-batch — no intermediate watermark can
  * drop "late" rows — followed by the no-data batch that advances the
  * watermark to max(event time) and flushes every closed window. Windows
  * still open at end-of-stream (end > final watermark) correctly never
  * emit in append mode, and the oracle applies the same cutoff.
  */
object StreamingQueries {

  import QueryDef._

  /** Stateful-operator parallelism for these gates. The state-store
    * partition count is pinned by the FIRST micro-batch of a checkpoint
    * (it is the shuffle partition count at that moment), and every
    * partition pays a per-commit delta-file fsync — so it must be sized to
    * state cardinality, not left at the relational default. These streams
    * hold 1.5k–7.5k state rows; 8 partitions keeps every executor busy at
    * that size while quartering the commit fsyncs. On a real cluster the
    * same deliberate choice applies (and is why this is a parameter of the
    * run, not a hardcoded global).
    */
  private def withStatePartitions[T](spark: org.apache.spark.sql.SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body
    finally spark.conf.set(key, prev)
  }

  /** Contract for the windowed-count sink rows. */
  final case class WindowedCount(window_start_s: Long, window_end_s: Long, event_type: String, n: Long)

  /** Stage the single events file into a fresh directory (file-source
    * streams read directories) and return (inDir, outDir, checkpointDir).
    */
  private def stageEvents(sf: String, tag: String): (String, String, String) = {
    val in = tmpDir(s"${tag}_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$in/events.parquet")
    )
    (in, tmpDir(s"${tag}_out"), tmpDir(s"${tag}_ckpt"))
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef(
      "t2_windowed_counts_batch_eq",
      Some(
        // pure integer window math (epoch-ns // 1h), same cutoff as the
        // final watermark: windows whose end is past max(ts) stay open in
        // append mode and are excluded on both sides.
        """WITH w AS (SELECT CAST(epoch_ns(ts) // 3600000000000 * 3600 AS BIGINT) AS ws, event_type
          |           FROM events)
          |SELECT ws AS window_start_s, ws + 3600 AS window_end_s, event_type, CAST(count(*) AS BIGINT) AS n
          |FROM w GROUP BY 1, 2, 3
          |HAVING (ws + 3600) * 1000000 <= (SELECT epoch_ns(max(ts)) // 1000 FROM events)""".stripMargin
      ),
      (spark, sf) => withStatePartitions(spark, 8) {
        val (in, out, ckpt) = stageEvents(sf, "t2")
        val schema = spark.read.parquet(s"$sf/events.parquet").schema
        val stream = QueryDef.normalizeTs(spark.readStream.schema(schema).parquet(in))
        // events.ts is long nanoseconds (normalizeTs) → event-time column
        // at microsecond precision for the watermark/window machinery
        val withTs = stream.withColumn("ts2", timestamp_micros(expr("ts div 1000")))
        val counts = TypedStreams
          .windowedCounts(withTs, tsCol = "ts2", keyCol = "event_type", watermark = "0 seconds", windowDuration = "1 hour")
          .select(
            col("window_start").cast("long").as("window_start_s"),
            col("window_end").cast("long").as("window_end_s"),
            col("event_type"),
            col("n")
          )
        TypedStreams
          .writeStream[WindowedCount, SchemaPolicy.ExactT](counts, out, ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out)
      }
    ),
    QueryDef(
      "t3_sessionize_batch_eq",
      Some(
        // gaps-and-islands over millisecond event time, 30-minute gap.
        // Closed sessions only: the stream's final session per key is still
        // open in state at end-of-stream (append mode, no timeout), so the
        // oracle drops each key's last session — the same batch/stream
        // equivalence the engine promises.
        """WITH ev AS (SELECT user_id AS key, epoch_ns(ts) // 1000000 AS ms, event_id FROM events),
          |d AS (SELECT key, ms,
          |        CASE WHEN lag(ms) OVER (PARTITION BY key ORDER BY ms, event_id) IS NULL
          |               OR ms - lag(ms) OVER (PARTITION BY key ORDER BY ms, event_id) > 1800000
          |             THEN 1 ELSE 0 END AS brk
          |      FROM ev),
          |g AS (SELECT key, ms,
          |        sum(brk) OVER (PARTITION BY key ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
          |      FROM d),
          |s AS (SELECT key, sid, CAST(min(ms) AS BIGINT) AS session_start,
          |        CAST(max(ms) AS BIGINT) AS session_end, CAST(count(*) AS BIGINT) AS n_events
          |      FROM g GROUP BY 1, 2),
          |r AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY sid DESC) AS rn FROM s)
          |SELECT key, session_start, session_end, n_events FROM r WHERE rn > 1""".stripMargin
      ),
      (spark, sf) => withStatePartitions(spark, 8) {
        val (in, out, ckpt) = stageEvents(sf, "t3")
        runSessionize(spark, sf, in, out, ckpt)
      }
    ),
    QueryDef(
      "t5_stream_textstats_batch_eq",
      Some(
        // identical SQL to the batch llm_text_stats oracle: stateless
        // per-row operators apply to a stream unchanged, and the sink must
        // hash-match the batch answer exactly.
        """SELECT doc_id,
          |  CAST(length(text) AS BIGINT) AS n_chars_calc,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
          |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
          |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS distinct_ratio
          |FROM documents""".stripMargin
      ),
      (spark, sf) => {
        val in = tmpDir("t5_in")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/documents.parquet"),
          java.nio.file.Paths.get(s"$in/documents.parquet")
        )
        val out = tmpDir("t5_out")
        val ckpt = tmpDir("t5_ckpt")
        val schema = spark.read.parquet(s"$sf/documents.parquet").schema
        val stats = TypedStreams
          .streamingTextStats(spark.readStream.schema(schema).parquet(in))
          .select("doc_id", "n_chars_calc", "n_tokens", "n_distinct_tokens", "avg_token_len", "distinct_ratio")
        stats.writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out)
      }
    ),
    QueryDef(
      "t6_stream_enrich_batch_eq",
      Some(
        // stateless stream-static join: the streamed result must equal the
        // batch join exactly — no watermark, no state, no cutoff needed.
        """SELECT event_id, user_id, c_name, event_type, value
          |FROM events JOIN customer ON user_id = c_custkey""".stripMargin
      ),
      (spark, sf) => {
        val (in, out, ckpt) = stageEvents(sf, "t6")
        val schema = spark.read.parquet(s"$sf/events.parquet").schema
        val stream = spark.readStream.schema(schema).parquet(in)
          .select("event_id", "user_id", "event_type", "value")
        val dim = spark.read
          .parquet(s"$sf/customer.parquet")
          .select(col("c_custkey").as("user_id"), col("c_name"))
        TypedStreams
          .enrichStream(stream, dim, Seq("user_id"))
          .select("event_id", "user_id", "c_name", "event_type", "value")
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out)
      }
    ),
    QueryDef(
      "t7_stream_stream_join_batch_eq",
      Some(
        // the streaming analogue of q_range_join, inner form: every
        // (error, click) pair for the same user within ±1 hour. A
        // single data micro-batch holds both sides in full, and the
        // event-time range condition makes the match set a deterministic
        // function of the data — the batch inequality join reproduces it.
        """WITH er AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events WHERE event_type = 'error'),
          |cl AS (SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS cus FROM events WHERE event_type = 'click')
          |SELECT er.event_id, cl.click_id
          |FROM er JOIN cl ON er.user_id = cl.user_id
          |  AND cl.cus BETWEEN er.us - 3600000000 AND er.us + 3600000000""".stripMargin
      ),
      (spark, sf) => withStatePartitions(spark, 8) {
        val (in, out, ckpt) = stageEvents(sf, "t7")
        val schema = spark.read.parquet(s"$sf/events.parquet").schema
        def side(tpe: String, idAs: String, uidAs: String, tsAs: String) =
          QueryDef.normalizeTs(spark.readStream.schema(schema).parquet(in))
            .filter(col("event_type") === tpe)
            .select(
              col("event_id").as(idAs),
              col("user_id").as(uidAs),
              timestamp_micros(expr("ts div 1000")).as(tsAs)
            )
            // watermarks bound the join state: each side retains only
            // rows inside (watermark − join window) — at a real stream
            // rate state is proportional to the time window, never the
            // stream length
            .withWatermark(tsAs, "2 hours")
        val errors = side("error", "event_id", "euid", "ets")
        val clicks = side("click", "click_id", "cuid", "cts")
        val joined = errors.join(
          clicks,
          expr(
            """euid = cuid AND
              |cts BETWEEN ets - INTERVAL 1 HOUR AND ets + INTERVAL 1 HOUR""".stripMargin
          )
        )
        joined
          .select("event_id", "click_id")
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out)
      }
    ),
    QueryDef(
      "t4_stream_dedup_batch_eq",
      Some(
        // WHICH duplicate row survives streaming dedup depends on arrival
        // order (nondeterministic across partitions), but the surviving
        // KEY SET is the distinct set — that is what batch equivalence
        // promises and what the oracle pins.
        "SELECT DISTINCT user_id, event_type FROM events"
      ),
      (spark, sf) => withStatePartitions(spark, 8) {
        val (in, out, ckpt) = stageEvents(sf, "t4")
        val schema = spark.read.parquet(s"$sf/events.parquet").schema
        val stream = QueryDef.normalizeTs(spark.readStream.schema(schema).parquet(in))
          .withColumn("ts2", timestamp_micros(expr("ts div 1000")))
          .withColumn("text", concat_ws("|", col("user_id"), col("event_type")))
        // column pruning crosses the stateful dedup: the shuffle carries
        // only the dedup key + output columns, not the full event row
        // (measured with tools/ShuffleAudit — an explicit pre-projection
        // changes nothing)
        val deduped = TypedStreams
          .streamingDedupExact(stream, tsCol = "ts2", watermark = "1 hour")
          .select("user_id", "event_type")
        deduped.writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).select("user_id", "event_type")
      }
    ),
    QueryDef(
      "t8_stream_ingest_dedup_batch_eq",
      Some(
        // streaming form of the ingest-dedup stage of llm_ingest_pipeline:
        // the arriving batch (10% of docs plus six re-ingested corpus
        // copies, so the drop path is non-vacuous) streams through a
        // stream-static LEFT ANTI join against the stored corpus's content
        // keys. Stateless — no watermark, no state — so the streamed
        // survivor set must equal the batch anti-join exactly.
        """WITH batch AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
          |  UNION ALL
          |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 97 = 1 AND doc_id % 10 <> 0)
          |SELECT doc_id, md5(text) AS ck FROM batch
          |WHERE md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 10 <> 0)""".stripMargin
      ),
      (spark, sf) => {
        val in = tmpDir("t8_in")
        val out = tmpDir("t8_out")
        val ckpt = tmpDir("t8_ckpt")
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        docs
          .filter(col("doc_id") % 10 === 0)
          .select("doc_id", "text")
          .unionByName(
            docs
              .filter(col("doc_id") % 97 === 1 && col("doc_id") % 10 =!= 0)
              .select(LlmQueries.copyId(col("doc_id")).as("doc_id"), col("text"))
          )
          .write
          .mode("overwrite")
          .parquet(in)
        val index = docs
          .filter(col("doc_id") % 10 =!= 0)
          .select(graft.llmops.Fingerprints.contentKeyMd5(col("text")).as("ck"))
          .distinct()
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING")
          .parquet(in)
          .select(col("doc_id"), graft.llmops.Fingerprints.contentKeyMd5(col("text")).as("ck"))
          .join(index, Seq("ck"), "left_anti")
        stream.writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).select("doc_id", "ck")
      }
    ),
    QueryDef(
      "t9_stream_neardup_ingest_batch_eq",
      Some(
        // streaming form of the ingest NEAR-dup stage: arriving docs (10%)
        // stream through simhash56 banding (4 × 14-bit slices) and a
        // stream-static equi-join against the stored corpus's band-key
        // index, candidates verified at Hamming <= 3. Stateless per-row
        // ops + inner equi-join + filter — no watermark, no state — so
        // the streamed (a, b, band, hamming) multiset must equal the
        // batch banding exactly (pairs sharing k bands emit k rows on
        // both sides; pigeonhole guarantees k >= 1 for every true pair).
        // The oracle recomputes the simhash from scratch in DuckDB.
        s"""WITH ${LlmQueries.simhash56Cte},
           |bb AS (SELECT doc_id, simhash, i AS band, (simhash >> CAST(14 * i AS INTEGER)) & 16383 AS key
           |       FROM sh56, range(0, 4) r(i) WHERE doc_id % 10 = 0),
           |cb AS (SELECT doc_id, simhash, i AS band, (simhash >> CAST(14 * i AS INTEGER)) & 16383 AS key
           |       FROM sh56, range(0, 4) r(i) WHERE doc_id % 10 <> 0)
           |SELECT bb.doc_id AS a, cb.doc_id AS b, CAST(bb.band AS BIGINT) AS band,
           |       CAST(bit_count(xor(bb.simhash, cb.simhash)) AS BIGINT) AS hamming
           |FROM bb JOIN cb ON bb.band = cb.band AND bb.key = cb.key
           |WHERE bit_count(xor(bb.simhash, cb.simhash)) <= 3""".stripMargin
      ),
      (spark, sf) => {
        import graft.llmops.Fingerprints
        val in = tmpDir("t9_in")
        val out = tmpDir("t9_out")
        val ckpt = tmpDir("t9_ckpt")
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        docs
          .filter(col("doc_id") % 10 === 0)
          .select("doc_id", "text")
          .write
          .mode("overwrite")
          .parquet(in)
        // corpus index: (band, key, corpus id, corpus simhash) — ids +
        // band keys + 56-bit hashes only, never text; at 100 TB this is
        // the precomputed store the stream joins against
        val index = docs
          .filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id").as("b"), Fingerprints.simhash56Md5(col("text")).as("__bsim"))
          .select(col("b"), col("__bsim"), posexplode(Fingerprints.simhashBands(col("__bsim"), 4, 56)).as(Seq("band", "key")))
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING")
          .parquet(in)
          .select(col("doc_id").as("a"), Fingerprints.simhash56Md5(col("text")).as("__asim"))
          .select(col("a"), col("__asim"), posexplode(Fingerprints.simhashBands(col("__asim"), 4, 56)).as(Seq("band", "key")))
          .join(index, Seq("band", "key"))
          .withColumn("hamming", bit_count(col("__asim").bitwiseXOR(col("__bsim"))).cast("long"))
          .filter(col("hamming") <= 3)
          .select(col("a"), col("b"), col("band").cast("long").as("band"), col("hamming"))
        stream.writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).select("a", "b", "band", "hamming")
      }
    ),
    // Incremental HLL maintenance over a real multi-batch stream: the
    // corpus arrives as THREE micro-batches (maxFilesPerTrigger=1), each
    // batch emits its PARTIAL register table via foreachBatch, and the
    // read side folds them with the register-MAX merge — the streaming
    // form of the [[graft.llmops.Sketches.hllMerge]] algebra. Because
    // register merge is idempotent and order-free, the result must equal
    // the one-shot batch registers over the whole corpus EXACTLY (the
    // same rows llm_hll_sketch derives) — no watermark, no state store:
    // the sketch itself is the state, which is why mergeable sketches are
    // the streaming-cardinality answer at 100 TB.
    QueryDef(
      "t10_stream_hll_batch_eq",
      Some(
        """WITH t0 AS (SELECT string_split(text, ' ') AS toks FROM documents),
          |tok AS (SELECT unnest(list_distinct(list_transform(range(len(toks)-2),
          |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS t FROM t0),
          |h AS (SELECT CAST((CAST(concat('0x', substr(md5(t), 1, 7)) AS UBIGINT) << 28)
          |        + CAST(concat('0x', substr(md5(t), 8, 7)) AS UBIGINT) AS BIGINT) AS hv FROM tok),
          |r AS (SELECT hv >> 50 AS bucket, hv & 4294967295 AS w FROM h),
          |rh AS (SELECT bucket, CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END AS rho FROM r)
          |SELECT bucket, max(rho) AS m_j FROM rh GROUP BY 1""".stripMargin
      ),
      (spark, sf) => {
        import graft.llmops.{Fingerprints, Sketches}
        val in = tmpDir("t10_in")
        val out = tmpDir("t10_out")
        val ckpt = tmpDir("t10_ckpt")
        // three files -> three micro-batches under maxFilesPerTrigger=1
        spark.read
          .parquet(s"$sf/documents.parquet")
          .select("doc_id", "text")
          .repartition(3)
          .write
          .mode("overwrite")
          .parquet(in)
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
        stream.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            // per-batch PARTIAL registers appended to the sink; the merge
            // happens at read. Micro-batch boundaries can't change the
            // answer — register max is associative, commutative, and
            // idempotent (a replayed batch after a crash folds to the
            // same registers: exactly-once NOT required).
            Sketches
              .hllRegisters(
                batch.select(explode(Fingerprints.shingles(col("text"), 3)).as("t")),
                "t",
                p = 6
              )
              .write
              .mode("append")
              .parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        Sketches.hllMerge(spark.read.parquet(out))
      }
    ),
    QueryDef(
      "t11_stream_nb_score_batch_eq",
      Some(
        // quality-classifier scoring at ingest: the NB model is FROZEN
        // (fitted batch-side on the full labeled corpus), each micro-batch
        // of arriving docs is scored against it. A doc's score depends
        // only on its own tokens and the frozen model, so micro-batch
        // boundaries cannot change any score and the streamed sink must
        // equal the batch scoring of the same corpus exactly. The oracle
        // is the batch replay: training + scoring in SQL (every corpus
        // token is in-vocab here, so n_oov = 0; the OOV branch is gated
        // separately by llm_nb_xtable).
        """WITH t AS (SELECT doc_id, (lang = 'zh') AS pos, string_split(text, ' ') AS toks FROM documents),
          |o AS (SELECT doc_id, pos, unnest(toks) AS tok FROM t),
          |v AS (SELECT tok,
          |        CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
          |        CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cneg FROM o GROUP BY 1),
          |ct AS (SELECT CAST(sum(cpos) AS BIGINT) AS tpos, CAST(sum(cneg) AS BIGINT) AS tneg,
          |         CAST(count(*) AS BIGINT) AS vs FROM v),
          |w AS (SELECT tok,
          |        ((length(bin(cpos + 1)) - 1) - (length(bin(tpos + vs)) - 1))
          |      - ((length(bin(cneg + 1)) - 1) - (length(bin(tneg + vs)) - 1)) AS w
          |      FROM v, ct),
          |p AS (SELECT (length(bin(CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) + 1)) - 1)
          |           - (length(bin(CAST(sum(CASE WHEN lang = 'zh' THEN 0 ELSE 1 END) AS BIGINT) + 1)) - 1) AS prior
          |      FROM documents),
          |s AS (SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          |        CAST(sum(CASE WHEN w.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          |        CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS known
          |      FROM o LEFT JOIN w USING (tok) GROUP BY 1)
          |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens, coalesce(n_oov, 0) AS n_oov,
          |  CAST(coalesce(known, 0) + prior AS BIGINT) AS nb_score,
          |  (coalesce(known, 0) + prior) > 0 AS nb_positive
          |FROM documents d LEFT JOIN s USING (doc_id), p""".stripMargin
      ),
      (spark, sf) => {
        import graft.llmops.Selection
        val in = tmpDir("t11_in")
        val out = tmpDir("t11_out")
        val ckpt = tmpDir("t11_ckpt")
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        val model = Selection.nbFit(docs, col("lang") === "zh")
        // three files -> three micro-batches under maxFilesPerTrigger=1
        docs
          .select("doc_id", "text")
          .repartition(3)
          .write
          .mode("overwrite")
          .parquet(in)
        spark.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            // deterministic scores against the frozen model: a replayed
            // batch after a crash appends IDENTICAL rows, removed by the
            // id-dedup at read — effectively-once without a stateful sink
            Selection.nbScore(batch, model).write.mode("append").parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).dropDuplicates("doc_id")
      }
    ),
    // ANN serving at ingest (round 13): the persisted IVF-PQ index is
    // FROZEN (fit + saved batch-side); an arriving query-vector stream is
    // scored against it micro-batch by micro-batch via foreachBatch +
    // probeIvfPqPruned — each batch's probed cell ids become a literal IN
    // filter, so every micro-batch statically prunes the cell-partitioned
    // codes scan to its own probed cells' files (the online-serving shape;
    // spec-asserted on the streamed plan in StreamingSpec). A qid's result
    // rows depend only on its own vector and the frozen index, so
    // micro-batch boundaries cannot change any row and the streamed sink
    // must equal the batch probe of the same qids exactly — the oracle is
    // the SAME full fit+probe replay llm_ann_index_pruned gates against.
    // Replayed batches after a crash append identical rows, removed by
    // the (qid, nid) dedup at read — effectively-once without state.
    QueryDef(
      "t12_stream_ann_probe_batch_eq",
      Some(LlmQueries.indexPrunedOracleSql),
      (spark, sf) => {
        import graft.llmops.AnnIndex
        val in = tmpDir("t12_in")
        val out = tmpDir("t12_out")
        val ckpt = tmpDir("t12_ckpt")
        val fx = LlmQueries.clusteredFixture(spark, sf).localCheckpoint(true)
        val dir = tmpDir("t12_idx")
        val idx = AnnIndex.fitIvfPq(fx, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
        AnnIndex.save(idx, dir)
        val loaded = AnnIndex.load(spark, dir) // frozen: lazy parquet scans, shared across micro-batches
        // three files -> three micro-batches under maxFilesPerTrigger=1
        fx.filter(col("vec_id") % 97 === 0)
          .repartition(3)
          .write
          .mode("overwrite")
          .parquet(in)
        spark.readStream
          .schema(s"vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            AnnIndex
              .probeIvfPqPruned(loaded, batch, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
              .select("qid", "nid", "rank")
              .write
              .mode("append")
              .parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).dropDuplicates("qid", "nid")
      }
    ),
    // Index MAINTENANCE at ingest (round 13): t12's read side has a write
    // side — the persisted index GROWS micro-batch by micro-batch via
    // foreachBatch + AnnIndex.append (encode against the frozen
    // centroids/codebooks, append-only file writes into the touched
    // cells' partitions; nothing refits). A row's encoding is a pure
    // function of (vector, frozen fit) and appends are order-independent
    // inserts, so micro-batch boundaries cannot change any index row and
    // probing the streamed-appended index must equal probing the batch
    // append exactly — the oracle is the SAME frozen-fit replay
    // llm_ann_index_append gates against. Delivery is AT-LEAST-ONCE
    // (foreachBatch can replay a batch whose side effect completed but
    // whose checkpoint commit didn't land); effectively-once comes from
    // append's own idempotence — the foreachBatch batch id is passed
    // through, and append writes that batch's deterministic
    // __batch=<id>/ layer in overwrite mode, so a replay overwrites
    // itself with identical rows instead of double-inserting (the write-
    // side analogue of t12's dedup-at-read).
    QueryDef(
      "t13_stream_index_append_batch_eq",
      Some(LlmQueries.indexAppendOracleSql),
      (spark, sf) => {
        import graft.llmops.AnnIndex
        val in = tmpDir("t13_in")
        val ckpt = tmpDir("t13_ckpt")
        val dir = tmpDir("t13_idx")
        val fx = LlmQueries.clusteredFixture(spark, sf).localCheckpoint(true)
        val corpus = fx.filter(col("vec_id") % 5 =!= 0)
        val batch = fx.filter(col("vec_id") % 5 === 0)
        val idx = AnnIndex.fitIvfPq(corpus, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
        AnnIndex.save(idx, dir)
        // three files -> three arriving batches under maxFilesPerTrigger=1
        batch.repartition(3).write.mode("overwrite").parquet(in)
        spark.readStream
          .schema("vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            AnnIndex.append(spark, dir, b, "vec_id", "v", batchId = id)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        AnnIndex
          .probeIvfPq(AnnIndex.load(spark, dir), fx, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
          .select("qid", "nid", "rank")
      }
    ),
    // Probe ACROSS a compaction (round 15): the full maintenance loop under
    // serving — the index is fit on the 80% corpus, three appends fragment
    // it (the streaming-ingest state t13 leaves behind), then the t12-style
    // probe stream serves micro-batch by micro-batch while a compact() AND
    // vacuum() run BETWEEN micro-batches (inside the second foreachBatch,
    // before its re-load): batch 0 probes the fragmented three-layer
    // index, batches 1-2 probe the compacted-and-vacuumed single-file-per-
    // cell generation. Compaction and vacuum are physically destructive
    // (new generation; superseded one reclaimed) but logically the
    // identity, so every micro-batch's rows — whichever side of the swap
    // it ran on — must agree with ONE frozen-fit batch replay: the oracle
    // is the same append replay llm_ann_index_append gates against,
    // restricted to the probe stream's qids. Each micro-batch re-loads the
    // index, so no reader is pinned to the vacuumed generation (the
    // vacuum contract); replayed batches append identical rows, removed
    // by the (qid, nid) dedup at read.
    QueryDef(
      "t14_stream_probe_across_compact_batch_eq",
      Some(LlmQueries.indexAppendPrunedOracleSql),
      (spark, sf) => {
        import graft.llmops.AnnIndex
        val in = tmpDir("t14_in")
        val out = tmpDir("t14_out")
        val ckpt = tmpDir("t14_ckpt")
        val dir = tmpDir("t14_idx")
        val fx = LlmQueries.clusteredFixture(spark, sf).localCheckpoint(true)
        val corpus = fx.filter(col("vec_id") % 5 =!= 0)
        val batch = fx.filter(col("vec_id") % 5 === 0)
        val idx = AnnIndex.fitIvfPq(corpus, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
        AnnIndex.save(idx, dir)
        // three appends fragment the touched cells (one file per append per
        // cell) — ingest is quiesced before the serve+compact phase starts
        (0 until 3).foreach { i =>
          AnnIndex.append(spark, dir, batch.filter(col("vec_id") % 3 === i), "vec_id", "v", batchId = i.toLong)
        }
        // three files -> three micro-batches under maxFilesPerTrigger=1
        fx.filter(col("vec_id") % 97 === 0)
          .repartition(3)
          .write
          .mode("overwrite")
          .parquet(in)
        spark.readStream
          .schema("vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            if (id == 1L) {
              AnnIndex.compact(spark, dir) // new committed generation
              // full reclaim (no retention window): each micro-batch
              // re-loads, so no reader is pinned here and the gate keeps
              // proving the maximally destructive swap is answer-invisible
              AnnIndex.vacuum(spark, dir, keepGenerations = 0)
            }
            val loaded = AnnIndex.load(spark, dir) // re-load per batch: current generation
            AnnIndex
              .probeIvfPqPruned(loaded, b, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
              .select("qid", "nid", "rank")
              .write
              .mode("append")
              .parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).dropDuplicates("qid", "nid")
      }
    ),
    // Probe ACROSS a delete (round 15): t14's sibling for the one index
    // mutation that CHANGES answers. Every micro-batch serves the SAME
    // query set (three identical input files), and delete(ids % 7 == 0)
    // lands between batch 0 and batch 1 — so batch 0 answers from the
    // full appended index and batches 1-2 from the survivors, both
    // at-query-time-correct. The deduped output is therefore exactly the
    // SET UNION of the two frozen-fit replays, which is what the oracle
    // computes (rank participates in the dedup key: the same (qid, nid)
    // can hold a different rank on each side of the delete). Each batch
    // re-loads the index — delete is in-place mutation, the one place the
    // versioned layout does not shield a pinned reader (AnnIndex.delete
    // scaladoc); a replayed batch 1 re-runs the delete, which is
    // idempotent (already-clean partitions -> zero touched -> no-op).
    QueryDef(
      "t15_stream_probe_across_delete_batch_eq",
      Some(LlmQueries.indexDeleteUnionPrunedOracleSql),
      (spark, sf) => {
        import graft.llmops.AnnIndex
        val in = tmpDir("t15_in")
        val out = tmpDir("t15_out")
        val ckpt = tmpDir("t15_ckpt")
        val dir = tmpDir("t15_idx")
        val fx = LlmQueries.clusteredFixture(spark, sf).localCheckpoint(true)
        val corpus = fx.filter(col("vec_id") % 5 =!= 0)
        val batch = fx.filter(col("vec_id") % 5 === 0)
        val idx = AnnIndex.fitIvfPq(corpus, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
        AnnIndex.save(idx, dir)
        AnnIndex.append(spark, dir, batch, "vec_id", "v", batchId = 0L)
        // THREE IDENTICAL single-file copies of the probe set: file order
        // is irrelevant (same content), so exactly one micro-batch runs
        // pre-delete however the source orders them
        val probeQs = fx.filter(col("vec_id") % 97 === 0).select("vec_id", "v").coalesce(1)
        (0 until 3).foreach { i =>
          probeQs.write.mode(if (i == 0) "overwrite" else "append").parquet(in)
        }
        spark.readStream
          .schema("vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            if (id == 1L)
              AnnIndex.delete(spark, dir, fx.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id")
            val loaded = AnnIndex.load(spark, dir) // re-load per batch: post-delete files
            AnnIndex
              .probeIvfPqPruned(loaded, b, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
              .select("qid", "nid", "rank")
              .write
              .mode("append")
              .parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).dropDuplicates("qid", "nid", "rank")
      }
    ),
    // Probe ACROSS a refit (round 16): completes the maintenance-under-
    // serving family — t14 proved a physical swap (compact) is invisible,
    // t15 a partial mutation (delete) is the survivors' answers; refit is
    // the full QUANTIZER migration, the one maintenance op that changes
    // every answer. Every micro-batch serves the SAME query set (three
    // identical input files) and refit(union) lands between batch 0 and
    // batch 1 — batch 0 answers from the frozen drifted fit, batches 1-2
    // from the fresh fit, both at-query-time-correct, so the deduped
    // output is the SET UNION of the two fits' replays (the t15 pattern
    // with a second fit in place of the survivor filter; rank in the
    // dedup key as there). Each batch re-loads; the pinned-reader-safety
    // of the generation swap itself is spec-asserted in LlmOpsSpec. A
    // replayed batch 1 re-runs the refit, which only stacks another
    // identical generation — same answers (fit is deterministic).
    QueryDef(
      "t16_stream_probe_across_refit_batch_eq",
      Some(LlmQueries.indexRefitUnionPrunedOracleSql),
      (spark, sf) => {
        import graft.llmops.AnnIndex
        val in = tmpDir("t16_in")
        val out = tmpDir("t16_out")
        val ckpt = tmpDir("t16_ckpt")
        val dir = tmpDir("t16_idx")
        val fx = LlmQueries.driftedFixture(spark, sf).localCheckpoint(true)
        val corpus = fx.filter(col("vec_id") % 5 =!= 0)
        val batch = fx.filter(col("vec_id") % 5 === 0)
        val idx = AnnIndex.fitIvfPq(corpus, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
        AnnIndex.save(idx, dir)
        AnnIndex.append(spark, dir, batch, "vec_id", "v", batchId = 0L)
        // THREE IDENTICAL single-file copies of the probe set (t15's
        // trick): file order is irrelevant, exactly one batch is pre-refit
        val probeQs = fx.filter(col("vec_id") % 97 === 0).select("vec_id", "v").coalesce(1)
        (0 until 3).foreach { i =>
          probeQs.write.mode(if (i == 0) "overwrite" else "append").parquet(in)
        }
        spark.readStream
          .schema("vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            if (id == 1L)
              AnnIndex.refit(spark, dir, fx, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
            val loaded = AnnIndex.load(spark, dir) // re-load per batch: current generation's fit + codes
            AnnIndex
              .probeIvfPqPruned(loaded, b, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
              .select("qid", "nid", "rank")
              .write
              .mode("append")
              .parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).dropDuplicates("qid", "nid", "rank")
      }
    ),
    // Probe ACROSS a generational save-over (round 17, T16's shape for
    // the round's new maintenance op): a full re-save — the caller-
    // supplied-fit form of the quantizer migration — lands between
    // micro-batches 0 and 1 while the probe stream serves the same query
    // set each batch, followed by a RETENTION-RESPECTING vacuum (the new
    // default, keepGenerations = 1) run under live serving. The
    // retention window is OBSERVED, not assumed: a reader loaded BEFORE
    // the save-over stays pinned across it and probes again in batch 2 —
    // AFTER the in-stream vacuum — so a retention regression (the
    // superseded generation reclaimed out from under a live reader)
    // crashes the gate on missing files instead of sailing through. The
    // pinned probe re-contributes the frozen fit's rows, which batch 0
    // already emitted, so the deduped output is STILL the SET UNION of
    // the two fits' replays — the exact oracle T16 uses, because
    // save(fitIvfPq(union)) must answer identically to refit(union).
    // Batch 0 answers from the frozen drifted fit, batches 1-2 from the
    // fresh fit; a replayed batch 1 SKIPS the maintenance block (the
    // post-save generation already exists — retainedGenerations sees 2
    // committed generations) instead of re-running it: an unguarded
    // re-save would mint codes_v3 and the in-stream vacuum's
    // keepGenerations=1 window would then slide past codes_v1, yanking
    // the pinned pre-save reader's files — the replay guard is what
    // makes the gate actually replay-tolerant (r17 ADVICE).
    QueryDef(
      "t17_stream_probe_across_resave_batch_eq",
      Some(LlmQueries.indexRefitUnionPrunedOracleSql),
      (spark, sf) => {
        import graft.llmops.AnnIndex
        val in = tmpDir("t17_in")
        val out = tmpDir("t17_out")
        val ckpt = tmpDir("t17_ckpt")
        val dir = tmpDir("t17_idx")
        val fx = LlmQueries.driftedFixture(spark, sf).localCheckpoint(true)
        val corpus = fx.filter(col("vec_id") % 5 =!= 0)
        val batch = fx.filter(col("vec_id") % 5 === 0)
        val idx = AnnIndex.fitIvfPq(corpus, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
        AnnIndex.save(idx, dir)
        AnnIndex.append(spark, dir, batch, "vec_id", "v", batchId = 0L)
        // the long-held serving reader: loaded BEFORE the save-over, probed
        // again AFTER the in-stream vacuum — the T12 pattern the retention
        // window exists for
        val pinned = AnnIndex.load(spark, dir)
        val probeQs = fx.filter(col("vec_id") % 97 === 0).select("vec_id", "v").coalesce(1)
        (0 until 3).foreach { i =>
          probeQs.write.mode(if (i == 0) "overwrite" else "append").parquet(in)
        }
        spark.readStream
          .schema("vec_id LONG, v ARRAY<DOUBLE>")
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            if (id == 1L && AnnIndex.retainedGenerations(spark, dir).size < 2) {
              // the generation-count guard makes an at-least-once REPLAY of
              // this batch skip the maintenance (the save-over already
              // committed codes_v2) — re-running it would mint codes_v3 and
              // the vacuum below would slide the retention window past the
              // pinned reader's codes_v1
              val fresh = AnnIndex.fitIvfPq(fx, "vec_id", "v", cells = 8, iters = 2, seed = 42L, pqM = 8, pqKs = 32, pqIters = 2, dim = LlmQueries.EmbDim)
              AnnIndex.save(fresh, dir) // generational overwrite of the live index
              AnnIndex.vacuum(spark, dir) // retention default: superseded gen kept for pinned readers
            }
            val loaded = AnnIndex.load(spark, dir) // re-load per batch: current generation's fit + codes
            val probed = AnnIndex
              .probeIvfPqPruned(loaded, b, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
              .select("qid", "nid", "rank")
            val withPinned =
              if (id == 2L)
                // retention observed: the pre-save reader's files must still
                // exist (vacuum kept its generation); its frozen-fit rows
                // duplicate batch 0's and vanish in the dedup below
                probed.unionByName(
                  AnnIndex
                    .probeIvfPqPruned(pinned, b, "vec_id", "v", k = 5, nprobe = 2, rerank = 50, rerankFrom = Some(fx), excludeSelf = true)
                    .select("qid", "nid", "rank")
                )
              else probed
            withPinned.write
              .mode("append")
              .parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        spark.read.parquet(out).dropDuplicates("qid", "nid", "rank")
      }
    )
  )

  /** Run the flatMapGroupsWithState sessionizer over a staged file stream
    * to completion and read the contract-pinned sink back.
    */
  private def runSessionize(
      spark: org.apache.spark.sql.SparkSession,
      sf: String,
      in: String,
      out: String,
      ckpt: String
  ): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val events = QueryDef.normalizeTs(spark.readStream.schema(schema).parquet(in))
      .selectExpr("user_id AS key", "ts div 1000000 AS tsMillis")
      .as[TypedStreams.SessionEvent]
    // NoTimeout: deterministic single-batch behavior (see sessionize
    // scaladoc); gap sessions close only when the in-stream gap exceeds
    // 30 minutes.
    val sessions = TypedStreams.sessionize(events, gapMillis = 1800000L, withTimeout = false).toDF()
    TypedStreams
      .writeStream[TypedStreams.SessionOut, SchemaPolicy.ExactT](sessions, out, ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    spark.read.parquet(out)
  }
}
