package graft.streaming

import graft.contracts._
import graft.sources.TypedSource
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface with the same contract guarantees as the
  * batch engine: schema-pinned sources, policy-pinned sinks, watermarked
  * windowed aggregation, and custom session state via
  * `flatMapGroupsWithState`. The reference is batch-only (SURVEY §2.2);
  * this is the sanctioned extension point (§7.6) expressed Spark-first.
  *
  * Scale notes: streaming state (windows, sessions) shuffles on the group
  * key exactly like a batch groupBy; watermarks bound state size, so a
  * 1000-executor job's state store stays proportional to the open-window /
  * open-session count, not the stream length.
  */
object TypedStreams {

  /** Streaming typed scan: contract schema forced on the reader (streams
    * require an explicit schema — the contract IS that schema), then
    * pinned like the batch path.
    */
  def readStream[C](src: TypedSource[C])(implicit spark: SparkSession, sch: ShapeOf[C]): DataFrame = {
    val df = spark.readStream.format(src.format).options(src.options).schema(sch.struct).load(src.path)
    SchemaCheck.assertMatchesContract[C](df)
    df
  }

  /** Policy-pinned streaming sink: asserts the contract NOW (wiring time),
    * then hands back a configured writer — the stream itself starts when
    * the caller invokes `.start()`.
    */
  def writeStream[C, P <: SchemaPolicy with Singleton](
      df: DataFrame,
      path: String,
      checkpoint: String,
      format: String = "parquet",
      outputMode: OutputMode = OutputMode.Append()
  )(implicit sch: ShapeOf[C], p: ValueOf[P]): DataStreamWriter[org.apache.spark.sql.Row] = {
    SchemaCheck.assertMatchesContract[C, P](df)
    df.writeStream
      .format(format)
      .outputMode(outputMode)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
  }

  /** Watermarked sliding-window counts over an event-time column: the
    * canonical streaming aggregation. Late data beyond `watermark` is
    * dropped and its window state reclaimed.
    */
  def windowedCounts(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      watermark: String,
      windowDuration: String,
      slideDuration: Option[String] = None
  ): DataFrame = {
    val win = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None        => window(col(tsCol), windowDuration)
    }
    df.withWatermark(tsCol, watermark)
      .groupBy(win.as("window"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"), col(keyCol), col("n"))
  }

  final case class SessionEvent(key: Long, tsMillis: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(key: Long, session_start: Long, session_end: Long, n_events: Long)

  /** Custom session state via `flatMapGroupsWithState`: a session closes
    * when the in-stream gap exceeds `gapMillis` — the streaming analogue
    * of the batch `q_sessionize` lag/gap query. State per key is one
    * [[SessionState]]. With `withTimeout = true` (production default),
    * idle sessions are also closed and their state reclaimed by a
    * processing-time timeout; the spec uses `false` for deterministic
    * micro-batch behavior (the timeout loop re-triggers batches forever
    * under MemoryStream).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMillis: Long,
      withTimeout: Boolean = true
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        timeoutConf
      ) { (key: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(SessionOut(key, s.start, s.last, s.n))
        } else {
          val sorted = rows.toSeq.sortBy(_.tsMillis)
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMillis - s.last <= gapMillis =>
                cur = Some(s.copy(last = e.tsMillis, n = s.n + 1))
              case Some(s) =>
                closed ::= SessionOut(key, s.start, s.last, s.n)
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
              case None =>
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            if (withTimeout) state.setTimeoutDuration(gapMillis)
          }
          closed.reverseIterator
        }
      }
  }

  /** Stream-static dimension enrichment: a streaming DataFrame joined to a
    * static (batch) dimension table on `joinKeys`. Stateless — no
    * watermark, no state store; every micro-batch joins against the static
    * side, which Spark broadcasts when small. This is the canonical
    * pattern for attaching dimension attributes to a high-volume event
    * stream: the stream never shuffles on the join key when the dim side
    * broadcasts, so enrichment adds zero stateful overhead at any rate.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, joinKeys: Seq[String]): DataFrame =
    stream.join(dim, joinKeys)

  /** Streaming llmops: the text-stats / fingerprint projections are pure
    * per-row expressions, so they apply to a stream unchanged — this just
    * documents (and type-checks) that property.
    */
  def streamingTextStats(df: DataFrame, textCol: String = "text"): DataFrame =
    graft.llmops.TextStats.withStats(df, textCol)

  /** Streaming exact dedup: drop duplicate content within the watermark
    * horizon — the streaming arm of [[graft.llmops.Dedup.dedupExact]].
    * State holds one entry per distinct content hash seen inside the
    * watermark; late duplicates beyond it are not deduplicated (bounded
    * state is the point — an unbounded exact dedup would accrete state
    * forever on a 100 TB/day stream).
    */
  def streamingDedupExact(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      contentCol: String = "text"
  ): DataFrame =
    df.withColumn("__content_key", graft.llmops.Fingerprints.contentKeyMd5(col(contentCol)))
      .withWatermark(tsCol, watermark)
      // WithinWatermark variant: state for a key is dropped once the
      // watermark passes it — plain dropDuplicates would accrete forever
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")
}
