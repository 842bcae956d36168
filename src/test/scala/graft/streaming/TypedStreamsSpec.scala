package graft.streaming

import graft.SparkTestSession
import graft.model.Tables.DocumentRow
import graft.sources.TypedSource
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** Streaming specs: MemoryStream-driven micro-batches through the
  * contract-pinned streaming surface.
  */
class TypedStreamsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("windowedCounts: watermarked tumbling window counts per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val counts = TypedStreams.windowedCounts(df, "ts", "user_id", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (t("2026-01-01 00:01:00"), 1L),
        (t("2026-01-01 00:02:00"), 1L),
        (t("2026-01-01 00:06:00"), 1L),
        (t("2026-01-01 00:01:30"), 2L)
      )
      q.processAllAvailable()
      val rows = spark.table("win_counts").as[(Timestamp, Timestamp, Long, Long)].collect()
      val m = rows.map(r => (r._1.toString, r._3) -> r._4).toMap
      assert(m(("2026-01-01 00:00:00.0", 1L)) == 2L)
      assert(m(("2026-01-01 00:05:00.0", 1L)) == 1L)
      assert(m(("2026-01-01 00:00:00.0", 2L)) == 1L)
    } finally q.stop()
  }

  test("sessionize: flatMapGroupsWithState closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedStreams.SessionEvent]
    val sessions = TypedStreams.sessionize(input.toDS(), gapMillis = 60000L, withTimeout = false)
    val q = sessions.writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // two sessions for key 1 in one batch (gap > 60s closes the first)
      input.addData(
        TypedStreams.SessionEvent(1L, 0L),
        TypedStreams.SessionEvent(1L, 30000L),
        TypedStreams.SessionEvent(1L, 200000L),
        TypedStreams.SessionEvent(2L, 0L)
      )
      q.processAllAvailable()
      val closed = spark.table("sessions").as[TypedStreams.SessionOut].collect()
      assert(closed.toSeq == Seq(TypedStreams.SessionOut(1L, 0L, 30000L, 2L)))
    } finally q.stop()
  }

  test("streamingDedupExact drops duplicate content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val deduped = TypedStreams.streamingDedupExact(df, "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (t("2026-01-01 00:01:00"), "hello world"),
        (t("2026-01-01 00:02:00"), "hello world"), // dup within watermark
        (t("2026-01-01 00:03:00"), "different doc")
      )
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").select("text").as[String].collect().sorted
      assert(texts.toSeq == Seq("different doc", "hello world"))
    } finally q.stop()
  }

  test("readStream forces the contract schema on a file source") {
    implicit val s = spark
    // file streaming sources need a directory; stage the single-file table
    val srcDir = Files.createTempDirectory("graft-stream-src")
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      srcDir.resolve("part-0.parquet")
    )
    val docs = TypedStreams.readStream(
      TypedSource[DocumentRow]("parquet", srcDir.toString)
    )
    assert(docs.isStreaming)
    val stats = TypedStreams.streamingTextStats(docs)
    val out = Files.createTempDirectory("graft-stream").toString
    val q = TypedStreams
      .writeStream[DocumentRow, graft.contracts.SchemaPolicy.BackwardT](
        stats.select("doc_id", "text", "lang", "source", "n_chars"),
        s"$out/sink",
        s"$out/ckpt"
      )
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/sink").count() > 0)
    } finally q.stop()
  }
}
