package graft.llmops

import java.net.URI

import graft.SparkTestSession
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

/** A deliberately NON-ATOMIC local filesystem for the lease race spec:
  * create-no-overwrite is last-write-wins (the S3A-style check-then-put
  * shape), and a test hook lands a "concurrent acquirer's" lease content
  * right after ours closes — between our create and our read-back, the
  * exact interleaving [[AnnIndex.acquireLease]]'s verify exists to detect.
  */
class LastWinsFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("lastwins:///")

  private def usurpOnClose(f: Path, raw: FSDataOutputStream): FSDataOutputStream =
    if (f.getName != "_MAINTAINER") raw
    else {
      val localPath = pathToFile(f).toPath
      new FSDataOutputStream(
        new java.io.FilterOutputStream(raw) {
          override def close(): Unit = {
            super.close()
            // the simulated concurrent winner: its create lands right after
            // ours committed, before our read-back runs
            LastWinsFileSystem.usurpMaintainerWith.foreach { content =>
              java.nio.file.Files.write(
                localPath,
                content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              )
            }
          }
        },
        null
      )
    }

  // RawLocalFileSystem routes FileSystem.create(Path, boolean) through THIS
  // override (not the FsPermission one) — intercept both to be safe
  override def create(
      f: Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable
  ): FSDataOutputStream =
    // overwrite = false is CHECK-THEN-PUT on this store: the put always lands
    usurpOnClose(f, super.create(f, true, bufferSize, replication, blockSize, progress))

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable
  ): FSDataOutputStream =
    usurpOnClose(f, super.create(f, permission, true, bufferSize, replication, blockSize, progress))
}

object LastWinsFileSystem {
  @volatile var usurpMaintainerWith: Option[String] = None
}

/** Round-18 operational hardening of the persisted ANN index: the lease
  * read-back verify for non-atomic stores, the bounded transient-read
  * retry behind the tombstone meta swap, reader-visible generation
  * pinning, and the absorbed-batch record carried across a generational
  * save-over.
  */
class AnnIndexHardeningSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fixture(n: Int, seedOffset: Int = 0): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(97 + seedOffset)
    (0 until n)
      .map { i =>
        (i.toLong, Seq.tabulate(8)(_ => (i % 3 * 5).toFloat + rnd.nextFloat() * 0.1f))
      }
      .toDF("vec_id", "v")
      .localCheckpoint(true)
  }

  test("acquireLease read-back verify: the loser of a non-atomic create race detects the usurpation and throws before any write") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.lastwins.impl", classOf[LastWinsFileSystem].getName)
    val localDir = java.nio.file.Files.createTempDirectory("graft_lease_na").toString
    val dir = s"lastwins:$localDir"
    // uncontended acquire through the non-atomic store: the read-back sees
    // our own epoch+owner line and the grant stands
    val epoch = AnnIndex.acquireLease(spark, dir, "test-op", "solo", None, createDir = true)
    assert(epoch == 1L)
    assert(AnnIndex.maintainerLease(spark, dir).contains((1L, "solo")))
    java.nio.file.Files.delete(java.nio.file.Paths.get(localDir, "_MAINTAINER"))
    // contended: a concurrent acquirer's create lands between ours and the
    // read-back (create-no-overwrite is last-write-wins here, so BOTH
    // creates "succeeded" — the pre-r18 silent double grant). The loser
    // must fail BEFORE any index write and leave the winner's lease alone.
    LastWinsFileSystem.usurpMaintainerWith = Some("epoch=99 owner=concurrent-acquirer")
    try {
      val hit = intercept[IllegalStateException] {
        AnnIndex.acquireLease(spark, dir, "compact", "loser", None, createDir = false)
      }
      assert(hit.getMessage.contains("lost the lease create race"))
      assert(hit.getMessage.contains("concurrent-acquirer"))
    } finally LastWinsFileSystem.usurpMaintainerWith = None
    assert(
      AnnIndex.maintainerLease(spark, dir).contains((99L, "concurrent-acquirer")),
      "the usurping winner's lease must stand untouched"
    )
  }

  test("retryTransientRead: bounded retry on missing-file shapes only, everything else propagates immediately") {
    // a transient FileNotFound (the tombstone meta-swap window) retries
    var calls = 0
    val got = AnnIndex.retryTransientRead("t", attempts = 3, backoffMs = 1L) {
      calls += 1
      if (calls < 3) throw new java.io.FileNotFoundException("meta swap window")
      42
    }
    assert(got == 42 && calls == 3)
    // Spark surfaces task-time misses WRAPPED — the cause chain is walked
    var calls2 = 0
    val got2 = AnnIndex.retryTransientRead("t", attempts = 2, backoffMs = 1L) {
      calls2 += 1
      if (calls2 < 2) throw new RuntimeException("outer", new java.io.FileNotFoundException("inner"))
      7
    }
    assert(got2 == 7 && calls2 == 2)
    // attempts exhausted: the final miss propagates unchanged (a genuinely
    // deleted index fails loudly instead of spinning)
    var calls3 = 0
    val out = intercept[java.io.FileNotFoundException] {
      AnnIndex.retryTransientRead("t", attempts = 2, backoffMs = 1L) {
        calls3 += 1
        throw new java.io.FileNotFoundException("gone")
      }
    }
    assert(calls3 == 2 && out.getMessage == "gone")
    // non-transient failures are NEVER retried
    var calls4 = 0
    intercept[IllegalStateException] {
      AnnIndex.retryTransientRead("t", attempts = 3, backoffMs = 1L) {
        calls4 += 1
        throw new IllegalStateException("real failure")
      }
    }
    assert(calls4 == 1)
  }

  test("generation pinning: load exposes its codes_v<N>, retainedGenerations is the pre-vacuum inspection") {
    val df = fixture(60)
    val dir = java.nio.file.Files.createTempDirectory("graft_genpin").toString
    val idx = AnnIndex.fitIvfPq(df, "vec_id", "v", cells = 3, iters = 2, pqM = 2, pqKs = 4, pqIters = 2, dim = 8)
    assert(idx.generation == AnnIndex.UnsavedGeneration, "an in-memory fit is pinned to no on-disk generation")
    AnnIndex.save(idx, dir)
    val pinned = AnnIndex.load(spark, dir) // the long-held serving reader
    assert(pinned.generation == 1)
    assert(AnnIndex.retainedGenerations(spark, dir) == Seq(1))
    AnnIndex.compact(spark, dir)
    AnnIndex.vacuum(spark, dir) // default retention window keeps the superseded generation
    assert(AnnIndex.retainedGenerations(spark, dir) == Seq(1, 2))
    assert(AnnIndex.load(spark, dir).generation == 2)
    // the operator check this API exists for: "is anything still serving
    // codes_vN?" answered with evidence before an aggressive vacuum
    assert(AnnIndex.retainedGenerations(spark, dir).contains(pinned.generation))
    AnnIndex.vacuum(spark, dir, keepGenerations = 0)
    assert(AnnIndex.retainedGenerations(spark, dir) == Seq(2))
    assert(
      !AnnIndex.retainedGenerations(spark, dir).contains(pinned.generation),
      "after the full reclaim the inspection reports the pinned generation gone"
    )
  }

  test("save over a committed index carries the absorbed-batch record: post-resave replays no-op, id reuse still inserts") {
    val df = fixture(54, seedOffset = 1)
    val b0 = (54 until 60).map(i => (i.toLong, Seq.fill(8)(0.5f))).toDF("vec_id", "v").localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_resave_sidecar").toString
    AnnIndex.save(
      AnnIndex.fitIvfPq(df, "vec_id", "v", cells = 3, iters = 2, pqM = 2, pqKs = 4, pqIters = 2, dim = 8),
      dir
    )
    AnnIndex.append(spark, dir, b0, "vec_id", "v", batchId = 0L)
    assert(AnnIndex.load(spark, dir).codes.count() == 60)
    // re-save over the live index with the UNION corpus (the quiesced
    // ingest shape): the superseded generation's batch-0 layer vanishes;
    // its ids-only fingerprint record must be carried into codes_v2
    val union = df.unionByName(b0)
    AnnIndex.save(
      AnnIndex.fitIvfPq(union, "vec_id", "v", cells = 3, iters = 2, seed = 7L, pqM = 2, pqKs = 4, pqIters = 2, dim = 8),
      dir
    )
    assert(AnnIndex.load(spark, dir).codes.count() == 60)
    // (a) an at-least-once replay of the pre-resave batch is fingerprint-
    // detected and NO-OPS — pre-r18 the hwm reset made it silently
    // re-insert 6 rows the fresh corpus already contains; the match is a
    // certified replay, so it no-ops under strictReplay too
    AnnIndex.append(spark, dir, b0, "vec_id", "v", batchId = 0L, strictReplay = true)
    assert(
      AnnIndex.load(spark, dir).codes.count() == 60,
      "a post-resave replay of an absorbed batch must not re-insert"
    )
    // (b) id REUSE for new data under a carried record is ambiguous:
    // strict refuses, the default warns with the evidence and INSERTS (a
    // re-save is the documented remedy for restarting the batch-id space)
    val freshData = Seq((3000L, Seq.fill(8)(3.0f))).toDF("vec_id", "v")
    val strictHit = intercept[IllegalStateException] {
      AnnIndex.append(spark, dir, freshData, "vec_id", "v", batchId = 0L, strictReplay = true)
    }
    assert(strictHit.getMessage.contains("strictReplay"))
    assert(AnnIndex.load(spark, dir).codes.count() == 60, "the strict refusal must not write")
    AnnIndex.append(spark, dir, freshData, "vec_id", "v", batchId = 0L)
    assert(
      AnnIndex.load(spark, dir).codes.count() == 61,
      "mismatching content under a carried id is new data and must insert"
    )
    // (b2) an exact replay of the REUSED committed layer certifies against
    // the LAYER's content fingerprint (codes included — strictly stronger
    // evidence than the carried ids-only record, which mismatches): no-op
    // even under strictReplay — the committed-layer check must run BEFORE
    // the carried-record ambiguity check
    AnnIndex.append(spark, dir, freshData, "vec_id", "v", batchId = 0L, strictReplay = true)
    assert(AnnIndex.load(spark, dir).codes.count() == 61, "an exact replay of the reused layer must certify and no-op")
    // (c) a compact then records BOTH incarnations of batch 0 (the carried
    // pre-resave record and the reused layer's fingerprint) — a replay of
    // EITHER certifies and no-ops, even under strictReplay
    AnnIndex.compact(spark, dir)
    AnnIndex.append(spark, dir, b0, "vec_id", "v", batchId = 0L, strictReplay = true)
    AnnIndex.append(spark, dir, freshData, "vec_id", "v", batchId = 0L, strictReplay = true)
    assert(AnnIndex.load(spark, dir).codes.count() == 61)
  }
}
