package graft.llmops

import graft.contracts.SchemaCheck
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, enforced by the same
  * contract machinery as everything else (BinaryType is a contract leaf).
  *
  * The decode step is a clearly-marked STUB: this container has no
  * image/audio codecs, so `extractFeaturesStub` derives deterministic fake
  * features from the raw bytes. The Spark-side plumbing — schema, contract,
  * per-row expression shape, partition-friendliness — is real and tested;
  * swapping the stub for a real decoder means replacing one projection
  * (at scale that decoder would be a `mapPartitions` over batches with a
  * per-partition codec handle, keeping the same input/output contract).
  */
object Multimodal {

  /** Contract for a multimodal record: opaque payload + typed metadata. */
  final case class MediaMeta(byte_len: Long, mime: String)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Wrap a text corpus as binary payloads (stand-in for real media bytes)
    * with populated metadata, contract-pinned as [[MediaRow]].
    */
  def attachBinary(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val df = docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"),
        lit("text/plain").as("mime")
      ).as("meta")
    )
    SchemaCheck.assertMatchesContract[MediaRow](df)
    df
  }

  /** Batched decode plumbing: the shape a real media decoder plugs into.
    * One `mapPartitions` pass; `openCodec` runs once per partition (codec
    * handles, model weights, GPU context) and the returned function decodes
    * each record — the Scala analogue of a pandas-UDF `mapInPandas` batch
    * loop. The input/output contracts stay enforced by the caller's pins,
    * so swapping decoders never changes the pipeline shape.
    *
    * The decode itself is STUBBED in this container (no codecs installed):
    * see [[extractFeaturesStub]] and the spec's fake decoder.
    */
  def decodeBatched[T: Encoder](
      media: Dataset[MediaRow]
  )(openCodec: () => MediaRow => T): Dataset[T] =
    media.mapPartitions { rows =>
      val decode = openCodec() // per-partition: open once, reuse per record
      rows.map(decode)
    }

  /** STUB decode ???: deterministic fake feature extraction from raw bytes.
    * A real implementation decodes the payload (image resize / audio
    * frame-sample) inside `mapPartitions` with a per-partition codec; the
    * fake keeps the exact same column contract so downstream code is
    * decoder-agnostic. Features here are pure byte-level expressions:
    * payload length, a stable content hash, and hash-derived pseudo
    * width/height/duration.
    */
  def extractFeaturesStub(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      col("meta.mime").as("mime"),
      md5(col("payload")).as("content_md5"),
      // fake decoded dimensions: deterministic functions of the byte length
      (col("meta.byte_len") % 1024 + 1).as("fake_width"),
      (col("meta.byte_len") % 768 + 1).as("fake_height"),
      (col("meta.byte_len").cast("double") / lit(1024.0)).as("fake_duration_s")
    )
}
