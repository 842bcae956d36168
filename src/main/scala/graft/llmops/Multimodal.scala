package graft.llmops

import graft.contracts.SchemaCheck
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, enforced by the same
  * contract machinery as everything else (BinaryType is a contract leaf).
  *
  * Two decode paths exist:
  *   - a REAL image path: [[synthesizePng]] manufactures deterministic PNG
  *     payloads and [[imageIoCodec]] decodes them back (format sniff +
  *     dimensions + pixel checksum) with `javax.imageio` — a genuine
  *     codec round-trip, driver-verified by `llm_multimodal_decode`
  *     against a doc_id-derived oracle;
  *   - [[extractFeaturesStub]], the byte-level stand-in for payloads with
  *     no JVM-parsable container at all — clearly marked, same column
  *     contract, swap-in shape documented on [[decodeBatched]]. Image
  *     (PNG via javax.imageio), audio (WAV via javax.sound) and video
  *     container metadata (MP4 via [[mp4Codec]]'s box parser) all have
  *     REAL parse paths.
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

  /** Deterministic PNG payloads, one per id row: a solid-color image whose
    * width, height and RGB fill are pure functions of the id (so an oracle
    * can predict the decoded values without seeing the bytes). Encoding
    * happens inside `mapPartitions` — the write-side mirror of the decode
    * batch shape; nothing is collected to the driver.
    */
  def synthesizePng(ids: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { id =>
        val w = (id % 21 + 1).toInt * 3
        val h = (id % 13 + 1).toInt * 4
        val rgb = (((id * 7) % 256) << 16 | ((id * 13) % 256) << 8 | ((id * 31) % 256)).toInt
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        val bytes = baos.toByteArray
        MediaRow(id, bytes, MediaMeta(bytes.length.toLong, "image/png"))
      }
    }
  }

  /** Deterministic GRADIENT PNG payloads: pixel (x, y) of image `id` is
    * r = (5x + id) mod 256, g = (7y + 2id) mod 256, b = (x + y + 3id)
    * mod 256 — position-dependent on purpose, so a RESIZE's output depends
    * on WHICH source pixels were sampled (a solid fill would make any
    * coordinate-mapping bug invisible). PNG is lossless: the decoder gets
    * these exact values back. Same dims-from-id scheme as
    * [[synthesizePng]].
    */
  def synthesizePngGradient(ids: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { id =>
        val w = (id % 21 + 1).toInt * 3
        val h = (id % 13 + 1).toInt * 4
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((5L * x + id) % 256).toInt
            val g = ((7L * y + 2L * id) % 256).toInt
            val b = ((x.toLong + y + 3L * id) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        val bytes = baos.toByteArray
        MediaRow(id, bytes, MediaMeta(bytes.length.toLong, "image/png"))
      }
    }
  }

  /** REAL nearest-neighbor resize for [[decodeBatched]]: decodes the
    * payload with `javax.imageio`, samples source pixel
    * (⌊dx·srcW/dstW⌋, ⌊dy·srcH/dstH⌋) for every destination coordinate —
    * the standard integer NN map, floor semantics on both axes — and
    * emits the sampled-channel sum as the verifiable digest of the resized
    * image. The per-partition open/decode/transform loop is exactly the
    * batch shape a JPEG/webp + SIMD resize library would plug into; the
    * coordinate map is the part a contract can verify engine-independently
    * (the gradient fixture makes any off-by-one in it change the sum).
    */
  def resizeNearestCodec[T](dstW: Int, dstH: Int)(
      mk: (Long, Long, Long, Long, Long, Long) => T
  ): () => MediaRow => T = {
    require(dstW > 0 && dstH > 0, "resize dims must be positive")
    () => {
      System.setProperty("java.awt.headless", "true")
      row => {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
        require(img != null, s"no image codec recognizes payload of doc ${row.doc_id}")
        val (srcW, srcH) = (img.getWidth, img.getHeight)
        var sum = 0L
        var dy = 0
        while (dy < dstH) {
          val sy = dy * srcH / dstH
          var dx = 0
          while (dx < dstW) {
            val sx = dx * srcW / dstW
            val p = img.getRGB(sx, sy)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            dx += 1
          }
          dy += 1
        }
        mk(row.doc_id, srcW.toLong, srcH.toLong, dstW.toLong, dstH.toLong, sum)
      }
    }
  }

  /** A real `javax.imageio` decoder for [[decodeBatched]]: sniffs the
    * format from the bytes (not the metadata — the codec is the truth),
    * decodes, and emits (id, mime, width, height, pixel checksum) through
    * the caller's constructor. The `openCodec` thunk is where a heavier
    * codec would acquire per-partition handles; ImageIO is stateless, so
    * here it just flips AWT to headless once per partition.
    */
  def imageIoCodec[T](mk: (Long, String, Long, Long, Long) => T): () => MediaRow => T =
    () => {
      System.setProperty("java.awt.headless", "true")
      row => {
        val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(row.payload))
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        require(readers.hasNext, s"no image codec recognizes payload of doc ${row.doc_id}")
        val reader = readers.next()
        try {
          reader.setInput(in)
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          val mime = "image/" + reader.getFormatName.toLowerCase
          mk(row.doc_id, mime, w.toLong, h.toLong, sum)
        } finally reader.dispose()
      }
    }

  /** Deterministic WAV payloads (16-bit mono PCM, constant sample value,
    * rate/frames/value pure functions of the id) — the audio sibling of
    * [[synthesizePng]], encoded per partition via `javax.sound.sampled`.
    */
  def synthesizeWav(ids: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val sampleRate = (8000 + (id % 5) * 4000).toInt // 8k..24k
        val frames = (100 + (id % 50) * 10).toInt       // 100..590
        val v = ((id % 1000) * 16).toInt                // constant 16-bit sample
        val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < frames) {
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        val bytes = baos.toByteArray
        MediaRow(id, bytes, MediaMeta(bytes.length.toLong, "audio/wav"))
      }
    }
  }

  /** A real `javax.sound` decoder for [[decodeBatched]]: parses the WAV
    * container from the bytes (format, rate, frame count) and reads the
    * PCM stream back, emitting an unsigned byte checksum — format metadata
    * AND payload must round-trip the codec.
    */
  def wavCodec[T](mk: (Long, String, Long, Long, Long) => T): () => MediaRow => T =
    () => { row =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(row.payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val buf = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i < buf.length) { sum += (buf(i) & 0xff); i += 1 }
        mk(row.doc_id, "audio/wav", fmt.getSampleRate.toLong, frames, sum)
      } finally ais.close()
    }

  /** Deterministic MP4 payloads: a structurally valid ISO BMFF box tree
    * (`ftyp` + `moov` containing one `mvhd` and 1-3 `trak`/`tkhd` boxes)
    * whose timescale, duration and track count are pure functions of the
    * id — the video sibling of [[synthesizePng]]. No codec library exists
    * for video in the JVM, but the CONTAINER is just big-endian box
    * arithmetic, so the parse side ([[mp4Codec]]) is a real parser of real
    * bytes, not a fake: corrupt a length field and decoding fails loudly.
    */
  def synthesizeMp4(ids: DataFrame, idCol: String = "doc_id"): Dataset[MediaRow] = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val timescale = (600 + (id % 10) * 300).toInt
        val durationTicks = timescale * (5 + id % 60).toInt
        val nTracks = (1 + id % 3).toInt
        val out = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(out)
        def box(tpe: String, payload: Array[Byte]): Unit = {
          d.writeInt(8 + payload.length)
          d.writeBytes(tpe)
          d.write(payload)
        }
        // ftyp: major brand isom, minor version 0
        box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
        // mvhd v0: 100-byte payload; timescale at offset 12, duration at 16
        val mvhd = java.nio.ByteBuffer.allocate(100)
        mvhd.putInt(0)             // version + flags
        mvhd.putInt(0).putInt(0)   // creation / modification time
        mvhd.putInt(timescale)
        mvhd.putInt(durationTicks)
        mvhd.putInt(0x00010000)    // rate 1.0
        mvhd.putShort(0x0100.toShort) // volume 1.0
        mvhd.position(96)
        mvhd.putInt(nTracks + 1)   // next_track_id
        // tkhd v0: 84-byte payload; track_id at offset 12
        val traks = (1 to nTracks).map { t =>
          val tkhd = java.nio.ByteBuffer.allocate(84)
          tkhd.putInt(0).putInt(0).putInt(0)
          tkhd.putInt(t) // track_id
          val tkhdBox = java.nio.ByteBuffer.allocate(92)
          tkhdBox.putInt(92); tkhdBox.put("tkhd".getBytes("US-ASCII")); tkhdBox.put(tkhd.array())
          val trak = java.nio.ByteBuffer.allocate(100)
          trak.putInt(100); trak.put("trak".getBytes("US-ASCII")); trak.put(tkhdBox.array())
          trak.array()
        }
        box("moov", java.nio.ByteBuffer.allocate(108)
          .putInt(108).put("mvhd".getBytes("US-ASCII")).put(mvhd.array()).array()
          ++ traks.flatten)
        val bytes = out.toByteArray
        MediaRow(id, bytes, MediaMeta(bytes.length.toLong, "video/mp4"))
      }
    }
  }

  /** A real ISO BMFF box parser for [[decodeBatched]]: walks the top-level
    * boxes from the raw bytes (including 64-bit `largesize` and
    * size-0 extends-to-container-end boxes per ISO 14496-12 §4.2),
    * descends into `moov`, reads the `mvhd`
    * movie header (version-aware field offsets) and counts `trak` boxes —
    * emitting (id, mime, timescale, duration ticks, track count). This is
    * the metadata-extraction half of a video pipeline; frame decode would
    * slot into the same per-partition codec thunk when a codec library is
    * available.
    */
  def mp4Codec[T](mk: (Long, String, Long, Long, Long) => T): () => MediaRow => T =
    () => { row =>
      val buf = java.nio.ByteBuffer.wrap(row.payload)
      def boxes(from: Int, until: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var off = from
          def hasNext: Boolean = off + 8 <= until
          def next(): (String, Int, Int) = {
            val size32 = buf.getInt(off)
            val tpe = new String(row.payload, off + 4, 4, "US-ASCII")
            // ISO 14496-12 §4.2: size==1 → 64-bit largesize after the type;
            // size==0 → box extends to the end of the enclosing container.
            val (payloadStart, end) =
              if (size32 == 0) (off + 8, until)
              else if (size32 == 1) {
                require(off + 16 <= until, s"truncated largesize box at $off in doc ${row.doc_id}")
                val largesize = buf.getLong(off + 8)
                require(
                  largesize >= 16 && off.toLong + largesize <= until,
                  s"corrupt largesize box at $off in doc ${row.doc_id}"
                )
                (off + 16, (off.toLong + largesize).toInt)
              } else {
                // box sizes are unsigned 32-bit per spec; compare in long
                // arithmetic so sizes near 2^31 can't overflow Int past
                // the require and fail later with a less clear error
                val size = size32.toLong & 0xffffffffL
                require(
                  size >= 8 && off.toLong + size <= until,
                  s"corrupt box at $off in doc ${row.doc_id}"
                )
                (off + 8, off + size.toInt)
              }
            val r = (tpe, payloadStart, end)
            off = end
            r
          }
        }
      val moov = boxes(0, row.payload.length)
        .collectFirst { case ("moov", s, e) => (s, e) }
        .getOrElse(sys.error(s"no moov box in doc ${row.doc_id}"))
      var timescale = -1L
      var duration = -1L
      var nTracks = 0L
      boxes(moov._1, moov._2).foreach {
        case ("mvhd", s, _) =>
          val version = buf.get(s) & 0xff
          if (version == 0) {
            timescale = buf.getInt(s + 12).toLong
            duration = buf.getInt(s + 16).toLong & 0xffffffffL
          } else { // v1: 64-bit creation/modification/duration
            timescale = buf.getInt(s + 20).toLong
            duration = buf.getLong(s + 24)
          }
        case ("trak", _, _) => nTracks += 1
        case _              => ()
      }
      require(timescale > 0, s"no mvhd box in doc ${row.doc_id}")
      mk(row.doc_id, "video/mp4", timescale, duration, nTracks)
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
