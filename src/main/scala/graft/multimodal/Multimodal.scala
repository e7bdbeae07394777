package graft.multimodal

import graft.model.MediaRow
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque media handling: image/audio/video payloads are `binary` columns
  * with typed metadata (the reference keeps media bytes out of document.xml
  * the same way, `ImageExtractor.cs:61-81`; FIXTURES.md §2 `media` table).
  *
  * Decode is REAL for every modality in the pipeline, all on codecs the
  * JDK ships (`java.desktop`, headless):
  * still images via `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — header-only
  * metadata read in [[decodeImageMeta]], full pixel decode + `Graphics2D`
  * resample in [[resizeImages]]); WAV audio via
  * `javax.sound.sampled.AudioSystem` (8/16-bit PCM, mono/stereo, full
  * sample-stream fold in [[audioStats]]); and multi-frame video-analog
  * containers via ImageIO's animated-GIF reader
  * (`ImageReader.getNumImages(true)` / `read(i)` — [[sampleFrames]] decodes
  * every stride-th frame's actual pixels). Real video containers
  * (MP4/H.264) need an external demuxer (ffmpeg/JCodec) the JDK does not
  * ship; [[sampleFrames]]' per-partition init seam is exactly where that
  * demuxer would be constructed — nothing else about the plan changes.
  *
  * Undecodable payloads follow the extraction quarantine discipline: they
  * never kill the task. [[decodeImageMeta]] emits a row with null
  * dims/`format = "bin"`; [[resizeImages]] skips the row (a resize stage is
  * payload→payload; there is nothing to emit).
  */
object Multimodal {

  /** FNV-1a 64 over the DECODED pixel grid of a frame (row-major, 24-bit
    * RGB, low byte first) — the cross-side parity surface for video frames:
    * the generator recomputes it from its own indexed frame
    * ([[graft.corpus.SyntheticCorpus.gifFrame]]) WITHOUT going through the
    * container, so equality proves the container round-trip decoded the
    * actual pixels (asserted in the frames spec). */
  def frameChecksum(img: java.awt.image.BufferedImage): Long = {
    var h = 0xcbf29ce484222325L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y) & 0xffffff
        h ^= (p & 0xffL); h *= 0x100000001b3L
        h ^= ((p >> 8) & 0xffL); h *= 0x100000001b3L
        h ^= ((p >> 16) & 0xffL); h *= 0x100000001b3L
        x += 1
      }
      y += 1
    }
    h
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** md5 over the UPPERCASE-hex rendering of the payload — byte-identical to
    * DuckDB's `md5(hex(bytes))` (DuckDB has no BLOB md5; both engines agree
    * on uppercase hex), giving the decode output an engine-independent
    * payload-equality column. */
  def md5OfHex(bytes: Array[Byte]): String = {
    val hex = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      hex(2 * i) = HexDigits((bytes(i) >> 4) & 0xf).toByte
      hex(2 * i + 1) = HexDigits(bytes(i) & 0xf).toByte
      i += 1
    }
    val d = java.security.MessageDigest.getInstance("MD5").digest(hex)
    d.map(b => f"$b%02x").mkString
  }

  final case class MediaFeature(
      doc_id: String, media_ref: String, content_type: String,
      width_px: Option[Int], height_px: Option[Int],
      sample_rate_hz: Option[Int], duration_ms: Option[Long],
      format: String, byte_len: Int, checksum_md5: String)

  /** Real metadata decode, dispatched on content type:
    *
    *  - `image/&#42;` — `ImageIO` header read: the matching `ImageReader` is
    *    resolved from the byte stream (not the declared type) and asked for
    *    dims + format name WITHOUT decoding the pixel planes — at 100 TB the
    *    difference between a header read and a full decode per image is the
    *    whole I/O budget of the stage.
    *  - `audio/&#42;` — `AudioSystem.getAudioFileFormat`: container header
    *    parse (sample rate, frame count → duration), again without decoding.
    *  - anything else / undecodable — quarantine row: null dims,
    *    `format = "bin"`, checksum still computed (the row stays joinable).
    *
    * mapPartitions shape: codecs/digests are per-JVM singletons, but the
    * partition iterator is the seam where a licensed/NATIVE codec would be
    * constructed once per task rather than once per row. */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init seam: real heavyweight codecs are constructed HERE
      it.map { m =>
        val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
        val ct = if (m.content_type == null) "" else m.content_type
        val base = MediaFeature(m.doc_id, m.media_ref, m.content_type,
          None, None, None, None, "bin", bytes.length, md5OfHex(bytes))
        try {
          if (ct.startsWith("image/")) {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            // the stream must close on EVERY path — the no-matching-reader
            // quarantine case would otherwise leak one cache-backed stream
            // per undecodable row, exactly on degraded-input workloads
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) base
              else {
                val r = readers.next()
                try {
                  r.setInput(iis)
                  base.copy(width_px = Some(r.getWidth(0)), height_px = Some(r.getHeight(0)),
                    format = r.getFormatName.toLowerCase(java.util.Locale.ROOT))
                } finally r.dispose()
              }
            } finally iis.close()
          } else if (ct.startsWith("audio/")) {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = aff.getFormat
            val frames = aff.getFrameLength.toLong
            base.copy(
              sample_rate_hz = Some(fmt.getSampleRate.toInt),
              duration_ms = Some(frames * 1000L / fmt.getSampleRate.toLong),
              format = aff.getType.getExtension.toLowerCase(java.util.Locale.ROOT))
          } else base
        } catch { case _: Exception => base } // corrupt payload → quarantine row
      }
    }
  }

  /** Real PCM feature extraction for the audio family: the payload is
    * decoded through `AudioSystem.getAudioInputStream` (actual codec path,
    * not a header peek) and the sample stream reduced to signal statistics
    * — amplitude mean/RMS/peak in the format's native units. Supported
    * widths: 8-bit unsigned (midpoint 128) and 16-bit signed little-endian
    * (the overwhelming real-world WAV shape), mono or stereo; a stereo
    * frame contributes ONE mixed-down value, the truncating average
    * `(l + r) / 2` (documented: truncation toward zero, not floor/round —
    * the portable integer-division semantic SQL engines share, so the
    * DuckDB oracle's `//` mirrors it exactly). `n_samples` counts FRAMES.
    * Sums are exact in doubles at these magnitudes, so the stats are
    * engine-portable and the oracle recomputes them from the raw bytes.
    * Non-audio rows are filtered upstream of the decode (payload→feature
    * stage); undecodable or out-of-contract formats (24-bit, big-endian,
    * >2 channels, compressed) are skipped — quarantine discipline; silently
    * folding unknown layouts byte-wise would be the bug. */
  final case class AudioStats(
      doc_id: String, media_ref: String, n_samples: Long,
      mean_abs: Double, rms: Double, peak: Int)
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(m => m.content_type != null && m.content_type.startsWith("audio/"))
      .mapPartitions { it =>
        // per-partition init seam: real codecs constructed HERE, once
        it.flatMap { m =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(if (m.bytes == null) Array.emptyByteArray else m.bytes))
            try {
              // explicit per-layout folds, gated on the DECODER's reported
              // format (bits/channels/endianness), never on assumptions
              // about the bytes; anything outside the contract quarantines
              val fmt = ais.getFormat
              val bits = fmt.getSampleSizeInBits
              val chans = fmt.getChannels
              val ok = (bits == 8 && chans == 1) ||
                (bits == 16 && (chans == 1 || chans == 2) && !fmt.isBigEndian)
              if (!ok)
                throw new javax.sound.sampled.UnsupportedAudioFileException(
                  s"expected 8-bit mono or 16-bit LE mono/stereo PCM, got $fmt")
              val data = ais.readAllBytes()
              val frameBytes = (bits / 8) * chans
              val nFrames = data.length / frameBytes
              var sumAbs = 0.0; var sumSq = 0.0; var peak = 0
              var i = 0
              while (i < nFrames) {
                val v =
                  if (bits == 8) (data(i) & 0xff) - 128
                  else {
                    val o = i * frameBytes
                    val l = ((data(o) & 0xff) | (data(o + 1) << 8)).toShort.toInt
                    if (chans == 1) l
                    else {
                      val r = ((data(o + 2) & 0xff) | (data(o + 3) << 8)).toShort.toInt
                      (l + r) / 2 // truncating-average mixdown (see scaladoc)
                    }
                  }
                val a = math.abs(v)
                sumAbs += a; sumSq += v.toDouble * v; if (a > peak) peak = a
                i += 1
              }
              val n = math.max(nFrames, 1)
              Some(AudioStats(m.doc_id, m.media_ref, nFrames.toLong,
                BigDecimal(sumAbs / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
                BigDecimal(math.sqrt(sumSq / n)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
                peak))
            } finally ais.close()
          } catch { case _: Exception => None }
        }
      }
  }

  /** REAL frame sampling for the video family: the payload's matching
    * `ImageReader` is resolved from the byte stream, `getNumImages(true)`
    * scans the container for its true frame count, and every `stride`-th
    * frame is FULLY PIXEL-DECODED (`read(i)`), emitting its actual decoded
    * dims plus a checksum over the decoded pixel grid. The JDK's GIF reader
    * is a genuine multi-frame decoder, which makes the fixture's
    * animated-GIF "videos" a real decode path end to end; a real MP4/H.264
    * demuxer (ffmpeg/JCodec — not in the JDK) would be constructed at the
    * per-partition init seam below and the plan is unchanged.
    *
    * Scale notes: one row in → ceil(frames/stride) rows out via flatMap
    * (the fan-out a frame table needs); a full pixel decode per SAMPLED
    * frame only — skipped frames cost a header skip, not a decode.
    * Undecodable payloads quarantine to zero rows, never a task failure. */
  final case class Frame(doc_id: String, media_ref: String, frame_idx: Int,
      width_px: Int, height_px: Int, frame_checksum: Long)
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(m => m.content_type != null && m.content_type.startsWith("video/"))
      .mapPartitions { it =>
        // per-partition init seam: a real demuxer is constructed HERE, once
        it.flatMap { m =>
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(if (m.bytes == null) Array.emptyByteArray else m.bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) Vector.empty
              else {
                val r = readers.next()
                try {
                  r.setInput(iis) // seekForwardOnly = false → allowSearch OK
                  val n = r.getNumImages(true)
                  // materialized BEFORE the reader/stream close (a lazy
                  // iterator here would decode from a disposed reader)
                  (0 until n by stride).map { i =>
                    val img = r.read(i)
                    Frame(m.doc_id, m.media_ref, i, img.getWidth, img.getHeight,
                      frameChecksum(img))
                  }.toVector
                } finally r.dispose()
              }
            } finally iis.close()
          } catch { case _: Exception => Vector.empty } // corrupt → quarantine
        }
      }
  }

  /** Resized media row: same table shape as the input (a resize pipeline
    * stage is payload→payload), with the source and target geometry
    * recorded. `bytes` is the re-encoded PNG at `target_w × target_h`. */
  final case class ResizedMedia(
      doc_id: String, media_ref: String, content_type: String,
      width_px: Int, height_px: Int, target_w: Int, target_h: Int,
      bytes: Array[Byte])

  /** Real resize: full `ImageIO` pixel decode, aspect-preserving fit into a
    * `target`-square box (scale = min over both axes, output exactly
    * `tw × th` — a letterbox FIT, not a pad), bilinear `Graphics2D`
    * resample, PNG re-encode. Image rows only — other modalities pass this
    * stage untouched upstream (filter, no explode); undecodable image rows
    * are skipped (quarantine discipline, see object doc).
    *
    * Partition sizing note: output rows are ~`target²×3` bytes DECODED in
    * the executor while resampling; keep `spark.sql.files.maxPartitionBytes`
    * sized for the decoded, not encoded, footprint. */
  def resizeImages(media: Dataset[MediaRow], target: Int = 256): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(m => m.content_type != null && m.content_type.startsWith("image/"))
      .mapPartitions { it =>
        // per-partition init seam: real resampler/codec constructed HERE, once
        it.flatMap { m =>
          try {
            val src = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(if (m.bytes == null) Array.emptyByteArray else m.bytes))
            if (src == null) None
            else {
              val (w, h) = (src.getWidth, src.getHeight)
              val scale = math.min(target.toDouble / w, target.toDouble / h)
              val tw = math.max(1, math.round(w * scale).toInt)
              val th = math.max(1, math.round(h * scale).toInt)
              val out = new java.awt.image.BufferedImage(tw, th,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, tw, th, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Some(ResizedMedia(m.doc_id, m.media_ref, m.content_type, w, h, tw, th,
                bos.toByteArray))
            }
          } catch { case _: Exception => None }
        }
      }
  }

  /** Media join (J3, `ImageExtractor.cs:61-81`): image spans ⋈ media on
    * (doc_id, media_ref). The media catalog of a doc-partitioned corpus is
    * small relative to the spans table → broadcast; at full scale with
    * co-partitioned tables this becomes a bucketed sort-merge join.
    */
  def joinImageSpans(docs: DataFrame, media: DataFrame): DataFrame = {
    val images = docs
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") === "image")
      .select(col("doc_id"), col("s.text").as("text"), col("s.media_ref").as("media_ref"),
        col("s.offset").as("offset"))
    images.join(broadcast(media.select(col("doc_id"), col("media_ref"),
        col("content_type"), col("width_emu"), col("height_emu"), col("name"))),
      Seq("doc_id", "media_ref"), "left")
  }
}
