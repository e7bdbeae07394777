package graft.multimodal

import graft.model.MediaRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media handling: image/audio/video payloads are `binary` columns
  * with typed metadata (the reference keeps media bytes out of document.xml
  * the same way, `ImageExtractor.cs:61-81`; FIXTURES.md §2 `media` table).
  *
  * Decode/feature-extraction is environment-dependent (no image/audio libs in
  * this container), so the byte-level decode is a clearly-marked DETERMINISTIC
  * STUB; the Spark-side plumbing — schema, partition-wise batch iteration,
  * join strategy — is real and benchmarked. On a cluster the stub body is
  * replaced by the actual codec call; nothing else changes.
  */
object Multimodal {

  /** FNV-1a 64 over a byte block — the ONE copy of the stub checksum used by
    * both the decode and frame-sample stand-ins (a typo'd constant in a
    * duplicated fold would silently diverge the two feature streams). */
  @inline private def fnv1a64(bytes: Array[Byte], from: Int = 0, until: Int = -1): Long = {
    val end = if (until < 0) bytes.length else until
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < end) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  final case class MediaFeature(
      doc_id: String, media_ref: String, content_type: String,
      width_px: Int, height_px: Int, format: String, byte_len: Int,
      checksum: Long)

  /** STUB decode: derives "decoded" metadata purely from the byte payload
    * (FNV-1a checksum, pseudo pixel dims from the EMU extents at 96 dpi).
    * Real implementation: ImageIO/ffmpeg per partition — the mapPartitions
    * shape below amortizes codec init per partition exactly as the real one
    * must. */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init seam: real codecs are constructed HERE, once
      it.map { m =>
        val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
        val emuPerPx = 9525L // 914400 EMU/inch at 96 dpi
        // content_type is as nullable as bytes in a foreign media table — an
        // NPE here kills the task, the exact failure quarantine exists to stop
        val fmt = Option(m.content_type)
          .flatMap(_.split('/').lastOption).getOrElse("bin")
        MediaFeature(m.doc_id, m.media_ref, m.content_type,
          (m.width_emu / emuPerPx).toInt, (m.height_emu / emuPerPx).toInt,
          fmt, bytes.length, fnv1a64(bytes))
      }
    }
  }

  /** Frame-sampling stub for video payloads: every `stride`-th 16-byte block
    * stands in for a frame — same batch shape (one row in, k rows out via
    * flatMap) as real frame extraction. */
  final case class Frame(doc_id: String, media_ref: String, frame_idx: Int, frame_checksum: Long)
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
      bytes.grouped(16).zipWithIndex.collect {
        case (blk, idx) if idx % stride == 0 =>
          Frame(m.doc_id, m.media_ref, idx, fnv1a64(blk))
      }
    }
  }

  /** Resized media row: same table shape as the input (a resize pipeline
    * stage is payload→payload), with the target geometry recorded. */
  final case class ResizedMedia(
      doc_id: String, media_ref: String, content_type: String,
      width_px: Int, height_px: Int, target_w: Int, target_h: Int,
      bytes: Array[Byte])

  /** STUB resize: aspect-preserving fit into a `target` box. The geometry
    * math (letterbox fit, EMU→px) is real; the pixel resample is a
    * deterministic byte fold standing in for the codec call (no image libs
    * in this container). Plumbing is the production shape: mapPartitions
    * with a per-partition codec-init seam, payload in → payload out, so the
    * stage chains after [[decodeImageMeta]] and before any writer. Output
    * size scales with the target area — the real memory profile a resize
    * stage must budget for (partition sizing note: output rows are
    * ~target_w×target_h×3 bytes in production; keep
    * `spark.sql.files.maxPartitionBytes` sized for the DECODED, not encoded,
    * footprint). */
  def resizeImages(media: Dataset[MediaRow], target: Int = 256): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init seam: real resampler/codec constructed HERE, once
      it.map { m =>
        val emuPerPx = 9525L
        val w = math.max(1, (m.width_emu / emuPerPx).toInt)
        val h = math.max(1, (m.height_emu / emuPerPx).toInt)
        val scale = math.min(target.toDouble / w, target.toDouble / h)
        val tw = math.max(1, math.round(w * scale).toInt)
        val th = math.max(1, math.round(h * scale).toInt)
        val src = if (m.bytes == null) Array.emptyByteArray else m.bytes
        // deterministic stand-in "pixels": fold the source bytes into a
        // buffer sized like a tiny thumbnail plane (tw*th capped)
        val out = new Array[Byte](math.min(tw * th, 4096))
        var i = 0
        while (i < src.length) {
          out(i % out.length) = (out(i % out.length) ^ src(i)).toByte
          i += 1
        }
        ResizedMedia(m.doc_id, m.media_ref, m.content_type, w, h, tw, th, out)
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
