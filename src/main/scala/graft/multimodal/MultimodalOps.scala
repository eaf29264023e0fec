package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
final case class MediaMeta(format: String, nBytes: Long)
final case class MediaRow(doc_id: Long, modality: String, content: Array[Byte], meta: MediaMeta)
final case class ImageMeta(doc_id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)
final case class MediaFeatures(doc_id: Long, modality: String, features: Array[Float])
final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal-column operations for training-data pipelines.
  *
  * Design contract (the part that must be right at 100 TB):
  *  - media rides as an opaque `binary` column next to typed metadata —
  *    never decoded at rest, never shuffled in decoded form;
  *  - decode / feature-extract / frame-sample run as per-partition batch
  *    kernels (`Dataset.mapPartitions`, the JVM analogue of `mapInPandas`):
  *    one kernel instance per partition, streaming iterator in/out, no
  *    driver involvement, partitioning preserved (no Exchange in the plan);
  *  - IMAGE decode is REAL (`decodeImageMetaReal`, javax.imageio from the
  *    JDK, header-only parse); the audio/video kernels remain deterministic
  *    byte-level fakes, clearly marked (this container has no av codecs).
  *    Swapping in a real codec changes only the kernel body — schema,
  *    batching, and plan shape stay as tested.
  */
object MultimodalOps {

  /** Pack a text corpus into fake media rows: content = UTF-8 bytes,
    * modality assigned deterministically by id. (Synthetic stand-in for a
    * real ingest of image/audio/video blobs.) */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(lit("raw").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nBytes")).as("meta"))

  /** STUB image decode: header-parse kernel. A real implementation would
    * wrap a codec (e.g. javax.imageio) here; the fake derives dimensions
    * deterministically from the payload so tests are stable. */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // kernel instantiated once per partition (codec init happens here)
      rows.filter(_.modality == "image").map { m =>
        val b = m.content
        // --- STUB: deterministic fake of a codec's header parse ---
        val w = 64 + (if (b.length > 0) (b(0) & 0xFF) % 512 else 0)
        val h = 64 + (if (b.length > 1) (b(1) & 0xFF) % 512 else 0)
        ImageMeta(m.doc_id, w, h, 3, b.length.toLong)
      }
    }
  }

  /** REAL image decode kernel backed by `javax.imageio` (ships in the JDK —
    * no new dependency): header-only parse — `ImageReader.getWidth/getHeight`
    * read the format header, not pixels, so the kernel is O(header) per row
    * regardless of payload size (the property that matters when the payload
    * column is terabytes of images). Plan shape identical to the stub
    * kernel: one reader per partition element stream, no Exchange.
    * Undecodable payloads map to `ImageMeta(doc_id, -1, -1, 0, nBytes)` —
    * routable to quarantine, never a silent drop or a task failure. */
  def decodeImageMetaReal(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.modality == "image").map { m =>
        // null payloads are undecodable too — same routable sentinel, no NPE
        val nBytes = if (m.content == null) 0L else m.content.length.toLong
        val bad = ImageMeta(m.doc_id, -1, -1, 0, nBytes)
        if (m.content == null) bad else {
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(m.content))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) bad
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              val w = r.getWidth(0)
              val h = r.getHeight(0)
              val types = r.getImageTypes(0)
              val channels = if (types.hasNext) types.next().getNumComponents else 3
              ImageMeta(m.doc_id, w, h, channels, m.content.length.toLong)
            } finally r.dispose()
          }
        } catch { case _: Exception => bad }
        finally if (iis != null) iis.close()
        }
      }
    }
  }

  /** STUB feature extraction: binary → fixed-dim float vector via a rolling
    * byte hash (stand-in for a vision/audio encoder). Batch shape is the
    * real thing: one kernel per partition, output dim fixed. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val acc = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < m.content.length) {
          h = 31 * h + (m.content(i) & 0xFF)
          acc(i % dim) += ((h >>> 40) & 0xFF) / 255.0f - 0.5f
          i += 1
        }
        MediaFeatures(m.doc_id, m.modality, acc)
      }
    }
  }

  /** STUB video frame sampling: treat the payload as fixed-size frames,
    * keep every `everyN`-th. flatMap shape = real frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      everyN: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.modality != "video") Iterator.empty
      else m.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyN == 0)
        .map { case (bytes, idx) => Frame(m.doc_id, idx, bytes) }
    }
  }

  /** STUB resize: subsample payload bytes by `factor`, metadata updated —
    * the shape of a real thumbnailing pass (binary in, smaller binary out,
    * meta kept consistent). */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val out = m.content.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
      m.copy(content = out, meta = m.meta.copy(nBytes = out.length.toLong))
    }
  }

  def toMediaDataset(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.as[MediaRow]
  }
}
