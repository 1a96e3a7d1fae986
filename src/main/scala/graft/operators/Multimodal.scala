package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal column plumbing (SURVEY.md §2 C12).
  *
  * Media are opaque `binary` columns + a typed metadata struct; decode /
  * feature-extraction runs per-partition in batches. The IMAGE path is
  * real: payloads are actual PNGs decoded with the JDK's `javax.imageio`
  * (zero external deps), pixels → luminance histogram, resize →
  * decode/resample/re-encode. The AUDIO path stays an honest stub (no
  * audio codecs in this container) with the same batched contract — swap
  * `stubDecode` for the codec call in production.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Derive a deterministic media corpus from the documents table: image
    * rows carry a REAL PNG (gray gradient keyed on doc_id — decodable by
    * any codec), audio rows carry utf8(text) as the opaque waveform stand-
    * in. In production this column arrives from the upstream store; every
    * downstream op only sees (binary, metadata).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
        col("text").cast("binary").as("media"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 9).cast("int").as("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (d, kind, text, w, h) =>
          val media = if (kind == "image") pngBytes(d, w, h) else text
          MediaRow(d, kind, media, w, h)
        }
      }
  }

  /** A real w×h PNG: 8-bit gray gradient, pixel(x,y) = (d·31+x·7+y·13) mod
    * 256 — deterministic across runs and engines.
    */
  private[graft] def pngBytes(d: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((d * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: PNG/BMP/GIF bytes → pixels (JDK ImageIO) → 16-bin
    * luminance histogram (integer Rec.601 weights), L1-normalized by pixel
    * count. Returns null histogram only for undecodable payloads (caller
    * falls back to the byte stub so one bad file can't kill a 100 TB job).
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[Array[Float]] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val hist = new Array[Float](16)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1, w * h).toFloat
      Some(hist.map(_ / n))
    }
  }

  /** STUB decode (audio / undecodable fallback): 16-bin byte histogram, L1
    * normalized — deterministic, so specs can pin values.
    */
  private def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    hist.map(_ / n)
  }

  /** Feature extraction: batched per partition — the iterator streams
    * through in fixed-size chunks (the mapInPandas batch shape, in Scala):
    * a codec initializes ONCE per batch (ImageIO disk-cache off here;
    * model handles / scratch buffers in production) and amortizes that
    * over `batchSize` records. Nothing is collected; partitions process
    * independently; memory is bounded by one batch of payloads.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        ImageIO.setUseCache(false) // per-batch codec init point
        batch.iterator.map { m =>
          val feats =
            if (m.kind == "image") decodeImage(m.media).getOrElse(stubDecode(m.media))
            else stubDecode(m.media)
          MediaFeatures(m.doc_id, m.kind, m.media.length.toLong, feats)
        }
      }
    }
  }

  /** Resize. Image rows are REALLY resized: decode → bilinear Graphics2D
    * resample to targetW×targetH → re-encode PNG; metadata updates in
    * lockstep. Non-image rows keep the deterministic even-stride byte
    * downsample to targetW·targetH bytes (the stub contract).
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { m =>
        val out =
          if (m.kind == "image") {
            val src = ImageIO.read(new ByteArrayInputStream(m.media))
            if (src == null) Array.empty[Byte]
            else {
              val dst = new java.awt.image.BufferedImage(targetW, targetH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, targetW, targetH, null)
              g.dispose()
              val bos = new ByteArrayOutputStream()
              ImageIO.write(dst, "png", bos)
              bos.toByteArray
            }
          } else {
            val n = targetW * targetH
            if (m.media.isEmpty) Array.empty[Byte]
            else Array.tabulate(n)(i => m.media(((i.toLong * m.media.length) / n).toInt))
          }
        m.copy(media = out, width = targetW, height = targetH)
      }
    }
  }

  /** Frame sampling: emit n evenly-spaced "frames" (byte slices) per media
    * row — the video-frame-sample shape (explode with controlled fan-out).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val len = m.media.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = (len.toLong * i / n).toInt
        val end = (len.toLong * (i + 1) / n).toInt
        (m.doc_id, i, m.media.slice(start, end))
      }
    }.toDF("doc_id", "frame", "frame_bytes")
  }
}
