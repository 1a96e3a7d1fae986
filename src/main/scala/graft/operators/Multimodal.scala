package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal column plumbing (SURVEY.md §2 C12).
  *
  * Media are opaque `binary` columns + a typed metadata struct; decode /
  * feature-extraction runs per-partition in batches. The decode itself is
  * STUBBED (no image/audio codecs in this container) with a deterministic
  * byte-level fake — the Spark-side contract (schema, batching, partition
  * parallelism, no driver collection) is the real, tested part; swap
  * `stubDecode` for an actual codec call in production.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Derive a deterministic fake media corpus from the documents table:
    * media bytes = utf8(text). In production this column arrives from the
    * upstream store; every downstream op only sees (binary, metadata).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
        col("text").cast("binary").as("media"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 9).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation calls the codec here (per batch,
    * inside the partition). The fake is a 16-bin byte histogram, L1
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
    * a real codec initializes ONCE per batch (model handle, scratch
    * buffers) and amortizes that over `batchSize` records. Nothing is
    * collected; partitions process independently; memory is bounded by one
    * batch of payloads.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec/model init goes here (stubbed: nothing to open)
        batch.iterator.map { m =>
          MediaFeatures(m.doc_id, m.kind, m.media.length.toLong, stubDecode(m.media))
        }
      }
    }
  }

  /** Resize: STUB for the image-resize kernel — deterministically
    * downsamples the payload to targetW×targetH bytes by even-stride
    * sampling (a real implementation decodes, resamples, re-encodes here).
    * The metadata struct is updated in lockstep, which is the part
    * downstream operators depend on.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val n = targetW * targetH
        val out =
          if (m.media.isEmpty) Array.empty[Byte]
          else Array.tabulate(n)(i => m.media(((i.toLong * m.media.length) / n).toInt))
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
