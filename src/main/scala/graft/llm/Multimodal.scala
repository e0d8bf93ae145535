package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media metadata carried alongside the opaque payload. */
case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

/** One media object: opaque binary payload + typed metadata — the
  * schema contract for multimodal columns (image/audio/video travel as
  * `binary`, never decoded inside Catalyst expressions). */
case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Decoder output: per-object features, all integer-accumulated so
  * downstream aggregation is order-independent (shuffle-safe hashes). */
case class MediaFeatures(
    media_id: Long, format: String, n_bytes: Long,
    checksum: Long, n_frames: Long, level_sum: Long)

/** Multimodal-column plumbing (SURVEY.md §7.1): binary payloads with
  * typed metadata, decoded/feature-extracted in a partition-local typed
  * pipeline — the Scala analogue of `mapInPandas` (iterator-of-batches
  * in, iterator out; no driver collect, partitioning preserved).
  *
  * The decode itself is a DETERMINISTIC FAKE — this container has no
  * image/audio codecs — but everything Spark-side is real: the
  * binary+struct schema, the case-class `Encoder`s, the
  * `mapPartitions` batch shape, and the downstream relational
  * aggregation. A real decoder replaces only the body of
  * [[extractFeatures]]'s map.
  *
  * 100 TB posture: payloads never enter a shuffle — features (a few
  * longs per object) do. Decode is embarrassingly parallel; a skewed
  * payload-size distribution is handled by smaller
  * `files.maxPartitionBytes`, not by repartitioning blobs.
  */
object Multimodal {

  /** Fixture adapter: documents → media blobs (UTF-8 payload bytes,
    * format assigned round-robin from the source id, plausible
    * dimensions derived from the length). */
  def mediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val fmtIdx = element_at(split(col("source"), "src"), 2).cast("int") % 4
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(fmtIdx === 0, "jpeg").when(fmtIdx === 1, "png")
          .when(fmtIdx === 2, "wav").otherwise("mp4").as("format"),
        ((col("n_chars") % 64) + 16).cast("int").as("width"),
        (expr("(n_chars DIV 64) % 64") + 16).cast("int").as("height"),
        (col("n_chars") * 40).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** Partition-local decode + feature extraction. The fold/frame logic
    * below stands in for a real codec: checksum ≈ container CRC, frame
    * sampling every 16 bytes ≈ keyframe extraction, level_sum ≈ pixel /
    * sample energy. Integer accumulators only — results are independent
    * of partitioning and merge order. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        // --- deterministic fake decode (a real impl parses r.meta.format) ---
        val bytes = r.payload
        var checksum = 0L
        var levelSum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = (bytes(i) & 0xff).toLong
          checksum = (checksum * 31 + b) % 1000000007L
          levelSum += b
          i += 1
        }
        MediaFeatures(r.media_id, r.meta.format, bytes.length.toLong,
          checksum, (bytes.length / 16).toLong, levelSum)
      }
    }
  }
}
