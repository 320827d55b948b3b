package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark side is real and tested — schema, partition-batch shape,
  * backpressure-friendly iterator processing via `mapPartitions` (the Scala
  * analog of `mapInPandas` batches). The codec itself is a STUB: this
  * container has no image/audio libraries, so `decodeStub` derives
  * deterministic fake metadata from the bytes. Swap `decodeStub` for a real
  * JNI/Java codec without touching the distribution logic.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  final case class MediaMeta(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, checksum: String)

  /** STUB decoder — deterministic fake: "dimensions" are derived from the
    * first bytes, checksum is real md5. Replace with a real codec
    * (javax.imageio / ffmpeg JNI) in production; the signature is the
    * contract. */
  def decodeStub(row: MediaRow): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(row.media)
    val hex = md.map("%02x".format(_)).mkString
    val w = if (row.media.length >= 2) ((row.media(0) & 0x7f) << 4 | (row.media(1) & 0x0f)) + 16 else 16
    val h = if (row.media.length >= 4) ((row.media(2) & 0x7f) << 4 | (row.media(3) & 0x0f)) + 16 else 16
    MediaMeta(row.doc_id, row.mime, row.media.length, w, h, hex)
  }

  /** Feature extraction over partition batches. The iterator is processed
    * lazily (constant memory per partition) — the shape a real batch codec
    * needs. */
  def extractMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeStub))
  }

  /** Build a media table from any table with a string payload column —
    * the test harness's way of getting realistic binary data without
    * binary fixtures. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("application/octet-stream").as("mime")).as[MediaRow]
  }

  /** Frame-sampling shape: split a byte payload into fixed-size "frames" and
    * keep every `stride`-th — the partitioning/indexing logic of video frame
    * sampling with the codec stubbed to byte slicing. */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.doc_id, idx, frame.length) }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
