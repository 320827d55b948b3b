package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark side is real and tested — schema, partition-batch shape,
  * backpressure-friendly iterator processing via `mapPartitions` (the Scala
  * analog of `mapInPandas` batches). IMAGE metadata decode is REAL
  * (`javax.imageio.ImageIO` — JDK, offline, headless — parses PNG/BMP/
  * JPEG/GIF dimensions from the actual bytes) on the `extractMeta` path.
  * AUDIO header decode is REAL on its OWN typed path, `extractAudioMeta`
  * (`javax.sound.sampled` parses WAV/AIFF/AU sample rate, channels, frame
  * counts — audio metadata is not width/height-shaped, so it gets its own
  * record). The deterministic `decodeStub` remains only where no JDK
  * parser exists: VIDEO mimes (and audio rows mistakenly sent down the
  * image-shaped path — route them to `extractAudioMeta` instead); swap it
  * for an ffmpeg-style JNI codec without touching the distribution logic.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  final case class MediaMeta(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, checksum: String)

  /** STUB decoder for NON-IMAGE mimes (audio/video — no codec libraries in
    * this container): deterministic fake "dimensions" derived from the
    * first bytes, checksum is real md5. Image mimes never reach this —
    * [[decode]] routes them to the real [[decodeImage]]. Replace with an
    * ffmpeg-style JNI codec in production; the signature is the contract. */
  def decodeStub(row: MediaRow): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(row.media)
    val hex = md.map("%02x".format(_)).mkString
    val w = if (row.media.length >= 2) ((row.media(0) & 0x7f) << 4 | (row.media(1) & 0x0f)) + 16 else 16
    val h = if (row.media.length >= 4) ((row.media(2) & 0x7f) << 4 | (row.media(3) & 0x0f)) + 16 else 16
    MediaMeta(row.doc_id, row.mime, row.media.length, w, h, hex)
  }

  /** REAL image metadata decode via the JDK's ImageIO. Returns
    * width/height from the decoded image; a payload ImageIO cannot parse
    * (corrupt bytes, unsupported subformat) yields `(-1, -1)` — an explicit
    * decode-failure marker, never fake numbers. The checksum is the md5 of
    * the raw bytes either way. */
  def decodeImage(row: MediaRow): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(row.media)
    val hex = md.map("%02x".format(_)).mkString
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.media))
      catch { case _: java.io.IOException => null }
    val (w, h) = if (img == null) (-1, -1) else (img.getWidth, img.getHeight)
    MediaMeta(row.doc_id, row.mime, row.media.length, w, h, hex)
  }

  /** Mime dispatch for the IMAGE-SHAPED metadata record: image mimes → the
    * real ImageIO decoder; audio/video mimes → the declared stub (this
    * record carries width/height, which audio does not have — REAL audio
    * header decode lives on its own typed path, [[extractAudioMeta]] /
    * [[decodeAudio]], whose AudioMeta record carries sample-rate/channels/
    * frames). With that audio path real, the stub is genuinely
    * load-bearing only for VIDEO (no container/codec parser in the JDK);
    * for audio it is a legacy width/height placeholder a mixed-corpus
    * caller should not read — route audio rows to [[extractAudioMeta]]. */
  def decode(row: MediaRow): MediaMeta =
    if (row.mime.startsWith("image/")) decodeImage(row) else decodeStub(row)

  final case class AudioMeta(doc_id: Long, mime: String, n_bytes: Int,
      sample_rate: Int, channels: Int, n_frames: Long, checksum: String)

  /** REAL audio metadata decode via the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU header parsing — pure JDK, works offline and headless):
    * sample rate, channel count, and frame length from the actual header.
    * Unparseable bytes yield `(-1, -1, -1)` — the explicit decode-failure
    * marker, never fake numbers. Checksum is the md5 of the raw bytes
    * either way. */
  def decodeAudio(row: MediaRow): AudioMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(row.media)
    val hex = md.map("%02x".format(_)).mkString
    val fmt =
      try javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(row.media))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (fmt == null) AudioMeta(row.doc_id, row.mime, row.media.length, -1, -1, -1L, hex)
    else AudioMeta(row.doc_id, row.mime, row.media.length,
      fmt.getFormat.getSampleRate.toInt, fmt.getFormat.getChannels,
      fmt.getFrameLength.toLong, hex)
  }

  /** [[extractMeta]]'s audio twin: WAV/AIFF/AU header metadata over
    * partition batches (same lazy-iterator shape). */
  def extractAudioMeta(ds: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeAudio))
  }

  /** Deterministic synthetic WAV (encoded with the REAL
    * javax.sound.sampled writer): `nFrames` frames of 16-bit PCM noise
    * seeded by `seed`, at `sampleRate` Hz × `channels`. Test/oracle
    * fixture — the oracle pins the header values a real parser must read
    * back. */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val bytes = new Array[Byte](nFrames * 2 * channels)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = (((i * 131 + seed * 31 + 7) % 251) - 125).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Feature extraction over partition batches. The iterator is processed
    * lazily (constant memory per partition) — the shape a real batch codec
    * needs. `mapPartitions` is justified here (and only here): the payload
    * is opaque bytes no Catalyst expression can parse. */
  def extractMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decode))
  }

  /** Deterministic synthetic image (PNG or BMP via the REAL ImageIO
    * encoder): a w×h RGB gradient seeded by `seed`. Test/oracle fixture —
    * the oracle pins the dimensions a real decoder must read back. */
  def syntheticImage(w: Int, h: Int, seed: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((x * 31 + y * 7 + seed) % 0x1000000) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
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
