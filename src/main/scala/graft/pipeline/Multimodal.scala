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
  * record). VIDEO container metadata is REAL too, on its own typed path
  * `extractVideoMeta` — a hand-rolled ISO-BMFF (MP4) box walk reads
  * mvhd/tkhd width/height/duration from the actual bytes (container
  * structure needs no codec). The deterministic `decodeStub` remains only
  * for what genuinely needs codec libraries absent from this container:
  * FRAME/pixel decode and non-MP4 video containers; swap it for an
  * ffmpeg-style JNI codec without touching the distribution logic.
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
    * frames; likewise video rows → [[extractVideoMeta]], whose VideoMeta
    * carries width/height/duration from the real MP4 box walk). With the
    * audio and video paths real, the stub on THIS record is a legacy
    * placeholder for mis-routed non-image rows — mixed-corpus callers
    * should dispatch by mime to the typed paths. */
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

  final case class VideoMeta(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long, checksum: String)

  /** REAL video CONTAINER metadata decode: a hand-rolled ISO-BMFF (MP4)
    * box walk — `moov/mvhd` for timescale+duration, `moov/trak/tkhd` for
    * the 16.16 fixed-point width/height. Pure byte arithmetic (big-endian
    * reads; 64-bit `largesize` and version-1 boxes handled), so it needs
    * no codec library — container metadata is structural, only FRAME
    * decode needs ffmpeg-class codecs. Unparseable bytes yield
    * `(-1, -1, -1)` — the explicit failure marker, never fake numbers.
    * Checksum is the md5 of the raw bytes either way. */
  def decodeVideo(row: MediaRow): VideoMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(row.media)
    val hex = md.map("%02x".format(_)).mkString
    val (w, h, d) = parseMp4Meta(row.media)
    VideoMeta(row.doc_id, row.mime, row.media.length, w, h, d, hex)
  }

  /** (width, height, duration_ms) from MP4 bytes, or (-1, -1, -1). */
  private[pipeline] def parseMp4Meta(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def typ(o: Int): String = new String(bytes, o + 4, 4, "US-ASCII")
    // children of [start,end): (payloadStart, payloadEnd) per box type `t`,
    // in order; malformed sizes stop the walk (caller falls to the marker)
    def children(start: Int, end: Int, t: String): List[(Int, Int)] = {
      var out = List.empty[(Int, Int)]
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        var sz = be32(o)
        var hdr = 8
        if (sz == 1 && o + 16 <= end) { sz = be64(o + 8); hdr = 16 }
        else if (sz == 0) sz = (end - o).toLong
        if (sz < hdr || sz > Int.MaxValue || o + sz > end) ok = false
        else {
          if (typ(o) == t) out = (o + hdr, o + sz.toInt) :: out
          o += sz.toInt
        }
      }
      out.reverse
    }
    val fail = (-1, -1, -1L)
    try {
      children(0, n, "moov").headOption match {
        case None => fail
        case Some((ms, me)) =>
          val durMs = children(ms, me, "mvhd").headOption.flatMap { case (p, pe) =>
            val v = bytes(p) & 0xff
            if (v == 0 && p + 20 <= pe) {
              val ts = be32(p + 12); val d = be32(p + 16)
              if (ts > 0) Some(d * 1000L / ts) else None
            } else if (v == 1 && p + 32 <= pe) {
              val ts = be32(p + 20); val d = be64(p + 24)
              if (ts > 0) Some(d * 1000L / ts) else None
            } else None
          }
          // first trak whose tkhd carries a nonzero width (video track;
          // audio tracks store 0×0)
          val dims = children(ms, me, "trak").iterator.flatMap { case (ts0, te) =>
            children(ts0, te, "tkhd").headOption.flatMap { case (p, pe) =>
              val v = bytes(p) & 0xff
              val (wo, ho) = if (v == 1) (p + 88, p + 92) else (p + 76, p + 80)
              if (ho + 4 <= pe) {
                val w = (be32(wo) >> 16).toInt; val h = (be32(ho) >> 16).toInt
                if (w > 0) Some((w, h)) else None
              } else None
            }
          }.find(_ => true)
          (dims, durMs) match {
            case (Some((w, h)), Some(d)) => (w, h, d)
            case _ => fail
          }
      }
    } catch { case _: IndexOutOfBoundsException => fail }
  }

  /** [[extractMeta]]'s video twin: MP4 container metadata over partition
    * batches (same lazy-iterator shape). */
  def extractVideoMeta(ds: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeVideo))
  }

  /** Deterministic synthetic MP4: ftyp + moov(mvhd + one video trak(tkhd))
    * + an mdat of `seed`-derived filler. Box sizes/offsets are written the
    * way a real muxer writes them, so the metadata must come back through
    * a real box walk. Test/oracle fixture — the oracle pins the generated
    * width/height/duration. */
  def syntheticMp4(width: Int, height: Int, timescale: Int, duration: Int,
      seed: Long): Array[Byte] = {
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8 + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    }
    val unityMatrix = be32(0x00010000) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000)
    val mvhd = box("mvhd",
      be32(0),                      // version 0 + flags
      be32(0), be32(0),             // creation, modification
      be32(timescale), be32(duration),
      be32(0x00010000),             // rate 1.0
      Array[Byte](0x01, 0x00, 0, 0), // volume 1.0 + reserved
      be32(0), be32(0),             // reserved2
      unityMatrix,
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0), // pre_defined
      be32(2))                      // next_track_id
    val tkhd = box("tkhd",
      be32(0x00000007),             // version 0, flags: enabled|in-movie|in-preview
      be32(0), be32(0),             // creation, modification
      be32(1), be32(0),             // track_id, reserved
      be32(duration),
      be32(0), be32(0),             // reserved
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0), // layer, alt_group, volume, reserved
      unityMatrix,
      be32(width << 16), be32(height << 16))
    val trak = box("trak", tkhd)
    val moov = box("moov", mvhd, trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(512),
      "isomiso2mp41".getBytes("US-ASCII"))
    val filler = Array.tabulate(32)(i => (((i * 131 + seed * 31 + 7) % 251) - 125).toByte)
    ftyp ++ moov ++ box("mdat", filler)
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

  final case class PixelStats(doc_id: Long, w_in: Int, h_in: Int,
      w_out: Int, h_out: Int, r_sum: Long, g_sum: Long, b_sum: Long)

  /** REAL pixel path — decode + resize (the feature-extract leg of the
    * multimodal contract, pure JDK): ImageIO decodes the full pixel grid,
    * the resize is a nearest-neighbor grid subsample
    * `dst(x, y) = src(x·(w div outW), y·(h div outH))` (explicit integer
    * sampling — no interpolation, so the resized pixels are exact
    * functions of the source and an oracle can pin them from the
    * generator), and the emitted record carries per-channel sums of the
    * resized image. Undecodable or too-small payloads yield the explicit
    * all-(-1) failure marker, never fake numbers. Per-row `map` over
    * opaque bytes — the one shape codecs force. */
  def resizeStats(ds: Dataset[MediaRow], outW: Int, outH: Int): Dataset[PixelStats] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        catch { case _: java.io.IOException => null }
      if (img == null || img.getWidth < outW || img.getHeight < outH)
        PixelStats(r.doc_id, -1, -1, -1, -1, -1L, -1L, -1L)
      else {
        val fx = img.getWidth / outW
        val fy = img.getHeight / outH
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            val v = img.getRGB(x * fx, y * fy)
            rs += (v >> 16) & 0xff; gs += (v >> 8) & 0xff; bs += v & 0xff
            x += 1
          }
          y += 1
        }
        PixelStats(r.doc_id, img.getWidth, img.getHeight, outW, outH, rs, gs, bs)
      }
    }
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
