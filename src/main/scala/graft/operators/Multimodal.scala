package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, processed
  * per-partition in batches.
  *
  * IMAGE decode is REAL ([[decodeImage]]: JDK `javax.imageio` — PNG/JPEG/
  * BMP/GIF, headless, zero external deps — true dimensions + a 4×4
  * luminance-grid embedding), and so is AUDIO container+PCM decode for
  * WAV/AIFF/AU ([[decodeAudio]]: JDK `javax.sound.sampled` — sample rate,
  * frames, RMS loudness). VIDEO decode is REAL for MJPEG-in-AVI
  * ([[decodeVideo]]/[[extractVideoFrames]]: RIFF chunk walk + per-frame
  * JPEG decode — dimensions, fps, duration, luminance, motion, and
  * per-frame grids). Compressed-codec video (H.264…) and compressed
  * audio (mp3/ogg) fall back to the clearly-marked deterministic STUB
  * (`fakeDecode`, `decoded = false`): those need ffmpeg-class decoders
  * this container does not have.
  * Everything around both — schema, partition sizing, batch shape, the
  * mapPartitions pipeline — is the real production plumbing (in PySpark
  * this would be `mapInPandas`; the Scala equivalent is a typed
  * mapPartitions over an iterator, which keeps the same batch-at-a-time
  * memory profile).
  *
  * Scale notes: media blobs dominate row size, so the operators here
  * repartition by byte budget, not row count — the knob that keeps
  * executor memory flat at 100 TB.
  */
object Multimodal {

  /** One media asset: content plus the typed metadata a lakehouse keeps
    * alongside the blob.
    */
  case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long,     // 0 for stills
      content: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      mean_byte: Double,
      feature: Array[Float]) // stub embedding

  /** ??? in spirit: a deterministic fake decoder standing in for
    * libjpeg/ffmpeg. Derives a checksum, byte statistics, and a 16-dim
    * "embedding" from the raw bytes so downstream operators (dedup,
    * similarity, stats) are fully exercisable.
    */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val bytes = r.content
    var sum = 0L
    var hash = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      hash = hash * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val feat = Array.tabulate(16) { k =>
      (((hash >>> (k * 4)) & 0xffL).toFloat / 255f) - 0.5f
    }
    MediaFeatures(r.media_id, r.kind, bytes.length.toLong, hash,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, feat)
  }

  /** Per-partition batch decode — the mapInPandas analog. The iterator is
    * consumed lazily, so only one batch of blobs is resident per task.
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(fakeDecode))
  }

  /** REAL image features — decode is NOT a stub for still images: the JDK
    * ships codecs for PNG/JPEG/BMP/GIF (`javax.imageio`, headless, no
    * native libs), so this path decodes actual pixels. Emitted per image:
    * true dimensions, mean luminance, and a 4×4 cell-mean luminance grid
    * as a 16-dim embedding — coarse but real, and directly usable by the
    * [[Similarity]] operators for visual near-dup detection.
    * `decoded = false` rows fell back to [[fakeDecode]]'s byte-derived
    * features (format ImageIO lacks, or corrupt bytes) so the pipeline
    * stays total.
    */
  case class ImageFeatures(
      media_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      mean_lum: Double,
      grid: Array[Float])

  /** 4×4 cell-mean luminance grid (Rec. 601 weights) + overall mean —
    * the coarse visual embedding both the image and video paths emit.
    * Cells cover the image completely even when 4 does not divide w/h.
    */
  private def lumGrid(img: java.awt.image.BufferedImage): (Array[Float], Double) = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = new Array[Float](16)
    var total = 0.0
    var gy = 0
    while (gy < 4) {
      var gx = 0
      while (gx < 4) {
        val x0 = gx * w / 4; val x1 = math.max((gx + 1) * w / 4, x0 + 1)
        val y0 = gy * h / 4; val y1 = math.max((gy + 1) * h / 4, y0 + 1)
        var acc = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            acc += ((rgb >> 16) & 0xff) * 0.299 +
              ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
            x += 1
          }
          y += 1
        }
        val cell = acc / ((x1 - x0) * (y1 - y0))
        grid(gy * 4 + gx) = cell.toFloat
        total += cell
        gx += 1
      }
      gy += 1
    }
    (grid, total / 16.0)
  }

  def decodeImage(r: MediaRecord): ImageFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      catch { case _: Exception => null }
    if (img == null) {
      val fake = fakeDecode(r)
      ImageFeatures(r.media_id, decoded = false, -1, -1, fake.mean_byte, fake.feature)
    } else {
      val (grid, mean) = lumGrid(img)
      ImageFeatures(r.media_id, decoded = true, img.getWidth, img.getHeight, mean, grid)
    }
  }

  /** Batch image decode over the partition iterator (same lazy memory
    * profile as [[decodeAll]]).
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeImage))
  }

  /** REAL audio features for WAV/AIFF/AU — the JDK's `javax.sound.sampled`
    * parses those containers without native codecs: true sample rate,
    * channel count, frame count, duration, and RMS amplitude over the
    * 16-bit PCM samples (the loudness statistic an audio-quality filter
    * gates on). Compressed formats (mp3/ogg) have no JDK codec and fall
    * back to `decoded = false` with byte-derived stats, keeping the
    * pipeline total.
    */
  case class AudioFeatures(
      media_id: Long,
      decoded: Boolean,
      sample_rate: Double,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms: Double)

  def decodeAudio(r: MediaRecord): AudioFeatures = {
    import javax.sound.sampled.AudioSystem
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(r.content))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val durationMs =
        if (fmt.getFrameRate > 0) (frames * 1000L / fmt.getFrameRate.toLong) else 0L
      // RMS over 16-bit little/big-endian PCM; other sample widths fall
      // back to 0.0 (parsed container, unanalyzed payload)
      val rms =
        if (fmt.getSampleSizeInBits == 16) {
          val bytes = in.readAllBytes()
          var acc = 0.0
          var n = 0
          var i = 0
          while (i + 1 < bytes.length) {
            val s =
              if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            acc += s.toDouble * s.toDouble
            n += 1
            i += 2
          }
          if (n == 0) 0.0 else math.sqrt(acc / n) / 32768.0
        } else 0.0
      AudioFeatures(r.media_id, decoded = true,
        fmt.getSampleRate.toDouble, fmt.getChannels, frames, durationMs, rms)
    } catch {
      case _: Exception =>
        val fake = fakeDecode(r)
        AudioFeatures(r.media_id, decoded = false, -1.0, -1, -1L, -1L, fake.mean_byte / 255.0)
    }
  }

  /** Batch audio decode over the partition iterator. */
  def decodeAudios(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeAudio))
  }

  /** REAL video decode for MJPEG-in-AVI — the one container+codec combo
    * a bare JDK can fully decode: AVI is RIFF chunk framing (parsed here,
    * ~40 lines, no native code) and each MJPEG frame is a standalone
    * JPEG, which `javax.imageio` decodes. Emitted per video: true
    * dimensions, frame count, fps and duration from the `avih` header,
    * mean luminance over the sampled frames, and a motion statistic
    * (mean abs luminance-grid delta between consecutive sampled frames —
    * the static-clip filter a video-quality gate needs). Every other
    * codec (H.264 etc.) still falls back to `decoded = false` byte-stats:
    * those need ffmpeg-class decoders this container does not have.
    * `sampleEveryN` bounds decode cost per row — metadata comes from the
    * header; only every N-th frame's pixels are decoded.
    */
  case class VideoFeatures(
      media_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      n_frames: Long,
      fps: Double,
      duration_ms: Long,
      mean_lum: Double,
      motion: Double)

  /** Parsed AVI: (microSecPerFrame, totalFrames, width, height, frames) —
    * None when the bytes are not RIFF/AVI. Frames are the raw '00dc'/
    * '00db' chunk payloads in stream order (MJPEG: each one a JPEG).
    */
  private[operators] def parseAvi(bytes: Array[Byte]): Option[(Long, Long, Int, Int, Vector[Array[Byte]])] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var avih: Option[(Long, Long, Int, Int)] = None
    val frames = Vector.newBuilder[Array[Byte]]
    // chunk walk: LIST/RIFF bodies recurse (their first 4 bytes name the
    // list), leaf chunks are consumed; sizes exclude the 8-byte header
    // and data is padded to even offsets per the RIFF spec
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off)
        val size = u32(off + 4).toInt
        val dataStart = off + 8
        val dataEnd = math.min(dataStart + size, end)
        if (dataEnd < dataStart) return // corrupt size: stop this level
        id match {
          case "LIST" | "RIFF" => if (size >= 4) walk(dataStart + 4, dataEnd)
          // guard on the CLAMPED extent, not the declared size: a
          // truncated file can declare 40 bytes it doesn't have, and an
          // unclamped read would throw out of the whole task instead of
          // degrading to decoded=false
          case "avih" if size >= 40 && dataStart + 40 <= dataEnd =>
            avih = Some((u32(dataStart), u32(dataStart + 16),
              u32(dataStart + 32).toInt, u32(dataStart + 36).toInt))
          case s if s.length == 4 && (s.endsWith("dc") || s.endsWith("db")) =>
            frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          case _ => ()
        }
        off = dataStart + size + (size & 1) // even padding
      }
    }
    walk(12, bytes.length)
    avih.map { case (usPerFrame, total, w, h) => (usPerFrame, total, w, h, frames.result()) }
  }

  def decodeVideo(r: MediaRecord, sampleEveryN: Int = 1): VideoFeatures =
    parseAvi(r.content) match {
      case Some((usPerFrame, totalFrames, w, h, frames)) =>
        val sampled = frames.zipWithIndex
          .collect { case (f, i) if i % math.max(1, sampleEveryN) == 0 => f }
          .flatMap { f =>
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
            catch { case _: Exception => None }
          }
        val grids = sampled.map(lumGrid)
        val meanLum = if (grids.isEmpty) 0.0 else grids.map(_._2).sum / grids.size
        val motion =
          if (grids.size < 2) 0.0
          else grids.sliding(2).map { case Seq((a, _), (b, _)) =>
            a.zip(b).map { case (x, y) => math.abs(x - y).toDouble }.sum / 16.0
          }.sum / (grids.size - 1)
        val nFrames = if (totalFrames > 0) totalFrames else frames.size.toLong
        val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
        val durMs = if (usPerFrame > 0) nFrames * usPerFrame / 1000L else 0L
        VideoFeatures(r.media_id, decoded = true, w, h, nFrames, fps, durMs, meanLum, motion)
      case None =>
        val fake = fakeDecode(r)
        VideoFeatures(r.media_id, decoded = false, -1, -1, -1L, 0.0, -1L,
          fake.mean_byte, 0.0)
    }

  /** Batch video decode over the partition iterator. */
  def decodeVideos(media: Dataset[MediaRecord], sampleEveryN: Int = 1): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeVideo(_, sampleEveryN)))
  }

  /** One decoded frame of an MJPEG-AVI video row. */
  case class FrameFeatures(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      width: Int,
      height: Int,
      mean_lum: Double,
      grid: Array[Float])

  /** REAL frame extraction (the decode stage [[sampleFrames]]'s logical
    * explode points at): every `everyNth` frame of each MJPEG-AVI row is
    * decoded to its luminance grid — one row per sampled frame, directly
    * joinable to the [[Similarity]] operators for frame-level visual
    * dedup. Non-AVI rows contribute no frames (the totality story lives
    * on [[decodeVideo]]'s `decoded` flag).
    */
  def extractVideoFrames(media: Dataset[MediaRecord], everyNth: Int = 1): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      parseAvi(r.content).toSeq.flatMap { case (usPerFrame, _, _, _, frames) =>
        frames.zipWithIndex
          .collect { case (f, i) if i % math.max(1, everyNth) == 0 => (f, i) }
          .flatMap { case (f, i) =>
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
              .map { img =>
                val (grid, mean) = lumGrid(img)
                FrameFeatures(r.media_id, i, i * usPerFrame / 1000L,
                  img.getWidth, img.getHeight, mean, grid)
              }
            catch { case _: Exception => None }
          }
      }
    })
  }

  /** Repartition by byte budget: blobs are skewed, so partition count is
    * computed from total bytes, not rows.
    */
  def repartitionByBytes(media: Dataset[MediaRecord], targetBytesPerPartition: Long): Dataset[MediaRecord] = {
    val totalBytes = media.select(F.sum(F.length(F.col("content")))).head().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts)
  }

  /** Frame sampling for video rows: emit one logical frame row per
    * sampleEveryMs of duration (the explode is the real plumbing; frame
    * extraction itself would live in the decode stub).
    */
  def sampleFrames(media: DataFrame, sampleEveryMs: Long): DataFrame =
    media.filter(F.col("kind") === "video")
      .withColumn("frame_ts_ms",
        F.explode(F.sequence(F.lit(0L), F.col("duration_ms") - 1, F.lit(sampleEveryMs))))
      .select("media_id", "frame_ts_ms", "width", "height")

  /** Deterministic synthetic corpus (stands in for a real media table). */
  def syntheticCorpus(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRecord] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(rnd.nextInt(3))
      val len = 64 + rnd.nextInt(4096)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      MediaRecord(i.toLong, kind,
        Map("image" -> "image/jpeg", "audio" -> "audio/wav", "video" -> "video/mp4")(kind),
        width = 16 + rnd.nextInt(1024), height = 16 + rnd.nextInt(1024),
        duration_ms = if (kind == "video") 1000L + rnd.nextInt(60000) else 0L,
        content = bytes)
    }.toDS()
  }
}
