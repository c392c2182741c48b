package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.runtime.GraftSession
    .builder("graft-test", "8").getOrCreate()

  lazy val corpus = Multimodal.syntheticCorpus(spark, 200).cache()

  test("media schema carries binary content + typed metadata") {
    val sch = corpus.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("duration_ms").dataType.typeName == "long")
    assert(corpus.count() == 200)
  }

  test("batch decode is deterministic and preserves ids 1:1") {
    val f1 = Multimodal.decodeAll(corpus).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeAll(corpus).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.length == 200)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
  }

  test("byte-budget repartitioning tracks blob volume, not row count") {
    val re = Multimodal.repartitionByBytes(corpus, targetBytesPerPartition = 64 * 1024)
    val parts = re.rdd.getNumPartitions
    assert(parts > 1, s"expected multiple partitions, got $parts")
    assert(re.count() == 200)
  }

  test("frame sampling explodes videos only, at the sample cadence") {
    val frames = Multimodal.sampleFrames(corpus.toDF(), sampleEveryMs = 1000)
    val videos = corpus.filter(F.col("kind") === "video").collect()
    val expected = videos.map(v => 1 + (v.duration_ms - 1) / 1000).sum
    assert(frames.count() == expected)
    assert(frames.select("media_id").distinct().count() == videos.length)
  }

  test("decodeImage reads real PNG pixels: dimensions, luminance grid, fallback") {
    import spark.implicits._
    // left half black, right half white — encoded through the real codec
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", "image/png", 0, 0, 0L, png(32, 16)),
      Multimodal.MediaRecord(2L, "image", "image/png", 0, 0, 0L, Array[Byte](1, 2, 3)))
      .toDS()
    val out = Multimodal.decodeImages(media).collect().map(f => f.media_id -> f).toMap

    val ok = out(1L)
    assert(ok.decoded)
    assert(ok.width == 32 && ok.height == 16) // true decoded dims, not metadata
    // grid columns 0-1 sit in the black half, 2-3 in the white half
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val cell = ok.grid(gy * 4 + gx)
      if (gx < 2) assert(cell < 1.0, s"black cell ($gx,$gy) read $cell")
      else assert(cell > 254.0, s"white cell ($gx,$gy) read $cell")
    }
    assert(math.abs(ok.mean_lum - 127.5) < 1.0)

    val bad = out(2L)
    assert(!bad.decoded && bad.width == -1) // fell back, pipeline stays total
  }

  test("decodeAudio reads real WAV PCM: rate, frames, duration, sine RMS") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 1 s mono 8 kHz 16-bit sine at half amplitude -> RMS = 0.5/sqrt(2)
    val rate = 8000
    val pcm = new Array[Byte](rate * 2)
    for (i <- 0 until rate) {
      val s = (math.sin(2 * math.Pi * 440.0 * i / rate) * 0.5 * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, rate.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", "audio/wav", 0, 0, 0L, baos.toByteArray),
      Multimodal.MediaRecord(2L, "audio", "audio/mpeg", 0, 0, 0L, Array[Byte](9, 9, 9)))
      .toDS()
    val out = Multimodal.decodeAudios(media).collect().map(f => f.media_id -> f).toMap

    val ok = out(1L)
    assert(ok.decoded)
    assert(ok.sample_rate == 8000.0 && ok.channels == 1)
    assert(ok.n_frames == rate && ok.duration_ms == 1000L)
    assert(math.abs(ok.rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms = ${ok.rms}")

    val bad = out(2L)
    assert(!bad.decoded && bad.sample_rate == -1.0) // no JDK mp3 codec: fallback
  }

  test("decodeVideo reads a real MJPEG-AVI: header metadata, luminance, motion, frames") {
    import spark.implicits._
    def jpegFrame(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (shade << 16) | (shade << 8) | shade
      for (y <- 0 until 16; x <- 0 until 32) img.setRGB(x, y, rgb)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    // assemble a minimal but spec-shaped AVI: RIFF('AVI ') > LIST(hdrl) >
    // avih, then LIST(movi) > one '00dc' JPEG chunk per frame (RIFF
    // little-endian sizes, chunks padded to even offsets)
    def avi(frames: Seq[Array[Byte]], usPerFrame: Int, w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def chunk(id: String, data: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(id.getBytes("US-ASCII")); b.write(u32(data.length)); b.write(data)
        if (data.length % 2 == 1) b.write(0)
        b.toByteArray
      }
      val avihData = new java.io.ByteArrayOutputStream()
      avihData.write(u32(usPerFrame)); avihData.write(u32(0)); avihData.write(u32(0))
      avihData.write(u32(0)); avihData.write(u32(frames.size)); avihData.write(u32(0))
      avihData.write(u32(1)); avihData.write(u32(0)); avihData.write(u32(w))
      avihData.write(u32(h)); (0 until 4).foreach(_ => avihData.write(u32(0)))
      val hdrl = "hdrl".getBytes("US-ASCII") ++ chunk("avih", avihData.toByteArray)
      val movi = "movi".getBytes("US-ASCII") ++
        frames.flatMap(f => chunk("00dc", f)).toArray
      val body = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", hdrl) ++ chunk("LIST", movi)
      out.write("RIFF".getBytes("US-ASCII")); out.write(u32(body.length)); out.write(body)
      out.toByteArray
    }

    // 4 frames, alternating dark/bright — real motion between every pair
    val bytes = avi(Seq(jpegFrame(10), jpegFrame(240), jpegFrame(10), jpegFrame(240)),
      usPerFrame = 40000, w = 32, h = 16) // 25 fps
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", "video/x-msvideo", 0, 0, 0L, bytes),
      Multimodal.MediaRecord(2L, "video", "video/mp4", 0, 0, 0L, Array[Byte](9, 9, 9)))
      .toDS()
    val out = Multimodal.decodeVideos(media).collect().map(f => f.media_id -> f).toMap

    val v = out(1L)
    assert(v.decoded)
    assert(v.width == 32 && v.height == 16 && v.n_frames == 4)
    assert(math.abs(v.fps - 25.0) < 1e-9 && v.duration_ms == 160L)
    // alternating ~10/~240 shades: mean ≈ 125, per-step motion ≈ 230
    assert(math.abs(v.mean_lum - 125.0) < 15.0, s"mean_lum ${v.mean_lum}")
    assert(v.motion > 180.0, s"motion ${v.motion}")
    assert(!out(2L).decoded) // non-AVI falls back, pipeline stays total

    // frame extraction: every 2nd frame → indices 0 and 2, real pixels
    val frames = Multimodal.extractVideoFrames(media, everyNth = 2).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(f => (f.media_id, f.frame_idx, f.ts_ms)).toSeq ==
      Seq((1L, 0, 0L), (1L, 2, 80L)))
    frames.foreach { f =>
      assert(f.width == 32 && f.height == 16)
      assert(f.mean_lum < 30.0, s"sampled frames are the dark ones: ${f.mean_lum}")
    }

    // a static clip (same frame repeated) reads ~zero motion
    val still = avi(Seq(jpegFrame(100), jpegFrame(100), jpegFrame(100)), 40000, 32, 16)
    val sv = Multimodal.decodeVideo(
      Multimodal.MediaRecord(3L, "video", "video/x-msvideo", 0, 0, 0L, still))
    assert(sv.decoded && sv.motion < 1.0, s"static clip motion ${sv.motion}")

    // a TRUNCATED avi — declared avih size survives but the bytes end
    // mid-header — must degrade to decoded=false, not throw out of the
    // task (a crawled corpus always contains cut-off files)
    val full = avi(Seq(jpegFrame(100)), 40000, 32, 16)
    val headerStart = {
      // find 'avih' and cut inside its 40-byte payload
      val idx = full.indexOfSlice("avih".getBytes("US-ASCII"))
      assert(idx > 0, "fixture must contain an avih chunk")
      idx + 8 + 20
    }
    val truncated = java.util.Arrays.copyOfRange(full, 0, headerStart)
    val tv = Multimodal.decodeVideo(
      Multimodal.MediaRecord(4L, "video", "video/x-msvideo", 0, 0, 0L, truncated))
    assert(!tv.decoded, "truncated avih must fall back, not crash")
  }

  test("visual near-dup: decoded grid embeddings feed the similarity operators directly") {
    import spark.implicits._
    def noisePng(seed: Int, flipOnePixel: Boolean): Array[Byte] = {
      val r = new java.util.Random(seed)
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, r.nextInt(0xffffff))
      if (flipOnePixel) img.setRGB(0, 0, 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", "image/png", 0, 0, 0L, noisePng(7, flipOnePixel = false)),
      Multimodal.MediaRecord(2L, "image", "image/png", 0, 0, 0L, noisePng(7, flipOnePixel = true)),
      Multimodal.MediaRecord(3L, "image", "image/png", 0, 0, 0L, noisePng(99, flipOnePixel = false)))
      .toDS()
    val vecs = Multimodal.decodeImages(media)
      .map(f => (f.media_id, f.grid.toSeq))
      .toDF("vec_id", "embedding")
    val top = graft.operators.Similarity.cosineTopK(vecs, "vec_id", "embedding", 1L, 2)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos_sim"))
    // the one-pixel variant must rank first, essentially identical
    assert(top.head._1 == 2L, s"got $top")
    assert(top.head._2 > 0.999)
    assert(top.head._2 > top(1)._2)
  }
}
