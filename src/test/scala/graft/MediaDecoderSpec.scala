package graft

import graft.multimodal.{Manifest, MediaDecoder}

/** The multimodal decode seam: mm_manifest's default decoder is the
  * oracle-able arithmetic stub, but the plumbing must carry a REAL
  * decoder — one that consumes payload content — without any change
  * outside the decoder class. Two real decoders prove it: byteHistogram
  * (actual per-byte scan) and imageIo (the JDK's PNG/JPEG codec decoding
  * true pixel dimensions, with stub fallback for undecodable payloads).
  */
class MediaDecoderSpec extends SparkSpec {

  test("mm_manifest runs end-to-end with a real content-consuming decoder") {
    val rows = Manifest.mmManifestWith(spark, sfDir, MediaDecoder.byteHistogram)
      .collect()
    assert(rows.nonEmpty)
    // content-derived invariants of a true byte scan
    for (r <- rows) {
      val nBytes = r.getAs[Long]("n_bytes")
      val width = r.getAs[Long]("width")   // distinct byte values
      val height = r.getAs[Long]("height") // modal byte value
      val frames = r.getAs[Long]("n_frames")
      assert(width >= 1 && width <= 256 && width <= nBytes)
      assert(height >= 0 && height <= 255)
      assert(frames == (nBytes + 1023) / 1024)
    }
  }

  test("stub and real decoder agree on the content-addressed identity") {
    // checksum is the dedup key: any decoder must preserve it, so
    // mm_dedup's semantics don't depend on which decoder is plugged in.
    val stub = Manifest.mmManifest(spark, sfDir)
      .select("media_id", "checksum").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val real = Manifest.mmManifestWith(spark, sfDir, MediaDecoder.byteHistogram)
      .select("media_id", "checksum").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stub == real)
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNGs decode to their true pixel dimensions through the seam") {
    import spark.implicits._
    val dims = Seq((640, 480), (1, 1), (300, 200))
    val assets = dims.zipWithIndex.map { case ((w, h), i) =>
      graft.multimodal.MediaAsset(i.toLong, "image", "test", pngBytes(w, h))
    } :+ graft.multimodal.MediaAsset(99L, "image", "test",
      "not an image at all".getBytes("UTF-8"))
    val got = Manifest
      .decodeAssets(spark, spark.createDataset(assets), MediaDecoder.imageIo)
      .collect().map(r =>
        r.getAs[Long]("media_id") ->
          ((r.getAs[Long]("width"), r.getAs[Long]("height")))).toMap
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      assert(got(i.toLong) == ((w.toLong, h.toLong)),
        s"asset $i decoded ${got(i.toLong)}, want ($w, $h)")
    }
    // the undecodable payload salvages through the stub instead of failing
    val n = "not an image at all".getBytes("UTF-8").length.toLong
    assert(got(99L) == ((64L + n % 1857L, 64L + (n * 7L) % 1017L)))
  }

  /** PCM_SIGNED 16-bit little-endian mono WAV with the given samples. */
  private def wavBytes(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      samples.length.toLong / channels)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAVs decode to their true header facts through the seam") {
    import spark.implicits._
    // 2.5 s of mono audio at 8 kHz, and a stereo asset at 4 kHz
    val assets = Seq(
      graft.multimodal.MediaAsset(1L, "audio", "test",
        wavBytes(new Array[Short](20000), 8000)),
      graft.multimodal.MediaAsset(2L, "audio", "test",
        wavBytes(new Array[Short](8000), 4000, channels = 2)),
      graft.multimodal.MediaAsset(99L, "audio", "test",
        "not audio either".getBytes("UTF-8")))
    val got = Manifest
      .decodeAssets(spark, spark.createDataset(assets), MediaDecoder.wavPcm)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("n_frames")))).toMap
    assert(got(1L) == ((8000L, 1L, 20000L)))
    assert(got(2L) == ((4000L, 2L, 4000L)))
    // the undecodable payload salvages through the stub instead of failing
    val n = "not audio either".getBytes("UTF-8").length.toLong
    assert(got(99L)._1 == 64L + n % 1857L)
  }

  test("WAV PCM window energy: silence, a known square wave, ragged tail") {
    import spark.implicits._
    // 1.5 s at 1 kHz mono: first second a +-1000 square wave
    // (RMS exactly 1000), final ragged 0.5 s window silent (RMS 0).
    val samples = Array.tabulate[Short](1500) { i =>
      if (i < 1000) (if (i % 2 == 0) 1000 else -1000).toShort else 0.toShort
    }
    val assets = Seq(
      graft.multimodal.MediaAsset(7L, "audio", "t", wavBytes(samples, 1000)))
    val rows = Manifest
      .audioWindowsWav(spark, spark.createDataset(assets))
      .select("media_id", "win_idx", "win_ms", "energy")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((7L, 0L, 1000L, 1000L), (7L, 1L, 500L, 0L)),
      s"got $rows")
  }

  test("stub and WAV decoder agree on the content-addressed identity") {
    val wav = wavBytes(Array.tabulate[Short](100)(i => (i * 3).toShort), 100)
    val a = graft.multimodal.MediaAsset(1L, "audio", "t", wav)
    assert(MediaDecoder.wavPcm().decode(a).checksum ==
      MediaDecoder.stub().decode(a).checksum)
  }

  test("the byte-histogram decoder is exact on a known payload") {
    val asset = graft.multimodal.MediaAsset(1L, "image", "t",
      Array[Byte](0, 0, 1, 2, 2, 2))
    val f = MediaDecoder.byteHistogram().decode(asset)
    assert(f.n_bytes == 6 && f.width == 3 && f.height == 2 && f.n_frames == 1)
  }
}
