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

  test("the byte-histogram decoder is exact on a known payload") {
    val asset = graft.multimodal.MediaAsset(1L, "image", "t",
      Array[Byte](0, 0, 1, 2, 2, 2))
    val f = MediaDecoder.byteHistogram().decode(asset)
    assert(f.n_bytes == 6 && f.width == 3 && f.height == 2 && f.n_frames == 1)
  }
}
