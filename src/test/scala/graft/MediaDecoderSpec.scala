package graft

import graft.multimodal.{Manifest, MediaDecoder}

/** The multimodal decode seam: mm_manifest's default decoder is the
  * oracle-able arithmetic stub, but the plumbing must carry a REAL
  * decoder — one that consumes payload content — without any change
  * outside the decoder class. byteHistogram is that decoder here
  * (actual per-byte scan; a JNI image codec slots into the same seam).
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

  test("the byte-histogram decoder is exact on a known payload") {
    val asset = graft.multimodal.MediaAsset(1L, "image", "t",
      Array[Byte](0, 0, 1, 2, 2, 2))
    val f = MediaDecoder.byteHistogram().decode(asset)
    assert(f.n_bytes == 6 && f.width == 3 && f.height == 2 && f.n_frames == 1)
  }
}
