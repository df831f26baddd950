package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.hashBucket

/** One media asset: opaque binary payload + typed metadata. */
case class MediaAsset(
    media_id: Long,
    media_type: String,
    source: String,
    payload: Array[Byte])

/** Decoded/extracted features for one asset. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Long,
    height: Long,
    n_frames: Long,
    checksum: String)

/** The decode seam: one instance per PARTITION (the factory runs inside
  * `mapPartitions`), so an implementation can hold expensive per-batch
  * state — a JNI codec context, an ONNX session, a reused digest — the
  * way a real image/audio decoder must. Implementations must be
  * deterministic per payload for the dedup/oracle contracts to hold. */
trait MediaDecoder {
  def decode(a: MediaAsset): MediaFeatures
}

object MediaDecoder {
  /** Serializable per-partition constructor shipped to executors. */
  type Factory = () => MediaDecoder

  /** Default: the oracle-able arithmetic stub (no codec libs in this
    * container) — dimensions derived from byte count, real MD5. */
  val stub: Factory = () => new MediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(a: MediaAsset): MediaFeatures = Manifest.decodeStub(a, md)
  }

  /** A trivial REAL decoder: actually reads every payload byte and emits
    * content-derived features (distinct byte values as "width", modal
    * byte as "height", 1 KiB chunks as "frames"). No codec value, but it
    * proves the seam carries a decoder that consumes payload CONTENT —
    * swapping in a JNI image decoder changes only this class. */
  /** A REAL image decoder over the JDK's built-in codecs (javax.imageio
    * ships PNG/JPEG/GIF/BMP readers with every JRE — zero added
    * dependencies): width/height are the actual decoded pixel dimensions,
    * n_frames is 1 for stills. Payloads ImageIO can't parse (this repo's
    * text stand-ins, truncated files, unsupported containers) fall back
    * to the arithmetic stub so the operator stays total over a mixed
    * crawl corpus — exactly the salvage-don't-fail behavior a real media
    * pipeline needs. */
  val imageIo: Factory = () => new MediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(a: MediaAsset): MediaFeatures = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) Manifest.decodeStub(a, md)
      else {
        md.reset()
        MediaFeatures(
          media_id = a.media_id,
          media_type = a.media_type,
          n_bytes = a.payload.length.toLong,
          width = img.getWidth.toLong,
          height = img.getHeight.toLong,
          n_frames = 1L,
          checksum = md.digest(a.payload).map("%02x".format(_)).mkString)
      }
    }
  }

  /** A REAL audio decoder over the JDK's built-in WAV reader
    * (javax.sound.sampled ships a RIFF/WAVE PCM parser with every JRE —
    * zero added dependencies, the audio twin of [[imageIo]]): width is
    * the actual sample rate in Hz, height the channel count, n_frames
    * the PCM frame count from the decoded header. Payloads AudioSystem
    * can't parse (this repo's text stand-ins, truncated RIFF, compressed
    * codecs) fall back to the arithmetic stub — the same
    * salvage-don't-fail contract as the image path. */
  val wavPcm: Factory = () => new MediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(a: MediaAsset): MediaFeatures = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException => null
        }
      if (in == null) Manifest.decodeStub(a, md)
      else {
        val fmt = in.getFormat
        val frameLen = in.getFrameLength
        try in.close() catch { case _: java.io.IOException => }
        val rate = fmt.getSampleRate
        // AudioSystem returns NOT_SPECIFIED (-1) for parseable streams
        // of unknown length / rate, and exotic formats may carry a
        // fractional sample rate that .toLong would silently truncate —
        // both take the documented salvage path instead of emitting
        // n_frames=-1 or a lying width.
        if (frameLen < 0L || rate <= 0f || rate != math.floor(rate.toDouble).toFloat)
          Manifest.decodeStub(a, md)
        else {
          md.reset()
          MediaFeatures(
            media_id = a.media_id,
            media_type = a.media_type,
            n_bytes = a.payload.length.toLong,
            width = rate.toLong,
            height = fmt.getChannels.toLong,
            n_frames = frameLen,
            checksum = md.digest(a.payload).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  val byteHistogram: Factory = () => new MediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private val hist = new Array[Long](256)
    def decode(a: MediaAsset): MediaFeatures = {
      java.util.Arrays.fill(hist, 0L)
      var i = 0
      while (i < a.payload.length) { hist(a.payload(i) & 0xff) += 1; i += 1 }
      var distinct = 0L; var modal = 0; var best = -1L
      var b = 0
      while (b < 256) {
        if (hist(b) > 0) distinct += 1
        if (hist(b) > best) { best = hist(b); modal = b }
        b += 1
      }
      md.reset()
      MediaFeatures(
        media_id = a.media_id,
        media_type = a.media_type,
        n_bytes = a.payload.length.toLong,
        width = distinct,
        height = modal.toLong,
        n_frames = (a.payload.length.toLong + 1023L) / 1024L,
        checksum = md.digest(a.payload).map("%02x".format(_)).mkString)
    }
  }
}

/** mm_manifest: multimodal binary-column plumbing.
  *
  * Real media decode needs codec libraries this container doesn't ship, so
  * the decode kernel is a STUB (deterministic fake dimensions derived from
  * the byte stream — see [[Manifest.decodeStub]]); everything around it is
  * the real 100 TB plumbing: an opaque `binary` payload column, typed
  * metadata, and a partition-preserving batched decode pass
  * (`mapPartitions` over `Dataset[MediaAsset]` — per-partition expensive
  * state like a real decoder/codec context is allocated once per batch,
  * the idiom a JNI image decoder or an ONNX feature extractor would use).
  *
  * Scale shape: shuffle-free — scan → narrow decode map → projection. The
  * payload column never moves through a shuffle; at 100 TB the decode
  * stage's parallelism is the scan's partition count
  * (spark.sql.files.maxPartitionBytes-bounded).
  */
object Manifest {

  /** Builds the manifest over `documents`: each doc's UTF-8 bytes stand in
    * for a media blob; media_type is an md5-bucket pick so all three
    * modalities appear. */
  def manifest(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (hashBucket(col("text"), 3) + 1).cast("int")).as("media_type"),
      col("source"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: a real implementation would hand `payload` to an image/
    * audio/video decoder; here the "decoded" dimensions are deterministic
    * functions of the byte stream so the oracle can verify the plumbing
    * end-to-end. */
  def decodeStub(a: MediaAsset, md: java.security.MessageDigest): MediaFeatures = {
    val n = a.payload.length.toLong
    md.reset()
    val checksum = md.digest(a.payload).map("%02x".format(_)).mkString
    MediaFeatures(
      media_id = a.media_id,
      media_type = a.media_type,
      n_bytes = n,
      width = 64L + n % 1857L,
      height = 64L + (n * 7L) % 1017L,
      n_frames = if (a.media_type == "video") 1L + n % 240L else 1L,
      checksum = checksum)
  }

  /** Batched decode over an arbitrary asset set — the public entry a user
    * with real media files calls (read payloads with spark.read.format
    * ("binaryFile") or from a parquet blob column, map to [[MediaAsset]],
    * pick a decoder). The factory runs once per partition inside
    * `mapPartitions`, so per-batch codec state amortizes over the whole
    * batch; the pass is narrow (no shuffle). */
  def decodeAssets(spark: SparkSession,
      assets: org.apache.spark.sql.Dataset[MediaAsset],
      decoder: MediaDecoder.Factory): DataFrame = {
    import spark.implicits._
    assets.mapPartitions { it =>
      val d = decoder()
      it.map(d.decode)
    }.toDF()
  }

  /** [[decodeAssets]] over the documents-derived manifest (shared by
    * manifest + frames). */
  private def decoded(spark: SparkSession, sfDir: String,
      decoder: MediaDecoder.Factory = MediaDecoder.stub): DataFrame = {
    import spark.implicits._
    decodeAssets(spark, manifest(spark, sfDir).as[MediaAsset], decoder)
  }

  /** The feature-extraction pass: batched decode over the manifest. */
  def mmManifest(spark: SparkSession, sfDir: String): DataFrame =
    decoded(spark, sfDir).orderBy(col("media_id"))

  /** [[mmManifest]] with a caller-chosen decoder — the seam a real
    * pipeline uses to swap the stub for an actual codec. */
  def mmManifestWith(spark: SparkSession, sfDir: String,
      decoder: MediaDecoder.Factory): DataFrame =
    decoded(spark, sfDir, decoder).orderBy(col("media_id"))

  /** mm_frames: frame sampling for video assets — one row per sampled
    * frame (every 24th index ≈ 1/s at 24 fps) with a deterministic stub
    * luma standing in for the decoded frame feature. Shuffle-free explode
    * fan-out: scan → decode → filter(video) → explode(frame sequence);
    * output bounded by n_frames/24 per asset. */
  def mmFrames(spark: SparkSession, sfDir: String): DataFrame =
    decoded(spark, sfDir)
      .filter(col("media_type") === "video")
      .select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(24L))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr("frame_idx * 1000 div 24").as("t_offset_ms"),
        expr("(n_bytes * 7 + frame_idx * 13) % 256").as("luma"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** mm_audio_windows: fixed 1-second analysis windows over audio assets —
    * one row per window with a stub duration (derived from the byte
    * stream; a real decoder would read the container header) and a stub
    * RMS energy standing in for the decoded feature. Same shuffle-free
    * explode fan-out as mm_frames; the final ragged window is truncated
    * to the remaining duration. */
  def mmAudioWindows(spark: SparkSession, sfDir: String): DataFrame =
    decoded(spark, sfDir)
      .filter(col("media_type") === "audio")
      .withColumn("duration_ms", expr("100L + (n_bytes * 3L) % 30000L"))
      .select(col("media_id"), col("n_bytes"), col("duration_ms"),
        explode(sequence(lit(0L), expr("(duration_ms - 1L) div 1000L"), lit(1L))).as("win_idx"))
      .select(col("media_id"), col("win_idx"),
        expr("least(duration_ms - win_idx * 1000L, 1000L)").as("win_ms"),
        expr("(n_bytes * 11L + win_idx * 17L) % 1000L").as("energy"))
      .orderBy(col("media_id"), col("win_idx"))

  /** One REAL analysis window of decoded audio: fixed 1-second windows
    * (ragged final), RMS energy in raw 16-bit sample units. */
  case class AudioWindow(media_id: Long, win_idx: Long, win_ms: Long, energy: Long)

  /** Decodes a WAV payload to 16-bit PCM and emits per-1-second-window
    * RMS energy — the REAL feature [[mmAudioWindows]]' arithmetic stub
    * stands in for. Returns empty for payloads AudioSystem can't parse
    * or non-16-bit encodings (a real pipeline filters, not fails).
    * Deterministic per payload: integer sums, one IEEE sqrt floored. */
  private[multimodal] def wavWindows(a: MediaAsset): Seq[AudioWindow] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => null
      }
    if (in == null) return Seq.empty
    val fmt = in.getFormat
    if (fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      return Seq.empty
    val bytes = in.readAllBytes()
    in.close()
    val ch = fmt.getChannels
    val sr = fmt.getSampleRate.toInt // PCM frames per second = window size
    // AudioSystem's WAV reader validates channels/bits but NOT the
    // declared sample rate — a corrupt header with rate 0 would reach
    // the window division below; salvage, don't fail.
    if (sr <= 0) return Seq.empty
    val bytesPerFrame = fmt.getFrameSize
    val nFrames = bytes.length / bytesPerFrame
    val big = fmt.isBigEndian
    @inline def sample(frame: Int, c: Int): Long = {
      val o = frame * bytesPerFrame + c * 2
      val s =
        if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
        else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
      s.toLong
    }
    (0 until (nFrames + sr - 1) / sr).map { w =>
      val from = w * sr
      val until = math.min(from + sr, nFrames)
      var sumSq = 0L
      var f = from
      while (f < until) {
        var c = 0
        while (c < ch) { val s = sample(f, c); sumSq += s * s; c += 1 }
        f += 1
      }
      val n = (until - from).toLong * ch
      AudioWindow(a.media_id, w.toLong,
        (until - from).toLong * 1000L / sr,
        if (n == 0) 0L else math.sqrt(sumSq.toDouble / n).toLong)
    }
  }

  /** [[mmAudioWindows]] over REAL WAV payloads: same output shape
    * (media_id, win_idx, win_ms, energy), energy computed from decoded
    * PCM instead of the byte-count stub. Same shuffle-free scale shape —
    * mapPartitions flat-map, payloads never shuffle; the decode is
    * per-partition batched exactly like [[decodeAssets]]. */
  def audioWindowsWav(spark: SparkSession,
      assets: org.apache.spark.sql.Dataset[MediaAsset]): DataFrame = {
    import spark.implicits._
    assets.mapPartitions(_.flatMap(wavWindows)).toDF()
      .orderBy(col("media_id"), col("win_idx"))
  }

  /** mm_dedup: exact multimodal dedup — identical payload BYTES collapse
    * on the decode checksum (content-addressable dedup, the first pass
    * of media corpus curation: byte-identical assets re-crawled under
    * different URLs are the dominant dup class at crawl scale). One
    * map-side-combinable shuffle on the 32-char checksum; the binary
    * payloads themselves never move through the shuffle. */
  def mmDedup(spark: SparkSession, sfDir: String): DataFrame =
    decoded(spark, sfDir)
      .groupBy(col("checksum"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_assets"))
      .orderBy(col("keep_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_manifest"      -> (mmManifest _),
    "mm_frames"        -> (mmFrames _),
    "mm_audio_windows" -> (mmAudioWindows _),
    "mm_dedup"         -> (mmDedup _))

  /** The stub decode is arithmetic over byte counts, so unlike real codec
    * output it IS mirrorable — a full-strength oracle instead of the
    * rows-only check the brief allows. strlen() is DuckDB's byte length;
    * md5 of the text is the md5 of its UTF-8 bytes on both engines. */
  val oracle: Map[String, String] = Map(
    "mm_manifest" -> {
      val bucketSql = graft.functions.TextFunctions.hashBucketSql("text", 3)
      s"""SELECT doc_id AS media_id,
         |  ['image', 'audio', 'video'][($bucketSql) + 1] AS media_type,
         |  CAST(strlen(text) AS BIGINT) AS n_bytes,
         |  64 + strlen(text) % 1857 AS width,
         |  64 + (strlen(text) * 7) % 1017 AS height,
         |  CASE WHEN ['image', 'audio', 'video'][($bucketSql) + 1] = 'video'
         |    THEN 1 + strlen(text) % 240 ELSE 1 END AS n_frames,
         |  md5(text) AS checksum
         |FROM documents ORDER BY media_id""".stripMargin
    },
    "mm_frames" -> {
      val bucketSql = graft.functions.TextFunctions.hashBucketSql("text", 3)
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
         |    1 + strlen(text) % 240 AS n_frames
         |  FROM documents
         |  WHERE ['image', 'audio', 'video'][($bucketSql) + 1] = 'video')
         |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |  CAST(frame_idx * 1000 // 24 AS BIGINT) AS t_offset_ms,
         |  CAST((n_bytes * 7 + frame_idx * 13) % 256 AS BIGINT) AS luma
         |FROM (SELECT media_id, n_bytes, unnest(range(0, n_frames, 24)) AS frame_idx FROM v)
         |ORDER BY media_id, frame_idx""".stripMargin
    },
    "mm_audio_windows" -> {
      val bucketSql = graft.functions.TextFunctions.hashBucketSql("text", 3)
      s"""WITH a AS (
         |  SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
         |    100 + (strlen(text) * 3) % 30000 AS duration_ms
         |  FROM documents
         |  WHERE ['image', 'audio', 'video'][($bucketSql) + 1] = 'audio')
         |SELECT media_id, CAST(win_idx AS BIGINT) AS win_idx,
         |  CAST(LEAST(duration_ms - win_idx * 1000, 1000) AS BIGINT) AS win_ms,
         |  CAST((n_bytes * 11 + win_idx * 17) % 1000 AS BIGINT) AS energy
         |FROM (SELECT media_id, n_bytes, duration_ms,
         |    unnest(range(0, (duration_ms - 1) // 1000 + 1, 1)) AS win_idx FROM a)
         |ORDER BY media_id, win_idx""".stripMargin
    },
    "mm_dedup" ->
      """SELECT md5(text) AS checksum,
        |  min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_assets
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin)
}
