package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.Multimodal

/** Real-decode contract for the Multimodal operators (VERDICT r4 item 2):
  * ImageIoCodec must decode actual image bytes — PNGs generated in-memory
  * with the same public javax.imageio API — through the identical
  * mapPartitions plumbing the fixture codec uses. FakeDecoder remains the
  * default so the q40/q93 SQL oracles (which mirror its arithmetic over the
  * text-as-bytes corpus) are untouched. */
class MultimodalCodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("multimodal-codec-spec", cores = 4)

  override def afterAll(): Unit = spark.stop()

  /** Encode a solid-color width x height PNG to bytes. */
  private def solidPng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Media table of three decodable PNGs plus one corrupt payload, in the
    * same (doc_id, content, meta) shape mediaTable produces. */
  private lazy val pngMedia: DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (1L, solidPng(16, 12, 0xff0000), "image/png"), // solid red
      (2L, solidPng(7, 5, 0x00ff00), "image/png"),   // solid green
      (3L, solidPng(32, 32, 0x4080c0), "image/png"), // mid-tone blue-gray
      (4L, Array[Byte](1, 2, 3, 4, 5), "image/png")  // not an image
    )
    rows.toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).as("n_bytes"),
          lit("fixture").as("origin")).as("meta"))
  }

  test("ImageIoCodec decodes real PNG dimensions and channel means") {
    val feats = Multimodal.extractFeatures(spark, pngMedia,
        codec = Multimodal.ImageIoCodec)
      .collect().map(f => f.doc_id -> f).toMap

    assert(feats(1L).width == 16 && feats(1L).height == 12)
    assert(feats(2L).width == 7 && feats(2L).height == 5)
    assert(feats(3L).width == 32 && feats(3L).height == 32)

    // solid red: mean R == 1.0, mean G == mean B == 0, luma == 0.299
    val red = feats(1L).feature
    assert(math.abs(red(0) - 1f) < 1e-6 && red(1) == 0f && red(2) == 0f)
    assert(math.abs(red(3) - 0.299f) < 1e-4)
    // solid 0x4080c0: means are 0x40/255, 0x80/255, 0xc0/255
    val mix = feats(3L).feature
    assert(math.abs(mix(0) - 0x40 / 255f) < 1e-6)
    assert(math.abs(mix(1) - 0x80 / 255f) < 1e-6)
    assert(math.abs(mix(2) - 0xc0 / 255f) < 1e-6)
  }

  test("undecodable payloads yield the -1 sentinel, not an exception") {
    val feats = Multimodal.extractFeatures(spark, pngMedia,
        codec = Multimodal.ImageIoCodec)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(4L).width == -1 && feats(4L).height == -1)
    assert(feats(4L).feature.isEmpty)
    assert(feats(4L).n_bytes == 5) // raw length still reported
  }

  test("ImageIoCodec resample produces real resized-pixel checksums") {
    val resized = Multimodal.resize(spark, pngMedia, width = 4, height = 4,
        codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.doc_id -> r).toMap

    // solid color survives any resample: every output pixel has the source
    // luma, so checksum == 16 * floor(luma)
    val redLuma = (0.299 * 0xff).toLong // 76
    assert(resized(1L).checksum == 16 * redLuma,
      s"solid-red 4x4 resample checksum ${resized(1L).checksum}")
    assert(resized(1L).width == 4 && resized(1L).height == 4)
    assert(resized(4L).width == -1 && resized(4L).checksum == -1L)
  }

  /** Encode a mono PCM16 WAV of a pure sine at `hz`, amplitude `amp`. */
  private def sineWav(hz: Double, seconds: Double, sampleRate: Int = 8000,
                      amp: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (amp * math.sin(2 * math.Pi * hz * i / sampleRate) * 32767).toInt
      pcm(i * 2) = (s & 0xff).toByte       // little-endian lo
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Left-half black / right-half white PNG — a pattern whose 8x8 aHash is
    * scale-invariant when the split lands on the grid (sizes % 8 == 0). */
  private def halfPng(size: Int): Array[Byte] = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        img.setRGB(x, y, if (x < size / 2) 0x000000 else 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoCodec aHash: scale-invariant on pattern, 0 on flat, sentinel on corrupt") {
    def ph(bytes: Array[Byte]) =
      Multimodal.ImageIoCodec.perceptualHash(Multimodal.MediaRow(0L, bytes, "image/png"))
    val small = ph(halfPng(16))
    val large = ph(halfPng(64))
    assert((small.ph_hi, small.ph_lo) == (large.ph_hi, large.ph_lo),
      "same pattern at 16x16 and 64x64 must hash identically")
    assert(small.ph_lo != 0L || small.ph_hi != 0L, "pattern must set bits")
    val flat = ph(solidPng(16, 16, 0x808080))
    assert((flat.ph_hi, flat.ph_lo) == (0L, 0L),
      "flat image: no sample strictly above mean")
    val bad = ph(Array[Byte](9, 9, 9))
    assert((bad.ph_hi, bad.ph_lo) == (-1L, -1L))
  }

  test("banded phash near-dup pairs == brute-force hamming join") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val media = Multimodal.mediaTable(docs)
    val hs = Multimodal.perceptualHashes(spark, media).collect()
    val brute = (for {
      a <- hs; b <- hs if a.doc_id < b.doc_id
      h = java.lang.Long.bitCount(a.ph_lo ^ b.ph_lo) +
        java.lang.Long.bitCount(a.ph_hi ^ b.ph_hi)
      if h <= 3
    } yield (a.doc_id, b.doc_id, h)).toSet
    val banded = Multimodal.phashNearDupPairs(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"pigeonhole banding must be complete: missing ${brute.diff(banded)}, extra ${banded.diff(brute)}")
    assert(brute.nonEmpty, "fixture corpus should contain phash near-dups")
  }

  test("phash near-dup pairs: corrupt images never pair under a real codec") {
    import spark.implicits._
    // Two undecodable blobs share the (-1,-1) sentinel hash — they must NOT
    // surface as hamming-0 near-duplicates; the identical valid pair must.
    val media = Seq(
      (1L, halfPng(16), "image/png"),
      (2L, halfPng(64), "image/png"), // same pattern → same aHash as doc 1
      (3L, Array[Byte](9, 9, 9), "image/png"),
      (4L, Array[Byte](8, 8, 8), "image/png")
    ).toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).as("n_bytes"),
          lit("fixture").as("origin")).as("meta"))
    val pairs = Multimodal.phashNearDupPairs(spark, media,
        codec = Multimodal.ImageIoCodec).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"sentinel hashes must be excluded from banding, got $pairs")
  }

  test("WavCodec decodes real WAV audio: rate, samples, rms, zcr, peak") {
    import spark.implicits._
    val media = Seq(
      (1L, sineWav(440.0, 1.0), "audio/wav"),
      (2L, sineWav(100.0, 0.5, amp = 0.9), "audio/wav"),
      (3L, Array[Byte](9, 9, 9), "audio/wav") // not audio
    ).toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).as("n_bytes"),
          lit("fixture").as("origin")).as("meta"))
    val f = Multimodal.extractAudioFeatures(spark, media)
      .collect().map(a => a.doc_id -> a).toMap

    assert(f(1L).sample_rate == 8000 && f(1L).n_samples == 8000L)
    // pure sine: rms = amp/sqrt(2), peak ~ amp, zcr ~ 2*f/fs
    assert(math.abs(f(1L).rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(1L).rms}")
    assert(math.abs(f(1L).peak - 0.5) < 0.01)
    assert(math.abs(f(1L).zcr - 2 * 440.0 / 8000) < 0.005, s"zcr ${f(1L).zcr}")
    assert(math.abs(f(2L).zcr - 2 * 100.0 / 8000) < 0.005)
    assert(math.abs(f(2L).peak - 0.9) < 0.01)
    // corrupt payload → sentinel, job survives
    assert(f(3L).sample_rate == -1 && f(3L).n_samples == -1L)
  }

  test("default codec path (q40/q93 oracle arithmetic) is unchanged") {
    import spark.implicits._
    val textual = Seq((9L, "hello world".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).as("n_bytes"),
          lit("fixture").as("origin")).as("meta"))
    val f = Multimodal.extractFeatures(spark, textual).collect().head
    assert(f.n_bytes == 11 && f.width == 11 % 640 && f.height == (11 * 7) % 480)
  }

  // ------------------------------ video ------------------------------- //

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** RIFF chunk: fourcc + LE size + payload, word-aligned. */
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(id.getBytes("US-ASCII")); out.write(le32(payload.length))
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0) // pad to even
    out.toByteArray
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ children)

  /** Encode a solid-gray width x height JPEG to bytes. */
  private def grayJpeg(width: Int, height: Int, g: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal Motion-JPEG AVI: RIFF('AVI ') { LIST hdrl { avih },
    * LIST movi { 00dc frames } } — the structures AviMjpegCodec walks,
    * written with the same public RIFF layout a capture tool produces. */
  private def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    val avih = new ByteArrayOutputStream()
    avih.write(le32(100000))        // dwMicroSecPerFrame (10 fps)
    avih.write(le32(0)); avih.write(le32(0)); avih.write(le32(0))
    avih.write(le32(frames.size))   // dwTotalFrames
    avih.write(le32(0)); avih.write(le32(1)); avih.write(le32(0))
    avih.write(le32(width)); avih.write(le32(height))
    (0 until 4).foreach(_ => avih.write(le32(0)))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  test("AviMjpegCodec: real RIFF walk + JPEG frame decode, strided sampling") {
    import spark.implicits._
    // 5 frames at distinct gray levels; every=2 samples frames 0, 2, 4
    val levels = Seq(40, 80, 120, 160, 200)
    val avi = mjpegAvi(levels.map(grayJpeg(24, 16, _)), 24, 16)
    val media = Seq((1L, avi, "video/x-msvideo"))
      .toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).as("n_bytes"),
          lit("fixture").as("origin")).as("meta"))
    val frames = Multimodal.extractVideoFrames(spark, media, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    frames.foreach { f =>
      assert(f.width == 24 && f.height == 16)
      // JPEG of a solid color round-trips within compression tolerance
      assert(math.abs(f.mean_luma - levels(f.frame_idx) / 255.0) < 0.02,
        s"frame ${f.frame_idx}: luma ${f.mean_luma}")
    }
  }

  test("AviMjpegCodec: corrupt frame yields its sentinel, container survives") {
    import spark.implicits._
    val good = grayJpeg(8, 8, 100)
    val avi = mjpegAvi(Seq(good, Array[Byte](9, 9, 9, 9, 9), good), 8, 8)
    val media = Seq(
        (1L, avi, "video/x-msvideo"),
        (2L, Array[Byte](0, 1, 2, 3), "video/x-msvideo")) // not RIFF at all
      .toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).as("n_bytes"),
          lit("fixture").as("origin")).as("meta"))
    val rows = Multimodal.extractVideoFrames(spark, media, every = 1).collect()
    val v1 = rows.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(v1.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(v1(0).width == 8 && v1(2).width == 8, "good frames decode")
    assert(v1(1).width == -1 && v1(1).mean_luma == -1.0, "bad frame sentinels")
    val v2 = rows.filter(_.doc_id == 2L)
    assert(v2.length == 1 && v2.head.frame_idx == -1, "non-container sentinels")
  }
}
