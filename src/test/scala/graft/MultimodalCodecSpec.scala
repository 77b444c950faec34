package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
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
}
