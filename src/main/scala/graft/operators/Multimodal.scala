package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column handling (north-star extension): media payloads as
  * opaque `binary` columns with typed metadata, and per-partition batched
  * decode / feature-extraction.
  *
  * Spark-side design (all real): schema (binary content + metadata struct),
  * partition-batched processing via `mapPartitions` over a typed Dataset
  * (the JVM analog of `mapInPandas` — one iterator per partition, so a real
  * decoder would amortize model/codec init per partition, not per row), and
  * deterministic output schema for downstream relational ops.
  *
  * Codecs are pluggable behind [[MediaCodec]]: [[ImageIoCodec]] is a real
  * image decoder (javax.imageio — JVM-native, PNG/JPEG/GIF/BMP), used when
  * the binary column holds actual images; [[FakeDecoder]] derives
  * deterministic pseudo-features from raw bytes and is the fixture codec for
  * the text-as-bytes test corpus (and the default, so oracle arithmetic is
  * reproducible in SQL).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                           feature: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long)
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          n_bytes_in: Int, checksum: Long)

  /** 64-bit perceptual average-hash carried as two unsigned 32-bit halves
    * (bits 0-31 in ph_lo, 32-63 in ph_hi, each in [0, 2^32)) — sidesteps
    * the signed-shift overflow a single BIGINT bit 63 would hit in SQL,
    * and gives the near-dup join natural 16-bit band boundaries. */
  case class PHash(doc_id: Long, ph_hi: Long, ph_lo: Long)

  /** A per-partition media codec. Implementations must be Serializable
    * (instantiated on the driver, shipped to executors) and total: corrupt
    * or undecodable payloads yield a sentinel row (width/height = -1), not
    * an exception — at 100 TB a single bad image must not kill the job. */
  trait MediaCodec extends Serializable {
    def decode(r: MediaRow): MediaFeatures
    def resample(r: MediaRow, width: Int, height: Int): ResizedMedia
    def perceptualHash(r: MediaRow): PHash
  }

  /** Shared aHash finish: 64 grid samples → bit i set iff sample_i is
    * strictly above the grid mean. The threshold compares b_i·64 > Σb —
    * exact integer arithmetic, so every engine lands the same bits. */
  private[operators] def averageHash(docId: Long, b: Array[Int]): PHash = {
    require(b.length == 64)
    var total = 0L
    var i = 0
    while (i < 64) { total += b(i); i += 1 }
    var lo = 0L; var hi = 0L
    i = 0
    while (i < 32) { if (b(i) * 64L > total) lo |= (1L << i); i += 1 }
    while (i < 64) { if (b(i) * 64L > total) hi |= (1L << (i - 32)); i += 1 }
    PHash(docId, hi, lo)
  }

  /** Deterministic fixture codec — derives pseudo-features from raw bytes.
    * Default codec for the test corpus (documents.text cast to binary),
    * where its arithmetic is exactly reproducible by the SQL oracles. */
  object FakeDecoder extends MediaCodec {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.content.length
      val width = n % 640
      val height = (n * 7) % 480
      val feature = Array.tabulate(4) { i =>
        if (n == 0) 0f
        else r.content(i % n).toFloat / (i + 1).toFloat
      }
      MediaFeatures(r.doc_id, n, width, height, feature)
    }

    /** Nearest-neighbor "resample" of source bytes onto a width x height
      * grid; checksum = sum of sampled unsigned bytes. */
    def resample(r: MediaRow, width: Int, height: Int): ResizedMedia = {
      val n = r.content.length
      val px = width * height
      val stride = math.max(1, n / px)
      var checksum = 0L
      var i = 0
      while (i < px) {
        if (n > 0) checksum += (r.content((i * stride) % n) & 0xff).toLong
        i += 1
      }
      ResizedMedia(r.doc_id, width, height, n, checksum)
    }

    /** aHash over the same strided 8x8 byte grid `resample` walks —
      * exactly reproducible in SQL over the text-as-bytes fixture. */
    def perceptualHash(r: MediaRow): PHash = {
      val n = r.content.length
      val stride = math.max(1, n / 64)
      val b = Array.tabulate(64) { i =>
        if (n == 0) 0 else r.content((i * stride) % n) & 0xff
      }
      averageHash(r.doc_id, b)
    }
  }

  /** Real image codec over javax.imageio (public JVM API; PNG, JPEG, GIF,
    * BMP readers ship with the JDK). Feature vector is (mean R, mean G,
    * mean B, mean luma) in [0,1] — a cheap, deterministic image signature
    * suitable for the embedding-dedup operators downstream. Undecodable
    * payloads (ImageIO.read == null or a codec exception) yield the -1
    * sentinel so the pipeline stays total. */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    private def read(content: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(content)))
      catch { case scala.util.control.NonFatal(_) => None }

    def decode(r: MediaRow): MediaFeatures = read(r.content) match {
      case None =>
        MediaFeatures(r.doc_id, r.content.length, -1, -1, Array.empty[Float])
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val px = (w.toLong * h).toFloat * 255f
        val mr = sr / px; val mg = sg / px; val mb = sb / px
        val luma = 0.299f * mr + 0.587f * mg + 0.114f * mb
        MediaFeatures(r.doc_id, r.content.length, w, h, Array(mr, mg, mb, luma))
    }

    /** Real pixel resample: draw onto a width x height canvas with Java2D
      * bilinear interpolation; checksum = sum of output luma bytes (a
      * deterministic content digest of the resized pixels). */
    def resample(r: MediaRow, width: Int, height: Int): ResizedMedia =
      read(r.content) match {
        case None => ResizedMedia(r.doc_id, -1, -1, r.content.length, -1L)
        case Some(img) =>
          val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, width, height, null)
          } finally g.dispose()
          var checksum = 0L
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val rgb = out.getRGB(x, y)
              val rr = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff
              val bb = rgb & 0xff
              checksum += (0.299 * rr + 0.587 * gg + 0.114 * bb).toLong
              x += 1
            }
            y += 1
          }
          ResizedMedia(r.doc_id, width, height, r.content.length, checksum)
      }

    /** Real image aHash: bilinear 8x8 luma resample, mean threshold —
      * the classic average-hash (scale/format-invariant by construction;
      * undecodable → all-ones sentinel halves). */
    def perceptualHash(r: MediaRow): PHash = read(r.content) match {
      case None => PHash(r.doc_id, -1L, -1L)
      case Some(img) =>
        val out = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 8, 8, null)
        } finally g.dispose()
        val b = new Array[Int](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val rgb = out.getRGB(x, y)
            val rr = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff
            val bb = rgb & 0xff
            b(y * 8 + x) = (0.299 * rr + 0.587 * gg + 0.114 * bb).toInt
            x += 1
          }
          y += 1
        }
        averageHash(r.doc_id, b)
    }
  }

  /** Model a media table: text bytes stand in for image payloads; metadata
    * carried as a typed struct alongside the opaque binary. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Partition-batched decode: binary → features. One codec instance per
    * partition scope (init cost amortized), streaming iterator (no partition
    * materialization), typed output schema. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      codec: MediaCodec = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec scope: heavier codecs hook init here
        rows.map(codec.decode)
      }
  }

  /** Partition-batched resize: binary → fixed-dims pixels, digested to a
    * checksum. Same typed-iterator plumbing as extractFeatures; the pixel
    * work lives in the codec ([[ImageIoCodec.resample]] is a real Java2D
    * bilinear resample). */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int = 8, height: Int = 8,
             codec: MediaCodec = FakeDecoder): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map(codec.resample(_, width, height))
      }
  }

  /** Partition-batched perceptual hashing: binary → 64-bit aHash halves.
    * Same typed-iterator plumbing as extractFeatures. */
  def perceptualHashes(spark: SparkSession, media: DataFrame,
                       codec: MediaCodec = FakeDecoder): Dataset[PHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map(codec.perceptualHash)
      }
  }

  /** q118 — perceptual-hash duplicate groups: each media row's aHash plus
    * the size of its exact-hash group (the multimodal analog of q33's text
    * fingerprints — content-based, so re-encoded/renamed copies of the
    * same image collapse while metadata twins don't).
    *
    * Scale shape: one decode scan, one shuffle on the hash key for the
    * group count. */
  def phashGroups(spark: SparkSession, media: DataFrame,
                  codec: MediaCodec = FakeDecoder): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    perceptualHashes(spark, media, codec).toDF()
      .withColumn("phash_count",
        count(lit(1)).over(Window.partitionBy(col("ph_hi"), col("ph_lo"))))
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"), col("phash_count"))
      .orderBy(col("doc_id"))
  }

  /** q119 — perceptual near-duplicate pairs at hamming <= maxHamming.
    * Candidates exact-match one of four 16-bit hash bands — pigeonhole-
    * complete for hamming <= 3 (4 bands, 3 flips: some band survives), so
    * the output EQUALS the brute-force all-pairs hamming join the oracle
    * computes. Same inverted-index shape as q23's SimHash banding: the
    * corpus shuffles once on (band_idx, band), never all-pairs. */
  def phashNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3,
                        codec: MediaCodec = FakeDecoder): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding is only complete to hamming 3")
    val hs = graft.core.CacheScope.cached(
      perceptualHashes(spark, media, codec).toDF())
    // Undecodable images all carry the (-1, -1) sentinel hash; without this
    // filter every corrupt pair would band-match at hamming 0 and be
    // reported as an exact near-duplicate under a real codec. (FakeDecoder
    // is total, so the registered q119 never produces the sentinel.)
    val decodable = hs.filter(!(col("ph_hi") === -1L && col("ph_lo") === -1L))
    val bands = decodable.select(col("doc_id"), col("ph_hi"), col("ph_lo"),
      posexplode(array(
        col("ph_lo").bitwiseAND(0xFFFFL),
        shiftright(col("ph_lo"), 16).bitwiseAND(0xFFFFL),
        col("ph_hi").bitwiseAND(0xFFFFL),
        shiftright(col("ph_hi"), 16).bitwiseAND(0xFFFFL))))
      .toDF("doc_id", "ph_hi", "ph_lo", "band_idx", "band")
    bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (bit_count(col("x.ph_lo").bitwiseXOR(col("y.ph_lo"))) +
          bit_count(col("x.ph_hi").bitwiseXOR(col("y.ph_hi")))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------ audio ------------------------------- //

  case class AudioFeatures(doc_id: Long, n_bytes: Int, sample_rate: Int,
                           n_samples: Long, rms: Double, zcr: Double,
                           peak: Double)

  /** Per-partition audio codec; same totality contract as [[MediaCodec]]
    * (undecodable → -1 sentinels). */
  trait AudioCodec extends Serializable {
    def decode(r: MediaRow): AudioFeatures
  }

  /** Real audio decoder over javax.sound.sampled (public JVM API; WAV/AIFF
    * PCM readers ship with the JDK and work headless). Features are the
    * classic cheap audio signature: RMS energy, zero-crossing rate (per
    * sample), and absolute peak, over samples normalized to [-1, 1] from
    * the first channel. */
  object WavCodec extends AudioCodec {
    import javax.sound.sampled.AudioSystem

    def decode(r: MediaRow): AudioFeatures = {
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        val fmt = in.getFormat
        val frameSize = fmt.getFrameSize
        require(fmt.getSampleSizeInBits == 16, "PCM16 expected")
        val raw = in.readAllBytes(); in.close()
        val nFrames = raw.length / frameSize
        var i = 0; var sumSq = 0.0; var crossings = 0L
        var peak = 0.0; var prevSign = 0
        val big = fmt.isBigEndian
        while (i < nFrames) {
          val off = i * frameSize // first channel only
          val lo = raw(off + (if (big) 1 else 0)) & 0xff
          val hi = raw(off + (if (big) 0 else 1)).toInt
          val s = ((hi << 8) | lo).toShort / 32768.0
          sumSq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
          i += 1
        }
        val rms = if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames)
        val zcr = if (nFrames <= 1) 0.0 else crossings.toDouble / (nFrames - 1)
        AudioFeatures(r.doc_id, r.content.length, fmt.getSampleRate.toInt,
          nFrames.toLong, rms, zcr, peak)
      } catch {
        case scala.util.control.NonFatal(_) =>
          AudioFeatures(r.doc_id, r.content.length, -1, -1L, -1.0, -1.0, -1.0)
      }
    }
  }

  /** Partition-batched audio decode — identical plumbing to
    * [[extractFeatures]], with the WAV decoder as default (audio payloads
    * are real, not corpus stand-ins, so there is no fixture arithmetic to
    * preserve). */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame,
                           codec: AudioCodec = WavCodec): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map(codec.decode)
      }
  }

  // ------------------------------ video ------------------------------- //

  case class VideoFrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
                                height: Int, mean_luma: Double)

  /** Per-partition video codec: container bytes → per-sampled-frame
    * features. Same totality contract as [[MediaCodec]] (corrupt container
    * → one -1 sentinel row; corrupt individual frame → that frame's
    * features are -1 but the rest of the video still decodes). */
  trait VideoCodec extends Serializable {
    def sampleFrames(r: MediaRow, every: Int): Iterator[VideoFrameFeatures]
  }

  /** REAL video container decode in pure JDK: AVI is a RIFF container
    * (fourcc + little-endian size chunks; public spec), and an MJPEG
    * stream's `00dc` chunks are plain JPEG images javax.imageio decodes.
    * So Motion-JPEG AVI — the classic capture/intermediate format — needs
    * no third-party codec: walk RIFF → `LIST movi` → every `every`-th
    * `##dc`/`##db` chunk → ImageIO → per-frame mean luma. (True
    * interframe codecs in mp4/mkv stay out of JDK reach — that boundary
    * is documented; this codec makes the CONTAINER path real.) */
  object AviMjpegCodec extends VideoCodec {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Offsets+sizes of the movi stream-data chunks (frame payloads), in
      * container order. Frame chunks are `##dc` (compressed) / `##db`
      * (uncompressed) per the AVI spec. */
    private def frameChunks(b: Array[Byte]): Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(b, off)
          val sz = le32(b, off + 4)
          if (sz < 0 || off + 8 + sz > end) return // corrupt length: stop
          if (id == "LIST" && sz >= 4) {
            val listType = fourcc(b, off + 8)
            // only movi (and its rec  groupings) hold frame data; hdrl
            // holds headers we don't need for feature extraction
            if (listType == "movi" || listType == "rec ") walk(off + 12, off + 8 + sz)
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db"))) {
            out += ((off + 8, sz))
          }
          off += 8 + sz + (sz & 1) // chunks are word-aligned
        }
      }
      if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ")
        walk(12, math.min(b.length, 8 + le32(b, 4)))
      out.toSeq
    }

    def sampleFrames(r: MediaRow, every: Int): Iterator[VideoFrameFeatures] = {
      val chunks = try frameChunks(r.content)
                   catch { case scala.util.control.NonFatal(_) => Seq.empty }
      if (chunks.isEmpty)
        return Iterator.single(VideoFrameFeatures(r.doc_id, -1, -1, -1, -1.0))
      chunks.iterator.zipWithIndex
        .filter { case (_, i) => i % every == 0 }
        .map { case ((off, sz), i) =>
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(r.content, off, sz)))
            catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case None => VideoFrameFeatures(r.doc_id, i, -1, -1, -1.0)
            case Some(im) =>
              val w = im.getWidth; val h = im.getHeight
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = im.getRGB(x, y)
                  sum += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              VideoFrameFeatures(r.doc_id, i, w, h, sum / (w.toLong * h) / 255.0)
          }
        }
    }
  }

  /** Partition-batched video frame sampling + decode: container binary →
    * one row per sampled frame. flatMap over the typed iterator — frames
    * stream through; neither the container set nor a video's frames are
    * materialized per-partition. */
  def extractVideoFrames(spark: SparkSession, media: DataFrame,
                         every: Int = 2,
                         codec: VideoCodec = AviMjpegCodec): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap(codec.sampleFrames(_, every))
      }
  }

  /** Frame sampling: one row per sampled frame (every `stride` bytes stands
    * in for every Nth video frame). Declarative explode — no UDF. */
  def sampleFrames(media: DataFrame, stride: Int = 100): DataFrame =
    media.select(col("doc_id"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), ((col("n_bytes") - 1) / stride).cast("int"))))
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * stride).cast("bigint").as("byte_offset"))
      .orderBy(col("doc_id"), col("frame_idx"))

  // ---------------------------------------------------- q241 scene cuts

  /** q241's frame signature delta threshold (byte-sum units over the
    * 100-byte frame stride shared with q41). */
  private[operators] val CutThreshold = 800L

  /** q241 — scene-cut detection over the frame stream: per document
    * (video stand-in), a frame's signature is its byte sum, and a cut
    * is a frame whose signature jumps more than [[CutThreshold]] from
    * its predecessor — the shot-boundary primitive video curation
    * pipelines run before frame-sampling (q41 samples uniformly; a real
    * pipeline samples per SHOT). On real media the signature is the
    * decoded luma mean (q41's codec path); the Spark-side mechanics —
    * frame explode, per-frame reduce, per-doc lag window — are
    * identical and are what this operator pins.
    *
    * Exactness: signatures are integer byte sums via a codegen'd
    * `aggregate` HOF (no UDF); the lag compare is integer. Scale
    * shape: scan-local frame explode + per-doc windows (frames per doc
    * bounded by media length), one doc-keyed rollup. */
  def sceneCuts(docs: DataFrame): DataFrame = {
    val frames = docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(0),
        ((length(col("text")) - 1) / lit(100)).cast("int"))).as("f"))
    val sig = expr(
      """aggregate(
        |  sequence(f * 100 + 1, least(f * 100 + 100, length(text))),
        |  0L, (acc, p) -> acc + ascii(substring(text, p, 1)))""".stripMargin)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
    frames.select(col("doc_id"), col("f"), sig.as("sig"))
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("cut",
        col("prev").isNotNull && abs(col("sig") - col("prev")) > CutThreshold)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("cut"), col("f"))).as("first_cut"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q241_scene_cuts" -> ((s, d) => sceneCuts(Tables.documents(s, d))),
    "q40_media_features" -> ((s, d) => {
      import s.implicits._
      extractFeatures(s, mediaTable(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"))
        .orderBy(col("doc_id"))
    }),
    "q41_media_frames" -> ((s, d) => sampleFrames(mediaTable(Tables.documents(s, d)))),
    "q93_media_resize" -> ((s, d) => {
      import s.implicits._
      resize(s, mediaTable(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("n_bytes_in"), col("checksum"))
        .orderBy(col("doc_id"))
    }),
    "q118_media_phash" -> ((s, d) => phashGroups(s, mediaTable(Tables.documents(s, d)))),
    "q119_media_neardup" -> ((s, d) => phashNearDupPairs(s, mediaTable(Tables.documents(s, d))))
  )

  /** Shared aHash CTEs over the text-as-bytes fixture (the same strided
    * 8x8 grid q93's oracle walks; ASCII corpus so ord(char) == byte). */
  private val phashCtes: String =
    """WITH m AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n,
      |    greatest(1, octet_length(encode(text)) // 64) AS stride
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN n = 0 THEN [0 for i in range(64)]
      |         ELSE [ord(substr(text, ((i * stride) % n) + 1, 1)) for i in range(64)]
      |    END AS b
      |  FROM m),
      |h AS (
      |  SELECT doc_id,
      |    CAST(list_sum([CASE WHEN b[i+1] * 64 > list_sum(b)
      |      THEN CAST(1 AS BIGINT) << i ELSE 0 END for i in range(32)]) AS BIGINT) AS ph_lo,
      |    CAST(list_sum([CASE WHEN b[i+33] * 64 > list_sum(b)
      |      THEN CAST(1 AS BIGINT) << i ELSE 0 END for i in range(32)]) AS BIGINT) AS ph_hi
      |  FROM g)""".stripMargin

  /** Oracles mirror the deterministic stub arithmetic (the plumbing — binary
    * length, partition-batched map, explode — is what's being verified;
    * feature vectors are stub-only and checked in the spec instead). */
  def oracles: Map[String, String] = Map(
    "q241_scene_cuts" ->
      s"""WITH fr AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, (length(text) - 1) // 100 + 1)) AS f
         |  FROM documents),
         |sg AS (
         |  SELECT doc_id, CAST(f AS INT) AS f,
         |    CAST(list_sum([ord(substr(text, p, 1))
         |      for p in range(f * 100 + 1,
         |                     least(f * 100 + 100, length(text)) + 1)])
         |      AS BIGINT) AS sig
         |  FROM fr),
         |lg AS (
         |  SELECT doc_id, f, sig,
         |    lag(sig) OVER (PARTITION BY doc_id ORDER BY f) AS prev
         |  FROM sg),
         |ct AS (
         |  SELECT doc_id, f,
         |    (prev IS NOT NULL AND abs(sig - prev) > $CutThreshold) AS cut
         |  FROM lg)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
         |  min(CASE WHEN cut THEN f END) AS first_cut
         |FROM ct GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q40_media_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_media_frames" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(f * 100 AS BIGINT) AS byte_offset
        |FROM documents, unnest(range(0, (octet_length(encode(text)) - 1) // 100 + 1)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // nearest-neighbor stub resample onto an 8x8 grid: byte at
    // (i*stride) % n for pixel i, stride = max(1, n div 64); ASCII corpus
    // so ord(char) == byte value
    "q93_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |    greatest(1, octet_length(encode(text)) // 64) AS stride
        |  FROM documents)
        |SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(n AS INT) AS n_bytes_in,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE
        |    list_sum([ord(substr(text, ((i * stride) % n) + 1, 1))
        |              for i in range(0, 64)]) END AS BIGINT) AS checksum
        |FROM m ORDER BY doc_id""".stripMargin,
    "q118_media_phash" ->
      s"""$phashCtes
         |SELECT doc_id, ph_hi, ph_lo,
         |  CAST(count(*) OVER (PARTITION BY ph_hi, ph_lo) AS BIGINT) AS phash_count
         |FROM h ORDER BY doc_id""".stripMargin,
    // brute-force all-pairs hamming join — the banded engine must EQUAL it
    // (pigeonhole completeness at hamming <= 3)
    "q119_media_neardup" ->
      s"""$phashCtes,
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(CAST(xor(a.ph_lo, b.ph_lo) AS BIGINT)) +
         |    bit_count(CAST(xor(a.ph_hi, b.ph_hi) AS BIGINT)) AS hamming
         |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
         |FROM p WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
  )
}
