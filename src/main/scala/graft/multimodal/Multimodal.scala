package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus feature extraction through REAL codecs.
  *
  * Codecs are the JDK's production implementations — PNG/BMP/JPEG via
  * `javax.imageio`, WAV via `javax.sound.sampled` — so every consumer here
  * (`decodeMedia` statistics, `transformMedia` resize/frame-sample,
  * `dHashImages` perceptual hashes, `mediaFeatures` pooled embedding
  * vectors) is a genuine encode→parse→decode round trip, oracle-checked
  * end to end (q30/q88/q203/q220; q30 also pins the magic-byte-sniffed
  * container per row). Formats outside the JDK (video, JPEG-XL) would slot
  * in as additional `readImage`-style thread-local codec entries — there
  * is no stub tier.
  *
  * Batch shape: decode stages run via mapPartitions on the typed Dataset —
  * one JVM call per partition iterating its rows, the Scala equivalent of
  * the Python engine's mapInPandas Arrow batches. Executors never hold
  * more than one payload per row in flight; payload bytes stay off the
  * driver.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metaFields: Seq[(String, String)] = Seq(
    "kind" -> "string",        // image | audio | video
    "width" -> "int", "height" -> "int",
    "sampleRate" -> "int", "durationMs" -> "bigint")

  /** Attach a fake binary payload + metadata derived from a text column —
    * the stand-in for reading real media files at test time. */
  def withFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(col(idCol), lit(640)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (length(col(textCol)) * 10).cast("bigint").as("durationMs")).as("meta"))

  /** REAL pooled feature vectors from decoded media — the bytes→embedding
    * stage of a multimodal pipeline, on the genuine JDK decode (the
    * [[decodeMedia]]/[[dHashImages]] codec path, not byte statistics):
    *
    *  - image: decode, walk pixels in row-major order, pool the integer
    *    luminance gray = (r+g+b)/3 (integer division) into `dim` buckets
    *    by pixel index mod dim;
    *  - audio: parse the WAV container, pool the unsigned 8-bit PCM
    *    samples into `dim` buckets by sample index mod dim.
    *
    * feature(j) = bucket mean − 128.0 (centering spreads cosines across
    * [-1, 1]; raw all-positive means cluster near cos ≈ 1 and rank
    * nothing), 0.0 for an empty bucket. Every arithmetic step — integer
    * sums, one double division, one subtraction — is IEEE-identical in any
    * engine, so downstream vector ops (hyperplane buckets, cosines)
    * replay bit-exactly in the q220 oracle.
    *
    * Map-only over the payload scan (mapPartitions, thread-local codecs —
    * the q30 discipline); the output (id, kind, features) feeds the
    * embedding operators (Dedup.embeddingNearDups, Similarity.*TopK)
    * unchanged. */
  def mediaFeatures(df: DataFrame, idCol: String, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          require(kind == "image" || kind == "audio",
            s"mediaFeatures supports image|audio payloads, got kind='$kind' " +
              s"for doc $id (video rows go through sampleVideoFrames/" +
              "dHashVideoFrames first)")
          val sums = new Array[Long](dim)
          val cnts = new Array[Long](dim)
          if (kind == "image") {
            val img = readImage(bytes)
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val gray =
                  (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                val j = (y * w + x) % dim
                sums(j) += gray; cnts(j) += 1
                x += 1
              }
              y += 1
            }
          } else {
            val data = readWav(bytes).readAllBytes()
            var i = 0
            while (i < data.length) {
              val j = i % dim
              sums(j) += data(i) & 0xff; cnts(j) += 1
              i += 1
            }
          }
          val f = Array.tabulate(dim)(j =>
            if (cnts(j) == 0) 0.0 else sums(j).toDouble / cnts(j) - 128.0)
          (id, kind, f)
        }
      }
      .toDF(idCol, "kind", "features")
  }

  // ---------------------------------------------------------------------
  // Real codec path: JDK-built-in PNG (javax.imageio) and WAV
  // (javax.sound.sampled) round-trips. Media content is a deterministic
  // function of the document id, so the DECODED statistics are replayable
  // in pure SQL — the decode itself (a true encode→parse→decode through
  // the JDK codecs) is what the oracle then verifies end to end.
  // ---------------------------------------------------------------------

  // ImageIO's stream cache spools every encode/decode through a temp FILE
  // by default — per-row disk I/O in a hot map stage (measured ~5s of the
  // q30 runtime at sf0.1). In-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  // ImageIO.read/write consult the static plugin registry — under a lock —
  // on EVERY call, which collapses throughput once tasks outnumber a few
  // cores (measured on this host: 9.5k → 3.4k codec ops/s going 8 → 32
  // threads; sf1's 40-task decode stage ran SLOWER than the old 1-task
  // layout). Per-thread codec instances restore scaling (19.7k ops/s at
  // 32 threads, 5.7×): executor task threads are long-lived, and
  // reader/writer instances are not thread-safe — exactly ThreadLocal's
  // contract. Instances are reset (setInput/setOutput null) after use so
  // no payload buffer outlives the call.
  private val readerCache =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() = new java.util.HashMap
    }
  private val writerCache =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] {
      override def initialValue() = new java.util.HashMap
    }

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val fmt = sniffContainer(bytes)
    val r = readerCache.get.computeIfAbsent(fmt,
      f => javax.imageio.ImageIO.getImageReadersByFormatName(f).next())
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try { r.setInput(in, true, true); val img = r.read(0); r.setInput(null); img }
    finally in.close()
  }

  private def writeImage(img: java.awt.image.BufferedImage,
                         format: String): Array[Byte] = {
    val w = writerCache.get.computeIfAbsent(format,
      f => javax.imageio.ImageIO.getImageWritersByFormatName(f).next())
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { w.setOutput(out); w.write(img); w.setOutput(null) }
    finally out.close()
    bos.toByteArray
  }

  /** Deterministic image geometry/pixels (shared with the SQL oracle):
    * width = id%8+2, height = id%6+2, channels at (x,y) are cheap integer
    * mixes mod 256. All inputs non-negative, so JVM % == SQL %. */
  def imgWidth(id: Long): Int = (id % 8 + 2).toInt
  def imgHeight(id: Long): Int = (id % 6 + 2).toInt
  def pxR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def pxG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 5) % 256).toInt
  def pxB(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 3 + y * 19) % 256).toInt

  /** Deterministic audio: 8-bit unsigned mono PCM at 8 kHz,
    * n = id%50+20 samples, sample(i) = (id·13 + i·7) mod 256. */
  val WavRate = 8000
  def wavSamples(id: Long): Int = (id % 50 + 20).toInt
  def pcm(id: Long, i: Int): Int = ((id * 13 + i * 7) % 256).toInt

  /** Image container per id: PNG for id ≡ 0 (mod 4), JPEG for id ≡ 6
    * (mod 8), BMP for the rest — three REAL JDK codecs on the image path.
    * PNG/BMP are lossless RGB, so their decoded pixel sums replay exactly
    * in the oracle. JPEG is the format a real crawl actually serves, so it
    * is in the corpus too — but DCT quantization makes its pixel content
    * non-replayable in SQL, so JPEG rows verify the GEOMETRY/METADATA path
    * (decoded dimensions + magic-byte-sniffed container) and their pixel
    * sums are masked NULL on both engines (q30/q88). The lossless rows
    * keep the stronger full-content check. */
  def imageFormat(id: Long): String =
    if (id % 4 == 0) "png" else if (id % 8 == 6) "jpeg" else "bmp"

  private def encodeImage(id: Long, format: String): Array[Byte] = {
    val (w, h) = (imgWidth(id), imgHeight(id))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
        x += 1
      }
      y += 1
    }
    writeImage(img, format)
  }

  /** Encode the deterministic image in its id-selected container. */
  def imagePayload(id: Long): Array[Byte] = encodeImage(id, imageFormat(id))

  /** Encode the deterministic image as a real PNG via javax.imageio. */
  def pngPayload(id: Long): Array[Byte] = encodeImage(id, "png")

  /** Container sniffed from payload MAGIC BYTES — decode-side evidence
    * (not recomputed from the id) that the corpus really carries distinct
    * container formats; q30's oracle pins it per row. */
  def sniffContainer(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) "bmp"
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte) "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte) "wav"
    else if (bytes.length >= 4 && bytes(0) == 'G'.toByte && bytes(1) == 'V'.toByte &&
      bytes(2) == 'I'.toByte && bytes(3) == 'D'.toByte) "gvid"
    else "unknown"

  // javax.sound has the same front-door disease as ImageIO: AudioSystem
  // .write / .getAudioInputStream walk the provider registry — synchronized
  // — on EVERY call, which serialized the sf1 audio encode+decode the way
  // the image path was before its ThreadLocal codecs (q30/q88 measured
  // ~14× sf0.1→sf1 at 10× data). The SPI types are public API
  // (javax.sound.sampled.spi), so resolve the WAVE providers once per
  // thread via ServiceLoader and call them directly. Per-thread (not
  // static) because the SPI contract, unlike the JDK's stateless
  // implementations, does not promise thread safety.
  private val wavWriterTL =
    new ThreadLocal[javax.sound.sampled.spi.AudioFileWriter] {
      override def initialValue() = {
        import scala.jdk.CollectionConverters._
        java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
          .iterator().asScala
          .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
          .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
      }
    }
  private val wavReaderTL =
    new ThreadLocal[javax.sound.sampled.spi.AudioFileReader] {
      override def initialValue() = {
        import scala.jdk.CollectionConverters._
        // probe with a real one-sample WAV: reader providers advertise
        // support by succeeding, not by a queryable capability flag
        val probe = {
          val fmt = new javax.sound.sampled.AudioFormat(WavRate.toFloat, 8, 1, false, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(Array[Byte](0)), fmt, 1L)
          val bos = new java.io.ByteArrayOutputStream()
          wavWriterTL.get.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
        java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .iterator().asScala
          .find { r =>
            try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
            catch { case _: Exception => false }
          }
          .getOrElse(sys.error("no WAVE AudioFileReader provider"))
      }
    }

  private def readWav(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream =
    wavReaderTL.get.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))

  /** Encode the deterministic PCM as a real WAV via javax.sound.sampled. */
  def wavPayload(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val n = wavSamples(id)
    val data = Array.tabulate[Byte](n)(i => pcm(id, i).toByte)
    val fmt = new AudioFormat(WavRate.toFloat, 8, 1, false, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriterTL.get.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // Video: a length-prefixed multi-frame container of REAL PNG frames
  // ("GVID" magic + frame count + per-frame length-prefixed PNG bytes).
  // The JDK ships no video codec, so the container is this module's own —
  // which is exactly the right model anyway: video reaches a data
  // pipeline as an opaque binary whose FRAME EXTRACTION is the pipeline's
  // job, and each extracted frame here is a genuine ImageIO PNG parse
  // (the q30 thread-local codec discipline), not a byte fake. Frame f of
  // video id carries the deterministic image content of id·1000+f, so
  // the decoded statistics replay in SQL.
  // ---------------------------------------------------------------------

  def videoFrames(id: Long): Int = (id % 6 + 2).toInt
  def videoFrameId(id: Long, f: Int): Long = id * 1000 + f

  /** Encode the deterministic multi-frame video container (PNG frames). */
  def videoPayload(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVID")
    val n = videoFrames(id)
    out.writeInt(n)
    var f = 0
    while (f < n) {
      val frame = encodeImage(videoFrameId(id, f), "png")
      out.writeInt(frame.length)
      out.write(frame)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Attach REAL video payloads (one per row of `df`). */
  def withVideoMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // spread — see withRealMedia
    graft.io.Tables.spreadDf(df.select(col(idCol).cast("long")))
      .as[Long].mapPartitions { it =>
      it.map(id => (id, "video", videoPayload(id)))
    }.toDF(idCol, "kind", "payload")
  }

  final case class SampledFrame(doc_id: Long, n_frames: Int, frame_idx: Int,
                                width: Int, height: Int,
                                sum_r: Long, sum_g: Long, sum_b: Long)

  /** Frame-sample a video column: parse the container, DECODE every
    * `stride`-th frame through the real PNG codec, and emit per-frame
    * geometry + channel sums. Unsampled frames are never decoded — their
    * bytes are skipped by length prefix, which is the point of frame
    * sampling at 100 TB (decode cost scales with KEPT frames, I/O with
    * payload size). Map-only; one output row per sampled frame. */
  def sampleVideoFrames(df: DataFrame, idCol: String,
                        stride: Int): org.apache.spark.sql.Dataset[SampledFrame] = {
    require(stride >= 1, "stride must be ≥ 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GVID",
          s"not a GVID container (doc $id)")
        val n = in.readInt()
        (0 until n).flatMap { f =>
          val len = in.readInt()
          if (f % stride != 0) { in.skipBytes(len); None }
          else {
            val frame = new Array[Byte](len)
            in.readFully(frame)
            val img = readImage(frame)
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
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
            Some(SampledFrame(id, n, f, w, h, sr, sg, sb))
          }
        }
      }
  }

  /** Decoded, engine-verifiable media statistics. Nullable halves: image
    * rows carry geometry + per-channel pixel sums, audio rows carry sample
    * count/sum/rate. Integer sums, not means — exact in any engine. */
  final case class DecodedMedia(
      doc_id: Long, kind: String, container: String,
      width: Option[Int], height: Option[Int],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
      n_samples: Option[Long], sum_pcm: Option[Long], sample_rate: Option[Int])

  /** Transformed-media statistics: image rows carry the channel sums of a
    * nearest-neighbour resize to (targetW × targetH); audio rows carry the
    * count/sum of every `stride`-th PCM sample. Integer sums — exact in
    * any engine. */
  final case class TransformedMedia(
      doc_id: Long, kind: String, container: String,
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
      n_kept: Option[Long], sum_kept: Option[Long])

  /** REAL media transforms over decoded payloads — the resize /
    * frame-sample stage of a multimodal pipeline, on the genuine JDK
    * decode (nothing recomputed from the id):
    *   - images: deterministic nearest-neighbour resize — target pixel
    *     (tx, ty) reads source (⌊tx·w/tw⌋, ⌊ty·h/th⌋). NN is chosen over
    *     Graphics2D interpolation because its integer arithmetic is
    *     bit-reproducible across JVMs and replayable in SQL, which is what
    *     lets the oracle verify a REAL codec path end-to-end.
    *   - audio: frame sampling — every `stride`-th decoded PCM sample.
    * Same mapPartitions batch shape as [[decodeMedia]]: payloads stay on
    * executors, CPU-bound work pipelines with the scan. */
  def transformMedia(df: DataFrame, idCol: String, targetW: Int, targetH: Int,
                     stride: Int): Dataset[TransformedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          require(kind == "image" || kind == "audio",
            s"transformMedia supports image|audio payloads, got kind='$kind' " +
              s"for doc $id (video rows go through sampleVideoFrames)")
          if (kind == "image") {
            val img = readImage(bytes)
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var ty = 0
            while (ty < targetH) {
              var tx = 0
              while (tx < targetW) {
                val rgb = img.getRGB(tx * w / targetW, ty * h / targetH)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                tx += 1
              }
              ty += 1
            }
            TransformedMedia(id, kind, sniffContainer(bytes),
              Some(sr), Some(sg), Some(sb), None, None)
          } else {
            val ais = readWav(bytes)
            val data = ais.readAllBytes()
            var (n, s) = (0L, 0L)
            var i = 0
            while (i < data.length) { n += 1; s += data(i) & 0xff; i += stride }
            TransformedMedia(id, kind, sniffContainer(bytes),
              None, None, None, Some(n), Some(s))
          }
        }
      }
  }

  /** Attach REAL media payloads: even ids get a PNG, odd ids a WAV. Encode
    * runs in mapPartitions (batched, executor-side, payloads never touch
    * the driver) — the same shape a real ingest's file read would have. */
  def withRealMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NOT spread: image/audio synthesis is light enough that the extra
    // exchange measurably cost more than it saved (q203/q220/q224 each
    // +0.3–0.7 s with a spread input; contrast withVideoMedia below,
    // whose per-id frame synthesis is heavy enough to repay it)
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        if (id % 2 == 0) (id, "image", imagePayload(id)) else (id, "audio", wavPayload(id))
      }
    }.toDF(idCol, "kind", "payload")
  }

  /** Decode real payloads through the JDK codecs and emit verifiable
    * statistics. This is a genuine parse of the PNG/WAV container bytes —
    * nothing is recomputed from the id on the decode side. */
  def decodeMedia(df: DataFrame, idCol: String): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          require(kind == "image" || kind == "audio",
            s"decodeMedia supports image|audio payloads, got kind='$kind' " +
              s"for doc $id (video rows go through sampleVideoFrames)")
          if (kind == "image") {
            val img = readImage(bytes)
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
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
            DecodedMedia(id, kind, sniffContainer(bytes),
              Some(w), Some(h), Some(sr), Some(sg), Some(sb),
              None, None, None)
          } else {
            val ais = readWav(bytes)
            val fmt = ais.getFormat
            val data = ais.readAllBytes()
            var s = 0L
            var i = 0
            while (i < data.length) { s += data(i) & 0xff; i += 1 }
            DecodedMedia(id, kind, sniffContainer(bytes),
              None, None, None, None, None,
              Some(data.length.toLong), Some(s), Some(fmt.getSampleRate.toInt))
          }
        }
      }
  }

  /** Perceptual audio fingerprint over the REAL decoded PCM — the audio
    * sibling of [[dHashImages]] (the energy-delta-sign construction
    * acoustic fingerprinting uses at the frame grain, minus the spectral
    * transform — deterministic integer arithmetic so any engine replays
    * it): parse the WAV container, split the sample stream into `frames`
    * equal spans (sample i → frame ⌊i·frames/n⌋ — integer mapping, empty
    * frames carry energy 0), sum the unsigned 8-bit samples per frame,
    * and emit one bit per adjacent frame pair (energy rises → 1), packed
    * little-endian: frames−1 bits. Trims/re-encodes shift few frame
    * energies, so near-copies keep most bits; unrelated audio differs in
    * ~half. Map-only over the payload scan (thread-local WAV reader).
    * Returns (doc_id, ahash). */
  def aHashAudio(df: DataFrame, idCol: String, frames: Int = 33): DataFrame = {
    require(frames >= 2 && frames <= 64, "frames-1 bits must fit a long")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .filter(_._2 == "audio")
      .mapPartitions { it =>
        it.map { case (id, _, bytes) =>
          val data = readWav(bytes).readAllBytes()
          val n = data.length
          val e = new Array[Long](frames)
          var i = 0
          while (i < n) { e(i * frames / n) += data(i) & 0xff; i += 1 }
          var hash = 0L
          var j = 0
          while (j < frames - 1) {
            if (e(j + 1) > e(j)) hash |= 1L << j
            j += 1
          }
          (id, hash)
        }
      }
      .toDF(idCol, "ahash")
  }

  /** Perceptual difference hash (dHash) over the REAL decoded pixels:
    * nearest-neighbour-sample a (gw+1)×gh luminance grid (integer source
    * mapping ⌊g·dim/grid⌋ — the q88 resize rule, bit-reproducible) and
    * emit one bit per horizontally-adjacent pair (left < right), packed
    * little-endian into a long — the standard near-duplicate image
    * fingerprint (crops/recompressions keep most bits; random images
    * differ in ~half). gray = (r+g+b)/3 integer division. Map-only over
    * the payload scan, thread-local codecs (the q30 discipline);
    * lossless containers only — JPEG pixels are not bit-replayable and
    * callers exclude them exactly as q30 masks them. Returns
    * (doc_id, dhash: gw·gh bits). */
  def dHashImages(df: DataFrame, idCol: String, gw: Int = 8,
                  gh: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .filter(_._2 == "image")
      .mapPartitions { it =>
        it.map { case (id, _, bytes) => (id, dHashOf(readImage(bytes), gw, gh)) }
      }
      .toDF(idCol, "dhash")
  }

  /** dHash of one decoded image: (gw+1)×gh NN-sampled luminance grid, one
    * bit per horizontally-adjacent pair (left < right), little-endian —
    * the [[dHashImages]] construction, shared with the per-frame video
    * path. */
  private def dHashOf(img: java.awt.image.BufferedImage, gw: Int,
                      gh: Int): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    def gray(gx: Int, gy: Int): Int = {
      val x = gx * w / (gw + 1)
      val y = gy * h / gh
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
    }
    var hash = 0L
    var j = 0
    while (j < gh) {
      var i = 0
      while (i < gw) {
        if (gray(i + 1, j) > gray(i, j)) hash |= 1L << (j * gw + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  final case class VideoFrameHash(doc_id: Long, n_frames: Int,
                                  frame_idx: Int, dhash: Long)

  /** Per-frame perceptual hashes of a video column — the fingerprint
    * SEQUENCE that video near-duplicate detection bands over: parse the
    * GVID container, decode every `stride`-th frame through the real PNG
    * codec ([[sampleVideoFrames]]' skip-by-length contract — unsampled
    * frames are never parsed, so hash cost scales with KEPT frames), and
    * dHash each decoded frame exactly as [[dHashImages]] does a still.
    * Map-only; one output row per sampled frame. */
  def dHashVideoFrames(df: DataFrame, idCol: String, stride: Int,
                       gw: Int = 8, gh: Int = 4): Dataset[VideoFrameHash] = {
    require(stride >= 1, "stride must be ≥ 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GVID",
          s"not a GVID container (doc $id)")
        val n = in.readInt()
        (0 until n).flatMap { f =>
          val len = in.readInt()
          if (f % stride != 0) { in.skipBytes(len); None }
          else {
            val frame = new Array[Byte](len)
            in.readFully(frame)
            Some(VideoFrameHash(id, n, f, dHashOf(readImage(frame), gw, gh)))
          }
        }
      }
  }
}
