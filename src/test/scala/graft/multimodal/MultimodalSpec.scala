package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "hello world"), (1L, "another document"), (2L, ""))
    .toDF("doc_id", "text")

  test("withFakeMedia: binary payload + typed metadata struct") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val sch = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") == "binary")
    assert(sch("meta").startsWith("struct<kind:string,width:int,height:int"))
    val r = media.where($"doc_id" === 0L)
      .select(length($"payload"), $"meta.kind").head()
    assert(r.getInt(0) == 11 && r.getString(1) == "image")
  }

  test("mediaFeatures: pooled vectors replay the content formulas from REAL decodes") {
    // one PNG image (id 4), one BMP image (id 2), one WAV (id 1) — the
    // feature vector must equal the formula replay over the deterministic
    // content, proving it came from a genuine codec parse (the q220 oracle
    // does the same replay in SQL)
    val ids = Seq(1L, 2L, 4L).toDF("doc_id")
    val media = Multimodal.withRealMedia(ids, "doc_id")
    val got = Multimodal.mediaFeatures(media, "doc_id", dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toVector).toMap
    def imgExpected(id: Long): Vector[Double] = {
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (Multimodal.pxR(id, x, y) + Multimodal.pxG(id, x, y) +
          Multimodal.pxB(id, x, y)) / 3
        val j = (y * w + x) % 8
        sums(j) += g; cnts(j) += 1
      }
      Vector.tabulate(8)(j =>
        if (cnts(j) == 0) 0.0 else sums(j).toDouble / cnts(j) - 128.0)
    }
    def wavExpected(id: Long): Vector[Double] = {
      val n = Multimodal.wavSamples(id)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      for (i <- 0 until n) { sums(i % 8) += Multimodal.pcm(id, i); cnts(i % 8) += 1 }
      Vector.tabulate(8)(j =>
        if (cnts(j) == 0) 0.0 else sums(j).toDouble / cnts(j) - 128.0)
    }
    assert(got(2L) == imgExpected(2L)) // BMP
    assert(got(4L) == imgExpected(4L)) // PNG
    assert(got(1L) == wavExpected(1L)) // WAV
    // multi-bucket empty case: id 2 is 4×4 = 16 pixels, so every bucket is
    // hit; the genuinely-empty-bucket claim is pinned on id 0 below (2×2 =
    // 4 pixels → buckets 4-7 MUST be exactly 0.0, not just near zero)
    val tiny = Multimodal.mediaFeatures(
      Multimodal.withRealMedia(Seq(0L).toDF("doc_id"), "doc_id"),
      "doc_id", dim = 8).collect().head.getSeq[Double](2)
    assert(tiny.drop(4).forall(_ == 0.0)) // id 0: 2×2 = 4 pixels
  }

  test("mediaFeatures: unsupported kind fails with the kind and doc id, not a codec error") {
    val vid = Multimodal.withVideoMedia(Seq(3L).toDF("doc_id"), "doc_id")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.mediaFeatures(vid, "doc_id", dim = 8).collect()
    }
    val msg = e.getCause match { case c if c != null => c.getMessage; case _ => e.getMessage }
    assert(msg.contains("video") && msg.contains("doc 3"), msg)
  }

  test("real codec round trip: PNG and BMP encode→ImageIO parse preserve pixels") {
    // payloads are genuine containers (magic bytes), and decoding them
    // recovers exactly the deterministic pixel statistics from BOTH codecs
    val png = Multimodal.pngPayload(6L)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val bmp = Multimodal.imagePayload(2L) // id ≡ 2 (mod 4) → BMP container
    assert(bmp.take(2).toSeq == Seq('B'.toByte, 'M'.toByte))
    val media = Multimodal.withRealMedia(docs, "doc_id")
    val dec = Multimodal.decodeMedia(media, "doc_id").collect()
      .map(m => m.doc_id -> m).toMap
    val img = dec(0L) // id ≡ 0 (mod 4) → PNG container
    assert(img.kind == "image" && img.container == "png")
    assert(img.width.contains(2) && img.height.contains(2))
    val expR = (for (x <- 0 until 2; y <- 0 until 2) yield Multimodal.pxR(0L, x, y)).sum
    assert(img.sum_r.contains(expR.toLong))
    val img2 = dec(2L)
    assert(img2.container == "bmp") // sniffed from decoded payload bytes
    val (w2, h2) = (Multimodal.imgWidth(2L), Multimodal.imgHeight(2L))
    val expB = (for (x <- 0 until w2; y <- 0 until h2) yield Multimodal.pxB(2L, x, y)).sum
    assert(img2.width.contains(w2) && img2.sum_b.contains(expB.toLong))
  }

  test("real codec round trip: WAV encode→AudioSystem parse preserves samples") {
    val wav = Multimodal.wavPayload(1L)
    assert(new String(wav.take(4)) == "RIFF")
    val media = Multimodal.withRealMedia(docs, "doc_id")
    val aud = Multimodal.decodeMedia(media, "doc_id").collect()
      .find(_.doc_id == 1L).get
    val n = Multimodal.wavSamples(1L)
    assert(aud.kind == "audio" && aud.container == "wav")
    assert(aud.n_samples.contains(n.toLong))
    assert(aud.sample_rate.contains(Multimodal.WavRate))
    val expSum = (0 until n).map(Multimodal.pcm(1L, _)).sum
    assert(aud.sum_pcm.contains(expSum.toLong))
  }

  test("transformMedia: NN resize picks exactly the mapped source pixels; stride sampling exact") {
    val ids = Seq(4L, 7L).toDF("doc_id") // one lossless image (png), one audio
    val media = Multimodal.withRealMedia(ids, "doc_id")
    val out = Multimodal.transformMedia(media, "doc_id", 4, 4, 4)
      .collect().map(t => t.doc_id -> t).toMap
    // image 4 (png): NN source for (tx,ty) = (tx*w/4, ty*h/4)
    val (w, h) = (Multimodal.imgWidth(4), Multimodal.imgHeight(4))
    var expR = 0L
    for (ty <- 0 until 4; tx <- 0 until 4)
      expR += Multimodal.pxR(4, tx * w / 4, ty * h / 4)
    assert(out(4L).container == "png")
    assert(out(4L).sum_r.contains(expR))
    // audio 7: n=27 samples, keep 0,4,...,24 → 7 kept
    val n = Multimodal.wavSamples(7)
    val kept = (0 until n by 4)
    assert(out(7L).n_kept.contains(kept.size.toLong))
    assert(out(7L).sum_kept.contains(kept.map(Multimodal.pcm(7, _).toLong).sum))
  }

  test("JPEG container: magic bytes, real lossy decode, exact geometry path") {
    // id ≡ 6 (mod 8) → JPEG, the container a real crawl serves
    assert(Multimodal.imageFormat(6L) == "jpeg")
    val jpg = Multimodal.imagePayload(6L)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8 &&
      (jpg(2) & 0xff) == 0xff) // JFIF SOI magic
    val media = Multimodal.withRealMedia(Seq(6L).toDF("doc_id"), "doc_id")
    val dec = Multimodal.decodeMedia(media, "doc_id").collect().head
    assert(dec.container == "jpeg") // sniffed from payload bytes, not the id
    // geometry survives the lossy codec exactly…
    assert(dec.width.contains(Multimodal.imgWidth(6L)) &&
      dec.height.contains(Multimodal.imgHeight(6L)))
    // …and pixel sums come from a REAL decode: present, but DCT-quantized
    // (q30/q88 mask them NULL — only lossless rows content-verify)
    assert(dec.sum_r.isDefined && dec.sum_g.isDefined && dec.sum_b.isDefined)
    val tr = Multimodal.transformMedia(media, "doc_id", 4, 4, 4).collect().head
    assert(tr.container == "jpeg")
  }

  test("JPEG content pin: committed fixture decodes to the pinned channel sums") {
    // q30/q88 mask JPEG pixel sums NULL (DCT is not SQL-replayable), so the
    // oracle verifies JPEG geometry/container only. This pins the CONTENT
    // path instead: src/test/resources/fixtures/pinned_6.jpg is a committed
    // real JPEG (tools/GenJpegFixture provenance) whose decoded channel sums
    // were computed once through the same ImageIO decode — decodeMedia must
    // reproduce them bit-exactly. A JDK/libjpeg rounding change fails here
    // loudly instead of silently shifting decode output.
    val in = getClass.getResourceAsStream("/fixtures/pinned_6.jpg")
    assert(in != null, "fixture missing")
    val bytes = in.readAllBytes(); in.close()
    assert(bytes.length == 643) // the committed artifact, not a regeneration
    val df = Seq((6L, "image", bytes)).toDF("doc_id", "kind", "payload")
    val dec = Multimodal.decodeMedia(df, "doc_id").collect().head
    assert(dec.container == "jpeg")
    assert(dec.width.contains(8) && dec.height.contains(2))
    assert(dec.sum_r.contains(3480L), s"sum_r=${dec.sum_r}")
    assert(dec.sum_g.contains(2264L), s"sum_g=${dec.sum_g}")
    assert(dec.sum_b.contains(992L), s"sum_b=${dec.sum_b}")
  }

  test("video container: magic, frame sampling skips by length and decodes real PNGs") {
    val vid = Multimodal.videoPayload(5L)
    assert(new String(vid.take(4), "US-ASCII") == "GVID")
    assert(Multimodal.sniffContainer(vid) == "gvid")
    val media = Multimodal.withVideoMedia(Seq(5L, 6L).toDF("doc_id"), "doc_id")
    val out = Multimodal.sampleVideoFrames(media, "doc_id", stride = 2)
      .collect().groupBy(_.doc_id)
    // id 5: 7 frames → sampled 0, 2, 4, 6; id 6: 2 frames → sampled 0
    assert(out(5L).map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(out(5L).forall(_.n_frames == 7))
    assert(out(6L).map(_.frame_idx).toSeq == Seq(0))
    // frame 4 of id 5 decodes to the content formulas of fid = 5004 —
    // correct only if the 3 preceding frames' bytes were skipped exactly
    val f4 = out(5L).find(_.frame_idx == 4).get
    val fid = Multimodal.videoFrameId(5L, 4)
    val (w, h) = (Multimodal.imgWidth(fid), Multimodal.imgHeight(fid))
    assert(f4.width == w && f4.height == h)
    val expG = (for (x <- 0 until w; y <- 0 until h)
      yield Multimodal.pxG(fid, x, y).toLong).sum
    assert(f4.sum_g == expG)
  }

  test("dHashVideoFrames: per-frame hashes == dHashImages of each sampled frame") {
    val media = Multimodal.withVideoMedia(Seq(5L, 8L).toDF("doc_id"), "doc_id")
    val got = Multimodal.dHashVideoFrames(media, "doc_id", stride = 2)
      .collect().map(f => (f.doc_id, f.frame_idx) -> f.dhash).toMap
    // id 5: 7 frames → sampled 0,2,4,6; id 8: 4 frames → sampled 0,2
    assert(got.keySet == Set((5L, 0), (5L, 2), (5L, 4), (5L, 6), (8L, 0), (8L, 2)))
    // each sampled frame's hash equals dHashImages run on that frame's
    // standalone PNG — the same decode, the same grid
    for (((id, f), h) <- got) {
      val fid = Multimodal.videoFrameId(id, f)
      val still = Seq(fid).toDF("doc_id")
      val frameMedia = still.as[Long].mapPartitions(_.map(i =>
        (i, "image", Multimodal.pngPayload(i)))).toDF("doc_id", "kind", "payload")
      val expected = Multimodal.dHashImages(frameMedia, "doc_id")
        .as[(Long, Long)].collect().head._2
      assert(h == expected, s"doc $id frame $f")
    }
  }

  test("aHashAudio: fingerprint matches the formula replay over REAL WAV decodes") {
    val ids = Seq(1L, 3L, 7L, 9L).toDF("doc_id")
    val media = Multimodal.withRealMedia(ids, "doc_id")
    val got = Multimodal.aHashAudio(media, "doc_id", frames = 33)
      .as[(Long, Long)].collect().toMap
    def expected(id: Long): Long = {
      val n = Multimodal.wavSamples(id)
      val e = new Array[Long](33)
      for (i <- 0 until n) e(i * 33 / n) += Multimodal.pcm(id, i)
      (0 until 32).filter(j => e(j + 1) > e(j)).map(1L << _).sum
    }
    ids.as[Long].collect().foreach(id => assert(got(id) == expected(id), s"id $id"))
    // deterministic across decodes
    assert(Multimodal.aHashAudio(media, "doc_id", frames = 33)
      .as[(Long, Long)].collect().toMap == got)
  }

  test("dHashImages: deterministic, matches the formula replay, PNG ≡ BMP") {
    // lossless even ids only (the q203 filter); id 8 is png, id 2/4/10 bmp
    val ids = Seq(2L, 4L, 8L, 10L).toDF("doc_id")
    val media = Multimodal.withRealMedia(ids, "doc_id")
    val got = Multimodal.dHashImages(media, "doc_id")
      .as[(Long, Long)].collect().toMap
    // independent replay from the content formulas (what the q203 oracle
    // does in SQL) — proves the hash came from genuinely decoded pixels
    def expected(id: Long): Long = {
      val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
      def gray(gx: Int, gy: Int): Int = {
        val x = gx * w / 9; val y = gy * h / 4
        (Multimodal.pxR(id, x, y) + Multimodal.pxG(id, x, y) +
          Multimodal.pxB(id, x, y)) / 3
      }
      (for { j <- 0 until 4; i <- 0 until 8
             if gray(i + 1, j) > gray(i, j) } yield 1L << (j * 8 + i)).sum
    }
    ids.as[Long].collect().foreach { id =>
      assert(got(id) == expected(id), s"id $id")
    }
    // re-run: bit-identical (codec round trip is deterministic)
    val again = Multimodal.dHashImages(media, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(again == got)
  }
}
