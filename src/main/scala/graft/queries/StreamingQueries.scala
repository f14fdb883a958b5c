package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.streaming.Streaming

/** Streaming-shared and multimodal query surface. q29's aggregation is the
  * exact transform the streaming module runs over the file source — one
  * implementation, batch-verified here, stream-tested in StreamingSpec.
  */
object StreamingQueries {

  // q220 constants (declared before `all` — the Q.sql calls evaluate the
  // oracle during `all`'s initialization)
  private val MfDim = 8
  private val MfPlanes = 8
  private val MfTables = 4
  private val MfCap = 128
  private val MfThreshold = 0.9

  // q227 (cross-modal margin alignment) constants
  private val MmPlanes = 8
  private val MmTables = 4
  private val MmCap = 256
  private val MmK = 4
  private val MmMargin = 1.0

  val all: Seq[Q] = Seq(

    Q.sql("q29_hourly_events",
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |       event_type,
        |       count(*) AS n,
        |       cast(sum(cast(value as decimal(18,4))) as double) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Streaming.hourlyEventStats(Tables.events(s, d))
        .select(
          col("hour_ts").cast("timestamp").cast("long").as("hour_epoch"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("hour_epoch", "event_type")
    },

    // Multimodal REAL-codec round trip: deterministic media content is
    // encoded through the JDK's production PNG/JPEG/BMP/WAV codecs
    // (javax.imageio / javax.sound.sampled — container varies by id), then
    // decodeMedia PARSES the container bytes and emits integer pixel/sample
    // statistics plus the MAGIC-BYTE-sniffed container. The oracle replays
    // the content formulas and the expected container in SQL — a hash match
    // proves the round trip preserved every pixel and sample through the
    // TWO lossless image codecs, not just that plumbing ran. JPEG rows
    // (the container a real crawl serves) verify the geometry/metadata
    // path: decoded dimensions + sniffed container, with pixel sums masked
    // NULL on both engines — DCT quantization is not SQL-replayable, and
    // the mask keys off the SNIFFED container, so a row that failed to
    // round-trip as a real JPEG would unmask and hash-mismatch.
    Q.sql("q30_multimodal_features",
      """WITH img AS (
        |  SELECT doc_id, CAST(doc_id % 8 + 2 AS INT) AS width,
        |         CAST(doc_id % 6 + 2 AS INT) AS height,
        |         CASE WHEN doc_id % 4 = 0 THEN 'png'
        |              WHEN doc_id % 8 = 6 THEN 'jpeg' ELSE 'bmp' END AS container
        |  FROM documents WHERE doc_id % 2 = 0
        |), px AS (
        |  SELECT i.doc_id, i.container, i.width, i.height,
        |         CASE WHEN i.container = 'jpeg' THEN NULL
        |              ELSE CAST(sum((i.doc_id*31 + x.range*7 + y.range*13) % 256) AS BIGINT) END AS sum_r,
        |         CASE WHEN i.container = 'jpeg' THEN NULL
        |              ELSE CAST(sum((i.doc_id*17 + x.range*11 + y.range*5) % 256) AS BIGINT) END AS sum_g,
        |         CASE WHEN i.container = 'jpeg' THEN NULL
        |              ELSE CAST(sum((i.doc_id*7  + x.range*3 + y.range*19) % 256) AS BIGINT) END AS sum_b
        |  FROM img i, range(0, 10) x, range(0, 8) y
        |  WHERE x.range < i.width AND y.range < i.height
        |  GROUP BY 1, 2, 3, 4
        |), smp AS (
        |  SELECT d.doc_id, CAST(d.doc_id % 50 + 20 AS BIGINT) AS n_samples,
        |         CAST(sum((d.doc_id*13 + s.range*7) % 256) AS BIGINT) AS sum_pcm
        |  FROM documents d, range(0, 70) s
        |  WHERE d.doc_id % 2 = 1 AND s.range < d.doc_id % 50 + 20
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, 'image' AS kind, container, width, height, sum_r, sum_g, sum_b,
        |       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS BIGINT) AS sum_pcm,
        |       CAST(NULL AS INT) AS sample_rate
        |FROM px
        |UNION ALL
        |SELECT doc_id, 'audio', 'wav', NULL, NULL, NULL, NULL, NULL,
        |       n_samples, sum_pcm, 8000
        |FROM smp
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val media = Multimodal.withRealMedia(Tables.documents(s, d), "doc_id")
      val dec = Multimodal.decodeMedia(media, "doc_id").toDF()
      // lossy containers: mask pixel sums off the SNIFFED container
      val jpeg = col("container") === "jpeg"
      dec.select(col("doc_id"), col("kind"), col("container"),
          col("width"), col("height"),
          when(jpeg, lit(null)).otherwise(col("sum_r")).cast("long").as("sum_r"),
          when(jpeg, lit(null)).otherwise(col("sum_g")).cast("long").as("sum_g"),
          when(jpeg, lit(null)).otherwise(col("sum_b")).cast("long").as("sum_b"),
          col("n_samples"), col("sum_pcm"), col("sample_rate"))
        .orderBy("doc_id")
    },

    // REAL media transforms over the decoded payloads: nearest-neighbour
    // 4×4 resize (integer source mapping ⌊t·dim/4⌋ — bit-reproducible,
    // unlike interpolated scaling) and every-4th-sample audio frame
    // sampling. The oracle replays the NN source mapping and the sample
    // stride against the content formulas — a hash match proves the
    // transform ran on genuinely decoded bytes and picked exactly the
    // right source pixels/samples.
    Q.sql("q88_multimodal_transforms",
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h,
        |         CASE WHEN doc_id % 4 = 0 THEN 'png'
        |              WHEN doc_id % 8 = 6 THEN 'jpeg' ELSE 'bmp' END AS container
        |  FROM documents WHERE doc_id % 2 = 0
        |), px AS (
        |  SELECT doc_id, container,
        |         CASE WHEN container = 'jpeg' THEN NULL
        |              ELSE CAST(sum((doc_id*31 + ((tx.range*w)//4)*7 + ((ty.range*h)//4)*13) % 256) AS BIGINT) END AS sum_r,
        |         CASE WHEN container = 'jpeg' THEN NULL
        |              ELSE CAST(sum((doc_id*17 + ((tx.range*w)//4)*11 + ((ty.range*h)//4)*5) % 256) AS BIGINT) END AS sum_g,
        |         CASE WHEN container = 'jpeg' THEN NULL
        |              ELSE CAST(sum((doc_id*7  + ((tx.range*w)//4)*3 + ((ty.range*h)//4)*19) % 256) AS BIGINT) END AS sum_b
        |  FROM img, range(0, 4) tx, range(0, 4) ty
        |  GROUP BY 1, 2
        |), aud AS (
        |  SELECT doc_id, unnest(generate_series(0, doc_id % 50 + 19)) AS i
        |  FROM documents WHERE doc_id % 2 = 1
        |), smp AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         CAST(sum((doc_id*13 + i*7) % 256) AS BIGINT) AS sum_kept
        |  FROM aud WHERE i % 4 = 0 GROUP BY 1
        |)
        |SELECT doc_id, 'image' AS kind, container, sum_r, sum_g, sum_b,
        |       CAST(NULL AS BIGINT) AS n_kept, CAST(NULL AS BIGINT) AS sum_kept
        |FROM px
        |UNION ALL
        |SELECT doc_id, 'audio', 'wav', NULL, NULL, NULL, n_kept, sum_kept
        |FROM smp
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val media = Multimodal.withRealMedia(Tables.documents(s, d), "doc_id")
      val tr = Multimodal.transformMedia(media, "doc_id", targetW = 4,
          targetH = 4, stride = 4).toDF()
      val jpeg = col("container") === "jpeg"
      tr.select(col("doc_id"), col("kind"), col("container"),
          when(jpeg, lit(null)).otherwise(col("sum_r")).cast("long").as("sum_r"),
          when(jpeg, lit(null)).otherwise(col("sum_g")).cast("long").as("sum_g"),
          when(jpeg, lit(null)).otherwise(col("sum_b")).cast("long").as("sum_b"),
          col("n_kept"), col("sum_kept"))
        .orderBy("doc_id")
    },

    // Perceptual near-duplicate images (Multimodal.dHashImages): dHash
    // over the REAL decoded pixels (lossless containers only — the q30
    // JPEG rule), then byte-banded LSH over the 32-bit hashes: candidate
    // pairs share at least one hash byte at the same position (the q105
    // banding discipline, hot buckets capped), exact Hamming ≤ 8 verified
    // row-locally via bit_count(xor). The oracle replays the grid
    // sampling, luminance, bit packing, bands, cap, and Hamming —
    // a hash match proves the pipeline ran on genuinely decoded bytes.
    Q.sql("q203_image_phash_neardup",
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 8 <> 6),
        |g AS (
        |  SELECT i.doc_id,
        |         CAST(SUM(CASE WHEN
        |           ((i.doc_id*31 + (((gx.range+1)*w)//9)*7 + ((gy.range*h)//4)*13) % 256
        |            + (i.doc_id*17 + (((gx.range+1)*w)//9)*11 + ((gy.range*h)//4)*5) % 256
        |            + (i.doc_id*7  + (((gx.range+1)*w)//9)*3  + ((gy.range*h)//4)*19) % 256) // 3
        |           >
        |           ((i.doc_id*31 + ((gx.range*w)//9)*7 + ((gy.range*h)//4)*13) % 256
        |            + (i.doc_id*17 + ((gx.range*w)//9)*11 + ((gy.range*h)//4)*5) % 256
        |            + (i.doc_id*7  + ((gx.range*w)//9)*3  + ((gy.range*h)//4)*19) % 256) // 3
        |           THEN (CAST(1 AS BIGINT) << CAST(gy.range*8 + gx.range AS INT))
        |           ELSE 0 END) AS BIGINT) AS dhash
        |  FROM img i, range(0, 8) gx, range(0, 4) gy
        |  GROUP BY 1),
        |band AS (
        |  SELECT doc_id, dhash, k.range AS k,
        |         (dhash >> CAST(k.range*8 AS INT)) & 255 AS b
        |  FROM g, range(0, 4) k),
        |ok AS (SELECT k, b FROM band GROUP BY 1, 2 HAVING count(*) <= 50),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |         a.dhash AS ha, c.dhash AS hb
        |  FROM band a
        |  JOIN ok o ON o.k = a.k AND o.b = a.b
        |  JOIN band c ON c.k = a.k AND c.b = a.b AND a.doc_id < c.doc_id)
        |SELECT id_a, id_b,
        |       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val losslessImgs = Tables.documents(s, d)
        .where(col("doc_id") % 2 === 0 && col("doc_id") % 8 =!= 6)
      val hashes = Multimodal.dHashImages(
        Multimodal.withRealMedia(losslessImgs, "doc_id"), "doc_id")
      val band = hashes.select(col("doc_id"), col("dhash"),
          explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("b", expr("shiftright(dhash, cast(k * 8 as int)) & 255"))
      val ok = band.groupBy("k", "b").agg(count(lit(1)).as("n"))
        .where(col("n") <= 50).select("k", "b")
      val cand = band.join(ok, Seq("k", "b"))
        .select(col("doc_id").as("id_a"), col("dhash").as("ha"),
          col("k"), col("b"))
        .join(band.join(ok, Seq("k", "b"))
          .select(col("doc_id").as("id_b"), col("dhash").as("hb"),
            col("k"), col("b")),
          Seq("k", "b"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "ha", "hb").distinct()
      cand.withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
        .where(col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    },

    // REAL decoded bytes → pooled feature vectors → the EMBEDDING ops:
    // `mediaFeatures` pools genuine ImageIO-decoded luminance into 8-dim
    // centered vectors (every step integer-exact or IEEE-identical), and
    // the result feeds Dedup.embeddingNearDups' hyperplane-LSH path
    // UNCHANGED — the point of the query: the multimodal decode plumbs
    // into the existing vector operators, it is not a parallel stack.
    // Lossless containers only (the q30/q203 JPEG rule). The oracle
    // replays content → grays → bucket means → planes → buckets → cap →
    // cosines, so a hash match proves the features came from genuinely
    // decoded pixels AND rode the standard LSH pipeline.
    // VIDEO frame sampling over a REAL multi-frame container: each doc
    // carries a GVID payload (length-prefixed genuine PNG frames — the
    // JDK ships no video codec, and an opaque container whose FRAME
    // EXTRACTION is the pipeline's job is the honest model anyway); every
    // 2nd frame is length-skipped or DECODED through ImageIO, emitting
    // geometry + channel sums. Unsampled frames are never decoded — the
    // frame-sampling cost contract at 100 TB. The oracle replays frame
    // ids → sampled indices → pixel sums, so a hash match proves the
    // sampled frames were genuinely parsed out of the container.
    Q.sql("q225_video_frame_sample",
      """WITH v AS (
        |  SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS n FROM documents),
        |fr AS (
        |  SELECT doc_id, n, f.range AS f, doc_id*1000 + f.range AS fid
        |  FROM v, range(0, 7) f WHERE f.range < n AND f.range % 2 = 0),
        |px AS (
        |  SELECT doc_id, n, f,
        |         CAST(fid % 8 + 2 AS INT) AS width,
        |         CAST(fid % 6 + 2 AS INT) AS height,
        |         CAST(sum((fid*31 + x.range*7 + y.range*13) % 256) AS BIGINT) AS sum_r,
        |         CAST(sum((fid*17 + x.range*11 + y.range*5) % 256) AS BIGINT) AS sum_g,
        |         CAST(sum((fid*7  + x.range*3 + y.range*19) % 256) AS BIGINT) AS sum_b
        |  FROM fr, range(0, 10) x, range(0, 8) y
        |  WHERE x.range < fid % 8 + 2 AND y.range < fid % 6 + 2
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT doc_id, CAST(n AS INT) AS n_frames, CAST(f AS INT) AS frame_idx,
        |       width, height, sum_r, sum_g, sum_b
        |FROM px ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      val media = Multimodal.withVideoMedia(
        graft.io.Tables.documents(s, d), "doc_id")
      Multimodal.sampleVideoFrames(media, "doc_id", stride = 2).toDF()
        .orderBy("doc_id", "frame_idx")
    },

    // Perceptual near-duplicate AUDIO (Multimodal.aHashAudio — the q203
    // construction at the PCM frame grain): 32 energy-delta-sign bits
    // over 33 equal frame spans of the REAL decoded samples, then the
    // same byte-banded LSH + exact-Hamming verify as the image path. The
    // oracle replays samples → frame mapping → energies → bits → bands →
    // cap → Hamming, so a hash match proves the fingerprints came from a
    // genuine WAV container parse.
    Q.sql("q224_audio_fingerprint_neardup",
      """WITH aud AS (
        |  SELECT doc_id, CAST(doc_id % 50 + 20 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 2 = 1),
        |smp AS (
        |  SELECT a.doc_id, a.n, i.range AS i,
        |         (a.doc_id*13 + i.range*7) % 256 AS s
        |  FROM aud a, range(0, 70) i WHERE i.range < a.n),
        |en AS (
        |  SELECT doc_id, (i * 33) // n AS j, CAST(sum(s) AS BIGINT) AS e
        |  FROM smp GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.doc_id, g.j, coalesce(en.e, 0) AS e
        |  FROM (SELECT a.doc_id, r.range AS j
        |        FROM aud a, range(0, 33) r) g
        |  LEFT JOIN en ON en.doc_id = g.doc_id AND en.j = g.j),
        |h AS (
        |  SELECT g1.doc_id,
        |         CAST(SUM(CASE WHEN g2.e > g1.e
        |                       THEN (CAST(1 AS BIGINT) << CAST(g1.j AS INT))
        |                       ELSE 0 END) AS BIGINT) AS ahash
        |  FROM grid g1 JOIN grid g2
        |    ON g2.doc_id = g1.doc_id AND g2.j = g1.j + 1
        |  WHERE g1.j < 32 GROUP BY 1),
        |band AS (
        |  SELECT doc_id, ahash, k.range AS k,
        |         (ahash >> CAST(k.range*8 AS INT)) & 255 AS b
        |  FROM h, range(0, 4) k),
        |ok AS (SELECT k, b FROM band GROUP BY 1, 2 HAVING count(*) <= 50),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |         a.ahash AS ha, c.ahash AS hb
        |  FROM band a
        |  JOIN ok o ON o.k = a.k AND o.b = a.b
        |  JOIN band c ON c.k = a.k AND c.b = a.b AND a.doc_id < c.doc_id)
        |SELECT id_a, id_b,
        |       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val audio = graft.io.Tables.documents(s, d)
        .where(col("doc_id") % 2 === 1)
      val hashes = Multimodal.aHashAudio(
        Multimodal.withRealMedia(audio, "doc_id"), "doc_id", frames = 33)
      val band = hashes.select(col("doc_id"), col("ahash"),
          explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("b", expr("shiftright(ahash, cast(k * 8 as int)) & 255"))
      val ok = band.groupBy("k", "b").agg(count(lit(1)).as("n"))
        .where(col("n") <= 50).select("k", "b")
      val cand = band.join(ok, Seq("k", "b"))
        .select(col("doc_id").as("id_a"), col("ahash").as("ha"),
          col("k"), col("b"))
        .join(band.join(ok, Seq("k", "b"))
          .select(col("doc_id").as("id_b"), col("ahash").as("hb"),
            col("k"), col("b")),
          Seq("k", "b"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "ha", "hb").distinct()
      cand.withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
        .where(col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    },

    Q.sql("q220_media_feature_neardup", mediaFeatureOracle) { (s, d) =>
      val lossless = graft.io.Tables.documents(s, d)
        .where(col("doc_id") % 2 === 0 && col("doc_id") % 8 =!= 6)
      val feats = Multimodal.mediaFeatures(
        Multimodal.withRealMedia(lossless, "doc_id"), "doc_id", dim = MfDim)
      graft.operators.Dedup.embeddingNearDups(feats, "doc_id", "features",
          threshold = MfThreshold,
          lsh = Some((MfDim, MfPlanes, MfTables)),
          maxBucketSize = Some(MfCap))
        .select(col("id_a"), col("id_b"),
          graft.queries.Qutil.dround(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    },

    // VIDEO near-duplicate detection — the modality×dedup matrix's last
    // cell, composed from the verified parts: sampled-frame REAL PNG
    // decode (q225's skip-by-length contract — unsampled frames are never
    // parsed) → per-frame dHash (q203's construction) → per-video
    // fingerprint SEQUENCE → byte-banded LSH keyed by (frame_idx, band,
    // byte) → exact per-frame Hamming verify with a matched-frame-fraction
    // threshold (never all-pairs; hot buckets capped). The decoded hash
    // frame is pinned once and feeds banding AND verification — decode
    // cost is one pass over kept frames at any scale. The oracle replays
    // frame ids → pixels → grid grays → hash bits → bands → cap →
    // Hamming → fraction, so a hash match proves the pipeline ran on
    // genuinely parsed containers end to end.
    Q.sql("q226_video_neardup", q226OracleSql) { (s, d) =>
      val (fh, agg) = videoNearDupAgg(s, d)
      agg.select(col("id_a"), col("id_b"), col("n_common"), col("n_matched"),
          graft.queries.Qutil.dround(
            col("n_matched").cast("double") / col("n_common"), 6)
            .as("match_frac"))
        .orderBy("id_a", "id_b")
    },

    // Video near-dup CLUSTERS with a keep-best representative — the q226
    // pairs composed with the verified dedup machinery
    // (Dedup.duplicateClusters — alternating-propagation CC with lineage
    // rebase, pair-bounded at scale) plus the keep-best rule every dedup
    // pipeline ends with: per cluster keep the video with the MOST FRAMES
    // (from the decoded container, not the id), ties to the lowest id.
    // The oracle replays pairs → symmetric edges → recursive reachability
    // min → frame-count argmax.
    Q.sql("q228_video_dedup_keepbest", {
      val pairCtes = q226PairCtes
      s"""WITH RECURSIVE ${pairCtes.stripPrefix("WITH ")},
         |dup AS (SELECT id_a, id_b FROM agg WHERE n_matched * 2 >= n_common),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
         |          UNION SELECT id_b, id_a FROM dup),
         |reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.src, t.r FROM edges e JOIN reach t ON t.id = e.dst),
         |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |kb AS (
         |  SELECT id, cluster_id, CAST(id % 6 + 2 AS INT) AS n_frames,
         |         row_number() OVER (PARTITION BY cluster_id
         |                            ORDER BY (id % 6 + 2) DESC, id) AS rn
         |  FROM cc)
         |SELECT id AS doc_id, cluster_id, n_frames, rn = 1 AS kept
         |FROM kb ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val (fh, agg) = videoNearDupAgg(s, d)
      val pairs = agg.where(col("n_matched") * 2 >= col("n_common"))
        .select("id_a", "id_b")
      val clusters = graft.operators.Dedup.duplicateClusters(pairs)
      // keep-best on the DECODED frame count (fh carries n_frames from the
      // container parse), not the generator formula
      val nf = fh.select(col("doc_id").as("id"), col("n_frames")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(col("n_frames").desc, col("id").asc)
      clusters.join(nf, "id")
        .withColumn("rn", row_number().over(w))
        .select(col("id").as("doc_id"), col("cluster_id"), col("n_frames"),
          (col("rn") === 1).as("kept"))
        .orderBy("doc_id")
    },

    // CROSS-MODAL alignment end to end: REAL decoded image pixels →
    // pooled 8-dim feature vectors (Multimodal.mediaFeatures — the q220
    // stage) aligned against TEXT-side embedding vectors (the embeddings
    // table, sliced to the shared 8-dim space) through
    // Similarity.marginMine UNCHANGED — the caption↔image mining shape the
    // operator was built for, previously only exercised on same-space
    // synthetic halves (q217's vec_id parity split). Candidates come from
    // the shared hyperplane bands over the UNION of both modalities (one
    // banding pass, capped hot buckets), margins normalize by both sides'
    // retrieved-k-NN averages, mutual best only. The oracle replays
    // pixels → grays → bucket means → planes → buckets → cap → cosines →
    // k-NN averages → margins → mutual argmax, so a hash match proves the
    // decode output composes with the alignment operator bit-for-bit.
    Q.sql("q227_crossmodal_margin_align", crossModalOracle) { (s, d) =>
      val lossless = graft.io.Tables.documents(s, d)
        .where(col("doc_id") % 2 === 0 && col("doc_id") % 8 =!= 6)
      val imgFeats = Multimodal.mediaFeatures(
          Multimodal.withRealMedia(lossless, "doc_id"), "doc_id", dim = MfDim)
        .select(col("doc_id").as("mid"), col("features").as("mvec"))
      val txt = Tables.embeddings(s, d)
        .select(col("vec_id").as("mid"),
          expr(s"slice(cast(embedding as array<double>), 1, $MfDim)")
            .as("mvec"))
      graft.operators.Similarity.marginMine(imgFeats, txt, "mid", "mvec",
          k = MmK, minMargin = MmMargin,
          lsh = Some((MfDim, MmPlanes, MmTables)),
          maxBucketSize = Some(MmCap))
        .orderBy("src_id", "tgt_id")
    })

  /** Shared Spark half of q226/q228: decode-once pinned frame-hash table +
    * the banded-candidate → per-frame-Hamming aggregate (id_a, id_b,
    * n_common, n_matched). */
  private def videoNearDupAgg(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val media = Multimodal.withVideoMedia(graft.io.Tables.documents(s, d), "doc_id")
    // decoded ONCE: the frame-hash table feeds banding (twice via the
    // self-join) and the per-frame verify (twice) — uncached, each
    // consumer would re-decode every sampled frame (caller-released pin)
    val fh = graft.PinnedFrames.pin(
      Multimodal.dHashVideoFrames(media, "doc_id", stride = 2).toDF()
        .select("doc_id", "n_frames", "frame_idx", "dhash").persist())
    val band = fh.select(col("doc_id"), col("frame_idx"), col("dhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("b", expr("shiftright(dhash, cast(k * 8 as int)) & 255"))
      .select("doc_id", "frame_idx", "k", "b")
    val ok = band.groupBy("frame_idx", "k", "b").agg(count(lit(1)).as("n"))
      .where(col("n") <= 50).select("frame_idx", "k", "b")
    val bandOk = band.join(ok, Seq("frame_idx", "k", "b"))
    // id-only candidates (the q217 discipline): the bucket self-join and
    // the distinct shuffle ids only; hashes re-attach from the pinned
    // frame afterwards
    val cand = bandOk.select(col("doc_id").as("id_a"),
        col("frame_idx"), col("k"), col("b"))
      .join(bandOk.select(col("doc_id").as("id_b"),
        col("frame_idx"), col("k"), col("b")),
        Seq("frame_idx", "k", "b"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val pf = cand
      .join(fh.select(col("doc_id").as("id_a"), col("frame_idx"),
        col("dhash").as("ha")), Seq("id_a"))
      .join(fh.select(col("doc_id").as("id_b"), col("frame_idx"),
        col("dhash").as("hb")), Seq("id_b", "frame_idx"))
      .withColumn("ham", expr("bit_count(ha ^ hb)"))
    val agg = pf.groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"),
        sum(when(col("ham") <= 8, 1L).otherwise(0L)).as("n_matched"))
      .where(col("n_matched") * 2 >= col("n_common"))
    (fh, agg)
  }

  /** Shared oracle CTE chain for q226/q228: documents → sampled frame ids →
    * per-frame dHash replay → bands → cap → candidates → per-frame Hamming
    * aggregate `agg` (id_a, id_b, n_common, n_matched ≥ half matched). */
  /** Shared oracle CTE chain for q226/q228: documents -> sampled frame
    * ids -> per-frame dHash replay -> bands -> cap -> candidates ->
    * per-frame Hamming aggregate `agg` (id_a, id_b, n_common, n_matched;
    * consumers apply the matched-majority filter). */
  private lazy val q226PairCtes: String =
      """WITH v AS (
        |  SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS n FROM documents),
        |fr AS (
        |  SELECT doc_id, f.range AS f, doc_id*1000 + f.range AS fid,
        |         (doc_id*1000 + f.range) % 8 + 2 AS w,
        |         (doc_id*1000 + f.range) % 6 + 2 AS h
        |  FROM v, range(0, 7) f WHERE f.range < n AND f.range % 2 = 0),
        |g AS (
        |  SELECT fr.doc_id, fr.f,
        |         CAST(SUM(CASE WHEN
        |           ((fid*31 + (((gx.range+1)*w)//9)*7 + ((gy.range*h)//4)*13) % 256
        |            + (fid*17 + (((gx.range+1)*w)//9)*11 + ((gy.range*h)//4)*5) % 256
        |            + (fid*7  + (((gx.range+1)*w)//9)*3  + ((gy.range*h)//4)*19) % 256) // 3
        |           >
        |           ((fid*31 + ((gx.range*w)//9)*7 + ((gy.range*h)//4)*13) % 256
        |            + (fid*17 + ((gx.range*w)//9)*11 + ((gy.range*h)//4)*5) % 256
        |            + (fid*7  + ((gx.range*w)//9)*3  + ((gy.range*h)//4)*19) % 256) // 3
        |           THEN (CAST(1 AS BIGINT) << CAST(gy.range*8 + gx.range AS INT))
        |           ELSE 0 END) AS BIGINT) AS dhash
        |  FROM fr, range(0, 8) gx, range(0, 4) gy
        |  GROUP BY 1, 2),
        |band AS (
        |  SELECT doc_id, f, dhash, k.range AS k,
        |         (dhash >> CAST(k.range*8 AS INT)) & 255 AS b
        |  FROM g, range(0, 4) k),
        |ok AS (SELECT f, k, b FROM band GROUP BY 1, 2, 3
        |       HAVING count(*) <= 50),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM band a
        |  JOIN ok o ON o.f = a.f AND o.k = a.k AND o.b = a.b
        |  JOIN band c ON c.f = a.f AND c.k = a.k AND c.b = a.b
        |              AND a.doc_id < c.doc_id),
        |pf AS (
        |  SELECT cand.id_a, cand.id_b, ga.f,
        |         bit_count(xor(ga.dhash, gb.dhash)) AS ham
        |  FROM cand
        |  JOIN g ga ON ga.doc_id = cand.id_a
        |  JOIN g gb ON gb.doc_id = cand.id_b AND gb.f = ga.f),
        |agg AS (
        |  SELECT id_a, id_b, count(*) AS n_common,
        |         CAST(sum(CASE WHEN ham <= 8 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_matched
        |  FROM pf GROUP BY 1, 2)
        |""".stripMargin.trim

  private lazy val q226OracleSql: String =
    s"""$q226PairCtes
       |SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common, n_matched,
       |       floor(CAST(n_matched AS DOUBLE) / n_common * 1000000 + 0.5)
       |         / 1000000 AS match_frac
       |FROM agg WHERE n_matched * 2 >= n_common
       |ORDER BY 1, 2""".stripMargin



  // --- q220 oracle: pooled media features replayed in DuckDB ---
  private lazy val mediaFeatureOracle: String = {
    def planeLit(t: Int, p: Int): String =
      graft.operators.Similarity.planeVec(t, p, MfDim)
        .map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    def dotPlane(vec: String, t: Int, p: Int): String =
      s"list_reduce(list_transform(generate_series(1, $MfDim), i -> $vec[i] * (${planeLit(t, p)})[i]), (a, b) -> a + b)"
    val bandSelects = (0 until MfTables).map { t =>
      val bucket = (0 until MfPlanes).map { p =>
        s"(CASE WHEN ${dotPlane("v", t, p)} > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT doc_id, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM f"
    }.mkString("\n  UNION ALL ")
    def fold(a: String, b: String): String =
      s"list_reduce(list_transform(generate_series(1, $MfDim), i -> $a[i] * $b[i]), (x, y) -> x + y)"
    def norm(v: String): String =
      s"sqrt(list_reduce(list_transform($v, x -> x * x), (x, y) -> x + y))"
    s"""WITH img AS (
       |  SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
       |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 8 <> 6),
       |px AS (
       |  SELECT doc_id, (y.range * w + x.range) % $MfDim AS j,
       |         ((doc_id*31 + x.range*7 + y.range*13) % 256
       |        + (doc_id*17 + x.range*11 + y.range*5) % 256
       |        + (doc_id*7  + x.range*3  + y.range*19) % 256) // 3 AS g
       |  FROM img, range(0, 9) x, range(0, 7) y
       |  WHERE x.range < w AND y.range < h),
       |fb AS (SELECT doc_id, j, CAST(sum(g) AS DOUBLE) / count(*) - 128.0 AS fv
       |       FROM px GROUP BY 1, 2),
       |grid AS (SELECT i.doc_id, r.range AS j FROM img i, range(0, $MfDim) r),
       |f AS (
       |  SELECT g.doc_id, list(coalesce(fb.fv, 0.0) ORDER BY g.j) AS v
       |  FROM grid g LEFT JOIN fb ON fb.doc_id = g.doc_id AND fb.j = g.j
       |  GROUP BY g.doc_id),
       |b AS (
       |  $bandSelects),
       |ok AS (SELECT t, bucket FROM b GROUP BY 1, 2 HAVING count(*) <= $MfCap),
       |c AS (SELECT b.doc_id, b.t, b.bucket FROM b
       |      JOIN ok ON ok.t = b.t AND ok.bucket = b.bucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM c x JOIN c y ON x.t = y.t AND x.bucket = y.bucket
       |             AND x.doc_id < y.doc_id),
       |s AS (
       |  SELECT cand.id_a, cand.id_b,
       |         ${fold("fa.v", "fc.v")} / (${norm("fa.v")} * ${norm("fc.v")}) AS cos
       |  FROM cand JOIN f fa ON fa.doc_id = cand.id_a
       |            JOIN f fc ON fc.doc_id = cand.id_b)
       |SELECT id_a, id_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos
       |FROM s WHERE cos >= $MfThreshold ORDER BY 1, 2""".stripMargin
  }

  // --- q227 oracle: image pooled features (the q220 replay) aligned with
  // sliced text embeddings through the FULL margin-mining machinery (the
  // q217 replay) — pixels to mutual-best pairs in one DuckDB text. ---
  private lazy val crossModalOracle: String = {
    def planeLit(t: Int, p: Int): String =
      graft.operators.Similarity.planeVec(t, p, MfDim)
        .map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    def dotPlane(vec: String, t: Int, p: Int): String =
      s"list_reduce(list_transform(generate_series(1, $MfDim), i -> $vec[i] * (${planeLit(t, p)})[i]), (a, b) -> a + b)"
    val bandSelects = (0 until MmTables).map { t =>
      val bucket = (0 until MmPlanes).map { p =>
        s"(CASE WHEN ${dotPlane("v", t, p)} > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vid, side, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM e"
    }.mkString("\n  UNION ALL ")
    def fold(a: String, b: String): String =
      s"list_reduce(list_transform(generate_series(1, $MfDim), i -> $a[i] * $b[i]), (x, y) -> x + y)"
    def norm(v: String): String =
      s"sqrt(list_reduce(list_transform($v, x -> x * x), (x, y) -> x + y))"
    s"""WITH img AS (
       |  SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
       |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 8 <> 6),
       |px AS (
       |  SELECT doc_id, (y.range * w + x.range) % $MfDim AS j,
       |         ((doc_id*31 + x.range*7 + y.range*13) % 256
       |        + (doc_id*17 + x.range*11 + y.range*5) % 256
       |        + (doc_id*7  + x.range*3  + y.range*19) % 256) // 3 AS g
       |  FROM img, range(0, 9) x, range(0, 7) y
       |  WHERE x.range < w AND y.range < h),
       |fb AS (SELECT doc_id, j, CAST(sum(g) AS DOUBLE) / count(*) - 128.0 AS fv
       |       FROM px GROUP BY 1, 2),
       |grid AS (SELECT i.doc_id, r.range AS j FROM img i, range(0, $MfDim) r),
       |f AS (
       |  SELECT g.doc_id, list(coalesce(fb.fv, 0.0) ORDER BY g.j) AS v
       |  FROM grid g LEFT JOIN fb ON fb.doc_id = g.doc_id AND fb.j = g.j
       |  GROUP BY g.doc_id),
       |tgt AS (SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:$MfDim] AS v
       |        FROM embeddings),
       |e AS (SELECT doc_id AS vid, v, 0 AS side FROM f
       |      UNION ALL SELECT vec_id AS vid, v, 1 AS side FROM tgt),
       |b AS (
       |  $bandSelects),
       |ok AS (SELECT t, bucket FROM b GROUP BY t, bucket
       |       HAVING count(*) <= $MmCap),
       |c AS (SELECT b.vid, b.side, b.t, b.bucket FROM b
       |      JOIN ok ON ok.t = b.t AND ok.bucket = b.bucket),
       |cand AS (
       |  SELECT DISTINCT x.vid AS src_id, y.vid AS tgt_id
       |  FROM c x JOIN c y ON x.t = y.t AND x.bucket = y.bucket
       |  WHERE x.side = 0 AND y.side = 1),
       |s0 AS (
       |  SELECT cand.src_id, cand.tgt_id,
       |         floor((${fold("fa.v", "tb.v")}
       |                / (${norm("fa.v")} * ${norm("tb.v")}))
       |               * 1000000 + 0.5) / 1000000 AS cos
       |  FROM cand
       |  JOIN f fa ON fa.doc_id = cand.src_id
       |  JOIN tgt tb ON tb.vec_id = cand.tgt_id),
       |s AS (SELECT * FROM s0 WHERE cos > 0),
       |rs AS (SELECT src_id, cos,
       |              row_number() OVER (PARTITION BY src_id
       |                                 ORDER BY cos DESC, tgt_id) AS rn
       |       FROM s),
       |avs AS (SELECT src_id,
       |               CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)
       |               / CAST(count(*) AS DOUBLE) AS av_s
       |        FROM rs WHERE rn <= $MmK GROUP BY src_id),
       |rt AS (SELECT tgt_id, cos,
       |              row_number() OVER (PARTITION BY tgt_id
       |                                 ORDER BY cos DESC, src_id) AS rn
       |       FROM s),
       |avt AS (SELECT tgt_id,
       |               CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)
       |               / CAST(count(*) AS DOUBLE) AS av_t
       |        FROM rt WHERE rn <= $MmK GROUP BY tgt_id),
       |m AS (SELECT s.src_id, s.tgt_id, s.cos,
       |             s.cos / (0.5 * (av_s + av_t)) AS margin
       |      FROM s JOIN avs USING (src_id) JOIN avt USING (tgt_id)),
       |r AS (SELECT src_id, tgt_id, cos, margin,
       |             row_number() OVER (PARTITION BY src_id
       |                                ORDER BY margin DESC, tgt_id) AS r_s,
       |             row_number() OVER (PARTITION BY tgt_id
       |                                ORDER BY margin DESC, src_id) AS r_t
       |      FROM m)
       |SELECT src_id, tgt_id, cos,
       |       floor(margin * 1000000 + 0.5) / 1000000 AS margin
       |FROM r WHERE r_s = 1 AND r_t = 1 AND margin >= $MmMargin
       |ORDER BY src_id, tgt_id""".stripMargin
  }
}
