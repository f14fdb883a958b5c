package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.io.Tables
import graft.operators.Dedup
import graft.queries.Qutil.dround

/** Text-analysis operators over the `documents` table: token statistics,
  * quality scoring, language ID, fingerprint dedup. The oracle SQL is
  * generated from the same constants (stopword lists) that drive the Spark
  * columns, so the two sides cannot drift.
  */
object TextQueries {

  private def swList(sw: Seq[String]): String =
    sw.map(w => s"'$w'").mkString("[", ", ", "]")

  private val enSw = TextFunctions.langStopwords.head._2

  /** The English stopword list as a SQL array literal — shared with the
    * q58 composition-report oracle so the quality formula cannot drift. */
  private[queries] val enSwList: String = swList(enSw)

  /** Shared CTE: whitespace tokens with the empty-doc guard. */
  private[queries] val wsCte =
    """WITH t AS (
      |  SELECT doc_id, text,
      |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |              ELSE string_split_regex(trim(text), '\s+') END AS ws
      |  FROM documents)""".stripMargin

  private[queries] val langCascadeSql: String = {
    val scores = TextFunctions.langStopwords.map { case (lang, sw) =>
      lang -> s"len(list_filter(ws, w -> list_contains(${swList(sw)}, w)))"
    }
    val branches = scores.zipWithIndex.map { case ((lang, expr), i) =>
      val later = scores.drop(i + 1).map(_._2)
      val cond = (s"$expr > 0" +: later.map(l => s"$expr >= $l")).mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${branches.mkString(" ")} ELSE 'unknown' END"
  }

  /** q94 classifier model (config: an offline-trained logistic model). */
  private val QcW = (1.5, 2.0, -3.0, 1.0)
  private val QcBias = -1.2
  private val QcThreshold = 0.5

  /** Shared CTE chain ending in p(doc_id, p_quality) — q94's scoring
    * replay, reused verbatim by the model-eval queries (q196/q197):
    * their contract is exactly "same scores, evaluated". */
  private lazy val qcScoreCtes: String = {
    val f1 = "least(CAST(len(ws) AS DOUBLE) / 100, 1e0)"
    val f2 = s"""(CASE WHEN len(ws) = 0 THEN 0e0
                |  ELSE CAST(len(list_filter(ws, w -> list_contains($enSwList, w))) AS DOUBLE) / len(ws) END)""".stripMargin
    val f3 = """(CASE WHEN length(text) = 0 THEN 0e0
               |  ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END)""".stripMargin
    val f4 = """least((CASE WHEN len(ws) = 0 THEN 0e0
               |  ELSE CAST(list_reduce(list_transform(ws, w -> length(w)), (a, b) -> a + b) AS DOUBLE) / len(ws) END) / 10, 1e0)""".stripMargin
    val (w1, w2, w3, w4) = QcW
    s"""$wsCte,
       |z AS (
       |  SELECT doc_id,
       |         $f1 * ${w1}e0
       |         + $f2 * ${w2}e0
       |         + $f3 * ${w3}e0
       |         + $f4 * ${w4}e0
       |         + ${QcBias}e0 AS z
       |  FROM t),
       |p AS (SELECT doc_id, floor((1e0 / (1e0 + exp(-z))) * 1e6 + 5e-1) / 1e6 AS p_quality FROM z)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Token counting, word-length, punctuation, stopword ratio, composite
    // quality score — single-pass codegen'd column functions.
    Q.sql("q18_text_stats",
      s"""$wsCte
         |SELECT doc_id,
         |       len(ws) AS n_tokens,
         |       CASE WHEN len(ws) = 0 THEN 0.0
         |            ELSE CAST(list_reduce(list_transform(ws, w -> length(w)), (a, b) -> a + b) AS DOUBLE) / len(ws)
         |       END AS mean_word_len,
         |       CASE WHEN length(text) = 0 THEN 0.0
         |            ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text)
         |       END AS punct_ratio,
         |       CASE WHEN len(ws) = 0 THEN 0.0
         |            ELSE CAST(len(list_filter(ws, w -> list_contains(${swList(enSw)}, w))) AS DOUBLE) / len(ws)
         |       END AS stopword_ratio,
         |       floor(greatest(0.0, least(1.0,
         |         least(CAST(len(ws) AS DOUBLE) / 100, 1.0) * 0.4
         |         + least((CASE WHEN len(ws) = 0 THEN 0.0
         |                       ELSE CAST(len(list_filter(ws, w -> list_contains(${swList(enSw)}, w))) AS DOUBLE) / len(ws) END) * 4, 1.0) * 0.4
         |         + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
         |                              ELSE CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) / length(text) END) * 5, 1.0)) * 0.2
         |       )) * 10000 + 0.5) / 10000 AS quality
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          tokenCount(col("text")).cast("bigint").as("n_tokens"),
          meanWordLen(col("text")).as("mean_word_len"),
          punctRatio(col("text")).as("punct_ratio"),
          stopwordRatio(col("text"), enSw).as("stopword_ratio"),
          dround(qualityScore(col("text"), enSw), 4).as("quality"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic: stopword-hit argmax with deterministic
    // tie-break; cascade generated from the same constant table both sides.
    Q.sql("q19_lang_id",
      s"""$wsCte
         |SELECT doc_id, $langCascadeSql AS lang_guess
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), langId(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    },

    // Exact dedup via normalized-text fingerprint (md5 of casefolded,
    // punct-stripped, whitespace-collapsed text).
    Q.sql("q20_fingerprint_dedup",
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp,
        |       min(doc_id) AS canonical_id,
        |       count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy("fp")
    },

    // Ingest-quality novelty dashboard: per source, how many docs are the
    // FIRST occurrence of their content fingerprint corpus-wide (global
    // first claimed by lowest doc_id — deterministic) vs re-posts of
    // content seen elsewhere. The per-shard duplication report a data
    // team reads before buying/ingesting more of a source. One fp-keyed
    // window + one source-grain aggregate.
    Q.sql("q145_source_novelty",
      """WITH f AS (
        |  SELECT doc_id, source,
        |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |r AS (SELECT source,
        |             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |      FROM f)
        |SELECT source, count(*) AS n_docs,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |       floor(CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS novel_rate
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.documents(s, d).select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      val r = f.withColumn("rn",
        row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
      r.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_novel"))
        .select(col("source"), col("n_docs"), col("n_novel"),
          Qutil.dround(col("n_novel").cast("double") /
            col("n_docs").cast("double"), 6).as("novel_rate"))
        .orderBy("source")
    },

    // Order-sensitive rolling-hash fingerprint: left fold of
    // (acc·B + md5Int(word)) mod M over the word sequence. DuckDB's
    // list_reduce seeds with the first element, which equals the
    // fold-from-0's first step, so the integer sequences are identical.
    Q.sql("q38_rolling_fingerprint",
      s"""$wsCte
         |SELECT doc_id,
         |       CASE WHEN len(ws) = 0 THEN 0
         |            ELSE list_reduce(
         |                   list_transform(ws, w -> ('0x' || substr(md5(w), 1, 8))::BIGINT),
         |                   (a, h) -> (a * ${TextFunctions.RollB} + h) % ${TextFunctions.RollM})
         |       END AS roll_fp
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), rollingFingerprint(col("text")).as("roll_fp"))
        .orderBy("doc_id")
    },

    // BPE-ish token budget: pretokenizer-regex match count next to the
    // whitespace count. The pattern constant is shared with the oracle
    // (quote-escaped), so the two regex engines run the same source.
    Q.sql("q39_bpe_tokens",
      s"""SELECT doc_id,
         |       CASE WHEN length(trim(text)) = 0 THEN 0
         |            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws_tokens,
         |       len(regexp_extract_all(text, '${TextFunctions.BpeTokenRe.replace("'", "''")}')) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          // DuckDB len() is BIGINT; Spark size()/regexp_count are INT —
          // align the driver hash on long (the q03 lesson)
          tokenCount(col("text")).cast("long").as("n_ws_tokens"),
          bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },

    // Model-based quality classifier (Curation.classifierQuality): logistic
    // inference over the q18 feature formulas — weights interpolated from
    // the same Scala doubles with an e0 suffix (DOUBLE, not DECIMAL, in
    // DuckDB), feature terms summed in the same left-assoc order, sigmoid
    // 6dp-rounded before thresholding so keep/drop is engine-exact.
    Q.sql("q94_quality_classifier",
      s"""$qcScoreCtes
         |SELECT doc_id, p_quality,
         |       CAST(CASE WHEN p_quality >= ${QcThreshold}e0 THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Curation.classifierQuality(Tables.documents(s, d),
          "doc_id", "text", QcW, QcBias, enSw, QcThreshold)
        .select(col("doc_id"), col("p_quality"), col("keep"))
        .orderBy("doc_id")
    },

    // Decile gains table for the q94 classifier against the independent
    // lang='en' ground truth — the ranking-eval every curation model
    // ships with ("how concentrated are the positives in the top
    // deciles"). Deciles come from Curation.ntileByBands on the NEGATED
    // score (band histogram — corpus-sized work never single-partitions;
    // the oracle uses plain ntile() as the independent formulation, the
    // equivalence CurationSpec already pins). Cumulative gain over the
    // 10-row decile grain.
    Q.sql("q196_gains_table",
      s"""$qcScoreCtes,
         |lab AS (
         |  SELECT p.doc_id, p.p_quality,
         |         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
         |  FROM p JOIN documents d USING (doc_id)),
         |r AS (SELECT *, ntile(10) OVER (ORDER BY p_quality DESC, doc_id)
         |               AS decile
         |      FROM lab),
         |g AS (SELECT decile, count(*) AS n_docs,
         |             CAST(SUM(pos) AS BIGINT) AS n_pos
         |      FROM r GROUP BY 1),
         |tt AS (SELECT CAST(SUM(pos) AS BIGINT) AS tot FROM lab)
         |SELECT decile, n_docs, n_pos,
         |       floor(CAST(n_pos AS DOUBLE) / n_docs * 1e6 + 0.5) / 1e6
         |         AS pos_rate,
         |       floor(CAST(SUM(n_pos) OVER (ORDER BY decile
         |                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         |             / (SELECT tot FROM tt) * 1e6 + 0.5) / 1e6 AS cum_gain
         |FROM g ORDER BY decile""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val lab = graft.operators.Curation.classifierQuality(docs,
          "doc_id", "text", QcW, QcBias, enSw, QcThreshold)
        .select(col("doc_id"), col("p_quality"))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("pos", when(col("lang") === "en", 1L).otherwise(0L))
        .withColumn("negp", -col("p_quality"))
        .withColumn("one", lit(1))
      val deciled = graft.operators.Curation.ntileByBands(lab, "doc_id",
        "negp", "one", nBuckets = 10, bandDp = 2, bucketCol = "decile")
      val g = deciled.groupBy(col("decile").cast("long").as("decile"))
        .agg(count(lit(1)).as("n_docs"), sum("pos").as("n_pos"))
      val tot = lab.agg(sum("pos").as("tot"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      g.crossJoin(broadcast(tot))
        .withColumn("cum_pos", sum("n_pos").over(wc))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          Qutil.dround(col("n_pos").cast("double") / col("n_docs"), 6)
            .as("pos_rate"),
          Qutil.dround(col("cum_pos").cast("double") / col("tot"), 6)
            .as("cum_gain"))
        .orderBy("decile")
    },

    // Calibration bins (reliability diagram) for the q94 classifier: is
    // a predicted 0.7 actually right 70% of the time against the
    // lang='en' truth? Fixed probability bins (no ranking pass at all —
    // map-only bin assignment + one bin-grain aggregate); mean predicted
    // vs observed rate and the gap per bin. Scores are on q94's 6dp
    // grid, so bin membership and the decimal mean replay exactly.
    Q.sql("q197_calibration_bins",
      s"""$qcScoreCtes,
         |lab AS (
         |  SELECT p.doc_id, p.p_quality,
         |         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
         |  FROM p JOIN documents d USING (doc_id)),
         |b AS (SELECT least(CAST(floor(p_quality * 10) AS BIGINT), 9)
         |               AS bin, p_quality, pos
         |      FROM lab)
         |SELECT bin, count(*) AS n_docs,
         |       floor(CAST(SUM(CAST(p_quality AS DECIMAL(38,6))) AS DOUBLE)
         |             / count(*) * 1e6 + 0.5) / 1e6 AS mean_pred,
         |       floor(CAST(SUM(pos) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
         |         AS obs_rate,
         |       floor(abs(
         |         floor(CAST(SUM(CAST(p_quality AS DECIMAL(38,6))) AS DOUBLE)
         |               / count(*) * 1e6 + 0.5) / 1e6
         |         - floor(CAST(SUM(pos) AS DOUBLE) / count(*) * 1e6 + 0.5)
         |           / 1e6) * 1e6 + 0.5) / 1e6 AS gap
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val docs = Tables.documents(s, d)
      val lab = graft.operators.Curation.classifierQuality(docs,
          "doc_id", "text", QcW, QcBias, enSw, QcThreshold)
        .select(col("doc_id"), col("p_quality"))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("pos", when(col("lang") === "en", 1L).otherwise(0L))
        .withColumn("bin",
          least(floor(col("p_quality") * 10).cast("long"), lit(9L)))
      val g = lab.groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("p_quality").cast(DecimalType(38, 6))).cast("double") /
            count(lit(1))).as("mp_raw"),
          (sum("pos").cast("double") / count(lit(1))).as("or_raw"))
      g.select(col("bin"), col("n_docs"),
          Qutil.dround(col("mp_raw"), 6).as("mean_pred"),
          Qutil.dround(col("or_raw"), 6).as("obs_rate"),
          Qutil.dround(
            abs(Qutil.dround(col("mp_raw"), 6) - Qutil.dround(col("or_raw"), 6)),
            6).as("gap"))
        .orderBy("bin")
    },

    // Code-switch / mislabeled-language audit: q19's lang-id applied PER
    // 20-word chunk (q44's windowing, non-overlapping), then a doc-grain
    // roll-up — docs whose chunks disagree (mixed) or whose dominant
    // chunk language contradicts the declared label (mislabel) are
    // exactly the rows a curation pipeline must re-route (monolingual
    // filters silently pass code-switched text that poisons per-language
    // corpora). Dominant = (count DESC, lang ASC) argmax via min-struct —
    // sort-free. Map-only chunking + one doc-grain aggregate.
    Q.sql("q206_codeswitch_audit", {
      val win = 20
      s"""$wsCte,
         |c AS (
         |  SELECT doc_id, lang, ws, len(ws) AS n,
         |         CAST(ceil(len(ws) / CAST($win AS DOUBLE)) AS BIGINT)
         |           AS n_chunks
         |  FROM (SELECT t.doc_id, d.lang, t.ws
         |        FROM t JOIN documents d USING (doc_id))
         |  WHERE len(ws) > 0),
         |ch AS (
         |  SELECT doc_id, lang, n_chunks,
         |         full_ws[CAST(i * $win + 1 AS BIGINT)
         |                 : CAST(i * $win + $win AS BIGINT)] AS ws
         |  FROM (SELECT doc_id, lang, n_chunks,
         |               unnest(generate_series(0, n_chunks - 1)) AS i,
         |               ws AS full_ws
         |        FROM c)),
         |lid AS (
         |  SELECT doc_id, lang, n_chunks, guess, count(*) AS cnt
         |  FROM (SELECT doc_id, lang, n_chunks,
         |               $langCascadeSql AS guess
         |        FROM ch)
         |  GROUP BY 1, 2, 3, 4),
         |nl AS (SELECT doc_id, lang, n_chunks, count(*) AS n_langs
         |       FROM lid GROUP BY 1, 2, 3),
         |dom AS (
         |  SELECT doc_id, guess AS dominant FROM (
         |    SELECT doc_id, guess,
         |           row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY cnt DESC, guess) AS rn
         |    FROM lid) WHERE rn = 1)
         |SELECT nl.doc_id, nl.lang AS declared, nl.n_chunks,
         |       CAST(nl.n_langs AS BIGINT) AS n_langs, dom.dominant,
         |       CAST(CASE WHEN nl.n_langs > 1 THEN 1 ELSE 0 END AS INTEGER)
         |         AS mixed,
         |       CAST(CASE WHEN dom.dominant <> nl.lang THEN 1 ELSE 0 END
         |            AS INTEGER) AS mislabeled
         |FROM nl JOIN dom ON dom.doc_id = nl.doc_id
         |WHERE nl.n_chunks >= 2
         |  AND (nl.n_langs > 1 OR dom.dominant <> nl.lang)
         |ORDER BY nl.doc_id""".stripMargin
    }) { (s, d) =>
      val win = 20
      val docs = Tables.documents(s, d)
      val chunks = graft.operators.Curation.chunkDocuments(docs, "doc_id",
          "text", win, win)
        .select(col("doc_id"), col("chunk_text"))
      val lid = chunks
        .select(col("doc_id"), langId(col("chunk_text")).as("guess"))
        .groupBy("doc_id", "guess").agg(count(lit(1)).as("cnt"))
      val agg = lid.groupBy("doc_id")
        .agg(count(lit(1)).as("n_langs"),
          sum("cnt").as("n_chunks"),
          min(struct((-col("cnt")).as("nc"), col("guess")))
            .getField("guess").as("dominant"))
      agg.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang").as("declared"), col("n_chunks"),
          col("n_langs"), col("dominant"),
          when(col("n_langs") > 1, 1).otherwise(0).as("mixed"),
          when(col("dominant") =!= col("lang"), 1).otherwise(0)
            .as("mislabeled"))
        .where(col("n_chunks") >= 2 &&
          (col("n_langs") > 1 || col("dominant") =!= col("declared")))
        .orderBy("doc_id")
    })
}
