package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words
import graft.io.Tables
import graft.operators.{CorpusStats, Dedup}
import graft.queries.Qutil.dround

/** Corpus-level statistics: TF-IDF term salience, repetition quality
  * signals, and incremental ingest dedup over `documents`; per-label
  * embedding centroids over `embeddings`. The oracle replays the identical
  * integer counts and the exact decimal-sum centroid arithmetic.
  */
object CorpusStatsQueries {

  private val TopK = 3
  private val Dims = 64
  private val Quant = 6
  private val IndexMod = 5L // doc_id % 5 == 0 → "already-ingested" index
  private val VocabK = 100
  private val VocabMinDf = 2
  private val BpeTopK = 30
  private val BpeSteps = 6 // q91/q92 iterated-BPE merge rounds
  private val BmTerms = Seq("spark", "query", "stream", "join") // q93
  private val BmK1 = 1.2
  private val BmB = 0.75

  /** q93's full-replay BM25 oracle — shared verbatim by q128 (the
    * index-at-rest path), whose contract is exactly "same scores, the
    * corpus never rescanned". */
  private lazy val Bm25Oracle: String = {
    val inList = BmTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
       |  WHERE term IN ($inList) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM w),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |                 CAST(sum(len(ws)) AS DOUBLE) AS sumdl FROM w),
       |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |s AS (
       |  SELECT tf.doc_id,
       |         floor((ln((stats.n - df.df + 5e-1) / (df.df + 5e-1) + 1e0)
       |           * (CAST(tf.tf AS DOUBLE) * ${BmK1 + 1}e0)
       |           / (CAST(tf.tf AS DOUBLE) + (${1 - BmB}e0 + ${BmB}e0 * dl.dl / (stats.sumdl / stats.n)) * ${BmK1}e0))
       |           * 1e6 + 5e-1) / 1e6 AS s
       |  FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats),
       |agg AS (
       |  SELECT doc_id, CAST(sum(CAST(s AS DECIMAL(18,8))) AS DOUBLE) AS score,
       |         count(*) AS n_terms
       |  FROM s GROUP BY 1),
       |r AS (SELECT doc_id, score, n_terms,
       |             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |      FROM agg)
       |SELECT CAST(rank AS INTEGER) AS rank, doc_id, score,
       |       CAST(n_terms AS BIGINT) AS n_terms
       |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin
  }

  /** Chained-CTE replay of `BpeSteps` BPE training rounds (q91/q92): each
    * round's argmax pair is a scalar subquery over the previous round's
    * pair counts, and the greedy non-overlapping merge is the
    * gaps-and-islands selection (runs of consecutive matching positions →
    * odd ranks start a merge; a position is consumed iff its predecessor
    * started one) — the SQL mirror of the left-to-right fold in
    * `CorpusStats.bpeMergePair`. CTEs are MATERIALIZED: every round
    * references its predecessor several times, and DuckDB's default
    * inlining re-evaluates the whole prefix per reference — exponential
    * in rounds (measured: 6 rounds time out un-hinted, 0.1 s hinted). */
  private def bpeChain(steps: Int): String = {
    val base = Seq(
      s"""w AS MATERIALIZED (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents)""".stripMargin,
      "t AS MATERIALIZED (SELECT doc_id, unnest(ws) AS w FROM w)",
      s"""s0 AS MATERIALIZED (
         |  SELECT w AS word, count(*) AS freq,
         |         list_transform(generate_series(1, length(w)),
         |                        i -> substr(w, CAST(i AS INTEGER), 1)) AS syms
         |  FROM t GROUP BY w)""".stripMargin)
    val rounds = (1 to steps).map { r =>
      val p = r - 1
      s"""e$r AS MATERIALIZED (
         |  SELECT word, freq, syms, unnest(generate_series(1, len(syms))) AS i FROM s$p),
         |pc$r AS MATERIALIZED (
         |  SELECT syms[i] AS a, syms[i+1] AS b, sum(freq) AS cnt
         |  FROM e$r WHERE i < len(syms) GROUP BY 1, 2),
         |p$r AS MATERIALIZED (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1),
         |m$r AS MATERIALIZED (
         |  SELECT word, freq, i, syms[i] AS s,
         |         CASE WHEN syms[i] = (SELECT a FROM p$r)
         |               AND syms[i+1] = (SELECT b FROM p$r) THEN 1 ELSE 0 END AS hit
         |  FROM e$r),
         |h$r AS MATERIALIZED (
         |  SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
         |  FROM m$r WHERE hit = 1),
         |st$r AS MATERIALIZED (
         |  SELECT word, i FROM (
         |    SELECT word, i, row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
         |    FROM h$r) WHERE rn % 2 = 1),
         |s$r AS MATERIALIZED (
         |  SELECT word, freq, list(s2 ORDER BY i) AS syms FROM (
         |    SELECT m.word, m.freq, m.i,
         |           CASE WHEN st.i IS NOT NULL
         |                THEN m.s || (SELECT b FROM p$r) ELSE m.s END AS s2
         |    FROM m$r m
         |    LEFT JOIN st$r st ON st.word = m.word AND st.i = m.i
         |    WHERE NOT EXISTS (SELECT 1 FROM st$r c
         |                      WHERE c.word = m.word AND c.i = m.i - 1))
         |  GROUP BY word, freq)""".stripMargin
    }
    "WITH " + (base ++ rounds).mkString(",\n")
  }

  val all: Seq[Q] = Seq(

    // Top-3 TF-IDF terms per doc (smooth idf: tf·(ln((N+1)/(df+1))+1)).
    // tf/df/N are integers on both sides; ln runs on the identical double,
    // and the 6dp dround absorbs any last-ulp libm divergence.
    Q.sql("q48_tfidf_topk",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
         |  GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |         tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                               ORDER BY score DESC, term) AS rn
         |  FROM scored)
         |SELECT doc_id, term, tf, df,
         |       floor(score * 1000000 + 0.5) / 1000000 AS score
         |FROM r WHERE rn <= $TopK ORDER BY doc_id, term""".stripMargin) { (s, d) =>
      CorpusStats.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", TopK)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          dround(col("score"), 6).as("score"))
        .orderBy("doc_id", "term")
    },

    // Repetition quality signals (Gopher/MassiveText-style): duplicate-word
    // ratio and most-frequent-bigram share per doc. Ratios are single exact
    // integer divisions, identical IEEE on both sides.
    Q.sql("q50_repetition_stats",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |ws AS (
         |  SELECT doc_id, len(ws) AS n_words,
         |         len(list_distinct(ws)) AS n_distinct_words
         |  FROM w),
         |bg AS (
         |  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bg
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |        FROM w)),
         |bgc AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
         |bgs AS (SELECT doc_id, sum(n) AS n_bigrams, max(n) AS top_bigram_n
         |        FROM bgc GROUP BY 1)
         |SELECT w.doc_id,
         |       CAST(ws.n_words AS BIGINT) AS n_words,
         |       CASE WHEN ws.n_words = 0 THEN 0.0
         |            ELSE 1.0 - CAST(ws.n_distinct_words AS DOUBLE) / ws.n_words
         |       END AS dup_word_ratio,
         |       CAST(coalesce(bgs.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       CASE WHEN coalesce(bgs.n_bigrams, 0) = 0 THEN 0.0
         |            ELSE CAST(bgs.top_bigram_n AS DOUBLE) / bgs.n_bigrams
         |       END AS top_bigram_ratio
         |FROM w JOIN ws USING (doc_id) LEFT JOIN bgs USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      CorpusStats.repetitionStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Incremental ingest dedup: new batch (doc_id % 5 != 0) anti-joined on
    // fingerprint against the historical index (doc_id % 5 = 0), then
    // intra-batch exact dedup keeping the lowest id per fingerprint.
    Q.sql("q51_incremental_dedup",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents),
         |idx AS (SELECT DISTINCT fp FROM fp WHERE doc_id % $IndexMod = 0),
         |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % $IndexMod <> 0),
         |novel AS (
         |  SELECT b.doc_id, b.fp FROM batch b
         |  WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.fp = b.fp)),
         |best AS (
         |  SELECT doc_id, fp,
         |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM novel)
         |SELECT doc_id, fp FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.dedupeAgainstIndex(
          docs.where(pmod(col("doc_id"), lit(IndexMod)) =!= 0)
            .select("doc_id", "text"),
          "doc_id", "text",
          docs.where(pmod(col("doc_id"), lit(IndexMod)) === 0)
            .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp")))
        .select("doc_id", "fp")
        .orderBy("doc_id")
    },

    // Bloom-accelerated incremental dedup: same semantics as q51 (the
    // oracle is the SAME SQL — Bloom filters have no false negatives, so
    // the pre-filter provably cannot change the result, only the cost:
    // rows testing negative skip the anti-join). The hash-exact match
    // against q51's oracle is the correctness proof of that claim.
    Q.sql("q59_bloom_incremental_dedup",
      s"""WITH fp AS (
         |  SELECT doc_id,
         |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents),
         |idx AS (SELECT DISTINCT fp FROM fp WHERE doc_id % $IndexMod = 0),
         |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % $IndexMod <> 0),
         |novel AS (
         |  SELECT b.doc_id, b.fp FROM batch b
         |  WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.fp = b.fp)),
         |best AS (
         |  SELECT doc_id, fp,
         |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM novel)
         |SELECT doc_id, fp FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.dedupeAgainstIndexBloom(
          docs.where(pmod(col("doc_id"), lit(IndexMod)) =!= 0)
            .select("doc_id", "text"),
          "doc_id", "text",
          docs.where(pmod(col("doc_id"), lit(IndexMod)) === 0)
            .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp")),
          expectedItems = 10000L, fpp = 0.03)
        .select("doc_id", "fp")
        .orderBy("doc_id")
    },

    // Unigram-LM quality scoring (CCNet/KenLM-style, order 1): model
    // trained on the "curated" subset (doc_id % 5 = 0), every doc scored
    // by add-one-smoothed per-token cross-entropy. Per-token ln is rounded
    // to 6dp then decimal-summed, so the doc sums are order-independent
    // and the oracle replays them exactly (the q41/q49 determinism rule).
    Q.sql("q61_unigram_quality",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
         |ref AS (
         |  SELECT term, count(*) AS cnt FROM tok
         |  WHERE doc_id % $IndexMod = 0 GROUP BY 1),
         |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM ref),
         |lp AS (
         |  SELECT t.doc_id,
         |         floor(ln((coalesce(r.cnt, 0) + 1.0) / (st.n + st.v)) * 1000000 + 0.5) / 1000000 AS lp,
         |         CASE WHEN r.cnt IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM tok t LEFT JOIN ref r USING (term) CROSS JOIN st),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
         |         CAST(sum(CAST(lp AS DECIMAL(38,8))) AS DOUBLE) AS slp
         |  FROM lp GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
         |       CASE WHEN a.n_tokens IS NULL OR a.n_tokens = 0 THEN 0.0
         |            ELSE floor(-a.slp / a.n_tokens * 1000000 + 0.5) / 1000000
         |       END AS xent
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      CorpusStats.unigramLogLoss(docs, "doc_id", "text",
          docs.where(pmod(col("doc_id"), lit(IndexMod)) === 0), "text")
        .orderBy("doc_id")
    },

    // Interpolated bigram-LM scoring (order-2 refinement of q61): catches
    // fluent-vocabulary-but-scrambled-order text a unigram model cannot.
    // λ = 0.5 is dyadic, so both interpolation weights are exact doubles
    // in either engine; per-token ln rounded 6dp then decimal-summed.
    Q.sql("q63_bigram_quality",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
         |ref AS (
         |  SELECT term, count(*) AS cnt FROM tok
         |  WHERE doc_id % $IndexMod = 0 GROUP BY 1),
         |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM ref),
         |rp AS (
         |  SELECT ws[i-1] AS prev, ws[i] AS cur
         |  FROM (SELECT ws, unnest(generate_series(2, len(ws))) AS i
         |        FROM w WHERE doc_id % $IndexMod = 0)),
         |bi AS (SELECT prev, cur, count(*) AS cnt2 FROM rp GROUP BY 1, 2),
         |flp AS (
         |  SELECT f.doc_id,
         |         floor(ln((coalesce(r.cnt, 0) + 1.0) / (st.n + st.v)) * 1000000 + 0.5) / 1000000 AS lp
         |  FROM (SELECT doc_id, ws[1] AS term FROM w WHERE len(ws) >= 1) f
         |  LEFT JOIN ref r USING (term) CROSS JOIN st),
         |dp AS (
         |  SELECT doc_id, ws[i-1] AS prev, ws[i] AS cur
         |  FROM (SELECT doc_id, ws, unnest(generate_series(2, len(ws))) AS i FROM w)),
         |plp AS (
         |  SELECT d.doc_id,
         |         floor(ln(0.5 * (coalesce(b.cnt2, 0) + 1.0) / (coalesce(rp2.cnt, 0) + st.v)
         |                  + 0.5 * (coalesce(rc.cnt, 0) + 1.0) / (st.n + st.v)) * 1000000 + 0.5) / 1000000 AS lp
         |  FROM dp d
         |  LEFT JOIN bi b ON b.prev = d.prev AND b.cur = d.cur
         |  LEFT JOIN ref rp2 ON rp2.term = d.prev
         |  LEFT JOIN ref rc ON rc.term = d.cur
         |  CROSS JOIN st),
         |u AS (SELECT * FROM flp UNION ALL SELECT * FROM plp),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(CAST(lp AS DECIMAL(38,8))) AS DOUBLE) AS slp
         |  FROM u GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CASE WHEN a.n_tokens IS NULL OR a.n_tokens = 0 THEN 0.0
         |            ELSE floor(-a.slp / a.n_tokens * 1000000 + 0.5) / 1000000
         |       END AS xent
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      CorpusStats.bigramLogLoss(docs, "doc_id", "text",
          docs.where(pmod(col("doc_id"), lit(IndexMod)) === 0), "text")
        .orderBy("doc_id")
    },

    // Multimodal metadata path: the payload/meta columns of the fake-media
    // attach are pure column derivations, so — unlike the batched decode,
    // which stays rows-only in q30 — they hash-verify end to end.
    Q.sql("q52_multimodal_meta",
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
        |       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
        |       CAST(length(text) * 10 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.multimodal.Multimodal
        .withFakeMedia(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("meta.kind").as("kind"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.durationMs").as("duration_ms"))
        .orderBy("doc_id")
    },

    // Corpus composition report: the mixture table (source × lang → docs,
    // tokens, mean quality) that drives stratified-sampling decisions.
    // Quality replays q18's formula; its mean goes through the decimal-sum
    // rule so the report hashes identically.
    Q.sql("q58_composition_report", {
      val sw = TextQueries.enSwList
      val punct = """CASE WHEN length(text) = 0 THEN 0.0
                    |            ELSE CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / length(text) END""".stripMargin
      val stop = s"""CASE WHEN len(ws) = 0 THEN 0.0
                    |            ELSE CAST(len(list_filter(ws, w -> list_contains($sw, w))) AS DOUBLE) / len(ws) END""".stripMargin
      s"""WITH w AS (
         |  SELECT source, lang, text,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |q AS (
         |  SELECT source, lang, CAST(len(ws) AS BIGINT) AS tok,
         |         CAST(floor(greatest(0.0, least(1.0,
         |           least(CAST(len(ws) AS DOUBLE) / 100, 1.0) * 0.4
         |           + least(($stop) * 4, 1.0) * 0.4
         |           + (1.0 - least(($punct) * 5, 1.0)) * 0.2
         |         )) * 10000 + 0.5) / 10000 AS DECIMAL(38, 6)) AS ql
         |  FROM w)
         |SELECT source, lang, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
         |       floor((CAST(sum(ql) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_quality
         |FROM q GROUP BY source, lang
         |ORDER BY source, lang""".stripMargin
    }) { (s, d) =>
      CorpusStats.compositionReport(Tables.documents(s, d), "source", "lang",
          "text", graft.functions.TextFunctions.langStopwords.head._2)
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          dround(col("mean_quality"), 6).as("mean_quality"))
        .orderBy("source", "lang")
    },

    // Per-label embedding centroids, long form (label, pos, c, n). The
    // quantize-then-decimal-sum makes the mean order-independent and
    // engine-identical (Qutil msum rule applied element-wise).
    Q.sql("q49_label_centroids",
      s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (
         |  SELECT label, pos, v[pos] AS x
         |  FROM (SELECT label, v, unnest(generate_series(1, $Dims)) AS pos FROM e)),
         |q AS (
         |  SELECT label, pos,
         |         CAST(floor(x * 1000000 + 0.5) / 1000000 AS DECIMAL(38, ${Quant + 2})) AS xq
         |  FROM x)
         |SELECT label, pos,
         |       floor((CAST(sum(xq) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS c,
         |       count(*) AS n
         |FROM q GROUP BY label, pos
         |ORDER BY label, pos""".stripMargin) { (s, d) =>
      CorpusStats.labelCentroids(Tables.embeddings(s, d), "label", "embedding", Quant)
        .select(col("label"), col("pos"), dround(col("c"), 6).as("c"), col("n"))
        .orderBy("label", "pos")
    },

    // Corpus vocabulary head (CorpusStats.vocabulary): top-100 tokens by
    // total occurrences with document frequencies, df >= 2. The global
    // top-k runs as TakeOrderedAndProject (distributed heap merge, never a
    // full sort); the rank column is then a window over just those k rows.
    Q.sql("q66_vocab_topk",
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
         |  GROUP BY 1, 2),
         |v AS (
         |  SELECT term, CAST(sum(tf) AS BIGINT) AS tf, count(*) AS df
         |  FROM tf GROUP BY 1),
         |r AS (
         |  SELECT term, tf, df,
         |         row_number() OVER (ORDER BY tf DESC, term) AS rank
         |  FROM v WHERE df >= $VocabMinDf)
         |SELECT term, tf, df, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= $VocabK ORDER BY rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val vocab = CorpusStats.vocabulary(Tables.documents(s, d), "doc_id", "text")
        .where(col("df") >= VocabMinDf)
        .orderBy(col("tf").desc, col("term").asc).limit(VocabK)
      vocab.withColumn("rank",
          row_number().over(Window.orderBy(col("tf").desc, col("term").asc)))
        .select(col("term"), col("tf"), col("df"), col("rank"))
        .orderBy("rank")
    },

    // One BPE training step (CorpusStats.bpePairCounts): the top adjacent
    // character pairs a byte-pair tokenizer would merge next. Map-only
    // explodes → one pair aggregate → TakeOrdered top-k.
    Q.sql("q84_bpe_merge_pairs",
      s"""WITH w AS (
         |  SELECT CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |t AS (SELECT unnest(ws) AS w FROM w),
         |p AS (
         |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
         |  FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
         |        FROM t WHERE length(w) >= 2)),
         |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY 1),
         |r AS (SELECT pair, cnt,
         |             row_number() OVER (ORDER BY cnt DESC, pair) AS rank
         |      FROM c)
         |SELECT pair, cnt, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= $BpeTopK ORDER BY rank""".stripMargin) { (s, d) =>
      CorpusStats.bpePairCounts(Tables.documents(s, d), "doc_id", "text",
          BpeTopK)
        .orderBy("rank")
    },

    // Iterated BPE training: 6 merge rounds over the word-frequency table,
    // each round's argmax pair learned from the previous round's merged
    // symbols (q84 is one round of this). The oracle replays the full loop
    // as chained CTEs — argmax as a scalar subquery, greedy merge as
    // gaps-and-islands selection.
    Q.sql("q91_bpe_train",
      bpeChain(BpeSteps) + ",\nml AS (" +
        (1 to BpeSteps).map(r =>
          s"SELECT $r AS step, a, b, a || b AS merged, cnt FROM p$r")
          .mkString("\n  UNION ALL ") +
        ")\nSELECT CAST(step AS INTEGER) AS step, a, b, merged, " +
        "CAST(cnt AS BIGINT) AS cnt FROM ml ORDER BY step") { (s, d) =>
      import s.implicits._
      CorpusStats.bpeTrain(Tables.documents(s, d), "doc_id", "text", BpeSteps)
        .map { case (step, a, b, cnt) => (step, a, b, a + b, cnt) }
        .toDF("step", "a", "b", "merged", "cnt")
        .orderBy("step")
    },

    // BPE encode: apply the learned merge list to the corpus (ordered
    // one-pass application — exact, see CorpusStats.bpeEncode) and count
    // tokens per document. The oracle looks each word up in the
    // training-end symbol state, which the encode pass provably
    // reproduces on the training corpus.
    Q.sql("q92_bpe_encode",
      bpeChain(BpeSteps) + s""",
         |dt AS (SELECT t.doc_id, len(s.syms) AS n FROM t JOIN s$BpeSteps s ON s.word = t.w)
         |SELECT w.doc_id AS doc_id, CAST(coalesce(sum(dt.n), 0) AS BIGINT) AS n_tokens
         |FROM w LEFT JOIN dt ON dt.doc_id = w.doc_id
         |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = CorpusStats.bpeTrain(docs, "doc_id", "text", BpeSteps)
        .map { case (_, a, b, _) => (a, b) }
      // encode is row-parallel CPU work, but the single-file test corpus
      // scans as ONE task — spread it across cores first (at real scale
      // the many-file scan already provides this parallelism; measured
      // 13 s → 0.9 s at sf0.1)
      CorpusStats.bpeEncode(docs.repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text", merges)
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id")
    },

    // BM25 retrieval: top-20 docs for a bag of query terms. Constants are
    // interpolated from the SAME Scala doubles the operator uses (k1+1 is
    // 2.2000000000000002, not 2.2) with an e0 suffix so DuckDB parses
    // DOUBLE, not DECIMAL — per-term scores 6dp-round then decimal-sum,
    // so the per-doc total is order-independent in both engines.
    Q.sql("q93_bm25_retrieval", Bm25Oracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val out = CorpusStats.bm25(Tables.documents(s, d), "doc_id", "text",
        BmTerms, BmK1, BmB)
      // TakeOrdered gets the 20 under a (score, id) total order; the rank
      // window then runs over 20 rows, never the corpus
      out.orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("int"))
        .select(col("rank"), col("doc_id"), col("score"), col("n_terms"))
        .orderBy("rank")
    },

    // BM25 over the inverted index AT REST (CorpusStats.writeInvertedIndex
    // + bm25FromIndex): postings bucketed by term, doc lengths and corpus
    // stats as side tables — query-time cost is posting-list-sized (the
    // term `isin` prunes the postings scan to the query terms' buckets;
    // BucketedIndexSpec asserts SelectedBucketsCount), the corpus text is
    // never rescanned. The oracle is q93's VERBATIM: a hash match proves
    // the at-rest index path reproduces the one-shot scores bit-for-bit —
    // the retrieval twin of q102's "bucketed storage changes cost only"
    // contract.
    Q.sql("q128_bm25_index", Bm25Oracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      CorpusStats.writeInvertedIndex(Tables.documents(s, d), "doc_id", "text",
        prefix = "graft_inv", nBuckets = 8)
      val out = CorpusStats.bm25FromIndex(s, "graft_inv", "doc_id",
        BmTerms, BmK1, BmB)
      out.orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("int"))
        .select(col("rank"), col("doc_id"), col("score"), col("n_terms"))
        .orderBy("rank")
    },

    // Hybrid retrieval: BM25 and TF-IDF query scores fused by reciprocal
    // rank (RRF, Cormack et al.) — only RANKS cross the fusion boundary,
    // so incomparable score scales need no calibration. Both rankers
    // score the same matched-docs set (shared query-term filter); each
    // reciprocal is 6dp-rounded then decimal-summed, so fused scores are
    // engine-exact. Top-20 under the (rrf desc, id) total order.
    Q.sql("q113_hybrid_retrieval_rrf", {
      val inList = BmTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH w AS (
         |  SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
         |  WHERE term IN ($inList) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM w),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |                 CAST(sum(len(ws)) AS DOUBLE) AS sumdl FROM w),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |s1 AS (
         |  SELECT tf.doc_id,
         |         floor((ln((stats.n - df.df + 5e-1) / (df.df + 5e-1) + 1e0)
         |           * (CAST(tf.tf AS DOUBLE) * ${BmK1 + 1}e0)
         |           / (CAST(tf.tf AS DOUBLE) + (${1 - BmB}e0 + ${BmB}e0 * dl.dl / (stats.sumdl / stats.n)) * ${BmK1}e0))
         |           * 1e6 + 5e-1) / 1e6 AS s
         |  FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats),
         |a1 AS (SELECT doc_id, CAST(sum(CAST(s AS DECIMAL(18,8))) AS DOUBLE) AS score
         |       FROM s1 GROUP BY 1),
         |r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |       FROM a1),
         |s2 AS (
         |  SELECT tf.doc_id,
         |         floor((CAST(tf.tf AS DOUBLE) * (ln((stats.n + 1e0) / (df.df + 1e0)) + 1e0))
         |           * 1e6 + 5e-1) / 1e6 AS s
         |  FROM tf JOIN df USING (term) CROSS JOIN stats),
         |a2 AS (SELECT doc_id, CAST(sum(CAST(s AS DECIMAL(18,8))) AS DOUBLE) AS score
         |       FROM s2 GROUP BY 1),
         |r2 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |       FROM a2),
         |c AS (
         |  SELECT doc_id, floor(1e0 / (60 + rank) * 1e6 + 5e-1) / 1e6 AS c FROM r1
         |  UNION ALL
         |  SELECT doc_id, floor(1e0 / (60 + rank) * 1e6 + 5e-1) / 1e6 AS c FROM r2),
         |f AS (SELECT doc_id, CAST(sum(CAST(c AS DECIMAL(18,8))) AS DOUBLE) AS rrf,
         |             count(*) AS n_lists
         |      FROM c GROUP BY 1)
         |SELECT doc_id, rrf, CAST(n_lists AS BIGINT) AS n_lists
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val bm = CorpusStats.bm25(docs, "doc_id", "text", BmTerms, BmK1, BmB)
        .select("doc_id", "score")
      val ti = CorpusStats.tfidfQueryScore(docs, "doc_id", "text", BmTerms)
        .select("doc_id", "score")
      CorpusStats.rrfFuse(Seq(bm, ti), "doc_id", "score", 20)
        .select(col("doc_id"), col("rrf"), col("n_lists"))
        .orderBy(col("rrf").desc, col("doc_id"))
    },

    // Top-3 terms per source, written as the PLAIN window row_number()≤k
    // idiom with WindowTopKRewrite injected — the optimizer rule itself is
    // oracle-checked end to end: the query plans onto the bounded-heap
    // exec (PlanSpec asserts it) and must still hash-match the window
    // formulation DuckDB runs. Order (cnt desc, term) is total per source.
    Q.sql("q96_top_terms_per_source",
      s"""WITH w AS (
         |  SELECT source,
         |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |              ELSE string_split_regex(trim(text), '\\s+') END AS ws
         |  FROM documents),
         |tf AS (
         |  SELECT source, term, count(*) AS cnt
         |  FROM (SELECT source, unnest(ws) AS term FROM w)
         |  GROUP BY 1, 2),
         |r AS (SELECT source, term, cnt,
         |             row_number() OVER (PARTITION BY source
         |                                ORDER BY cnt DESC, term) AS rn
         |      FROM tf)
         |SELECT source, term, cnt FROM r WHERE rn <= 3
         |ORDER BY source, term""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.plans.{TopKPerGroupStrategy, WindowTopKRewrite}
      // dedicated session (round-5 advisory): the rewrite installs into
      // session state, and in the SHARED session that would make every
      // later query's plan depend on whether q96 ran first. newSession()
      // shares the SparkContext + catalog but carries its own
      // experimental hooks, so the install is scoped to this query.
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ WindowTopKRewrite
      s2.experimental.extraStrategies =
        s2.experimental.extraStrategies :+ TopKPerGroupStrategy
      val tf = Tables.documents(s2, d)
        .select(col("source"), explode(words(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("source").orderBy(col("cnt").desc, col("term").asc)
      tf.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("source", "term", "cnt") // rn dropped → the rewrite fires
        .orderBy("source", "term")
    },

    // Collocation mining (CorpusStats.pmiPairs): top-30 term pairs by
    // document-level PMI, with the pair space bounded to the 120
    // highest-df terms BEFORE the self-join — the classic unbounded
    // collocation job explodes quadratically in per-doc vocabulary. The
    // oracle replays top-term selection (deterministic df/term order),
    // doc-keyed pairing, and the 6dp-rounded ln.
    Q.sql("q134_pmi_pairs",
      """WITH w AS (
        |  SELECT doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(text), '\s+') END AS ws
        |  FROM documents),
        |inc AS (
        |  SELECT DISTINCT doc_id, term
        |  FROM (SELECT doc_id, unnest(ws) AS term FROM w)),
        |dfx AS (SELECT term, count(*) AS df FROM inc GROUP BY 1
        |        ORDER BY df DESC, term LIMIT 120),
        |fi AS (SELECT i.doc_id, i.term, d.df
        |       FROM inc i JOIN dfx d ON d.term = i.term),
        |pr AS (SELECT a.term AS term_a, b.term AS term_b,
        |              a.df AS df_a, b.df AS df_b, count(*) AS n_ab
        |       FROM fi a JOIN fi b
        |         ON b.doc_id = a.doc_id AND a.term < b.term
        |       GROUP BY 1, 2, 3, 4),
        |nn AS (SELECT count(*) AS n FROM documents),
        |p AS (SELECT term_a, term_b, n_ab, df_a, df_b,
        |             floor(ln(CAST(n_ab AS DOUBLE) * CAST(nn.n AS DOUBLE)
        |                      / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE)))
        |                   * 1000000 + 0.5) / 1000000 AS pmi
        |      FROM pr CROSS JOIN nn)
        |SELECT term_a, term_b, n_ab, df_a, df_b, pmi
        |FROM p ORDER BY pmi DESC, term_a, term_b LIMIT 30""".stripMargin) { (s, d) =>
      CorpusStats.pmiPairs(Tables.documents(s, d), "doc_id", "text",
        topTerms = 120, k = 30)
    },

    // Zipf-law fit: least-squares slope/intercept of ln(freq) on ln(rank)
    // over the top-1000 terms — the one-number corpus health check (a
    // natural-language corpus slopes near −1; template/boilerplate-heavy
    // corpora flatten). TakeOrdered bounds the fit frame to 1000 rows;
    // each ln lands on the 6dp grid and the moment sums are exact
    // decimals (the q61 libm discipline), so the closed-form slope runs
    // on identical doubles in both engines.
    Q.sql("q138_zipf_fit",
      """WITH w AS (
        |  SELECT doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(text), '\s+') END AS ws
        |  FROM documents),
        |tok AS (SELECT unnest(ws) AS term FROM w),
        |tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY 1),
        |top AS (SELECT term, tf FROM tf ORDER BY tf DESC, term LIMIT 1000),
        |r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rank
        |      FROM top),
        |xy AS (SELECT
        |         floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS x,
        |         floor(ln(CAST(tf AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS y
        |       FROM r),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |             CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |             CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
        |             CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
        |      FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |       floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000 + 0.5) / 1000000 AS slope,
        |       floor(((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n) * 1000000 + 0.5) / 1000000 AS intercept
        |FROM m""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val tf = CorpusStats.vocabulary(Tables.documents(s, d), "doc_id", "text")
        .select("term", "tf")
      val top = tf.orderBy(col("tf").desc, col("term")).limit(1000)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("tf").desc, col("term"))))
      val xy = top.select(
        Qutil.dround(log(col("rank").cast("double")), 6).as("x"),
        Qutil.dround(log(col("tf").cast("double")), 6).as("y"))
      def dsum(c: org.apache.spark.sql.Column) =
        sum(c.cast(DecimalType(28, 12))).cast("double")
      val m = xy.agg(count(lit(1)).cast("double").as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("y")).as("sxy"), dsum(col("x") * col("x")).as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      m.select(col("n").cast("bigint").as("n_terms"),
        Qutil.dround(slope, 6).as("slope"),
        Qutil.dround((col("sy") - slope * col("sx")) / col("n"), 6)
          .as("intercept"))
    },

    // Exact phrase search over a positional inverted index
    // (CorpusStats.positionalIndex + phraseSearch): occurrences of
    // "part filter scan" as positional-intersection equi-joins,
    // rare-term-first so the intermediate never exceeds the rarest
    // posting list. The oracle replays tokenization, positions, and the
    // adjacency joins independently (anchor-relative, fixed order) —
    // same occurrence set either way, which is the commutativity the
    // rare-first optimization relies on.
    Q.sql("q187_phrase_search",
      """WITH w AS (
        |  SELECT doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(text), '\s+') END AS ws
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(ws) AS tok,
        |             unnest(generate_series(1, len(ws))) AS pos FROM w),
        |occ AS (
        |  SELECT a.doc_id, a.pos AS start
        |  FROM p a
        |  JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |          AND b.tok = 'filter'
        |  JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |          AND c.tok = 'scan'
        |  WHERE a.tok = 'part')
        |SELECT doc_id, count(*) AS n_occurrences
        |FROM occ GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val idx = CorpusStats.positionalIndex(
        Tables.documents(s, d), "doc_id", "text")
      CorpusStats.phraseSearch(idx, Seq("part", "filter", "scan"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
        .orderBy("doc_id")
    })
}
